from sparkgraph.kernels.csr import pagerank_csr  # noqa: F401
