from sparkgraph.kernels.csr import (  # noqa: F401
    PackedGraph,
    cc_csr,
    pagerank_csr,
    sssp_csr,
)
