from sparkgraph.io.edgelist import read_edgelist  # noqa: F401
