"""sparkgraph — a PySpark-native link-graph analytics engine.

Re-expresses the computational semantics of the reference Pregel engine
(szhu33/Distributed-Graph-Computing-Platform, a Go master/worker BSP system —
see SURVEY.md) as idiomatic Spark: iterative DataFrame joins + vectorized
Arrow/pandas UDFs over hash-partitioned edge tables, with Parquet/Iceberg-style
table IO in place of the reference's SDFS replicated blob store.

Layout:
    sparkgraph.session     SparkSession builder with engine defaults (AQE etc.)
    sparkgraph.graph       Graph abstraction: symmetrized edge table + stats
    sparkgraph.io          sources: edge-list text reader, table IO, synth data
    sparkgraph.pregel      superstep driver utilities (checkpoint, metrics)
    sparkgraph.algorithms  PageRank, SSSP, connected components, LPA, triangles
    sparkgraph.kernels     CSR-packed Arrow gather-scatter kernels
    sparkgraph.ingest      source-repo table ingest (sha256 invariant, ids)
    sparkgraph.derive      import/include + commit-co-change edge derivation
    sparkgraph.text        document ops: dedup, language-ID, quality, tokens
    sparkgraph.similarity  embedding ANN: brute-force + LSH-bucketed cosine
"""

__version__ = "0.1.0"
