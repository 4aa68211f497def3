"""End-to-end embedding/ANN serving pipeline — the round-4 composition.

Chains the engine's embedding operators the way a production retrieval
stack would, with every expensive artifact built ONCE and queried many
times:

  1. graph smoothing      (SGC feature propagation over the link graph —
                           graph-aware embeddings without a GNN)
  2. near-dup pruning     (hyperplane-LSH banded candidates + exact verify)
  3. quantizer training   (deterministic k-means, k lists)
  4. index build          (inverted lists, written partitionBy(cluster) so
                           probes partition-prune at the scan)
  5. batch ANN            (many queries, one job over the index)

Usage:
    python examples/embedding_pipeline.py [sf_dir]   # default sf0.01
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkgraph.session import get_spark
from sparkgraph.graph import Graph
from sparkgraph.features import feature_propagation
from sparkgraph.similarity import (
    embedding_near_dup_pairs_lsh,
    ivf_index,
    ivf_topk_batch,
    ivf_train,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("embedding-pipeline", master="local[8]", shuffle_partitions=8)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n0 = emb.count()

    # 1: smooth embeddings over the customer-order bipartite link graph
    import __spark_entry__ as entry

    g = Graph(entry.bipartite_edges(spark, sf_dir))
    smoothed_long = feature_propagation(g, emb, rounds=2)
    smoothed = (
        smoothed_long.groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "val"))), lambda s: s["val"]
            ).alias("embedding")
        )
        .withColumnRenamed("id", "vec_id")
    )

    # 2: drop near-duplicate vectors (keep the smaller id of each pair)
    dups = embedding_near_dup_pairs_lsh(emb, threshold=0.98).select(
        F.col("b").alias("vec_id")
    ).distinct()
    corpus = emb.join(dups, "vec_id", "left_anti")
    n_corpus = corpus.count()

    # 3-4: train the coarse quantizer once, build the on-disk index once
    cents = ivf_train(corpus, k=16, iters=3)
    idx_path = os.path.join(tempfile.mkdtemp(prefix="embpipe"), "ivf")
    index = ivf_index(corpus, cents, path=idx_path)

    # 5: answer a query batch in one job
    queries = emb.filter(F.col("vec_id") % 500 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = ivf_topk_batch(index, queries, cents, k=5, nprobe=4)

    print(f"vectors in:        {n0}")
    print(f"smoothed rows:     {smoothed.count()} (graph-aware embeddings)")
    print(f"near-dup dropped:  {n0 - n_corpus}")
    print(f"index lists:       {index.select('cluster').distinct().count()} @ {idx_path}")
    print(f"query batch:       {queries.count()} queries -> {hits.count()} hits")
    hits.orderBy("query_id", "rank").show(10)
    spark.stop()


if __name__ == "__main__":
    main()
