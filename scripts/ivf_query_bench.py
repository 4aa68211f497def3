"""IVF query-path cost evidence (VERDICT r3 #3 "Done" criterion).

Builds the IVF index ONCE over the sf embeddings (written
partitionBy(cluster) so list filters partition-prune), then times, with the
plan rebuilt per attempt:

  * brute_topk      — full-corpus exact cosine top-k (the baseline)
  * ivf_prebuilt    — ivf_topk over the on-disk index (nprobe lists only)
  * ivf_reassign    — the r3 shape: assignment re-run inside the query

and reports bytes/rows actually read by the pruned scan. Expected: prebuilt
row-reads ≈ (nprobe / k_lists) · corpus, and ivf_reassign ≫ ivf_prebuilt.

Usage: SPARK_GRAFT_CPUS=32 python scripts/ivf_query_bench.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkgraph.session import get_spark
from sparkgraph.similarity import cosine_topk, ivf_index, ivf_topk, ivf_train

K_LISTS, NPROBE, TOPK, REPEATS = 16, 4, 10, 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("ivf-query-bench")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]

    t0 = time.monotonic()
    cents = ivf_train(emb, k=K_LISTS, iters=3)
    train_s = round(time.monotonic() - t0, 3)

    idx_path = os.path.join(tempfile.mkdtemp(prefix="ivfbench"), "index")
    t0 = time.monotonic()
    index = ivf_index(emb, cents, path=idx_path)
    index_build_s = round(time.monotonic() - t0, 3)

    def timed(fn):
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    brute = timed(lambda: cosine_topk(emb, q, k=TOPK).collect())
    prebuilt = timed(
        lambda: ivf_topk(index, q, cents, k=TOPK, nprobe=NPROBE).collect()
    )
    # the round-3 shape, kept for comparison: raw corpus in = full
    # re-assignment inside every query
    reassign = timed(
        lambda: ivf_topk(emb, q, cents, k=TOPK, nprobe=NPROBE, allow_assign=True).collect()
    )
    # rows the pruned scan touches = members of the nprobe lists
    import numpy as np

    cents_m = np.asarray(cents, dtype=np.float64)
    cents_m = cents_m / np.linalg.norm(cents_m, axis=1, keepdims=True)
    qv = np.asarray(q) / np.linalg.norm(q)
    probe_lists = np.argsort(-(cents_m @ qv), kind="stable")[:NPROBE].tolist()
    rows_in_lists = index.filter(
        "cluster in ({})".format(",".join(str(int(p)) for p in probe_lists))
    ).count()

    print(json.dumps({
        "metric": "ivf_query_path",
        "unit": "sec",
        "n_vectors": n,
        "k_lists": K_LISTS,
        "nprobe": NPROBE,
        "train_seconds": train_s,
        "index_build_seconds": index_build_s,
        "brute_topk_seconds": brute,
        "ivf_prebuilt_seconds": prebuilt,
        "ivf_reassign_seconds": reassign,
        "rows_in_probed_lists": rows_in_lists,
        "probed_fraction": round(rows_in_lists / max(n, 1), 4),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
