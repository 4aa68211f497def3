"""Shared LiveJournal-class fixture for the lj_*_bench scripts (VERDICT r4
#10): synthesize the fixed-seed powerlaw edge table ONCE, cache it as
parquet under /tmp, and let every evidence run read the cache — the 40-150 s
per-script rebuild amortizes out, and every run provably uses the SAME
graph (seed 42, 69 M input edges / 4.8 M vertices / 138 M sym edges)."""

from __future__ import annotations

import os

LJ_CACHE_DIR = os.environ.get("SPARK_GRAFT_LJ_CACHE", "/tmp/sparkgraph_lj")
LJ_EDGES = 69_000_000
LJ_VERTS = 4_800_000


def lj_edges(spark, n_edges: int = LJ_EDGES, n_verts: int = LJ_VERTS):
    """Cached (src, dst) edge table; builds + writes on first use."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sparkgraph.io.synth import powerlaw_edges

    path = os.path.join(LJ_CACHE_DIR, f"edges_{n_edges}_{n_verts}.parquet")
    if not os.path.isdir(path):
        powerlaw_edges(spark, n_edges, n_verts).repartition(96, "src").write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)
