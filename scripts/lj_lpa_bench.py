"""LiveJournal-class LPA + HITS evidence run — the last two core algorithm
families without a 138 M-sym-edge entry in BENCH.md.

Both run on the cached fixed-seed graph (lj_common: 69 M input edges /
4.8 M vertices, seed 42):

  * label propagation, 4 rounds — per round ONE shuffle-hash scatter join
    (E rows) + a (dst, label) count + per-dst argmax; the logged changed
    count per round is the scale argument (cost tracks churn, and churn
    decays).
  * HITS, 4 iterations — two scatter joins per iteration (hub←auth,
    auth←hub) + two scalar L1 normalizations; per-iteration wall should be
    flat (full-graph scatter every round, no frontier).

Prints one JSON line. Usage:
    SPARK_GRAFT_CPUS=32 python scripts/lj_lpa_bench.py [lpa_rounds] [hits_iters]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lj_common import LJ_EDGES, LJ_VERTS, lj_edges

from sparkgraph.session import get_spark
from sparkgraph.graph import Graph
from sparkgraph.algorithms import label_propagation
from sparkgraph.algorithms.hits import hits


def main() -> None:
    lpa_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hits_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("lj-lpa-hits")

    t0 = time.monotonic()
    edges = lj_edges(spark)
    g = Graph(edges)
    n_sym = g.edges_sym.count()
    build_s = round(time.monotonic() - t0, 1)

    out: dict = {
        "metric": "lj_lpa_hits",
        "unit": "sec",
        "n_input_edges": LJ_EDGES,
        "n_vertices_param": LJ_VERTS,
        "n_sym_edges": n_sym,
        "load_seconds": build_s,
        "jobs": {},
    }

    t0 = time.monotonic()
    res = label_propagation(g, max_iter=lpa_rounds)
    n_labels = res.state.select("label").distinct().count()
    wall = round(time.monotonic() - t0, 1)
    out["jobs"]["lpa"] = {
        "seconds": wall,
        "rounds": res.supersteps,
        "distinct_labels": n_labels,
        "changed_decay": [m.changed for m in res.metrics],
        "round_seconds": [round(m.seconds, 1) for m in res.metrics],
    }
    print(json.dumps(out["jobs"]["lpa"]), flush=True)

    t0 = time.monotonic()
    hres = hits(g.edges_sym.select("src", "dst"), iterations=hits_iters)
    top_auth = hres.state.orderBy("auth", ascending=False).limit(1).collect()[0]
    wall = round(time.monotonic() - t0, 1)
    out["jobs"]["hits"] = {
        "seconds": wall,
        "iterations": hits_iters,
        "top_auth": round(float(top_auth.auth), 8),
        "iter_seconds": [round(m.seconds, 1) for m in hres.metrics],
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
