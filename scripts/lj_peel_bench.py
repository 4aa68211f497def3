"""LiveJournal-class peeling-family evidence (VERDICT r4 #7): coreness
(h-index iteration) and k-truss on the cached 138 M-sym-edge fixed-seed
graph, with per-round decay logged — completes the at-scale story for the
last iterative operators without LJ evidence.

Usage:
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_DRIVER_MEM=16g \
        python scripts/lj_peel_bench.py [coreness|truss|both] [truss_k]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.lj_common import lj_edges
from sparkgraph.graph import Graph
from sparkgraph.session import get_spark


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    truss_k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("lj-peel")

    t0 = time.monotonic()
    g = Graph(lj_edges(spark))
    n_sym = g.edges_sym.count()
    build_s = round(time.monotonic() - t0, 1)
    out: dict = {
        "metric": "lj_peel_family",
        "unit": "sec",
        "n_sym_edges": n_sym,
        "load_seconds": build_s,
        "jobs": {},
    }

    if which in ("coreness", "both"):
        from sparkgraph.algorithms.kcore import coreness

        t0 = time.monotonic()
        res = coreness(g)
        hist = {
            int(r.coreness): int(r.n)
            for r in res.state.groupBy("coreness").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        wall = round(time.monotonic() - t0, 1)
        out["jobs"]["coreness"] = {
            "seconds": wall,
            "supersteps": res.supersteps,
            "converged": res.converged,
            "max_coreness": max(hist),
            "changed_decay": [m.changed for m in res.metrics],
        }
        print(json.dumps({"partial": out["jobs"]["coreness"]}), flush=True)

    if which in ("truss", "both"):
        from sparkgraph.algorithms.truss import k_truss

        t0 = time.monotonic()
        res = k_truss(g, k=truss_k)
        kept = res.state.count()
        wall = round(time.monotonic() - t0, 1)
        out["jobs"][f"truss_k{truss_k}"] = {
            "seconds": wall,
            "supersteps": res.supersteps,
            "converged": res.converged,
            "edges_kept": kept,
            "removed_decay": [m.changed for m in res.metrics],
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
