"""LiveJournal-class SSSP/CC evidence run (BENCH.md's 138 M sym-edge graph).

Round 2's LJ-scale evidence covered PageRank only; this harness runs the
frontier algorithms on the SAME fixed-seed synthetic graph (69 M input
edges / 4.8 M vertices, powerlaw_edges seed 42) to fixpoint:

  * SSSP (BFS min-plus, unit weights) from source 1
  * connected components (hash-min)

and logs the per-superstep frontier decay (changed counts) — the shape that
matters at scale: frontier algorithms' per-round cost tracks |frontier|, not
|E|, so the decay curve IS the scalability argument.

Prints one JSON line. Usage:
    SPARK_GRAFT_CPUS=32 python scripts/lj_bench.py [n_edges] [n_vertices]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkgraph.session import get_spark
from sparkgraph.graph import Graph
from sparkgraph.io.synth import powerlaw_edges
from sparkgraph.algorithms import connected_components, sssp


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 69_000_000
    n_verts = int(sys.argv[2]) if len(sys.argv) > 2 else 4_800_000
    spark = get_spark("lj-bench")

    t0 = time.monotonic()
    g = Graph(powerlaw_edges(spark, n_edges, n_verts))
    n_sym = g.edges_sym.count()
    build_s = round(time.monotonic() - t0, 1)

    out: dict = {
        "metric": "lj_frontier_fixpoint",
        "unit": "sec",
        "n_input_edges": n_edges,
        "n_vertices_param": n_verts,
        "n_sym_edges": n_sym,
        "build_seconds": build_s,
        "jobs": {},
    }

    t0 = time.monotonic()
    res = sssp(g, source=1)
    reached = res.state.filter("dist < cast('inf' as double)").count()
    wall = round(time.monotonic() - t0, 1)
    out["jobs"]["sssp_fixpoint"] = {
        "seconds": wall,
        "supersteps": res.supersteps,
        "reached": reached,
        "frontier_decay": [m.changed for m in res.metrics],
        "sym_edges_per_sec": round(n_sym * res.supersteps / wall, 1),
    }

    t0 = time.monotonic()
    res = connected_components(g)
    n_comp = res.state.select("component").distinct().count()
    wall = round(time.monotonic() - t0, 1)
    out["jobs"]["cc_fixpoint"] = {
        "seconds": wall,
        "supersteps": res.supersteps,
        "n_components": n_comp,
        "frontier_decay": [m.changed for m in res.metrics],
        "sym_edges_per_sec": round(n_sym * res.supersteps / wall, 1),
    }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
