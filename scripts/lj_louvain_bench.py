"""LiveJournal-class Louvain evidence run (VERDICT r3 #7).

Runs fixed-seed ``louvain_move`` (4 synchronous gain-moving rounds) on the
SAME 138 M sym-edge / 4.8 M vertex powerlaw graph as scripts/lj_bench.py and
logs per-round wall time + moved-count decay. The claim under test: each
round is ONE scatter join (edges ⋈ labels) + two bounded aggregations
(louvain.py _move_phase) — per-round cost tracks |E| once, with no
per-round driver pulls beyond two scalar counts, so the plan holds at this
scale without modification.

Prints one JSON line. Usage:
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_DRIVER_MEM=16g \
        python scripts/lj_louvain_bench.py [n_edges] [n_vertices] [rounds]
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
from sparkgraph.algorithms.louvain import louvain_move


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 69_000_000
    n_verts = int(sys.argv[2]) if len(sys.argv) > 2 else 4_800_000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark("lj-louvain")

    t0 = time.monotonic()
    g = Graph(powerlaw_edges(spark, n_edges, n_verts))
    n_sym = g.edges_sym.count()
    build_s = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    res = louvain_move(g, rounds=rounds)
    n_comm = res.state.select("label").distinct().count()
    wall = round(time.monotonic() - t0, 1)

    print(json.dumps({
        "metric": "lj_louvain_move",
        "unit": "sec",
        "n_input_edges": n_edges,
        "n_vertices_param": n_verts,
        "n_sym_edges": n_sym,
        "build_seconds": build_s,
        "rounds": rounds,
        "seconds": wall,
        "seconds_per_round": round(wall / max(rounds, 1), 1),
        "n_communities": n_comm,
        "moved_decay": [m.changed for m in res.metrics],
        "per_round_seconds": [m.seconds for m in res.metrics],
        "sym_edges_per_round_per_sec": round(n_sym * rounds / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
