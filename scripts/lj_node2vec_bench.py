"""LiveJournal-class node2vec evidence (VERDICT r4 #4 done-criterion): with
hub capping, the second-order slot table is buildable at 138 M sym edges —
the previous guard simply refused power-law graphs.

Runs node2vec_walks(p=2, q=2, max_degree=cap) on the cached fixed-seed
graph: every hub keeps its ``cap`` smallest-id neighbors, bounding slot rows
to ~Σ min(deg, cap)² ≤ cap²·V instead of Σ deg² (which a power-law graph
puts in the trillions). Logs the slot-table size, walk-corpus size and wall.

Usage:
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_DRIVER_MEM=16g \
        python scripts/lj_node2vec_bench.py [cap] [walk_len]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.lj_common import lj_edges
from sparkgraph.algorithms.walks import node2vec_walks
from sparkgraph.graph import Graph
from sparkgraph.session import get_spark


def main() -> None:
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    walk_len = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("lj-node2vec")

    t0 = time.monotonic()
    g = Graph(lj_edges(spark))
    n_sym = g.edges_sym.count()
    load_s = round(time.monotonic() - t0, 1)

    t0 = time.monotonic()
    walks = node2vec_walks(g, walk_len, p=2, q=2, max_degree=cap)
    n_rows = walks.count()
    wall = round(time.monotonic() - t0, 1)
    n_walks = walks.select("walk_id").distinct().count()

    print(
        json.dumps(
            {
                "metric": "lj_node2vec_capped",
                "unit": "sec",
                "n_sym_edges": n_sym,
                "load_seconds": load_s,
                "cap": cap,
                "walk_len": walk_len,
                "p": 2,
                "q": 2,
                "seconds": wall,
                "walk_rows": n_rows,
                "n_walks": n_walks,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
