"""Subprocess body for the fault-injection test (own SparkSession with
``local[4,2]`` so tasks RETRY — the session-wide test fixture uses plain
local[] where any task failure kills the job).

Injects a first-attempt task failure into the edge pipeline (the reference's
fault story is worker death mid-superstep, master/master.go:431-445; Spark's
analogue is task retry), runs SSSP with per-superstep checkpoints, and checks

  1. the job completes THROUGH the injected failures (Spark retry),
  2. the result equals an uninjected run,
  3. a resume from the checkpoint directory reproduces the same state
     (retry and checkpoint/restart compose).

Prints one JSON line; exit code 0 iff all three hold.
"""

import json
import sys

from pyspark.sql import SparkSession

FAIL_LOG = None  # set in main; the injected kernel appends marker lines


def main(ckdir: str, marker_path: str) -> int:
    spark = (
        SparkSession.builder.master("local[4,2]")
        .appName("sparkgraph-fault-inject")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sparkgraph.algorithms import sssp
    from sparkgraph.graph import Graph
    from sparkgraph.pregel import Checkpointer

    # a 2-component graph: path 0..9 plus a triangle island
    pairs = [(i, i + 1) for i in range(9)] + [(20, 21), (21, 22), (22, 20)]
    edges = spark.createDataFrame(pairs, "src long, dst long")

    def flaky(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc is not None and tc.partitionId() == 0 and tc.attemptNumber() == 0:
            with open(marker_path, "a") as f:
                f.write(f"injected stage={tc.stageId()}\n")
            raise RuntimeError("injected fault: first attempt of partition 0")
        yield from batches

    flaky_edges = edges.repartition(4, "src").mapInPandas(
        flaky, "src long, dst long"
    )

    ck = Checkpointer(ckdir, every=1)
    res_f = sssp(Graph(flaky_edges), source=0, checkpointer=ck)
    got = sorted((r.id, r.dist) for r in res_f.state.collect())

    res_c = sssp(Graph(edges), source=0)
    want = sorted((r.id, r.dist) for r in res_c.state.collect())

    # driver-restart composition: resume from the last checkpoint (fresh
    # loop, no injection) must reproduce the same fixpoint
    res_r = sssp(Graph(edges), source=0, checkpointer=ck, resume=True)
    resumed = sorted((r.id, r.dist) for r in res_r.state.collect())

    n_injected = sum(1 for _ in open(marker_path))
    ok = got == want == resumed and res_f.converged and n_injected >= 1
    print(
        json.dumps(
            {
                "match": got == want,
                "resumed_match": resumed == want,
                "converged": bool(res_f.converged),
                "supersteps": res_f.supersteps,
                "n_injected_failures": n_injected,
            }
        )
    )
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
