"""Root-cause probe for the local[2] -> local[8] efficiency gap (BENCH.md).

Separates three candidate bottlenecks by scaling three jobs with different
resource signatures across the same parallelism pair, each in a fresh JVM:

  * compute  — chained xxhash64 over spark.range: pure CPU, ~zero memory
               traffic beyond codegen registers. Scales ~linearly unless the
               scheduler/JVM itself is the limit.
  * shuffle  — wide groupBy over hashed keys: dominated by exchange write/read
               (memory bandwidth + shuffle disk). Scales with shared-bus
               bandwidth, not cores.
  * pagerank — one relational superstep loop (the real workload) for
               reference, with shuffle_partitions swept to rule out task
               granularity as the cause.

Usage: python scripts/scaling_rootcause.py [--low 2] [--high 8] [--repeat 2]
Prints one JSON line per (job, level, partitions) plus a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sparkgraph.session import get_spark

job = {job!r}
cores = {cores}
parts = {parts}
spark = get_spark("probe", master=f"local[{{cores}}]", shuffle_partitions=parts)

if job == "compute":
    # 400M rows x 4 chained hashes; whole-stage codegen, no exchange.
    # NB: Spark 4 reuses a completed result on the SAME DataFrame object, so
    # the timed run must rebuild the plan (fresh object) after the warm-up.
    def build(n):
        df = spark.range(n)
        c = F.col("id")
        for s in range(4):
            c = F.xxhash64(c, F.lit(s))
        # mod avoids ANSI long-sum overflow
        return df.select((c % 1024).alias("h")).agg(F.sum("h"))
    build(1_000_000).collect()  # JVM/codegen warm-up
    probe = build(400_000_000)
    t0 = time.monotonic()
    probe.collect()
    dt = time.monotonic() - t0
elif job == "shuffle":
    # 120M rows -> wide exchange on 30M distinct keys -> count
    def build():
        df = spark.range(120_000_000).select(
            (F.xxhash64("id") % 30_000_000).alias("k")
        )
        return df.groupBy("k").count().agg(F.sum("count"))
    build().collect()  # warm
    probe = build()
    t0 = time.monotonic()
    probe.collect()
    dt = time.monotonic() - t0
else:  # pagerank | fixedcost | fixedcost_noaqe
    from sparkgraph.graph import Graph
    from sparkgraph.algorithms import pagerank
    from sparkgraph.io.synth import powerlaw_edges
    if job == "fixedcost_noaqe":
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    # fixedcost: a graph so small the parallel work is ~zero — superstep wall
    # time then IS the per-superstep fixed cost c(p) (scheduling, planning,
    # eager-checkpoint job latency); pagerank: the real workload
    n_e, n_v = (8_000_000, 1_000_000) if job == "pagerank" else (20_000, 5_000)
    g = Graph(powerlaw_edges(spark, n_e, n_v), num_partitions=parts)
    n_sym = g.edges_sym.count()
    _ = g.degrees.count()
    t0 = time.monotonic()
    res = pagerank(g, mode="reference", iterations=10)
    res.state.count()
    dt = time.monotonic() - t0

print("RESULT " + json.dumps({{"job": job, "cores": cores, "parts": parts,
                               "seconds": round(dt, 2)}}))
spark.stop()
"""


def run(job: str, cores: int, parts: int) -> dict:
    code = _CHILD.format(repo=REPO, job=job, cores=cores, parts=parts)
    env = dict(os.environ)
    env["SPARK_GRAFT_DRIVER_MEM"] = "8g"
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=1800, env=env)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child failed ({job}, cores={cores}):\n{proc.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()
    ratio = args.high / args.low

    results = []
    for job, parts_list in [
        ("compute", [32]),
        ("shuffle", [32]),
        ("pagerank", [32]),
        ("fixedcost", [32]),        # tiny graph: wall ≈ 10·c(p)
        ("fixedcost_noaqe", [32]),  # is AQE replanning part of c?
    ]:
        for parts in parts_list:
            lo = min(run(job, args.low, parts)["seconds"] for _ in range(args.repeat))
            hi = min(run(job, args.high, parts)["seconds"] for _ in range(args.repeat))
            eff = (lo / hi) / ratio
            row = {"job": job, "parts": parts, f"s@{args.low}": lo,
                   f"s@{args.high}": hi, "speedup": round(lo / hi, 3),
                   "efficiency": round(eff, 3)}
            results.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
