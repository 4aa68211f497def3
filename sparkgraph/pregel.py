"""Superstep driver utilities: lineage truncation, metrics, checkpoint/resume.

Replaces the reference's hand-rolled BSP runtime (SURVEY.md §2A A9/A10, §2B
B7/B8): the master's ACK-counted barrier (master/master.go:404-450) becomes a
driver-side Python loop where each superstep is one Spark job and the
``groupBy(dst)`` shuffle IS the barrier; the reference's restart-from-
superstep-0 fault story (master/master.go:431-445) is upgraded to
resume-from-last-completed-superstep via Parquet state checkpoints with a
JSON manifest carrying per-partition lineage and convergence metrics
(BASELINE.json north_star).
"""

from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_NAME = "_manifest.json"

_log = logging.getLogger("sparkgraph")

# Default iteration ceiling for fixpoint loops (SSSP, CC, SCC, BFS depth).
# Far above any real graph's diameter — it exists purely as a runaway guard,
# so a loop that actually HITS it did not converge; ``warn_unconverged``
# makes that visible instead of returning a silently-partial result.
MAX_FIXPOINT_ITERS = 10_000


def warn_unconverged(
    algorithm: str,
    supersteps: int,
    max_iter: int,
    knob: str = "max_iter",
    unit: str = "supersteps",
) -> None:
    """Convergence-guard log line: called by fixpoint loops that exit on an
    iteration ceiling rather than an empty frontier / zero-change round.
    ``knob``/``unit`` name the ceiling that actually fired, so the line
    points at the RIGHT lever (e.g. SCC's peel truncates on ``max_rounds``
    peel rounds, not ``max_iter`` supersteps)."""
    _log.warning(
        "%s stopped at the %s ceiling (%d of %d %s) WITHOUT reaching its "
        "fixpoint — the returned state may be partial; raise %s or inspect "
        "the frontier-decay metrics",
        algorithm, knob, supersteps, max_iter, unit, knob,
    )


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint: cuts the logical plan so iterative loops don't grow
    unbounded lineage (the classic Spark iterative-workload footgun).
    Preserves partitioning.

    ``eager=True`` materializes now — one Spark job per call, which is the
    right shape when the loop needs the data anyway (convergence deltas,
    frontier counts). ``eager=False`` truncates the plan immediately but
    defers execution to the terminal action: a fixed-iteration loop then runs
    as ONE job instead of one per superstep, amortizing the per-job
    scheduling/planning fixed cost (measured: −30% wall on a fixed-cost-bound
    graph, scripts/scaling_rootcause.py).
    """
    return df.localCheckpoint(eager=eager)


def partition_lineage(df: DataFrame, cols: list[str]) -> list[dict]:
    """Per-partition lineage fingerprint: row count + order-insensitive value
    hash per physical partition. Recorded in every checkpoint manifest so a
    resumed run can verify it restored exactly the state it wrote.
    """
    rows = (
        df.select(
            F.spark_partition_id().alias("pid"),
            F.xxhash64(*[F.col(c) for c in cols]).alias("h"),
        )
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            # XOR-fold: order-insensitive and overflow-free under ANSI mode
            F.bit_xor("h").alias("value_hash"),
        )
        .collect()
    )
    return [
        {"partition": r["pid"], "rows": r["rows"], "value_hash": str(r["value_hash"])}
        for r in sorted(rows, key=lambda r: r["pid"])
    ]


@dataclass
class SuperstepMetrics:
    superstep: int
    seconds: float
    messages: int | None = None
    changed: int | None = None
    delta: float | None = None

    def to_dict(self) -> dict:
        return {k: v for k, v in self.__dict__.items() if v is not None}


@dataclass
class PregelResult:
    state: DataFrame
    supersteps: int
    converged: bool
    metrics: list[SuperstepMetrics] = field(default_factory=list)


class Checkpointer:
    """Durable superstep checkpoints: ``<dir>/superstep=<k>/`` Parquet state +
    a manifest (superstep, metrics, per-partition lineage). ``every=k`` writes
    one checkpoint per k supersteps; ``latest()`` lets a restarted driver
    resume from the last completed checkpoint instead of superstep 0.
    """

    def __init__(self, directory: str, every: int = 5):
        self.directory = directory
        self.every = max(1, int(every))
        os.makedirs(directory, exist_ok=True)

    def _path(self, superstep: int) -> str:
        return os.path.join(self.directory, f"superstep={superstep:06d}")

    def should_save(self, superstep: int) -> bool:
        return superstep % self.every == 0

    def save(
        self,
        state: DataFrame,
        superstep: int,
        metrics: list[SuperstepMetrics],
        algorithm: str,
        params: dict | None = None,
    ) -> None:
        path = self._path(superstep)
        state.write.mode("overwrite").parquet(os.path.join(path, "state"))
        manifest = {
            "algorithm": algorithm,
            "superstep": superstep,
            "params": params or {},
            "columns": state.columns,
            "partitions": partition_lineage(state, state.columns),
            "metrics": [m.to_dict() for m in metrics],
        }
        tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(path, MANIFEST_NAME))

    def latest(self) -> tuple[int, str, dict] | None:
        """(superstep, state_path, manifest) of the newest complete checkpoint
        (one whose manifest finished writing), or None."""
        if not os.path.isdir(self.directory):
            return None
        best = None
        for name in sorted(os.listdir(self.directory)):
            mpath = os.path.join(self.directory, name, MANIFEST_NAME)
            if name.startswith("superstep=") and os.path.exists(mpath):
                with open(mpath) as f:
                    manifest = json.load(f)
                best = (
                    manifest["superstep"],
                    os.path.join(self.directory, name, "state"),
                    manifest,
                )
        return best

    def restore(self, spark) -> tuple[int, DataFrame, list[SuperstepMetrics]] | None:
        found = self.latest()
        if found is None:
            return None
        superstep, state_path, manifest = found
        state = spark.read.parquet(state_path)
        metrics = [SuperstepMetrics(**m) for m in manifest.get("metrics", [])]
        return superstep, state, metrics


class SuperstepLoop:
    """Bookkeeping shared by all iterative algorithms: wall-clock per
    superstep, optional convergence deltas, lineage truncation cadence, and
    checkpoint writes. The per-algorithm scatter/gather/apply logic stays in
    ``sparkgraph.algorithms`` — this only owns the loop mechanics (A9/A10).
    """

    def __init__(
        self,
        algorithm: str,
        params: dict | None = None,
        checkpointer: Checkpointer | None = None,
        resume: bool = False,
    ):
        self.algorithm = algorithm
        self.params = params or {}
        self.checkpointer = checkpointer
        self.resume = resume
        self.metrics: list[SuperstepMetrics] = []
        self._t0 = time.monotonic()
        self._last_saved: int | None = None

    def try_resume(self, spark) -> tuple[int, DataFrame] | None:
        if not (self.resume and self.checkpointer):
            return None
        restored = self.checkpointer.restore(spark)
        if restored is None:
            return None
        superstep, state, metrics = restored
        self.metrics = metrics
        return superstep, state

    def step_started(self) -> None:
        self._t0 = time.monotonic()

    def step_done(
        self,
        state: DataFrame,
        superstep: int,
        changed: int | None = None,
        delta: float | None = None,
        messages: int | None = None,
    ) -> None:
        self.metrics.append(
            SuperstepMetrics(
                superstep=superstep,
                seconds=round(time.monotonic() - self._t0, 6),
                messages=messages,
                changed=changed,
                delta=delta,
            )
        )
        if self.checkpointer and self.checkpointer.should_save(superstep):
            self.checkpointer.save(
                state, superstep, self.metrics, self.algorithm, self.params
            )
            self._last_saved = superstep

    def finish(
        self, state: DataFrame, superstep: int, converged: bool, result: DataFrame | None = None
    ) -> PregelResult:
        """``state`` is the FULL loop state (all columns a resume needs);
        ``result`` is the user-facing projection (defaults to ``state``)."""
        if self.checkpointer and self._last_saved != superstep:
            self.checkpointer.save(
                state, superstep, self.metrics, self.algorithm, self.params
            )
        return PregelResult(
            state=result if result is not None else state,
            supersteps=superstep,
            converged=converged,
            metrics=self.metrics,
        )
