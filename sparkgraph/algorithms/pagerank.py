"""PageRank as iterative DataFrame scatter/gather (reference operator A13).

Reference semantics (worker/pagerank.go:19-49, SURVEY.md §2-note-1):
  * runs on the symmetrized unit-weight multigraph (worker/worker.go:164-199);
  * update ``x ← 0.15/N + 0.85 · Σ_{u→v} x_u / deg(u)`` (pagerank.go:30),
    N = distinct endpoints (worker/worker.go:532-534);
  * fixture ("reference") mode: values start at 0 (worker/worker.go:171) and
    exactly 30 damped updates execute (messages sent supersteps 0..29, updates
    applied 1..30) — the truncated Neumann series;
  * no dangling-node mass exists: after symmetrization every vertex has
    out-degree ≥ 1 (SURVEY.md §1.4.4).

Two halting modes:
  * mode="reference": fixed ``iterations`` updates from the zeros vector —
    bit-faithful to the fixture graphs;
  * mode="convergence": start from the uniform 1/N vector and stop when
    ``max |x_k − x_{k−1}| < tol`` (BASELINE.json's 1e-6 metric). The damped
    fixpoint is unique, so both modes agree in the limit.

Spark plan per superstep: one scatter join (edge table pre-partitioned by
``src``, never reshuffled) + one ``groupBy(dst).sum`` whose map-side partial
aggregation subsumes the reference's per-VM message combiner
(worker/worker.go:269-284) + one state outer-join. The shuffle IS the barrier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkgraph.graph import Graph
from sparkgraph.pregel import Checkpointer, PregelResult, SuperstepLoop, truncate_lineage


def pagerank(
    graph: Graph,
    mode: str = "reference",
    iterations: int = 30,
    tol: float = 1e-6,
    max_iter: int = 200,
    damping: float = 0.85,
    checkpointer: Checkpointer | None = None,
    resume: bool = False,
    salting_threshold: int | None = None,
    salts: int = 16,
    reset_to: int | None = None,
    weighted: bool = False,
    eager_checkpoint: bool | None = None,
    initial_state: DataFrame | None = None,
) -> PregelResult:
    """Returns state ``(id, value)``; ``result.metrics`` carries per-superstep
    wall time and (in convergence mode) the max-abs delta.

    ``salting_threshold``: when set, gathers for vertices whose symmetrized
    degree exceeds it run through the explicit two-phase salted aggregation
    (sparkgraph.skew) instead of the single-phase groupBy — the escape hatch
    for hub skew beyond what map-side partial aggregation + AQE absorb.

    ``reset_to``: personalized PageRank — the teleport mass (1−damping) lands
    entirely on this vertex instead of uniformly on all N (random walk with
    restart). Scores are the restart vertex's proximity distribution.

    ``weighted``: contributions proportional to edge weight
    (``value·w/Σw(out)``) instead of the reference's uniform ``value/deg``
    (weights are hard-coded 1.0 in the reference loader, worker/worker.go:165
    — both modes agree on unit-weight graphs).

    ``eager_checkpoint``: default (None) = lazy per-superstep checkpoints in
    reference mode — the plan is truncated each superstep but the whole
    fixed-iteration loop executes as ONE job at the terminal action,
    amortizing per-job scheduling/AQE-planning fixed cost (NB: per-superstep
    ``metrics.seconds`` then measure plan construction, not execution).
    Convergence mode is always effectively eager (the delta collect runs the
    superstep); pass True to force eager jobs for per-superstep timing.

    ``initial_state``: optional ``(id, value)`` warm start (convergence
    mode) — e.g. the previous scores of an incrementally growing graph. The
    damped iteration converges to the same fixpoint from any start, so this
    trades no correctness for far fewer supersteps when the graph changed
    little. Vertices absent from it start at the cold init; stale ids are
    dropped."""
    if mode not in ("reference", "convergence"):
        raise ValueError(f"unknown mode {mode!r}")
    if eager_checkpoint is None:
        eager_checkpoint = mode == "convergence"
    spark = graph.spark
    n = graph.num_vertices
    if n == 0:
        raise ValueError("graph has no vertices (empty or comment-only input)")
    if reset_to is None:
        teleport_col = F.lit((1.0 - damping) / n)
    else:
        teleport_col = F.when(
            F.col("id") == reset_to, F.lit(1.0 - damping)
        ).otherwise(F.lit(0.0))
    edges = graph.edges_sym

    loop = SuperstepLoop(
        "pagerank",
        {"mode": mode, "iterations": iterations, "tol": tol, "damping": damping,
         "n": n, "reset_to": reset_to},
        checkpointer,
        resume,
    )

    init_value = 0.0 if mode == "reference" else 1.0 / n
    restored = loop.try_resume(spark)
    if restored is not None:
        start_step, state = restored
        state = truncate_lineage(state.select("id", "deg", "value"))
    else:
        start_step = 0
        deg_src = (
            graph.weighted_degrees.withColumnRenamed("wdeg", "deg")
            if weighted
            else graph.degrees
        )
        base = graph.vertices.join(deg_src, "id")
        if initial_state is not None:
            warm = initial_state.select("id", F.col("value").alias("warm"))
            base = base.join(warm, "id", "left")
            value_col = F.coalesce("warm", F.lit(init_value))
        else:
            value_col = F.lit(init_value)
        state = truncate_lineage(
            base.select(
                "id", F.col("deg").cast("double").alias("deg"),
                value_col.alias("value"),
            )
        )

    hubs = None
    if salting_threshold is not None:
        from sparkgraph.skew import top_degree_hubs

        hubs = top_degree_hubs(graph.degrees, salting_threshold).persist()
        hubs.count()

    step = start_step
    converged = False
    while True:
        if mode == "reference":
            if step >= iterations:
                break
        elif step >= max_iter:
            break
        loop.step_started()
        step += 1

        # Scatter (A5): contribution value/deg along every symmetrized edge.
        src_state = state.select(
            F.col("id").alias("src"), (F.col("value") / F.col("deg")).alias("contrib")
        )
        # shuffle-hash: build on the (small) state side, stream the persisted
        # pre-partitioned edge side without re-sorting it each superstep
        msg_expr = (
            (F.col("contrib") * F.col("weight")) if weighted else F.col("contrib")
        )
        msgs = edges.join(src_state.hint("shuffle_hash"), "src").select(
            "dst", msg_expr.alias("msg")
        )
        # Gather (A6+A7): sum per destination; partial agg before the shuffle.
        if hubs is not None:
            from sparkgraph.skew import salted_message_sum

            sums = salted_message_sum(msgs, hubs, salts=salts)
        else:
            sums = msgs.groupBy(F.col("dst").alias("id")).agg(
                F.sum("msg").alias("msum")
            )
        # Apply (A8): damped update; vertices with no messages get teleport only.
        new_state = (
            state.join(sums, "id", "left")
            .select(
                "id",
                "deg",
                (
                    teleport_col + F.lit(damping) * F.coalesce("msum", F.lit(0.0))
                ).alias("value"),
                F.col("value").alias("prev"),
            )
        )
        # Lazy fixed-iteration runs truncate every SECOND superstep: each
        # localCheckpoint still caches a full state copy and costs a plan
        # round-trip, and a 2-superstep plan is far from the analysis
        # blow-up point (measured: cadence 2 ≈ cadence 5 ≈ −13% vs every
        # superstep; never truncating is 3× slower). Eager/convergence mode
        # keeps per-superstep truncation (the delta action materializes
        # every step anyway).
        if eager_checkpoint or step % 2 == 0 or (
            mode == "reference" and step >= iterations
        ):
            new_state = truncate_lineage(new_state, eager=eager_checkpoint)

        delta = None
        if mode == "convergence":
            delta = new_state.agg(
                F.max(F.abs(F.col("value") - F.col("prev")))
            ).collect()[0][0]
        state = new_state.drop("prev")
        loop.step_done(state, step, delta=delta)
        if mode == "convergence" and delta is not None and delta < tol:
            converged = True
            break

    if mode == "reference":
        converged = True  # fixed-iteration contract fulfilled
    return loop.finish(state, step, converged, result=state.select("id", "value"))


def ppr_batch(
    graph: Graph,
    sources: list[int],
    iterations: int = 30,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank for MANY restart vertices in ONE job:
    ``(seed, id, value)`` — the batch analog of ``pagerank(reset_to=s)``
    run |sources| times, at one scatter join per superstep instead of
    |sources|. Reference-mode semantics per seed (zeros init, exactly
    ``iterations`` damped updates on the symmetrized unit multigraph).

    Scale shape: state is |V| × |seeds| rows keyed ``(seed, id)``; each
    superstep is ONE equi-join of the pre-partitioned edge table against
    the state on ``src`` (the edge side streams once regardless of seed
    count) + one map-side-combined ``groupBy(seed, dst)`` sum. This is the
    production shape for "proximity scores for a panel of query nodes"
    (seed-set expansion, related-files-for-these-k-files): per-seed loops
    re-pay the edge scan |seeds| times; the batch pays it once. Memory is
    the state size — for |seeds| beyond ~hundreds shard the seed list and
    union results.

    NOTE: a seed id absent from the graph contributes an all-zero
    distribution (its teleport predicate never matches) — no error is
    raised, mirroring ``pagerank(reset_to=...)``; anti-join your seed list
    against ``graph.vertices`` first if typo'd ids must be caught."""
    if not sources:
        raise ValueError("sources must be non-empty")
    spark = graph.spark
    edges = graph.edges_sym
    seeds = spark.createDataFrame(
        [(int(s),) for s in sorted(set(sources))], "seed long"
    )
    base = graph.vertices.join(graph.degrees, "id").crossJoin(F.broadcast(seeds))
    state = base.select(
        "seed", "id", F.col("deg").cast("double").alias("deg"),
        F.lit(0.0).alias("value"),
    )
    for it in range(iterations):
        src_state = state.select(
            "seed",
            F.col("id").alias("src"),
            (F.col("value") / F.col("deg")).alias("contrib"),
        )
        msgs = edges.join(src_state.hint("shuffle_hash"), "src").select(
            "seed", "dst", F.col("contrib").alias("msg")
        )
        sums = msgs.groupBy("seed", F.col("dst").alias("id")).agg(
            F.sum("msg").alias("msum")
        )
        teleport = F.when(
            F.col("id") == F.col("seed"), F.lit(1.0 - damping)
        ).otherwise(F.lit(0.0))
        state = state.join(sums, ["seed", "id"], "left").select(
            "seed",
            "id",
            "deg",
            (teleport + F.lit(damping) * F.coalesce("msum", F.lit(0.0))).alias(
                "value"
            ),
        )
        # lazy, cadence-2 truncation (see pagerank): the whole batch runs as
        # ONE job at the terminal action instead of one eager job per
        # superstep, halving the cached state copies along the way
        if it % 2 == 1 or it == iterations - 1:
            state = truncate_lineage(state, eager=False)
    return state.select("seed", "id", "value")


def top_k(result: DataFrame, k: int = 25) -> DataFrame:
    """Reference result report (A12): top-k by value descending
    (master/master.go:334-340 prints top-25 via a max-heap). Spark compiles
    this to TakeOrderedAndProject — no full sort.
    """
    return result.orderBy(F.desc("value"), F.asc("id")).limit(k)
