"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2C: "no streaming") — this module is
added engine surface: incremental maintenance of the link graph's ingest-side
aggregates, expressed as standard Structured Streaming plans so watermarks,
state store, and exactly-once sinks come from Spark.

Patterns covered:
  * ``stream_edges_from_files`` — an edge-list/parquet directory as an
    unbounded source; new files are discovered per micro-batch (the streaming
    analogue of the reference's SDFS PUT-then-recompute cycle, B1/A1).
  * ``streaming_degrees`` — running per-vertex degree counts (update mode),
    i.e. the incremental form of Graph.degrees.
  * ``windowed_event_counts`` — event-time tumbling windows with a watermark
    for late data, over an (ts, user_id, …) event stream.
  * ``streaming_dedup`` — exact near-real-time dedup: drop rows whose
    content sha256 was already seen, bounded by a watermark.

Use ``trigger(availableNow=True)`` in tests/benches for deterministic
drain-everything semantics.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkgraph.io.edgelist import _EDGE_RE
from sparkgraph.pregel import MAX_FIXPOINT_ITERS


def _read_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    """Batch-read ``path`` if it exists, else None. Recovery-safe warm-start
    probe: a query restarted from checkpoint has an EMPTY driver-side
    ``history`` list but valid published state on disk — probing the path
    (not the in-memory history) keeps warm starts across restarts."""
    try:
        df = spark.read.parquet(path)
        df.schema  # force resolution now, inside the try
        return df
    except AnalysisException:
        return None


def _start_foreach_batch(edges: DataFrame, process, checkpoint_dir: str | None):
    """foreachBatch + availableNow, with an optional real checkpoint so a
    later call resumes batch numbering instead of re-binning from scratch."""
    w = edges.writeStream.foreachBatch(process)
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w.trigger(availableNow=True).start()


def stream_edges_from_files(spark: SparkSession, path: str) -> DataFrame:
    """Streaming version of io.edgelist.read_edgelist: text files appearing
    under ``path`` become (src, dst, weight) rows, same parse semantics."""
    lines = spark.readStream.format("text").load(path)
    return (
        lines.select(
            F.regexp_extract("value", _EDGE_RE, 1).alias("src_s"),
            F.regexp_extract("value", _EDGE_RE, 2).alias("dst_s"),
        )
        .filter((F.col("src_s") != "") & (F.col("dst_s") != ""))
        .select(
            F.col("src_s").cast("long").alias("src"),
            F.col("dst_s").cast("long").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )


def streaming_degrees(edges: DataFrame) -> DataFrame:
    """Running symmetrized degree per vertex (update output mode)."""
    sym = edges.select(F.col("src").alias("id")).unionByName(
        edges.select(F.col("dst").alias("id"))
    )
    return sym.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window counts with late-data watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def streaming_dedup(
    docs: DataFrame, ts_col: str = "ts", text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-per-content pass-through: drops rows whose sha256(text)
    appeared before (within watermark bounds — state is GC'd past it)."""
    return (
        docs.withColumn("content_sha", F.sha2(F.col(text_col), 256))
        .withWatermark(ts_col, watermark)
        .dropDuplicates(["content_sha"])
    )


def sessionized_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows (gap-based) per key — the declarative path: Spark's
    built-in ``session_window`` handles state, merging, and watermark GC."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def ewma_per_user(
    events: DataFrame,
    alpha: float = 0.3,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key
    exponentially-weighted moving average of ``value`` maintained across
    micro-batches (state = (count, ewma)). The kind of per-key logic
    session_window/agg can't express — the intended use of the arbitrary
    stateful API. Emits one row per key per micro-batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        (k,) = key
        cnt, ewma = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for v in pdf[value_col].astype(float):
                ewma = v if cnt == 0 else alpha * v + (1 - alpha) * ewma
                cnt += 1
        state.update((cnt, float(ewma)))
        yield pd.DataFrame(
            {key_col: [k], "n_events": [cnt], "ewma": [round(float(ewma), 9)]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} long, n_events long, ewma double",
        stateStructType="cnt long, ewma double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_pagerank(
    edges: DataFrame,
    work_dir: str,
    tol: float = 1e-6,
    damping: float = 0.85,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
):
    """Incremental PageRank over an unbounded edge stream: each micro-batch
    appends its edges to the accumulated parquet edge table, recomputes
    convergence-mode PageRank on the FULL graph warm-started from the
    previous batch's scores, and atomically publishes ``<work_dir>/scores``.

    The warm start is the incremental part: the damped iteration converges to
    the same fixpoint from any start vector, so when a micro-batch perturbs
    the graph slightly, convergence takes a handful of supersteps instead of
    a cold run's dozens (tests assert both the equivalence and the superstep
    saving). History per batch lands in ``query.history`` on the returned
    handle: (batch_id, supersteps, n_vertices).

    Exactly-once: each micro-batch writes its edges to a batch_id-keyed
    subdirectory with mode=overwrite, so a replayed batch (failure recovery
    with checkpointLocation set — Spark re-runs foreachBatch with the SAME
    batch_id and data) rewrites the same subdir instead of duplicating edges.
    foreachBatch itself gives at-least-once; the keyed overwrite makes the
    edge accumulation idempotent.
    """
    import os

    from sparkgraph.algorithms import pagerank
    from sparkgraph.graph import Graph

    edges_dir = os.path.join(work_dir, "edges")
    scores_dir = os.path.join(work_dir, "scores")
    history: list[dict] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Hive-style batch_id=N subdir: a replayed micro-batch (same batch_id,
        # same data) overwrites its own subdir instead of duplicating edges,
        # and a plain spark.read.parquet(edges_dir) still sees every batch
        # via partition discovery.
        batch_df.select("src", "dst", "weight").write.mode("overwrite").parquet(
            os.path.join(edges_dir, f"batch_id={batch_id}")
        )
        g = Graph(spark.read.parquet(edges_dir))
        warm = _read_if_exists(spark, scores_dir)  # survives query restarts
        res = pagerank(
            g, mode="convergence", tol=tol, damping=damping, max_iter=max_iter,
            initial_state=warm,
        )
        out = res.state.select("id", "value")
        out.write.mode("overwrite").parquet(scores_dir)
        history.append(
            {"batch_id": batch_id, "supersteps": res.supersteps,
             "n_vertices": g.num_vertices}
        )

    q = _start_foreach_batch(edges, process, checkpoint_dir)
    q.history = history  # type: ignore[attr-defined]
    return q


def streaming_connected_components(
    edges: DataFrame,
    work_dir: str,
    max_iter: int = MAX_FIXPOINT_ITERS,
    checkpoint_dir: str | None = None,
):
    """Incremental connected components over an edge stream: per micro-batch,
    append edges, re-run hash-min CC warm-started from the previous labels
    (new edges only merge components, and an old label is a valid id inside
    its grown component — see connected_components docstring), publish
    ``<work_dir>/labels``. Same handle + idempotence contract as
    streaming_pagerank (batch_id-keyed overwrite)."""
    import os

    from sparkgraph.algorithms import connected_components
    from sparkgraph.graph import Graph

    edges_dir = os.path.join(work_dir, "edges")
    labels_dir = os.path.join(work_dir, "labels")
    history: list[dict] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # Hive-style batch_id=N subdir: a replayed micro-batch (same batch_id,
        # same data) overwrites its own subdir instead of duplicating edges,
        # and a plain spark.read.parquet(edges_dir) still sees every batch
        # via partition discovery.
        batch_df.select("src", "dst", "weight").write.mode("overwrite").parquet(
            os.path.join(edges_dir, f"batch_id={batch_id}")
        )
        g = Graph(spark.read.parquet(edges_dir))
        warm = _read_if_exists(spark, labels_dir)  # survives query restarts
        res = connected_components(g, max_iter=max_iter, initial_labels=warm)
        res.state.select("id", "component").write.mode("overwrite").parquet(labels_dir)
        history.append(
            {"batch_id": batch_id, "supersteps": res.supersteps,
             "n_vertices": g.num_vertices}
        )

    q = _start_foreach_batch(edges, process, checkpoint_dir)
    q.history = history  # type: ignore[attr-defined]
    return q


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "update"
) -> DataFrame:
    """Drain all currently-available input into an in-memory table and return
    it as a batch DataFrame (test/bench helper — availableNow trigger)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def streaming_triangle_count(
    edges: DataFrame, work_dir: str, checkpoint_dir: str | None = None
):
    """Incremental triangle counting over an edge stream: per micro-batch,
    append edges (batch_id-keyed, idempotent — same contract as
    streaming_pagerank), enumerate ONLY the triangles that contain at least
    one genuinely-new simple edge (a triangle with a new edge cannot have
    existed before, so the deduped enumeration IS the delta — the same
    affected-seeded shape as the incremental k-truss), and accumulate.

    Per-batch cost is O(wedges incident to new edges), never a full
    triangle pass over the accumulated graph. ``query.history`` carries
    (batch_id, new_edges, delta, total); the running total is published to
    ``<work_dir>/count``.

    Restart safety: per-batch DELTAS are persisted batch_id-keyed (same
    idempotent-overwrite contract as the edges), and the published total is
    the SUM of persisted deltas — not a driver-memory accumulator — so a
    query recovered from checkpoint (empty ``history``, batch numbering
    continuing) republishes the correct total instead of restarting the
    count from the recovered batch's delta."""
    import os

    edges_dir = os.path.join(work_dir, "edges")
    deltas_dir = os.path.join(work_dir, "deltas")
    count_dir = os.path.join(work_dir, "count")
    history: list[dict] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.select("src", "dst", "weight").write.mode("overwrite").parquet(
            os.path.join(edges_dir, f"batch_id={batch_id}")
        )
        allb = spark.read.parquet(edges_dir)

        def simple(df):
            return (
                df.select(
                    F.least("src", "dst").alias("u"),
                    F.greatest("src", "dst").alias("v"),
                )
                .filter(F.col("u") != F.col("v"))
                .distinct()
            )

        full = simple(allb).persist()
        prev = simple(allb.filter(F.col("batch_id") < batch_id))
        new = simple(allb.filter(F.col("batch_id") == batch_id)).join(
            prev, ["u", "v"], "left_anti"
        )
        # triangles containing >= 1 new edge, in the UPDATED graph: expand
        # one endpoint's adjacency, confirm the closing edge, dedupe per
        # canonical triple (a triangle closed by 2-3 new edges counts once)
        sym = full.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
            full.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        t1 = new.join(sym.select(F.col("a").alias("u"), F.col("b").alias("w")), "u")
        t2 = t1.join(
            sym.select(F.col("a").alias("v"), F.col("b").alias("w")),
            ["v", "w"],
            "left_semi",
        )
        delta = (
            t2.select(F.array_sort(F.array("u", "v", "w")).alias("t"))
            .distinct()
            .count()
        )
        n_new = new.count()
        full.unpersist()
        spark.createDataFrame([(delta,)], "delta long").write.mode(
            "overwrite"
        ).parquet(os.path.join(deltas_dir, f"batch_id={batch_id}"))
        # batch_id <= current guards against stale higher-numbered subdirs
        # left by a previous, differently-binned run of the same work_dir
        total = (
            spark.read.parquet(deltas_dir)
            .filter(F.col("batch_id") <= batch_id)
            .agg(F.coalesce(F.sum("delta"), F.lit(0)))
            .collect()[0][0]
        )
        spark.createDataFrame(
            [(batch_id, total)], "batch_id long, n_triangles long"
        ).write.mode("overwrite").parquet(count_dir)
        history.append(
            {"batch_id": batch_id, "new_edges": n_new, "delta": delta, "total": total}
        )

    q = _start_foreach_batch(edges, process, checkpoint_dir)
    q.history = history  # type: ignore[attr-defined]
    return q
