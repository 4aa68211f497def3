"""CSR-packed Arrow gather-scatter kernel (reference operator A4's CSR variant,
BASELINE.json north_star: "vectorized Arrow UDFs over CSR-packed edge
partitions ... a hash-partitioned edge table joined to a broadcast-or-shuffled
vertex-state table").

Strategy: pack each hash partition of the symmetrized edge table ONCE into
dense numpy index arrays (the per-partition CSR the reference builds as Go
maps, worker/worker.go:152-212), persist the packed form, then run each
superstep as a single ``mapInArrow`` pass that:

  1. reads the broadcast vertex-value vector (numpy float64, one slot per
     dense vertex index),
  2. computes all contributions vectorized (``values[src]/deg[src]``),
  3. pre-aggregates per destination inside the partition with ``np.bincount``
     (map-side combine — the reference's per-VM combiner, worker.go:269-284),
  4. emits only the touched (dst_idx, partial_sum) pairs.

The partials reach the driver as per-partition PACKED BLOBS (one binary row
per partition: int64 idx array + float64 value array), never as per-vertex
Arrow rows — the driver merges ≤ `parts` blobs with ``np.add.at`` /
``np.minimum.at``, applies the damped update on the dense vector, and
rebroadcasts. In ``combine="shuffle"`` mode the per-dst sum itself stays
distributed (groupBy before packing), so the driver's work is a single
assignment scatter over ≤ V unique indices.

Scale envelope — this is a FAST PATH, not the scale path: the kernel
materializes the dense state vector on the driver and broadcasts it each
superstep, so its contract is graphs up to 10⁷ vertices (80 MB vector — the
measured-safe bound on this class of driver; the constructor raises beyond
it, callers may consciously raise the limit to ~10⁸/800 MB where their
driver allows). The relational engine (sparkgraph.algorithms.pagerank) is
the 100 TB path: state never leaves the cluster, and it is what the CLI and
gate use by default. Both produce identical results (tested to 1e-12).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F

from sparkgraph.graph import Graph
from sparkgraph.pregel import MAX_FIXPOINT_ITERS, PregelResult, SuperstepMetrics, warn_unconverged

import time


def _pack_partitions(edges_sym, ids: np.ndarray):
    """edges (src,dst,weight) → one packed row per partition: dense-index
    arrays + weights (the per-partition CSR reused across all supersteps)."""

    def pack_rows(batches):
        srcs, dsts, ws = [], [], []
        for b in batches:
            srcs.append(b.column("src").to_numpy(zero_copy_only=False))
            dsts.append(b.column("dst").to_numpy(zero_copy_only=False))
            ws.append(b.column("weight").to_numpy(zero_copy_only=False))
        src = np.concatenate(srcs) if srcs else np.empty(0, dtype=np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, dtype=np.int64)
        w = np.concatenate(ws) if ws else np.empty(0, dtype=np.float64)
        src_idx = np.searchsorted(ids, src).astype(np.int64)
        dst_idx = np.searchsorted(ids, dst).astype(np.int64)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([src_idx.tobytes()], type=pa.large_binary()),
                pa.array([dst_idx.tobytes()], type=pa.large_binary()),
                pa.array([w.astype(np.float64).tobytes()], type=pa.large_binary()),
            ],
            names=["src_idx", "dst_idx", "w"],
        )

    return edges_sym.select("src", "dst", "weight").mapInArrow(
        pack_rows, "src_idx binary, dst_idx binary, w binary"
    )


_BLOB_SCHEMA = "idx_b binary, val_b binary"


def _blob_batch(idx: np.ndarray, vals: np.ndarray):
    return pa.RecordBatch.from_arrays(
        [
            pa.array([idx.astype(np.int64).tobytes()], type=pa.large_binary()),
            pa.array([vals.astype(np.float64).tobytes()], type=pa.large_binary()),
        ],
        names=["idx_b", "val_b"],
    )


def _pack_partials(partials):
    """(idx long, partial double) rows → one (idx_b, val_b) blob row per
    partition, so the driver collects O(parts) rows instead of O(V)."""

    def pack(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        idxs, vals = [], []
        for b in batches:
            idxs.append(b.column("idx").to_numpy(zero_copy_only=False))
            vals.append(b.column("partial").to_numpy(zero_copy_only=False))
        if idxs:
            yield _blob_batch(np.concatenate(idxs), np.concatenate(vals))

    return partials.mapInArrow(pack, _BLOB_SCHEMA)


def _collect_blobs(df) -> list[tuple[bytes, bytes]]:
    """Collect (idx_b, val_b) blob rows via toPandas — the Arrow transfer
    path; DataFrame.collect() would fall back to JVM pickling, measurably
    slower for multi-MB binary columns."""
    pdf = df.toPandas()
    return list(zip(pdf["idx_b"], pdf["val_b"]))


def _merge_blobs(blobs, out: np.ndarray, op) -> None:
    """Driver-side merge of collected blobs into the dense vector with
    ``op`` (np.add / np.minimum) applied element-wise at the packed indices."""
    for idx_b, val_b in blobs:
        idx = np.frombuffer(idx_b, dtype=np.int64)
        vals = np.frombuffer(val_b, dtype=np.float64)
        op.at(out, idx, vals)


class PackedGraph:
    """The CSR pack shared by every kernel: sorted id universe + persisted
    per-partition index arrays, sized by edge volume."""

    def __init__(self, graph: Graph, target_edges_per_partition: int = 500_000,
                 max_broadcast_vertices: int = 10_000_000):
        self.graph = graph
        self.ids = np.sort(graph.vertices.toPandas()["id"].to_numpy(dtype=np.int64))
        self.n = len(self.ids)
        if self.n == 0:
            raise ValueError("graph has no vertices")
        if self.n > max_broadcast_vertices:
            raise ValueError(
                f"{self.n} vertices exceeds the dense-vector envelope "
                f"({max_broadcast_vertices}); use the relational algorithms"
            )
        n_edges = graph.edges_sym.count()
        self.parts = max(
            1, min(graph.num_partitions, -(-n_edges // target_edges_per_partition))
        )
        # coalesce, NOT repartition: the kernel's per-partition bincount +
        # driver add/min-merge is correct under ANY edge grouping, so the
        # pack needs no src-hash shuffle at all — a narrow merge of the
        # already-persisted edges_sym partitions (guide §2.4: remove shuffles
        # outright). Measured: 4M-edge pack 5.6s → 1.8s. The 500k target
        # (was 2M) trades a little per-superstep blob-collect volume
        # (parts × touched-dst rows) for pack/scatter parallelism.
        self.packed = _pack_partitions(
            graph.edges_sym.coalesce(self.parts), self.ids
        ).persist()
        self.packed.count()

    def unpersist(self):
        self.packed.unpersist()


def packed_graph(graph: Graph, target_edges_per_partition: int = 500_000,
                 max_broadcast_vertices: int = 10_000_000) -> PackedGraph:
    """Session-cached CSR pack for ``graph``: the pack is a derived index of
    the (already persisted) symmetrized edge view — exactly the class of
    reuse ``Graph.edges_sym``/``Graph.degrees`` already provide for the
    relational algorithms, extended to the kernel twins. Repeat kernel calls
    on the same Graph object (pagerank_csr then sssp_csr, or repeated
    invocations in one session) skip the re-pack; the cache dies with the
    Graph object / session and is keyed on the pack parameters, never on
    input paths — nothing survives across runs. ``Graph.unpersist()``
    releases the cached packs too."""
    cache = graph.__dict__.setdefault("_csr_pack_cache", {})
    key = (target_edges_per_partition, max_broadcast_vertices)
    pg = cache.get(key)
    if pg is None:
        pg = PackedGraph(graph, target_edges_per_partition, max_broadcast_vertices)
        cache[key] = pg
    return pg


def pagerank_csr(
    graph: Graph,
    mode: str = "reference",
    iterations: int = 30,
    tol: float = 1e-6,
    max_iter: int = 200,
    damping: float = 0.85,
    max_broadcast_vertices: int = 10_000_000,
    target_edges_per_partition: int = 500_000,
    combine: str = "auto",
) -> PregelResult:
    """PageRank FAST PATH on CSR-packed partitions with a broadcast state
    vector — single-box/moderate-graph accelerator, ≤ 10⁷ vertices by
    contract (see module docstring; ``algorithms.pagerank`` is the scale
    path). Same semantics/signature as ``algorithms.pagerank`` (reference +
    convergence modes); returns state ``(id, value)``.
    """
    if mode not in ("reference", "convergence"):
        raise ValueError(f"unknown mode {mode!r}")
    spark = graph.spark
    sc = spark.sparkContext

    pg = packed_graph(graph, target_edges_per_partition, max_broadcast_vertices)
    ids, n, parts, packed = pg.ids, pg.n, pg.parts, pg.packed
    if combine == "auto":
        # driver-side combine skips the per-superstep shuffle stage; sensible
        # while one dense partial per task stays collect-friendly (the loop
        # partitioning below bounds total volume to ~4M (idx, value) entries)
        combine = "driver" if n <= 2_000_000 else "shuffle"
    # Decouple PACK parallelism from LOOP parallelism: packing wants many
    # partitions (parallel Arrow conversion), the driver combine wants few
    # (per-superstep collect volume is loop_parts × touched ≤ loop_parts × n
    # entries — each task now emits ONE accumulated partial). coalesce() is
    # a narrow merge of the persisted blob rows, so the pack stays wide and
    # cached while the loop reads it at bounded width.
    if combine == "driver":
        loop_parts = max(1, min(parts, 4_000_000 // max(n, 1)))
    else:
        loop_parts = parts
    run_packed = packed if loop_parts >= parts else packed.coalesce(loop_parts)


    # degree on the symmetrized multigraph, as a dense vector (Arrow path)
    deg = np.zeros(n, dtype=np.float64)
    deg_pdf = graph.degrees.toPandas()
    deg[np.searchsorted(ids, deg_pdf["id"].to_numpy(dtype=np.int64))] = deg_pdf[
        "deg"
    ].to_numpy(dtype=np.float64)

    teleport = (1.0 - damping) / n
    x = np.zeros(n) if mode == "reference" else np.full(n, 1.0 / n)
    metrics: list[SuperstepMetrics] = []
    step, converged = 0, False

    while True:
        if mode == "reference":
            if step >= iterations:
                break
        elif step >= max_iter:
            break
        t0 = time.monotonic()
        bc = sc.broadcast(x / deg)  # contribution per source, precomputed

        def scatter_gather(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            contrib = bc.value
            for b in batches:
                src_idx = np.frombuffer(b.column("src_idx")[0].as_py(), dtype=np.int64)
                dst_idx = np.frombuffer(b.column("dst_idx")[0].as_py(), dtype=np.int64)
                sums = np.bincount(dst_idx, weights=contrib[src_idx], minlength=0)
                touched = np.nonzero(sums)[0]
                yield pa.RecordBatch.from_arrays(
                    [pa.array(touched, type=pa.int64()),
                     pa.array(sums[touched], type=pa.float64())],
                    names=["idx", "partial"],
                )

        def scatter_gather_blob(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            # accumulate across every blob row in the task's partition and
            # emit ONE partial — collect volume is loop_parts × touched, not
            # blob-rows × touched (coalesced tasks hold several blob rows)
            contrib = bc.value
            acc = None
            for b in batches:
                src_idx = np.frombuffer(b.column("src_idx")[0].as_py(), dtype=np.int64)
                dst_idx = np.frombuffer(b.column("dst_idx")[0].as_py(), dtype=np.int64)
                sums = np.bincount(dst_idx, weights=contrib[src_idx], minlength=len(contrib))
                acc = sums if acc is None else acc + sums
            if acc is not None:
                touched = np.nonzero(acc)[0]
                yield _blob_batch(touched, acc[touched])

        if combine == "shuffle":
            # distributed per-dst combine; the driver sees ≤ V unique idx,
            # packed into one blob row per post-shuffle partition
            partials = run_packed.mapInArrow(
                scatter_gather, "idx long, partial double"
            ).groupBy("idx").agg(F.sum("partial").alias("partial"))
            rows = _collect_blobs(_pack_partials(partials))
        else:
            # one blob row per loop partition; driver add-merges ≤ loop_parts
            rows = _collect_blobs(
                run_packed.mapInArrow(scatter_gather_blob, _BLOB_SCHEMA)
            )
        bc.destroy()
        gathered = np.zeros(n)
        _merge_blobs(rows, gathered, np.add)
        new_x = teleport + damping * gathered
        delta = float(np.max(np.abs(new_x - x)))
        x = new_x
        step += 1
        metrics.append(
            SuperstepMetrics(
                superstep=step,
                seconds=round(time.monotonic() - t0, 6),
                delta=delta if mode == "convergence" else None,
            )
        )
        if mode == "convergence" and delta < tol:
            converged = True
            break

    # the pack stays cached on the Graph for the session (see packed_graph)
    if mode == "reference":
        converged = True
    import pandas as pd

    out = spark.createDataFrame(
        pd.DataFrame({"id": ids, "value": x}), "id long, value double"
    )
    return PregelResult(state=out, supersteps=step, converged=converged, metrics=metrics)


def _frontier_min_loop(graph: Graph, init: np.ndarray, plus_weight: bool,
                       max_iter: int, out_col: str,
                       target_edges_per_partition: int = 500_000) -> PregelResult:
    """Shared frontier min-combiner kernel (SSSP: msg = val+w; CC: msg = val).
    Per superstep one mapInArrow pass scatters from frontier sources only and
    min-combines per destination inside the partition (np.minimum.at — the
    map-side combiner); the driver min-merges ≤ parts packed blob rows
    (frontier-bounded volume, never per-vertex Arrow rows) and computes the
    next frontier mask."""
    import pandas as pd

    spark = graph.spark
    sc = spark.sparkContext
    pg = packed_graph(graph, target_edges_per_partition)
    ids, n = pg.ids, pg.n
    # bounded-collect loop partitioning (see pagerank_csr): one accumulated
    # partial per task, ≤ ~4M (idx, value) entries collected per superstep
    loop_parts = max(1, min(pg.parts, 4_000_000 // max(n, 1)))
    run_packed = (
        pg.packed if loop_parts >= pg.parts else pg.packed.coalesce(loop_parts)
    )

    val = init
    frontier = np.isfinite(val) if plus_weight else np.ones(n, dtype=bool)
    metrics: list[SuperstepMetrics] = []
    step = 0
    while step < max_iter and frontier.any():
        t0 = time.monotonic()
        bc = sc.broadcast((val, frontier))

        def scatter_min(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            # min-accumulate across every blob row in the task's partition,
            # emit ONE partial (frontier-bounded volume per task)
            v, fr = bc.value
            mins = None
            for b in batches:
                src_idx = np.frombuffer(b.column("src_idx")[0].as_py(), dtype=np.int64)
                dst_idx = np.frombuffer(b.column("dst_idx")[0].as_py(), dtype=np.int64)
                active = fr[src_idx]
                if not active.any():
                    continue
                s, d = src_idx[active], dst_idx[active]
                msg = v[s] + (
                    np.frombuffer(b.column("w")[0].as_py(), dtype=np.float64)[active]
                    if plus_weight
                    else 0.0
                )
                if mins is None:
                    mins = np.full(len(v), np.inf)
                np.minimum.at(mins, d, msg)
            if mins is not None:
                touched = np.nonzero(np.isfinite(mins))[0]
                yield _blob_batch(touched, mins[touched])

        rows = _collect_blobs(run_packed.mapInArrow(scatter_min, _BLOB_SCHEMA))
        bc.destroy()
        new_val = val.copy()
        _merge_blobs(rows, new_val, np.minimum)
        frontier = new_val < val
        val = new_val
        step += 1
        metrics.append(
            SuperstepMetrics(
                superstep=step,
                seconds=round(time.monotonic() - t0, 6),
                changed=int(frontier.sum()),
            )
        )

    # the pack stays cached on the Graph for the session (see packed_graph)
    converged = not frontier.any()  # empty frontier = true fixpoint
    if not converged:
        warn_unconverged(f"csr_frontier_min[{out_col}]", step, max_iter)
    out = spark.createDataFrame(
        pd.DataFrame({"id": ids, out_col: val}), f"id long, {out_col} double"
    )
    return PregelResult(state=out, supersteps=step, converged=converged, metrics=metrics)


def sssp_csr(graph: Graph, source: int, max_iter: int = MAX_FIXPOINT_ITERS) -> PregelResult:
    """SSSP on the CSR pack — same semantics as ``algorithms.sssp``
    (intended Pregel min-plus; +inf for unreachable)."""
    pg_ids = np.sort(graph.vertices.toPandas()["id"].to_numpy(dtype=np.int64))
    init = np.full(len(pg_ids), np.inf)
    pos = np.searchsorted(pg_ids, source)
    if pos < len(pg_ids) and pg_ids[pos] == source:
        init[pos] = 0.0
    return _frontier_min_loop(graph, init, plus_weight=True, max_iter=max_iter,
                              out_col="dist")


def cc_csr(graph: Graph, max_iter: int = MAX_FIXPOINT_ITERS) -> PregelResult:
    """Connected components (hash-min) on the CSR pack — label = min id in
    component, returned as double-typed 'component' converted to long."""
    ids = np.sort(graph.vertices.toPandas()["id"].to_numpy(dtype=np.int64))
    # labels as float64 to share the min kernel; ids are exactly representable
    # up to 2^53 — guard the envelope explicitly
    if len(ids) and (ids.max() >= 2**53 or ids.min() <= -(2**53)):
        raise ValueError("vertex ids exceed the float64-exact range (2^53); "
                         "use the relational connected_components")
    res = _frontier_min_loop(graph, ids.astype(np.float64), plus_weight=False,
                             max_iter=max_iter, out_col="component")
    out = res.state.select("id", F.col("component").cast("long").alias("component"))
    return PregelResult(state=out, supersteps=res.supersteps,
                        converged=res.converged, metrics=res.metrics)
