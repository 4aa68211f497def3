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

The driver sums partials per dst (one small Arrow collect), applies the damped
update on the dense vector, and rebroadcasts. One Spark stage per superstep —
~4× less scheduling than the relational loop — and the inner loop is C-speed.

Scale envelope: the broadcast value vector is 8 bytes/vertex — fine to ~10⁸
vertices per executor; beyond that the relational engine
(sparkgraph.algorithms.pagerank) is the path, which never materializes a
dense vector. Both produce identical results (tested to 1e-12).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import functions as F

from sparkgraph.graph import Graph
from sparkgraph.pregel import PregelResult, SuperstepMetrics

import time


def _pack_partitions(edges_sym, ids: np.ndarray):
    """edges (src,dst) → one packed row per partition: dense-index arrays."""

    # one row per partition, each holding the partition's packed arrays
    def pack_rows(batches):
        srcs, dsts = [], []
        for b in batches:
            srcs.append(b.column("src").to_numpy(zero_copy_only=False))
            dsts.append(b.column("dst").to_numpy(zero_copy_only=False))
        src = np.concatenate(srcs) if srcs else np.empty(0, dtype=np.int64)
        dst = np.concatenate(dsts) if dsts else np.empty(0, dtype=np.int64)
        src_idx = np.searchsorted(ids, src).astype(np.int64)
        dst_idx = np.searchsorted(ids, dst).astype(np.int64)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([src_idx.tobytes()], type=pa.large_binary()),
                pa.array([dst_idx.tobytes()], type=pa.large_binary()),
            ],
            names=["src_idx", "dst_idx"],
        )

    return edges_sym.select("src", "dst").mapInArrow(
        pack_rows, "src_idx binary, dst_idx binary"
    )


def pagerank_csr(
    graph: Graph,
    mode: str = "reference",
    iterations: int = 30,
    tol: float = 1e-6,
    max_iter: int = 200,
    damping: float = 0.85,
    max_broadcast_vertices: int = 100_000_000,
    target_edges_per_partition: int = 2_000_000,
    combine: str = "auto",
) -> PregelResult:
    """PageRank on CSR-packed partitions with a broadcast state vector.
    Same semantics/signature as ``algorithms.pagerank`` (reference +
    convergence modes); returns state ``(id, value)``.
    """
    if mode not in ("reference", "convergence"):
        raise ValueError(f"unknown mode {mode!r}")
    spark = graph.spark
    sc = spark.sparkContext

    # dense id universe (sorted for searchsorted packing); Arrow transfer —
    # no per-row Python even on 10⁷-vertex universes
    ids = np.sort(graph.vertices.toPandas()["id"].to_numpy(dtype=np.int64))
    n = len(ids)
    if n == 0:
        raise ValueError("graph has no vertices")
    if n > max_broadcast_vertices:
        raise ValueError(
            f"{n} vertices exceeds the dense-vector envelope "
            f"({max_broadcast_vertices}); use the relational pagerank"
        )

    # Size pack partitions by edge volume, not by the session default: each
    # partition should hold enough edges that the numpy kernel dominates the
    # per-stage Python round-trip (the 100 TB analogue of maxPartitionBytes).
    n_edges = graph.edges_sym.count()
    parts = max(1, min(graph.num_partitions, -(-n_edges // target_edges_per_partition)))
    packed = _pack_partitions(
        graph.edges_sym.repartition(parts, "src"), ids
    ).persist()
    packed.count()  # materialize the pack once
    if combine == "auto":
        # driver-side combine skips the per-superstep shuffle stage; safe while
        # the worst-case partial volume (parts × n rows) stays small
        combine = "driver" if parts * n <= 20_000_000 else "shuffle"


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

        partials = packed.mapInArrow(scatter_gather, "idx long, partial double")
        if combine == "shuffle":
            partials = partials.groupBy("idx").agg(F.sum("partial").alias("partial"))
        agg = partials.toPandas()
        bc.destroy()
        new_x = np.full(n, teleport)
        np.add.at(
            new_x, agg["idx"].to_numpy(), damping * agg["partial"].to_numpy()
        )
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

    packed.unpersist()
    if mode == "reference":
        converged = True
    import pandas as pd

    out = spark.createDataFrame(
        pd.DataFrame({"id": ids, "value": x}), "id long, value double"
    )
    return PregelResult(state=out, supersteps=step, converged=converged, metrics=metrics)
