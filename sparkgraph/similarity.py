"""Embedding similarity search over an ``array<float>`` column.

Two paths (SURVEY.md §2C added surface):
  * ``cosine_brute`` / ``cosine_topk`` — exact: per-row cosine against a
    broadcast query vector, computed with JVM higher-order functions
    (``zip_with`` + ``aggregate`` in double precision).
  * ``lsh_bucketed_topk`` — scale path: random-hyperplane LSH signatures
    bucket the corpus; only the query's bucket (and optionally its Hamming-1
    neighbors) is scanned. Hyperplanes are derived deterministically from a
    seed via xxhash64, so signatures are reproducible with no stored model.

The HOT paths (banded candidate generation and pair verification) run as
``mapInArrow`` numpy kernels that replay the JVM float64 operation sequence
bit-exactly — the HOF expressions have no codegen and evaluate interpreted
per row, ~200× slower (see the Arrow fast-path block comment below); the
single-query/top-k paths keep the pure-JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def with_cosine(
    df: DataFrame, query: list[float], vec_col: str = "embedding"
) -> DataFrame:
    """Adds ``cosine`` (double) against the constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(
        "cosine", _dot(v, q) / (_norm(v) * _norm(q))
    )


def cosine_topk(
    df: DataFrame, query: list[float], k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine (TakeOrderedAndProject — no full sort)."""
    return (
        with_cosine(df, query, vec_col)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame, threshold: float = 0.95, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).
    Exact all-pairs form — O(n²) cross join, for verification and small
    corpora; the LSH-bucketed path pre-candidates at scale (bucket on
    ``hyperplane_signature`` and only join within buckets). Per-pair cosine
    runs in the Arrow kernel (bit-identical to the HOF expressions — see the
    Arrow fast-path block comment); round + threshold stay in the JVM."""
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    pairs = a.join(b, F.col("a") < F.col("b"))
    scored = _cosine_pairs_arrow(pairs, "a", "b", "_va", "_vb")
    return (
        scored.select("a", "b", F.round("cosine", 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def hyperplane_signature(
    df: DataFrame, dim: int, n_planes: int = 16, seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bit p of ``sig`` = [v · h_p ≥ 0], where
    h_p[i] = centered hash of (seed, p, i) — deterministic, model-free."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        comps = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.xxhash64(F.lit(seed), F.lit(p), i) % 10_000_000
            ).cast("double")
            / 10_000_000.0
            - 0.5,
        )
        dot = _dot(v, comps)
        sig = sig + F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.withColumn("sig", sig)


# ---------------------------------------------------------------------------
# Arrow fast paths (guide §4.2). The higher-order-function expressions above
# (zip_with + aggregate) have NO whole-stage codegen: Spark evaluates them
# interpreted, per row, with a per-plane array allocation — measured ~0.45 ms
# per row for 16 planes × dim 64. The kernels below hand whole batches to
# numpy but keep BIT-IDENTICAL float64 semantics by replaying the exact JVM
# operation sequence element-wise across the batch:
#   dot  = ((0.0 + v0·h0) + v1·h1) + …      (aggregate's left fold)
#   norm = sqrt(((0.0 + v0²) + v1²) + …)
#   cos  = dot / (norm_a · norm_b)
# IEEE-754 double ops are deterministic and identical in numpy and the JVM,
# so equal inputs in the same order give equal bits; rounding/thresholding
# stays in JVM expressions. The hyperplane components are data-independent
# CONSTANTS — they are evaluated once per (dim, n_planes, seed) by a tiny
# Spark job running the SAME xxhash64 expression, then memoized.

_PLANE_CACHE: dict[tuple[int, int, int], "object"] = {}


def _plane_components(spark, dim: int, n_planes: int, seed: int):
    """(n_planes, dim) float64 matrix of hyperplane components, value-exact
    vs the per-row expression in ``hyperplane_signature`` (same xxhash64
    over the same int32 literals, same %, /, − chain)."""
    import numpy as np

    key = (dim, n_planes, seed)
    got = _PLANE_CACHE.get(key)
    if got is None:
        p = (F.col("id") / F.lit(dim)).cast("int")
        i = (F.col("id") % F.lit(dim)).cast("int")
        rows = (
            spark.range(n_planes * dim)
            .select(
                "id",
                (
                    (F.xxhash64(F.lit(seed), p, i) % 10_000_000).cast("double")
                    / 10_000_000.0
                    - 0.5
                ).alias("c"),
            )
            .collect()
        )
        mat = np.empty(n_planes * dim, dtype=np.float64)
        for r in rows:
            mat[r["id"]] = r["c"]
        got = _PLANE_CACHE[key] = mat.reshape(n_planes, dim)
    return got


def _vec_matrix(col) -> "object":
    """Arrow list<float/double> column → (n, dim) float64 matrix without a
    per-row python object pass: flatten the list buffer, reshape (every row
    has the same length by the fixed-dim embedding contract)."""
    import numpy as np

    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(len(col), -1)


def _signatures_arrow(
    df: DataFrame, planes: list, id_col: str, vec_col: str
) -> DataFrame:
    """(id, sig0..sigK): one pass computing the hyperplane signature for
    EVERY seed's plane matrix at once — bit-identical to chaining
    ``hyperplane_signature`` per seed (see block comment above)."""
    import numpy as np
    import pyarrow as pa

    n_sigs = len(planes)

    def kernel(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            V = _vec_matrix(b.column(vec_col))
            arrays = [b.column(id_col)]
            for H in planes:
                sig = np.zeros(b.num_rows, dtype=np.int64)
                for p in range(H.shape[0]):
                    acc = np.zeros(b.num_rows)
                    h = H[p]
                    for i in range(H.shape[1]):
                        acc = acc + V[:, i] * h[i]  # aggregate's left fold
                    sig |= (acc >= 0).astype(np.int64) << p
                arrays.append(pa.array(sig, type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                arrays, names=[id_col] + [f"sig{k}" for k in range(n_sigs)]
            )

    schema = f"{id_col} long, " + ", ".join(f"sig{k} long" for k in range(n_sigs))
    return df.select(id_col, vec_col).mapInArrow(kernel, schema)


def _cosine_pairs_arrow(
    pairs: DataFrame, a_col: str, b_col: str, va_col: str, vb_col: str
) -> DataFrame:
    """(a, b, cosine: double) for vector-pair rows — bit-identical to the
    ``_dot/_norm`` higher-order expressions (see block comment above).
    Rounding/threshold filtering stays with the caller, in JVM expressions."""
    import numpy as np
    import pyarrow as pa

    def kernel(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            A = _vec_matrix(batch.column(va_col))
            B = _vec_matrix(batch.column(vb_col))
            n = batch.num_rows
            dot = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for i in range(A.shape[1]):
                x = A[:, i]
                y = B[:, i]
                dot = dot + x * y
                na = na + x * x
                nb = nb + y * y
            cos = dot / (np.sqrt(na) * np.sqrt(nb))
            yield pa.RecordBatch.from_arrays(
                [batch.column(a_col), batch.column(b_col), pa.array(cos, type=pa.float64())],
                names=[a_col, b_col, "cosine"],
            )

    return pairs.select(a_col, b_col, va_col, vb_col).mapInArrow(
        kernel, f"{a_col} long, {b_col} long, cosine double"
    )


# pairs×vectors can be attached two ways (guide §8's "attach" discussion):
# join the vector table to every pair row (the 100 TB shape — vectors move
# per pair), or, when the whole corpus fits an executor broadcast, ship the
# corpus ONCE and send only (a, b) id pairs through the Python boundary.
# At 1.7 M candidate pairs × dim 64 the join shape moves ~850 MB of vector
# payload into the kernel; the broadcast shape moves ~26 MB of ids + one
# 1 MB matrix. Same float sequence, same bits.
_BCAST_CORPUS_MAX_BYTES = 256 * 1024 * 1024


def _cosine_pairs_bcast(
    cand: DataFrame, df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(a, b, cosine) for candidate id pairs, with the corpus broadcast as a
    dense float64 matrix — bit-identical to ``_cosine_pairs_arrow`` (same
    element-cast + left-fold sequence on the same values)."""
    import numpy as np
    import pyarrow as pa

    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    M = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
    bc = df.sparkSession.sparkContext.broadcast((ids, M))

    def kernel(batches):
        ids_l, mat = bc.value
        for batch in batches:
            if batch.num_rows == 0:
                continue
            a = batch.column("a").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            A = mat[np.searchsorted(ids_l, a)]
            B = mat[np.searchsorted(ids_l, b)]
            n = batch.num_rows
            dot = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for i in range(A.shape[1]):
                x = A[:, i]
                y = B[:, i]
                dot = dot + x * y
                na = na + x * x
                nb = nb + y * y
            cos = dot / (np.sqrt(na) * np.sqrt(nb))
            yield pa.RecordBatch.from_arrays(
                [batch.column("a"), batch.column("b"), pa.array(cos, type=pa.float64())],
                names=["a", "b", "cosine"],
            )

    return cand.select("a", "b").mapInArrow(kernel, "a long, b long, cosine double")


def hyperplane_banded_candidates(
    df: DataFrame, dim: int, n_planes: int = 16, bands: int = 8,
    seeds: tuple[int, ...] = (7,), id_col: str = "vec_id",
    vec_col: str = "embedding", max_bucket_size: int = 10_000,
) -> DataFrame:
    """Candidate pairs ``(a, b)`` (a < b) sharing any hyperplane-signature
    band under any seed. Per seed: ``n_planes`` bits split into ``bands``
    contiguous bands of r = n_planes/bands bits; P(candidate at cosine s) =
    1 − (1 − p^r)^bands per seed with p = 1 − arccos(s)/π, and misses multiply
    across seeds — add seeds to push recall toward 1 for low thresholds.

    ``max_bucket_size`` drops degenerate buckets (near-constant corpora)
    before the within-bucket join can go quadratic.
    """
    if n_planes % bands != 0:
        raise ValueError("bands must divide n_planes")
    r = n_planes // bands
    mask = (1 << r) - 1
    spark = df.sparkSession
    # ONE Arrow pass computes every seed's signature (bit-identical to the
    # per-seed JVM expression chain — see the Arrow fast-path block comment);
    # previously each seed re-scanned the corpus through the interpreted
    # HOF signature expression.
    planes = [_plane_components(spark, dim, n_planes, s) for s in seeds]
    sigs = _signatures_arrow(df, planes, id_col, vec_col)
    sig_cols = [f"sig{k}" for k in range(len(seeds))]
    keyed = sigs.select(
        F.col(id_col).alias("id"),
        *sig_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(seed).alias("seed"),
                        F.lit(b).alias("band"),
                        F.shiftright(f"sig{k}", b * r)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for k, seed in enumerate(seeds)
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", *sig_cols, "bb.seed", "bb.band", "bb.bucket")
    # Pin the join-key partitioning at a FIXED width before persisting:
    # the band-key table is tiny (|corpus| × seeds × bands rows) so AQE
    # coalesces its exchange to one partition — but the within-bucket
    # self-join below EXPLODES it ~|bucket|× and would then run as a single
    # serial task (measured: a 5 s one-task stage at sf0.1). An explicit
    # REPARTITION_BY_NUM is exempt from AQE coalescing, and both self-join
    # sides read the persisted layout with no further exchange.
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    keyed = keyed.repartition(n_part, "seed", "band", "bucket").persist()
    sizes = keyed.groupBy("seed", "band", "bucket").agg(
        F.count(F.lit(1)).alias("bsz")
    )
    oversized = sizes.filter(F.col("bsz") > max_bucket_size)
    dropped = oversized.limit(1).count() > 0

    def band_eq(k2: int, b2: int):
        def bv(side):
            return F.shiftright(F.col(f"{side}sig{k2}"), b2 * r).bitwiseAND(
                F.lit(mask)
            )

        return bv("a") == bv("b")

    if not dropped:
        # Emit-at-first-matching-band dedup (guide §2.4: remove the shuffle
        # outright): a pair sharing m bands appears in m bucket joins; keep
        # only the row whose (seed, band) is the pair's FIRST match —
        # computable from the two signature vectors carried on the row, so
        # the output needs NO distinct (no 2nd shuffle over the exploded
        # pair set). Valid only while no bucket was size-dropped: a dropped
        # bucket could BE the first match, suppressing a pair a later band
        # legitimately finds.
        lhs = keyed.select(
            "seed", "band", "bucket", F.col("id").alias("a"),
            *[F.col(f"sig{k}").alias(f"asig{k}") for k in range(len(seeds))],
        )
        rhs = keyed.select(
            "seed", "band", "bucket", F.col("id").alias("b"),
            *[F.col(f"sig{k}").alias(f"bsig{k}") for k in range(len(seeds))],
        )
        big = len(seeds) * bands
        first_idx = F.least(
            *[
                F.when(band_eq(k2, b2), F.lit(k2 * bands + b2)).otherwise(
                    F.lit(big)
                )
                for k2 in range(len(seeds))
                for b2 in range(bands)
            ]
        )
        seed_idx = F.lit(0)
        for k2, s in enumerate(seeds):
            seed_idx = F.when(F.col("seed") == s, F.lit(k2)).otherwise(seed_idx)
        row_idx = seed_idx * bands + F.col("band")
        return (
            lhs.join(rhs, ["seed", "band", "bucket"])
            .filter((F.col("a") < F.col("b")) & (first_idx == row_idx))
            .select("a", "b")
        )

    # degenerate-corpus fallback: drop oversized buckets, dedup by distinct
    keyed = keyed.join(
        F.broadcast(oversized), ["seed", "band", "bucket"], "left_anti"
    )
    lhs = keyed.select("seed", "band", "bucket", F.col("id").alias("a"))
    rhs = keyed.select("seed", "band", "bucket", F.col("id").alias("b"))
    return (
        lhs.join(rhs, ["seed", "band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def embedding_near_dup_pairs_lsh(
    df: DataFrame, threshold: float = 0.95, n_planes: int = 16,
    bands: int = 8, seeds: tuple[int, ...] = (7, 1009, 2603),
    id_col: str = "vec_id", vec_col: str = "embedding",
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Scale path for ``embedding_near_dup_pairs``: banded hyperplane-LSH
    candidate generation, then EXACT cosine verification of candidates only —
    ``(a, b, cosine ≥ threshold)``. Identical output to the all-pairs form
    whenever LSH recall is 1.0 (false positives are always filtered exactly);
    cost is Σ bucket² instead of n²."""
    dim = df.select(F.size(vec_col)).first()[0]
    cand = hyperplane_banded_candidates(
        df, dim, n_planes, bands, seeds, id_col, vec_col, max_bucket_size
    )
    # exact verification in the Arrow kernel (bit-identical, see block
    # comment); round + threshold stay in the JVM. Small corpora take the
    # broadcast-matrix attach (ids only cross the Python boundary); larger
    # ones keep the join attach — the 100 TB shape.
    if df.count() * dim * 8 <= _BCAST_CORPUS_MAX_BYTES:
        scored = _cosine_pairs_bcast(cand, df, id_col, vec_col)
    else:
        va = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
        vb = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
        pairs = cand.join(va, "a").join(vb, "b")
        scored = _cosine_pairs_arrow(pairs, "a", "b", "_va", "_vb")
    return (
        scored.select("a", "b", F.round("cosine", 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ivf_assign(
    df: DataFrame, centroids, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Adds ``cluster`` = argmax cosine against the (small, broadcast-by-
    closure) centroid matrix. Vectorized Arrow kernel: one matmul per batch,
    no per-row Python."""
    import numpy as np
    import pandas as pd

    cents = np.asarray(centroids, dtype=np.float64)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
            sims = v @ cents.T
            # deterministic tie-break: lowest cluster index wins
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cluster": sims.argmax(axis=1).astype("int32")}
            )

    out_schema = f"{id_col} long, cluster int"
    return df.select(id_col, vec_col).mapInPandas(assign, out_schema).join(
        df, id_col
    )


def ivf_train(
    df: DataFrame, k: int = 16, iters: int = 3, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic coarse quantizer: k-means on the unit sphere, seeded
    from the k lowest-id vectors, a FIXED number of Lloyd iterations, and
    centroids rounded to 6 dp per iteration (absorbs shuffle-order float
    noise so assignments are reproducible). Only k×dim floats ever reach the
    driver — assignment and the per-cluster mean stay distributed.

    The projected (id, vector) input is persisted ONCE for the whole training
    run: each Lloyd iteration re-runs only the Arrow assignment matmul + the
    mean aggregation against cached data instead of re-scanning the source.
    (Normalization stays inside the numpy kernel on purpose — moving it to a
    JVM expression would change summation order by an ulp and could flip
    near-tie argmax assignments that the 6 dp centroid rounding pins.)"""
    from pyspark.sql import functions as F

    cached = df.select(id_col, vec_col).persist()
    try:
        seeds = (
            cached.orderBy(id_col).limit(k).select(vec_col).collect()
        )
        centroids = [[round(float(x), 6) for x in r[0]] for r in seeds]
        for _ in range(iters):
            assigned = ivf_assign(cached, centroids, id_col, vec_col)
            means = (
                assigned.select(
                    "cluster", F.posexplode(F.col(vec_col).cast("array<double>"))
                )
                .groupBy("cluster", "pos")
                .agg(F.avg("col").alias("m"))
                .groupBy("cluster")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
                .select("cluster", F.col("ms.m").alias("centroid"))
                .collect()
            )
            new = {r.cluster: [round(float(x), 6) for x in r.centroid] for r in means}
            centroids = [new.get(c, centroids[c]) for c in range(k)]
    finally:
        cached.unpersist()
    return centroids


def ivf_index(
    df: DataFrame, centroids, id_col: str = "vec_id", vec_col: str = "embedding",
    path: str | None = None,
) -> DataFrame:
    """Build the IVF inverted-list INDEX once: assign every vector to its
    nearest centroid. This is the expensive k-dot-products-per-vector pass —
    it must run once per corpus version, never per query (``ivf_topk`` takes
    this table as its input and only filters lists).

    With ``path``, the assignment is written ``partitionBy("cluster")`` and
    read back: each inverted list is its own parquet partition, so a query's
    ``cluster IN (nprobe lists)`` filter becomes PARTITION PRUNING at the
    scan — the 100 TB shape, where a query touches nprobe/k_lists of the
    corpus bytes on disk, not just post-scan. Without ``path`` the assigned
    DataFrame is returned for the caller to persist/reuse in-session."""
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    if path is not None:
        assigned.write.mode("overwrite").partitionBy("cluster").parquet(path)
        return df.sparkSession.read.parquet(path)
    return assigned


def _ivf_resolve(
    df: DataFrame, centroids, id_col: str, vec_col: str,
    allow_assign: bool, caller: str,
) -> DataFrame:
    """Resolve the corpus argument of an IVF query to a cluster-keyed table.

    A prebuilt ``ivf_index`` table (has ``cluster``) passes through. A raw
    corpus RAISES unless ``allow_assign=True`` — per-call assignment costs a
    full corpus scan + k_lists matmul EVERY query, the exact footgun the
    build-once index exists to remove."""
    if "cluster" in df.columns:
        return df
    if not allow_assign:
        raise ValueError(
            f"{caller}: input has no 'cluster' column (not an ivf_index "
            "table). Build the index ONCE with ivf_index(...) and query "
            "that; or pass allow_assign=True to accept a one-off "
            "full-corpus assignment on THIS call (never do that in a loop)."
        )
    return ivf_assign(df, centroids, id_col, vec_col)


def ivf_validate_index(index: DataFrame, centroids) -> None:
    """Cheap sanity check that ``index`` plausibly belongs to ``centroids``:
    every cluster id must fall in ``range(len(centroids))``. ``cluster`` is
    the partition column of an ``ivf_index`` parquet table, so the min/max
    agg prunes to metadata. Catches the silent-wrong-results case of
    querying an index built from a DIFFERENT (e.g. stale) centroid set with
    more lists; identical-cardinality retrains remain the caller's
    responsibility (embed a fingerprint in the index path for that)."""
    row = index.agg(
        F.min("cluster").alias("lo"), F.max("cluster").alias("hi")
    ).collect()[0]
    k_lists = len(centroids)
    if row.lo is None:
        return  # empty index is vacuously consistent
    if row.lo < 0 or row.hi >= k_lists:
        raise ValueError(
            f"index cluster ids span [{row.lo}, {row.hi}] but centroids has "
            f"{k_lists} lists — the index was built from different centroids"
        )


def ivf_topk(
    df: DataFrame, query: list[float], centroids, k: int = 10, nprobe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    allow_assign: bool = False, validate: bool = False,
) -> DataFrame:
    """IVF search: rank centroids by cosine to the query, scan only the
    ``nprobe`` nearest inverted lists, exact-cosine top-k within them.
    Cost ≈ (nprobe/k_lists)·corpus instead of the full brute-force scan;
    recall rises with nprobe (nprobe = #lists ≡ exact).

    ``df`` MUST be a prebuilt index from ``ivf_index`` (it has a ``cluster``
    column — zero assignment work per query, and partition pruning if the
    index was written partitionBy). A raw corpus without ``cluster`` RAISES
    unless ``allow_assign=True`` (per-call assignment is a one-query cost
    k_lists× the brute-force scan). ``validate=True`` runs
    ``ivf_validate_index`` first (one metadata-cheap min/max agg) to catch
    an index built from a different centroid set."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    probe = np.argsort(-(cents @ q), kind="stable")[:nprobe].tolist()
    assigned = _ivf_resolve(df, centroids, id_col, vec_col, allow_assign, "ivf_topk")
    if validate and "cluster" in df.columns:
        ivf_validate_index(df, centroids)
    bucket = assigned.filter(F.col("cluster").isin([int(p) for p in probe]))
    return cosine_topk(bucket, query, k, id_col, vec_col)


def ivf_probe_lists(
    queries: DataFrame, centroids, query_id_col: str = "query_id",
    vec_col: str = "embedding", nprobe: int = 4,
) -> DataFrame:
    """(query_id, cluster) probe pairs: rank centroids per query with one
    Arrow matmul per batch — k_lists × dim floats broadcast by closure,
    nprobe rows out per query."""
    import numpy as np
    import pandas as pd

    cents = np.asarray(centroids, dtype=np.float64)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
            order = np.argsort(-(v @ cents.T), axis=1, kind="stable")[:, :nprobe]
            yield pd.DataFrame(
                {
                    query_id_col: np.repeat(
                        pdf[query_id_col].to_numpy(), order.shape[1]
                    ),
                    "cluster": order.ravel().astype("int32"),
                }
            )

    return queries.select(query_id_col, vec_col).mapInPandas(
        probe, f"{query_id_col} long, cluster int"
    )


def ivf_topk_batch(
    index: DataFrame, queries: DataFrame, centroids, k: int = 10,
    nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
    query_id_col: str = "query_id", allow_assign: bool = False,
    validate: bool = False,
) -> DataFrame:
    """Batch ANN: answer MANY queries in ONE job over a PREBUILT
    ``ivf_index`` table — the realistic serving shape (ANN queries arrive in
    batches; per-query jobs waste a scan each). Returns
    ``(query_id, vec_id, cosine, rank)`` with rank ≤ k per query.

    Plan: per-query centroid ranking (one Arrow matmul) → (query, cluster)
    probe pairs → equi-join against the cluster-keyed index (each query
    touches only its nprobe inverted lists; Σ candidate rows ≈
    n_queries·nprobe/k_lists·corpus) → JVM-side exact cosine → per-query
    top-k window over candidates only (never the corpus)."""
    from pyspark.sql import Window

    assigned = _ivf_resolve(
        index, centroids, id_col, vec_col, allow_assign, "ivf_topk_batch"
    )
    if validate and "cluster" in index.columns:
        ivf_validate_index(index, centroids)
    probes = ivf_probe_lists(queries, centroids, query_id_col, vec_col, nprobe)
    qv = queries.select(
        query_id_col,
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    )
    cand = probes.join(assigned, "cluster").select(
        query_id_col,
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("cv"),
    )
    cos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    scored = cand.join(F.broadcast(qv), query_id_col).select(
        query_id_col, id_col, F.round(cos, 6).alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_bucketed_topk(
    df: DataFrame, query: list[float], k: int = 10, n_planes: int = 12,
    seed: int = 7, id_col: str = "vec_id", vec_col: str = "embedding",
    hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane signature is
    within ``hamming`` bits of the query's. Recall improves with more probes
    (hamming buckets); cost is |bucket| instead of |corpus|."""
    dim = len(query)
    spark = df.sparkSession
    signed = hyperplane_signature(df, dim, n_planes, seed, vec_col)
    qdf = hyperplane_signature(
        spark.createDataFrame([(query,)], f"{vec_col} array<double>"),
        dim, n_planes, seed, vec_col,
    )
    qsig = qdf.collect()[0]["sig"]
    probes = [qsig]
    if hamming >= 1:
        probes += [qsig ^ (1 << p) for p in range(n_planes)]
    bucket = signed.filter(F.col("sig").isin(probes))
    return cosine_topk(bucket, query, k, id_col, vec_col)
