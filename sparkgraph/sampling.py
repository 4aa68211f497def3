"""Deterministic corpus sampling and curation operators.

Training-data pipelines rarely take a corpus whole: they downsample
over-represented sources, upweight scarce languages, and keep only the
best-scoring documents per stratum. The operators here are the Spark-first
versions of those moves, with two properties the 100 TB setting demands:

  * **Deterministic** — membership is a pure function of the key (hashed
    with a salt), never of partitioning, task order, or an RNG stream; the
    same document makes the same cut on every run and every cluster layout,
    so pipelines are reproducible and incremental reruns agree with full
    runs. (`df.sample()` gives none of this.)
  * **One stateless pass** — a sample is a `filter` on a hash expression
    (predicate-pushdown friendly, no shuffle at all); per-stratum top-k is
    ONE window over the stratum key. No collect, no per-row Python.

Hash modes follow the engine-wide convention (text.py simhash/fingerprint):
``xxhash64`` for production, ``md5`` portable mode whose uniform variate an
ANSI-SQL oracle replays digit-for-digit (first 8 hex digits of
md5(key || '#' || salt) as a 32-bit integer, divided by 2^32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _uniform(key: F.Column, salt: int, hash: str) -> F.Column:
    """u(key) ∈ [0, 1) — deterministic, uniform, salt-keyed."""
    tagged = F.concat(key.cast("string"), F.lit(f"#{salt}"))
    if hash == "xxhash64":
        # xxhash64 → nonneg 32-bit range → [0,1)
        h = F.pmod(F.xxhash64(tagged), F.lit(2**32))
    elif hash == "md5":
        h = F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash mode {hash!r}")
    return h / F.lit(float(2**32))


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: int = 0,
    hash: str = "xxhash64",
) -> DataFrame:
    """Keep rows with u(key) < fraction — a deterministic Bernoulli sample.

    Same key ⇒ same verdict across runs, engines, and partitionings; a
    bigger ``fraction`` strictly grows the sample (nested samples for free:
    the 1 % sample is a subset of the 10 % sample at the same salt). Change
    ``salt`` for an independent resample.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_uniform(F.col(key_col), salt, hash) < fraction)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: int = 0,
    hash: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic rates: keep a row iff u(key) < the rate of
    its stratum (``default_fraction`` for strata not in ``fractions``).
    The standard rebalancing move (downsample the dominant crawl, keep all
    of the scarce source) as one stateless filter — no groupBy, no shuffle.
    """
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1]")
    rate = F.lit(float(default_fraction))
    for s, f in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == s, float(f)).otherwise(rate)
    return df.filter(_uniform(F.col(key_col), salt, hash) < rate)


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    descending: bool = True,
    tie_col: str | None = None,
) -> DataFrame:
    """The k best rows of every group — quality-curation's workhorse
    ("keep the 1000 highest-scoring documents per domain"). ONE window
    (rank within group), deterministic under ties via ``tie_col``
    (defaults to ``order_col`` only — pass the row key for full
    determinism when scores collide).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
