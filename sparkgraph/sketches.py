"""Distributed cardinality sketches (HyperLogLog) as pure JVM column math.

The reference engine has no sketches at all (its only aggregate surface is
the PageRank/SSSP message reduce, worker/worker.go:400-406); a 100 TB
corpus pipeline needs approximate distinct counts constantly (users per
segment, unique tokens per shard, URL dedup sizing) where an exact
``COUNT(DISTINCT)`` is a full shuffle of every distinct value. HLL registers
are a ``groupBy(bucket).agg(max(rho))`` — the shuffle carries at most
``m = 2**b`` rows PER GROUP no matter how many billions of rows flow in,
and register tables from disjoint shards merge by ``max`` (the streaming /
multi-day rollup shape).

Portability is the design constraint here: the hash is md5-hex-digit
arithmetic (same trick as sampling.py's portable uniform), so a DuckDB /
ANSI-SQL twin reproduces the registers digit-for-digit — the correctness
gate can value-check an *approximate* operator exactly. Flajolet et al.
2007 (HyperLogLog) with the standard small-range linear-counting
correction; no bias table (we pin determinism, not the last 1% of error).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# alpha_m from Flajolet et al. §4 for m >= 128
def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


# md5 hex layout: digits 1..3 -> 12-bit bucket field, digits 4..16 -> the
# 52-bit window whose leading-zero count gives rho.
_RHO_DIGITS = 13


def _hex_int(h: Column, start: int, n: int) -> Column:
    """Integer value of n hex digits (1-based start) of an md5 hex string.
    Spark-side this is ``conv(..., 16, 10)`` (JVM-native); the SQL twin in
    ``hll_sql`` spells the same value as explicit strpos digit arithmetic
    because DuckDB/ANSI has no conv(). Both produce the identical integer,
    which is all the register math needs."""
    return F.conv(F.substring(h, start, n), 16, 10).cast("long")


def _rho(h: Column) -> Column:
    """1 + number of leading zero bits of the 52-bit window (md5 hex digits
    4..16); 53 when the window is all zeros. String math only: count the
    leading zero hex digits, then CASE on the first non-zero digit."""
    window = F.substring(h, 4, _RHO_DIGITS)
    stripped = F.regexp_replace(window, r"^0+", "")
    z = F.lit(_RHO_DIGITS) - F.length(stripped)
    first = F.substring(stripped, 1, 1)
    extra = (
        F.when(first.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
        .when(first.isin("4", "5", "6", "7"), 1)
        .when(first.isin("2", "3"), 2)
        .otherwise(3)
    )
    return (
        F.when(F.length(stripped) == 0, F.lit(4 * _RHO_DIGITS + 1))
        .otherwise(z * 4 + extra + 1)
        .cast("int")
    )


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    b: int = 9,
) -> DataFrame:
    """HLL register table ``(*group_cols, bucket, rho)`` — one row per
    non-empty register per group; ``rho`` is the max over the group's
    values. ``b`` register-index bits (m = 2**b registers), 4 <= b <= 12.

    This IS the mergeable sketch: union register tables from any number of
    shards / days and re-``groupBy(...).agg(max(rho))`` to combine. The
    map-side partial max means each input partition ships <= m rows per
    group to the shuffle regardless of input size.
    """
    if not 4 <= b <= 12:
        raise ValueError(f"b must be in [4, 12], got {b}")
    group_cols = list(group_cols or [])
    m = 1 << b
    h = F.md5(F.col(value_col).cast("string"))
    bucket = (_hex_int(h, 1, 3) % m).alias("bucket")
    return (
        df.select(*group_cols, bucket, _rho(h).alias("rho0"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho0").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None, b: int = 9
) -> DataFrame:
    """Cardinality estimate per group from a register table:
    ``(*group_cols, n_distinct_hll)`` rounded to 6 dp. Standard HLL raw
    estimator with the small-range linear-counting switch (raw <= 2.5 m and
    empty registers exist -> m * ln(m / V))."""
    group_cols = list(group_cols or [])
    m = 1 << b
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    s = F.col("s_present") + (F.lit(m) - F.col("n_present"))  # empty regs: 2^0
    v = (F.lit(m) - F.col("n_present")).cast("double")
    raw = F.lit(_alpha(m) * m * m) / s
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 6).alias("n_distinct_hll"))


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    b: int = 9,
) -> DataFrame:
    """One-shot ``hll_estimate(hll_registers(...))``."""
    return hll_estimate(hll_registers(df, value_col, group_cols, b), group_cols, b)


def hll_sql(
    table: str,
    value_col: str,
    group_cols: list[str] | None = None,
    b: int = 9,
    where: str = "",
) -> str:
    """ANSI/DuckDB twin of ``hll_distinct`` — same md5-digit register math,
    emitted as SQL text. Used by the correctness gate; also handy to verify
    a production register table against a warehouse."""
    group_cols = list(group_cols or [])
    m = 1 << b
    gsel = (", ".join(group_cols) + ", ") if group_cols else ""
    gby = ("GROUP BY " + ", ".join(group_cols)) if group_cols else ""
    gby_bucket = "GROUP BY " + ", ".join([*group_cols, "bucket"])
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (2 - i)}"
        for i in range(3)
    )
    alpha = _alpha(m)
    return f"""
WITH hashed AS (
  SELECT {gsel}md5(CAST({value_col} AS VARCHAR)) AS h FROM {table} {where}
),
fields AS (
  SELECT {gsel}({digits}) % {m} AS bucket,
         regexp_replace(substr(h, 4, {_RHO_DIGITS}), '^0+', '') AS stripped
  FROM hashed
),
rho AS (
  SELECT {gsel}bucket,
         CASE WHEN length(stripped) = 0 THEN {4 * _RHO_DIGITS + 1}
              ELSE ({_RHO_DIGITS} - length(stripped)) * 4
                   + CASE WHEN substr(stripped, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 0
                          WHEN substr(stripped, 1, 1) IN ('4','5','6','7') THEN 1
                          WHEN substr(stripped, 1, 1) IN ('2','3') THEN 2
                          ELSE 3 END + 1
         END AS rho0
  FROM fields
),
regs AS (SELECT {gsel}bucket, MAX(rho0) AS rho FROM rho {gby_bucket}),
est AS (
  SELECT {gsel}SUM(POWER(2.0, -rho)) + ({m} - COUNT(*)) AS s,
         CAST({m} - COUNT(*) AS DOUBLE) AS v
  FROM regs {gby}
)
SELECT {gsel}ROUND(
  CASE WHEN CAST('{alpha * m * m!r}' AS DOUBLE) / s <= {2.5 * m} AND v > 0
       THEN CAST('{float(m)!r}' AS DOUBLE) * LN({m} / v)
       ELSE CAST('{alpha * m * m!r}' AS DOUBLE) / s END, 6) AS n_distinct_hll
FROM est"""
