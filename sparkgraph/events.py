"""Batch event-stream analytics — the batch twins of streaming.py's windowed
operators, so the same semantics are available (and oracle-gateable
end-to-end) over at-rest event tables.

Scale notes: sessionization is ONE groupBy on (key, session_window) — Spark's
built-in session assignment merges windows inside the aggregation, no
self-join or window function over the full stream; percentiles are exact
(sort-based within group) — at 100 TB switch to approx_percentile and accept
the documented error bound, or pre-bucket values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "5 minutes",
) -> DataFrame:
    """Gap-based sessions per key over a batch event table:
    ``(session_start, session_end, key, n_events)`` with
    session_end = last event + gap (Spark session_window semantics, the same
    contract as streaming.sessionized_counts)."""
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def value_percentiles(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact per-key percentiles of ``value_col`` (linear interpolation —
    the SQL PERCENTILE_CONT contract), one aliased column per requested
    percentile plus the group count."""
    aggs = [
        F.round(F.percentile(F.col(value_col), F.lit(p)), 6).alias(
            f"p{str(p).replace('0.', '').ljust(2, '0')}"
        )
        for p in percentiles
    ]
    return events.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"), *aggs
    )
