"""Explicit hub-skew handling: salted two-phase message aggregation.

BASELINE.json north_star names this directly: "explicit salting for
high-degree hub skew". The reference has NO skew handling (SURVEY.md §4) — a
hub vertex funnels all its messages to one VM's queue.

The problem at scale: ``messages.groupBy(dst)`` sends every message for a hub
vertex to one reduce task. Map-side partial aggregation already collapses
per-map-partition duplicates, so the residual skew is bounded by the map
partition count — but for PER-KEY state that exceeds a single task (e.g. when
the aggregate is non-algebraic, or when AQE is off), salting splits each hot
key into R sub-keys, aggregates partials per (key, salt), then merges the R
partials per key.

``salted_agg`` implements the general two-phase pattern for algebraic
aggregates (sum/min/max/count); the superstep loops use plain groupBy because
partial aggregation + AQE skew-join already covers them — this module is the
explicit escape hatch and is what a non-algebraic gather would use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    agg_fn,
    salts: int = 16,
    merge_fn=None,
) -> DataFrame:
    """Two-phase aggregation of ``agg_fn(agg_col)`` grouped by ``key``:

      phase 1: groupBy(key, salt) — the hot key's rows spread over ``salts``
               reduce tasks. The salt is ``monotonically_increasing_id() %
               salts``: it needs no extra column from the caller and spreads
               identical rows (content hashing would re-collapse them), but it
               is NOT stable across task retries/repartitioning — safe here
               only because the phase-2 merge of an algebraic aggregate is
               salt-assignment-invariant;
      phase 2: groupBy(key) over the ``salts`` partials.

    ``merge_fn`` defaults to ``agg_fn`` (correct for sum/min/max; pass
    F.sum for count-style phase-2 merges).
    """
    merge_fn = merge_fn or agg_fn
    salt = (F.monotonically_increasing_id() % salts).alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(agg_fn(F.col(agg_col)).alias("_partial"))
    )
    return phase1.groupBy(key).agg(merge_fn(F.col("_partial")).alias(agg_col))


def top_degree_hubs(degrees: DataFrame, threshold: int) -> DataFrame:
    """(id, deg) rows whose symmetrized degree exceeds ``threshold`` — the
    hub set a caller would salt or broadcast-isolate."""
    return degrees.filter(F.col("deg") > threshold)


def salted_message_sum(
    msgs: DataFrame,
    hubs: DataFrame,
    dst_col: str = "dst",
    msg_col: str = "msg",
    salts: int = 16,
) -> DataFrame:
    """Hub-aware gather: messages to hub destinations aggregate in two salted
    phases; the long tail takes the ordinary single-phase path. Returns
    ``(id, msum)`` identical to ``msgs.groupBy(dst).sum(msg)``.
    """
    hub_ids = hubs.select(F.col("id").alias(dst_col))
    hot = msgs.join(F.broadcast(hub_ids), dst_col, "left_semi")
    cold = msgs.join(F.broadcast(hub_ids), dst_col, "left_anti")

    cold_agg = cold.groupBy(F.col(dst_col).alias("id")).agg(
        F.sum(msg_col).alias("msum")
    )
    hot_agg = (
        salted_agg(hot, dst_col, msg_col, F.sum, salts=salts)
        .select(F.col(dst_col).alias("id"), F.col(msg_col).alias("msum"))
    )
    return cold_agg.unionByName(hot_agg)
