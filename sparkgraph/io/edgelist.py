"""Edge-list text ingest (reference operator A1 — SURVEY.md §2A).

Reference semantics (worker/worker.go:106-144):
  * one edge per line, ``<src><whitespace><dst>``, base-10 integer ids;
  * arbitrary whitespace separators and trailing spaces tolerated
    (``strings.Fields``);
  * lines whose tokens do not parse as integers are skipped as comments
    (worker/worker.go:118-123 — e.g. ``# undirected`` headers);
  * duplicate and reciprocal lines are KEPT (parallel edges — the loader
    plain-appends, worker/worker.go:164-199);
  * edge weight is hard-coded 1.0 (worker/worker.go:165).

Spark expression: ``spark.read.text`` → regex extract → cast, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Two signed base-10 integer tokens at the start of the line; extra trailing
# tokens are ignored (the reference reads words[0]/words[1] and discards the
# rest, worker/worker.go:118-140). Comment/blank/junk lines are skipped.
# Deliberate divergences from reference accidents (documented, not copied):
# a malformed SECOND token is skipped here, where the reference would coerce
# it to vertex 0 (unchecked ParseInt error, worker/worker.go:138-139); a final
# line without a trailing newline is parsed here, where the reference's
# ReadString('\n') drops it at EOF (worker/worker.go:109-111).
_EDGE_RE = r"^\s*(-?\d+)\s+(-?\d+)(?:\s|$)"


def read_edgelist(spark: SparkSession, path: str) -> DataFrame:
    """Read a whitespace-separated edge-list text file.

    Returns ``(src: long, dst: long, weight: double)`` with weight ≡ 1.0.
    Parallel edges and reciprocal pairs are preserved (no dedup).
    """
    lines = spark.read.text(path)
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


def edges_from_pairs(spark: SparkSession, pairs: list[tuple[int, int]]) -> DataFrame:
    """Build an edge DataFrame from in-memory (src, dst) pairs (tests/fixtures)."""
    return spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in pairs], "src long, dst long, weight double"
    )
