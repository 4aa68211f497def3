"""Source-repository table ingest (SURVEY.md §7 step 1).

Replaces the reference's SDFS PUT/GET blob path (sdfs/sdfs-graph.go:15-116 —
operators B1/B2) with table-format IO: the input is an Iceberg-style table
``sources(repo, path, commit, lang, content)`` and ingest derives the vertex
table. Durability/replication is the table format's job, not the engine's.

Per-row invariant (BASELINE.json input_hint): ``sha2(content, 256)`` computed
at ingest must equal the sha of the raw input row — checked end-to-end by
``verify_sha_invariant`` and pinned in tests.

Vertex identity: ``vertex_id = xxhash64(repo, path)`` — a stable 63-bit key
independent of row order, so re-ingests and incremental loads agree. At
extreme (10^12-file) scale 64-bit birthday collisions become likely;
``check_id_collisions`` makes the assumption explicit and fails loudly, at
which point ids should move to a 128-bit scheme (e.g. two xxhash64 salts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vertex_id(repo_col="repo", path_col="path"):
    """Stable vertex id for a (repo, path) file node."""
    return F.xxhash64(F.col(repo_col), F.col(path_col))


def ingest_sources(sources: DataFrame) -> DataFrame:
    """``sources`` → ``vertices(id, repo, path, lang, content, content_sha)``.

    One row per distinct file; content is invariant across a file's commit
    rows (enforced by the distinct — a file with conflicting contents would
    yield duplicate ids, caught by ``check_id_collisions``).
    """
    return (
        sources.select("repo", "path", "lang", "content")
        .distinct()
        .select(
            vertex_id().alias("id"),
            "repo",
            "path",
            "lang",
            "content",
            F.sha2(F.col("content"), 256).alias("content_sha"),
        )
    )


def commit_memberships(sources: DataFrame) -> DataFrame:
    """``(commit, id)`` pairs — the co-change relation's raw form."""
    return sources.select("commit", vertex_id().alias("id")).distinct()


def verify_sha_invariant(raw: DataFrame, ingested: DataFrame) -> int:
    """Rows of ``ingested`` whose content_sha disagrees with a fresh sha256 of
    the raw input for the same (repo, path). Returns the violation count
    (0 = invariant holds)."""
    fresh = raw.select(
        "repo", "path", F.sha2(F.col("content"), 256).alias("fresh_sha")
    ).distinct()
    return (
        ingested.join(fresh, ["repo", "path"])
        .filter(F.col("content_sha") != F.col("fresh_sha"))
        .count()
    )


def check_id_collisions(vertices: DataFrame) -> int:
    """xxhash64 collision count across distinct (repo, path). 0 expected."""
    return (
        vertices.groupBy("id").agg(F.count(F.lit(1)).alias("c")).filter("c > 1").count()
    )
