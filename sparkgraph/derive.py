"""Code-graph edge derivation: import/include links + commit co-change.

Pure added surface over the reference (SURVEY.md §2C) — the reference only
ever reads pre-built edge lists; BASELINE.json's north_star derives the link
graph from source content instead. Two edge kinds:

  * ``import``  — file A references module B in the same repo. Extraction is
    a VECTORIZED pandas UDF (Arrow-batched ``Series.str.findall`` per
    language — no per-row Python, per input_hint), resolved against the
    repo's own path stems.
  * ``cochange`` — files sharing a commit, pairwise. Derived relationally by
    a self-join on commit. Mega-commits (vendored-tree imports etc.) would
    make this quadratic, so commits touching more than ``max_commit_files``
    files are dropped — the standard skew guard for this relation; the cap is
    an explicit, documented parameter.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Per-language import/include patterns (multiline). Each captures the target
# module stem, resolved against path stems within the same repo.
IMPORT_PATTERNS = {
    "py": re.compile(r"^import\s+([A-Za-z_]\w*)", re.M),
    "c": re.compile(r'^#include\s+"([\w./]+?)(?:\.h)?"', re.M),
    "java": re.compile(r"^import\s+[\w.]*?([A-Za-z_]\w*)\s*;", re.M),
}


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_imports(lang: pd.Series, content: pd.Series) -> pd.Series:
    """Arrow-batched import extraction: one ``findall`` pass per language
    group within the batch; unknown languages yield empty lists."""
    out = pd.Series([[]] * len(content), index=content.index, dtype=object)
    for lg, pat in IMPORT_PATTERNS.items():
        mask = lang == lg
        if mask.any():
            out[mask] = content[mask].str.findall(pat)
    return out


def _path_stem():
    return F.regexp_extract("path", r"([^/.]+)(?:\.\w+)?$", 1)


def derive_import_edges(vertices: DataFrame) -> DataFrame:
    """``vertices(id, repo, path, lang, content)`` → ``edges(src, dst, weight,
    kind='import')``. Unresolvable references (no module with that stem in
    the repo) are dropped; self-imports are dropped."""
    refs = vertices.select(
        F.col("id").alias("src"),
        "repo",
        F.explode(extract_imports("lang", "content")).alias("module"),
    )
    defs = vertices.select(
        F.col("id").alias("dst"), "repo", _path_stem().alias("module")
    )
    return (
        refs.join(defs, ["repo", "module"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.lit(1.0).alias("weight"), F.lit("import").alias("kind"))
        .distinct()
    )


def derive_cochange_edges(
    memberships: DataFrame, max_commit_files: int = 100
) -> DataFrame:
    """``(commit, id)`` memberships → pairwise ``edges(src, dst, weight,
    kind='cochange')`` with src < dst, deduped across commits."""
    sized = memberships.groupBy("commit").agg(F.count(F.lit(1)).alias("nf"))
    ok = memberships.join(
        sized.filter(F.col("nf") <= max_commit_files).select("commit"), "commit"
    )
    a = ok.select("commit", F.col("id").alias("src"))
    b = ok.select("commit", F.col("id").alias("dst"))
    return (
        a.join(b, "commit")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .select("src", "dst", F.lit(1.0).alias("weight"), F.lit("cochange").alias("kind"))
    )


def derive_code_edges(
    vertices: DataFrame, memberships: DataFrame, max_commit_files: int = 100
) -> DataFrame:
    """Full derived edge table: import ∪ cochange (both kinds kept — a pair
    linked both ways appears twice, consistent with the loader's
    keep-parallel-edges semantics)."""
    return derive_import_edges(vertices).unionByName(
        derive_cochange_edges(memberships, max_commit_files)
    )


def cochange_rules(
    memberships: DataFrame, max_commit_files: int = 100, min_support: int = 2
) -> DataFrame:
    """Co-change association rules over commit history (Zimmermann et al.,
    "Mining Version Histories to Guide Software Changes", ICSE 2004):
    for each ORDERED file pair (src → dst), ``support`` = number of commits
    touching both, ``confidence`` = support / commits touching src — "when
    src changes, dst changes too X% of the time". Mega-commits above
    ``max_commit_files`` are dropped first (same skew guard as
    ``derive_cochange_edges``); pairs below ``min_support`` are pruned
    AFTER counting, so confidence denominators are exact.

    Scale shape: the commit self-join is the only quadratic construction
    and it is capped per commit (≤ cap² pairs each); the per-file commit
    counts broadcast-join back (bounded by |V|) and everything else is
    map-side-combined aggregation.

    PRECONDITION: commit ids must be globally unique across the input
    (true for ``commit_memberships`` over a single-remote sources table).
    If the table mixes repos that can share commit SHAs (forks/mirrors) or
    uses short ids, the self-join on ``commit`` alone would pair files
    across repos — disambiguate the commit column (e.g. concat(repo,
    commit)) before calling.
    """
    sized = memberships.groupBy("commit").agg(F.count(F.lit(1)).alias("nf"))
    ok = memberships.join(
        sized.filter(F.col("nf") <= max_commit_files).select("commit"), "commit"
    )
    per_file = ok.groupBy("id").agg(F.count(F.lit(1)).alias("n_commits"))
    a = ok.select("commit", F.col("id").alias("src"))
    b = ok.select("commit", F.col("id").alias("dst"))
    support = (
        a.join(b, "commit")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return support.join(
        per_file.withColumnRenamed("id", "src"), "src"
    ).select(
        "src",
        "dst",
        "support",
        F.round(F.col("support") / F.col("n_commits"), 9).alias("confidence"),
    )


def coupling_metrics(import_edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """Per-file afferent/efferent coupling over the DIRECTED import graph
    (Martin's stability metrics, "OO Design Quality Metrics" 1994):
    ``ca`` = fan-in (distinct files importing this one), ``ce`` = fan-out
    (distinct files this one imports), ``instability`` = ce/(ca+ce) ∈ [0,1]
    rounded to 9 places. Files with no import edges at all score 0.0
    (maximally stable — nothing depends on or destabilizes them).

    PRECONDITION: ``import_edges`` must be a DEDUPLICATED (src, dst) edge
    list — ``derive_import_edges`` output satisfies this (it ``.distinct()``s).
    The counts are ``count(*)`` over that list, so a multigraph input (e.g.
    ``derive_code_edges`` filtered by kind, which keeps parallel edges
    across kinds) would inflate ca/ce; run ``.select("src",
    "dst").distinct()`` first in that case.

    Scale shape: two map-side-combined aggregations over the distinct edge
    list plus two left joins back onto V — nothing wider than |E| shuffles,
    and both aggs key on a vertex id, so the edge table's existing src hash
    partitioning is reused for ``ce``.
    """
    ce = import_edges.groupBy("src").agg(F.count(F.lit(1)).alias("ce"))
    ca = import_edges.groupBy("dst").agg(F.count(F.lit(1)).alias("ca"))
    zero = F.lit(0).cast("long")
    return (
        vertices.select("id", "repo", "path")
        .join(ce.withColumnRenamed("src", "id"), "id", "left")
        .join(ca.withColumnRenamed("dst", "id"), "id", "left")
        .select(
            "id",
            "repo",
            "path",
            F.coalesce("ca", zero).alias("ca"),
            F.coalesce("ce", zero).alias("ce"),
        )
        .withColumn(
            "instability",
            F.when(F.col("ca") + F.col("ce") == 0, F.lit(0.0)).otherwise(
                F.round(F.col("ce") / (F.col("ca") + F.col("ce")), 9)
            ),
        )
    )
