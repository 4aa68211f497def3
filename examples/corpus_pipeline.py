"""End-to-end training-corpus cleaning pipeline on the documents table.

Chains the engine's text operators the way a 100 TB pre-training pipeline
would — each stage is a DataFrame-to-DataFrame operator, so the whole thing
is one lazy plan per output and scales with the cluster:

  1. exact dedup            (sha256 groupBy)
  2. near-dup clustering    (MinHash-LSH candidates -> exact verify -> CC)
  3. boilerplate removal    (corpus-frequency segment strip)
  4. PII scrub              (email/ip/phone redaction + audit sha)
  5. quality + language     (heuristic scores, langid)
  6. decontamination        (n-gram overlap vs a benchmark probe set)
  7. repetition + LM score  (Gopher dup_ratio + corpus-unigram neg-logp,
                             round-4 quality signals)
  8. TF-IDF top terms       (per-doc salient vocabulary)

Usage:
    python examples/corpus_pipeline.py [sf_dir]   # default /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkgraph.session import get_spark
from sparkgraph.text import (
    boilerplate_strip,
    contamination_scores,
    dedup_clusters,
    exact_dedup,
    language_id,
    pii_scrub,
    quality_score,
    repetition_stats,
    tfidf_top_terms,
    unigram_logprob,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("corpus-pipeline", master="local[8]", shuffle_partitions=8)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # 1-2: drop exact dups, then keep one representative per near-dup cluster
    exact = exact_dedup(docs)
    reps = dedup_clusters(docs, threshold=0.5).filter("is_rep")
    kept = docs.join(reps.select("doc_id"), "doc_id", "left_semi")
    n_kept = kept.count()

    # 3-4: strip corpus-frequency boilerplate, then scrub PII (audit shas)
    boiler = boilerplate_strip(kept, min_docs=3)
    scrubbed = pii_scrub(kept)

    # 5: score quality + language, filter the floor
    scored = quality_score(kept).join(language_id(kept), "doc_id")
    good = scored.filter(F.col("quality") >= 0.2)

    # 6: decontaminate against a probe "benchmark" (here: every 50th doc)
    probe = docs.filter(F.col("doc_id") % 50 == 0)
    contam = contamination_scores(kept, probe)
    clean = good.join(
        contam.filter(F.col("contamination") < 0.8).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # 7: round-4 quality signals — repetition (degenerate looping docs) and
    # corpus-unigram LM score (rare-token outliers); both as filters
    rep = repetition_stats(kept, n=2)
    lm = unigram_logprob(kept)
    final = clean.join(
        rep.filter(F.col("dup_ratio") <= 0.9).select("doc_id"), "doc_id", "left_semi"
    ).join(
        lm.filter(F.col("avg_neg_logp") <= 12.0).select("doc_id"), "doc_id", "left_semi"
    )

    # 8: per-doc salient vocabulary over the surviving corpus
    terms = tfidf_top_terms(kept, k=3)

    print(f"docs in:               {n0}")
    print(f"exact-dup groups:      {exact.filter('dup_count > 1').count()}")
    print(f"after near-dup dedup:  {n_kept}")
    print(f"boilerplate rows:      {boiler.filter('n_kept < n_segments').count()}")
    print(f"docs with PII hits:    {scrubbed.filter('n_email + n_ipv4 + n_phone > 0').count()}")
    print(f"quality-pass docs:     {good.count()}")
    print(f"clean (decontam) docs: {clean.count()}")
    print(f"high-repetition docs:  {rep.filter('dup_ratio > 0.9').count()}")
    print(f"LM-outlier docs:       {lm.filter('avg_neg_logp > 12.0').count()}")
    print(f"final corpus:          {final.count()}")
    print("sample salient terms:")
    terms.orderBy("doc_id", "rank").show(9, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
