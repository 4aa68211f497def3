"""Document-table operators for training-data pipelines: fingerprinting,
dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard), language-ID heuristic,
quality scoring, token counting.

No analogue in the reference (SURVEY.md §2C) — added surface required for the
engine to be useful as a 100 TB corpus processor. Everything stays JVM-side
(built-in functions) except nothing: even MinHash is expressed with
``transform``/``aggregate`` higher-order functions over JVM hashes, so there
is no Python in any hot path.

Scale notes: exact dedup is one hash-groupBy (map-side combined). MinHash-LSH
replaces the O(n²) pair join with a band-bucket join: candidate pairs only
for docs sharing a band signature. The n-gram Jaccard join is quadratic per
shared shingle and is intended for verification of candidates, not full-corpus
sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"

# tiny stopword inventories for the language-ID heuristic
_LANG_MARKERS = {
    "en": r"\b(the|of|and|to|in|is|for|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit)\b",
    "fr": r"\b(le|la|les|et|est|pas|pour)\b",
    "es": r"\b(el|la|los|las|es|y|por|para)\b",
}


# BPE-pretokenizer-ish segmentation: word pieces, numbers, punctuation runs —
# the usual pre-split GPT-style byte-pair encoders apply before merging
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def tokens(col) -> "F.Column":
    return F.split(F.trim(col), TOKEN_SPLIT_RE)


def bpe_ish_token_count(col) -> "F.Column":
    """Count of BPE-ish pretokens (letter runs / digit runs / symbol runs)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_RE), 0))


def char_ngram_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 5, k: int = 8,
) -> DataFrame:
    """Rolling-hash document fingerprint: the k smallest xxhash64 values over
    the document's character n-grams (winnowing-style min-sampling). Equal
    fingerprints ⇒ near-identical content; overlap size estimates Jaccard.
    Returns (id, fingerprint: array<long> ascending).
    """
    t = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.length(t) - n, F.lit(0))),
        lambda i: t.substr(i + 1, F.lit(n)),
    )
    hashes = F.array_sort(
        F.array_distinct(F.transform(grams, lambda g: F.xxhash64(g)))
    )
    return df.select(
        F.col(id_col).alias("id"), F.slice(hashes, 1, k).alias("fingerprint")
    )


def sha_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: sha256 hex per row (mirrors ingest's invariant)."""
    return df.withColumn("content_sha", F.sha2(F.col(text_col), 256))


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    minimum id as representative and the duplicate count."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha"))
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token/char statistics (quality-filter features)."""
    toks = tokens(F.col(text_col))
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_chars_obs", F.length(F.col(text_col)))
        .withColumn("n_bpe_tokens", bpe_ish_token_count(F.col(text_col)))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Cheap quality features + a composite score: mean token length,
    alpha ratio, and a [0,1] score that penalizes degenerate docs."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    mean_tok_len = (alpha / F.greatest(n_tok, F.lit(1))).cast("double")
    alpha_ratio = (alpha / F.greatest(n_chars, F.lit(1))).cast("double")
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("mean_token_len", F.round(mean_tok_len, 6))
        .withColumn("alpha_ratio", F.round(alpha_ratio, 6))
        .withColumn(
            "quality",
            F.round(
                F.least(n_tok / F.lit(20.0), F.lit(1.0)) * alpha_ratio, 6
            ),
        )
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: count per-language stopword hits,
    pick the max (deterministic order on ties: en > de > fr > es > und)."""
    out = df
    for lg, pat in _LANG_MARKERS.items():
        out = out.withColumn(
            f"_hits_{lg}", F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        )
    best = F.lit("und")
    best_hits = F.lit(0)
    # forward order: on tied hit counts the earliest language (en) wins
    for lg in _LANG_MARKERS:
        best = F.when(F.col(f"_hits_{lg}") > best_hits, F.lit(lg)).otherwise(best)
        best_hits = F.when(
            F.col(f"_hits_{lg}") > best_hits, F.col(f"_hits_{lg}")
        ).otherwise(best_hits)
    out = out.withColumn("lang_pred", best)
    return out.drop(*[f"_hits_{lg}" for lg in _LANG_MARKERS])


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toks = tokens(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a < b, jaccard ≥ threshold).
    Quadratic in docs-per-shingle — use MinHash-LSH to pre-candidate at scale."""
    sh = shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("a"), "shingle")
    b = sh.select(F.col("id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("id").alias("b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (JVM-side: xxhash64 per shingle, min per permutation-salt)

def minhash_signatures(
    sh: DataFrame, num_hashes: int = 32
) -> DataFrame:
    """(id, sig: array<long>) — sig[i] = min over shingles of xxhash64(shingle, i)."""
    hashed = sh.select(
        "id",
        F.array(
            *[F.xxhash64(F.col("shingle"), F.lit(i)) for i in range(num_hashes)]
        ).alias("hs"),
    )
    aggs = [F.min(F.col("hs")[i]).alias(f"h{i}") for i in range(num_hashes)]
    return hashed.groupBy("id").agg(*aggs).select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH, then exact-Jaccard
    verified (estimate from the signature): (a, b, est_jaccard ≥ threshold).

    bands must divide num_hashes; rows-per-band r = num_hashes/bands gives the
    usual S-curve: P(candidate) = 1 − (1 − s^r)^bands.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sh = shingles(df, id_col, text_col, n)
    sig = minhash_signatures(sh, num_hashes)

    band_keys = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[bi * r + j] for j in range(r)]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.bucket")

    lhs = band_keys.select("band", "bucket", F.col("id").alias("a"), F.col("sig").alias("siga"))
    rhs = band_keys.select("band", "bucket", F.col("id").alias("b"), F.col("sig").alias("sigb"))
    cand = (
        lhs.join(rhs, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "siga", "sigb")
        .distinct()
    )
    est = F.aggregate(
        F.zip_with("siga", "sigb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(float(num_hashes))
    return (
        cand.select("a", "b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 48
) -> DataFrame:
    """SimHash over word tokens: bit j set iff Σ_tokens sign_j ≥ 0, where
    sign_j = +1 if bit j of xxhash64(token) set else −1. (id, simhash).
    bits ≤ 62 so the packed value stays a positive long under ANSI mode."""
    if bits > 62:
        raise ValueError("bits must be ≤ 62")
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("t")
    )
    h = tok.select("id", F.xxhash64("t").alias("h"))
    cols = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = h.groupBy("id").agg(*cols)
    acc = F.lit(0).cast("long")
    for j in range(bits):
        acc = acc + F.when(F.col(f"b{j}") >= 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return agg.select("id", acc.alias("simhash"))
