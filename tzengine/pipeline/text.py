"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All JVM-side built-ins (codegen'd, no Python) so
they cost one narrow pass at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language function-word profiles (public common-words lists)
LANG_PROFILES = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
    "es": ["el", "la", "los", "y", "de", "un", "es"],
}

EN_STOPWORDS = LANG_PROFILES["en"] + ["it", "that", "for", "on", "with"]


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy (word-chunks of <=4 chars —
    ceil(len/4) pieces per word, a public rule-of-thumb for byte-pair
    token counts)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(words)
    )
    bpe_ish = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int")
    )
    # bigint on purpose: DuckDB's len()/list_sum() produce BIGINT/HUGEINT,
    # so the oracle hash-compare needs matching integer widths both sides
    return df.withColumn("n_tokens", n_words.cast("long")).withColumn(
        "n_tokens_bpe", bpe_ish.cast("long")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0,1]:
    length band, mean word length band, punctuation density, stopword
    ratio (public C4/Gopher-style filters, simplified)."""
    txt = F.col(text_col)
    words = F.split(F.trim(txt), r"\s+")
    n_words = F.size(words)
    n_chars = F.length(txt)
    punct = n_chars - F.length(F.regexp_replace(txt, r"[^\w\s]", ""))
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.array_intersect(words, stop_arr))
    mean_word_len = (n_chars - n_words + 1) / F.greatest(n_words, F.lit(1))

    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    score = (
        F.when((n_words >= 10) & (n_words <= 100000), 0.25).otherwise(0.0)
        + F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 0.25).otherwise(0.0)
        + F.when(punct_ratio <= 0.2, 0.25).otherwise(0.0)
        + F.when(stop_ratio >= 0.01, 0.25).otherwise(0.0)
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", score)
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Function-word-count language ID (n-gram-free heuristic): count
    profile words per language over the token array, argmax with a fixed
    language order for deterministic ties; 'und' (undetermined) when no
    profile word matches."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    scores = []
    for lang in sorted(LANG_PROFILES):
        profile = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
        hits = F.size(F.filter(words, lambda w: F.array_contains(profile, w)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def fingerprint_gram_hashes(
    df: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """Signature stage of :func:`fingerprint`: the exact-hash column plus
    the full array of char n-gram xxhash64 values (before the winnowing
    min) as ``gram_hashes`` — split out so the hash table can be staged
    to Parquet and the winnowing aggregation mirrored by a SQL oracle
    (the hash computation itself is xxhash64, pytest-pinned)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    exact_fp = F.xxhash64(norm)
    # char n-grams via substring over an index sequence (JVM-side)
    idx = F.sequence(
        F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))
    )
    grams = F.transform(idx, lambda i: norm.substr(i, F.lit(n)))
    return df.withColumn("fingerprint", exact_fp).withColumn(
        "gram_hashes", F.transform(grams, lambda g: F.xxhash64(g))
    )


def fingerprint(df: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Document fingerprint: xxhash64 of the normalized text (exact) plus
    a winnowing-style robust fingerprint = min xxhash64 over character
    n-gram windows of the normalized text (stable under small edits)."""
    return fingerprint_gram_hashes(df, text_col, n).withColumn(
        "fingerprint_min_ngram", F.array_min("gram_hashes")
    ).drop("gram_hashes")


def length_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-language document-length distribution: count, mean, EXACT
    p50/p90 (Spark `percentile`, linear interpolation — same formula as
    SQL quantile_cont, so the whole aggregate is oracle-portable).
    Composes lang_id → groupBy: the standard corpus-profiling rollup."""
    d = lang_id(df, text_col).withColumn("len", F.length(F.col(text_col)))
    return (
        d.groupBy("lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.avg("len").alias("mean_len"),
            F.percentile("len", 0.5).alias("p50_len"),
            F.percentile("len", 0.9).alias("p90_len"),
        )
        .orderBy("lang_pred")
    )
