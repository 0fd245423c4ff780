"""Text-analysis functions for training-data pipelines.

All hot paths are JVM-side Catalyst expressions (no Python); exact integer
ratios keep them oracle-portable. Language-ID reuses the engine's
count-normalized scoring semantics (functions/kernel.py) over per-language
stopword vocabularies — the same argmax-of-token-counts shape the
classification kernel uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword vocabularies for the n-gram/stopword heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por"],
    "fr": ["le", "la", "de", "et", "un", "en", "que", "pour"],
    "de": ["der", "die", "und", "das", "von", "mit", "ein", "zu"],
}

EN_STOPWORDS = LANG_STOPWORDS["en"]


def tokens(col: str = "text") -> Column:
    return F.split(F.lower(F.col(col)), " ")


def token_count(col: str = "text") -> Column:
    """Whitespace token count (the BPE-ish regex variant is
    ``regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')``)."""
    return F.size(tokens(col))


def count_token_hits(toks: Column, vocab: list[str]) -> Column:
    """# tokens that belong to vocab — JVM-side filter+size."""
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting three ways (training-data accounting): whitespace
    tokens, BPE-ish regex tokens (letter runs | digit runs | single
    punctuation), distinct whitespace tokens."""
    toks = tokens()
    # idx=0 (whole match) — the pattern has no capture group; group 1 raises
    # INVALID_PARAMETER_VALUE.REGEX_GROUP_INDEX.
    bpeish = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
    )
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_ws_tokens"),
        F.size(bpeish).alias("n_bpeish_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Language-ID heuristic: argmax of per-language stopword hit counts,
    ties broken by language code asc, 'und' when nothing matches."""
    toks = tokens()
    scored = F.array(
        *[
            F.struct(
                count_token_hits(toks, vocab).alias("hits"), F.lit(code).alias("code")
            )
            for code, vocab in sorted(LANG_STOPWORDS.items())
        ]
    )
    best = F.array_sort(
        scored,
        lambda l, r: F.when(l["hits"] > r["hits"], F.lit(-1))
        .when(l["hits"] < r["hits"], F.lit(1))
        .when(l["code"] < r["code"], F.lit(-1))
        .when(l["code"] > r["code"], F.lit(1))
        .otherwise(F.lit(0)),
    )[0]
    return documents.select(
        "doc_id",
        F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].alias("hits"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Quality scoring: length / punctuation / stopword ratios — exact
    integer ratios (single IEEE division each)."""
    toks = tokens()
    n_tok = F.size(toks)
    n_stop = count_token_hits(toks, EN_STOPWORDS)
    n_punct = F.length(F.regexp_replace(F.col("text"), "[^.,;:!?]", ""))
    return documents.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        (F.col("n_chars").cast("double") / n_tok).alias("chars_per_token"),
        (n_stop.cast("double") / n_tok).alias("stopword_ratio"),
        (n_punct.cast("double") / F.col("n_chars")).alias("punct_ratio"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprinting: sha2 over whitespace-normalized lowercase
    text — the canonical-form content key for exact dedup across
    formatting variants."""
    norm = F.regexp_replace(F.lower(F.col("text")), " +", " ")
    return documents.select("doc_id", F.sha2(norm, 256).alias("fp"))


def rolling_fingerprints(documents: DataFrame, window: int = 8, mod: int = 2**31 - 1) -> DataFrame:
    """Rolling polynomial fingerprints (Rabin-Karp shape) per document:
    hash of every ``window``-token span, for content-defined chunk dedup.
    Pure Catalyst: transform over token index sequence with an inner
    aggregate (Horner's rule, exact int64 arithmetic under the modulus).

    Token hash = first 48 bits of md5, an engine-portable choice (DuckDB
    1.0 has md5 but no crc32/xxhash) so the whole operator is
    oracle-checkable. No overflow: acc < 2^31, acc*257 + 2^48 < 2^49."""
    toks = tokens()
    base = 257
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("long")  # noqa: E731
    span_hash = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (window - 1)),
        lambda i: F.aggregate(
            F.slice(toks, i, window),
            F.lit(0).cast("long"),
            lambda acc, t: F.pmod(acc * base + tok_hash(t), F.lit(mod)),
        ),
    )
    return documents.filter(F.size(toks) >= window).select(
        "doc_id", F.explode(F.array_distinct(span_hash)).alias("chunk_hash")
    )
