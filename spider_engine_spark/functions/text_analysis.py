"""Text-analysis functions for training-data pipelines — all JVM-native
Column expressions (no Python in the hot path), each with an exact ANSI
SQL equivalent for the DuckDB oracles.

- token_count: whitespace token count.
- quality features: token count, avg token length, stopword ratio,
  uppercase/punct ratios, repetition (distinct/total tokens).
- language-ID: stopword-list hit counts per language, argmax with a
  deterministic tiebreak.
- fingerprint: md5-based document fingerprint (content-defined id).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from spider_engine_spark.functions.hashes import md5_h60_col

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un", "que"],
}


def tokens(c: Column) -> Column:
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def avg_token_len(c: Column) -> Column:
    t = tokens(c)
    return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / F.size(t)
    )


def distinct_ratio(c: Column) -> Column:
    t = tokens(c)
    return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(t)).cast("double") / F.size(t)
    )


def stopword_hits(c: Column, lang: str) -> Column:
    t = tokens(c)
    words = STOPWORDS[lang]
    return F.size(F.filter(t, lambda x: x.isin(*[F.lit(w) for w in words])))


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    t = tokens(c)
    return F.when(F.size(t) == 0, F.lit(0.0)).otherwise(
        stopword_hits(c, lang).cast("double") / F.size(t)
    )


def lang_guess(c: Column) -> Column:
    """argmax of per-language stopword hits; ties -> lexicographically
    first language; zero hits everywhere -> 'und' (undetermined)."""
    pairs = [(lang, stopword_hits(c, lang)) for lang in sorted(STOPWORDS)]
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang, hits in pairs:
        take = hits > best_hits  # strict: ties keep the earlier language
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(take, hits).otherwise(best_hits)
    return best_lang


def fingerprint(c: Column, length: int = 16) -> Column:
    """Content fingerprint: md5 prefix of the normalized token stream."""
    return F.substring(F.md5(F.concat_ws(" ", tokens(F.lower(c)))), 1, length)


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
#  letter runs | digit runs | punctuation runs — the pre-tokenization
#  split GPT-style BPE vocabularies are trained over (simplified: no
#  contraction classes, ASCII-only letter class so Java regex and RE2
#  (DuckDB) agree byte-for-byte)


def bpe_ish_tokens(c: Column) -> Column:
    """BPE-style pre-tokenization via regexp_extract_all — JVM-side; the
    oracle uses DuckDB's regexp_extract_all with the same pattern."""
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(c: Column) -> Column:
    return F.size(bpe_ish_tokens(c))


def winnowing_fingerprints(
    c: Column, n: int = 3, w: int = 4
) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the standard rolling-hash selection for near-dup detection at scale):
    hash every positional n-token gram (md5 60-bit, the SQL-reproducible
    hash), slide a window of w consecutive gram hashes, keep each
    window's minimum, distinct. All JVM array expressions — no UDF.

    Returns array<long> (empty when the doc has < n+w-1 tokens). Two
    documents sharing a long-enough run of text share a fingerprint with
    certainty (the guarantee windowed-min selection provides and random
    sampling does not).
    """
    toks = tokens(c)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    hashes = F.transform(grams, md5_h60_col)
    wins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(hashes) - (w - 1)),
            lambda j: F.array_min(F.slice(hashes, j, w)),
        )
    )
    return F.when(
        F.size(toks) >= n + w - 1, wins
    ).otherwise(F.array().cast("array<long>"))
