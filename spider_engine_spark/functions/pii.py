"""PII detection and scrubbing for training-data pipelines.

Redacting emails / IPs / phone-like strings is a standard pre-training
step (e.g. the C4 and Dolma pipelines). Everything here is a chain of
JVM `regexp_replace` / `regexp_count` Column expressions — no UDF, no
shuffle, stateless and streaming-safe; at 100 TB this is a map-only
stage fused into the scan.

Pattern portability: the patterns below are written in the common
subset of Java regex (Spark) and RE2 (DuckDB oracles) — character
classes, bounded repetition, \\b word boundaries, no backreferences or
lookaround (RE2 has neither). Both engines scan leftmost
non-overlapping, so match COUNTS and replacement results agree exactly;
tests/test_pii.py pins Spark-vs-DuckDB equality on adversarial
fixtures.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# (kind, pattern, replacement token). Order is the scrub order: emails
# first so the later, looser patterns (phone digit runs) never eat an
# address's local part out from under it.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\+?[0-9][0-9\- ]{7,14}[0-9]",
        "<PHONE>",
    ),
)


def pii_counts(c: Column, kind: str) -> Column:
    """Non-overlapping match count of one PII kind in a string column."""
    pattern = {k: p for k, p, _ in PII_PATTERNS}[kind]
    return F.regexp_count(c, F.lit(pattern))


def _validate_kinds(kinds) -> frozenset[str]:
    """None means ALL kinds; any unknown name raises — a typo in a
    redaction step must fail loudly, never fail open and ship PII."""
    known = {k for k, _, _ in PII_PATTERNS}
    if kinds is None:
        return frozenset(known)
    unknown = set(kinds) - known
    if unknown:
        raise ValueError(
            f"unknown PII kind(s) {sorted(unknown)}; known: {sorted(known)}"
        )
    return frozenset(kinds)


def scrub_pii(c: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace every PII match with its redaction token, applying the
    patterns in PII_PATTERNS order (a later pattern never sees text a
    previous one already redacted). kinds=None scrubs everything; an
    explicit empty tuple scrubs nothing (and counts nothing in the
    DataFrame form) — the two surfaces always agree.

    Known chained-replace artifact (identical in the SQL oracle, so
    parity holds): an earlier redaction can CREATE a boundary that lets
    a later pattern match text it would not have matched in the
    original (e.g. an email match ending flush against digits exposes a
    \\b for the ipv4 pass) — scrubbed output may then carry a token
    whose pii_n_<kind> count is 0. Inherent to sequential replacement;
    consumers needing positionally-exclusive matching should extract
    spans instead of chaining replaces."""
    chosen = _validate_kinds(kinds)
    out = c
    for kind, pattern, token in PII_PATTERNS:
        if kind in chosen:
            out = F.regexp_replace(out, pattern, token)
    return out


def pii_spans(c: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Positionally-exclusive PII spans over the ORIGINAL text:
    array<struct<kind,start,len>>, sorted by start.

    The exact what-was-removed accounting that neither the chained
    scrub (an earlier redaction can expose a boundary for a later
    pattern — see scrub_pii's documented email-then-ipv4 artifact) nor
    the per-kind counts (which may overlap across kinds) provide.  Law:
    kinds are matched in PII_PATTERNS order against the UNMODIFIED
    text; within a kind, matches are the regex engine's leftmost
    non-overlapping set; across kinds, a match is accepted only if it
    overlaps no already-accepted span (earlier kinds win).  Matches the
    chained scrub's removals exactly whenever no cross-kind overlap or
    redaction-created boundary occurs (pinned by tests/test_pii.py).

    Arrow-vectorized pandas UDF (positional extraction has no JVM
    Column form — regexp_instr reports only the first match).  The
    Python `re` engine evaluates the same Java∩RE2-subset patterns the
    JVM scrub uses; `start` is a 0-based Unicode CODE-POINT offset
    (Python string law; Java consumers of non-BMP text would count
    UTF-16 units — the corpus contract is code points).
    """
    import re

    chosen = _validate_kinds(kinds)
    compiled = [
        (kind, re.compile(pattern))
        for kind, pattern, _ in PII_PATTERNS
        if kind in chosen
    ]

    @F.pandas_udf("array<struct<kind string, start int, len int>>")
    def _spans(col: pd.Series) -> pd.Series:
        out = []
        for text in col:
            if text is None:
                out.append(None)
                continue
            accepted: list[tuple[int, int, str]] = []
            for kind, rx in compiled:
                for m in rx.finditer(text):
                    s, e = m.start(), m.end()
                    if all(e <= a or s >= a + n for a, n, _ in accepted):
                        accepted.append((s, e - s, kind))
            accepted.sort()
            out.append(
                [
                    {"kind": kind, "start": s, "len": n}
                    for s, n, kind in accepted
                ]
            )
        return pd.Series(out)

    return _spans(c)


def with_pii_spans(
    df, content: str, out: str = "pii_spans",
    kinds: tuple[str, ...] | None = None,
):
    """DataFrame form of pii_spans: adds `out` = the exclusive span
    array. Map-only (one Arrow round-trip), stateless, streaming-safe."""
    return df.withColumn(out, pii_spans(F.col(content), kinds))


def with_pii_scrubbed(
    df, content: str, out: str = "text_scrubbed",
    kinds: tuple[str, ...] | None = None,
):
    """DataFrame form: adds `out` = the scrubbed text plus one
    `pii_n_<kind>` count column per kind.

    Counts are per-pattern matches on the ORIGINAL text, independently
    per kind — they may OVERLAP across kinds (the digits inside an
    email count as a phone match too, though only the email is
    redacted) and so audit exposure per kind, NOT exactly what the
    chained scrub removed. Exclusive what-was-removed accounting would
    need positional span extraction; the overlap definition is what the
    SQL oracle pins."""
    chosen = _validate_kinds(kinds)
    d = df
    for kind, _, _ in PII_PATTERNS:
        if kind in chosen:
            d = d.withColumn(
                f"pii_n_{kind}", pii_counts(F.col(content), kind)
            )
    return d.withColumn(out, scrub_pii(F.col(content), tuple(chosen)))
