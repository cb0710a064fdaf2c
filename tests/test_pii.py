"""PII scrub: Spark-vs-DuckDB (Java regex vs RE2) parity on adversarial
fixtures, plus the scrub-order and counting laws."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spider_engine_spark.functions.pii import (
    PII_PATTERNS,
    pii_counts,
    scrub_pii,
    with_pii_scrubbed,
)

# Hostile inputs: boundary digits, IP lookalikes with 4-digit octets,
# emails hugging punctuation, phone runs with dashes/spaces, PII-free
# text, digits that almost form each pattern.
FIXTURES = [
    "plain text with no pii at all",
    "mail me at first.last+tag@sub.domain-x.org, thanks",
    "a@b.io x@y.z q@@r.com not@apattern @lonely.com trailing@dot.",
    "ip 10.0.0.1 and 255.255.255.255 and not 1234.5.6.7 or 1.2.3",
    "1.2.3.4.5.6.7.8 looks like two? leftmost non-overlap decides",
    "call +1 555-014-2398 or 08-1234-5678 or just 123456789",
    "+12 34-56 789 mixed, 12345678 (8 digits), 1234567 (7: too short)",
    "u0@ex0.org at 0.0.0.0 or +155500000 re: the injected shape",
    "edge-: -a-@b-c.de  e%m_a.il@host.tld2  9.9.9.9mailto:x@y.aa",
    "digits inside words x12345678901x and a run 123-456-7890 done",
    "",
]


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_counts_and_scrub_match_duckdb(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURES)], ["i", "t"]
    )
    got = {
        r["i"]: (r["e"], r["p4"], r["ph"], r["s"])
        for r in df.select(
            "i",
            pii_counts(F.col("t"), "email").alias("e"),
            pii_counts(F.col("t"), "ipv4").alias("p4"),
            pii_counts(F.col("t"), "phone").alias("ph"),
            scrub_pii(F.col("t")).alias("s"),
        ).collect()
    }
    pats = {k: p for k, p, _ in PII_PATTERNS}
    for i, t in enumerate(FIXTURES):
        lit = t.replace("'", "''")
        # build the scrub chain from PII_PATTERNS so the test tracks the
        # module's tokens and order, never a stale hardcoded copy
        scrub = f"'{lit}'"
        for _, pat, tok in PII_PATTERNS:
            scrub = f"regexp_replace({scrub}, '{pat}', '{tok}', 'g')"
        (e, p4, ph, s), = _duck(
            f"""
            SELECT len(regexp_extract_all('{lit}', '{pats["email"]}')),
                   len(regexp_extract_all('{lit}', '{pats["ipv4"]}')),
                   len(regexp_extract_all('{lit}', '{pats["phone"]}')),
                   {scrub}
            """
        )
        assert got[i] == (e, p4, ph, s), f"fixture {i}: {t!r}"


def test_scrub_order_protects_earlier_matches(spark):
    # the phone pattern would eat the email's digit run / the IP if it
    # ran first; PII_PATTERNS order must prevent that
    df = spark.createDataFrame(
        [("a", "reach 123456789@mail.com or 10.20.30.40 now",)],
        ["k", "t"],
    )
    (row,) = df.select(scrub_pii(F.col("t")).alias("s")).collect()
    assert row["s"] == "reach <EMAIL> or <IP> now"


def test_dataframe_form_counts_original_text(spark):
    df = spark.createDataFrame([(1, "a@b.io and a@b.io")], ["k", "t"])
    (row,) = with_pii_scrubbed(df, "t").collect()
    assert row["pii_n_email"] == 2
    assert row["text_scrubbed"] == "<EMAIL> and <EMAIL>"
    # kind subset: only scrub/count what was asked
    (row,) = with_pii_scrubbed(df, "t", kinds=("ipv4",)).collect()
    assert "pii_n_email" not in row.asDict()
    assert row["text_scrubbed"] == "a@b.io and a@b.io"


def test_unknown_kind_fails_loudly(spark):
    import pytest

    df = spark.createDataFrame([(1, "a@b.io")], ["k", "t"])
    with pytest.raises(ValueError, match="unknown PII kind"):
        with_pii_scrubbed(df, "t", kinds=("Email",))  # typo'd case
    with pytest.raises(ValueError, match="unknown PII kind"):
        scrub_pii(F.col("t"), kinds=("e-mail",))
    # explicit empty tuple: scrub nothing AND count nothing (the two
    # surfaces agree; only None means "all kinds")
    (row,) = with_pii_scrubbed(df, "t", kinds=()).collect()
    assert row["text_scrubbed"] == "a@b.io"
    assert not any(c.startswith("pii_n_") for c in row.asDict())


def test_null_text_stays_null(spark):
    df = spark.createDataFrame([(1, None)], "k int, t string")
    (row,) = with_pii_scrubbed(df, "t").collect()
    assert row["text_scrubbed"] is None
    assert row["pii_n_email"] is None
