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


# ---------------------------------------------------------------------------
# pii_spans: positionally-exclusive span extraction
# ---------------------------------------------------------------------------


def _py_patterns():
    import re

    return [(k, re.compile(p)) for k, p, _ in PII_PATTERNS]


def test_pii_spans_hand_computed(spark):
    from spider_engine_spark.functions.pii import with_pii_spans

    rows = [
        (0, "mail a@b.io now"),            # one email at 5, len 6
        (1, "ip 10.0.0.1 end"),            # one ipv4 at 3, len 8
        (2, "call 555-014-2398 ok"),       # one phone at 5, len 12
        (3, "no pii here"),
    ]
    df = spark.createDataFrame(rows, ["i", "t"])
    got = {
        r["i"]: [(s["kind"], s["start"], s["len"]) for s in r["pii_spans"]]
        for r in with_pii_spans(df, "t").collect()
    }
    assert got[0] == [("email", 5, 6)]
    assert got[1] == [("ipv4", 3, 8)]
    assert got[2] == [("phone", 5, 12)]
    assert got[3] == []


def test_pii_spans_exclusive_and_engine_parity(spark):
    """Over every adversarial fixture: spans are sorted, disjoint, each
    span's substring fully matches its kind's pattern, and the RAW
    per-kind Python finditer count equals Spark's regexp_count (Java) —
    the cross-engine matching-parity pin the span law rests on."""
    from spider_engine_spark.functions.pii import with_pii_spans

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURES)], ["i", "t"]
    )
    cols = [with_pii_spans(df, "t")]
    sel = cols[0].select(
        "i", "t", "pii_spans",
        *[pii_counts(F.col("t"), k).alias(f"n_{k}") for k, _, _ in PII_PATTERNS],
    )
    pats = _py_patterns()
    for r in sel.collect():
        t, spans = r["t"], r["pii_spans"]
        ends = 0
        for s in spans:
            assert s["start"] >= ends, (t, spans)  # sorted + disjoint
            ends = s["start"] + s["len"]
            sub = t[s["start"]: s["start"] + s["len"]]
            rx = dict((k, p) for k, p in pats)[s["kind"]]
            assert rx.fullmatch(sub), (t, s, sub)
        for k, rx in pats:
            assert len(list(rx.finditer(t))) == r[f"n_{k}"], (t, k)


def test_pii_spans_cross_kind_overlap_earlier_kind_wins(spark):
    from spider_engine_spark.functions.pii import pii_spans

    # the email's local part contains a 10-digit run that matches the
    # phone pattern on its own — it must be suppressed; the standalone
    # phone survives
    t = "call 555-014-2398 or a1234567890@x.co"
    df = spark.createDataFrame([(t,)], ["t"])
    got = [
        (s["kind"], s["start"], s["len"])
        for s in df.select(pii_spans(F.col("t")).alias("s")).first()["s"]
    ]
    assert ("email", t.index("a1234567890"), len("a1234567890@x.co")) in got
    assert ("phone", 5, 12) in got
    assert not any(
        k == "phone" and st > 20 for k, st, _ in got
    ), got  # no phone span inside the email


def test_pii_spans_boundary_artifact_documented(spark):
    """The chained scrub's email-then-ipv4 artifact: redacting the email
    EXPOSES a word boundary that lets ipv4 match text it cannot match in
    the original. Span accounting (original text) reports only the
    email; the chained scrub emits both tokens. Both behaviors pinned."""
    from spider_engine_spark.functions.pii import pii_spans

    t = "x@y.com1.2.3.4"
    df = spark.createDataFrame([(t,)], ["t"])
    row = df.select(
        pii_spans(F.col("t")).alias("s"), scrub_pii(F.col("t")).alias("sc")
    ).first()
    got = [(s["kind"], s["start"], s["len"]) for s in row["s"]]
    assert got == [("email", 0, 7)]
    assert row["sc"] == "<EMAIL><IP>"


def test_pii_spans_reconstruction_matches_scrub_when_no_artifact(spark):
    """Replacing the extracted spans with their tokens reproduces the
    chained scrub exactly on artifact-free text."""
    from spider_engine_spark.functions.pii import with_pii_spans

    tokens = {k: tok for k, _, tok in PII_PATTERNS}
    idx = [0, 1, 3, 5, 10]  # fixtures with no cross-kind interference
    df = spark.createDataFrame(
        [(i, FIXTURES[i]) for i in idx], ["i", "t"]
    )
    out = with_pii_spans(df, "t").withColumn("sc", scrub_pii(F.col("t")))
    for r in out.collect():
        t = r["t"]
        rebuilt, pos = [], 0
        for s in r["pii_spans"]:
            rebuilt.append(t[pos: s["start"]])
            rebuilt.append(tokens[s["kind"]])
            pos = s["start"] + s["len"]
        rebuilt.append(t[pos:])
        assert "".join(rebuilt) == r["sc"], (t, r["pii_spans"])


def test_pii_spans_null_and_kinds(spark):
    from spider_engine_spark.functions.pii import pii_spans

    import pytest as _pytest

    df = spark.createDataFrame([(None,), ("a@b.io 1.2.3.4",)], "t string")
    rows = df.select(pii_spans(F.col("t"), ("email",)).alias("s")).collect()
    vals = [r["s"] for r in rows]
    assert None in vals
    only_email = [v for v in vals if v is not None][0]
    assert [s["kind"] for s in only_email] == ["email"]
    with _pytest.raises(ValueError, match="unknown PII kind"):
        df.select(pii_spans(F.col("t"), ("emial",)))
