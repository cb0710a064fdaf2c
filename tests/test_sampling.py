"""Deterministic sampling: reproducibility, partition-independence,
coupling, stratified rates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_engine_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    uniform_unit,
    weighted_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).cache()


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_sample_is_reproducible_and_partition_independent(docs):
    a = _ids(deterministic_sample(docs, "doc_id", 0.3))
    b = _ids(deterministic_sample(docs, "doc_id", 0.3))
    assert a == b
    # reshuffling the input changes nothing (df.sample would fail this)
    c = _ids(
        deterministic_sample(
            docs.repartition(7, "source").sortWithinPartitions("n_chars"),
            "doc_id",
            0.3,
        )
    )
    assert a == c
    # rate sanity: binomial(500, .3) within 6 sigma
    assert abs(len(a) - 150) < 62


def test_lower_rate_is_subset_of_higher(docs):
    s10 = _ids(deterministic_sample(docs, "doc_id", 0.1))
    s30 = _ids(deterministic_sample(docs, "doc_id", 0.3))
    assert s10 <= s30  # coupled samples: scaling-ladder property
    # different salt -> a (near-certainly) different, independent draw
    other = _ids(deterministic_sample(docs, "doc_id", 0.1, salt=1))
    assert other != s10


def test_rate_bounds_rejected(docs):
    with pytest.raises(ValueError):
        deterministic_sample(docs, "doc_id", 1.5)
    with pytest.raises(ValueError):
        stratified_sample(docs, "doc_id", "lang", {"en": -0.1})


def test_weighted_sample_matches_manual_threshold(docs):
    # weight = 1 for long docs, 0 for short: the sample must be exactly
    # the long docs (p=1 always keeps: u in [0,1) < 1; p=0 never keeps)
    w = F.when(F.col("n_chars") >= 200, F.lit(1.0)).otherwise(F.lit(0.0))
    got = _ids(weighted_sample(docs, "doc_id", w))
    want = _ids(docs.filter("n_chars >= 200"))
    assert got == want
    # fractional weights reproduce the per-row u < p rule exactly
    w2 = F.when(F.col("n_chars") >= 200, F.lit(0.5)).otherwise(F.lit(0.05))
    got2 = _ids(weighted_sample(docs, "doc_id", w2, salt=3))
    manual = _ids(
        docs.filter(
            uniform_unit(F.col("doc_id"), 3)
            < F.when(F.col("n_chars") >= 200, 0.5).otherwise(0.05)
        )
    )
    assert got2 == manual


def test_stratified_rates_per_language(docs):
    out = stratified_sample(
        docs, "doc_id", "lang", {"en": 1.0, "de": 0.0}, default_rate=0.5
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("en") == totals["en"]  # rate 1.0 keeps all
    assert "de" not in by_lang  # rate 0.0 drops all
    for lang, n in by_lang.items():
        if lang not in ("en", "de"):  # default 0.5 within 6 sigma
            assert abs(n - totals[lang] * 0.5) < 6 * (totals[lang] * 0.25) ** 0.5


def test_md5_law_bit_equal_to_python_and_coupled(docs):
    """law='md5' is the SQL-reproducible sampling law: u must equal the
    pure-Python recomputation bit-for-bit (same md5-h60 construction the
    DuckDB oracle uses), the hash-law switch must not break coupling,
    and an unknown law must be rejected."""
    import hashlib

    rows = docs.select(
        "doc_id", uniform_unit(F.col("doc_id"), 7, "md5").alias("u")
    ).collect()
    assert len(rows) > 0
    for r in rows:
        h = int(
            hashlib.md5(f"{r['doc_id']}:7".encode()).hexdigest()[:15], 16
        )
        assert r["u"] == (h % (1 << 53)) / float(1 << 53)
    lo = _ids(deterministic_sample(docs, "doc_id", 0.1, salt=7, law="md5"))
    hi = _ids(deterministic_sample(docs, "doc_id", 0.3, salt=7, law="md5"))
    assert lo <= hi
    # md5 and xxhash64 draws are independent samples, not renamings
    assert lo != _ids(deterministic_sample(docs, "doc_id", 0.1, salt=7))
    with pytest.raises(ValueError):
        deterministic_sample(docs, "doc_id", 0.1, law="sha9000")


def test_null_key_rows_are_dropped_not_grouped(spark):
    """NULL keys must yield NULL u (dropped by every sample filter, like
    the SQL law where || propagates NULL) — not one shared constant u
    that moves the whole null group in or out together."""
    df = spark.createDataFrame(
        [(None, "x"), (None, "y"), (1, "z"), (2, "w")],
        "k long, v string",
    )
    for law in ("xxhash64", "md5"):
        got = df.select(uniform_unit(F.col("k"), 0, law).alias("u")).collect()
        by_null = {r["u"] is None for r in got[:2]}
        assert by_null == {True}, f"law={law}: null key produced a u"
        # and at ANY rate the null rows are never sampled
        kept = deterministic_sample(df, "k", 0.999, law=law).collect()
        assert all(r["k"] is not None for r in kept)


def test_weighted_sample_drops_nan_and_null_weights(spark):
    """NaN/NULL weights = no usable score -> p=0 (dropped). Spark's
    least/greatest order NaN above all doubles, so the unguarded clamp
    turned NaN into keep-with-certainty."""
    df = spark.createDataFrame(
        [(1, float("nan")), (2, None), (3, 1.0), (4, 0.0)],
        "doc_id long, score double",
    )
    kept = _ids(weighted_sample(df, "doc_id", F.col("score")))
    assert kept == {3}  # p=1 keeps, p=0 / NaN / NULL drop


def test_mixture_rates_law_hand_computed():
    """4:2:1:1 over equal counts: the heaviest stratum binds (rate 1),
    the rest downsample to the exact target ratios."""
    from spider_engine_spark.operators.sampling import (
        mixture_rates,
        normalize_weights,
    )

    shares = normalize_weights(
        {"a": 4.0, "b": 2.0, "c": 1.0, "d": 1.0}
    )
    assert shares == {"a": 0.5, "b": 0.25, "c": 0.125, "d": 0.125}
    rates = mixture_rates({"a": 100, "b": 100, "c": 100, "d": 100}, shares)
    assert rates == {"a": 1.0, "b": 0.5, "c": 0.25, "d": 0.25}
    # a scarce heavy stratum binds harder: n_star = 40/0.5 = 80
    rates = mixture_rates({"a": 40, "b": 100, "c": 100, "d": 100}, shares)
    assert rates == {"a": 1.0, "b": 0.2, "c": 0.1, "d": 0.1}


def test_mixture_rates_validation():
    from spider_engine_spark.operators.sampling import (
        mixture_rates,
        normalize_weights,
    )

    with pytest.raises(ValueError, match="positive"):
        normalize_weights({"a": 1.0, "b": 0.0})
    with pytest.raises(ValueError, match="positive"):
        normalize_weights({"a": 1.0, "b": -2.0})
    with pytest.raises(ValueError, match="no rows"):
        mixture_rates({"a": 10}, {"a": 0.5, "b": 0.5})


def test_mixture_resample_hits_exact_proportions(docs):
    """Kept counts follow the deterministic hash law; the binding
    stratum keeps everything and strata outside the mix are dropped."""
    from spider_engine_spark.operators.sampling import (
        mixture_rates,
        mixture_resample,
        normalize_weights,
        uniform_unit,
    )

    weights = {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 1.0}
    kept = mixture_resample(docs, "doc_id", "source", weights, salt=11)
    got = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert set(got) <= set(weights)  # everything else dropped
    # binding stratum (src0, share 0.5 over equal counts) keeps all rows
    n0 = docs.filter(F.col("source") == "src0").count()
    assert got["src0"] == n0
    # expected counts recomputed row-by-row from the same law
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    rates = mixture_rates(
        {s: counts[s] for s in weights}, normalize_weights(weights)
    )
    for s, rate in rates.items():
        expect = docs.filter(
            (F.col("source") == s)
            & (uniform_unit(F.col("doc_id"), 11) < F.lit(rate))
        ).count()
        assert got.get(s, 0) == expect


def test_mixture_empty_weights_and_counts_reuse(docs):
    from spider_engine_spark.operators.sampling import (
        mixture_resample,
        normalize_weights,
        stratum_counts,
    )

    with pytest.raises(ValueError, match="non-empty"):
        normalize_weights({})
    weights = {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 1.0}
    counts = stratum_counts(docs, "source")
    a = _ids(mixture_resample(docs, "doc_id", "source", weights, salt=11))
    b = _ids(
        mixture_resample(
            docs, "doc_id", "source", weights, salt=11, counts=counts
        )
    )
    assert a == b


def test_mixture_resample_plan_is_shuffle_free(docs):
    """The returned frame is a stateless filter over the scan — no
    Exchange, no UDF (the counts pass is a separate bounded job)."""
    from spider_engine_spark.operators.sampling import mixture_resample

    weights = {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 1.0}
    plan = (
        mixture_resample(docs, "doc_id", "source", weights)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF on the data path
