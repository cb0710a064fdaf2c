"""CMS / HLL sketch tests: pure-Python law parity, the overestimate
guarantee, merge laws, and accuracy sanity in the raw-HLL regime."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from spider_engine_spark.operators.sketches import (
    cms_counters,
    cms_lookup,
    hll_alpha,
    hll_estimate,
    hll_registers,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def word_df(spark):
    words = [f"w{i % 37}" for i in range(1000)] + ["hot"] * 200
    return (
        spark.createDataFrame([(w,) for w in words], "term string"),
        words,
    )


def test_cms_counters_match_pure_python(word_df):
    df, words = word_df
    W, D = 64, 4
    expect: dict = {}
    for w in words:
        for s in range(D):
            b = _h60(f"{w}:{s}") % W
            expect[(s, b)] = expect.get((s, b), 0) + 1
    got = {
        (r["seed"], r["bucket"]): r["cnt"]
        for r in cms_counters(df, "term", W, D).collect()
    }
    assert got == expect


def test_cms_estimate_law_and_overestimate(word_df):
    df, words = word_df
    W, D = 64, 4
    counters = cms_counters(df, "term", W, D)
    est = {
        r["term"]: r["cms_est"]
        for r in cms_lookup(
            counters, df.distinct(), "term", W, D
        ).collect()
    }
    true: dict = {}
    for w in words:
        true[w] = true.get(w, 0) + 1
    py_counters: dict = {}
    for w in words:
        for s in range(D):
            b = _h60(f"{w}:{s}") % W
            py_counters[(s, b)] = py_counters.get((s, b), 0) + 1
    for w, t in true.items():
        assert est[w] >= t  # collisions only ADD
        assert est[w] == min(
            py_counters[(s, _h60(f"{w}:{s}") % W)] for s in range(D)
        )


def test_cms_absent_term_estimates_from_zero_cells(spark, word_df):
    df, _ = word_df
    counters = cms_counters(df, "term", width=4096, depth=4)
    ghost = spark.createDataFrame(
        [("never-seen-term-xyzzy",)], "term string"
    )
    [r] = cms_lookup(counters, ghost, "term", 4096, 4).collect()
    # wide sketch, tiny corpus: all 4 cells almost surely untouched
    assert r["cms_est"] == 0


def test_cms_merge_is_cellwise_sum(spark):
    a = spark.createDataFrame([("x",), ("y",), ("x",)], "term string")
    b = spark.createDataFrame([("x",), ("z",)], "term string")
    W, D = 32, 2
    whole = {
        (r["seed"], r["bucket"]): r["cnt"]
        for r in cms_counters(a.union(b), "term", W, D).collect()
    }
    ca, cb = cms_counters(a, "term", W, D), cms_counters(b, "term", W, D)
    merged = {
        (r["seed"], r["bucket"]): r["cnt"]
        for r in ca.union(cb)
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert merged == whole


def test_cms_validation():
    with pytest.raises(ValueError, match="width/depth"):
        cms_counters(None, "term", width=0)


def test_hll_registers_match_pure_python(word_df):
    df, words = word_df
    B, m, w = 8, 256, 52
    regs = [0] * m
    for x in set(words):
        h = _h60(x)
        rho = w - (h >> B).bit_length() + 1
        regs[h % m] = max(regs[h % m], rho)
    got = {
        r["bucket"]: r["max_rho"]
        for r in hll_registers(df, "term", B).collect()
    }
    assert got == {i: regs[i] for i in range(m)}
    # exact integer denominator + the one-division estimate
    S = sum(1 << (w + 1 - M) for M in regs)
    [row] = hll_estimate(hll_registers(df, "term", B), B).collect()
    assert row["s"] == S
    assert row["raw_est"] == hll_alpha(m) * m * m * float(
        1 << (w + 1)
    ) / float(S)


def test_hll_merge_is_cellwise_max(spark):
    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "k string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], "k string")
    whole = {
        r["bucket"]: r["max_rho"]
        for r in hll_registers(a.union(b), "k", 8).collect()
    }
    merged = {
        r["bucket"]: r["max_rho"]
        for r in hll_registers(a, "k", 8)
        .union(hll_registers(b, "k", 8))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
        .collect()
    }
    assert merged == whole


def test_hll_accuracy_in_raw_regime(spark):
    """Raw HLL (no corrections) holds its ~1.04/sqrt(m) error once
    n >> 2.5m: 10k distinct keys on m=256 must land within 10%."""
    n = 10_000
    df = spark.range(n).select(F.concat(F.lit("key"), "id").alias("k"))
    [row] = hll_estimate(hll_registers(df, "k", 8), 8).collect()
    assert abs(row["raw_est"] - n) / n < 0.10


def test_hll_empty_input_gives_all_zero_registers(spark):
    df = spark.createDataFrame([], "k string")
    regs = hll_registers(df, "k", 8)
    assert regs.count() == 256
    assert regs.filter("max_rho <> 0").count() == 0
    [row] = hll_estimate(regs, 8).collect()
    # S = m * 2^(w+1): the documented raw-estimate floor alpha*m
    assert row["s"] == 256 * (1 << 53)
    assert row["raw_est"] == pytest.approx(hll_alpha(256) * 256)


def test_hll_validation(spark):
    df = spark.createDataFrame([("x",)], "k string")
    with pytest.raises(ValueError, match="bucket_bits"):
        hll_registers(df, "k", bucket_bits=2)


def test_cms_lookup_validates_dims(spark):
    df = spark.createDataFrame([("x",)], "term string")
    with pytest.raises(ValueError, match="width/depth"):
        cms_lookup(cms_counters(df, "term", 8, 2), df, "term", width=0)


def test_hll_plan_hashes_once_per_row(spark):
    """The md5 must be a ladder column: captured inside the filter
    lambda it re-evaluates per power-of-two comparison (w+1 hashes per
    row)."""
    df = spark.createDataFrame([("x",)], "k string")
    plan = (
        hll_registers(df, "k", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("md5(") <= 2  # bucket leg + at most one reuse


# ---------------------------------------------------------------------------
# Streaming sketch maintenance
# ---------------------------------------------------------------------------


def _tmp_root(tmp_path, sub):
    p = tmp_path / sub
    p.mkdir(parents=True, exist_ok=True)
    return str(p)


def test_streaming_cms_split_invariance(spark, tmp_path):
    """Folding ANY micro-batch split through the handler equals the
    batch sketch of the whole input (cells sum)."""
    from spider_engine_spark.sources.tableio import TableIO
    from spider_engine_spark.streaming.sketches import (
        cms_sketch_init,
        make_cms_batch_handler,
    )

    words = [(i, f"w{i % 11}") for i in range(400)]
    df = spark.createDataFrame(words, "row_id long, term string")
    io = TableIO(_tmp_root(tmp_path, "cms_state"))
    cms_sketch_init(spark, io, "c", term="term", width=64, depth=3)
    handler = make_cms_batch_handler(io, "c")
    for i in range(3):
        handler(df.filter(F.pmod(F.col("row_id"), F.lit(3)) == i), i)
    streamed = {
        (r["seed"], r["bucket"]): r["cnt"]
        for r in io.read(spark, "c").collect()
    }
    whole = {
        (r["seed"], r["bucket"]): r["cnt"]
        for r in cms_counters(df, "term", 64, 3).collect()
    }
    assert streamed == whole


def test_streaming_cms_replay_is_noop(spark, tmp_path):
    """A replayed committed batch must NOT double-count (the sum law
    is replay-hostile — this is the load-bearing guard)."""
    from spider_engine_spark.sources.tableio import TableIO
    from spider_engine_spark.streaming.sketches import (
        cms_sketch_init,
        make_cms_batch_handler,
    )

    df = spark.createDataFrame([("x",), ("x",), ("y",)], "term string")
    io = TableIO(_tmp_root(tmp_path, "cms_replay"))
    cms_sketch_init(spark, io, "c", term="term", width=16, depth=2)
    handler = make_cms_batch_handler(io, "c")
    handler(df, 0)
    before = sorted(map(tuple, io.read(spark, "c").collect()))
    handler(df, 0)  # crash-replay of the committed batch
    after = sorted(map(tuple, io.read(spark, "c").collect()))
    assert after == before
    # empty batches are no-ops too
    handler(df.filter("term = 'zzz'"), 1)
    assert sorted(map(tuple, io.read(spark, "c").collect())) == before


def test_streaming_hll_split_invariance_and_replay(spark, tmp_path):
    from spider_engine_spark.sources.tableio import TableIO
    from spider_engine_spark.streaming.sketches import (
        hll_sketch_init,
        make_hll_batch_handler,
    )

    df = spark.createDataFrame(
        [(i, f"k{i}") for i in range(500)], "row_id long, k string"
    )
    io = TableIO(_tmp_root(tmp_path, "hll_state"))
    hll_sketch_init(spark, io, "h", key="k", bucket_bits=8)
    handler = make_hll_batch_handler(io, "h")
    for i in range(4):
        handler(df.filter(F.pmod(F.col("row_id"), F.lit(4)) == i), i)
    handler(df.filter("row_id < 100"), 2)  # stale replay: no-op
    streamed = {
        r["bucket"]: r["max_rho"] for r in io.read(spark, "h").collect()
    }
    whole = {
        r["bucket"]: r["max_rho"]
        for r in hll_registers(df, "k", 8).collect()
    }
    assert streamed == whole
    # the persisted registers feed hll_estimate directly
    [row] = hll_estimate(io.read(spark, "h"), 8).collect()
    assert abs(row["raw_est"] - 500) / 500 < 0.35  # n ~ 2m: raw regime edge


def test_streaming_sketch_validation(spark, tmp_path):
    from spider_engine_spark.sources.tableio import TableIO
    from spider_engine_spark.streaming.sketches import (
        cms_sketch_append,
        cms_sketch_init,
        stream_cms_ingest,
    )

    io = TableIO(_tmp_root(tmp_path, "cms_val"))
    with pytest.raises(ValueError, match="does not exist"):
        stream_cms_ingest(
            spark, "/nope", io.root, "missing", "/cp", "term string"
        )
    cms_sketch_init(spark, io, "c", term="term", width=8, depth=2)
    bad = spark.createDataFrame([("x",)], "other string")
    with pytest.raises(ValueError, match="term column"):
        cms_sketch_append(io, "c", bad, batch_id=0)
    with pytest.raises(ValueError, match="term column"):
        stream_cms_ingest(
            spark, "/nope", io.root, "c", "/cp", "other string"
        )


def test_streaming_cms_true_readstream(spark, tmp_path):
    """The real Structured Streaming integration: two parquet files,
    maxFilesPerTrigger=1, availableNow drain; a SECOND run over the
    same checkpoint replays nothing (counters unchanged)."""
    from spider_engine_spark.sources.tableio import TableIO
    from spider_engine_spark.streaming.sketches import (
        cms_sketch_init,
        stream_cms_ingest,
    )

    in_dir = _tmp_root(tmp_path, "cms_in")
    a = spark.createDataFrame([("x",), ("y",), ("x",)], "term string")
    b = spark.createDataFrame([("x",), ("z",)], "term string")
    a.coalesce(1).write.mode("append").parquet(in_dir)
    b.coalesce(1).write.mode("append").parquet(in_dir)
    io = TableIO(_tmp_root(tmp_path, "cms_rs_state"))
    cms_sketch_init(spark, io, "c", term="term", width=32, depth=2)
    cp = _tmp_root(tmp_path, "cms_cp")
    q = stream_cms_ingest(
        spark, in_dir, io.root, "c", cp, "term string"
    )
    q.awaitTermination(120)
    got = {
        (r["seed"], r["bucket"]): r["cnt"]
        for r in io.read(spark, "c").collect()
    }
    whole = {
        (r["seed"], r["bucket"]): r["cnt"]
        for r in cms_counters(a.union(b), "term", 32, 2).collect()
    }
    assert got == whole
    # restart over the same checkpoint: nothing to replay, no change
    q2 = stream_cms_ingest(
        spark, in_dir, io.root, "c", cp, "term string"
    )
    q2.awaitTermination(120)
    got2 = {
        (r["seed"], r["bucket"]): r["cnt"]
        for r in io.read(spark, "c").collect()
    }
    assert got2 == whole


def test_hll_init_validates_bucket_bits(spark, tmp_path):
    from spider_engine_spark.sources.tableio import TableIO
    from spider_engine_spark.streaming.sketches import hll_sketch_init

    io = TableIO(_tmp_root(tmp_path, "hll_init_val"))
    with pytest.raises(ValueError, match="bucket_bits"):
        hll_sketch_init(spark, io, "h", bucket_bits=2)
    assert not io.exists("h")  # nothing committed before the check


def test_streaming_sketch_history_is_bounded(spark, tmp_path):
    """Per-batch overwrites must not accumulate snapshot dirs/manifest
    entries forever — expire_versions bounds both at every append."""
    import os

    from spider_engine_spark.sources.tableio import TableIO
    from spider_engine_spark.streaming.sketches import (
        _KEEP_VERSIONS,
        cms_sketch_init,
        make_cms_batch_handler,
    )

    io = TableIO(_tmp_root(tmp_path, "cms_hist"))
    cms_sketch_init(spark, io, "c", term="term", width=8, depth=2)
    handler = make_cms_batch_handler(io, "c")
    df = spark.createDataFrame([("x",), ("y",)], "term string")
    for i in range(_KEEP_VERSIONS + 6):
        handler(df, i)
    assert len(io.versions("c")) <= _KEEP_VERSIONS
    tdir = os.path.join(io.root, "c")
    dirs = [d for d in os.listdir(tdir) if d.startswith("v")]
    assert len(dirs) <= _KEEP_VERSIONS
    # the surviving counters still carry the FULL stream's sums
    got = {
        (r["seed"], r["bucket"]): r["cnt"]
        for r in io.read(spark, "c").collect()
    }
    whole = {
        (r["seed"], r["bucket"]): r["cnt"] * (_KEEP_VERSIONS + 6)
        for r in cms_counters(df, "term", 8, 2).collect()
    }
    assert got == whole


def test_hll_grouped_equals_per_group_global(spark):
    """A group's sparse rows + arithmetic zero-bucket accounting must
    be BIT-EQUAL to the global sketch of that group's rows alone."""
    from spider_engine_spark.operators.sketches import (
        hll_grouped_estimate,
        hll_grouped_registers,
    )

    rows = [(f"h{i % 3}", f"url{i}") for i in range(900)]
    df = spark.createDataFrame(rows, "host string, url string")
    regs = hll_grouped_registers(df, ["host"], "url", 8)
    est = {
        r["host"]: (r["s"], r["raw_est"])
        for r in hll_grouped_estimate(regs, ["host"], 8).collect()
    }
    for h in ("h0", "h1", "h2"):
        sub = df.filter(F.col("host") == h)
        [g] = hll_estimate(hll_registers(sub, "url", 8), 8).collect()
        assert est[h] == (g["s"], g["raw_est"])
    # sparse: no group materializes all 256 buckets for 300 keys
    per_group = regs.groupBy("host").count().collect()
    assert all(r["count"] <= 256 for r in per_group)


def test_hll_grouped_merge_across_shards(spark):
    from spider_engine_spark.operators.sketches import (
        hll_grouped_registers,
    )

    a = spark.createDataFrame(
        [("h", f"u{i}") for i in range(200)], "host string, url string"
    )
    b = spark.createDataFrame(
        [("h", f"u{i}") for i in range(100, 300)], "host string, url string"
    )
    whole = {
        (r["host"], r["bucket"]): r["max_rho"]
        for r in hll_grouped_registers(a.union(b), ["host"], "url", 8).collect()
    }
    merged = {
        (r["host"], r["bucket"]): r["max_rho"]
        for r in hll_grouped_registers(a, ["host"], "url", 8)
        .union(hll_grouped_registers(b, ["host"], "url", 8))
        .groupBy("host", "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
        .collect()
    }
    assert merged == whole


def test_cms_grouped_equals_per_group_global(spark):
    """A group's sparse cells + zero-cell probes must be BIT-EQUAL to
    the global sketch of that group's rows alone."""
    from spider_engine_spark.operators.sketches import (
        cms_grouped_counters,
        cms_grouped_lookup,
    )

    rows = [(f"h{i % 3}", f"t{i % 17}") for i in range(600)]
    df = spark.createDataFrame(rows, "host string, term string")
    counters = cms_grouped_counters(df, ["host"], "term", 64, 3)
    probes = df.distinct()
    est = {
        (r["host"], r["term"]): r["cms_est"]
        for r in cms_grouped_lookup(
            counters, probes, ["host"], "term", 64, 3
        ).collect()
    }
    for h in ("h0", "h1", "h2"):
        sub = df.filter(F.col("host") == h)
        g = {
            r["term"]: r["cms_est"]
            for r in cms_lookup(
                cms_counters(sub, "term", 64, 3),
                sub.distinct().select("term"),
                "term",
                64,
                3,
            ).collect()
        }
        for t, v in g.items():
            assert est[(h, t)] == v
    # true counts: every estimate >= truth
    true = {}
    for h, t in rows:
        true[(h, t)] = true.get((h, t), 0) + 1
    assert all(est[k] >= v for k, v in true.items())
    # absent (group, term) probes estimate from zero cells only (use a
    # wide sketch so the ghost's cells are almost surely untouched)
    ghost = spark.createDataFrame(
        [("h0", "never-seen-zzz")], "host string, term string"
    )
    [r] = cms_grouped_lookup(
        cms_grouped_counters(df, ["host"], "term", 4096, 3),
        ghost,
        ["host"],
        "term",
        4096,
        3,
    ).collect()
    assert r["cms_est"] == 0


def test_cms_grouped_merge_across_shards(spark):
    from spider_engine_spark.operators.sketches import (
        cms_grouped_counters,
    )

    a = spark.createDataFrame(
        [("h", f"t{i % 5}") for i in range(50)], "host string, term string"
    )
    b = spark.createDataFrame(
        [("h", f"t{i % 7}") for i in range(70)], "host string, term string"
    )
    whole = {
        (r["host"], r["seed"], r["bucket"]): r["cnt"]
        for r in cms_grouped_counters(a.union(b), ["host"], "term", 32, 2).collect()
    }
    merged = {
        (r["host"], r["seed"], r["bucket"]): r["cnt"]
        for r in cms_grouped_counters(a, ["host"], "term", 32, 2)
        .union(cms_grouped_counters(b, ["host"], "term", 32, 2))
        .groupBy("host", "seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert merged == whole
