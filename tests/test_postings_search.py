"""Postings-build + search-pipeline oracles on the reference's canonical
`user` fixture (FIXTURES.md F1; /root/reference/core/table/table_test.go).

The dominant reference test pattern is the durability round-trip: query in
memory -> persist -> query -> reload -> merge -> query with identical
results (table_test.go:92-147). Here: same assertions against (a) the
directly-built postings, (b) postings written+reloaded via parquet,
(c) postings merged from two snapshot halves.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_engine_spark.operators.postings import (
    GOD_FIELD,
    build_postings,
    build_postings_native,
    merge_postings,
    query_term,
)
from spider_engine_spark.operators.search import SearchFilter, search

ROWS = [
    # table_test.go:70-89 canonical rows (doc_id assigned in insert order)
    (0, "10001", "张三", 20, "喜欢美食,也喜欢旅游"),
    (1, "10002", "李四", 28, "喜欢电影,也喜欢美食"),
    (2, "10003", "王二麻", 30, "喜欢养生"),
    (3, "10004", "爱新觉罗", 69, "喜欢美食, 更喜欢打仗"),
    (4, "10005", "李世民", 50, "喜欢秋香和美食"),
]
SCHEMA = "doc_id long, user_id string, user_name string, user_age long, user_desc string"
FIELDS = {"user_name": "whole", "user_desc": "words"}


@pytest.fixture(scope="module")
def user_df(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


@pytest.fixture(scope="module")
def user_postings(user_df):
    return build_postings(user_df, "doc_id", FIELDS).cache()


def probe_ids(postings, field, term):
    return sorted(
        r.doc_id for r in query_term(postings, field, term).collect()
    )


def test_term_probe_meishi(user_df, user_postings):
    # reference: search user_desc='美食' hits docs containing 美食
    # (table_test.go:102-147); the bundled max-match dictionary segments
    # the fixture corpus exactly like gojieba, so the probe term IS 美食
    assert probe_ids(user_postings, "user_desc", "美食") == [0, 1, 3, 4]


def test_whole_field_exact_term(user_postings):
    # T1: user_name indexed as a single whole-string term
    assert probe_ids(user_postings, "user_name", "李四") == [1]
    assert probe_ids(user_postings, "user_name", "李") == []


def test_god_field_cross_field(user_postings):
    # god field cross-field search (table_test.go:876-957): 王二麻
    # segments as 王二/麻, so the god-field probe term is 王二.
    assert probe_ids(user_postings, GOD_FIELD, "王二") == [2]
    # '美食' appears in user_desc of docs 0,1,3,4 via god field too
    assert probe_ids(user_postings, GOD_FIELD, "美食") == [0, 1, 3, 4]


def test_postings_sorted_and_df(user_postings):
    row = user_postings.filter(
        (F.col("field") == "user_desc") & (F.col("term") == "美食")
    ).collect()[0]
    ids = [p.doc_id for p in row.postings]
    assert ids == sorted(ids)
    assert row.df == 4


def test_durability_roundtrip(tmp_path, spark, user_df, user_postings):
    # persist -> reload -> identical probe results (table_test.go:92-147)
    path = str(tmp_path / "postings")
    user_postings.write.mode("overwrite").parquet(path)
    reloaded = spark.read.parquet(path)
    assert probe_ids(reloaded, "user_desc", "美食") == [0, 1, 3, 4]

    # split-build + merge == whole-build (invertedindex.go:349-507 oracle)
    half1 = build_postings(user_df.filter("doc_id < 2"), "doc_id", FIELDS)
    half2 = build_postings(user_df.filter("doc_id >= 2"), "doc_id", FIELDS)
    merged = merge_postings(half1, half2)
    whole = user_postings
    for fld, term in [("user_desc", "美食"), ("user_desc", "喜"), (GOD_FIELD, "美食")]:
        assert probe_ids(merged, fld, term) == probe_ids(whole, fld, term)
    # postings arrays bit-equal after merge
    a = {
        (r.field, r.term): [(p.doc_id, p.weight) for p in r.postings]
        for r in merged.collect()
    }
    b = {
        (r.field, r.term): [(p.doc_id, p.weight) for p in r.postings]
        for r in whole.collect()
    }
    assert a == b


def test_search_end_to_end(user_df, user_postings):
    rows = search(
        user_df,
        user_postings,
        keyword="美食",
        search_field="user_desc",
        max_doc=5,
    ).orderBy(F.desc("score"), "doc_id").collect()
    assert [r.doc_id for r in rows] == sorted(
        [r.doc_id for r in rows],
        key=lambda d: (-[x.score for x in rows if x.doc_id == d][0], d),
    )
    assert {r.doc_id for r in rows} == {0, 1, 3, 4}
    # hydration carries base columns (table.go:1041-1071)
    assert rows[0].user_name is not None
    # TF-IDF: df=4, maxdoc=5 -> idf=log10(1.25); weights differ by desc length
    assert all(r.score >= 0 for r in rows)


def test_search_filters_between_and_prefix(user_df, user_postings):
    # table_test.go:773-836: between 18..22 and prefix '李'
    rows = search(
        user_df,
        user_postings,
        keyword="美食",
        search_field="user_desc",
        filters=[SearchFilter("user_age", "between", begin=18, end=22)],
        max_doc=5,
    ).collect()
    assert [r.doc_id for r in rows] == [0]

    rows = search(
        user_df,
        user_postings,
        keyword="美食",
        search_field="user_desc",
        filters=[SearchFilter("user_name", "prefix", value="李")],
        max_doc=5,
    ).collect()
    assert sorted(r.doc_id for r in rows) == [1, 4]


def test_filter_gt_means_ge(user_df, user_postings):
    # forwardindex.go:583-586: '>' evaluates >=
    rows = search(
        user_df,
        user_postings,
        keyword="美食",
        search_field="user_desc",
        filters=[SearchFilter("user_age", ">", value=28)],
        max_doc=5,
    ).collect()
    assert sorted(r.doc_id for r in rows) == [1, 3, 4]  # 28 included


def test_sentinel_exclusion(spark, user_postings):
    # MaxInt64 numeric sentinel excluded from matches except 'not in'
    rows2 = [
        (0, "a", (1 << 63) - 1),
        (1, "b", 20),
        (2, "c", -1),  # -1 & MaxInt64 == MaxInt64 -> sentinel too
    ]
    df = spark.createDataFrame(rows2, "doc_id long, name string, age long")
    from spider_engine_spark.operators.search import filter_condition

    got = sorted(
        r.doc_id
        for r in df.filter(
            filter_condition(SearchFilter("age", ">", value=-100), True)
        ).collect()
    )
    assert got == [1]
    got = sorted(
        r.doc_id
        for r in df.filter(
            filter_condition(
                SearchFilter("age", "not in", values=[21]), True
            )
        ).collect()
    )
    assert got == [0, 1, 2]  # sentinel rows pass 'not in'


def test_pagination_clamp(user_df, user_postings):
    # invalid size -> clamp to (0, min(100, total)) (table.go:1029-1039)
    rows = search(
        user_df, user_postings, keyword="美食", search_field="user_desc",
        offset=0, size=0, max_doc=5,
    ).collect()
    assert len(rows) == 4
    rows = search(
        user_df, user_postings, keyword="美食", search_field="user_desc",
        offset=1, size=2, max_doc=5,
    ).collect()
    assert len(rows) == 2
    # out-of-range offset+size -> clamp to full first page
    rows = search(
        user_df, user_postings, keyword="美食", search_field="user_desc",
        offset=3, size=99, max_doc=5,
    ).collect()
    assert len(rows) == 4


def test_empty_keyword_full_scan(user_df, user_postings):
    # partition.go:701-704: keyword '' scans all docs, weight 0 -> score 0
    rows = search(
        user_df, user_postings, keyword="", search_field="user_desc", max_doc=5
    ).collect()
    assert len(rows) == 5
    assert all(r.score == 0 for r in rows)


def test_deleted_antijoin(spark, user_df, user_postings):
    deleted = spark.createDataFrame([(1,)], "doc_id long")
    rows = search(
        user_df,
        user_postings,
        keyword="美食",
        search_field="user_desc",
        deleted=deleted,
        max_doc=5,
    ).collect()
    assert sorted(r.doc_id for r in rows) == [0, 3, 4]


def test_native_postings_matches_python(spark):
    # the JVM fast path reproduces the pandas-UDF T4 weights on
    # whitespace corpora (incl. the float32 TF law)
    df = spark.createDataFrame(
        [(0, "a b a c"), (1, "b b b"), (2, "c a  c")],
        "doc_id long, text string",
    )
    native = build_postings_native(df, "doc_id", "text")
    python = build_postings(df, "doc_id", {"text": "words"}, god=False)
    a = {
        (r.term): [(p.doc_id, p.weight) for p in r.postings]
        for r in native.collect()
    }
    b = {
        (r.term): [(p.doc_id, p.weight) for p in r.postings]
        for r in python.collect()
    }
    assert a == b
    assert a["a"] == [(0, 5000), (2, 3333)]


def test_native_tf_law_is_float32_on_adversarial_pairs(spark):
    """The float32 TF law diverges from naive double arithmetic on 188
    (cnt,total) pairs with total<=600 — e.g. (39,50): float32 gives
    7799, double gives 7800. Both JVM paths (build_postings_native and
    the field_tokens words gate) must hit the float32 value bit-for-bit;
    a double-promoted Divide would pass every uniform-random corpus test
    yet break oracle exactness on real corpora."""
    import numpy as np

    from spider_engine_spark.functions.tokenizers import tf_weight
    from spider_engine_spark.operators.postings import field_tokens

    # find divergent pairs instead of hard-coding them
    pairs = []
    for total in range(2, 301):
        cnt = np.arange(1, total)
        f32 = (
            (cnt.astype(np.float32) / np.float32(total)).astype(np.float32)
            * np.float32(10000)
        ).astype(np.int64)
        dbl = ((cnt / total) * 10000.0).astype(np.int64)
        for b in np.nonzero(f32 != dbl)[0][:1]:
            pairs.append((int(cnt[b]), total))
    assert pairs, "no divergent pairs below 300 — law scan is broken"
    pairs = pairs[:8]

    rows = []
    for i, (c, t) in enumerate(pairs):
        fillers = " ".join(f"w{j}" for j in range(t - c))
        rows.append((i, ("aa " * c + fillers).strip()))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    for path, got in (
        (
            "build_postings_native",
            {
                p.doc_id: p.weight
                for r in build_postings_native(
                    df, "doc_id", "text"
                ).collect()
                if r.term == "aa"
                for p in r.postings
            },
        ),
        (
            "field_tokens",
            {
                r["doc_id"]: r["weight"]
                for r in field_tokens(df, "doc_id", "text", "words").collect()
                if r["term"] == "aa"
            },
        ),
    ):
        for i, (c, t) in enumerate(pairs):
            want = tf_weight(c, t)
            assert got[i] == want, (
                f"{path}: pair (cnt={c}, total={t}) gave {got[i]}, "
                f"float32 law says {want}"
            )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join pattern for repeated large⋈large joins at scale:
    both sides written with bucketBy on the join key join WITHOUT any
    Exchange in the physical plan (the shuffle is paid once at write
    time — the layout the postings/base tables would use on a real
    warehouse for recurring doc_id joins)."""
    import io as _io
    import contextlib

    from pyspark.sql import functions as F

    a = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("x")
    )
    b = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 31).alias("y")
    )
    for name, df in (("t_bucket_a", a), ("t_bucket_b", b)):
        df.write.mode("overwrite").bucketBy(8, "doc_id").sortBy(
            "doc_id"
        ).option("path", str(tmp_path / name)).saveAsTable(name)
    # disable broadcast so the planner exercises the bucketed
    # sort-merge path (the large⋈large case this layout exists for)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_bucket_a").join(
            spark.table("t_bucket_b"), "doc_id"
        )
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        # co-located: neither side shuffles at query time
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    for name in ("t_bucket_a", "t_bucket_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_multi_term_or_scores_and_guards(user_df, user_postings):
    """multi_term_or: per-doc score = sum of per-term TF-IDF over the
    union of matched terms; empty term lists raise instead of building a
    None plan (same guard on multi_term_and)."""
    from spider_engine_spark.operators.postings import (
        multi_term_and,
        multi_term_or,
    )
    from spider_engine_spark.operators.search import tfidf_score

    out = {
        r["doc_id"]: (r["n_terms"], r["score"])
        for r in multi_term_or(
            user_postings, "user_desc", ["美食", "打仗"], max_doc=5
        ).collect()
    }
    # 美食 in docs 0,1,3,4 (df=4); 打仗 only in doc 3 (df=1)
    assert set(out) == {0, 1, 3, 4}
    assert out[3][0] == 2 and out[0][0] == 1
    # doc 3 accumulates both terms' scores; single-term docs score
    # exactly the one-term law
    w = {
        (r["doc_id"], r["term"]): r["weight"]
        for r in user_postings.filter(
            F.col("term").isin(["美食", "打仗"])
            & (F.col("field") == "user_desc")
        )
        .select("term", F.explode("postings").alias("p"))
        .select("term", F.col("p.doc_id").alias("doc_id"), F.col("p.weight").alias("weight"))
        .collect()
    }
    spark = user_df.sparkSession

    def law(weight, df):
        return (
            spark.range(1)
            .select(tfidf_score(F.lit(weight), 5, F.lit(df)).alias("s"))
            .first()["s"]
        )

    assert out[0][1] == law(w[(0, "美食")], 4)
    assert out[3][1] == law(w[(3, "美食")], 4) + law(w[(3, "打仗")], 1)

    with pytest.raises(ValueError):
        multi_term_or(user_postings, "user_desc", [], max_doc=5)
    with pytest.raises(ValueError):
        multi_term_and(user_postings, "user_desc", [])


def test_hybrid_words_tokens_match_python(spark):
    """The round-5 JVM fast path for printable-ASCII 'words' content must
    be bit-equal (terms AND float32 TF weights) to the Python T4
    splitter; non-ASCII / oversize rows route to the pandas UDF, so the
    hybrid output equals the pure-Python oracle on EVERY doc."""
    import random

    from spider_engine_spark.functions.tokenizers import split_true_words
    from spider_engine_spark.operators.postings import field_tokens

    rng = random.Random(7)
    alphabet = list("abz019_ .,;:?!\"()-~#$%&`^+=[]{}@'/<>|*\\") + [
        "。", "天", "安", "门", "美", "食", "é", "🙂",
    ]
    corpus = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(300)
    ]
    corpus += [
        "", " ", "a b a c", "w1 w2 w1", "x" * 5000, "y " * 3000,
        "天安门 美食", "mixed 美食 ascii", "。。a。b。", "a" * 4096,
        "~!@#$%^&*()", "_under_scores_ __ x",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(corpus)], "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in field_tokens(df, "doc_id", "text", "words").collect():
        got.setdefault(r["doc_id"], set()).add((r["term"], r["weight"]))
    want = {
        i: set(split_true_words(s))
        for i, s in enumerate(corpus)
        if split_true_words(s)
    }
    assert got == want


def test_native_whole_semicolon_match_python(spark):
    """whole/semicolon now run fully native — parity vs the Python
    splitters on edge inputs (empty strings, dup semicolon fields,
    nulls, unicode)."""
    from spider_engine_spark.functions.tokenizers import tokenize
    from spider_engine_spark.operators.postings import field_tokens

    corpus = ["", "a;b;;a", "x", "天;天;门", None, "  spaces  ", ";", "a;"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(corpus)], "doc_id long, text string"
    )
    for mode in ("whole", "semicolon"):
        got: dict[int, set] = {}
        for r in field_tokens(df, "doc_id", "text", mode).collect():
            got.setdefault(r["doc_id"], set()).add((r["term"], r["weight"]))
        want = {
            i: set(tokenize(s, mode))
            for i, s in enumerate(corpus)
            if s is not None and tokenize(s, mode)
        }
        assert got == want


def test_bm25_single_term_hand_computed(spark):
    """BM25 saturation/length-normalization core on a tiny corpus:
    d1 ("x x y"): tf=2, dl=3, avgdl=3 -> 4.4/3.2 = 1.375
    d2 ("x z z z"): tf=1, dl=4 -> 2.2/(1+1.2*(0.25+0.75*4/3)) = 0.88
    d3 ("y y"): no hit -> absent. Higher tf with shorter doc wins."""
    from spider_engine_spark.operators.search import bm25_single_term

    docs = spark.createDataFrame(
        [("d1", "x x y"), ("d2", "x z z z"), ("d3", "y y")],
        "doc_id string, text string",
    )
    rows = bm25_single_term(docs, "doc_id", "text", "x").collect()
    assert [r.doc_id for r in rows] == ["d1", "d2"]
    assert (rows[0].tf, rows[0].dl) == (2, 3)
    assert rows[0].score == pytest.approx(1.375)
    assert rows[1].score == pytest.approx(0.88)
    assert rows[0].score > rows[1].score


def test_bm25_plan_single_explode(spark):
    """The corpus must be scanned/tokenized ONCE: a tf-vs-dl join shape
    re-explodes the corpus per branch (measured 3 scans pre-fix)."""
    from spider_engine_spark.operators.search import bm25_single_term

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        bm25_single_term(docs, "doc_id", "text", "spark")
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_gen = plan.count("Generate explode")
    assert 0 < n_gen <= 2, (
        f"{n_gen} explodes in the BM25 plan — the avgdl branch may "
        "re-derive the grouped frame once, but a third means the "
        "tf/dl join shape is back"
    )


def test_bm25_multi_term_hand_computed(spark):
    """Full multi-term Okapi with rational idf, IEEE-exact: expected
    scores replicated operand-for-operand in Python doubles."""
    from spider_engine_spark.operators.search import bm25_rank

    docs = spark.createDataFrame(
        [
            ("d1", "spark spark vector x"),
            ("d2", "spark y z"),
            ("d3", "a b"),
        ],
        "doc_id string, text string",
    )
    rows = bm25_rank(docs, "doc_id", "text", ["spark", "vector"]).collect()
    # N=3, sumdl=9, avgdl=3.0, df_spark=2, df_vector=1
    def expect(tf0, tf1, dl, n=3, avgdl=3.0, df0=2, df1=1, k1=1.2, b=0.75):
        s = 0.0
        norm = (1.0 - b) + b * (dl / avgdl)
        for tf, df in ((tf0, df0), (tf1, df1)):
            idf = (n - df + 0.5) / (df + 0.5)
            part = (tf * (k1 + 1.0)) / (tf + k1 * norm)
            s = s + idf * part if s else idf * part
        return s

    got = {r.doc_id: (r.tf_0, r.tf_1, r.dl, r.score) for r in rows}
    assert set(got) == {"d1", "d2"}  # d3 matches nothing
    assert got["d1"][:3] == (2, 1, 4)
    assert got["d2"][:3] == (1, 0, 3)
    # bit-exact, not approx: the whole design claim
    assert got["d1"][3] == expect(2, 1, 4)
    assert got["d2"][3] == expect(1, 0, 3)
    assert got["d1"][3] > got["d2"][3]
    # zero-tf term contributes exactly +0.0: d2's score equals the
    # single-term law for 'spark' with its idf factor
    idf0 = (3 - 2 + 0.5) / (2 + 0.5)
    part = (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * (3 / 3.0)))
    assert got["d2"][3] == idf0 * part

    import pytest as _pytest

    with _pytest.raises(ValueError, match="distinct"):
        bm25_rank(docs, "doc_id", "text", ["spark", "spark"])
    with _pytest.raises(ValueError, match="non-empty"):
        bm25_rank(docs, "doc_id", "text", [])


def test_bm25_multi_plan_single_explode(spark):
    from spider_engine_spark.operators.search import bm25_rank

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        bm25_rank(docs, "doc_id", "text", ["spark", "vector", "index"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_gen = plan.count("Generate explode")
    assert 0 < n_gen <= 2, f"{n_gen} explodes in the multi-term BM25 plan"
