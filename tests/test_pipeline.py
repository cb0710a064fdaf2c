"""clean_corpus composition tests: the funnel equals the manually
chained stages, dropped docs stay visible at their drop stage, and the
stats aggregate does not re-expand the quality ladder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_engine_spark.operators.pipeline import (
    clean_corpus,
    funnel_stats,
)

# three DISTINCT fillers — a shared one would repeat 2-grams across a
# doc's lines and (correctly) fail the Gopher repetition gate
LA = " ".join(f"alpha{i} tok{i}" for i in range(10))
LB = " ".join(f"beta{i} word{i}" for i in range(10))
LC = " ".join(f"gamma{i} item{i}" for i in range(10))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # survives everything: 3 keeper lines, unique, long enough
        (1, f"alpha {LA} one two three more.\n"
            f"beta {LB} four five six seven.\n"
            f"gamma {LC} eight nine ten done."),
        # C4-dropped (lorem ipsum page)
        (2, f"lorem ipsum dolor sit amet.\n{LA} fine line here.\n"
            f"{LB} another fine line."),
        # survives C4 but every paragraph duplicates doc 1's
        (3, f"alpha {LA} one two three more.\n"
            f"beta {LB} four five six seven.\n"
            f"gamma {LC} eight nine ten done."),
        # survives C4 + dedup but fails quality (too few tokens)
        (4, "tiny page one.\ntiny page two.\ntiny page three."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_corpus_matches_manual_stages(corpus):
    from spider_engine_spark.functions.text_analysis import (
        c4_clean,
        quality_filter,
    )
    from spider_engine_spark.operators.dedup import paragraph_dedup

    got = {
        r["doc_id"]: r for r in clean_corpus(corpus, "doc_id", "text").collect()
    }
    # manual chain
    c4 = c4_clean(corpus, "doc_id", "text")
    kept = c4.filter("page_kept").select("doc_id", "cleaned")
    pd = paragraph_dedup(kept, "doc_id", "cleaned")
    manual = {r["doc_id"]: r for r in pd.collect()}
    q = {
        r["doc_id"]: r["quality_keep"]
        for r in quality_filter(
            pd.select("doc_id", "text_deduped"), "text_deduped"
        ).collect()
    }
    for d, row in got.items():
        if row["c4_kept"]:
            assert row["n_paragraphs_final"] == manual[d]["n_kept"]
            expect_q = bool(q[d]) and manual[d]["n_kept"] > 0
            assert row["quality_kept"] == expect_q
            if row["final_kept"]:
                assert row["text_final"] == manual[d]["text_deduped"]
        else:
            assert d not in manual  # dropped pages never enter dedup
            assert row["text_final"] == ""


def test_clean_corpus_funnel_shape(corpus):
    rows = {
        r["doc_id"]: r for r in clean_corpus(corpus, "doc_id", "text").collect()
    }
    assert rows[1]["final_kept"] is True
    assert rows[2]["c4_kept"] is False and rows[2]["final_kept"] is False
    # doc 3's paragraphs all lost to doc 1 (first occurrence)
    assert rows[3]["c4_kept"] is True
    assert rows[3]["n_paragraphs_final"] == 0
    assert rows[3]["final_kept"] is False
    # doc 4 deduped fine but too short for the quality gate
    assert rows[4]["c4_kept"] is True
    assert rows[4]["n_paragraphs_final"] == 3
    assert rows[4]["quality_kept"] is False
    [s] = funnel_stats(clean_corpus(corpus, "doc_id", "text")).collect()
    assert s["n_docs"] == 4
    assert s["n_c4_kept"] == 3
    assert s["n_final_kept"] == 1
    assert s["paragraphs_out"] == 3  # doc 1's three lines


def test_clean_corpus_quality_off(corpus):
    rows = {
        r["doc_id"]: r
        for r in clean_corpus(
            corpus, "doc_id", "text", quality=False
        ).collect()
    }
    # doc 4 now survives (dedup left its 3 unique short lines)
    assert rows[4]["final_kept"] is True
    assert rows[1]["final_kept"] is True


def test_funnel_stats_plan_does_not_reexpand_tokenize(corpus):
    plan = (
        funnel_stats(clean_corpus(corpus, "doc_id", "text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the composed LAZY plan legitimately recomputes the map-only C4
    # stage once per join branch (occ/base/losers + the outer join:
    # ~4 copies x ~5 splits each); the tripwire is the PATHOLOGICAL
    # mode, where PushDownPredicates re-expands the quality ladder per
    # rule (~57x for ONE ladder -> hundreds of splits)
    n_split = plan.count("split(")
    assert n_split <= 30, (
        f"tokenize subtree appears {n_split}x in the funnel plan — "
        "a filter re-expanded the quality ladder"
    )


def test_clean_corpus_rejects_string_keys(spark):
    df = spark.createDataFrame([("u", "a line here now.")], "k string, text string")
    with pytest.raises(TypeError, match="clean_corpus needs a numeric key"):
        clean_corpus(df, "k", "text")


def test_funnel_stats_empty_corpus_reports_zeros(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    [s] = funnel_stats(clean_corpus(df, "doc_id", "text")).collect()
    assert tuple(s) == (0, 0, 0, 0, 0)
