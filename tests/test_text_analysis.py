

def test_exploded_bigrams_edges(spark):
    from spider_engine_spark.functions.text_analysis import exploded_bigrams

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "x"), (3, ""), (4, None), (5, "  p   q ")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["w1"], r["w2"])
        for r in exploded_bigrams(docs, "doc_id", "text").collect()
    }
    assert got == {(1, "a", "b"), (1, "b", "c"), (5, "p", "q")}


def test_collocations_pmi_hand_computed(spark):
    """corpus: 'a b' x3 + 'a c'. n_uni=8, n_bi=4; c_ab=3, c_a=4, c_b=3.
    score(a,b) = 3*64/(4*3*4) = 4.0 exactly."""
    from spider_engine_spark.functions.text_analysis import collocations_pmi

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")],
        "doc_id long, text string",
    )
    rows = collocations_pmi(docs, "doc_id", "text", min_count=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["c_xy"], r["c_x"], r["c_y"]) == (
        "a", "b", 3, 4, 3,
    )
    assert r["pmi_score"] == 4.0
    # min_count prunes the hapax (a, c) pair before any join
    both = collocations_pmi(docs, "doc_id", "text", min_count=1)
    assert both.count() == 2
    import pytest as _pt

    with _pt.raises(ValueError, match="min_count"):
        collocations_pmi(docs, "doc_id", "text", min_count=0)
