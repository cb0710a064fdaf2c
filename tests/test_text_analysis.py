

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


def test_c4_clean_hand_computed(spark):
    """Every rule observable on a hand fixture: terminal punctuation,
    <3 words, javascript lines, lorem-ipsum / brace / min-kept pages,
    plus the quoted-line terminal and empty-page reassembly."""
    from spider_engine_spark.functions.text_analysis import c4_clean

    df = spark.createDataFrame(
        [
            # line-level rules: punct keeps, short drops, no-punct drops
            (1, "good line with words.\nshort.\nno terminal punct here"
                "\nanother fine long line!\nthird keeper is here?"),
            # javascript line dropped, page survives on the other 3
            (2, "uses javascript heavily today.\nok good line stays here."
                "\nsecond keeper line here.\nthird keeper line too."),
            # lorem ipsum kills the page even with keepable lines
            (3, "lorem ipsum dolor sit amet.\nthis page dies entirely "
                "now.\nmore lines do not matter!"),
            # brace kills the page
            (4, "brace { page\nkiller here line.\nx y z."),
            # quote is a terminal; exactly min_lines keepers
            (5, 'quoted line ends well "\ntwo more keepers needed now.'
                "\nhere is the third one."),
            # fewer than min_lines kept -> page dropped
            (6, "only one keeper line here.\nshort.\nnope"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in c4_clean(df, "doc_id", "text").collect()
    }
    assert (rows[1]["n_lines"], rows[1]["n_kept"], rows[1]["page_kept"]) == (5, 3, True)
    assert rows[1]["cleaned"] == (
        "good line with words.\nanother fine long line!\nthird keeper is here?"
    )
    assert (rows[2]["n_kept"], rows[2]["page_kept"]) == (3, True)
    assert "javascript" not in rows[2]["cleaned"]
    assert rows[3]["page_kept"] is False and rows[3]["cleaned"] == ""
    assert rows[4]["page_kept"] is False
    assert rows[5]["page_kept"] is True and rows[5]["cleaned"].startswith(
        'quoted line ends well "'
    )
    assert rows[6]["page_kept"] is False and rows[6]["n_kept"] == 1


def test_c4_clean_min_params(spark):
    from spider_engine_spark.functions.text_analysis import c4_clean

    df = spark.createDataFrame(
        [(1, "one keeper line stays.\ntiny pair.")],
        "doc_id long, text string",
    )
    # default min_words=3 drops the 2-word line; min_words=2 keeps it
    r3 = c4_clean(df, "doc_id", "text", min_lines=1).collect()[0]
    assert (r3["n_kept"], r3["page_kept"]) == (1, True)
    r2 = c4_clean(df, "doc_id", "text", min_words=2, min_lines=1).collect()[0]
    assert (r2["n_kept"], r2["page_kept"]) == (2, True)
    assert r2["cleaned"] == "one keeper line stays.\ntiny pair."


def test_c4_clean_null_content_is_dropped_page(spark):
    from spider_engine_spark.functions.text_analysis import c4_clean

    df = spark.createDataFrame(
        [(1, None), (2, "good line number one.\ntwo is here now.\nthree closes it out.")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in c4_clean(df, "doc_id", "text").collect()}
    assert (
        rows[1]["n_lines"],
        rows[1]["n_kept"],
        rows[1]["page_kept"],
        rows[1]["cleaned"],
    ) == (0, 0, False, "")
    # page_kept == False filters must SEE the null page (not 3VL-skip it)
    assert (
        c4_clean(df, "doc_id", "text").filter("page_kept = false").count()
        == 1
    )
    assert rows[2]["page_kept"] is True
