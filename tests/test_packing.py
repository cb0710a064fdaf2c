"""Sequence packing laws: contiguous per-bucket streams, chunk spans,
partitioning-independence, degenerate docs, and the summary report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_engine_spark.operators.packing import (
    pack_sequences,
    packing_summary,
)


@pytest.fixture(scope="module")
def packed(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    return pack_sequences(
        docs, key="doc_id", content="text", block=512, buckets=8
    ).cache()


def test_streams_are_contiguous_per_bucket(packed):
    rows = packed.orderBy("bucket", "doc_id").collect()
    pos = {}
    for r in rows:
        assert r["stream_start"] == pos.get(r["bucket"], 0), (
            f"gap/overlap at doc {r['doc_id']} in bucket {r['bucket']}"
        )
        assert r["stream_end"] == r["stream_start"] + r["n_tok"]
        assert r["n_tok"] >= 1  # separator: even empty docs take a slot
        pos[r["bucket"]] = r["stream_end"]


def test_chunk_spans_follow_from_positions(packed):
    bad = packed.filter(
        (F.col("chunk_first") != F.floor(F.col("stream_start") / 512))
        | (F.col("chunk_last") != F.floor((F.col("stream_end") - 1) / 512))
        | (F.col("chunk_last") < F.col("chunk_first"))
    ).count()
    assert bad == 0


def test_layout_is_partitioning_independent(spark, packed):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    again = pack_sequences(
        docs.repartition(7, "source").sortWithinPartitions("n_chars"),
        key="doc_id",
        content="text",
        block=512,
        buckets=8,
    )
    # multiset, not set: set equality would mask a bug that duplicates
    # or drops byte-identical rows under one partitioning
    from collections import Counter

    assert Counter(map(tuple, packed.collect())) == Counter(
        map(tuple, again.collect())
    )


def test_degenerate_docs_take_one_separator_token(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "one two three")], "doc_id long, t string"
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(
            df, key="doc_id", content="t", block=4, buckets=1
        ).collect()
    }
    assert rows[1]["n_tok"] == 1 and rows[2]["n_tok"] == 1
    assert rows[3]["n_tok"] == 4  # 3 tokens + separator
    # single bucket: total stream length is the sum and every position
    # is defined (no NULL poisoning from the NULL doc)
    assert sorted(r["stream_start"] for r in rows.values()) == [0, 1, 2]


def test_doc_spans_block_boundary(spark):
    # two 4-token (3 + separator) docs in one bucket with block=5: the
    # second doc occupies stream [4, 8) and spans chunks 0 and 1
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id long, t string"
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(
            df, key="doc_id", content="t", block=5, buckets=1
        ).collect()
    }
    first, second = rows[min(rows)], rows[max(rows)]
    assert (first["chunk_first"], first["chunk_last"]) == (0, 0)
    assert second["chunk_first"] == 0 and second["chunk_last"] == 1


def test_summary_report(packed):
    s = {r["bucket"]: r for r in packing_summary(packed).collect()}
    agg = {
        r["bucket"]: r
        for r in packed.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_tok").alias("tok"),
            F.max("chunk_last").alias("mx"),
        )
        .collect()
    }
    for b, r in s.items():
        assert r["n_docs"] == agg[b]["n"]
        assert r["n_tokens"] == agg[b]["tok"]
        # contiguous-from-zero stream: n_chunks is max(chunk_last)+1,
        # which equals ceil(n_tokens / block) under the pack-time block
        assert r["n_chunks"] == agg[b]["mx"] + 1 == -(-agg[b]["tok"] // 512)


def test_block_must_be_positive(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, t string")
    with pytest.raises(ValueError):
        pack_sequences(df, key="doc_id", content="t", block=0)


def test_duplicate_keys_get_disjoint_spans(spark):
    """Tied keys must never share a stream_end: a RANGE-framed cumsum
    would assign overlapping token positions to both rows (silent pack
    corruption); the ROWS frame + (key, n_tok) order gives each its own
    span and keeps the per-bucket stream contiguous."""
    df = spark.createDataFrame(
        [(1, "a b c"), (1, "d e"), (2, "f")], "doc_id long, t string"
    )
    rows = pack_sequences(
        df, key="doc_id", content="t", block=512, buckets=1
    ).collect()
    spans = sorted((r.stream_start, r.stream_end) for r in rows)
    total = sum(r.n_tok for r in rows)
    # disjoint, contiguous, covering [0, total)
    assert spans[0][0] == 0 and spans[-1][1] == total
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2, spans


def test_parameter_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, t string")
    with pytest.raises(ValueError, match="buckets"):
        pack_sequences(df, key="doc_id", content="t", buckets=0)
    with pytest.raises(ValueError, match="sep_tokens"):
        pack_sequences(df, key="doc_id", content="t", sep_tokens=0)
    with pytest.raises(ValueError, match="block"):
        pack_sequences(df, key="doc_id", content="t", block=0)


# ---------------------------------------------------------------------------
# materialize_blocks: the packed-chunk artifact
# ---------------------------------------------------------------------------


def _docs(spark):
    rows = [
        ("d00", "alpha beta, gamma 42 delta!"),
        ("d01", "one-two three"),
        ("d02", ""),           # zero tokens: separator only
        ("d03", None),         # null text: separator only
        ("d04", "a b c d e f g h i j k l m n o p q r s t"),
        ("d05", "x" * 5 + " 123 " + "y.z " * 7),
        ("d06", "short"),
        ("d07", "the quick brown fox jumps over 13 lazy dogs..."),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _py_tokens(text):
    import re

    if text is None:
        return []
    return re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+", text)


def test_materialize_blocks_sizes_and_content(spark):
    from spider_engine_spark.operators.packing import materialize_blocks

    docs = _docs(spark)
    block, buckets, sep = 7, 3, 1
    packed = pack_sequences(
        docs, key="doc_id", content="text", block=block, buckets=buckets
    )
    out = materialize_blocks(
        docs, packed, key="doc_id", content="text", block=block
    ).collect()
    layout = {r["doc_id"]: r.asDict() for r in packed.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    # expected per-bucket stream: docs in (key, n_tok) order, tokens + sep
    streams = {}
    for did in sorted(layout, key=lambda k: (k, layout[k]["n_tok"])):
        b = layout[did]["bucket"]
        streams.setdefault(b, []).extend(_py_tokens(texts[did]) + ["<|sep|>"])
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], {})[r["chunk_id"]] = list(r["tokens"])
        assert r["n_tokens"] == len(r["tokens"])
    for b, stream in streams.items():
        chunks = by_bucket.pop(b)
        ids = sorted(chunks)
        assert ids == list(range(len(ids))), ids  # contiguous from 0
        for cid in ids[:-1]:
            assert len(chunks[cid]) == block, (b, cid)
        assert 1 <= len(chunks[ids[-1]]) <= block
        flat = [t for cid in ids for t in chunks[cid]]
        assert flat == stream, (b, flat, stream)
    assert not by_bucket  # no chunks for absent buckets


def test_materialize_blocks_reproducible_and_multisep(spark):
    from spider_engine_spark.operators.packing import materialize_blocks

    docs = _docs(spark)
    packed = pack_sequences(
        docs, key="doc_id", content="text", block=5, buckets=2,
        sep_tokens=2,
    )
    a = materialize_blocks(
        docs, packed, key="doc_id", content="text", block=5, sep_tokens=2
    )
    b = materialize_blocks(
        docs.repartition(7), packed, key="doc_id", content="text",
        block=5, sep_tokens=2,
    )
    ka = {(r["bucket"], r["chunk_id"]): list(r["tokens"]) for r in a.collect()}
    kb = {(r["bucket"], r["chunk_id"]): list(r["tokens"]) for r in b.collect()}
    assert ka == kb
    n_sep = sum(t == "<|sep|>" for toks in ka.values() for t in toks)
    assert n_sep == 2 * docs.count()


def test_materialize_blocks_validates_sep(spark):
    from spider_engine_spark.operators.packing import materialize_blocks

    docs = _docs(spark)
    packed = pack_sequences(docs, key="doc_id", content="text", block=5)
    with pytest.raises(ValueError, match="sep_tokens"):
        materialize_blocks(
            docs, packed, key="doc_id", content="text", block=5,
            sep_tokens=0,
        )


_SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _span(kind, text="", ref="", off=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


def test_interleaved_cost_law_hand_computed(spark):
    """text spans cost their BPE-ish count ('w12' = 2 tokens: letters +
    digits), media spans their fixed budget; +1 separator."""
    from spider_engine_spark.operators.packing import pack_interleaved

    docs = spark.createDataFrame(
        [
            (
                "d1",
                [
                    _span("text", "hello w12 x", off=0),  # 1+2+1 = 4
                    _span("image", ref="m1", off=1),  # 64
                    _span("text", "a b", off=2),  # 2
                    _span("link", ref="u1", off=3),  # 1
                ],
            ),
            ("d2", [_span("image", ref="m2", off=0)]),  # 64
            ("d3", []),  # 0 tokens, separator only
            ("d4", None),  # NULL spans == 0 tokens (same as NULL text)
        ],
        _SPAN_SCHEMA,
    )
    got = {
        r["doc_id"]: r["n_tok"]
        for r in pack_interleaved(
            docs, key="doc_id", spans="spans", block=16, buckets=2
        ).collect()
    }
    assert got == {"d1": 4 + 64 + 2 + 1 + 1, "d2": 65, "d3": 1, "d4": 1}


def test_interleaved_unknown_kind_raises(spark):
    from spider_engine_spark.operators.packing import pack_interleaved

    docs = spark.createDataFrame(
        [("d1", [_span("video", ref="v1")])], _SPAN_SCHEMA
    )
    with pytest.raises(Exception, match="unknown span kind"):
        pack_interleaved(docs, key="doc_id", spans="spans").collect()
    # ...and a custom budget admits it
    from spider_engine_spark.operators.packing import interleaved_token_cost

    got = docs.select(
        interleaved_token_cost(
            F.col("spans"), {"image": 64, "link": 1, "video": 256}
        ).alias("c")
    ).collect()
    assert got[0]["c"] == 256


def test_interleaved_layout_matches_pack_sequences_law(spark):
    """Interleaved packing is the SAME layout law as pack_sequences —
    only the counter differs. Feeding pack_sequences a synthetic text
    whose BPE count equals each doc's interleaved cost must reproduce
    the identical layout."""
    from spider_engine_spark.operators.packing import (
        interleaved_token_cost,
        pack_interleaved,
    )

    docs = spark.createDataFrame(
        [
            ("a", [_span("text", "x y z"), _span("image")]),
            ("b", [_span("link"), _span("link")]),
            ("c", [_span("text", "one two")]),
        ],
        _SPAN_SCHEMA,
    )
    costs = {
        r["doc_id"]: r["c"]
        for r in docs.select(
            "doc_id",
            interleaved_token_cost(
                F.col("spans"), {"image": 64, "link": 1}
            ).alias("c"),
        ).collect()
    }
    assert costs == {"a": 3 + 64, "b": 2, "c": 2}
    synth = spark.createDataFrame(
        [(k, " ".join(["t"] * v)) for k, v in costs.items()],
        "doc_id string, text string",
    )
    expect = {
        tuple(r)
        for r in pack_sequences(
            synth, key="doc_id", content="text", block=32, buckets=2
        ).collect()
    }
    got = {
        tuple(r)
        for r in pack_interleaved(
            docs, key="doc_id", spans="spans", block=32, buckets=2
        ).collect()
    }
    assert got == expect


def test_interleaved_pack_plan_has_no_explode(spark):
    """The cost law is ONE aggregate over the span array — a Generate
    (explode) in the plan would mean per-span row blowup crept in."""
    from spider_engine_spark.operators.packing import pack_interleaved

    docs = spark.createDataFrame(
        [("d", [_span("text", "a b"), _span("image")])], _SPAN_SCHEMA
    )
    plan = (
        pack_interleaved(docs, key="doc_id", spans="spans")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" not in plan
