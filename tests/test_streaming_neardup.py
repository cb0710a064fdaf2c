"""Incremental streaming near-dup detection (streaming/neardup.py).

Pins the module's completeness invariant: the union over micro-batches
of emitted candidate pairs equals batch minhash_lsh_pairs on the full
corpus, for any batch split — plus crash-replay idempotence through the
real per-table batch_id protocol and the true readStream integration.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_engine_spark.operators.dedup import (
    jaccard_verify,
    minhash_lsh_pairs,
    minhash_signatures,
)
from spider_engine_spark.sources.tableio import TableIO
from spider_engine_spark.streaming.neardup import (
    make_neardup_batch_handler,
    stream_neardup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm window sill in the afternoon sun with great interest"
)

ROWS = [
    (0, BASE),
    (1, BASE),  # exact dup of 0
    (2, BASE.replace("afternoon", "morning")),  # near dup of 0/1
    (3, "completely different text about spark shuffles and parquet "
        "files and columnar storage engines"),
    (4, "another unrelated document mentioning inverted indexes and "
        "tokenizers and posting lists"),
    (5, BASE.replace("quick", "slow").replace("lazy", "sleepy")),
    (6, BASE + " with one extra trailing clause appended"),  # near dup
]
SCHEMA = "doc_id long, text string"


def _batch_pairs(spark):
    docs = spark.createDataFrame(ROWS, SCHEMA)
    sigs = minhash_signatures(docs, "doc_id", "text", k=16, n=3)
    return {
        (r.a, r.b) for r in minhash_lsh_pairs(sigs, "doc_id", bands=8).collect()
    }


def _streamed_pairs(spark, io):
    return {(r.a, r.b) for r in io.read(spark, "pairs").collect()}


@pytest.mark.parametrize(
    "split",
    [
        [[0, 1, 2, 3, 4, 5, 6]],                    # one batch
        [[0, 1], [2, 3], [4, 5], [6]],              # dups together
        [[0], [3, 6], [1, 4], [2, 5]],              # dups split apart
        [[6], [5], [4], [3], [2], [1], [0]],        # reverse singletons
    ],
)
def test_streamed_candidates_equal_batch_for_any_split(
    spark, tmp_path, split
):
    io = TableIO(str(tmp_path / "state"))
    handler = make_neardup_batch_handler(io, "doc_id", "text", k=16, bands=8)
    docs = spark.createDataFrame(ROWS, SCHEMA)
    for bid, ids in enumerate(split):
        handler(docs.filter(F.col("doc_id").isin(ids)), bid)
    assert _streamed_pairs(spark, io) == _batch_pairs(spark)


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Re-delivering a committed batch (checkpoint recovery) must change
    nothing: no duplicate pair rows, no duplicate bucket state."""
    io = TableIO(str(tmp_path / "state"))
    handler = make_neardup_batch_handler(io, "doc_id", "text", k=16, bands=8)
    docs = spark.createDataFrame(ROWS, SCHEMA)
    b0 = docs.filter(F.col("doc_id") < 3)
    b1 = docs.filter(F.col("doc_id") >= 3)
    handler(b0, 0)
    handler(b1, 1)
    n_pairs = io.read(spark, "pairs").count()
    n_buckets = io.read(spark, "buckets").count()
    handler(b1, 1)  # replay after a simulated post-commit crash
    handler(b0, 0)  # stale replay must also be a no-op
    assert io.read(spark, "pairs").count() == n_pairs
    assert io.read(spark, "buckets").count() == n_buckets
    assert _streamed_pairs(spark, io) == _batch_pairs(spark)


def test_crash_between_pairs_and_buckets_replays_clean(spark, tmp_path):
    """Die after the pairs append but before the buckets append: the
    replay must finish the buckets write without duplicating pairs."""
    io = TableIO(str(tmp_path / "state"))
    handler = make_neardup_batch_handler(io, "doc_id", "text", k=16, bands=8)
    docs = spark.createDataFrame(ROWS, SCHEMA)
    handler(docs.filter(F.col("doc_id") < 3), 0)

    # crash injection: a TableIO whose buckets write raises AFTER pairs
    # committed (pairs is written first by design)
    class CrashIO(TableIO):
        def write(self, name, df, **kw):
            if name == "buckets":
                raise RuntimeError("injected crash")
            return super().write(name, df, **kw)

    crash_handler = make_neardup_batch_handler(
        CrashIO(str(tmp_path / "state")), "doc_id", "text", k=16, bands=8
    )
    b1 = docs.filter(F.col("doc_id") >= 3)
    with pytest.raises(RuntimeError, match="injected crash"):
        crash_handler(b1, 1)
    # pairs for batch 1 are committed; buckets still at batch 0
    assert int(io.meta("pairs")["batch_id"]) == 1
    assert int(io.meta("buckets")["batch_id"]) == 0
    handler(b1, 1)  # recovery replay
    assert int(io.meta("buckets")["batch_id"]) == 1
    assert _streamed_pairs(spark, io) == _batch_pairs(spark)
    # exactly one pairs row set — the replay did not re-append
    assert io.read(spark, "pairs").count() == len(_batch_pairs(spark))


def test_redelivered_key_is_ignored_first_arrival_wins(spark, tmp_path):
    """Re-crawl of a known doc_id (possibly with changed text) must not
    re-bucket the key or re-emit its pairs — the reference's
    duplicate-PK rejection law, streamed."""
    io = TableIO(str(tmp_path / "state"))
    handler = make_neardup_batch_handler(io, "doc_id", "text", k=16, bands=8)
    docs = spark.createDataFrame(ROWS, SCHEMA)
    handler(docs.filter(F.col("doc_id") < 4), 0)
    handler(docs.filter(F.col("doc_id") >= 4), 1)
    n_pairs = io.read(spark, "pairs").count()
    n_buckets = io.read(spark, "buckets").count()
    # batch 2 re-delivers doc 0 with CHANGED text plus a genuinely new doc
    redelivery = spark.createDataFrame(
        [(0, "totally rewritten text for a recrawled page"),
         (7, BASE.replace("dog", "wolf"))],
        SCHEMA,
    )
    handler(redelivery, 2)
    buckets = io.read(spark, "buckets")
    # doc 0 kept its ORIGINAL buckets (first arrival), doc 7 was added
    assert buckets.filter(F.col("doc_id") == 0).count() == 8
    assert buckets.count() == n_buckets + 8
    new_pairs = _streamed_pairs(spark, io)
    # doc 7 pairs with the BASE cluster; no (0, x) pair was re-emitted
    assert {p for p in new_pairs if 7 in p}
    assert io.read(spark, "pairs").count() == n_pairs + len(
        {p for p in new_pairs if 7 in p}
    )


def test_state_tables_are_compacted_incrementally(spark, tmp_path):
    """Every compact_every batches the undersized state dirs fold into
    one — a long stream's probe must not union one dir per batch."""
    io = TableIO(str(tmp_path / "state"))
    handler = make_neardup_batch_handler(
        io, "doc_id", "text", k=16, bands=8, compact_every=4
    )
    docs = spark.createDataFrame(ROWS, SCHEMA)
    for bid, ids in enumerate([[0, 1], [2], [3, 4], [5, 6]]):
        handler(docs.filter(F.col("doc_id").isin(ids)), bid)
    # batch 3 triggered compaction: dirs collapsed, content unchanged
    assert len(io._entry("buckets")["dirs"]) == 1
    assert len(io._entry("pairs")["dirs"]) == 1
    assert _streamed_pairs(spark, io) == _batch_pairs(spark)
    assert io.read(spark, "buckets").count() == len(ROWS) * 8
    # a replayed compaction boundary is a no-op (meta guard)
    handler(docs.filter(F.col("doc_id").isin([5, 6])), 3)
    assert len(io._entry("buckets")["dirs"]) == 1
    assert _streamed_pairs(spark, io) == _batch_pairs(spark)


def test_stream_neardup_real_readstream(spark, tmp_path):
    """True Structured Streaming integration: one parquet file per
    micro-batch (maxFilesPerTrigger=1, availableNow), resumed once to
    prove the checkpoint + state survive across queries."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame(ROWS, SCHEMA)
    # three input files -> three micro-batches
    for lo, hi in [(0, 2), (2, 5)]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
    q = stream_neardup(spark, src, state, ckpt, schema=SCHEMA)
    assert q.awaitTermination(120), "availableNow drain timed out"
    # late arrivals -> a later query resumes from the checkpoint
    docs.filter(F.col("doc_id") >= 5).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = stream_neardup(spark, src, state, ckpt, schema=SCHEMA)
    assert q2.awaitTermination(120), "availableNow drain timed out"
    io = TableIO(state)
    assert _streamed_pairs(spark, io) == _batch_pairs(spark)
    # verified pairs equal the batch operator's verified output
    verified = {
        (r.a, r.b)
        for r in jaccard_verify(
            io.read(spark, "pairs"), docs, "doc_id", "text", n=3
        ).filter(F.col("jaccard") >= 0.8).collect()
    }
    sigs = minhash_signatures(docs, "doc_id", "text", k=16, n=3)
    batch_verified = {
        (r.a, r.b)
        for r in jaccard_verify(
            minhash_lsh_pairs(sigs, "doc_id", bands=8),
            docs, "doc_id", "text", n=3,
        ).filter(F.col("jaccard") >= 0.8).collect()
    }
    # candidate set is rich (near-dups 2/5/6 share buckets with 0/1) but
    # only the exact dup survives 0.8: one-word edits in a ~24-token doc
    # give jaccard 19/25 = 0.76 — the verify stage is doing real work
    assert len(_streamed_pairs(spark, io)) >= 3
    assert verified == batch_verified == {(0, 1)}


def test_stale_replay_at_compaction_boundary_cannot_regress_meta(
    spark, tmp_path
):
    """A stale replayed batch id landing on a compaction boundary must
    not regress the table meta's batch_id — that would re-open the
    append guards and duplicate every later batch on replay."""
    io = TableIO(str(tmp_path / "state"))
    handler = make_neardup_batch_handler(
        io, "doc_id", "text", k=16, bands=8, compact_every=4
    )
    docs = spark.createDataFrame(ROWS, SCHEMA)
    # batches 0..4: boundary at 3 compacts; batch 4 append clears the
    # 'compacted' flag (write meta replaces), the regression window
    splits = [[0, 1], [2], [3], [4, 5], [6]]
    for bid, ids in enumerate(splits):
        handler(docs.filter(F.col("doc_id").isin(ids)), bid)
    n_pairs = io.read(spark, "pairs").count()
    n_buckets = io.read(spark, "buckets").count()
    assert int(io.meta("buckets")["batch_id"]) == 4
    # stale replay of committed batch 3 — a compaction boundary
    handler(docs.filter(F.col("doc_id").isin([3])), 3)
    assert int(io.meta("buckets")["batch_id"]) == 4, (
        "boundary compaction regressed the meta batch_id"
    )
    assert int(io.meta("pairs")["batch_id"]) == 4
    # replays of later batches stay no-ops
    handler(docs.filter(F.col("doc_id").isin([4, 5])), 4)
    assert io.read(spark, "pairs").count() == n_pairs
    assert io.read(spark, "buckets").count() == n_buckets
    assert _streamed_pairs(spark, io) == _batch_pairs(spark)


def test_inbatch_duplicate_key_keeps_one_deterministically(spark, tmp_path):
    """Two versions of one doc_id in a SINGLE micro-batch must not
    min-merge into a hybrid signature: exactly one version survives,
    chosen by min content hash (the catalog dup-PK tiebreak), so two
    runs agree."""
    import hashlib

    texts = ["first version of the page text", "second rewritten text"]
    winner = min(texts, key=lambda t: hashlib.md5(t.encode()).hexdigest())
    states = []
    for run in range(2):
        io = TableIO(str(tmp_path / f"state{run}"))
        handler = make_neardup_batch_handler(
            io, "doc_id", "text", k=16, bands=8
        )
        handler(
            spark.createDataFrame(
                [(0, texts[0]), (0, texts[1]), (1, winner)], SCHEMA
            ),
            0,
        )
        buckets = io.read(spark, "buckets")
        assert buckets.filter(F.col("doc_id") == 0).count() == 8
        states.append(
            {(r.doc_id, r.band, r.bucket) for r in buckets.collect()}
        )
        # doc 1 carries the winner text: if doc 0 kept the same version
        # they are exact dups and MUST pair in every band's bucket
        assert {(0, 1)} == _streamed_pairs(spark, io)
    assert states[0] == states[1]
