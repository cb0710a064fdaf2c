"""Incremental (streaming) near-duplicate detection.

The batch near-dup operators (operators/dedup.py) see the whole corpus
at once; a crawl ingests documents continuously.  This module keeps a
persisted MinHash band-bucket table through TableIO and flags every
arriving document against EVERYTHING ingested before it plus its own
micro-batch — the streaming form of minhash_lsh_pairs, the same shape
the reference's mem-partition/flush tiering gives its inverted index
(core/table/table.go:503-508: new docs join an accumulating persisted
structure batch by batch).

Completeness invariant (pinned by tests): the union over micro-batches
of emitted candidate pairs equals the batch minhash_lsh_pairs output on
the full corpus, for ANY split of documents into batches and any
arrival order — a pair lands in a common (band, bucket) whether its
members arrive together (in-batch self-join) or apart (probe join
against the persisted buckets), and a cross-batch pair is emitted
exactly once: in the batch of its later-arriving member.

100 TB shape: per micro-batch work is one equi-join of (batch x bands)
rows against the bucket table on (band, bucket) — a single shuffle;
the bucket table grows as corpus x bands rows of ~24 bytes and never
holds text.  Skewed buckets (boilerplate) are the same AQE-handled
hazard as the batch path; a cap_bucket_size-style guard can be applied
to the persisted side by the same frequency-cap technique if needed.

Exactness note: this emits LSH CANDIDATE pairs (the same candidate law
as the batch path); callers wanting verified near-dups run the cheap
exact jaccard_verify on the tiny candidate set afterwards — see the
streaming_neardup_pairs driver query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_engine_spark.operators.dedup import (
    band_buckets,
    minhash_signatures,
)
from spider_engine_spark.sources.tableio import TableIO


def make_neardup_batch_handler(
    io: TableIO,
    key: str = "doc_id",
    content: str = "text",
    k: int = 16,
    bands: int = 8,
):
    """The foreachBatch body, exposed (like ingest.make_batch_handler)
    so crash-replay tests drive the REAL handler at commit boundaries.

    Tables: `pairs` (a, b) — candidate pairs, later-arrival orientation
    normalized to a < b; `buckets` (key, band, bucket) — the persisted
    LSH state each future batch probes.

    Idempotence / crash-safety: per-table batch_id guards (the
    ingest.py protocol).  `pairs` commits BEFORE `buckets`, and the
    probe side is read before either write, so a crash between the two
    appends replays into: pairs skipped (already committed), buckets
    recomputed deterministically from the same batch and appended —
    no duplicate pairs, no missed probes.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        def done(tbl: str) -> int:
            return (
                int(io.meta(tbl).get("batch_id", -1)) if io.exists(tbl) else -1
            )

        spark = batch_df.sparkSession
        sigs = minhash_signatures(batch_df, key, content, k=k)
        # reused by the in-batch self-join, the cross-batch probe and
        # the state append — persist (cache manager), not localCheckpoint
        bb = band_buckets(sigs, key, bands).persist()
        try:
            if batch_id > done("pairs"):
                x, y = bb.alias("x"), bb.alias("y")
                pairs = x.join(
                    y,
                    (F.col("x.band") == F.col("y.band"))
                    & (F.col("x.bucket") == F.col("y.bucket"))
                    & (F.col(f"x.{key}") < F.col(f"y.{key}")),
                ).select(
                    F.col(f"x.{key}").alias("a"), F.col(f"y.{key}").alias("b")
                )
                if io.exists("buckets"):
                    p = io.read(spark, "buckets").alias("p")
                    cross = x.join(
                        p,
                        (F.col("x.band") == F.col("p.band"))
                        & (F.col("x.bucket") == F.col("p.bucket"))
                        & (F.col(f"x.{key}") != F.col(f"p.{key}")),
                    ).select(
                        F.least(
                            F.col(f"x.{key}"), F.col(f"p.{key}")
                        ).alias("a"),
                        F.greatest(
                            F.col(f"x.{key}"), F.col(f"p.{key}")
                        ).alias("b"),
                    )
                    pairs = pairs.unionByName(cross)
                io.write(
                    "pairs",
                    pairs.distinct(),
                    mode="append",
                    meta={"batch_id": batch_id},
                )
            if batch_id > done("buckets"):
                io.write(
                    "buckets", bb, mode="append", meta={"batch_id": batch_id}
                )
        finally:
            bb.unpersist()

    return handle


def stream_neardup(
    spark: SparkSession,
    input_dir: str,
    state_root: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    key: str = "doc_id",
    content: str = "text",
    k: int = 16,
    bands: int = 8,
    max_files_per_trigger: int = 1,
):
    """Stream documents from parquet files into the incremental near-dup
    state; returns the StreamingQuery (availableNow — drain-and-stop).

    max_files_per_trigger=1 makes every input file its own micro-batch
    (availableNow honors admission control), so a multi-file input
    exercises real cross-batch probes."""
    io = TableIO(state_root)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(
            make_neardup_batch_handler(io, key, content, k=k, bands=bands)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
