"""Structured-Streaming ingest: the reference's write path, Spark-first.

The reference serializes writes per table through a (mover, worker)
goroutine pair with a 10 ms poll (C1, engine/spider.go:196-261) and
flushes its mem partition every 10k docs (table.go:503-508). The Spark
equivalent is a file-source readStream with foreachBatch: micro-batches
arrive serialized per query, each batch appends a base + postings
snapshot atomically (TableIO), and compaction is periodic — the same
LSM tiering with Structured Streaming doing the scheduling.

Also provided: watermarked tumbling-window aggregation and streaming
dedup (dropDuplicates + watermark) — the event-time operators the
reference lacks entirely (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_engine_spark.operators.postings import (
    build_postings_native,
    merge_postings,
)
from spider_engine_spark.sources.tableio import TableIO


def stream_index_docs(
    spark: SparkSession,
    input_dir: str,
    state_root: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    compact_every: int = 4,
    compact_max_bytes: int = 64 << 20,
):
    """Stream documents from parquet files into base + postings tables.

    Returns the StreamingQuery; callers use trigger(availableNow) via
    .awaitTermination() or processAllAvailable() in tests.
    """
    io = TableIO(state_root)
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(
            make_batch_handler(io, compact_every, compact_max_bytes)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def make_batch_handler(
    io: TableIO, compact_every: int = 4, compact_max_bytes: int = 64 << 20
):
    """The foreachBatch body, exposed so crash-replay tests drive the
    REAL handler at every commit boundary.

    Idempotence: skip replayed batch ids after checkpoint recovery.
    Completion is tracked PER TABLE — if the process died after the base
    append but before the postings append (or before the periodic
    compaction commit), the replayed batch must still finish the
    remaining writes or base and index silently diverge. Compaction is
    incremental (TableIO.compact_small, like the crawl path) and replay
    is convergent: merge_postings of already-merged dirs is a fixpoint
    and an up-to-date 'compacted' meta (or a single remaining undersized
    dir) makes the replayed compaction a no-op."""

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        def done(tbl: str) -> int:
            return (
                int(io.meta(tbl).get("batch_id", -1)) if io.exists(tbl) else -1
            )

        if batch_id > done("base"):
            io.write(
                "base", batch_df, mode="append", meta={"batch_id": batch_id}
            )
        if batch_id > done("postings"):
            postings = build_postings_native(batch_df, "doc_id", "text")
            io.write(
                "postings", postings, mode="append",
                meta={"batch_id": batch_id},
            )
        # Incremental, like the crawl path (frontier.py): fold only
        # undersized postings dirs; dirs >= max_bytes are referenced
        # untouched by the new manifest. The former whole-table
        # merge_postings(read(...)) overwrite was O(table) every
        # compact_every batches — cumulative O(n^2) write amplification
        # on a long-running stream. Reads re-merge a term's rows across
        # dirs lazily (probes sum df / union postings), so partial
        # compaction preserves results. Never-written/already-compacted
        # /stale-replay boundaries are all no-ops inside compact_if_due
        # (the shared boundary law — a stale batch id must never
        # regress the meta the append guards compare against).
        io.compact_if_due(
            batch_df.sparkSession,
            "postings",
            batch_id,
            compact_every,
            max_bytes=compact_max_bytes,
            transform=merge_postings,
        )
        # base grows one dir per micro-batch too — same boundary law,
        # plain concat (disjoint rows, no transform needed)
        io.compact_if_due(
            batch_df.sparkSession,
            "base",
            batch_id,
            compact_every,
            max_bytes=compact_max_bytes,
        )

    return handle_batch


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (late rows beyond
    the watermark are dropped — the streaming rollup for the events table)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame, key: str = "event_id", watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon: the streaming
    form of the URL-seen set (state-store backed)."""
    return events.withWatermark("ts", watermark).dropDuplicates([key, "ts"])
