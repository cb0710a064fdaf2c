"""Streaming ingest of embeddings into a persisted IVF index.

Completes the index-maintenance story: build_ivf_index creates the
at-rest index (centroids in table meta, assignment hive-partitioned by
ivf_list), ivf_append adds vectors incrementally, and this module
drives ivf_append from Structured Streaming so a crawl's embedding
stream lands in the searchable index micro-batch by micro-batch.

Crash/replay safety comes from ivf_append's own guards: the batch_id
idempotence law (a replayed committed batch is a no-op), the empty-
batch no-op (a zero-row hive write would commit a parquet-less dir and
brick reads), and the dimension/NULL validation (a malformed vector
raises instead of vanishing into the unsearchable list -1).

The index must already exist (build_ivf_index) — the centroids ARE the
assignment law, so there is nothing to append into before a build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spider_engine_spark.operators.similarity import ivf_append
from spider_engine_spark.sources.tableio import TableIO


def make_ivf_batch_handler(io: TableIO, name: str):
    """The foreachBatch body (exposed for crash-replay tests, like the
    ingest/neardup handlers)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ivf_append(io, name, batch_df, batch_id=batch_id)

    return handle


def stream_ivf_ingest(
    spark: SparkSession,
    input_dir: str,
    state_root: str,
    name: str,
    checkpoint_dir: str,
    schema: str = "vec_id long, embedding array<float>",
    max_files_per_trigger: int = 1,
):
    """Stream embedding parquet files into the persisted IVF index
    `name` under `state_root`; returns the StreamingQuery (availableNow
    — drain-and-stop). Probes see each micro-batch as soon as its
    append commits, with partition pruning intact."""
    io = TableIO(state_root)
    if not io.exists(name):
        raise ValueError(
            f"IVF index {name!r} does not exist under {state_root!r} — "
            f"run build_ivf_index first (the stored centroids are the "
            f"assignment law)"
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(make_ivf_batch_handler(io, name))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
