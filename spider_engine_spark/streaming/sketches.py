"""Streaming sketch maintenance — CMS counters and HLL registers
folded micro-batch by micro-batch into persisted TableIO tables.

The merge laws make the persisted sketch split-invariant: CMS cells
SUM, HLL registers MAX, so after any prefix of the stream the table
equals the batch-built sketch of everything ingested so far — for ANY
micro-batch split (the equality the driver query's oracle pins).
Unlike the append-family handlers (postings/base, neardup buckets,
IVF) the sketch table is OVERWRITTEN each batch: it is bounded at
depth*width / 2^bucket_bits rows BY CONSTRUCTION, so there is no dir
growth and no compaction law to join.

The batch_id idempotence guard is load-bearing for CMS specifically: a
replayed committed batch re-SUMMED into the counters double-counts
(HLL's max would forgive the replay; CMS's sum does not), so the meta
batch_id check must come before any merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_engine_spark.operators.sketches import (
    _check_dims,
    cms_counters,
    hll_registers,
)
from spider_engine_spark.sources.tableio import TableIO

_CMS_SCHEMA = "seed int, bucket bigint, cnt bigint"
_HLL_SCHEMA = "bucket bigint, max_rho int"


def cms_sketch_init(
    spark: SparkSession,
    io: TableIO,
    name: str,
    term: str = "term",
    width: int = 256,
    depth: int = 4,
) -> None:
    """Create an empty persisted CMS table. width/depth/term are
    committed to the meta — they ARE the sketch identity (probing or
    merging with different ones silently underestimates), so appends
    read them from the table, never from call sites."""
    _check_dims(width, depth)
    io.write(
        name,
        spark.createDataFrame([], _CMS_SCHEMA),
        meta={
            "kind": "cms",
            "term": term,
            "width": int(width),
            "depth": int(depth),
            "batch_id": -1,
        },
    )


def cms_sketch_append(
    io: TableIO, name: str, df: DataFrame, batch_id: int | None = None
) -> int | None:
    """Fold one micro-batch of term-occurrence rows into the persisted
    counters (cell-wise sum).  Empty batches are no-ops; a replayed
    committed batch_id is a no-op (the sum law double-counts
    otherwise).  Returns the new snapshot version, or None."""
    meta = io.meta(name)
    if batch_id is not None and int(meta.get("batch_id", -1)) >= batch_id:
        return None
    term = meta["term"]
    if term not in df.columns:
        raise ValueError(
            f"batch lacks the sketch's term column {term!r} "
            f"(columns: {df.columns})"
        )
    if df.limit(1).count() == 0:
        return None
    spark = df.sparkSession
    batch = cms_counters(
        df, term, width=int(meta["width"]), depth=int(meta["depth"])
    ).select("seed", "bucket", "cnt")
    merged = (
        io.read(spark, name)
        .unionByName(batch)
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .select("seed", "bucket", "cnt")
    )
    new_meta = dict(meta)
    if batch_id is not None:
        new_meta["batch_id"] = max(batch_id, int(meta.get("batch_id", -1)))
    return io.write(name, merged, meta=new_meta)


def hll_sketch_init(
    spark: SparkSession,
    io: TableIO,
    name: str,
    key: str = "k",
    bucket_bits: int = 8,
) -> None:
    """Create the persisted HLL table with ALL 2^bucket_bits registers
    at 0 (empty registers carry estimate weight and keep the merge a
    fixed-shape cell-wise max)."""
    m = 1 << bucket_bits
    regs = spark.range(m).select(
        F.col("id").cast("long").alias("bucket"),
        F.lit(0).cast("int").alias("max_rho"),
    )
    io.write(
        name,
        regs,
        meta={
            "kind": "hll",
            "key": key,
            "bucket_bits": int(bucket_bits),
            "batch_id": -1,
        },
    )


def hll_sketch_append(
    io: TableIO, name: str, df: DataFrame, batch_id: int | None = None
) -> int | None:
    """Fold one micro-batch of key rows into the persisted registers
    (cell-wise max). Same guards as cms_sketch_append (max WOULD
    forgive a replay, but the skip keeps snapshot churn and version
    history honest)."""
    meta = io.meta(name)
    if batch_id is not None and int(meta.get("batch_id", -1)) >= batch_id:
        return None
    key = meta["key"]
    if key not in df.columns:
        raise ValueError(
            f"batch lacks the sketch's key column {key!r} "
            f"(columns: {df.columns})"
        )
    if df.limit(1).count() == 0:
        return None
    spark = df.sparkSession
    batch = hll_registers(df, key, bucket_bits=int(meta["bucket_bits"]))
    merged = (
        io.read(spark, name)
        .unionByName(batch)
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
        .select("bucket", "max_rho")
    )
    new_meta = dict(meta)
    if batch_id is not None:
        new_meta["batch_id"] = max(batch_id, int(meta.get("batch_id", -1)))
    return io.write(name, merged, meta=new_meta)


def make_cms_batch_handler(io: TableIO, name: str):
    """The foreachBatch body (exposed for crash-replay tests, like the
    ingest/neardup/ivf handlers)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        cms_sketch_append(io, name, batch_df, batch_id=batch_id)

    return handle


def make_hll_batch_handler(io: TableIO, name: str):
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        hll_sketch_append(io, name, batch_df, batch_id=batch_id)

    return handle


def _stream(
    spark: SparkSession,
    input_dir: str,
    schema: str,
    max_files_per_trigger: int,
):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def stream_cms_ingest(
    spark: SparkSession,
    input_dir: str,
    state_root: str,
    name: str,
    checkpoint_dir: str,
    schema: str,
    max_files_per_trigger: int = 1,
):
    """Stream parquet term-occurrence files into the persisted CMS
    `name` under `state_root`; returns the StreamingQuery (availableNow
    — drain-and-stop). Fails fast if the sketch does not exist or the
    schema lacks its term column (otherwise the mismatch surfaces only
    inside batch 0's foreachBatch)."""
    io = TableIO(state_root)
    if not io.exists(name):
        raise ValueError(
            f"CMS sketch {name!r} does not exist under {state_root!r} — "
            f"run cms_sketch_init first (width/depth are the sketch "
            f"identity and live in its meta)"
        )
    term = io.meta(name)["term"]
    if term not in spark.createDataFrame([], schema).columns:
        raise ValueError(
            f"schema {schema!r} lacks the sketch's term column {term!r}"
        )
    return (
        _stream(spark, input_dir, schema, max_files_per_trigger)
        .writeStream.foreachBatch(make_cms_batch_handler(io, name))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_hll_ingest(
    spark: SparkSession,
    input_dir: str,
    state_root: str,
    name: str,
    checkpoint_dir: str,
    schema: str,
    max_files_per_trigger: int = 1,
):
    """Streaming counterpart of hll_sketch_append — see
    stream_cms_ingest."""
    io = TableIO(state_root)
    if not io.exists(name):
        raise ValueError(
            f"HLL sketch {name!r} does not exist under {state_root!r} — "
            f"run hll_sketch_init first (bucket_bits is the sketch "
            f"identity and lives in its meta)"
        )
    key = io.meta(name)["key"]
    if key not in spark.createDataFrame([], schema).columns:
        raise ValueError(
            f"schema {schema!r} lacks the sketch's key column {key!r}"
        )
    return (
        _stream(spark, input_dir, schema, max_files_per_trigger)
        .writeStream.foreachBatch(make_hll_batch_handler(io, name))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
