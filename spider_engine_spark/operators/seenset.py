"""Distributed seen-set: sharded cuckoo filters + exact fallback table.

Dataflow per superstep (all Arrow-vectorized, no per-row Python at the
API surface):

  candidates --xxhash64--> shard = pmod(hash, P)
      cogroup(shard) with filter-state table
      -> maybe_seen flag per candidate            (probe_udf)
  definitely-new  = maybe_seen == false           (no exact check needed —
                                                   cuckoo has no false
                                                   negatives)
  maybe-seen      = exact LEFT SEMI join vs seen table (small fraction =
                    FP rate + true dups)
  admitted        = definitely-new UNION (maybe-seen MINUS exact-seen)
      cogroup(shard) with filter-state table
      -> new filter-state rows                    (insert_udf)

The exact seen table is itself hash-partitioned parquet via TableIO; at
10^10 URLs only the (tiny) maybe-seen fraction ever joins against it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spider_engine_spark.operators.cuckoo import CuckooFilter

STATE_SCHEMA = StructType(
    [
        StructField("shard", IntegerType(), False),
        StructField("nbuckets", IntegerType(), False),
        StructField("count", LongType(), False),
        StructField("data", BinaryType(), False),
    ]
)


def empty_state(spark) -> DataFrame:
    return spark.createDataFrame([], STATE_SCHEMA)


def shard_expr(hash_col, num_shards: int):
    """THE shard law: pmod(hash, P) as int. Single definition — the
    persisted seen/filter layout and every probe path (batch, streaming,
    migration) must agree bit-for-bit, or a drifted copy probes the
    wrong filter shard and produces cuckoo false negatives (the same
    single-source rule as postings.term_bucket_expr)."""
    return F.pmod(hash_col, F.lit(num_shards)).cast("int")


def with_shard(df: DataFrame, url_col: str, num_shards: int) -> DataFrame:
    """Native hash+shard: xxhash64 on the canonical URL (JVM-side)."""
    return df.withColumn("hash", F.xxhash64(F.col(url_col))).withColumn(
        "shard", shard_expr(F.col("hash"), num_shards)
    )


def probe(candidates: DataFrame, state: DataFrame) -> DataFrame:
    """candidates(url, hash, shard, ...) -> + maybe_seen boolean."""
    out_schema = StructType(
        list(candidates.schema.fields)
        + [StructField("maybe_seen", BooleanType(), False)]
    )
    cols = candidates.columns

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=cols + ["maybe_seen"])
        if right.empty:
            left = left.copy()
            left["maybe_seen"] = False
            return left
        if len(right) > 1:
            raise ValueError(
                "unresolved filter state: expected one row per shard — "
                "resolve append-only state with latest_state() first"
            )
        filt = CuckooFilter.from_bytes(bytes(right["data"].iloc[0]))
        left = left.copy()
        left["maybe_seen"] = filt.contains(
            left["hash"].to_numpy().astype("uint64")
        )
        return left

    return candidates.groupBy("shard").cogroup(state.groupBy("shard")).applyInPandas(
        fn, out_schema
    )


def insert(
    admitted: DataFrame,
    state: DataFrame,
    capacity_per_shard: int,
    dirty_only: bool = False,
    sort_within_shard: bool = False,
) -> DataFrame:
    """Return the filter-state table with admitted hashes added.

    dirty_only=False: the full state — shards with no admitted rows pass
    through unchanged (cogroup emits them with an empty left side). Used
    by the in-memory path, where "write" is free.

    dirty_only=True: ONLY shards that received admitted rows. The durable
    path appends these (with a step column) instead of rewriting the full
    state table — at the documented 10^10-URL sizing a full rewrite
    round-trips ~32 GiB of filter bytes through Arrow and onto disk per
    superstep even when one shard changed. The state side is additionally
    pre-pruned to the dirty shards with a broadcast semi-join, so
    untouched shards' table bytes never enter the cogroup shuffle at all
    (without it they would round-trip through Arrow just to emit
    nothing). Readers resolve latest-row-per-shard via latest_state().

    sort_within_shard=True sorts each shard's hashes before insertion so
    the filter BYTES are a deterministic function of the hash SET (the
    superstep path leaves it off: there the insertion order is the
    admitted DataFrame's order and correctness only needs membership;
    the re-shard migration turns it on so a rebuilt layout is
    byte-reproducible)."""

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if sort_within_shard and not left.empty:
            left = left.sort_values("hash", kind="stable")
        if dirty_only and left.empty:
            return pd.DataFrame(columns=["shard", "nbuckets", "count", "data"])
        if right.empty:
            if left.empty:
                return pd.DataFrame(
                    columns=["shard", "nbuckets", "count", "data"]
                )
            filt = CuckooFilter(capacity_per_shard)
            shard = int(left["shard"].iloc[0])
            count = 0
        else:
            if len(right) > 1:
                raise ValueError(
                    "unresolved filter state: expected one row per shard "
                    "— resolve append-only state with latest_state() first"
                )
            filt = CuckooFilter.from_bytes(bytes(right["data"].iloc[0]))
            shard = int(right["shard"].iloc[0])
            count = int(right["count"].iloc[0])
        n = 0
        if not left.empty:
            n = filt.insert(left["hash"].to_numpy().astype("uint64"))
        return pd.DataFrame(
            {
                "shard": [shard],
                "nbuckets": [filt.nbuckets],
                "count": [count + n],
                "data": [filt.to_bytes()],
            }
        )

    if dirty_only:
        state = state.join(
            F.broadcast(admitted.select("shard").distinct()),
            "shard",
            "leftsemi",
        )
    return (
        admitted.select("shard", "hash")
        .groupBy("shard")
        .cogroup(state.groupBy("shard"))
        .applyInPandas(fn, STATE_SCHEMA)
    )


def latest_state(df: DataFrame) -> DataFrame:
    """Resolve a multi-version filter table (append-only rows tagged with
    a `step` column) to the latest row per shard.

    Safe on any SUBSET of snapshot dirs: the reduction only drops rows
    superseded *within* the subset, so compaction can fold filter dirs
    with this as the transform and the global latest-per-shard over
    (compacted + newer dirs) is unchanged.

    Legacy rows from pre-step-column snapshots surface as step=null after
    a union with allowMissingColumns; max_by IGNORES null order keys, so
    the key is coalesced to -1 — a legacy row loses to any tagged row but
    never resolves to an all-null state."""
    picked = (
        df.groupBy("shard")
        .agg(
            F.max_by(
                F.struct("nbuckets", "count", "data", "step"),
                F.coalesce(F.col("step"), F.lit(-1)),
            ).alias("s")
        )
        .select(
            "shard",
            F.col("s.nbuckets").alias("nbuckets"),
            F.col("s.count").alias("count"),
            F.col("s.data").alias("data"),
            F.col("s.step").alias("step"),
        )
    )
    return picked


def probe_hashes(keys: DataFrame, state: DataFrame) -> DataFrame:
    """Minimal-traffic probe: keys(shard, hash) -> maybe-seen (shard, hash).

    Only 16 bytes/candidate cross the Arrow boundary (the full-row
    `probe` round-trips every candidate column; at millions of
    candidates that dominates the stage). The caller splits candidates
    with a join against the (tiny) maybe-set — AQE broadcasts it."""

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"shard": [], "hash": []}).astype(
                {"shard": "int32", "hash": "int64"}
            )
        if len(right) > 1:
            raise ValueError(
                "unresolved filter state: expected one row per shard — "
                "resolve append-only state with latest_state() first"
            )
        filt = CuckooFilter.from_bytes(bytes(right["data"].iloc[0]))
        hits = filt.contains(left["hash"].to_numpy().astype("uint64"))
        out = left.loc[hits, ["shard", "hash"]]
        return out

    return (
        keys.groupBy("shard")
        .cogroup(state.groupBy("shard"))
        .applyInPandas(fn, "shard int, hash long")
    )
