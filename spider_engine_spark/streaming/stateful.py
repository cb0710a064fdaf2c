"""Custom stateful streaming operator: incremental URL-seen dedup.

The batch crawl keeps its seen-set in sharded cuckoo filters
(operators/seenset.py); this is the streaming form: a keyed
`applyInPandasWithState` operator whose per-shard state is the set of
seen url hashes. Each micro-batch emits only first-seen URLs — the
streaming analogue of the frontier's admit step (and of the reference's
PK-duplicate rejection, table.go:451-454), with state-store-backed
exactly-once semantics across micro-batches.

State layout: one group per shard (`pmod(xxhash64(url), n_shards)`), a
packed uint64 hash array as state (numpy <-> list<long>). At scale the
state would hold the cuckoo table bytes instead of exact hashes — the
operator shape (keyed state + Arrow batches) is identical.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("shard", IntegerType(), False),
    ]
)
STATE_SCHEMA = StructType([StructField("hashes", ArrayType(LongType()), True)])


def _dedup_fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    # fully vectorized: first-occurrence dedup within the batch via
    # pandas drop_duplicates, membership vs state via np.isin — no
    # Python loop over rows anywhere in the operator
    seen = np.array(
        state.get[0] if state.exists and state.get[0] else [], dtype=np.int64
    )
    out_frames: list[pd.DataFrame] = []
    for pdf in pdf_iter:
        pdf = pdf.drop_duplicates(subset=["hash"], keep="first")
        hashes = pdf["hash"].to_numpy(dtype=np.int64)
        fresh = ~np.isin(hashes, seen)
        new = pdf.loc[fresh]
        if len(new):
            out_frames.append(new[["url"]])
            seen = np.concatenate([seen, hashes[fresh]])
    state.update((seen.tolist(),))
    if out_frames:
        out = pd.concat(out_frames, ignore_index=True)
        out["shard"] = int(key[0])
        yield out


def stateful_seen_dedup(
    stream: DataFrame, url_col: str = "url", n_shards: int = 8
) -> DataFrame:
    """streaming df with a `url` column -> first-seen urls only (stateful
    across micro-batches)."""
    keyed = stream.select(
        F.col(url_col).alias("url"),
        F.xxhash64(F.col(url_col)).alias("hash"),
    ).withColumn(
        "shard", F.pmod(F.col("hash"), F.lit(n_shards)).cast("int")
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def stateful_seen_dedup_tws(
    stream: DataFrame, url_col: str = "url", n_shards: int = 8
) -> DataFrame:
    """Spark 4 transformWithStateInPandas form of the same operator: a
    StatefulProcessor with a typed ValueState holding the shard's seen
    hashes (RocksDB state store). Functionally identical to
    stateful_seen_dedup; this is the forward-looking API (timers, typed
    state, schema evolution) the applyInPandasWithState form migrates to.

    ENV NOTE: the TWS driver worker requires google.protobuf, which is
    not installed in this container — the pytest skips without it (same
    honest gating as the multimodal codecs); the operator itself is the
    correct shape for environments that have it.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SeenDedup(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            seen = np.array(
                self._seen.get()[0] if self._seen.exists() else [],
                dtype=np.int64,
            )
            for pdf in rows:
                pdf = pdf.drop_duplicates(subset=["hash"], keep="first")
                hashes = pdf["hash"].to_numpy(dtype=np.int64)
                fresh = ~np.isin(hashes, seen)
                new = pdf.loc[fresh]
                if len(new):
                    seen = np.concatenate([seen, hashes[fresh]])
                    out = new[["url"]].copy()
                    out["shard"] = int(key[0])
                    yield out
            self._seen.update((seen.tolist(),))

        def close(self) -> None:
            pass

    keyed = stream.select(
        F.col(url_col).alias("url"),
        F.xxhash64(F.col(url_col)).alias("hash"),
    ).withColumn(
        "shard", F.pmod(F.col("hash"), F.lit(n_shards)).cast("int")
    )
    return keyed.groupBy("shard").transformWithStateInPandas(
        statefulProcessor=SeenDedup(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
