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
    seen = np.array(
        state.get[0] if state.exists and state.get[0] else [], dtype=np.int64
    )
    seen_set = set(seen.tolist())
    out_urls: list[str] = []
    for pdf in pdf_iter:
        for url, h in zip(pdf["url"], pdf["hash"]):
            h = int(h)
            if h not in seen_set:
                seen_set.add(h)
                out_urls.append(url)
    state.update((list(seen_set),))
    if out_urls:
        yield pd.DataFrame({"url": out_urls, "shard": int(key[0])})


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
