"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k for one query vector — the
  correctness baseline. Dot products are JVM-native left-folds
  (F.zip_with + F.aggregate), so the scan stays in whole-stage codegen;
  top-k is TakeOrdered (no full sort shuffle).
- lsh_bucket / ann_topk_lsh: sign-LSH (random-hyperplane) bucketing —
  the scale path. All vectors are bucketed once (a narrow column add);
  a query probes only its own bucket plus hamming<=1 neighbor buckets.
  At 10^10 rows the probe touches ~2^-b of the data per bucket probed.

Hyperplanes are deterministic (seeded numpy) and passed as literals so
the plan is reproducible; recall is asserted against brute force in
tests (driver-facing entries expose the brute-force baseline as the
oracle-checked query and the LSH variant as the recall-tested scale
path).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_engine_spark.operators.dedup import cosine_col


def make_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def brute_force_topk(
    df: DataFrame, key: str, vec: str, query: list[float], k: int = 10
) -> DataFrame:
    qcol = F.array(*[F.lit(float(x)) for x in query])
    return (
        df.select(F.col(key), cosine_col(F.col(vec), qcol).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(key))
        .limit(k)
    )


def _bucket_col(vec: str, planes: list[list[float]]):
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col(vec),
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for p in planes
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket * 2 + b
    return bucket


def lsh_bucket(df: DataFrame, vec: str, planes: list[list[float]]) -> DataFrame:
    """Add the sign-LSH bucket column (done once, persisted with the table
    at scale — bucket is the partition key of the ANN index)."""
    return df.withColumn("bucket", _bucket_col(vec, planes))


def ann_topk_lsh(
    bucketed: DataFrame,
    key: str,
    vec: str,
    query: list[float],
    planes: list[list[float]],
    k: int = 10,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the query's bucket and its hamming<=h
    neighbor buckets only, then exact cosine within the probed set."""
    q = np.asarray(query, dtype=np.float64)
    qbits = [1 if float(np.dot(q, np.asarray(p))) >= 0 else 0 for p in planes]
    qbucket = 0
    for b in qbits:
        qbucket = qbucket * 2 + b
    buckets = {qbucket}
    if probe_hamming >= 1:
        for i in range(len(planes)):
            buckets.add(qbucket ^ (1 << i))
    qcol = F.array(*[F.lit(float(x)) for x in query])
    return (
        bucketed.filter(F.col("bucket").isin(list(buckets)))
        .select(F.col(key), cosine_col(F.col(vec), qcol).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(key))
        .limit(k)
    )
