"""Deterministic, reproducible corpus sampling for training-data mixes.

Training pipelines need sampling that is (a) exactly reproducible across
runs and cluster layouts, (b) independent of partitioning and row order,
and (c) cheap at 100 TB. `df.sample()` gives none of these (it is
seeded per-partition, so a repartition changes the selected rows).
Everything here keys the decision on a hash of a stable row key instead:
keep iff u(key, salt) < rate, where u is a uniform [0,1) value derived
from xxhash64 — a pure JVM projection, no shuffle, no RNG state.

The same construction gives consistent COUPLED samples: with one salt, a
5% sample is a strict subset of a 10% sample (u < 0.05 implies
u < 0.10), which is what you want for scaling-law corpus ladders.

All ops are stateless per-row Column algebra — they run unchanged on
Structured Streaming sources.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spider_engine_spark.functions.hashes import md5_h60_col

# 2^53: the largest power of two whose reciprocal keeps the quotient
# exact in a double (xxhash64 bits beyond 53 would be rounded anyway)
_U_BITS = 53
_U_DENOM = float(1 << _U_BITS)


def uniform_unit(key: Column, salt: int = 0, law: str = "xxhash64") -> Column:
    """Deterministic uniform [0,1) from a row key: the low 53 bits of a
    keyed hash scaled by 2^-53. Independent of partitioning, ordering,
    and cluster size; changing `salt` draws an independent sample.

    law='xxhash64' (default) is the production hash — cheapest JVM path.
    law='md5' derives the same 53-bit quotient from the shared 60-bit
    md5 law (functions/hashes.md5_h60_col) over `key || ':' || salt`,
    which ANSI engines can recompute bit-for-bit — it exists so the
    sampling DECISION itself can sit behind an exact SQL oracle
    (DuckDB: ('0x'||substring(md5(k||':'||s),1,15))::BIGINT % 2^53 / 2^53).
    Both are uniform; only the cost differs (md5 ~2-3x the hash time,
    still a tiny fraction of a parquet scan).

    A NULL key yields a NULL u (so every sample filter DROPS null-key
    rows — the same rows the SQL law drops, since `||` propagates NULL).
    Without the guard, xxhash64(NULL, salt) and concat_ws's null-
    skipping would give all null-key rows one shared constant u: the
    whole group all-in or all-out, which is not a sample."""
    if law == "xxhash64":
        h = F.xxhash64(key, F.lit(salt))
    elif law == "md5":
        h = md5_h60_col(
            F.concat_ws(":", key.cast("string"), F.lit(str(salt)))
        )
    else:
        raise ValueError(f"unknown sampling hash law: {law!r}")
    u = F.pmod(h, F.lit(1 << _U_BITS)).cast("double") / F.lit(_U_DENOM)
    return F.when(key.isNull(), F.lit(None).cast("double")).otherwise(u)


def deterministic_sample(
    df: DataFrame, key: str, rate: float, salt: int = 0,
    law: str = "xxhash64",
) -> DataFrame:
    """Keep each row iff u(key, salt) < rate. Exactly reproducible; a
    lower-rate sample with the same salt is a strict subset of a
    higher-rate one (coupled samples for corpus-scaling ladders)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(
        uniform_unit(F.col(key), salt, law) < F.lit(float(rate))
    )


def weighted_sample(
    df: DataFrame, key: str, weight: Column, salt: int = 0,
    law: str = "xxhash64",
) -> DataFrame:
    """Per-row acceptance probability = clamp(weight, 0, 1) — e.g. a
    quality score as the keep probability (soft quality filtering à la
    CCNet/Dolma mixes). Deterministic in (key, salt). NULL and NaN
    weights mean "no usable score" and are dropped (p = 0): Spark's
    least/greatest order NaN ABOVE every double, so an unguarded clamp
    would turn a NaN quality score into keep-with-certainty — the exact
    junk rows a weighted quality sample exists to down-weight."""
    w = weight.cast("double")
    p = F.when(w.isNull() | F.isnan(w), F.lit(0.0)).otherwise(
        F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0))
    )
    return df.filter(uniform_unit(F.col(key), salt, law) < p)


def stratified_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: int = 0,
    law: str = "xxhash64",
) -> DataFrame:
    """Per-stratum rates (e.g. {'en': 0.3, 'de': 1.0}) for language /
    source rebalancing. The rate lookup is a small literal map expr —
    no join, no shuffle; strata missing from `rates` get default_rate."""
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1]")
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum) == F.lit(k), F.lit(float(v))).otherwise(
            rate
        )
    return df.filter(uniform_unit(F.col(key), salt, law) < rate)
