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


def normalize_weights(weights: dict[str, float]) -> dict[str, float]:
    """Target mixture shares scaled to sum to 1. Weights must be > 0 and
    finite (a zero-share stratum belongs OUT of the dict — mixture math
    would divide by it). math.fsum keeps the total exact regardless of
    dict order, so the normalized shares are reproducible."""
    import math

    if not weights:
        raise ValueError("mixture weights must be non-empty")
    for k, v in weights.items():
        if not (v > 0.0) or math.isinf(v):
            raise ValueError(
                f"mixture weight for {k!r} must be a finite positive "
                f"number, got {v}"
            )
    total = math.fsum(weights.values())
    return {k: v / total for k, v in weights.items()}


def mixture_rates(
    counts: dict[str, int], shares: dict[str, float]
) -> dict[str, float]:
    """Per-stratum keep rates for the LARGEST downsample-only corpus
    with exactly the target mixture `shares` (normalized, summing to 1):

        n_star  = min_s counts[s] / shares[s]   (feasible total size)
        rate[s] = min(1, shares[s] * n_star / counts[s])

    The binding stratum (the argmin) keeps everything (rate 1); every
    other stratum downsamples to match. This is the standard "mix to
    target proportions without upsampling" law of training-data
    recipes (Pile/Dolma-style source mixing). Strata absent from
    `shares` get no rate (callers drop them); a share whose stratum has
    zero rows makes the mixture infeasible and raises.

    IEEE note: the arithmetic is division/multiply/min only — no
    accumulation — so any engine that stores counts exactly (they are
    integers < 2^53) reproduces these rates bit-for-bit with the same
    op order: n/w per stratum, min, then (w * n_star) / n. The SQL
    oracle of the driver query mirrors exactly that order.
    """
    for s in shares:
        if counts.get(s, 0) <= 0:
            raise ValueError(
                f"mixture stratum {s!r} has no rows — target share "
                f"unreachable by downsampling"
            )
    n_star = min(counts[s] / shares[s] for s in shares)
    return {
        s: min(1.0, shares[s] * n_star / counts[s]) for s in shares
    }


def stratum_counts(df: DataFrame, stratum: str) -> dict[str, int]:
    """Per-stratum row counts as a dict (NULL stratum excluded). One
    aggregation; the collect is bounded by the number of strata —
    mixtures are over sources/languages, a handful to a few thousand
    groups."""
    return {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(stratum).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["s"] is not None
    }


def mixture_resample(
    df: DataFrame,
    key: str,
    stratum: str,
    weights: dict[str, float],
    salt: int = 0,
    law: str = "xxhash64",
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """Rebalance a corpus to target mixture `weights` (relative shares
    over `stratum` values, e.g. {'web': 6, 'code': 3, 'books': 1}) by
    deterministic downsampling: the largest corpus with exactly those
    proportions that needs no upsampling (see mixture_rates). Strata
    outside the mixture are dropped.

    One counting aggregation (stratum_counts — pass `counts` to reuse
    an already-collected dict and skip it) plus one stateless filter
    pass; membership is the hash law of this module, so the result is
    exactly reproducible and a re-run over a grown corpus keeps a
    superset decision per surviving row only where rates rose."""
    shares = normalize_weights(weights)
    if counts is None:
        counts = stratum_counts(df, stratum)
    rates = mixture_rates(counts, shares)
    return stratified_sample(
        df, key, stratum, rates, default_rate=0.0, salt=salt, law=law
    )
