"""Bounded-state sketches for web-scale streams — Count-Min frequency
estimation and HyperLogLog cardinality, the statistics a 10^10-URL
frontier needs where exact groupBy counts stop fitting anywhere.

Both sketches are DETERMINISTIC INTEGER laws end-to-end, so — unlike
Spark's built-in approx_count_distinct / count_min_sketch, whose
implementations cannot be reproduced in another engine — every register
and counter (and the one-division raw estimate) is exactly mirrorable
in ANSI SQL and hash-gates against the DuckDB oracles:

- bucket law: 60-bit md5 (functions/hashes.md5_h60_col — the repo-wide
  portable-hash law) reduced mod the table width; no xxhash (DuckDB has
  none).
- CMS counters are BIGINT occurrence sums; the point estimate is
  min over depth rows — pure integer ops.
- HLL registers are max leading-zero ranks (integers via a
  power-of-two comparison ladder — no log2, whose cross-engine
  correct-rounding is not guaranteed); the harmonic-mean denominator
  is kept as the INTEGER sum of 2^(w+1-M_j), which is exact and
  summation-ORDER-INDEPENDENT (a double 2^-M_j sum would need 61 bits
  of precision at m=256 and could round differently per plan), leaving
  exactly one IEEE division in the estimate.

Scale shape: both sketches are one map-side-combinable groupBy over a
constant key space (depth x width counters; m registers), i.e. the
shuffle carries at most the sketch size per upstream partition no
matter how many rows feed it. Sketches of disjoint inputs merge by
cell-wise sum (CMS) / max (HLL) — the same aggregates — so incremental
and distributed builds compose exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_engine_spark.functions.hashes import md5_h60_col


def _bucket(term, seed: int, width: int):
    """CMS bucket law: h60(term || ':' || seed) % width (md5-portable)."""
    return md5_h60_col(
        F.concat(term, F.lit(":"), F.lit(str(seed)))
    ) % F.lit(int(width))


def _check_dims(width: int, depth: int) -> None:
    if width < 1 or depth < 1:
        raise ValueError(
            f"width/depth must be >= 1, got {width}/{depth}"
        )


def _seed_bucket_rows(
    df: DataFrame, term: str, width: int, depth: int, keep: list[str]
) -> DataFrame:
    """One (seed, bucket) row per input row per hash function — THE
    bucket law, shared by every counter build and probe (global and
    grouped) so an edit cannot silently de-sync them (a probe hashing
    differently from the build voids the overestimate guarantee with
    no error). `keep` columns ride along (the probe term, group
    keys)."""
    t = F.col(term)
    sb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("seed"),
                    _bucket(t, s, width).alias("bucket"),
                )
                for s in range(depth)
            ]
        )
    ).alias("sb")
    return df.select(*keep, sb).select(
        *keep,
        F.col("sb.seed").alias("seed"),
        F.col("sb.bucket").alias("bucket"),
    )


def cms_counters(
    df: DataFrame,
    term: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Count-Min Sketch counters over one row per term OCCURRENCE:
    (seed, bucket, cnt) with cnt = BIGINT occurrence count of the
    bucket under hash function `seed`. At most depth*width output rows;
    map-side combine bounds the shuffle at that size per partition.
    Merge sketches by summing cnt cell-wise."""
    _check_dims(width, depth)
    return (
        _seed_bucket_rows(df, term, width, depth, keep=[])
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_lookup(
    counters: DataFrame,
    terms: DataFrame,
    term: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate occurrence counts for `terms` (distinct terms
    expected): est = min over seeds of the counter cell the term hashes
    to (0 for a never-incremented cell). est >= true count always (the
    CMS overestimate guarantee — collisions only ADD) PROVIDED width
    and depth equal the values the counters were built with: the
    parameters are part of the sketch identity, and probing with
    different ones silently underestimates (cells miss).  Probe side
    is |terms|*depth rows joining a <= depth*width-row counter table —
    broadcast-sized by construction."""
    _check_dims(width, depth)
    probes = _seed_bucket_rows(terms, term, width, depth, keep=[term])
    return (
        probes.join(F.broadcast(counters), ["seed", "bucket"], "left")
        .groupBy(term)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
                "cms_est"
            )
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _hll_w(bucket_bits: int) -> int:
    """Rank-stream width: the h60 bits left after the bucket index."""
    return 60 - bucket_bits


def hll_registers(
    df: DataFrame, key: str, bucket_bits: int = 8
) -> DataFrame:
    """HyperLogLog registers over the values of `key`: (bucket,
    max_rho) for ALL m = 2^bucket_bits buckets (empty buckets hold 0 —
    they carry weight in the estimate and must exist for sketch
    merging, which is cell-wise MAX).

    h = h60(key); bucket = h % m (low bits); the remaining HIGH
    w = 60 - bucket_bits bits (rem = h >> bucket_bits) form the rank
    stream: rho = w - bit_length(rem) + 1 (rem = 0 -> w + 1).
    bit_length is an integer comparison ladder against the w
    power-of-two literals — exact on any engine (a h/m double division
    would already be lossy: h has 60 bits, doubles carry 53)."""
    if not 4 <= bucket_bits <= 16:
        raise ValueError(
            f"bucket_bits must be in [4, 16], got {bucket_bits}"
        )
    m = 1 << bucket_bits
    w = _hll_w(bucket_bits)
    powers = F.array(*[F.lit(1 << k).cast("long") for k in range(w)])
    # ladder: materialize the hash (then the rank stream) as COLUMNS —
    # inside the filter lambda they would be captured as EXPRESSIONS
    # and the md5 re-evaluated per power-of-two comparison (w+1 hashes
    # per row; the trees-not-DAGs trap PLANS.md documents)
    obs = (
        df.select(md5_h60_col(F.col(key)).alias("_h"))
        .withColumn(
            "_rem", F.shiftright("_h", bucket_bits)
        )  # _h >= 0: arithmetic == logical shift
        .select(
            (F.col("_h") % F.lit(m)).alias("bucket"),
            (
                F.lit(w + 1)
                - F.size(
                    F.filter(powers, lambda p: F.col("_rem") >= p)
                )
            ).alias("_rho"),
        )
        .groupBy("bucket")
        .agg(F.max("_rho").alias("max_rho"))
    )
    spark = df.sparkSession
    full = spark.range(m).select(F.col("id").cast("long").alias("bucket"))
    return full.join(obs, "bucket", "left").select(
        "bucket",
        F.coalesce(F.col("max_rho"), F.lit(0).cast("int")).alias(
            "max_rho"
        ),
    )


def hll_alpha(m: int) -> float:
    """The standard HLL bias constant (Flajolet et al. 2007)."""
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    if m == 64:
        return 0.709
    if m == 32:
        return 0.697
    return 0.673


def hll_raw_estimate_sql(bucket_bits: int = 8, s_col: str = "s") -> str:
    """The raw HLL estimate as ONE shared IEEE expression string over
    the INTEGER denominator S = sum_j 2^(w + 1 - M_j):

        E = alpha_m * m^2 / sum_j 2^(-M_j)
          = alpha_m * m^2 * 2^(w+1) / S

    Every literal is exactly representable (alpha inlined via repr —
    the mixture-law convention; m^2 and 2^(w+1) are powers of two), so
    both engines perform the identical single division. Raw estimate
    only: the standard small/large-range corrections are left to
    consumers (document the regime; the gate pins the law)."""
    m = 1 << bucket_bits
    w = _hll_w(bucket_bits)
    alpha = hll_alpha(m)
    num = f"CAST({alpha!r} AS DOUBLE) * {m * m} * CAST({1 << (w + 1)} AS DOUBLE)"
    return f"({num}) / CAST({s_col} AS DOUBLE)"


def hll_estimate(
    registers: DataFrame, bucket_bits: int = 8
) -> DataFrame:
    """One row (s, raw_est) from a full register table.  S is the
    BIGINT sum of 2^(w+1-M_j): with M_j in [0, w+1] each addend is
    <= 2^(w+1) = 2^53 at the default 8 bucket bits and the m-term sum
    stays under 2^61 — exact, order-independent."""
    w = _hll_w(bucket_bits)
    # 2^(w+1-M) via a literal table lookup — integers end-to-end
    pows = F.array(
        *[F.lit(1 << k).cast("long") for k in range(w + 2)]
    )
    s = registers.agg(
        F.sum(
            F.element_at(pows, F.lit(w + 2) - F.col("max_rho"))
        ).alias("s")
    )
    return s.select(
        "s",
        F.expr(hll_raw_estimate_sql(bucket_bits)).alias("raw_est"),
    )


def hll_grouped_registers(
    df: DataFrame,
    group_cols: list[str],
    key: str,
    bucket_bits: int = 8,
) -> DataFrame:
    """Per-GROUP HyperLogLog registers — one sketch per group key
    (per-host distinct-URL counts, per-source distinct docs, ...):
    (group_cols..., bucket, max_rho), only the buckets a group
    observed (its absent buckets are implicit zeros, unlike the global
    hll_registers — materializing m rows PER GROUP would defeat the
    sketch at 10^8 hosts; hll_grouped_estimate accounts for them
    arithmetically).

    Same register law as hll_registers (shared ladder columns), so a
    group's rows here equal the global sketch of that group's rows
    alone — merge across shards by (group, bucket) max.  Scale shape:
    one map-side-combinable groupBy on (group, bucket); each upstream
    partition contributes at most m rows PER GROUP IT SEES."""
    if not 4 <= bucket_bits <= 16:
        raise ValueError(
            f"bucket_bits must be in [4, 16], got {bucket_bits}"
        )
    m = 1 << bucket_bits
    w = _hll_w(bucket_bits)
    powers = F.array(*[F.lit(1 << k).cast("long") for k in range(w)])
    return (
        df.select(*group_cols, md5_h60_col(F.col(key)).alias("_h"))
        .withColumn("_rem", F.shiftright("_h", bucket_bits))
        .select(
            *group_cols,
            (F.col("_h") % F.lit(m)).alias("bucket"),
            (
                F.lit(w + 1)
                - F.size(
                    F.filter(powers, lambda p: F.col("_rem") >= p)
                )
            ).alias("_rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").alias("max_rho"))
    )


def hll_grouped_estimate(
    registers: DataFrame,
    group_cols: list[str],
    bucket_bits: int = 8,
) -> DataFrame:
    """One row per group: (group_cols..., s, raw_est) from a
    hll_grouped_registers frame.  The integer denominator counts each
    group's ABSENT buckets as zero registers arithmetically —
    S = sum(2^(w+1-M_j)) + (m - observed) * 2^(w+1) — so sparse
    storage changes nothing about the law (bit-equal to running
    hll_registers + hll_estimate on the group alone)."""
    w = _hll_w(bucket_bits)
    m = 1 << bucket_bits
    pows = F.array(
        *[F.lit(1 << k).cast("long") for k in range(w + 2)]
    )
    s = registers.groupBy(*group_cols).agg(
        (
            F.sum(F.element_at(pows, F.lit(w + 2) - F.col("max_rho")))
            + (F.lit(m) - F.count(F.lit(1)))
            * F.lit(1 << (w + 1)).cast("long")
        ).alias("s")
    )
    return s.select(
        *group_cols,
        "s",
        F.expr(hll_raw_estimate_sql(bucket_bits)).alias("raw_est"),
    )


def cms_grouped_counters(
    df: DataFrame,
    group_cols: list[str],
    term: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Per-GROUP Count-Min counters — one sketch per group key
    (per-host term frequencies, per-source URL-pattern counts):
    (group_cols..., seed, bucket, cnt), only the cells a group
    incremented (its absent cells are implicit zeros — materializing
    depth*width rows per group would defeat the sketch at 10^8
    groups).  Same bucket law as cms_counters (_seed_bucket_rows), so
    a group's cells equal the global sketch of that group's rows alone;
    merge across shards by (group, seed, bucket) sum.  One
    map-side-combinable groupBy: each upstream partition contributes at
    most depth*width rows per group it sees."""
    _check_dims(width, depth)
    return (
        _seed_bucket_rows(df, term, width, depth, keep=list(group_cols))
        .groupBy(*group_cols, "seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_grouped_lookup(
    counters: DataFrame,
    terms: DataFrame,
    group_cols: list[str],
    term: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate per (group, term): min over seeds of the group's
    cell (absent cell = 0 — sparse storage, same law as cms_lookup).
    `terms` carries (group_cols..., term) probe rows; width/depth must
    equal the build's (the sketch identity).  The join is an equi-join
    on (group, seed, bucket) — counters are NOT broadcast here: per-
    group sketch tables scale with the group count."""
    _check_dims(width, depth)
    probes = _seed_bucket_rows(
        terms, term, width, depth, keep=[*group_cols, term]
    )
    return (
        probes.join(counters, [*group_cols, "seed", "bucket"], "left")
        .groupBy(*group_cols, term)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
                "cms_est"
            )
        )
    )
