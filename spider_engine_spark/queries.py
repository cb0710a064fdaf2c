"""Driver-contract query registry: Spark implementations + DuckDB oracles.

Every operator claimed in SURVEY.md §2 gets a `queries()` entry here; the
paired `oracle_sql()` string is ANSI SQL DuckDB runs over the same parquet
views. The driver compares row-count + schema + order-insensitive
value-hash with columns sorted by name, so:

- every computed column is aliased identically on both sides;
- double aggregations go through DECIMAL so the sum is order-independent
  and bit-equal across engines (sum of raw doubles is shuffle-order
  dependent), then cast back to double;
- timestamps are returned as epoch-second longs and dates as ISO strings
  (session-timezone-proof);
- every ranked/limited query carries a deterministic tiebreak.

Hash-parity notes for the search oracles: the reference's TF weight is
uint32(float32(cnt)/float32(total)*10000) (common.go:149) — DuckDB FLOAT
arithmetic is float32 like Spark FloatType, and trunc()/cast("int")
truncate alike, so the weights are bit-equal; the TF-IDF expression
(table.go:1116-1123) keeps the same association order on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spider_engine_spark.operators.postings import build_postings_native
from spider_engine_spark.operators.search import SearchFilter, search

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Fact tables whose queries run compute-heavy per-row ladders
# (tokenize, quality rules, cosine folds, decimal partial aggs) in the
# SCAN stage. The bench parquet files are single row groups, so the
# scan — and everything whole-stage-fused into it — runs on at most
# one task per file no matter how splits are tuned (extra byte-range
# splits of a one-row-group file are empty; measured). Dimension
# tables (region/nation/supplier/...) stay un-fanned: they broadcast.
_FAN_OUT_TABLES = {"documents", "embeddings"}
# events/orders/lineitem deliberately NOT in the set: their queries are
# light aggregations/joins/windows where the extra round-robin exchange
# measured a net loss in interleaved A/B (events_hourly 0.41→0.64 s;
# lineitem: only tpch_q1's decimal agg won (1.69→1.22) while q3/q4/q5
# each lost 0.3–0.5 s), whereas documents/embeddings queries run heavy
# per-row ladders that measured 1.4–2.6× faster (quality_gate
# 1.65→0.86, gopher 1.43→0.55, cms 1.72→0.77, winnowing 0.89→0.41,
# pii 0.60→0.34). Light tokenize-only aggregations over documents
# (term_doc_freq, bm25, collocations, mixture) opt out per call.


def load(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    fan_out: bool | None = None,
) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if fan_out is None:
        fan_out = table in _FAN_OUT_TABLES
    if fan_out:
        # scale-ADAPTIVE fan-out (guide §2.5 "input skew: repartition
        # after the read"): only when the scan under-parallelizes the
        # session (few files / row groups). At real scale the scan
        # already yields >= parallelism partitions and this is a no-op
        # — the condition, not a constant, decides. Predicate pushdown
        # is unaffected (filters push through Repartition to the scan;
        # verified in the committed plans). Round-robin repartition is
        # deterministic (sort-before-repartition is on by default).
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def ntz_epoch(c) -> F.Column:
    """Wall-clock epoch seconds (floor) of a TIMESTAMP_NTZ column —
    matches DuckDB floor(epoch(ts))::BIGINT on naive timestamps.
    Delegates to the shared operators.search.ntz_epoch_expr."""
    from spider_engine_spark.operators.search import ntz_epoch_expr

    return ntz_epoch_expr(F.col(c) if isinstance(c, str) else c)


# ---------------------------------------------------------------------------
# Search family (documents table; SURVEY.md §2.4 Q1-Q10)
# ---------------------------------------------------------------------------

_SEARCH_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tok2 AS (
  SELECT doc_id, term FROM toks WHERE term <> ''
), per_doc AS (
  SELECT doc_id, count(*) AS total FROM tok2 GROUP BY doc_id
), per_term AS (
  SELECT doc_id, count(*) AS cnt FROM tok2 WHERE term = '{term}' GROUP BY doc_id
), weighted AS (
  SELECT p.doc_id,
         trunc((p.cnt::FLOAT / d.total::FLOAT) * 10000::FLOAT)::BIGINT AS weight
  FROM per_term p JOIN per_doc d USING (doc_id)
), filtered AS (
  SELECT w.doc_id, w.weight, d.text, d.lang, d.source, d.n_chars
  FROM weighted w JOIN documents d USING (doc_id)
  WHERE {where}
), stats AS (
  SELECT count(*) AS df, (SELECT count(*) FROM documents) AS maxdoc
  FROM filtered
), scored AS (
  SELECT f.doc_id, f.text, f.lang, f.source, f.n_chars,
         trunc(f.weight / 10000.0 * log10(s.maxdoc::DOUBLE / s.df::DOUBLE)
               * 1000.0)::BIGINT AS score
  FROM filtered f CROSS JOIN stats s
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
)
SELECT doc_id, text, lang, source, n_chars, score
FROM ranked WHERE rn > {offset} AND rn <= {offset} + {size}
"""


def _search_docs(spark, sf_dir, keyword, filters=(), offset=0, size=100):
    docs = load(spark, sf_dir, "documents")
    postings = build_postings_native(docs, "doc_id", "text")
    page = search(
        docs,
        postings,
        keyword=keyword,
        search_field="text",
        filters=filters,
        offset=offset,
        size=size,
        max_doc=docs.count(),
        # df from the postings statistic when no filters shrink the set
        # (search() falls back to the count-agg otherwise) — one fewer
        # evaluation of the candidate subplan
        df_source="postings",
    )
    return page.select("doc_id", "text", "lang", "source", "n_chars", "score")


@query(
    "search_tfidf",
    _SEARCH_ORACLE.format(term="spark", where="TRUE", offset=0, size=20),
)
def search_tfidf(spark, sf_dir):
    """Q1+Q7+Q8+Q9+Q10: term probe -> TF-IDF -> rank -> page -> hydrate."""
    return _search_docs(spark, sf_dir, "spark", offset=0, size=20)


@query(
    "search_filtered",
    _SEARCH_ORACLE.format(
        term="data",
        # reference numeric '>' evaluates >= (forwardindex.go:583)
        where="d.n_chars >= 200 AND d.lang IN ('en', 'zh')",
        offset=0,
        size=50,
    ),
)
def search_filtered(spark, sf_dir):
    """Q5: AND-filters with the reference's >= quirk and string IN."""
    return _search_docs(
        spark,
        sf_dir,
        "data",
        filters=[
            SearchFilter("n_chars", ">", value=200),
            SearchFilter("lang", "in", values=["en", "zh"]),
        ],
        offset=0,
        size=50,
    )


@query(
    "search_pagination",
    _SEARCH_ORACLE.format(term="table", where="TRUE", offset=10, size=10),
)
def search_pagination(spark, sf_dir):
    """Q9: offset/size slice of the ranked result."""
    return _search_docs(spark, sf_dir, "table", offset=10, size=10)


@query(
    "term_doc_freq",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    )
    SELECT term, count(DISTINCT doc_id) AS doc_freq
    FROM toks WHERE term <> ''
    GROUP BY term ORDER BY doc_freq DESC, term ASC LIMIT 20
    """,
)
def term_doc_freq(spark, sf_dir):
    """I2's df statistic: postings-table document frequencies."""
    # fan_out=False: a tokenize-only aggregation — the fan-out exchange
    # measured a net loss here (interleaved A/B 0.46 -> 0.75 s)
    docs = load(spark, sf_dir, "documents", fan_out=False)
    postings = build_postings_native(docs, "doc_id", "text")
    return (
        postings.select("term", F.col("df").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("term"))
        .limit(20)
    )


@query(
    "point_lookup",
    "SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id = 123",
)
def point_lookup(spark, sf_dir):
    """S2/Q11: primary-key point read (table.go:384-417)."""
    return load(spark, sf_dir, "documents").filter(F.col("doc_id") == 123)


@query(
    "delete_antijoin",
    """
    SELECT lang, count(*) AS n_docs
    FROM documents WHERE doc_id % 10 <> 0
    GROUP BY lang
    """,
)
def delete_antijoin(spark, sf_dir):
    """M1/Q4: logical delete = anti-join against a tombstone set."""
    docs = load(spark, sf_dir, "documents")
    deleted = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    return (
        docs.join(deleted, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "update_latest",
    """
    WITH updates AS (
      SELECT doc_id, text, 'updated' AS source, 2 AS version
      FROM documents WHERE doc_id < 50
    ), unioned AS (
      SELECT doc_id, text, source, 1 AS version FROM documents
      UNION ALL SELECT * FROM updates
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY version DESC) AS rn
      FROM unioned
    )
    SELECT doc_id, text, source, version FROM ranked WHERE rn = 1
    """,
)
def update_latest(spark, sf_dir):
    """M2: update = delete-then-insert; latest version wins
    (table.go:568-690 delete+re-add with a fresh docId)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    base = docs.withColumn("version", F.lit(1))
    updates = (
        docs.filter(F.col("doc_id") < 50)
        .withColumn("source", F.lit("updated"))
        .withColumn("version", F.lit(2))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("version"))
    return (
        base.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Relational surface (SURVEY.md §2.8 — reference lacks these; Spark natives)
# ---------------------------------------------------------------------------

_DEC = "decimal(18,2)"
_DEC6 = "decimal(18,6)"


def _dsum(c, alias):
    """Order-independent, engine-exact double sum via decimal."""
    return F.sum(c.cast(_DEC)).cast("double").alias(alias)


@query(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    """Pricing-summary aggregation (partial agg + single shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity"), "sum_qty"),
        _dsum(F.col("l_extendedprice"), "sum_base_price"),
        F.sum(disc.cast(_DEC6)).cast("double").alias("sum_disc_price"),
        F.sum(charge.cast(_DEC6)).cast("double").alias("sum_charge"),
        (
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "tpch_q3_top10",
    """
    SELECT o.o_orderkey,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = (
      SELECT min(c_mktsegment) FROM customer)
    GROUP BY o.o_orderkey, orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey ASC LIMIT 10
    """,
)
def tpch_q3_top10(spark, sf_dir):
    """Join chain + agg + deterministic top-10; the customer dim side is
    broadcast (small) so only lineitem⋈orders shuffles."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    seg = c.agg(F.min("c_mktsegment")).collect()[0][0]
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == seg)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(disc.cast(_DEC6)).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_regional",
    """
    SELECT n.n_name,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = (SELECT min(r_name) FROM region)
    GROUP BY n.n_name
    """,
)
def tpch_q5_regional(spark, sf_dir):
    """Star-join chain with all dims broadcast; one shuffle for the agg."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rname = r.agg(F.min("r_name")).collect()[0][0]
    dims = (
        c.join(
            F.broadcast(
                n.join(
                    F.broadcast(r.filter(F.col("r_name") == rname)),
                    n.n_regionkey == F.col("r_regionkey"),
                )
            ),
            c.c_nationkey == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.sum(disc.cast(_DEC6)).cast("double").alias("revenue"))
    )


@query(
    "window_topn_orders",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
        row_number() OVER (
          PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM ranked WHERE rk <= 3
    """,
)
def window_topn_orders(spark, sf_dir):
    """Window ranking: top-3 orders per customer."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@query(
    "events_hourly",
    """
    SELECT floor(epoch(date_trunc('hour', ts)))::BIGINT AS hour_epoch,
      event_type,
      count(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY hour_epoch, event_type
    """,
)
def events_hourly(spark, sf_dir):
    """Tumbling-window aggregation (batch form of the streaming hourly
    rollup); hour key as epoch long for timezone-proof comparison."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.floor(ntz_epoch("ts") / 3600) * 3600).alias("hour_epoch"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value"), "sum_value"),
        )
    )


@query(
    "events_running_sum",
    """
    SELECT event_id, user_id,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_value
    FROM events
    """,
)
def events_running_sum(spark, sf_dir):
    """Ordered running aggregate per user (decimal-exact)."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias(
            "running_value"
        ),
    )


@query(
    "events_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
        CASE WHEN floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) OVER (
          PARTITION BY user_id ORDER BY ts, event_id)
          > 1800 OR lag(ts) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
        CAST(SUM(new_session) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
      floor(epoch(min(ts)))::BIGINT AS session_start_epoch,
      floor(epoch(max(ts)))::BIGINT AS session_end_epoch
    FROM sessions GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization (30-min inactivity gap)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # the 30-min gap is defined on second granularity so the floor-to-second
    # truncation is identical on both sides (DuckDB floor(epoch(ts))).
    gap = ntz_epoch("ts") - F.lag(ntz_epoch("ts")).over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    return (
        flagged.withColumn("session_id", F.sum("new_session").over(wsum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ntz_epoch("ts")).alias("session_start_epoch"),
            F.max(ntz_epoch("ts")).alias("session_end_epoch"),
        )
    )


@query(
    "agg_distinct_users",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users,
      count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def agg_distinct_users(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Dedup family (training-data pipeline ops over `documents`)
# ---------------------------------------------------------------------------

_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"

# tokenize + 3-gram-shingle CTEs shared by the shingle-family oracles
# (dedup_minhash_lsh, dedup_ngram_jaccard, dedup_clusters) — ONE copy,
# so a change to the shingle law cannot silently desynchronize an
# oracle from its siblings (mirror of operators/dedup.py:_shingles_from)
_SHINGLE_CTES = f"""t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id,
        CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
             ELSE list_distinct([array_to_string(toks[i:i+2], ' ')
                                 for i in range(1, len(toks)-1)])
        END AS sh
      FROM t
    )"""


@query(
    "dedup_exact",
    f"""
    SELECT md5(text) AS content_hash, min(doc_id) AS kept_doc_id,
      count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: content-hash groupBy, keep min doc_id."""
    from spider_engine_spark.operators.dedup import exact_dedup

    return exact_dedup(load(spark, sf_dir, "documents"), "doc_id", "text")



# brute-force verified-pair scan — the oracle for BOTH the batch LSH
# path (dedup_minhash_lsh) and the incremental streaming path
# (streaming_neardup_pairs): the two engines provably emit the same
# verified pair set (LSH candidate law identical; see neardup.py)
_BRUTE_NEARDUP_SQL = f"""
    WITH {_SHINGLE_CTES}
    SELECT a.doc_id AS a, b.doc_id AS b,
      len(list_intersect(a.sh, b.sh))::DOUBLE
        / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
    """


@query("dedup_minhash_lsh", _BRUTE_NEARDUP_SQL)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(16) + 8-band LSH candidates, exact 3-gram-shingle Jaccard
    verification >= 0.8. Oracle is the brute-force pair scan. LSH recall
    is probabilistic, not certain: with r=2 rows/band a pair at jaccard
    j is missed with probability (1-j^2)^8 — ~2.8e-4 at the j=0.8
    boundary, <2e-6 at j>=0.9. On the fixed test corpora the coverage is
    AUDITED, not assumed: the LSH-verified pair set equals the exact
    shared-shingle generator's (recall 1.0; sf0.01 pairs all have
    j>=0.9, sf0.1 includes boundary pairs at j=0.8 and all 256 are
    found — pinned by test_lsh_recall_matches_exact_generator). At
    100 TB the same plan runs with r=4 and a band-bucket size cap."""
    from spider_engine_spark.operators.dedup import (
        jaccard_verify,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    docs = load(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", k=16, n=3)
    pairs = minhash_lsh_pairs(sigs, "doc_id", bands=8)
    return jaccard_verify(pairs, docs, "doc_id", "text", n=3).filter(
        F.col("jaccard") >= 0.8
    )


@query(
    "dedup_simhash",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
    tc AS (SELECT doc_id, term, count(*) AS cnt FROM tok GROUP BY doc_id, term),
    th AS (SELECT doc_id, cnt,
             ('0x' || substring(md5(term), 1, 15))::BIGINT AS h FROM tc),
    bits AS (
      SELECT doc_id, bb.b AS b,
        sum(CASE WHEN ((h >> bb.b) & 1) = 1 THEN cnt ELSE -cnt END) AS s
      FROM th CROSS JOIN range(60) bb(b) GROUP BY doc_id, bb.b
    ),
    sig0 AS (
      SELECT doc_id,
        sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS sim
      FROM bits GROUP BY doc_id
    ),
    sig AS (  -- zero-token docs get signature 0 (parity with Spark)
      SELECT d.doc_id, coalesce(s.sim, 0::BIGINT) AS sim
      FROM documents d LEFT JOIN sig0 s USING (doc_id)
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
      bit_count(xor(a.sim, b.sim))::INTEGER AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= 3
    """,
)
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs (hamming <= 3 of 60 md5 bits): JVM-native
    signature build (conditional-sum aggregates), 15-bit-chunk pigeonhole
    banding for candidates, native bit_count(xor) verify. The oracle is a
    full brute-force recomputation of the identical signature in SQL."""
    from spider_engine_spark.operators.dedup import simhash_pairs

    pairs = simhash_pairs(
        load(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )
    return pairs.select("a", "b", F.col("hamming").cast("int").alias("hamming"))


@query(
    "embedding_topk_pairs",
    """
    WITH p AS (
      SELECT a.vec_id AS a, b.vec_id AS b,
        list_cosine_similarity(a.embedding, b.embedding) AS c
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    SELECT a, b,
      row_number() OVER (ORDER BY c DESC, a ASC, b ASC) AS rank
    FROM p ORDER BY c DESC, a ASC, b ASC LIMIT 10
    """,
)
def embedding_topk_pairs(spark, sf_dir):
    """Embedding all-pairs EXACT top-10 — the labeled brute-force
    baseline (global top-k over arbitrary-cosine pairs is inherently
    quadratic; the bucketed scale path is embedding_near_dups_lsh below).
    Rank-only output: DuckDB's list_cosine_similarity accumulates in
    float32 vs Spark's double fold, so scores differ ~1e-7 — ordering is
    stable (gaps ~1e-3) but values would hash-mismatch.

    Plan shape: the global top-10 is a distributed TakeOrdered (orderBy +
    limit); the row_number window runs on the 10 surviving rows only —
    never an unpartitioned window over the O(n^2) pair set."""
    from spider_engine_spark.operators.dedup import cosine_col

    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("vb")
    )
    pairs = a.join(b, F.col("a") < F.col("b")).withColumn(
        "c", cosine_col(F.col("va"), F.col("vb"))
    )
    top = pairs.orderBy(F.desc("c"), F.asc("a"), F.asc("b")).limit(10)
    w = Window.orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("a", "b", "rank")


def _scaled_copies(emb, n_copies: int = 10, id_offset: int = 1_000_000):
    """Planted exact near-duplicates: copies of vec_id=0 scaled by powers
    of two. Power-of-two scaling is EXACT in IEEE floats, so each copy's
    cosine to the source, its sign-LSH bucket, and its IVF assignment are
    bit-identical to the source's in BOTH engines — which is what makes
    an approximate index oracle-checkable: the ANN result provably equals
    the brute-force oracle's top-k."""
    q0 = emb.filter(F.col("vec_id") == 0)
    scales = F.array(
        *[F.lit(float(2 ** (k + 1))) for k in range(n_copies)]
    )
    return emb.select("vec_id", "embedding").unionByName(
        q0.select(
            F.posexplode(scales).alias("k", "s"), "embedding"
        ).select(
            (F.lit(id_offset) + F.col("k")).cast("long").alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * F.col("s")).cast("float")
            ).alias("embedding"),
        )
    )


_PLANTED_SQL = """
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    copies AS (
      SELECT (1000000 + t.k)::BIGINT AS vec_id,
        list_transform(q.qv,
          x -> CAST(x * CAST(pow(2, t.k + 1) AS FLOAT) AS FLOAT)) AS embedding
      FROM q, range(10) t(k)
    ),
    all_v AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL SELECT vec_id, embedding FROM copies
    )
"""


@query(
    "embedding_near_dups_lsh",
    f"""
    WITH {_PLANTED_SQL}
    SELECT a.vec_id AS a, b.vec_id AS b
    FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
    """,
)
def embedding_near_dups_lsh(spark, sf_dir):
    """Embedding near-duplicate pairs (cosine >= 0.95) via the BUCKETED
    scale path: sign-LSH bucket assignment once per vector, candidate
    pairs only within buckets, exact cosine verify on candidates. The
    oracle brute-forces all pairs in SQL; the planted scaled copies (and
    any pair at cosine >= 0.95) provably share their source's bucket, so
    the bucketed plan finds exactly the oracle's pair set. Natural pairs
    in this corpus top out at ~0.6, far from the threshold."""
    from spider_engine_spark.operators.dedup import embedding_near_dups
    from spider_engine_spark.operators.similarity import make_planes

    emb = _scaled_copies(load(spark, sf_dir, "embeddings"))
    planes = make_planes(64, 8)
    pairs = embedding_near_dups(
        emb, "vec_id", "embedding", planes, threshold=0.95
    )
    return pairs.select("a", "b")


@query(
    "knn_brute",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, list_cosine_similarity(e.embedding, q.qv) AS c
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
    )
    SELECT vec_id, row_number() OVER (ORDER BY c DESC, vec_id ASC) AS rank
    FROM scored ORDER BY c DESC, vec_id ASC LIMIT 10
    """,
)
def knn_brute(spark, sf_dir):
    """Brute-force cosine top-10 neighbors of vec_id=0 (rank-only, see
    embedding_topk_pairs for why)."""
    from spider_engine_spark.operators.similarity import brute_force_topk

    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    top = brute_force_topk(
        emb.filter(F.col("vec_id") != 0), "vec_id", "embedding",
        list(qvec), k=10,
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("vec_id", "rank")


_ANN_ORACLE = f"""
    WITH {_PLANTED_SQL},
    scored AS (
      SELECT a.vec_id, list_cosine_similarity(a.embedding, q.qv) AS c
      FROM all_v a CROSS JOIN q WHERE a.vec_id <> 0
    )
    SELECT vec_id, row_number() OVER (ORDER BY c DESC, vec_id ASC) AS rank
    FROM scored ORDER BY c DESC, vec_id ASC LIMIT 10
"""


@query("ann_lsh", _ANN_ORACLE)
def ann_lsh(spark, sf_dir):
    """Sign-LSH bucketed ANN top-10 for vec_id=0: probes the query's
    bucket + hamming<=1 neighbor buckets only (the scale path — ~9/256
    buckets touched). Oracle-checkable because the ground-truth top-10
    are planted power-of-two scaled copies of the query vector: they sit
    in the query's own bucket BY CONSTRUCTION (sign bits are scale-
    invariant, exactly), so the probe provably achieves recall 1.0 and
    the result equals the SQL brute-force top-10. Recall on natural data
    is separately asserted in pytest (tests/test_dedup_similarity.py)."""
    from spider_engine_spark.operators.similarity import (
        ann_topk_lsh,
        lsh_bucket,
        make_planes,
    )

    emb = _scaled_copies(load(spark, sf_dir, "embeddings"))
    qvec = list(
        emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    )
    planes = make_planes(len(qvec), 8)
    bucketed = lsh_bucket(
        emb.filter(F.col("vec_id") != 0), "embedding", planes
    )
    top = ann_topk_lsh(bucketed, "vec_id", "embedding", qvec, planes, k=10)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("vec_id", "rank")


# ---------------------------------------------------------------------------
# Text analysis family
# ---------------------------------------------------------------------------


@query(
    "text_quality",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
      len(toks) AS n_tokens,
      list_sum(list_transform(toks, x -> len(x)))::DOUBLE / len(toks)
        AS avg_token_len,
      len(list_distinct(toks))::DOUBLE / len(toks) AS distinct_ratio,
      len(list_filter(toks, x -> x IN
        ('the','a','and','of','to','in','is','it')))::DOUBLE / len(toks)
        AS stopword_ratio
    FROM t WHERE len(toks) > 0
    """,
)
def text_quality(spark, sf_dir):
    """Per-document quality features (all JVM-native expressions)."""
    from spider_engine_spark.functions import text_analysis as ta

    docs = load(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.filter(ta.token_count(c) > 0).select(
        "doc_id",
        ta.token_count(c).cast("long").alias("n_tokens"),
        ta.avg_token_len(c).alias("avg_token_len"),
        ta.distinct_ratio(c).alias("distinct_ratio"),
        ta.stopword_ratio(c, "en").alias("stopword_ratio"),
    )


@query(
    "lang_id_counts",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    hits AS (
      SELECT doc_id, 'de' AS lang, len(list_filter(toks, x -> x IN
        ('der','die','das','und','ist','nicht','ein'))) AS h FROM t
      UNION ALL
      SELECT doc_id, 'en', len(list_filter(toks, x -> x IN
        ('the','a','and','of','to','in','is','it'))) FROM t
      UNION ALL
      SELECT doc_id, 'es', len(list_filter(toks, x -> x IN
        ('el','la','los','y','es','un','que'))) FROM t
      UNION ALL
      SELECT doc_id, 'fr', len(list_filter(toks, x -> x IN
        ('le','la','et','les','des','est','un'))) FROM t
    ), best AS (
      SELECT doc_id, lang, h,
        row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang ASC) rn
      FROM hits
    )
    SELECT CASE WHEN h > 0 THEN lang ELSE 'und' END AS lang_guess,
      count(*) AS n_docs
    FROM best WHERE rn = 1 GROUP BY lang_guess
    """,
)
def lang_id_counts(spark, sf_dir):
    """n-gram/stopword language-ID heuristic, aggregated per guess."""
    from spider_engine_spark.functions import text_analysis as ta

    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(ta.lang_guess(F.col("text")).alias("lang_guess"))
        .groupBy("lang_guess")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "doc_fingerprint",
    f"""
    WITH t AS (SELECT doc_id,
      list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
      FROM documents)
    SELECT doc_id,
      substring(md5(array_to_string(toks, ' ')), 1, 16) AS fingerprint
    FROM t
    """,
)
def doc_fingerprint(spark, sf_dir):
    """Content-defined document fingerprint (md5 of normalized tokens)."""
    from spider_engine_spark.functions import text_analysis as ta

    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", ta.fingerprint(F.col("text")).alias("fingerprint")
    )


@query(
    "token_count_by_source",
    f"""
    WITH t AS (SELECT source, {_TOKS} AS toks FROM documents)
    SELECT source, CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
      count(*) AS n_docs
    FROM t GROUP BY source
    """,
)
def token_count_by_source(spark, sf_dir):
    from spider_engine_spark.functions import text_analysis as ta

    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.sum(ta.token_count(F.col("text"))).alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Streaming / multimodal / frontier surfaces
# ---------------------------------------------------------------------------


@query(
    "streaming_hourly_window",
    """
    SELECT floor(epoch(date_trunc('hour', ts)))::BIGINT AS window_epoch,
      event_type, count(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY window_epoch, event_type
    """,
)
def streaming_hourly_window(spark, sf_dir):
    """The streaming watermarked tumbling-window rollup, evaluated on the
    static frame (batch/stream parity — same plan shape Structured
    Streaming runs incrementally)."""
    from spider_engine_spark.streaming.ingest import windowed_event_counts

    out = windowed_event_counts(load(spark, sf_dir, "events"))
    return out.select(
        ntz_epoch("window_start").alias("window_epoch"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query("streaming_neardup_pairs", _BRUTE_NEARDUP_SQL)
def streaming_neardup_pairs(spark, sf_dir):
    """INCREMENTAL near-dup detection: documents hash-split into 4
    micro-batches and folded through the REAL foreachBatch handler
    (streaming/neardup.py — the exact code path Structured Streaming
    drives; pytest additionally runs the true readStream/availableNow
    integration with maxFilesPerTrigger=1).  Each batch probes the
    persisted band-bucket state accumulated by earlier batches, so the
    union of emitted candidates equals the batch LSH candidate set for
    ANY batch split (the module's completeness invariant); jaccard
    verification >= 0.8 on those candidates then provably equals
    dedup_minhash_lsh's output — and the oracle is the same brute-force
    scan.  A batch-vs-streaming parity check through the driver's hash
    gate, over real cross-batch state."""
    import tempfile

    from spider_engine_spark.operators.dedup import jaccard_verify
    from spider_engine_spark.sources.tableio import TableIO
    from spider_engine_spark.streaming.neardup import (
        make_neardup_batch_handler,
    )

    import shutil

    docs = load(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="drv_neardup_")
    io = TableIO(root)
    handler = make_neardup_batch_handler(io, "doc_id", "text", k=16, bands=8)
    try:
        for i in range(4):
            handler(docs.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i), i)
        # pin the (tiny) pair set, then delete the temp state so
        # repeated driver runs don't accumulate dirs under /tmp —
        # finally: a mid-loop Spark failure must not leak the root
        pairs = io.read(spark, "pairs").localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return jaccard_verify(pairs, docs, "doc_id", "text", n=3).filter(
        F.col("jaccard") >= 0.8
    )


@query(
    "multimodal_decode",
    """
    WITH h AS (
      SELECT doc_id,
        ('0x' || substring(md5(doc_id::VARCHAR), 1, 2))::INTEGER AS h0,
        ('0x' || substring(md5(doc_id::VARCHAR), 3, 2))::INTEGER AS h1
      FROM documents
    )
    SELECT
      CASE h1 % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
        AS kind,
      count(*) AS n_docs,
      count(*) AS n_ok,
      CAST(sum(256 + h0 * 16) AS BIGINT) AS total_bytes
    FROM h GROUP BY kind
    """,
)
def multimodal_decode(spark, sf_dir):
    """Binary media columns + metadata -> mapInPandas decode kernel ->
    per-kind stats. The synthetic payloads are md5-derived (repeated
    md5(doc_id) blocks, length 256 + h0*16, kind from h1 % 3), so the
    oracle recomputes every stat from doc_id alone in SQL while the
    Spark side actually round-trips the binary payload through Arrow
    and validates its leading md5 block (n_ok) and measured byte length
    (total_bytes) — a genuine end-to-end check of the binary plumbing."""
    from spider_engine_spark.operators.multimodal import (
        decode_media,
        synth_media,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    media = synth_media(docs)
    feats = decode_media(media, dim=8)
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("decode_ok").cast("long")).alias("n_ok"),
        F.sum(F.col("n_bytes").cast("long")).alias("total_bytes"),
    )


def _frontier_crawl_oracle() -> str:
    """Independent fixture: the single-threaded pure-Python replay
    simulator (simulator.py — no Spark anywhere in it) runs the SAME
    seeds/config and its per-step fetch sets are inlined as VALUES. This
    is the north_rule's replay-equality check surfaced to the driver's
    hash gate: the distributed scheduler must reproduce the reference
    ordering bit-for-bit."""
    from spider_engine_spark import webmodel as wm
    from spider_engine_spark.simulator import ReplaySimulator

    sim = ReplaySimulator(wm.seed_urls(20))
    sim.run(2)
    rows = []
    for step in sorted(sim.fetched_by_step):
        rows += [(u, step) for u in sim.fetched_by_step[step]]
    vals = ", ".join(f"('{u}', {s})" for u, s in rows)
    return f"SELECT url, step FROM (VALUES {vals}) AS t(url, step)"


@query("frontier_crawl", _frontier_crawl_oracle)
def frontier_crawl(spark, sf_dir):
    """Two supersteps of the URL-frontier scheduler on the deterministic
    synthetic web; returns the per-step fetch sets (url, step). The
    oracle is the pure-Python replay simulator's fetch sets inlined as a
    VALUES fixture (see _frontier_crawl_oracle); tests/test_frontier.py
    additionally asserts seen-set and frontier equality."""
    import tempfile

    from spider_engine_spark import webmodel as wm
    from spider_engine_spark.operators.frontier import CrawlJob

    import shutil

    root = tempfile.mkdtemp(prefix="drv_crawl_")
    job = CrawlJob(
        spark, root, seeds=wm.seed_urls(20), num_shards=4, salts=2,
        index=False,
    )
    job.run(2)
    docs = job.io.read(spark, "docs")
    # pin the (small) fetch sets, then delete the temp crawl state so
    # repeated driver runs don't accumulate dirs under /tmp
    out = docs.select(
        F.col("doc_id").alias("url"), F.col("fetch_step").alias("step")
    ).orderBy("step", "url").localCheckpoint()
    shutil.rmtree(root, ignore_errors=True)
    return out


def _spans_oracle() -> str:
    """Independent fixture: webmodel.make_doc evaluated driver-side in
    pure Python over the same 50 seeds, every span inlined as VALUES —
    the input_hint's per-row span-sequence equality (kind, text via
    media_ref/order) checked through the driver's hash gate."""
    from spider_engine_spark import webmodel as wm

    rows = []
    for u in wm.seed_urls(50):
        doc = wm.make_doc(u)
        for s in doc["spans"]:
            rows.append(
                (doc["doc_id"], s["offset"], s["kind"], s["media_ref"])
            )
    vals = ", ".join(
        f"('{d}', {o}, '{k}', '{m}')" for d, o, k, m in rows
    )
    return (
        'SELECT doc_id, "offset", kind, media_ref FROM '
        f'(VALUES {vals}) AS t(doc_id, "offset", kind, media_ref)'
    )


@query("interleaved_spans_roundtrip", _spans_oracle)
def interleaved_spans_roundtrip(spark, sf_dir):
    """input_hint invariant surface: fetch-simulated interleaved docs
    (mapInPandas over a distributed seed frame), exploded back to
    (doc_id, offset, kind, media_ref). The oracle is the pure-Python
    webmodel evaluated driver-side and inlined as VALUES — span sequence
    and order must round-trip through Arrow bit-for-bit."""
    from spider_engine_spark import webmodel as wm
    from spider_engine_spark.operators.frontier import fetch_docs

    seeds = spark.createDataFrame(
        [(u,) for u in wm.seed_urls(50)], "url string"
    )
    docs = fetch_docs(seeds, 0)
    return docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.media_ref").alias("media_ref"),
    )


# ---------------------------------------------------------------------------
# Batch 3: multi-term AND, grouping sets, as-of join, percentiles, range join
# ---------------------------------------------------------------------------


@query(
    "search_bm25",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    ad AS (SELECT sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl FROM dl),
    tf AS (SELECT doc_id, count(*) AS tf FROM tok
           WHERE term = 'spark' GROUP BY doc_id)
    SELECT tf.doc_id, tf.tf::BIGINT AS tf, dl.dl::BIGINT AS dl,
      (tf.tf * 2.2::DOUBLE)
        / (tf.tf + 1.2::DOUBLE
            * (0.25::DOUBLE + 0.75::DOUBLE * (dl.dl / ad.avgdl))) AS score
    FROM tf JOIN dl USING (doc_id) CROSS JOIN ad
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def search_bm25(spark, sf_dir):
    """Okapi BM25 ranking for a single query term — the reference's own
    TODO #2 asks for ranking beyond TF-IDF (README.md:271-272); this is
    the Spark-side answer, hash-gate exact by construction: with one
    term the idf factor is a per-query constant and is omitted, so the
    score is the RATIONAL saturation/length-normalization core
    tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) — BIGINT counts and IEEE
    multiply/divide only, the identical expression tree on both
    engines, no transcendental whose last-ulp rounding could differ
    (1.2+1.0 == 2.2 and 1.0-0.75 == 0.25 exactly in doubles, so the
    literals match too)."""
    from spider_engine_spark.operators.search import bm25_single_term

    return bm25_single_term(
        load(spark, sf_dir, "documents", fan_out=False),
        "doc_id", "text", "spark",
        k1=1.2, b=0.75, size=20,
    )


@query(
    "search_bm25_multi",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
    per AS (
      SELECT doc_id, count(*) AS dl,
        count(*) FILTER (WHERE term = 'spark') AS tf0,
        count(*) FILTER (WHERE term = 'vector') AS tf1
      FROM tok GROUP BY doc_id
    ),
    st AS (
      SELECT sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl,
        count(*) AS n,
        count(*) FILTER (WHERE tf0 > 0) AS df0,
        count(*) FILTER (WHERE tf1 > 0) AS df1
      FROM per
    )
    SELECT doc_id, dl::BIGINT AS dl,
      tf0::BIGINT AS tf_0, tf1::BIGINT AS tf_1,
      ((n - df0 + 0.5::DOUBLE) / (df0 + 0.5::DOUBLE))
        * ((tf0 * 2.2::DOUBLE)
           / (tf0 + 1.2::DOUBLE
              * (0.25::DOUBLE + 0.75::DOUBLE * (dl / st.avgdl))))
      + ((n - df1 + 0.5::DOUBLE) / (df1 + 0.5::DOUBLE))
        * ((tf1 * 2.2::DOUBLE)
           / (tf1 + 1.2::DOUBLE
              * (0.25::DOUBLE + 0.75::DOUBLE * (dl / st.avgdl))))
      AS score
    FROM per CROSS JOIN st
    WHERE tf0 > 0 OR tf1 > 0
    ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def search_bm25_multi(spark, sf_dir):
    """Multi-term Okapi BM25 with per-term RATIONAL idf (odds ratio
    without the log — monotone per term; the engine's documented
    cross-term weighting law), summed over the query terms in list
    order as ONE fixed expression tree.  Hash-gate exact: idf adds one
    IEEE divide of (count±0.5) operands per term, a zero-tf term
    contributes exactly +0.0 (0/positive, then *idf, then +x are all
    exact), and the oracle spells the identical tree with ::DOUBLE
    folded literals (1.2+1.0 == 2.2, 1.0-0.75 == 0.25 exactly).  This
    closes the reference's TODO #2 (README.md:271-272) for multi-term
    queries; operators/search.bm25_rank has the plan shape."""
    from spider_engine_spark.operators.search import bm25_rank

    return bm25_rank(
        load(spark, sf_dir, "documents", fan_out=False), "doc_id", "text",
        ["spark", "vector"], k1=1.2, b=0.75, size=20,
    )


@query(
    "search_multi_term_and",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tok2 AS (
      SELECT doc_id, term FROM toks WHERE term <> ''
    ), per_doc AS (
      SELECT doc_id, count(*) AS total FROM tok2 GROUP BY doc_id
    ), per_term AS (
      SELECT doc_id, term, count(*) AS cnt FROM tok2
      WHERE term IN ('spark', 'vector') GROUP BY doc_id, term
    ), weighted AS (
      SELECT p.doc_id, p.term,
        trunc((p.cnt::FLOAT / d.total::FLOAT) * 10000::FLOAT)::BIGINT AS w
      FROM per_term p JOIN per_doc d USING (doc_id)
    )
    SELECT doc_id, CAST(sum(w) AS BIGINT) AS sum_weight
    FROM weighted GROUP BY doc_id HAVING count(DISTINCT term) = 2
    """,
)
def search_multi_term_and(spark, sf_dir):
    """Multi-term AND (the reference's legacy posting-intersection,
    search/search.go:228-261) as a pruned-probe union + groupBy-HAVING."""
    from spider_engine_spark.operators.postings import multi_term_and

    docs = load(spark, sf_dir, "documents")
    postings = build_postings_native(docs, "doc_id", "text")
    return multi_term_and(postings, "text", ["spark", "vector"])


@query(
    "search_multi_term_or",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tok2 AS (
      SELECT doc_id, term FROM toks WHERE term <> ''
    ), per_doc AS (
      SELECT doc_id, count(*) AS total FROM tok2 GROUP BY doc_id
    ), per_term AS (
      SELECT doc_id, term, count(*) AS cnt FROM tok2
      WHERE term IN ('spark', 'vector') GROUP BY doc_id, term
    ), weighted AS (
      SELECT p.doc_id, p.term,
        trunc((p.cnt::FLOAT / d.total::FLOAT) * 10000::FLOAT)::BIGINT AS w
      FROM per_term p JOIN per_doc d USING (doc_id)
    ), dfs AS (
      SELECT term, count(*) AS df FROM weighted GROUP BY term
    ), scored AS (
      SELECT w.doc_id,
        trunc(w.w / 10000.0
              * log10((SELECT count(*) FROM documents)::DOUBLE / f.df::DOUBLE)
              * 1000.0)::BIGINT AS s
      FROM weighted w JOIN dfs f USING (term)
    )
    SELECT doc_id, count(*) AS n_terms, CAST(sum(s) AS BIGINT) AS score
    FROM scored GROUP BY doc_id
    """,
)
def search_multi_term_or(spark, sf_dir):
    """Scored multi-term OR (the reference's legacy idf-accumulating
    multi-query loop, search/search.go:263-320) as a pruned-probe union +
    one groupBy(doc_id) sum of per-term TF-IDF."""
    from spider_engine_spark.operators.postings import multi_term_or

    docs = load(spark, sf_dir, "documents")
    postings = build_postings_native(docs, "doc_id", "text")
    return multi_term_or(
        postings, "text", ["spark", "vector"], max_doc=docs.count()
    )


@query(
    "rollup_lang_source",
    """
    SELECT lang, source, count(*) AS n_docs,
      CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS sum_chars
    FROM documents GROUP BY ROLLUP (lang, source)
    """,
)
def rollup_lang_source(spark, sf_dir):
    """Grouping sets / rollup (operator class the reference lacks)."""
    docs = load(spark, sf_dir, "documents")
    return docs.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        _dsum(F.col("n_chars"), "sum_chars"),
    )


@query(
    "asof_join_latest_order",
    """
    WITH pairs AS (
      SELECT e.event_id, o.o_orderkey, o.o_totalprice,
        row_number() OVER (
          PARTITION BY e.event_id
          ORDER BY o.o_orderdate DESC, o.o_orderkey ASC) AS rn
      FROM events e
      JOIN orders o
        ON o.o_custkey = e.user_id + 1
       AND o.o_orderdate <= e.ts
    )
    SELECT event_id, o_orderkey AS latest_orderkey,
      o_totalprice AS latest_totalprice
    FROM pairs WHERE rn = 1
    """,
)
def asof_join_latest_order(spark, sf_dir):
    """As-of join: each event matched to the customer's latest order at
    event time — inequality join + per-key top-1 (at scale: bucket both
    sides by key, sort-merge within buckets).

    The top-1 is a max_by aggregation, not a window: max_by is
    partially aggregable, so each map partition reduces its join
    output to one row per event BEFORE the shuffle, where the window
    form shuffled and sorted every joined pair row. The ordering law is
    identical — max over (o_orderdate, -o_orderkey) == first row under
    (o_orderdate DESC, o_orderkey ASC), and o_orderkey is unique so
    there are no ties."""
    e = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    joined = e.join(
        o,
        (o.o_custkey == e.user_id + 1) & (o.o_orderdate <= e.ts),
    )
    return (
        joined.groupBy("event_id")
        .agg(
            F.max_by(
                F.struct("o_orderkey", "o_totalprice"),
                F.struct(
                    F.col("o_orderdate").alias("d"),
                    (-F.col("o_orderkey")).alias("nk"),
                ),
            ).alias("_m")
        )
        .select(
            "event_id",
            F.col("_m.o_orderkey").alias("latest_orderkey"),
            F.col("_m.o_totalprice").alias("latest_totalprice"),
        )
    )


@query(
    "value_percentiles",
    """
    SELECT event_type,
      quantile_cont(value, 0.5) AS p50,
      quantile_cont(value, 0.9) AS p90
    FROM events GROUP BY event_type
    """,
)
def value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (both engines use the
    same linear-interpolation definition)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
    )


@query(
    "range_join_value_buckets",
    """
    WITH buckets AS (
      SELECT (i * 5.0)::DOUBLE AS lo, ((i + 1) * 5.0)::DOUBLE AS hi
      FROM range(0, 20) t(i)
    )
    SELECT b.lo AS bucket_lo, count(e.event_id) AS n_events
    FROM buckets b LEFT JOIN events e
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.lo
    """,
)
def range_join_value_buckets(spark, sf_dir):
    """Range join of events against value buckets (small side broadcast;
    Spark turns the inequality join into BroadcastNestedLoop)."""
    e = load(spark, sf_dir, "events")
    buckets = spark.range(0, 20).select(
        (F.col("id") * 5.0).alias("lo"), ((F.col("id") + 1) * 5.0).alias("hi")
    )
    return (
        F.broadcast(buckets)
        .join(e, (e.value >= F.col("lo")) & (e.value < F.col("hi")), "left")
        .groupBy(F.col("lo").alias("bucket_lo"))
        .agg(F.count("event_id").alias("n_events"))
    )


@query("ann_ivf", _ANN_ORACLE)
def ann_ivf(spark, sf_dir):
    """IVF-bucketed ANN top-10 for vec_id=0: nearest-centroid inverted
    lists, n_probe=3 of 16 — the second scale path beside sign-LSH.
    Oracle-checkable by the same planted-copy construction as ann_lsh:
    IVF assignment is argmax of cosine vs the centroids and cosine is
    exactly scale-invariant, so every copy lands in the query vector's
    own nearest-centroid list, which n_probe >= 1 provably scans — for
    ANY centroid set, which is why the quantizer can be the real
    distributed Lloyd k-means (deterministic seed + exact per-list means)
    rather than the raw first-n seed without weakening the oracle."""
    from spider_engine_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        kmeans_centroids,
    )

    natural = load(spark, sf_dir, "embeddings")
    emb = _scaled_copies(natural)
    qvec = list(
        emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    )
    cents = kmeans_centroids(natural, "vec_id", "embedding", 16, iters=2)
    assigned = ivf_assign(
        emb.filter(F.col("vec_id") != 0), "vec_id", "embedding", cents
    )
    top = ivf_topk(
        assigned, "vec_id", "embedding", qvec, cents, k=10, n_probe=3
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("vec_id", "rank")


# ---------------------------------------------------------------------------
# Filter-semantics parity queries (the reference's quirky predicate set)
# ---------------------------------------------------------------------------


@query(
    "filters_all_ops",
    """
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE n_chars >= 150            -- reference '>' evaluates >=
      AND n_chars <= 450            -- reference '<' evaluates <=
      AND n_chars <> 200
      AND lang IN ('en', 'fr', 'de')
      AND source NOT IN ('src0', 'src1')
      AND starts_with(source, 'src')
      AND contains(text, 'spark')
    """,
)
def filters_all_ops(spark, sf_dir):
    """Q5 predicate set over the forward index: numeric >=/<=//!=/in plus
    string not-in/prefix/contain, AND-folded exactly as
    forwardindex.go:564-644 evaluates them."""
    from spider_engine_spark.operators.search import (
        SearchFilter,
        and_filters,
    )

    docs = load(spark, sf_dir, "documents")
    cond = and_filters(
        docs,
        [
            SearchFilter("n_chars", ">", value=150),
            SearchFilter("n_chars", "<", value=450),
            SearchFilter("n_chars", "!=", value=200),
            SearchFilter("lang", "in", values=["en", "fr", "de"]),
            SearchFilter("source", "not in", values=["src0", "src1"]),
            SearchFilter("source", "prefix", value="src"),
            SearchFilter("text", "contain", value="spark"),
        ],
        numeric_fields={"n_chars"},
    )
    return docs.filter(cond).select("doc_id", "lang", "source", "n_chars")


@query(
    "filter_sentinel_semantics",
    f"""
    WITH t AS (
      SELECT doc_id,
        CASE WHEN doc_id % 7 = 0 THEN {(1 << 63) - 1} ELSE n_chars END AS v
      FROM documents
    )
    SELECT
      (SELECT count(*) FROM t
        WHERE (v & {(1 << 63) - 1}) <> {(1 << 63) - 1} AND v >= 0)
        AS n_match_ge,
      (SELECT count(*) FROM t
        WHERE v IS NOT NULL AND NOT (
          (v & {(1 << 63) - 1}) <> {(1 << 63) - 1} AND v IN (99999)))
        AS n_pass_not_in
    """,
)
def filter_sentinel_semantics(spark, sf_dir):
    """The MaxInt64 sentinel rules (forwardindex.go:580-607): sentinel
    rows are excluded from every numeric match EXCEPT 'not in', where the
    in-loop guard lets them pass. Every 7th doc gets the sentinel; the
    counts expose both semantics."""
    from spider_engine_spark.operators.search import (
        MAX_INT64,
        SearchFilter,
        filter_condition,
    )

    docs = load(spark, sf_dir, "documents").withColumn(
        "v",
        F.when(F.col("doc_id") % 7 == 0, F.lit(MAX_INT64)).otherwise(
            F.col("n_chars")
        ),
    )
    ge = docs.filter(filter_condition(SearchFilter("v", ">", value=0), True))
    ni = docs.filter(
        filter_condition(SearchFilter("v", "not in", values=[99999]), True)
    )
    return ge.agg(F.count(F.lit(1)).alias("n_match_ge")).crossJoin(
        ni.agg(F.count(F.lit(1)).alias("n_pass_not_in"))
    )


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLE_CTES}, e AS (
      SELECT doc_id, unnest(sh) AS shingle FROM s
    ), cold AS (  -- the engine's max_df=20 hot-shingle candidate cap
      SELECT shingle FROM e GROUP BY shingle HAVING count(*) <= 20
    ), cand AS (
      SELECT DISTINCT ea.doc_id AS a, eb.doc_id AS b
      FROM e ea
      JOIN cold c ON ea.shingle = c.shingle
      JOIN e eb ON eb.shingle = ea.shingle AND ea.doc_id < eb.doc_id
      UNION
      SELECT sa.doc_id, sb.doc_id  -- identical-set recovery path
      FROM s sa JOIN s sb
        ON sa.doc_id < sb.doc_id
       AND list_sort(sa.sh) = list_sort(sb.sh)
    )
    SELECT cand.a, cand.b,
      len(list_intersect(sa.sh, sb.sh))::DOUBLE
        / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
    FROM cand
    JOIN s sa ON sa.doc_id = cand.a
    JOIN s sb ON sb.doc_id = cand.b
    WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
        / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram-Jaccard near-dup pairs: candidates from a shared-
    shingle equi-join with a hot-shingle frequency cap (max_df=20 —
    a boilerplate shingle shared by k docs would otherwise emit k^2
    candidate rows) plus an identical-shingle-set recovery join, verified
    exactly. The oracle models the SAME candidate rule (cold-shingle
    overlap OR identical sets), so a corpus where a >=0.8 pair overlaps
    only on hot shingles fails ON BOTH SIDES identically instead of
    silently diverging. The non-probabilistic sibling of
    dedup_minhash_lsh — same verification, candidate generation differs."""
    from spider_engine_spark.operators.dedup import (
        jaccard_verify,
        shared_shingle_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = shared_shingle_pairs(docs, "doc_id", "text", n=3, max_df=20)
    return jaccard_verify(pairs, docs, "doc_id", "text", n=3).filter(
        F.col("jaccard") >= 0.8
    )


@query(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_SHINGLE_CTES}, pairs AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
    ), und AS (
      SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
    ), reach(n, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.n, und.v FROM reach JOIN und ON reach.r = und.u
    ), comp AS (
      SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n
    )
    SELECT doc_id, cluster_id,
      count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
      doc_id = cluster_id AS is_canonical
    FROM comp
    """,
)
def dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERING — the capstone the pair generators feed:
    minhash-LSH candidates verified at jaccard >= 0.8 become edges;
    connected components (min-label propagation + pointer jumping,
    operators/dedup.py:connected_components) assign every document a
    cluster whose id is the MIN doc_id in the component — the canonical
    row a dedup pass keeps (is_canonical flags it; singletons are their
    own cluster).  The oracle recomputes the same pairs brute-force and
    closes them with a recursive CTE — transitive-closure min per node
    — so the clustering law itself is verified, not just the pairs.
    At 100 TB: O(log diameter) rounds of two-shuffle label updates;
    near-dup clusters are stars/cliques so 1-2 rounds in practice."""
    from spider_engine_spark.operators.dedup import (
        connected_components,
        jaccard_verify,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    docs = load(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text", k=16, n=3)
    cand = minhash_lsh_pairs(sigs, "doc_id", bands=8)
    pairs = (
        jaccard_verify(cand, docs, "doc_id", "text", n=3)
        .filter(F.col("jaccard") >= 0.8)
        .select("a", "b")
    )
    comp = connected_components(
        pairs, nodes=docs.select(F.col("doc_id").alias("node"))
    )
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "comp").select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        "cluster_size",
        (F.col("node") == F.col("comp")).alias("is_canonical"),
    )


@query(
    "dedup_exact_substrings",
    r"""
    WITH t AS (
      SELECT doc_id,
        coalesce(list_filter(string_split_regex(text, '\s+'),
                             x -> x <> ''), []) AS toks
      FROM documents
    ), occ AS (
      SELECT doc_id, unnest(range(0, greatest(len(toks) - 8 + 1, 0)))
        AS pos, toks
      FROM t
    ), h AS (
      SELECT doc_id, pos,
        ('0x' || substring(md5(array_to_string(toks[pos+1:pos+8], ' ')),
         1, 15))::BIGINT AS g1,
        ('0x' || substring(md5(array_to_string(toks[pos+1:pos+8], ' ')),
         16, 15))::BIGINT AS g2,
        doc_id * 1048576 + pos AS packed
      FROM occ
    ), dup AS (
      SELECT g1, g2, min(packed) AS first FROM h GROUP BY g1, g2
      HAVING count(*) > 1
    ), removed AS (
      SELECT doc_id, list_sort(list(pos)) AS starts
      FROM h JOIN dup USING (g1, g2) WHERE packed <> first
      GROUP BY doc_id
    )
    SELECT d.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      CAST(CASE WHEN starts IS NOT NULL THEN
        len(list_filter(range(0, len(toks)),
            i -> len(list_filter(starts, s -> s <= i AND i < s + 8)) = 0))
        ELSE len(toks) END AS BIGINT) AS n_kept,
      CASE WHEN starts IS NOT NULL THEN
        coalesce(array_to_string(list_transform(
          list_filter(range(0, len(toks)),
            i -> len(list_filter(starts, s -> s <= i AND i < s + 8)) = 0),
          i -> toks[i+1]), ' '), '')
        ELSE d.text END AS text_dedup
    FROM documents d
    JOIN t USING (doc_id)
    LEFT JOIN removed USING (doc_id)
    """,
)
def dedup_exact_substrings(spark, sf_dir):
    """Exact substring (n-token span) dedup — the ExactSubstr law of
    Lee et al. 2021 distributed as relational algebra: every occurrence
    of any 8-token window appearing >1 time in the corpus is removed
    except the (doc_id,pos)-min one; kept tokens re-joined.  The oracle
    rebuilds the FULL deduped string per document (hash-gates the
    removal law, the first-occurrence law and the rebuild order
    corpus-wide), via the same 120-bit md5 window ids and packed
    (doc_id,pos) ordering.  operators/dedup.exact_substring_dedup has
    the 100 TB plan shape (one posexplode ~= one row per corpus token,
    one gram groupBy, duplicated-occurrences-only join back)."""
    from spider_engine_spark.operators.dedup import exact_substring_dedup

    docs = load(spark, sf_dir, "documents")
    return exact_substring_dedup(docs, "doc_id", "text", n=8)


@query(
    "token_rarity_scores",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
    tc AS (SELECT doc_id, term, count(*) AS cnt FROM tok
           GROUP BY doc_id, term),
    lm AS (SELECT term, count(*) AS df_ FROM tok GROUP BY term),
    per_doc AS (
      SELECT tc.doc_id, sum(cnt)::BIGINT AS n_tokens,
             sum(cnt * df_)::BIGINT AS sum_df
      FROM tc JOIN lm USING (term) GROUP BY tc.doc_id
    )
    SELECT d.doc_id,
      coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
      coalesce(p.sum_df, 0)::BIGINT AS sum_df,
      p.sum_df::DOUBLE / p.n_tokens::DOUBLE AS avg_df
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def token_rarity_scores(spark, sf_dir):
    """CCNet-style unigram-LM quality scoring, integer-exact: per doc
    the corpus-frequency mass of its tokens (sum_df = sum over token
    occurrences of that token's corpus count; avg_df = sum_df/n_tokens —
    the monotone core of unigram perplexity, kept log-free so BIGINT
    sums + one IEEE division stay bit-exact across engines and the full
    values sit behind the hash gate).  Plan: one token explode feeds
    both the per-doc term counts and the vocabulary counts; the vocab
    is broadcast into the per-doc join (functions/text_analysis.py:
    token_rarity for the 100 TB notes)."""
    from spider_engine_spark.functions.text_analysis import token_rarity

    return token_rarity(load(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "set_ops_docs",
    """
    WITH en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
    big AS (SELECT doc_id FROM documents WHERE n_chars >= 300)
    SELECT 'intersect' AS op, count(*) AS n FROM (
      SELECT doc_id FROM en INTERSECT SELECT doc_id FROM big)
    UNION ALL
    SELECT 'except', count(*) FROM (
      SELECT doc_id FROM en EXCEPT SELECT doc_id FROM big)
    UNION ALL
    SELECT 'union', count(*) FROM (
      SELECT doc_id FROM en UNION SELECT doc_id FROM big)
    """,
)
def set_ops_docs(spark, sf_dir):
    """Set operators (INTERSECT/EXCEPT/UNION-distinct) — an operator
    class the reference lacks entirely (SURVEY.md §2.8)."""
    docs = load(spark, sf_dir, "documents")
    en = docs.filter(F.col("lang") == "en").select("doc_id")
    big = docs.filter(F.col("n_chars") >= 300).select("doc_id")
    rows = [
        en.intersect(big).agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("intersect").alias("op"), "n"
        ),
        en.exceptAll(big).distinct().agg(
            F.count(F.lit(1)).alias("n")
        ).select(F.lit("except").alias("op"), "n"),
        en.union(big).distinct().agg(F.count(F.lit(1)).alias("n")).select(
            F.lit("union").alias("op"), "n"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@query(
    "pivot_event_types",
    """
    SELECT user_id % 10 AS user_bucket,
      count(*) FILTER (WHERE event_type = 'click') AS n_click,
      count(*) FILTER (WHERE event_type = 'view') AS n_view,
      count(*) FILTER (WHERE event_type = 'error') AS n_error
    FROM events GROUP BY user_bucket
    """,
)
def pivot_event_types(spark, sf_dir):
    """Pivot/crosstab by event type (conditional aggregation — the
    portable form of df.groupBy().pivot())."""
    e = load(spark, sf_dir, "events")
    return e.groupBy((F.col("user_id") % 10).alias("user_bucket")).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
    )


# ---------------------------------------------------------------------------
# Batch 4 (round 2): more relational/semi-structured/multimodal surface
# ---------------------------------------------------------------------------


@query(
    "tpch_q6",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
           AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.04 AND l_discount <= 0.06
      AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf_dir):
    """Forecast-revenue scan: pure filter + global agg. The whole query is
    a single parquet scan with every predicate pushed down (PLANS.md) —
    no shuffle except the 1-row partial-agg exchange."""
    li = load(spark, sf_dir, "lineitem")
    lo = F.to_timestamp_ntz(F.lit("1996-01-01"))
    hi = F.to_timestamp_ntz(F.lit("1997-01-01"))
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(_DEC6)
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "events_lead_lag",
    """
    WITH w AS (
      SELECT user_id, event_id, value,
        lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_value,
        floor(epoch(ts))::BIGINT
          - lag(floor(epoch(ts))::BIGINT)
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_sec
      FROM events
    )
    SELECT user_id, event_id, value - prev_value AS dvalue, gap_sec
    FROM w WHERE prev_value IS NOT NULL
    """,
)
def events_lead_lag(spark, sf_dir):
    """lead/lag window operators: per-user deltas between consecutive
    events (value delta + inter-event gap). Partitioned window — scales
    by user key."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = ntz_epoch("ts")
    out = e.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("dvalue"),
        (epoch - F.lag(epoch).over(w)).alias("gap_sec"),
        F.lag("value").over(w).alias("_prev"),
    )
    return out.filter(F.col("_prev").isNotNull()).drop("_prev")


@query(
    "window_ntile_users",
    """
    WITH u AS (
      SELECT user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY user_id
    )
    SELECT user_id, total,
      ntile(4) OVER (ORDER BY total DESC, user_id ASC) AS quartile
    FROM u
    """,
)
def window_ntile_users(spark, sf_dir):
    """NTILE bucketing of users by total event value — via the
    DISTRIBUTED exact ntile (operators/ranking.py): |users| grows with
    the corpus, so a global no-partition window (one task for every
    user row) is a scale funnel even post-aggregation. The range
    shuffle + per-partition rank + offset form is bit-identical to the
    window (and the DuckDB oracle); the counts collect is O(shuffle
    partitions). Like dedup_clusters, the result rides a pinned
    localCheckpoint (released with the session)."""
    from spider_engine_spark.operators.ranking import distributed_ntile

    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(_dsum(F.col("value"), "total"))
    return distributed_ntile(
        u, 4, [F.desc("total"), F.asc("user_id")], out="quartile"
    ).select("user_id", "total", "quartile")


@query(
    "json_props_topk",
    """
    SELECT (props->>'k')::BIGINT AS k, count(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY k ORDER BY n_events DESC, k ASC LIMIT 20
    """,
)
def json_props_topk(spark, sf_dir):
    """Semi-structured surface: JSON path extraction from the events
    props column (get_json_object — JVM-side, codegen) + agg + top-k."""
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.get_json_object("props", "$.k").cast("long").alias("k"),
            "value",
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value"), "sum_value"),
        )
        .orderBy(F.desc("n_events"), F.asc("k"))
        .limit(20)
    )


@query(
    "frame_sample_stats",
    """
    WITH h AS (
      SELECT doc_id,
        ('0x' || substring(md5(doc_id::VARCHAR), 3, 2))::INTEGER AS h1,
        ('0x' || substring(md5(doc_id::VARCHAR), 9, 2))::INTEGER AS h4
      FROM documents
    ), vids AS (
      SELECT doc_id, greatest((h4 * 100) // 1000 - 1, 0) + 1 AS n_frames
      FROM h WHERE h1 % 3 = 2
    )
    SELECT count(*) AS n_videos,
      CAST(sum(n_frames) AS BIGINT) AS total_frames,
      CAST(max((n_frames - 1) * 1000) AS BIGINT) AS max_ts_ms
    FROM vids
    """,
)
def frame_sample_stats(spark, sf_dir):
    """Multimodal frame sampling: synth video payloads -> frame_sample
    (sequence-explode over duration metadata) -> corpus stats. The
    oracle recomputes frame counts from the md5-derived duration field
    while Spark actually explodes per-frame rows."""
    from spider_engine_spark.operators.multimodal import (
        frame_sample,
        synth_media,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    frames = frame_sample(synth_media(docs), every_ms=1000)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nf"), F.max("ts_ms").alias("mt")
    ).agg(
        F.count(F.lit(1)).alias("n_videos"),
        F.sum("nf").alias("total_frames"),
        F.max("mt").cast("long").alias("max_ts_ms"),
    )


@query(
    "tpch_q4_semijoin",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_semijoin(spark, sf_dir):
    """EXISTS-style LEFT SEMI join (TPC-H q4 shape, adapted to the
    available lineitem columns: orders with at least one line shipped
    after the order date). The semi join shuffles on orderkey only and
    short-circuits per probe row."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    lo = F.to_timestamp_ntz(F.lit("1997-01-01"))
    hi = F.to_timestamp_ntz(F.lit("1998-01-01"))
    sel = o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    hit = sel.join(
        li,
        (li.l_orderkey == sel.o_orderkey)
        & (li.l_shipdate > sel.o_orderdate),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "tpch_q14_promo",
    """
    SELECT
      CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
        THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
        ELSE 0 END) AS DOUBLE) AS promo_revenue,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
        AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-07-01'
    """,
)
def tpch_q14_promo(spark, sf_dir):
    """Promotion-revenue share (TPC-H q14 shape): broadcast dim join +
    conditional aggregation. Ratio left un-divided so the compare stays
    order-independent (decimal sums)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    lo = F.to_timestamp_ntz(F.lit("1996-01-01"))
    hi = F.to_timestamp_ntz(F.lit("1996-07-01"))
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC6)
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type").like("PROMO%"), disc).otherwise(
                    F.lit(0).cast(_DEC6)
                )
            )
            .cast("double")
            .alias("promo_revenue"),
            F.sum(disc).cast("double").alias("total_revenue"),
        )
    )


@query(
    "regex_priority_codes",
    """
    SELECT regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS code,
      count(*) AS n_orders
    FROM orders GROUP BY code ORDER BY code
    """,
)
def regex_priority_codes(spark, sf_dir):
    """String/regex surface: regexp_extract of the numeric priority code
    (JVM regex, identical semantics in DuckDB)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            F.regexp_extract("o_orderpriority", r"^([0-9]+)", 1).alias(
                "code"
            )
        )
        .groupBy("code")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("code")
    )


@query(
    "bpe_token_count_by_lang",
    """
    SELECT lang,
      CAST(sum(len(regexp_extract_all(text,
        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))) AS BIGINT) AS total_bpe_tokens,
      count(*) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def bpe_token_count_by_lang(spark, sf_dir):
    """BPE-style pre-tokenization counting (letter/digit/punct runs) —
    the token-budget estimator for an LLM training pipeline; JVM
    regexp_extract_all on both sides."""
    from spider_engine_spark.functions import text_analysis as ta

    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.sum(ta.bpe_ish_token_count(F.col("text"))).alias(
            "total_bpe_tokens"
        ),
        F.count(F.lit(1)).alias("n_docs"),
    )


@query(
    "winnowing_fingerprints",
    """
    WITH t AS (
      SELECT doc_id,
        list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
      FROM documents
    ), big AS (
      SELECT doc_id, toks FROM t WHERE len(toks) >= 6
    ), g AS (
      SELECT doc_id,
        [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)]
          AS grams
      FROM big
    ), h AS (
      SELECT doc_id,
        list_transform(grams,
          x -> ('0x' || substring(md5(x), 1, 15))::BIGINT) AS hs
      FROM g
    ), wmin AS (
      SELECT doc_id,
        list_distinct([list_min(hs[j:j+3]) for j in range(1, len(hs)-2)])
          AS fps
      FROM h
    )
    SELECT doc_id, unnest(fps) AS fp FROM wmin
    """,
)
def winnowing_fingerprints(spark, sf_dir):
    """Rolling-hash winnowing fingerprints (n=3 grams, window w=4),
    exploded to (doc_id, fp) rows — the content-defined signatures a
    100 TB near-dup pass joins on. Fully JVM; the oracle recomputes the
    identical selection in SQL.  Uses the materialized-ladder +
    explode_outer form: the single-Column + explode form re-evaluates
    the tokenize+md5 chain per window (InferFiltersFromGenerate inlines
    the tree through the ladder) — measured 25x slower."""
    from spider_engine_spark.functions.text_analysis import (
        exploded_winnowing_fingerprints,
    )

    docs = load(spark, sf_dir, "documents")
    return exploded_winnowing_fingerprints(docs, "doc_id", "text", 3, 4)


@query(
    "thumbnail_stats",
    """
    WITH hx AS (
      SELECT doc_id, md5(doc_id::VARCHAR) AS m FROM documents
    ), h AS (
      SELECT doc_id,
        ('0x' || substring(m, 1, 2))::INTEGER AS h0,
        ('0x' || substring(m, 3, 2))::INTEGER AS h1,
        ('0x' || substring(m, 5, 2))::INTEGER AS h2,
        ('0x' || substring(m, 7, 2))::INTEGER AS h3
      FROM hx
    ), m AS (
      SELECT doc_id,
        CASE h1 % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
          AS kind,
        256 + h0 * 16 AS n,
        CASE WHEN h1 % 3 = 1 THEN 0 ELSE 16 + h2 % 64 END AS w,
        CASE WHEN h1 % 3 = 1 THEN 0 ELSE 16 + h3 % 64 END AS hh
      FROM h
    )
    SELECT kind, count(*) AS n_docs,
      CAST(sum(least(w, 8)) AS BIGINT) AS sum_thumb_w,
      CAST(sum(least(hh, 8)) AS BIGINT) AS sum_thumb_h,
      CAST(sum(greatest(32, n // greatest(greatest(w, hh), 1))) AS BIGINT)
        AS sum_thumb_bytes
    FROM m GROUP BY kind
    """,
)
def thumbnail_stats(spark, sf_dir):
    """Multimodal resize kernel through the oracle gate: synth payloads ->
    thumbnail (mapInPandas: clamped dims + payload downsample) -> per-kind
    stats. The oracle recomputes the clamp/length arithmetic from the
    md5-derived metadata while Spark measures the ACTUAL emitted binary
    (octet length of the thumb column) — an end-to-end check of the
    resize plumbing."""
    from spider_engine_spark.operators.multimodal import (
        synth_media,
        thumbnail,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    media = synth_media(docs)
    thumbs = thumbnail(media, max_side=8)
    kinds = media.select("doc_id", F.col("meta.kind").alias("kind"))
    return (
        thumbs.join(kinds, "doc_id")
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("thumb_w").cast("long").alias("sum_thumb_w"),
            F.sum("thumb_h").cast("long").alias("sum_thumb_h"),
            F.sum(F.length("thumb")).cast("long").alias("sum_thumb_bytes"),
        )
    )


# Shared SQL fragment: per-document Gopher repetition/quality features,
# the exact laws of functions/text_analysis.gopher_repetition (n=2 top,
# n=5 dup) and the basic token features.  Produces CTE `gq`:
#   (doc_id, n_tokens, avg_len, dr, top2, dup5).
# Laws mirrored: cover = cnt * token-chars of the gram (len - (n-1)
# joiner spaces), count ties break to larger cover, top frac clamped to
# 1.0 (overlaps double-count); dup coverage counts each token's chars
# once when ANY n-gram window spanning it is a duplicated value; NULL
# text is the empty document (quality_filter's coalesce law), so it
# lands in too_few_tokens, never in KEEP.
_GOPHER_SQL = """
    t AS (SELECT doc_id,
      list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
        x -> x <> '') AS toks
      FROM documents),
    tc AS (
      SELECT doc_id, toks,
        coalesce(list_sum(list_transform(toks, x -> len(x))), 0)::BIGINT
          AS total,
        [array_to_string(toks[i:i+1], ' ') for i in range(1, len(toks))]
          AS g2,
        [array_to_string(toks[i:i+4], ' ') for i in range(1, len(toks)-3)]
          AS g5
      FROM t
    ),
    u2 AS (SELECT doc_id, unnest(g2) AS g FROM tc),
    c2 AS (SELECT doc_id, g, count(*) AS cnt FROM u2 GROUP BY doc_id, g),
    b2 AS (
      SELECT doc_id, cnt * (len(g) - 1) AS cover,
        row_number() OVER (PARTITION BY doc_id
          ORDER BY cnt DESC, cnt * (len(g) - 1) DESC) AS rn
      FROM c2
    ),
    top2c AS (SELECT doc_id, cover FROM b2 WHERE rn = 1),
    u5 AS (SELECT doc_id, unnest(g5) AS g FROM tc),
    d5 AS (SELECT doc_id, g FROM u5 GROUP BY doc_id, g HAVING count(*) > 1),
    dl AS (SELECT doc_id, list(g) AS dups FROM d5 GROUP BY doc_id),
    gq AS (
      SELECT tc.doc_id AS doc_id,
        len(tc.toks) AS n_tokens,
        CASE WHEN len(tc.toks) = 0 THEN 0.0
          ELSE tc.total::DOUBLE / len(tc.toks) END AS avg_len,
        CASE WHEN len(tc.toks) = 0 THEN 0.0
          ELSE len(list_distinct(tc.toks))::DOUBLE / len(tc.toks) END AS dr,
        CASE WHEN top2c.cover IS NULL OR tc.total = 0 THEN 0.0
          ELSE least(top2c.cover::DOUBLE / tc.total, 1.0) END AS top2,
        CASE WHEN dl.dups IS NULL OR tc.total = 0 THEN 0.0 ELSE
          coalesce(list_sum(list_transform(range(1, len(tc.toks) + 1),
            j -> CASE WHEN len(list_filter(
                (list_transform(tc.g5, x -> list_contains(dl.dups, x))
                )[greatest(j - 4, 1):least(j, len(tc.g5))],
                f -> f)) > 0
              THEN len(tc.toks[j]) ELSE 0 END)), 0)::DOUBLE / tc.total
        END AS dup5
      FROM tc
      LEFT JOIN top2c ON tc.doc_id = top2c.doc_id
      LEFT JOIN dl ON tc.doc_id = dl.doc_id
    )
"""


@query(
    "gopher_repetition_fracs",
    f"""
    WITH {_GOPHER_SQL}
    SELECT doc_id, top2 AS top_2gram_char_frac, dup5 AS dup_5gram_char_frac
    FROM gq
    """,
)
def gopher_repetition_fracs(spark, sf_dir):
    """Gopher repetition features (Rae et al. 2021 A1.1) per document:
    top-2-gram and dup-5-gram char fractions, value-exact against an
    independent SQL recomputation (both sides divide exact integer char
    counts in double, so the hashes match bit-for-bit). Spark side is
    the per-row array-algebra ladder — map-only, no shuffle at 100 TB."""
    from spider_engine_spark.functions.text_analysis import (
        gopher_repetition,
    )

    docs = load(spark, sf_dir, "documents")
    return gopher_repetition(docs, "text", top_ns=(2,), dup_ns=(5,)).select(
        "doc_id", "top_2gram_char_frac", "dup_5gram_char_frac"
    )


@query(
    "quality_gate_audit",
    f"""
    WITH {_GOPHER_SQL},
    v AS (
      SELECT doc_id,
        n_tokens < 10 AS r_few,
        n_tokens > 200000 AS r_many,
        avg_len < 2.0 AS r_short,
        avg_len > 12.0 AS r_long,
        top2 > 0.20 AS r_top2,
        dup5 > 0.15 AS r_dup5,
        dr < 0.0 AS r_dr
      FROM gq
    ),
    agg AS (
      SELECT
        sum(CASE WHEN r_few THEN 1 ELSE 0 END) AS n_few,
        sum(CASE WHEN r_many THEN 1 ELSE 0 END) AS n_many,
        sum(CASE WHEN r_short THEN 1 ELSE 0 END) AS n_short,
        sum(CASE WHEN r_long THEN 1 ELSE 0 END) AS n_long,
        sum(CASE WHEN r_top2 THEN 1 ELSE 0 END) AS n_top2,
        sum(CASE WHEN r_dup5 THEN 1 ELSE 0 END) AS n_dup5,
        sum(CASE WHEN r_dr THEN 1 ELSE 0 END) AS n_dr,
        sum(CASE WHEN NOT (r_few OR r_many OR r_short OR r_long
                           OR r_top2 OR r_dup5 OR r_dr)
            THEN 1 ELSE 0 END) AS n_keep
      FROM v
    )
    SELECT rule, CAST(n AS BIGINT) AS n_docs FROM (
      SELECT 'too_few_tokens' AS rule, n_few AS n FROM agg
      UNION ALL SELECT 'too_many_tokens', n_many FROM agg
      UNION ALL SELECT 'avg_token_too_short', n_short FROM agg
      UNION ALL SELECT 'avg_token_too_long', n_long FROM agg
      UNION ALL SELECT 'top_2gram_repetition', n_top2 FROM agg
      UNION ALL SELECT 'dup_5gram_repetition', n_dup5 FROM agg
      UNION ALL SELECT 'low_distinct_ratio', n_dr FROM agg
      UNION ALL SELECT 'KEEP', n_keep FROM agg
    ) WHERE n > 0
    """,
)
def quality_gate_audit(spark, sf_dir):
    """The composite quality gate's kill-rate audit: one row per firing
    reject rule with its document count, plus a 'KEEP' row.  The oracle
    recomputes every rule from scratch (token features + Gopher
    fractions) in SQL; threshold comparisons agree because both engines
    compute the underlying ratios as identical exact-integer divisions.

    Deliberately ONE conditional aggregation over the labeled stream
    (then an unpivot of the single wide row) rather than
    explode+groupBy / filter+count legs: aggregate expressions reference
    the derived columns as attributes, keeping quality_filter's
    projection ladder intact, whereas a Filter or Generate above the
    ladder is rewritten THROUGH it by PushDownPredicates / generator
    pushdown — rules with no non-cheap duplication guard, unlike
    CollapseProject — re-expanding the tokenize subtree ~57x per row
    (measured 58 s vs 2 s at sf0.01).  Pinned by
    test_quality_audit_plan_does_not_reexpand_tokenize."""
    from spider_engine_spark.functions.text_analysis import (
        QUALITY_RULE_LABELS,
        quality_filter,
    )

    docs = load(spark, sf_dir, "documents")
    qf = quality_filter(docs, "text")
    wide = qf.agg(
        *[
            F.sum(
                F.array_contains("quality_reject_reasons", lbl).cast("long")
            ).alias(lbl)
            for lbl in QUALITY_RULE_LABELS
        ],
        F.sum(F.col("quality_keep").cast("long")).alias("KEEP"),
    )
    stack_args = ", ".join(
        f"'{lbl}', `{lbl}`" for lbl in [*QUALITY_RULE_LABELS, "KEEP"]
    )
    n = len(QUALITY_RULE_LABELS) + 1
    return wide.selectExpr(
        f"stack({n}, {stack_args}) AS (rule, n_docs)"
    ).filter(F.col("n_docs") > 0)


@query(
    "corpus_sample_strata",
    """
    WITH u AS (
      SELECT lang,
        (('0x' || substring(md5(doc_id::VARCHAR || ':7'), 1, 15))::BIGINT
          % 9007199254740992) / 9007199254740992.0 AS u
      FROM documents
    ), r AS (
      SELECT lang, u,
        CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
          WHEN 'fr' THEN 0.1 ELSE 0.05 END AS rate
      FROM u
    )
    SELECT lang, count(*)::BIGINT AS n_sampled,
      CAST(sum(CASE WHEN u < rate / 2 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_half
    FROM r WHERE u < rate GROUP BY lang
    """,
)
def corpus_sample_strata(spark, sf_dir):
    """Deterministic stratified corpus sampling (training-mix
    rebalancing): per-language counts of a keyed-hash sample, plus the
    coupled half-rate subsample (same salt, rate/2 — a strict subset by
    construction, the scaling-ladder property).  Uses the sampling
    module's SQL-reproducible md5 law so the membership DECISION itself
    is oracle-checked row-for-row, not just statistically."""
    from spider_engine_spark.operators.sampling import (
        stratified_sample,
        uniform_unit,
    )

    docs = load(spark, sf_dir, "documents")
    rates = {"en": 0.5, "de": 0.25, "fr": 0.1}
    default_rate = 0.05
    s = stratified_sample(
        docs, "doc_id", "lang", rates, default_rate, salt=7, law="md5"
    )
    u = uniform_unit(F.col("doc_id"), 7, "md5")
    half = F.lit(default_rate / 2)
    for k, v in sorted(rates.items()):
        half = F.when(F.col("lang") == F.lit(k), F.lit(v / 2)).otherwise(
            half
        )
    return s.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.sum((u < half).cast("long")).cast("long").alias("n_half"),
    )


@query(
    "benchmark_contamination",
    """
    WITH t AS (
      SELECT doc_id,
        list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
      FROM documents
    ), big AS (
      SELECT doc_id, toks FROM t WHERE len(toks) >= 6
    ), g AS (
      SELECT doc_id,
        [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)]
          AS grams
      FROM big
    ), h AS (
      SELECT doc_id,
        list_transform(grams,
          x -> ('0x' || substring(md5(x), 1, 15))::BIGINT) AS hs
      FROM g
    ), wmin AS (
      SELECT doc_id,
        list_distinct([list_min(hs[j:j+3]) for j in range(1, len(hs)-2)])
          AS fps
      FROM h
    ), fpx AS (
      SELECT doc_id, unnest(fps) AS fp FROM wmin
    )
    SELECT a.doc_id AS corpus_id, b.doc_id AS test_id,
      count(*) AS shared_fps
    FROM fpx a JOIN fpx b ON a.fp = b.fp
    WHERE b.doc_id % 97 = 0
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 1
    """,
)
def benchmark_contamination(spark, sf_dir):
    """Benchmark decontamination sweep: corpus documents sharing
    winnowing fingerprints (n=3, w=4) with a deterministic held-out
    'evaluation set' (doc_id % 97 == 0 — stands in for a tiny benchmark
    table).  The eval side is broadcast, the corpus side is map-only
    explode + broadcast join: no corpus shuffle until the vanishing
    matched-pairs groupBy — the shape that survives 100 TB.  Oracle
    recomputes both fingerprint sets and the join in SQL."""
    from spider_engine_spark.operators.dedup import contamination_pairs

    docs = load(spark, sf_dir, "documents")
    testset = docs.filter(F.col("doc_id") % 97 == 0)
    return contamination_pairs(
        docs, testset, key="doc_id", content="text", n=3, w=4, min_shared=1
    )


# PII patterns shared with the oracle: written in the Java-regex/RE2
# common subset (functions/pii.py docstring), so both engines count and
# replace identically.  Counts, replacement tokens AND the scrub chain
# order are all derived from PII_PATTERNS here — reordering the tuple or
# changing a token in pii.py cannot desynchronize the oracle.
from spider_engine_spark.functions.pii import PII_PATTERNS as _PII

_pii_count_sql = ",\n      ".join(
    f"CAST(len(regexp_extract_all(msg, '{pat}')) AS BIGINT)"
    f" AS pii_n_{kind}"
    for kind, pat, _ in _PII
)
_pii_scrub_sql = "msg"
for _k, _pat, _tok in _PII:
    _pii_scrub_sql = (
        f"regexp_replace({_pii_scrub_sql}, '{_pat}', '{_tok}', 'g')"
    )


@query(
    "pii_scrub_audit",
    f"""
    WITH msg AS (
      SELECT doc_id,
        'Contact u' || doc_id::VARCHAR || '@ex' || (doc_id % 7)::VARCHAR
          || '.org at ' || (doc_id % 256)::VARCHAR || '.'
          || ((doc_id * 7) % 256)::VARCHAR || '.'
          || ((doc_id * 13) % 256)::VARCHAR || '.'
          || ((doc_id * 29) % 256)::VARCHAR
          || ' or +1555' || lpad((doc_id % 10000)::VARCHAR, 5, '0')
          || ' re: ' || text AS msg
      FROM documents
    )
    SELECT doc_id,
      {_pii_count_sql},
      {_pii_scrub_sql} AS msg_scrubbed
    FROM msg
    """,
)
def pii_scrub_audit(spark, sf_dir):
    """PII detection + scrubbing audit (the C4/Dolma-style redaction
    pass): every document gets a deterministic doc_id-derived email, IPv4
    and phone number injected (the natural corpus is letters-only, so
    injection makes the law observable), then per-kind match counts on
    the original text and the fully scrubbed string are returned.  The
    oracle recomputes counts AND replacements with DuckDB's RE2 on the
    byte-identical injected text, so the value hash pins Spark-vs-RE2
    regex parity on the whole corpus.  Map-only (no shuffle): at 100 TB
    this fuses into the scan."""
    from spider_engine_spark.functions.pii import with_pii_scrubbed

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.lit("Contact u"),
            did.cast("string"),
            F.lit("@ex"),
            (did % 7).cast("string"),
            F.lit(".org at "),
            (did % 256).cast("string"),
            F.lit("."),
            ((did * 7) % 256).cast("string"),
            F.lit("."),
            ((did * 13) % 256).cast("string"),
            F.lit("."),
            ((did * 29) % 256).cast("string"),
            F.lit(" or +1555"),
            F.lpad((did % 10000).cast("string"), 5, "0"),
            F.lit(" re: "),
            F.col("text"),
        ).alias("msg"),
    )
    out = with_pii_scrubbed(injected, "msg", out="msg_scrubbed")
    # derive the select from _PII — the SAME module-level binding the
    # oracle SQL is generated from — so adding a kind in pii.py updates
    # both sides in lockstep (a hand-written list would desync the
    # schema compare)
    return out.select(
        "doc_id",
        *[
            F.col(f"pii_n_{kind}").cast("long").alias(f"pii_n_{kind}")
            for kind, _, _ in _PII
        ],
        "msg_scrubbed",
    )


@query(
    "sequence_packing",
    """
    WITH base AS (
      SELECT doc_id,
        coalesce(len(regexp_extract_all(text,
          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')), 0) + 1 AS n_tok,
        CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8
          AS INTEGER) AS bucket
      FROM documents
    ), cum AS (
      SELECT doc_id, bucket, CAST(n_tok AS BIGINT) AS n_tok,
        CAST(sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id, n_tok
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS BIGINT) AS stream_end
      FROM base
    )
    SELECT doc_id, bucket, n_tok,
      stream_end - n_tok AS stream_start,
      stream_end,
      CAST((stream_end - n_tok) // 512 AS BIGINT) AS chunk_first,
      CAST((stream_end - 1) // 512 AS BIGINT) AS chunk_last
    FROM cum
    """,
)
def sequence_packing(spark, sf_dir):
    """Deterministic GPT-style sequence packing: every document's
    position (stream_start/stream_end) and block span (chunk_first/
    chunk_last) in its bucket's concatenated token stream, under the
    BPE-ish token law + 1 separator token, bucketed by the md5 shard
    law.  The layout is pure integer arithmetic over a per-bucket
    cumsum, so the oracle reproduces it bit-for-bit — the whole pack
    plan is one bucket-exchange shuffle + one window pass per bucket
    (operators/packing.py docstring has the 100 TB sizing)."""
    from spider_engine_spark.operators.packing import pack_sequences

    docs = load(spark, sf_dir, "documents")
    return pack_sequences(
        docs, key="doc_id", content="text", block=512, buckets=8
    )


@query(
    "packing_blocks",
    """
    WITH base AS (
      SELECT doc_id,
        coalesce(regexp_extract_all(text,
          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'), []) || ['<|sep|>'] AS toks,
        CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8
          AS INTEGER) AS bucket
      FROM documents
    ), cum AS (
      SELECT bucket, toks, CAST(len(toks) AS BIGINT) AS n_tok,
        CAST(sum(len(toks)) OVER (PARTITION BY bucket
          ORDER BY doc_id, len(toks)
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS BIGINT) AS stream_end
      FROM base
    ), spans AS (
      SELECT bucket, toks, stream_end,
        stream_end - n_tok AS ss,
        unnest(generate_series((stream_end - n_tok) // 512,
                               (stream_end - 1) // 512)) AS chunk_id
      FROM cum
    ), pieces AS (
      SELECT bucket, chunk_id, ss,
        toks[(greatest(chunk_id * 512 - ss, 0) + 1)
             : (least((chunk_id + 1) * 512, stream_end) - ss)] AS piece
      FROM spans
    )
    SELECT bucket, CAST(chunk_id AS BIGINT) AS chunk_id,
      CAST(sum(len(piece)) AS BIGINT) AS n_tokens,
      md5(string_agg(array_to_string(piece, ' '), ' ' ORDER BY ss))
        AS chunk_md5
    FROM pieces GROUP BY bucket, chunk_id
    """,
)
def packing_blocks(spark, sf_dir):
    """The materialized packing artifact a trainer consumes: every
    (bucket, chunk_id) block of the sequence_packing layout assembled
    from content — exactly 512 tokens per chunk (each bucket's last
    chunk ragged).  Hashed for the gate as md5 over the
    space-joined token stream (tokens never contain whitespace under
    the BPE-ish law, so the join is unambiguous); the oracle rebuilds
    the identical chunks with DuckDB list slicing + ordered string_agg.
    Plan shape: one layout join + a cheap sequence-explode (~tokens/512
    rows) + one groupBy whose per-group payload is bounded by the block
    size (operators/packing.materialize_blocks docstring)."""
    from spider_engine_spark.operators.packing import (
        materialize_blocks,
        pack_sequences,
    )

    docs = load(spark, sf_dir, "documents")
    packed = pack_sequences(
        docs, key="doc_id", content="text", block=512, buckets=8
    )
    blocks = materialize_blocks(
        docs, packed, key="doc_id", content="text", block=512
    )
    return blocks.select(
        "bucket",
        "chunk_id",
        "n_tokens",
        F.md5(F.encode(F.concat_ws(" ", "tokens"), "UTF-8")).alias(
            "chunk_md5"
        ),
    )


@query(
    "semdedup_corpus",
    f"""
    WITH RECURSIVE {_PLANTED_SQL},
    pairs AS (
      SELECT a.vec_id AS a, b.vec_id AS b
      FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
    ), und AS (
      SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
    ), reach(n, r) AS (
      SELECT vec_id, vec_id FROM all_v
      UNION
      SELECT reach.n, und.v FROM reach JOIN und ON reach.r = und.u
    ), comp AS (
      SELECT n AS vec_id, min(r) AS comp FROM reach GROUP BY n
    )
    SELECT vec_id FROM comp WHERE vec_id = comp
    """,
)
def semdedup_corpus(spark, sf_dir):
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): k-means
    coarse clusters -> exact cosine only WITHIN clusters -> connected
    components -> keep the min-key representative of every semantic-dup
    group.  Returns the kept vec_ids.

    Oracle-checkable despite the within-cluster restriction: the only
    pairs at cosine >= 0.95 are the planted power-of-two scaled copies
    (natural pairs top out at ~0.6), and a scaled copy's cosine to EVERY
    centroid is bit-identical to its source's (power-of-two scaling is
    exact in IEEE), so copies provably land in the source's cluster and
    the within-cluster pair set equals the oracle's brute-force pair
    set.  The oracle then closes the pairs with a recursive CTE and
    keeps each component's min — verifying the clustering + keep law,
    not just the pairs."""
    from spider_engine_spark.operators.dedup import semantic_dedup
    from spider_engine_spark.operators.similarity import kmeans_centroids

    emb = _scaled_copies(load(spark, sf_dir, "embeddings"))
    cents = kmeans_centroids(emb, "vec_id", "embedding", k=8, iters=2)
    kept = semantic_dedup(
        emb, "vec_id", "embedding", cents, threshold=0.95
    )
    return kept.select("vec_id")


_MIX_WEIGHTS = {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 1.0}


def _mix_shares() -> dict[str, float]:
    from spider_engine_spark.operators.sampling import normalize_weights

    return normalize_weights(_MIX_WEIGHTS)


def _mix_values_sql() -> str:
    return ", ".join(
        f"('{k}', CAST({v!r} AS DOUBLE))"
        for k, v in sorted(_mix_shares().items())
    )


@query(
    "mixture_resample_counts",
    lambda: f"""
    WITH w(source, w) AS (VALUES {_mix_values_sql()}),
    cnt AS (
      SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source
    ), j AS (
      SELECT w.source, w.w, cnt.n FROM w JOIN cnt USING (source)
    ), ns AS (
      SELECT min(n::DOUBLE / w) AS n_star FROM j
    ), r AS (
      SELECT source, n,
        LEAST(CAST(1.0 AS DOUBLE),
              w * (SELECT n_star FROM ns) / n::DOUBLE) AS rate
      FROM j
    ), u AS (
      SELECT source, doc_id,
        (('0x' || substring(md5(doc_id::VARCHAR || ':11'), 1, 15))::BIGINT
          % 9007199254740992) / 9007199254740992.0 AS u
      FROM documents
    )
    SELECT r.source, r.n AS n_total, r.rate,
      CAST(count(*) AS BIGINT) AS n_kept
    FROM u JOIN r USING (source) WHERE u.u < r.rate
    GROUP BY r.source, r.n, r.rate
    """,
)
def mixture_resample_counts(spark, sf_dir):
    """Training-mix rebalancing: downsample the corpus to target source
    shares 4:2:1:1 over src0..src3 (everything else dropped) — the
    largest corpus with exactly those proportions that needs no
    upsampling (operators/sampling.mixture_rates).  Output = per-source
    total, computed keep rate, and kept count.

    The oracle recomputes the WHOLE law independently: per-source
    counts, the feasible-total min, the keep rates (same IEEE op order
    — divide / min / multiply / divide, no accumulation, so the doubles
    hash-gate exactly), and row membership under the md5 sampling law.
    Normalized shares are inlined as exact repr literals (they, not the
    raw weights, are the cross-engine contract — Python normalizes with
    fsum)."""
    from spider_engine_spark.operators.sampling import (
        mixture_rates,
        mixture_resample,
        stratum_counts,
    )

    # fan_out=False: one light counting aggregation + a stateless
    # hash filter — the fan-out exchange measured a net loss here
    docs = load(spark, sf_dir, "documents", fan_out=False)
    # one counts pass, shared between the operator and the output's
    # rate/total columns so the gate hashes the LAW itself
    counts = stratum_counts(docs, "source")
    kept = mixture_resample(
        docs, "doc_id", "source", _MIX_WEIGHTS, salt=11, law="md5",
        counts=counts,
    )
    shares = _mix_shares()
    rates = mixture_rates(counts, shares)
    n_total = F.lit(None).cast("long")
    rate = F.lit(None).cast("double")
    for s in sorted(shares):
        n_total = F.when(
            F.col("source") == F.lit(s), F.lit(counts[s]).cast("long")
        ).otherwise(n_total)
        rate = F.when(
            F.col("source") == F.lit(s), F.lit(rates[s])
        ).otherwise(rate)
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
        .withColumn("n_total", n_total)
        .withColumn("rate", rate)
        .select("source", "n_total", "rate", "n_kept")
    )


def _interleaved_pack_oracle() -> str:
    """Pure-Python webmodel replay inlined as a span VALUES fixture; the
    COST law (BPE-ish counts for text spans, fixed budgets for media)
    and the pack law (md5 bucket, ROWS-frame cumsum, integer chunk DIV)
    are both recomputed in SQL."""
    from spider_engine_spark import webmodel as wm

    rows = []
    for u in wm.seed_urls(40):
        doc = wm.make_doc(u)
        for s in doc["spans"]:
            rows.append((doc["doc_id"], s["kind"], s["text"]))
    vals = ", ".join(
        f"('{d}', '{k}', '{t}')" for d, k, t in rows
    )
    return f"""
    WITH spans(doc_id, kind, text) AS (VALUES {vals}),
    costs AS (
      SELECT doc_id,
        CASE kind
          WHEN 'text' THEN len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))
          WHEN 'image' THEN 64
          WHEN 'link' THEN 1
        END AS c
      FROM spans
    ), base AS (
      SELECT doc_id, CAST(sum(c) + 1 AS BIGINT) AS n_tok,
        CAST(('0x' || substring(md5(doc_id), 1, 15))::BIGINT % 4
          AS INTEGER) AS bucket
      FROM costs GROUP BY doc_id
    ), cum AS (
      SELECT doc_id, bucket, n_tok,
        CAST(sum(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id, n_tok
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS BIGINT) AS stream_end
      FROM base
    )
    SELECT doc_id, bucket, n_tok,
      stream_end - n_tok AS stream_start,
      stream_end,
      CAST((stream_end - n_tok) // 512 AS BIGINT) AS chunk_first,
      CAST((stream_end - 1) // 512 AS BIGINT) AS chunk_last
    FROM cum
    """


@query("interleaved_packing", _interleaved_pack_oracle)
def interleaved_packing(spark, sf_dir):
    """Sequence packing over the input_hint's interleaved text+media
    span shape: text spans cost their BPE-ish token count, media spans
    a fixed trainer budget (image 64 placeholder/patch tokens, link 1),
    documents stay atomic under the same md5-bucket cumsum law as
    sequence_packing.  The spans come from the fetch simulator
    (mapInPandas over a seed frame — the same surface
    interleaved_spans_roundtrip pins); the oracle replays the webmodel
    driver-side in pure Python and recomputes BOTH laws (span cost and
    pack layout) in SQL over the inlined spans."""
    from spider_engine_spark import webmodel as wm
    from spider_engine_spark.operators.frontier import fetch_docs
    from spider_engine_spark.operators.packing import pack_interleaved

    seeds = spark.createDataFrame(
        [(u,) for u in wm.seed_urls(40)], "url string"
    )
    docs = fetch_docs(seeds, 0)
    return pack_interleaved(
        docs, key="doc_id", spans="spans", block=512, buckets=4
    )


def _pmi_oracle() -> str:
    from spider_engine_spark.functions.text_analysis import PMI_SCORE_SQL

    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    z AS (SELECT unnest(list_zip(toks, toks[2:])) AS p FROM t),
    bi AS (SELECT p[1] AS w1, p[2] AS w2 FROM z WHERE p[2] IS NOT NULL),
    cxy AS (
      SELECT w1, w2, count(*)::BIGINT AS c_xy FROM bi
      GROUP BY w1, w2 HAVING count(*) >= 5
    ),
    cw AS (
      SELECT w, count(*)::BIGINT AS c_w
      FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
    ),
    tot AS (
      SELECT sum(len(toks))::BIGINT AS n_uni,
             sum(greatest(len(toks) - 1, 0))::BIGINT AS n_bi
      FROM t
    ),
    j AS (
      SELECT cxy.w1, cxy.w2, cxy.c_xy,
             a.c_w AS c_x, b.c_w AS c_y, tot.n_uni, tot.n_bi
      FROM cxy
      JOIN cw a ON a.w = cxy.w1
      JOIN cw b ON b.w = cxy.w2
      CROSS JOIN tot
    )
    SELECT w1, w2, c_xy, {PMI_SCORE_SQL} AS pmi_score
    FROM j ORDER BY pmi_score DESC, w1, w2 LIMIT 20
    """


@query("collocations_pmi_topk", _pmi_oracle)
def collocations_pmi_topk(spark, sf_dir):
    """Top-20 corpus collocations by PMI (rational core — the log's
    argument, exact integer counts through ONE shared IEEE expression
    string, functions/text_analysis.PMI_SCORE_SQL — so the DOUBLE
    scores hash-gate).  Plan: one bigram explode + one token explode,
    two count aggregates, min_count prunes the hapax tail before the
    unigram joins, totals as a 1-row broadcast."""
    from spider_engine_spark.functions.text_analysis import (
        collocations_pmi,
    )

    # fan_out=False: tokenize-only count aggregations — the fan-out
    # exchange measured a net loss here (A/B 0.49 -> 0.66 s)
    docs = load(spark, sf_dir, "documents", fan_out=False)
    scored = collocations_pmi(docs, "doc_id", "text", min_count=5)
    return (
        scored.orderBy(F.desc("pmi_score"), F.asc("w1"), F.asc("w2"))
        .limit(20)
        .select("w1", "w2", "c_xy", "pmi_score")
    )


# ---------------------------------------------------------------------------
# C4 cleaning + corpus paragraph dedup over deterministically LINED docs
#
# The corpus text is a single-line word stream (no newlines, no
# punctuation), so — exactly as pii_scrub_audit injects PII to make the
# scrub law observable — both queries below first give every document a
# deterministic doc_id-derived LINE structure: tokens chunked
# _LINE_W per line; terminal-punctuation / short-line / javascript
# decorations keyed by (doc_id*31 + line_index); page-level boilerplate
# (cross-doc duplicate paragraphs), lorem-ipsum and brace lines on fixed
# doc_id residues.  The construction lives ONCE per engine (the Spark
# ladder in _lined_docs, the _LINED_SQL CTE for DuckDB) with every
# literal shared from the constants below, and the full-string value
# hash pins both operators' complete rule set corpus-wide.
# ---------------------------------------------------------------------------

_BOILER_LINES = (
    "subscribe to our newsletter now.",
    "follow us on social media today.",
    "all rights reserved by the author.",
)
_LOREM_LINE = "lorem ipsum dolor sit amet."
_BRACE_LINE = "config data { nested } end."
_LINE_W = 8  # tokens per synthetic line


def _lined_docs(spark, sf_dir):
    """documents with the deterministic injected line structure — the
    Spark half of the shared lined-docs law (_LINED_SQL mirrors it)."""
    from spider_engine_spark.functions.text_analysis import tokens

    did = F.col("doc_id")
    empty = F.array().cast("array<string>")
    docs = load(spark, sf_dir, "documents")
    d = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    d = d.select(
        "doc_id",
        F.transform(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.ceil(
                        F.size("_toks") / F.lit(float(_LINE_W))
                    ).cast("int"),
                    F.lit(1),
                )
                - F.lit(1),
            ),
            lambda i: F.array_join(
                F.slice(F.col("_toks"), i * _LINE_W + 1, _LINE_W), " "
            ),
        ).alias("_raw"),
    )

    def _dec(line, i):
        h = did * 31 + i.cast("long")
        return (
            F.when(h % 17 == 0, F.lit("ok."))
            .when(
                h % 13 == 0,
                F.concat(line, F.lit(" javascript enabled.")),
            )
            .when(h % 10 <= 5, F.concat(line, F.lit(".")))
            .when(h % 10 == 6, F.concat(line, F.lit("!")))
            .when(h % 10 == 7, F.concat(line, F.lit("?")))
            .otherwise(line)
        )

    d = d.select("doc_id", F.transform("_raw", _dec).alias("_dec"))
    return d.select(
        "doc_id",
        F.array_join(
            F.concat(
                F.col("_dec"),
                F.when(did % 5 == 0, F.array(F.lit(_BOILER_LINES[0])))
                .when(did % 5 == 1, F.array(F.lit(_BOILER_LINES[1])))
                .when(did % 5 == 2, F.array(F.lit(_BOILER_LINES[2])))
                .otherwise(empty),
                F.when(did % 23 == 0, F.array(F.lit(_LOREM_LINE)))
                .otherwise(empty),
                F.when(did % 29 == 0, F.array(F.lit(_BRACE_LINE)))
                .otherwise(empty),
            ),
            "\n",
        ).alias("text"),
    )


_LINED_SQL = f"""
    _lt AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), _lb AS (
      SELECT doc_id, list_transform(
        range(0, greatest(CAST(ceil(len(toks) / {_LINE_W}.0) AS INT), 1)),
        i -> array_to_string(
          toks[i*{_LINE_W}+1 : i*{_LINE_W}+{_LINE_W}], ' ')) AS raw
      FROM _lt
    ), _ld AS (
      SELECT doc_id, list_transform(
        list_zip(raw, range(0, len(raw))),
        p -> CASE
          WHEN (doc_id * 31 + p[2]) % 17 = 0 THEN 'ok.'
          WHEN (doc_id * 31 + p[2]) % 13 = 0
            THEN p[1] || ' javascript enabled.'
          WHEN (doc_id * 31 + p[2]) % 10 <= 5 THEN p[1] || '.'
          WHEN (doc_id * 31 + p[2]) % 10 = 6 THEN p[1] || '!'
          WHEN (doc_id * 31 + p[2]) % 10 = 7 THEN p[1] || '?'
          ELSE p[1] END) AS ls
      FROM _lb
    ), lined AS (
      SELECT doc_id, array_to_string(
        ls
        || (CASE doc_id % 5
             WHEN 0 THEN ['{_BOILER_LINES[0]}']
             WHEN 1 THEN ['{_BOILER_LINES[1]}']
             WHEN 2 THEN ['{_BOILER_LINES[2]}']
             ELSE [] END)
        || (CASE WHEN doc_id % 23 = 0 THEN ['{_LOREM_LINE}']
             ELSE [] END)
        || (CASE WHEN doc_id % 29 = 0 THEN ['{_BRACE_LINE}']
             ELSE [] END),
        chr(10)) AS text
      FROM _ld
    )"""


def _c4_oracle() -> str:
    return f"""
    WITH {_LINED_SQL}
    , _cl AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls, text FROM lined
    ), _cf AS (
      SELECT doc_id, ls,
        list_filter(ls, x ->
          right(x, 1) IN ('.', '!', '?', '"')
          AND len(list_filter(regexp_split_to_array(x, '\\s+'),
                              y -> y <> '')) >= 3
          AND NOT contains(x, 'javascript')) AS kept,
        (NOT contains(text, 'lorem ipsum')
         AND NOT contains(text, '{{')) AS page_ok
      FROM _cl
    )
    SELECT doc_id,
      CAST(len(ls) AS INT) AS n_lines,
      CAST(len(kept) AS INT) AS n_kept,
      (page_ok AND len(kept) >= 3) AS page_kept,
      md5(CASE WHEN page_ok AND len(kept) >= 3
           THEN array_to_string(kept, chr(10)) ELSE '' END) AS cleaned_md5
    FROM _cf
    """


@query("c4_clean_audit", _c4_oracle)
def c4_clean_audit(spark, sf_dir):
    """C4-style page cleaning audit (Raffel et al. 2020): line-level
    terminal-punctuation / >=3-words / javascript rules plus the
    lorem-ipsum / brace / min-kept-lines page rules, over documents
    given the deterministic injected line structure (corpus text has no
    lines — the pii_scrub_audit pattern).  The md5 of the full cleaned
    string pins every rule corpus-wide.  Map-only: at 100 TB this fuses
    into the scan."""
    from spider_engine_spark.functions.text_analysis import c4_clean

    lined = _lined_docs(spark, sf_dir)
    out = c4_clean(lined, "doc_id", "text", min_words=3, min_lines=3)
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        "page_kept",
        F.md5("cleaned").alias("cleaned_md5"),
    )


def _paragraph_dedup_oracle() -> str:
    return f"""
    WITH {_LINED_SQL}
    , _pl AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls FROM lined
    ), _px AS (
      SELECT doc_id, p[1] AS line, CAST(p[2] AS INT) AS pos,
        doc_id * {1 << 20} + p[2] AS ord,
        ('0x' || substring(md5(p[1]), 1, 15))::BIGINT AS g1,
        ('0x' || substring(md5(p[1]), 16, 15))::BIGINT AS g2
      FROM _pl, unnest(list_zip(ls, range(0, len(ls)))) AS u(p)
    ), _pk AS (
      SELECT doc_id, line, pos,
        ord = min(ord) OVER (PARTITION BY g1, g2) AS keep
      FROM _px
    ), _pr AS (
      SELECT doc_id,
        count(*) AS n_kept,
        string_agg(line, chr(10) ORDER BY pos) AS text_deduped
      FROM _pk WHERE keep GROUP BY doc_id
    )
    SELECT l.doc_id,
      CAST(len(string_split(l.text, chr(10))) AS INT) AS n_lines,
      coalesce(r.n_kept, 0) AS n_kept,
      md5(coalesce(r.text_deduped, '')) AS dedup_md5
    FROM lined l LEFT JOIN _pr r USING (doc_id)
    """


@query("paragraph_dedup_docs", _paragraph_dedup_oracle)
def paragraph_dedup_docs(spark, sf_dir):
    """Corpus-level exact duplicated-paragraph removal (the RefinedWeb /
    Dolma paragraph-dedup law; C4's duplicated-span rule at paragraph
    granularity): a paragraph occurring more than once across the corpus
    survives only at its globally-first (doc_id, position) occurrence.
    The injected boilerplate lines (_BOILER_LINES, one per doc_id%5
    residue class) give ~100 cross-doc duplicates per class at sf0.01,
    so the law is observable; the md5 of each rebuilt document pins
    order-preserving reassembly corpus-wide.  Plan: posexplode ->
    min-agg on the 60-bit paragraph hash (map-side combinable) ->
    duplicated-occurrences-only anti-join -> one groupBy rebuild."""
    from spider_engine_spark.operators.dedup import paragraph_dedup

    lined = _lined_docs(spark, sf_dir)
    out = paragraph_dedup(lined, "doc_id", "text")
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.md5("text_deduped").alias("dedup_md5"),
    )


def _hll_oracle() -> str:
    from spider_engine_spark.operators.sketches import (
        hll_raw_estimate_sql,
    )

    # bucket_bits=8: m=256, w=52, rho = 53 - bit_length(h >> 8)
    return f"""
    WITH _hh AS (
      SELECT ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))
        ::BIGINT AS h
      FROM events
    ), _hx AS (
      SELECT h % 256 AS bucket,
        53 - len(list_filter(range(0, 52),
                             k -> (h >> 8) >= (1::BIGINT << k))) AS rho
      FROM _hh
    ), _ho AS (
      SELECT bucket, max(rho) AS max_rho FROM _hx GROUP BY bucket
    ), _hf AS (
      SELECT u AS bucket FROM unnest(range(0, 256)) AS t(u)
    ), _hr AS (
      SELECT f.bucket, coalesce(o.max_rho, 0) AS max_rho
      FROM _hf f LEFT JOIN _ho o USING (bucket)
    ), _hs AS (
      SELECT CAST(sum(1::BIGINT << (53 - max_rho)) AS BIGINT) AS s
      FROM _hr
    ), _hn AS (
      SELECT count(DISTINCT event_id) AS n_exact FROM events
    )
    SELECT r.bucket, CAST(r.max_rho AS INT) AS max_rho, _hs.s,
      {hll_raw_estimate_sql(8)} AS raw_est, _hn.n_exact
    FROM _hr r CROSS JOIN _hs CROSS JOIN _hn
    """


@query("hll_distinct_events", _hll_oracle)
def hll_distinct_events(spark, sf_dir):
    """HyperLogLog cardinality sketch over event ids — the
    bounded-state distinct counter a 10^10-URL seen-set needs where
    exact count-distinct stops fitting (256 registers vs 10^10 keys).
    The register law is INTEGER end-to-end (md5-h60 bucket split +
    power-of-two comparison ladder; no log2) and the harmonic-mean
    denominator stays a BIGINT sum of dyadic weights, so every value —
    including the one-division raw estimate — hash-gates exactly.
    Output: all 256 registers plus (s, raw_est, exact distinct) on
    each row.  Plan: one map-side-combinable groupBy bounded at m rows
    per partition; merging shards is cell-wise MAX of registers."""
    from spider_engine_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    ev = load(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("k")
    )
    regs = hll_registers(ev, "k", bucket_bits=8)
    est = hll_estimate(regs, bucket_bits=8)
    # int->string is injective, so distinct(k) == distinct(event_id):
    # reuse the projection instead of scanning events a second time
    n = ev.agg(F.countDistinct("k").alias("n_exact"))
    return regs.crossJoin(F.broadcast(est)).crossJoin(F.broadcast(n)).select(
        "bucket", "max_rho", "s", "raw_est", "n_exact"
    )


def _cms_oracle() -> str:
    return f"""
    WITH _ct AS (
      SELECT unnest({_TOKS}) AS term FROM documents
    ), _cc AS (
      SELECT s.seed, ('0x' || substring(md5(term || ':' ||
          CAST(s.seed AS VARCHAR)), 1, 15))::BIGINT % 256 AS bucket,
        count(*)::BIGINT AS cnt
      FROM _ct CROSS JOIN (SELECT unnest(range(0, 4)) AS seed) s
      GROUP BY s.seed, bucket
    ), _ctrue AS (
      SELECT term, count(*)::BIGINT AS true_cnt FROM _ct GROUP BY term
      ORDER BY true_cnt DESC, term LIMIT 20
    ), _cp AS (
      SELECT t.term, t.true_cnt, s.seed,
        ('0x' || substring(md5(t.term || ':' ||
          CAST(s.seed AS VARCHAR)), 1, 15))::BIGINT % 256 AS bucket
      FROM _ctrue t CROSS JOIN (SELECT unnest(range(0, 4)) AS seed) s
    )
    SELECT p.term, p.true_cnt,
      min(coalesce(c.cnt, 0)) AS cms_est
    FROM _cp p LEFT JOIN _cc c
      ON c.seed = p.seed AND c.bucket = p.bucket
    GROUP BY p.term, p.true_cnt
    """


@query("cms_term_counts", _cms_oracle)
def cms_term_counts(spark, sf_dir):
    """Count-Min Sketch frequency estimation over corpus tokens: a
    depth-4 x width-256 integer counter table (bounded state however
    many tokens feed it; merge = cell-wise sum), probed for the 20
    most frequent terms.  est >= true always (collisions only add);
    both the counter law and the min-probe are exact integer
    arithmetic, so estimates hash-gate.  Plan: one explode -> one
    bounded groupBy for the sketch; the probe joins a broadcast
    counter table."""
    from spider_engine_spark.operators.dedup import exploded_tokens
    from spider_engine_spark.operators.sketches import (
        cms_counters,
        cms_lookup,
    )

    docs = load(spark, sf_dir, "documents")
    # toks feeds BOTH the sketch build and the true top-20 — persist so
    # the corpus is tokenized once (evictable cache, lineage retained)
    toks = exploded_tokens(docs, "doc_id", "text").persist()
    counters = cms_counters(toks, "term", width=256, depth=4)
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("term"))
        .limit(20)
    )
    est = cms_lookup(counters, top.select("term"), "term", 256, 4)
    return top.join(est, "term").select("term", "true_cnt", "cms_est")


@query("streaming_cms_term_counts", _cms_oracle)
def streaming_cms_term_counts(spark, sf_dir):
    """INCREMENTAL Count-Min maintenance: the corpus token stream is
    hash-split into 4 micro-batches and folded through the REAL
    foreachBatch handler (streaming/sketches.py — pytest additionally
    runs the true readStream/availableNow integration).  CMS cells SUM,
    so the persisted counters after any split equal the batch-built
    sketch of the whole corpus — this query probes the streamed
    counters for the top-20 true terms and is gated against the SAME
    oracle as cms_term_counts: a batch-vs-streaming parity check
    through the driver's hash gate, over real persisted state."""
    import shutil
    import tempfile

    from spider_engine_spark.operators.dedup import exploded_tokens
    from spider_engine_spark.operators.sketches import cms_lookup
    from spider_engine_spark.sources.tableio import TableIO
    from spider_engine_spark.streaming.sketches import (
        cms_sketch_init,
        make_cms_batch_handler,
    )

    docs = load(spark, sf_dir, "documents")
    toks = exploded_tokens(docs, "doc_id", "text")
    root = tempfile.mkdtemp(prefix="drv_cms_")
    io = TableIO(root)
    cms_sketch_init(spark, io, "cms", term="term", width=256, depth=4)
    handler = make_cms_batch_handler(io, "cms")
    try:
        for i in range(4):
            handler(
                toks.filter(F.pmod(F.col("doc_id"), F.lit(4)) == i), i
            )
        counters = io.read(spark, "cms").localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("term"))
        .limit(20)
    )
    est = cms_lookup(counters, top.select("term"), "term", 256, 4)
    return top.join(est, "term").select("term", "true_cnt", "cms_est")


# ---------------------------------------------------------------------------
# Driver-gate registration order
#
# The correctness driver emits at most 50 rows and takes queries in
# REGISTRATION order (dict insertion order = file order above).  Round 3
# registered 53 queries, so the last three in file order
# (bpe_token_count_by_lang, winnowing_fingerprints, thumbnail_stats) were
# silently evicted from the gate even though all three exact-match their
# oracles (judge-verified at sf0.01).
#
# Policy: every query that has NEVER had a driver correctness row must be
# inside the first `_DRIVER_GATE_CAP` registrations.  When the registry
# exceeds the cap, queries to demote come from `_GATE_ROTATION` — only
# entries that (a) have passed the gate for >=2 consecutive rounds AND
# (b) are result-redundant with a still-gated entry or are explicitly
# labeled baselines.  The demotion set ROTATES each round (round-4 judge
# item #2): a row that exists only in old rounds ages, so no entry may
# sit out two consecutive rounds.  Each rotation slot holds one member
# of a redundancy pair; bumping `_GATE_ROUND` every round alternates
# which member of each pair sits out, so every query has a hard-signal
# row at most one round old.  Adding a NEW @query without updating this
# block cannot evict a gated query: the overflow set is explicit, and
# tests/test_gate_order.py pins the never-yet-gated names inside the cap
# and the rotation's disjointness invariant.
# ---------------------------------------------------------------------------

_DRIVER_GATE_CAP = 50
# Redundancy pairs feeding the rotation (each member exercises the same
# plan family / result as its partner, so one gated member per round
# keeps the family under a current-round hard signal):
#   embedding_topk_pairs    <-> knn_brute       (labeled brute baselines;
#                               production ANN paths ann_lsh / ann_ivf /
#                               embedding_near_dups_lsh are never demoted)
#   search_pagination       <-> search_tfidf    (same ranking plan,
#                               pagination adds the clamp slice)
#   streaming_hourly_window <-> events_hourly   (result-identical window
#                               agg, streaming vs batch surface)
# Round 5 registered 4 new queries (gopher_repetition_fracs,
# quality_gate_audit, corpus_sample_strata, benchmark_contamination), so
# 7 entries must sit out per round; four more 2-round-green plan-family
# pairs joined the rotation:
#   search_filtered    <-> filters_all_ops      (the 10-op filter
#                               dispatch, search path vs enumeration)
#   events_running_sum <-> events_lead_lag      (per-key ordered window
#                               functions over events)
#   tpch_q1            <-> tpch_q6              (single-table lineitem
#                               scan-filter-aggregate)
#   frame_sample_stats <-> thumbnail_stats      (synth_media ->
#                               mapInPandas kernel -> per-kind stats;
#                               thumbnail_stats first gated r4, so it
#                               sits out even rounds only, by which time
#                               it has >=2 consecutive green rounds)
# Round 5 (late) registered 2 more new queries (pii_scrub_audit,
# sequence_packing), so 9 entries sit out per round; two more
# 2-round-green plan-family pairs joined the rotation:
#   window_topn_orders <-> window_ntile_users   (per-key ordered ranking
#                               window over the same base tables)
#   tpch_q3_top10      <-> tpch_q5_regional     (multi-way TPC-H join +
#                               aggregate)
# Round 5 (final) registered dedup_clusters (never gated — inside the
# cap), so 10 entries sit out per round; one more 2-round-green pair
# (green since r3, identical 25-pair result set at sf0.01):
#   dedup_minhash_lsh  <-> dedup_ngram_jaccard  (shingle near-dup pairs,
#                               exact jaccard>=0.8 verify; candidate
#                               generation LSH vs equi-join; the family
#                               is additionally covered every round by
#                               the never-demoted dedup_clusters)
# Round 5 (final) also registered streaming_neardup_pairs (never gated
# — inside the cap), so 11 entries sit out per round; one more
# 2-round-green plan-family pair:
#   rollup_lang_source <-> pivot_event_types    (multi-dimension
#                               reshaping aggregates — GROUPING SETS vs
#                               pivot — over the same base tables)
# Round 5 (final) also registered token_rarity_scores (never gated —
# inside the cap), so 12 entries sit out per round; two more
# 2-round-green plan-family additions:
#   events_sessionize  <-> events_running_sum   (3rd member of the
#                               per-key ordered event-window family
#                               with events_lead_lag; running_sum is
#                               in-gate every even round, lead_lag +
#                               sessionize every odd round)
#   asof_join_latest_order <-> range_join_value_buckets (non-equi-join
#                               family; the range-join partner is never
#                               demoted)
# Round 5 (final) also registered search_bm25 (never gated — inside
# the cap), so 13 entries sit out per round; one more 2-round-green
# plan-family pair:
#   search_multi_term_and <-> search_multi_term_or (multi-term postings
#                               probe + per-doc aggregate; the
#                               single/multi search family keeps
#                               search_tfidf/search_pagination and now
#                               search_bm25 as additional members)
# Round 6 registered 2 more new queries (search_bm25_multi,
# packing_blocks — both never gated, inside the cap), so 15 entries sit
# out per round; two more plan-family pairs, both green in r4 AND r5
# (CORRECTNESS_r04/r05):
#   tpch_q4_semijoin   <-> tpch_q14_promo      (single-join filtered
#                               aggregate over orders/lineitem)
#   json_props_topk    <-> regex_priority_codes (string-extraction +
#                               top-k aggregate)
# The 10 round-5 additions (gopher..search_bm25 in NEVER_YET_GATED)
# earn their second consecutive green THIS round and become
# rotation-eligible in r7.
# Round 6 (late) registered dedup_exact_substrings (never gated, inside
# the cap), so 16 entries sit out per round; one more pair, green since
# r1 and r4+r5-green (CORRECTNESS_r04/r05):
#   value_percentiles  <-> agg_distinct_users   (single-pass scan
#                               aggregate over the events table)
# Round 6 (final) registered semdedup_corpus and mixture_resample_counts
# (never gated, inside the cap), so 18 entries sit out per round; two
# more pairs, both members r4+r5-green (CORRECTNESS_r04/r05):
#   text_quality       <-> doc_fingerprint      (per-row JVM text-feature
#                               scan over documents, no shuffle)
#   lang_id_counts     <-> token_count_by_source (tokenize -> groupBy
#                               aggregate over documents)
# Round 6 (final) also registered interleaved_packing (never gated,
# inside the cap), so 19 entries sit out per round; one more pair, both
# members r4+r5-green (CORRECTNESS_r04/r05):
#   update_latest      <-> delete_antijoin      (tombstone anti-join
#                               mutation reads over the catalog table)
# Round 6 (final) also registered collocations_pmi_topk (never gated,
# inside the cap), so 20 entries sit out per round; one more pair, both
# members r4+r5-green (CORRECTNESS_r04/r05):
#   dedup_simhash      <-> embedding_near_dups_lsh (signature-bucketed
#                               near-dup pair generation with exact
#                               verify — bit-signature hamming vs
#                               sign-LSH cosine; the near-dup family
#                               additionally keeps never-demoted
#                               dedup_clusters + streaming_neardup_pairs
#                               under a current-round signal)
# Round 6 (final) also registered c4_clean_audit and
# paragraph_dedup_docs (never gated, inside the cap), so 22 entries sit
# out per round; two more pairs, both members r4+r5-green
# (CORRECTNESS_r04/r05):
#   term_doc_freq      <-> bpe_token_count_by_lang (members 3+4 of the
#                               tokenize -> groupBy count-aggregate
#                               family with lang_id_counts <->
#                               token_count_by_source)
#   filter_sentinel_semantics <-> point_lookup (pinned single-row
#                               predicate probes through the catalog
#                               forward-index scan — MaxInt64 sentinel
#                               law vs PK equality; the filter-dispatch
#                               family keeps filters_all_ops <->
#                               search_filtered in rotation as well)
# Round 6 (final) also registered hll_distinct_events and
# cms_term_counts (never gated, inside the cap), so 24 entries sit out
# per round; two more pairs, all members r4+r5-green
# (CORRECTNESS_r04/r05):
#   set_ops_docs       <-> dedup_exact         (exact content-identity
#                               semantics over documents — INTERSECT/
#                               EXCEPT row equality vs md5-content
#                               grouping)
#   ann_lsh            <-> ann_ivf             (bucketed ANN top-k probe
#                               with exact cosine re-rank — sign-LSH
#                               hamming probe vs IVF n_probe lists.
#                               This amends the older "production ANN
#                               paths never demoted" note: the family
#                               now has 5 members, and one bucketed
#                               production path stays in-gate every
#                               round — ann_ivf in even rounds, ann_lsh
#                               in odd — alongside the never-demoted
#                               embedding_near_dups_lsh)
# Round 6 (final) also registered streaming_cms_term_counts (never
# gated, inside the cap), so 25 entries sit out per round; two more
# single-member additions to existing families, both r4+r5-green:
#   range_join_value_buckets (even) joins the non-equi-join family as
#                               asof_join_latest_order's partner
#                               (amends the "range-join partner never
#                               demoted" note: the pair now alternates
#                               like every other family)
#   multimodal_decode (odd)  joins the synth_media -> mapInPandas
#                               family as a 3rd member with
#                               frame_sample_stats / thumbnail_stats
#                               (partner thumbnail_stats is in-gate
#                               every odd round)
_GATE_ROTATION = [
    # even rounds (r4, r6, ...)
    [
        "embedding_topk_pairs",
        "search_pagination",
        "streaming_hourly_window",
        "filters_all_ops",
        "events_lead_lag",
        "tpch_q6",
        "thumbnail_stats",
        "window_topn_orders",
        "tpch_q3_top10",
        "dedup_minhash_lsh",
        "rollup_lang_source",
        "events_sessionize",
        "search_multi_term_and",
        "tpch_q4_semijoin",
        "json_props_topk",
        "value_percentiles",
        "doc_fingerprint",
        "token_count_by_source",
        "delete_antijoin",
        "dedup_simhash",
        "term_doc_freq",
        "filter_sentinel_semantics",
        "set_ops_docs",
        "ann_lsh",
        "range_join_value_buckets",
    ],
    # odd rounds (r5, r7, ...)
    [
        "knn_brute",
        "search_tfidf",
        "events_hourly",
        "search_filtered",
        "events_running_sum",
        "tpch_q1",
        "frame_sample_stats",
        "window_ntile_users",
        "tpch_q5_regional",
        "dedup_ngram_jaccard",
        "pivot_event_types",
        "asof_join_latest_order",
        "search_multi_term_or",
        "tpch_q14_promo",
        "regex_priority_codes",
        "agg_distinct_users",
        "text_quality",
        "lang_id_counts",
        "update_latest",
        "embedding_near_dups_lsh",
        "bpe_token_count_by_lang",
        "point_lookup",
        "dedup_exact",
        "ann_ivf",
        "multimodal_decode",
    ],
]
_GATE_ROUND = 6  # bump each round — picks the rotation slot
_GATE_OVERFLOW = _GATE_ROTATION[_GATE_ROUND % len(_GATE_ROTATION)]


def _reorder_for_gate() -> None:
    keep = [n for n in QUERIES if n not in _GATE_OVERFLOW]
    order = keep + [n for n in _GATE_OVERFLOW if n in QUERIES]
    for registry in (QUERIES, ORACLES):
        snapshot = dict(registry)
        registry.clear()
        for name in order:
            if name in snapshot:
                registry[name] = snapshot[name]


_reorder_for_gate()
