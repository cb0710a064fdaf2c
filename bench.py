"""Benchmark harness — the driver runs this per round.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the indexer
throughput and a frontier-crawl throughput probe, and prints ONE JSON
line:

  {"metric": "total_bench_sec", "value": N, "unit": "sec",
   "queries": {...}, "sf": ..., "index_docs_per_sec": ...,
   "crawl_urls_per_sec": ...}

All diagnostics go to stderr. The scaling study (local[8] vs local[32],
BASELINE.md criterion) lives in tools/scaling_bench.py and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


HEADLINE = [
    "search_tfidf",
    "search_filtered",
    "term_doc_freq",
    "tpch_q1",
    "tpch_q3_top10",
    "tpch_q5_regional",
    "window_topn_orders",
    "events_hourly",
    "events_sessionize",
    "agg_distinct_users",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_near_dups_lsh",
    "knn_brute",
    "asof_join_latest_order",
    "tpch_q6",
    "tpch_q4_semijoin",
    "json_props_topk",
    "events_lead_lag",
    # round-5 additions (absent from BENCH_r<=4 — subtract these lines
    # for a comparable-subset total vs earlier rounds; see BENCH/BASELINE.md)
    "gopher_repetition_fracs",
    "quality_gate_audit",
    "winnowing_fingerprints",
    "benchmark_contamination",
    "corpus_sample_strata",
    "pii_scrub_audit",
    "sequence_packing",
    "dedup_clusters",
    # round-6 additions (absent from BENCH_r<=5; same accounting rule —
    # BENCH/BASELINE.md §4b). window_ntile_users is NOT new but changed
    # plan (distributed ntile replaced the global-window funnel), so it
    # joins the headline to carry a per-round perf signal going forward.
    "window_ntile_users",
    "search_bm25_multi",
    "packing_blocks",
    "dedup_exact_substrings",
    "semdedup_corpus",
    "mixture_resample_counts",
    "collocations_pmi_topk",
    "paragraph_dedup_docs",
    "cms_term_counts",
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def force(df):
    """Materialize everything (noop sink keeps all columns live)."""
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from spider_engine_spark import webmodel as wm
    from spider_engine_spark.operators.frontier import CrawlJob
    from spider_engine_spark.operators.postings import build_postings_native
    from spider_engine_spark.queries import QUERIES
    from spider_engine_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    t_total = time.monotonic()
    timings: dict[str, float] = {}

    # warm the JVM/readers once so per-query numbers measure the query.
    # The noop force() pays the session's one-time costs (noop-sink
    # registration, codegen/JIT infra, first real job scheduling) —
    # measured at ~2.6 s landing entirely on the FIRST timed query
    # otherwise (round-3's phantom "search_tfidf regression"); the
    # warm-up pipeline is deliberately unrelated to any headline query.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    force(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(1000)
        .groupBy("lang")
        .count()
    )

    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.monotonic()
        force(fn(spark, sf_dir))
        timings[name] = round(time.monotonic() - t0, 3)
        log(f"query {name}: {timings[name]}s")

    # indexer throughput: docs/sec through tokenize -> invert (native path)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    t0 = time.monotonic()
    force(build_postings_native(docs, "doc_id", "text"))
    index_sec = time.monotonic() - t0
    timings["index_build"] = round(index_sec, 3)
    index_docs_per_sec = round(n_docs / index_sec, 1)
    log(f"index build: {n_docs} docs in {index_sec:.2f}s")

    # reference-scale corpus import (S1): the reference's only scale
    # anchors are 54k/89k-doc weibo imports (TODO:4-8); same shape here,
    # through the full catalog write path (typing, PK checks, docId
    # assignment, postings build, snapshot commit)
    import uuid as _uuid

    from pyspark.sql import functions as F

    from spider_engine_spark.plans.catalog import Catalog

    ingest_root = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        cat = Catalog(spark, ingest_root)
        cat.create_database("bench")
        t = cat.create_table(
            "bench",
            "weibo",
            {
                "key": "primary",
                "weibo_content": "words",
                "user_name": "whole",
                "date": "time",
                "read_cnt": "number",
            },
        )
        n_rows = 89_000
        words = F.concat_ws(
            " ",
            *[
                F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(i)), F.lit(20000)))
                for i in range(20)
            ],
        )
        corpus = spark.range(n_rows).select(
            F.concat(F.lit("k"), F.col("id")).alias("key"),
            words.alias("weibo_content"),
            F.concat(F.lit("user"), F.pmod(F.col("id"), F.lit(5000))).alias(
                "user_name"
            ),
            F.lit("2024-01-01 00:00:00").alias("date"),
            (F.col("id") % 100000).alias("read_cnt"),
        )
        t0 = time.monotonic()
        accepted, burned = t.add_docs_df(corpus)
        ingest_sec = time.monotonic() - t0
        timings["catalog_ingest_89k"] = round(ingest_sec, 3)
        ingest_docs_per_sec = round(accepted / ingest_sec, 1)
        log(f"catalog ingest: {accepted} docs in {ingest_sec:.2f}s")
    finally:
        shutil.rmtree(ingest_root, ignore_errors=True)

    # frontier crawl probe: 2 supersteps on a bench-scale web
    crawl_root = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        cfg = wm.WebConfig(num_hosts=2000, vocab_size=5000)
        job = CrawlJob(
            spark,
            crawl_root,
            seeds=wm.seed_urls(2000, cfg),
            num_shards=16,
            salts=4,
            index=True,
            cfg=cfg,
            checkpoint_every=3,
        )
        t0 = time.monotonic()
        processed = 0
        for _ in range(2):
            m = job.run_step()
            processed += m.get("fetched", 0) + m.get("candidates", 0)
        crawl_sec = time.monotonic() - t0
        job.flush()
        timings["crawl_2steps"] = round(crawl_sec, 3)
        crawl_urls_per_sec = round(processed / crawl_sec, 1)
        log(f"crawl: {processed} urls in {crawl_sec:.2f}s")
    finally:
        shutil.rmtree(crawl_root, ignore_errors=True)

    total = time.monotonic() - t_total
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "index_docs_per_sec": index_docs_per_sec,
                "catalog_ingest_docs_per_sec": ingest_docs_per_sec,
                "crawl_urls_per_sec": crawl_urls_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
