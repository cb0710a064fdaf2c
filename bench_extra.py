"""Extra benchmarks for the optimization rounds (bench.py is FROZEN).

Usage:
  python bench_extra.py time <query> [reps]     # noop-sink timing, guide §1.4
  python bench_extra.py plan <query> [outfile]  # .explain("formatted") capture
  python bench_extra.py ingest                  # catalog_ingest_89k probe
  python bench_extra.py crawl                   # crawl_2steps probe w/ phases

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and
$SPARK_GRAFT_CPUS like bench.py. Diagnostics to stderr, results to stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def force(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from spider_engine_spark.queries import QUERIES
    from spider_engine_spark.session import get_spark

    mode = sys.argv[1]
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")
    # same warm-up as bench.py so first-job costs don't pollute timings
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    force(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(1000)
        .groupBy("lang")
        .count()
    )

    if mode == "time":
        name = sys.argv[2]
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.monotonic()
            force(QUERIES[name](spark, sf_dir))
            samples.append(round(time.monotonic() - t0, 3))
        print(json.dumps({"query": name, "samples": samples,
                          "min": min(samples)}))
    elif mode == "plan":
        name = sys.argv[2]
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        if len(sys.argv) > 3:
            with open(sys.argv[3], "w") as f:
                f.write(plan)
            log(f"wrote {sys.argv[3]}")
        else:
            print(plan)
    elif mode == "ingest":
        from pyspark.sql import functions as F

        from spider_engine_spark.plans.catalog import Catalog

        ingest_root = tempfile.mkdtemp(prefix="bx_ingest_")
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
                    F.concat(
                        F.lit("w"),
                        F.pmod(F.xxhash64("id", F.lit(i)), F.lit(20000)),
                    )
                    for i in range(20)
                ],
            )
            corpus = spark.range(n_rows).select(
                F.concat(F.lit("k"), F.col("id")).alias("key"),
                words.alias("weibo_content"),
                F.concat(
                    F.lit("user"), F.pmod(F.col("id"), F.lit(5000))
                ).alias("user_name"),
                F.lit("2024-01-01 00:00:00").alias("date"),
                (F.col("id") % 100000).alias("read_cnt"),
            )
            t0 = time.monotonic()
            accepted, burned = t.add_docs_df(corpus)
            dt = time.monotonic() - t0
            print(json.dumps({"ingest_sec": round(dt, 3),
                              "accepted": accepted, "burned": burned}))
        finally:
            shutil.rmtree(ingest_root, ignore_errors=True)
    elif mode == "crawl":
        from spider_engine_spark import webmodel as wm
        from spider_engine_spark.operators.frontier import CrawlJob

        crawl_root = tempfile.mkdtemp(prefix="bx_crawl_")
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
            out = []
            for _ in range(2):
                m = job.run_step()
                out.append(m)
            dt = time.monotonic() - t0
            job.flush()
            for m in out:
                log(json.dumps(m.get("phases", {})))
            print(json.dumps({"crawl_sec": round(dt, 3),
                              "phases": [m.get("phases", {}) for m in out]}))
        finally:
            shutil.rmtree(crawl_root, ignore_errors=True)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    spark.stop()


if __name__ == "__main__":
    main()
