"""One trial of the three bench lines touched by the r5 explode_outer
tokenizer change (search_tfidf, term_doc_freq, index_build) — for an
interleaved code-version A/B (round-5 verdict item #2: those lines
drifted 1.26-1.28x in the r5 driver bench while UNTOUCHED lines drifted
similarly, so throttle is suspected; prove it).

Usage (same harness pattern as ab_crawl_probe.py — each code variant
lives in its own git worktree, the script path is absolute so every
tree runs THIS file, cwd selects the code under test):

    cd <tree> && python /root/repo/tools/ab_tokenizer_probe.py <label>

Prints one JSON line {"label", "search_tfidf", "term_doc_freq",
"index_build"}. Raw rows: BENCH/ab_tokenizer_r6.jsonl; conclusion:
BENCH/BASELINE.md §4.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

from spider_engine_spark.operators.postings import (  # noqa: E402
    build_postings_native,
)
from spider_engine_spark.queries import QUERIES  # noqa: E402
from spider_engine_spark.session import get_spark  # noqa: E402

label = sys.argv[1] if len(sys.argv) > 1 else "?"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name=f"ab_tok_{label}", master="local[32]")


def force(df):
    df.write.mode("overwrite").format("noop").save()


# bench.py's warm-up, verbatim: pays one-time session costs untimed
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
force(
    spark.read.parquet(f"{sf_dir}/documents.parquet")
    .limit(1000)
    .groupBy("lang")
    .count()
)

out = {"label": label}
for name in ("search_tfidf", "term_doc_freq"):
    t0 = time.monotonic()
    force(QUERIES[name](spark, sf_dir))
    out[name] = round(time.monotonic() - t0, 3)

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.count()
t0 = time.monotonic()
force(build_postings_native(docs, "doc_id", "text"))
out["index_build"] = round(time.monotonic() - t0, 3)

print(json.dumps(out), flush=True)
spark.stop()
