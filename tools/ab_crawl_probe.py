"""One bench-crawl-probe trial (bench.py's crawl_2steps block, verbatim
parameters). For an interleaved code-version A/B, check out each
version into its own git worktree and run from inside the tree under
test (absolute script path so every tree runs the SAME harness):

    cd <tree> && python /root/repo/tools/ab_crawl_probe.py <label>

Prints one JSON line with phase timings. Round-5 usage + results:
PLANS.md "Round-5 A/B"; raw rows in BENCH/ab_crawl_r3r4r5.jsonl.
"""

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from spider_engine_spark import webmodel as wm  # noqa: E402
from spider_engine_spark.operators.frontier import CrawlJob  # noqa: E402
from spider_engine_spark.session import get_spark  # noqa: E402

label = sys.argv[1] if len(sys.argv) > 1 else "?"
spark = get_spark(app_name=f"ab_{label}", master="local[32]")

# match bench.py: untimed warm-up so the trial measures the crawl
spark.range(1_000_000).selectExpr("sum(id)").write.mode(
    "overwrite"
).format("noop").save()

crawl_root = tempfile.mkdtemp(prefix=f"ab_crawl_{label}_")
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
    steps = []
    for _ in range(2):
        ts = time.monotonic()
        m = job.run_step()
        steps.append(round(time.monotonic() - ts, 3))
        processed += m.get("fetched", 0) + m.get("candidates", 0)
    crawl_sec = time.monotonic() - t0
    job.flush()
    flush_sec = time.monotonic() - t0 - crawl_sec
    print(json.dumps({
        "label": label,
        "crawl_sec": round(crawl_sec, 3),
        "step_secs": steps,
        "flush_sec": round(flush_sec, 3),
        "urls_per_sec": round(processed / crawl_sec, 1),
    }))
finally:
    shutil.rmtree(crawl_root, ignore_errors=True)
    spark.stop()
