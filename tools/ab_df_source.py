"""Back-to-back A/B: search df_source='postings' vs 'count' (round-3 advice #2).

Measures the EXACT bench shape — force(QUERIES[name](spark, sf_dir)) via the
noop sink, all columns live — at sf0.1 on local[32], alternating modes
A,B,A,B,... in one process (one quiet window) so a box throttle hits both
arms equally. The mode is injected by wrapping queries.search so the
registered query functions run unmodified.

Usage: python tools/ab_df_source.py [sf_dir] [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

import spider_engine_spark.queries as Q  # noqa: E402
from spider_engine_spark.session import get_spark  # noqa: E402

_ORIG_SEARCH = Q.search
_MODE = {"value": "postings"}


def _patched_search(*args, **kwargs):
    kwargs["df_source"] = _MODE["value"]
    return _ORIG_SEARCH(*args, **kwargs)


Q.search = _patched_search


def force(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm readers

    names = ["search_tfidf", "search_filtered"]
    for name in names:  # warm-up pass, discarded
        force(Q.QUERIES[name](spark, sf_dir))

    for name in names:
        times = {"postings": [], "count": []}
        for _ in range(reps):
            for mode in ("postings", "count"):  # interleaved A/B
                _MODE["value"] = mode
                t0 = time.monotonic()
                force(Q.QUERIES[name](spark, sf_dir))
                times[mode].append(time.monotonic() - t0)
        for mode, ts in times.items():
            print(
                f"{name:16s} {mode:8s} best={min(ts):.2f}s "
                f"median={statistics.median(ts):.2f}s"
            )
    spark.stop()


if __name__ == "__main__":
    main()
