"""Micro-benchmark: per-item vs two-pass vectorized cuckoo insert.

Round-4 verdict #3 asked for the insert stage to stop being the one
row-at-a-time Python loop in a hot-ish path.  This tool times the OLD
per-item algorithm (inlined below, verbatim semantics) against the NEW
CuckooFilter.insert bulk path at the shard sizes the scaling harness
uses (capacity 2^16 per shard; batch sizes from a light superstep to the
0.84 design load), and prints one JSON line.

Run: python tools/bench_cuckoo_insert.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from spider_engine_spark.operators.cuckoo import (  # noqa: E402
    MAX_KICKS,
    SLOTS,
    CuckooFilter,
)


def _insert_per_item(filt: CuckooFilter, hashes: np.ndarray) -> int:
    """The pre-round-5 per-item insert (operators/cuckoo.py history),
    kept here only as the benchmark baseline."""
    if len(hashes) == 0:
        return 0
    fp_all, i1_all, i2_all = filt._fp_idx(np.asarray(hashes))
    t = filt.table
    rng_state = 0x9E3779B97F4A7C15
    n = 0
    for fp, i1, i2 in zip(fp_all, i1_all, i2_all):
        placed = False
        for idx in (i1, i2):
            row = t[idx]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                placed = True
                break
        if placed:
            n += 1
            continue
        idx = int(i1)
        cur = np.uint16(fp)
        for _kick in range(MAX_KICKS):
            rng_state = (
                rng_state * 6364136223846793005 + 1442695040888963407
            ) % (1 << 64)
            slot = rng_state % SLOTS
            cur, t[idx, slot] = t[idx, slot], cur
            alt = (
                np.uint64(idx)
                ^ (
                    (np.uint64(cur) * np.uint64(0x5BD1E995))
                    & np.uint64(filt.nbuckets - 1)
                )
            ) & np.uint64(filt.nbuckets - 1)
            idx = int(alt)
            row = t[idx]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                break
        else:
            raise RuntimeError("over-full")
        n += 1
    return n


def bench_one(n_keys: int, capacity: int, repeats: int = 5) -> dict:
    rng = np.random.default_rng(97)
    keys = rng.integers(0, 2**63, size=n_keys, dtype=np.int64).astype(
        np.uint64
    )
    times = {"per_item": [], "bulk": []}
    for _ in range(repeats):
        f_old = CuckooFilter(capacity)
        t0 = time.perf_counter()
        _insert_per_item(f_old, keys)
        times["per_item"].append(time.perf_counter() - t0)

        f_new = CuckooFilter(capacity)
        t0 = time.perf_counter()
        f_new.insert(keys)
        times["bulk"].append(time.perf_counter() - t0)
        # both variants must agree on membership (no false negatives)
        assert f_new.contains(keys).all() and f_old.contains(keys).all()
    old = min(times["per_item"])
    new = min(times["bulk"])
    return {
        "n_keys": n_keys,
        "capacity": capacity,
        "load": round(n_keys / (CuckooFilter(capacity).nbuckets * SLOTS), 3),
        "per_item_sec": round(old, 4),
        "bulk_sec": round(new, 4),
        "speedup": round(old / new, 1),
    }


def main() -> None:
    cap = 1 << 16  # run_crawl default shard capacity
    slots_total = CuckooFilter(cap).nbuckets * SLOTS
    rows = [
        # trickle regime: a handful of admits into a DESIGN-SIZE shard
        # (2^18 buckets = the scaling harness capacity config) — guards
        # against O(table) per-call preprocessing (round-5 review #1)
        bench_one(500, 1 << 19, repeats=20),
        bench_one(5_000, cap),      # light superstep admit batch
        bench_one(55_000, cap),     # heavy batch
        bench_one(int(slots_total * 0.84), cap),  # 0.84 design load
    ]
    print(json.dumps({"metric": "cuckoo_insert_bench", "rows": rows}))


if __name__ == "__main__":
    main()
