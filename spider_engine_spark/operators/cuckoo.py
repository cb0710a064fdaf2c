"""Partitioned cuckoo-filter URL-seen set.

north_rule: "a partitioned cuckoo-filter URL-seen set built via vectorized
Arrow UDFs over canonicalized+xxhash64'd URLs". Design:

- URLs are canonicalized then hashed with Spark's native `xxhash64`
  (JVM-side); the 64-bit hash is the only thing the filter ever sees.
- The seen-set is range-partitioned into P shards by `pmod(hash, P)`;
  each shard owns one serialized cuckoo table (numpy uint16 fingerprints,
  4 slots per bucket) stored as a row (shard, nbuckets, count, data).
- Probe and insert run as grouped/cogrouped Arrow UDFs
  (`applyInPandas`): candidates are shuffled to their shard, the shard's
  table is deserialized once per group, membership is a fully vectorized
  numpy lookup. No false negatives; false positives are resolved by an
  exact semi-join against the exact seen table (the at-scale fast path:
  only maybe-seen candidates pay the exact check).

Sizing at the design scale of 10^10 URLs (SURVEY.md §7.3 risk 4): with
P = 16384 shards, each shard holds ~6.1e5 URLs -> 2^18 buckets * 4 slots
* 2 bytes ~= 2 MiB per shard table, ~32 GiB across the cluster, streamed
per-group through Arrow — never materialized on one executor. The same
code runs here at P=8.

The filter replaces the reference's per-table primary-key map + bolt
btree membership check (core/table/table.go:451-454, 721-746).
"""

from __future__ import annotations

import numpy as np

FP_MASK = 0xFFFF
SLOTS = 4
MAX_KICKS = 500


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


class CuckooFilter:
    """Vectorized cuckoo filter over uint64 hashes (numpy table)."""

    def __init__(self, capacity: int, table: np.ndarray | None = None):
        if table is not None:
            self.table = table
        else:
            nb = _next_pow2(max(16, int(capacity / (SLOTS * 0.84)) + 1))
            self.table = np.zeros((nb, SLOTS), dtype=np.uint16)
        self.nbuckets = self.table.shape[0]

    # -- serialization ------------------------------------------------
    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        arr = np.frombuffer(data, dtype=np.uint16).reshape(-1, SLOTS).copy()
        return cls(0, table=arr)

    # -- hashing ------------------------------------------------------
    def _fp_idx(self, hashes: np.ndarray):
        h = hashes.astype(np.uint64)
        fp = ((h >> np.uint64(48)) & np.uint64(FP_MASK)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks empty slots
        mask = np.uint64(self.nbuckets - 1)
        i1 = (h & mask).astype(np.int64)
        alt = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & mask
        i2 = (np.uint64(0) + i1.astype(np.uint64) ^ alt) & mask
        return fp, i1, i2.astype(np.int64)

    # -- ops ----------------------------------------------------------
    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership probe (no false negatives)."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._fp_idx(np.asarray(hashes))
        t = self.table
        hit1 = (t[i1] == fp[:, None]).any(axis=1)
        hit2 = (t[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def insert(self, hashes: np.ndarray) -> int:
        """Insert hashes (per-item with eviction); returns #inserted.
        Raises if the table is over-full — callers size capacity up front."""
        if len(hashes) == 0:
            return 0
        fp_all, i1_all, i2_all = self._fp_idx(np.asarray(hashes))
        t = self.table
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
            # evict: deterministic pseudo-random walk
            idx = int(i1)
            cur = np.uint16(fp)
            for kick in range(MAX_KICKS):
                rng_state = (rng_state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
                slot = rng_state % SLOTS
                cur, t[idx, slot] = t[idx, slot], cur
                alt = (
                    np.uint64(idx)
                    ^ ((np.uint64(cur) * np.uint64(0x5BD1E995)) & np.uint64(self.nbuckets - 1))
                ) & np.uint64(self.nbuckets - 1)
                idx = int(alt)
                row = t[idx]
                empty = np.where(row == 0)[0]
                if len(empty):
                    row[empty[0]] = cur
                    break
            else:
                raise RuntimeError(
                    f"cuckoo filter over-full (nbuckets={self.nbuckets})"
                )
            n += 1
        return n

    @property
    def count_nonzero(self) -> int:
        return int((self.table != 0).sum())
