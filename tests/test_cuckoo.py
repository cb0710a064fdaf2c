"""Cuckoo filter unit tests (no false negatives; FP audit; serde)."""

from __future__ import annotations

import numpy as np

from spider_engine_spark.operators.cuckoo import SLOTS, CuckooFilter


def test_insert_contains_no_false_negatives():
    rng = np.random.default_rng(42)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.int64).astype(np.uint64)
    f = CuckooFilter(capacity=8000)
    assert f.insert(keys) == len(keys)
    assert f.contains(keys).all()


def test_false_positive_rate_bounded():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.int64).astype(np.uint64)
    other = rng.integers(0, 2**63, size=20000, dtype=np.int64).astype(np.uint64)
    other = np.setdiff1d(other, keys)
    f = CuckooFilter(capacity=8000)
    f.insert(keys)
    fp = f.contains(other).mean()
    # 16-bit fingerprints, 8 slots checked -> theoretical ~8/65536 = 0.012%
    assert fp < 0.01


def test_serde_roundtrip():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, size=1000, dtype=np.int64).astype(np.uint64)
    f = CuckooFilter(capacity=2000)
    f.insert(keys)
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.nbuckets == f.nbuckets
    assert g.contains(keys).all()
    assert (g.table == f.table).all()


def test_high_load_insert_deterministic_and_complete():
    """At the 0.84 design load the two-pass bulk insert must still place
    every key (eviction residue path), keep the no-false-negative
    property, and be a deterministic function of (table, input order):
    two identical runs produce byte-identical tables."""
    rng = np.random.default_rng(11)
    nb = 1 << 12  # 4096 buckets * 4 slots = 16384 slots
    keys = rng.integers(0, 2**63, size=int(nb * SLOTS * 0.84),
                        dtype=np.int64).astype(np.uint64)
    tables = []
    for _ in range(2):
        f = CuckooFilter(0, table=np.zeros((nb, SLOTS), dtype=np.uint16))
        assert f.insert(keys) == len(keys)
        assert f.contains(keys).all()
        tables.append(f.to_bytes())
    assert tables[0] == tables[1]
    # incremental inserts over a non-empty table behave the same way
    half = len(keys) // 2
    g = CuckooFilter(0, table=np.zeros((nb, SLOTS), dtype=np.uint16))
    g.insert(keys[:half])
    g.insert(keys[half:])
    assert g.contains(keys).all()


def test_insert_duplicate_hashes_keep_copies():
    """Duplicate hashes occupy separate slots (cuckoo multiset insert) —
    the two copies share the SAME bucket pair, which is what makes
    fingerprint persistence (and the streaming FP-audit) sound."""
    f = CuckooFilter(capacity=64)
    keys = np.array([12345, 12345, 12345], dtype=np.uint64)
    assert f.insert(keys) == 3
    assert f.count_nonzero == 3
    assert f.contains(keys).all()


def test_empty_probe():
    f = CuckooFilter(capacity=100)
    assert f.contains(np.array([], dtype=np.uint64)).shape == (0,)
    assert not f.contains(np.array([123456789], dtype=np.uint64))[0]
