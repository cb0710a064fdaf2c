"""TableIO snapshot-commit semantics (S3/S4/S7 analogues)."""

from __future__ import annotations

import pytest

from spider_engine_spark.sources.tableio import TableIO


def test_overwrite_versions_and_time_travel(spark, tmp_path):
    io = TableIO(str(tmp_path))
    df1 = spark.range(5).withColumnRenamed("id", "x")
    df2 = spark.range(10).withColumnRenamed("id", "x")
    v1 = io.write("t", df1, meta={"step": 1})
    v2 = io.write("t", df2, meta={"step": 2})
    assert (v1, v2) == (1, 2)
    assert io.read(spark, "t").count() == 10
    assert io.read(spark, "t", version=1).count() == 5
    assert io.meta("t") == {"step": 2}
    assert io.meta("t", version=1) == {"step": 1}


def test_append_chain_and_compact(spark, tmp_path):
    io = TableIO(str(tmp_path))
    io.write("t", spark.range(3))
    io.write("t", spark.range(3, 6), mode="append")
    io.write("t", spark.range(6, 10), mode="append")
    df = io.read(spark, "t")
    assert sorted(r.id for r in df.collect()) == list(range(10))
    io.compact(spark, "t")
    df2 = io.read(spark, "t")
    assert sorted(r.id for r in df2.collect()) == list(range(10))
    # compacted snapshot reads from a single dir
    assert len(io._entry("t")["dirs"]) == 1


def test_missing_table_raises(spark, tmp_path):
    io = TableIO(str(tmp_path))
    assert not io.exists("nope")
    with pytest.raises(FileNotFoundError):
        io.read(spark, "nope")


def test_empty_partitioned_write_is_readable(spark, tmp_path):
    """A zero-row dynamic-partition write commits a dir with NO parquet
    files (unlike unpartitioned empty writes, which leave a schema-only
    file). Such snapshots are legitimate — e.g. an all-duplicates crawl
    superstep admits nothing — and must not brick every later read."""
    from pyspark.sql import functions as F

    io = TableIO(str(tmp_path))
    full = spark.range(6).select(
        F.col("id"), (F.col("id") % 2).cast("int").alias("shard")
    )
    empty = full.filter(F.lit(False))
    # empty OVERWRITE: table reads back as a true empty frame w/ schema
    io.write("t", empty, partition_by=["shard"])
    got = io.read(spark, "t")
    assert got.count() == 0
    assert set(got.columns) == {"id", "shard"}
    # empty APPEND onto real data: prior rows survive, no throw
    io.write("t", full, mode="overwrite", partition_by=["shard"])
    io.write("t", empty, mode="append", partition_by=["shard"])
    assert io.read(spark, "t").count() == 6
    # compaction skips (and drops) the parquet-less dir
    io.write("t", full, mode="append", partition_by=["shard"])
    v = io.compact_small(spark, "t", max_bytes=1 << 60,
                         partition_by=["shard"])
    assert v is not None
    assert io.read(spark, "t").count() == 12
    for d in io._entry("t")["dirs"]:
        assert TableIO._has_data_files(d)


def test_empty_dirs_recorded_in_manifest_not_rewalked(spark, tmp_path, monkeypatch):
    """Parquet-less dirs are recorded at COMMIT time (empty_dirs);
    read() must not walk data dirs when the manifest carries the record
    (the crawl reads frontier/seen/filter every superstep). Legacy
    manifests without the key still work via the one-time write-side
    upgrade walk."""
    from pyspark.sql import functions as F

    io = TableIO(str(tmp_path))
    full = spark.range(4).select(
        F.col("id"), (F.col("id") % 2).cast("int").alias("shard")
    )
    empty = full.filter(F.lit(False))
    io.write("t", full, partition_by=["shard"])
    io.write("t", empty, mode="append", partition_by=["shard"])
    entry = io._entry("t")
    assert len(entry["empty_dirs"]) == 1
    assert entry["empty_dirs"][0] == entry["dirs"][-1]
    # upgraded manifest: read() needs no filesystem walk at all
    monkeypatch.setattr(
        TableIO, "_has_data_files",
        staticmethod(lambda d: (_ for _ in ()).throw(AssertionError("walked"))),
    )
    assert io.read(spark, "t").count() == 4
    monkeypatch.undo()
    # legacy manifest (no key): falls back to walking, still correct
    m = io._load_manifest("t")
    for v in m["versions"]:
        v.pop("empty_dirs", None)
    io._commit_manifest("t", m)
    assert io.read(spark, "t").count() == 4
    # and the next append upgrades it back
    io.write("t", full, mode="append", partition_by=["shard"])
    assert "empty_dirs" in io._entry("t")
    assert io.read(spark, "t").count() == 8
