"""Driver-contract regression guard: a fast subset of the full
tools/check_oracles.py comparison runs inside pytest so `python -m
pytest` alone catches Spark-vs-DuckDB divergence."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
FAST_QUERIES = ["tpch_q1", "delete_antijoin", "point_lookup",
                "token_count_by_source", "search_tfidf"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(
            tuple(
                "NaN" if isinstance(r[i], float) and math.isnan(r[i]) else r[i]
                for i in order
            )
        )
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    cur = duck.execute(entrymod.oracle_sql()[name])
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    srows = [tuple(r) for r in sdf.collect()]
    assert sorted(sdf.columns) == sorted(ocols)
    assert norm(srows, sdf.columns) == norm(orows, ocols)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
