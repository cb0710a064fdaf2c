"""Driver contract for the spark-graft builder (PySpark target).

entry()   — flagship search over /root/testdata/sf0.001.
queries() — one entry per implemented operator (SURVEY.md §2 + the
            training-data-pipeline extensions), implemented in
            spider_engine_spark.queries and friends.
oracle_sql() — matching DuckDB SQL per query (omitted for ops that are
            not SQL-expressible; driver falls back to rows-only checks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the package lives next to this file; make the import robust to the
# driver's working directory
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full-text search with TF-IDF ranking over sf0.001."""
    from spider_engine_spark.queries import QUERIES

    return QUERIES["search_tfidf"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spider_engine_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from spider_engine_spark.queries import ORACLES

    # a callable oracle builds its SQL lazily (e.g. the crawl fixtures run
    # the pure-Python replay simulator and inline its rows as VALUES)
    return {k: (v() if callable(v) else v) for k, v in ORACLES.items()}
