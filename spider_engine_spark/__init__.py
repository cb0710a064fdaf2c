"""spider_engine_spark — a PySpark-native analytics/search engine.

A from-scratch rebuild of the capabilities of hq-cml/spider-engine (a Go
single-node full-text search engine; read-only reference at
/root/reference) re-expressed Spark-first:

- tokenizers (reference core/index/common.go:86-154) as vectorized
  pandas UDFs + a pure-JVM fast path,
- inverted-index build/compaction (invertedindex.go) as
  explode -> groupBy(term) -> sort_array(collect_list(...)),
- the full search pipeline (table.go:974-1072) as declarative DataFrame
  composition: term probe -> delete anti-join -> AND filters -> TF-IDF ->
  rank -> paginate -> hydrate,
- a URL-frontier + fetch scheduler (the north-star system) with a
  partitioned cuckoo-filter seen-set, per-host politeness with salted
  two-phase aggregation, and a bucketed priority queue,
- training-data-pipeline operators: dedup (exact/minhash/simhash/jaccard/
  embedding), ANN similarity search, text quality analysis, multimodal
  column plumbing.

Everything is built on public PySpark APIs only.
"""

__version__ = "0.1.0"

__all__ = [
    "Catalog",
    "CrawlJob",
    "SpiderController",
    "serve_rest",
    "ReplaySimulator",
    "TableIO",
    "get_spark",
]


def __getattr__(name):  # lazy: keep `import spider_engine_spark` light
    if name == "Catalog":
        from spider_engine_spark.plans.catalog import Catalog

        return Catalog
    if name == "SpiderController":
        from spider_engine_spark.controller import SpiderController

        return SpiderController
    if name == "serve_rest":
        from spider_engine_spark.controller import serve

        return serve
    if name == "CrawlJob":
        from spider_engine_spark.operators.frontier import CrawlJob

        return CrawlJob
    if name == "ReplaySimulator":
        from spider_engine_spark.simulator import ReplaySimulator

        return ReplaySimulator
    if name == "TableIO":
        from spider_engine_spark.sources.tableio import TableIO

        return TableIO
    if name == "get_spark":
        from spider_engine_spark.session import get_spark

        return get_spark
    raise AttributeError(name)
