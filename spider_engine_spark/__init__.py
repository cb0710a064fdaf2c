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
