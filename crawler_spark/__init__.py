"""crawler_spark — a PySpark-native crawl-then-filter analytics engine.

A from-scratch re-expression of the capabilities of ``eyjs/crawler``
(reference at /root/reference, studied for behavior only) as an idiomatic
Spark engine:

* a distributed URL frontier held in versioned tables (Iceberg-style
  commit semantics over parquet via :mod:`crawler_spark.tableio`),
* a partitioned Bloom-filter URL-seen set keyed by
  ``xxhash64(canonical_url)`` (:mod:`crawler_spark.operators.seen`),
* per-host politeness (robots rules + crawl-delay budget) enforced through
  a salted groupBy (:mod:`crawler_spark.operators.politeness`),
* a priority queue realized as a Window rank over ``(host, depth, score)``
  (:mod:`crawler_spark.operators.frontier`),
* vectorized pandas/Arrow UDF content extraction + quality gates
  (:mod:`crawler_spark.functions`), and
* training-data pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) in :mod:`crawler_spark.operators`.

Everything per-row is Arrow-batched; no per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
