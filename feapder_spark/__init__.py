"""feapder_spark — a from-scratch PySpark-native re-expression of the
Boris-code/feapder crawl engine (reference at /root/reference, read-only).

The reference is a threaded, Redis/MySQL-backed web-crawler framework.  This
package re-expresses its semantics — priority frontier, fingerprint dedup
(URL-seen set), lease-based at-least-once delivery, retry/failure routing,
batched item export, batch/checkpoint resumption — as iterative DataFrame
jobs over snapshot-committed tables (Iceberg-style; parquet-backed in this
sandbox because no Iceberg jars ship with it), with vectorized pandas/Arrow
UDFs and no per-row Python in the hot path.

Layout
------
- ``feapder_spark.urlnorm``        URL canonicalization + fingerprints (request.py:465-480)
- ``feapder_spark.operators``      dedup engines, top-k, minhash/simhash, similarity, text stats
- ``feapder_spark.functions``      column-level function library (pure pyspark.sql.functions)
- ``feapder_spark.crawl``          frontier / fetch / parse / politeness / engine loop
- ``feapder_spark.store``          snapshot-committed table store (Iceberg-style)
- ``feapder_spark.sources``        readers for the engine state tables + test data
- ``feapder_spark.streaming``      Structured Streaming feeds (metrics/event ingestion)
"""

__version__ = "0.1.0"
