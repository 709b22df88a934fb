"""ExpireFilter-style TTL pruning (expirefilter.py:71-75) and explicit
hot-domain salting of the fused stage."""

import datetime

from pyspark.sql import functions as F

from feapder_spark.crawl.fetcher import fetch_parse_batch
from feapder_spark.crawl.synthweb import SyntheticWeb
from feapder_spark.operators.seen_set import prune_expired


def test_prune_expired(spark):
    now = datetime.datetime.now()
    old = now - datetime.timedelta(seconds=3600)
    seen = spark.createDataFrame(
        [("f1", now), ("f2", old)], "fingerprint STRING, added_at TIMESTAMP"
    )
    kept = prune_expired(seen, ttl_seconds=600)
    assert [r.fingerprint for r in kept.collect()] == ["f1"]
    # everything survives a long TTL
    assert prune_expired(seen, ttl_seconds=7200).count() == 2


def test_host_salting_spreads_hot_domain(spark):
    """With one dominant host, unsalted host-partitioning concentrates the
    batch on one task; salting spreads it over ~salt_splits tasks."""
    web = SyntheticWeb(n_hosts=4, pages_per_host=100, seed=42)
    rows = [(web.url(0, p), web.url(0, p), 0, "host-0.test") for p in range(100)]
    rows += [(web.url(h, 0), web.url(h, 0), 0, f"host-{h}.test") for h in (1, 2, 3)]
    batch = spark.createDataFrame(rows, "url STRING, url_canon STRING, retry_times INT, host STRING")
    batch = batch.withColumn("fingerprint", F.md5("url_canon"))

    unsalted = fetch_parse_batch(batch, web, by_host=True, host_salt_splits=1)
    salted = fetch_parse_batch(batch, web, by_host=True, host_salt_splits=4)

    def partition_spread(df):
        counts = [
            r.n
            for r in df.groupBy("stage_partition").agg(F.count("*").alias("n")).collect()
        ]
        return max(counts)

    assert partition_spread(unsalted) >= 100  # hot host pinned to one task
    # (hash(host, salt) can still collide into the session's few partitions,
    # so "spread" means strictly better than pinned, not perfectly even)
    assert partition_spread(salted) <= 70, "salting must split the hot host"
