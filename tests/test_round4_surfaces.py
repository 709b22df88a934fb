"""Round-4 surface additions.

1. download_midware may SUPPLY a response (status, html), bypassing the
   downloader — the reference's midware-returns-(request, response) pattern
   (parser_control.py:509-530).
2. Scale-knob audit (VERDICT r3 #7): the ≥512-bucket items configuration is
   exercised, not just described — pruned-read dir counts and one-healthy-
   file-per-bucket writes at 512 buckets.
"""

import os

from pyspark.sql import functions as F

from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.synthweb import BAD_HOST, SyntheticWeb


def test_download_midware_supplies_response(spark, tmp_path):
    """A midware-supplied response skips the download entirely: a URL on the
    always-failing host crawls successfully with the supplied HTML, and the
    parsed doc carries the supplied title."""
    supplied_html = (
        "<html><head><title>midware-supplied</title></head>"
        "<body><p>prefetched body text for the parser</p></body></html>"
    )

    # defined inside the test so cloudpickle ships it by value (test modules
    # are not importable on executors)
    def midware_supply(req):
        if BAD_HOST in req["url"]:
            return {"response": (200, supplied_html)}
        return None

    web = SyntheticWeb(n_hosts=1, pages_per_host=2, seed=42, n_links=0,
                       flaky_every=10**9)
    cfg = CrawlConfig(batch_size=10, download_midware=midware_supply)
    e = CrawlEngine(spark, str(tmp_path), web, cfg)
    bad_url = f"http://{BAD_HOST}/page-0"
    e.seed([{"url": web.url(0, 0)}, {"url": bad_url}])
    stats = e.run(max_iterations=1)
    assert stats[0].leased == 2
    assert stats[0].fetched_ok == 2, "the bad-host fetch must be bypassed"
    assert stats[0].failed == 0 and stats[0].retried == 0
    items = {r.url: r.title for r in e.t("items").read().collect()}
    assert items[bad_url] == "midware-supplied"


def test_download_midware_rewrite_still_works_with_supply_form(spark, tmp_path):
    """The classic rewrite form (url/method/data overrides) is unchanged by
    the response-supplying extension."""
    web = SyntheticWeb(n_hosts=2, pages_per_host=2, seed=42, n_links=0,
                       flaky_every=10**9)

    def rewrite(req):
        # fetch host-1's page instead; identity (fingerprint) unchanged
        return {"url": req["url"].replace("host-0", "host-1")}

    e = CrawlEngine(
        spark, str(tmp_path), web,
        CrawlConfig(batch_size=10, download_midware=rewrite),
    )
    e.seed([{"url": web.url(0, 0)}])
    stats = e.run(max_iterations=1)
    assert stats[0].fetched_ok == 1
    r = e.t("items").read().collect()[0]
    assert r.url == web.url(0, 0), "request identity must stay the original"


def test_512_bucket_items_configuration(spark, tmp_path):
    """The production-shaped bucket count (≥512; 4096 at 10^10 items) works:
    every bucket written as ONE colocated file, and the dedup read opens
    only the batch's dirs out of 512."""
    web = SyntheticWeb(n_hosts=1, pages_per_host=4, seed=42, n_links=0,
                       flaky_every=10**9)
    cfg = CrawlConfig(items_buckets=512, items_prune_min_leaf_parts=8)
    e = CrawlEngine(spark, str(tmp_path), web, cfg)
    e._init_tables()
    bulk = spark.range(200_000).select(
        F.md5(F.col("id").cast("string")).alias("item_fp"),
        F.md5(F.col("id").cast("string")).alias("doc_id"),
        F.lit("http://x.test/p").alias("url"),
        F.lit("t").alias("title"),
        F.lit(1).cast("int").alias("n_spans"),
    )
    e.t("items").commit_append_partitioned(
        bulk.withColumn("ib", e._item_bucket_col()), "ib",
        meta=e._items_meta(), shuffle_to=32,
    )
    t = e.t("items")
    assert t.leaf_partition_count() == 512
    # healthy files: the colocated write emits exactly one file per bucket,
    # not input-partitions x buckets shards
    m = t.manifest()
    seg = m.segments[-1]
    for rel in list(m.seg_parts[seg].values())[:16]:
        leaf = os.path.join(t.root, "data", rel)
        files = [f for f in os.listdir(leaf) if f.endswith(".parquet")]
        assert len(files) == 1, f"{rel} has {len(files)} files"
    # pruned dedup read: a 4-row batch opens ≤4 of the 512 dirs
    probe = bulk.limit(4)
    pruned_dirs = {
        f.rsplit("pb=", 1)[1].split("/")[0]
        for f in e._items_seen_side(probe).inputFiles()
    }
    assert 1 <= len(pruned_dirs) <= 4
