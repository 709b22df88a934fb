"""Response cache (S8/J4, request.py:498-532) + validate hook (F4,
base_parser.py:43-57)."""

import os

from pyspark.sql import functions as F

from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.synthweb import MarkingWeb, SyntheticWeb


def test_fetch_cache_skips_resolver_on_rerun(spark, tmp_path):
    markers = str(tmp_path / "markers")
    web = MarkingWeb(n_hosts=3, pages_per_host=3, seed=42, flaky_every=10**9, marker_dir=markers)
    cfg = CrawlConfig(batch_size=64, use_fetch_cache=True)
    wh = str(tmp_path / "wh")

    e1 = CrawlEngine(spark, wh, web, cfg)
    e1.seed(web.seeds(3))
    e1.run()
    calls_first = len(os.listdir(markers))
    assert calls_first > 0
    assert e1.t("fetch_cache").read().count() > 0

    # re-crawl: reset frontier to the seeds but KEEP the fetch cache
    # (new-batch semantics — task states reset, cache persists)
    seeds_df = e1.t("crawl_order").read()  # any prior state; we re-seed manually
    e1.t("frontier").commit(
        e1.t("frontier").read(version=0).sparkSession.createDataFrame([], e1.t("frontier").read().schema),
        mode="overwrite",
    )
    from feapder_spark.crawl.engine import SEEN_DDL

    e1.t("seen").commit(spark.createDataFrame([], SEEN_DDL), mode="overwrite")
    e2 = CrawlEngine(spark, wh, web, cfg)
    assert e2.seed(web.seeds(3)) is True
    e2.run()
    calls_second = len(os.listdir(markers)) - calls_first
    # every 200 came from cache; only uncached failures re-resolve
    cached_ok = e1.t("fetch_cache").read().count()
    assert calls_second < calls_first, f"cache not used: {calls_second} new resolver calls"
    docs2 = e2.t("docs").read().select("doc_id").distinct().count()
    assert docs2 >= cached_ok  # cached pages all produced docs again


def test_validate_hook_abandon_and_retry(spark, tmp_path):
    web = SyntheticWeb(n_hosts=3, pages_per_host=2, seed=42, flaky_every=10**9)

    def validate(url, html):
        if "host-1" in url:
            return False  # abandon everything on host-1 (no retry)
        return True

    cfg = CrawlConfig(batch_size=32, validate=validate)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(web.seeds(3))
    engine.run()

    failed = engine.t("failed").read().collect()
    abandoned = [r for r in failed if "host-1" in r.url]
    assert abandoned, "host-1 pages should be abandoned"
    # abandoned rows fail on first attempt: retry_times incremented once only
    assert all(r.retry_times == 1 and r.status_code == -2 for r in abandoned)
    # no host-1 docs were parsed
    docs = engine.t("docs").read().filter(F.col("url").contains("host-1")).count()
    assert docs == 0
