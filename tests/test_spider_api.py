"""Spider facade: the reference's subclass contract over the engine.

Example spiders live in feapder_spark.examples (spider classes must be
importable on executors — same rule as any spark-submit application)."""

from pyspark.sql import functions as F

from feapder_spark.crawl.synthweb import SyntheticWeb
from feapder_spark.examples import DemoSpider, HookedDemoSpider


def test_plain_spider_end_to_end(spark, tmp_path):
    web = SyntheticWeb(n_hosts=4, pages_per_host=3, seed=42)
    spider = DemoSpider()
    stats = spider.start(spark, str(tmp_path / "wh"), web)
    assert stats and sum(s.fetched_ok for s in stats) > 0
    assert spider.engine.t("docs").read().count() > 0
    # resume path: calling start again on a finished crawl is a no-op
    stats2 = DemoSpider().start(spark, str(tmp_path / "wh"), web)
    assert stats2 == []


def test_hook_spider_custom_parse_and_validate(spark, tmp_path):
    web = SyntheticWeb(n_hosts=4, pages_per_host=3, seed=42, flaky_every=10**9)
    spider = HookedDemoSpider()
    spider.start(spark, str(tmp_path / "wh"), web)
    items = spider.engine.t("items").read().collect()
    assert items and all(r.title == r.title.upper() for r in items)
    assert spider.engine.t("docs").read().filter(F.col("url").contains("host-1")).count() == 0
    failed = spider.engine.t("failed").read().filter(F.col("url").contains("host-1"))
    assert failed.count() > 0  # abandoned by validate
