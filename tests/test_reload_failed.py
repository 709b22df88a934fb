"""Failed-request reload (S9: core/handle_failed_requests.py:29-54):
parked failures re-enter the frontier with retry_times=0, bypassing dedup."""

from pyspark.sql import functions as F

from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.synthweb import SyntheticWeb


def test_reload_failed_reenqueues(spark, tmp_path):
    # two permanently-failing seeds exhaust retries fast (max_retries=1)
    web = SyntheticWeb(n_hosts=2, pages_per_host=1, seed=42)
    cfg = CrawlConfig(batch_size=8, max_retries=1)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(
        [{"url": "http://host-bad.test/page-0"}, {"url": "http://host-bad.test/page-1"}]
    )
    engine.run()
    assert engine.t("failed").read().count() == 2
    assert engine.frontier().filter(F.col("status") == "todo").count() == 0

    assert engine.reload_failed() == 2
    assert engine.t("failed").read().count() == 0
    revived = engine.frontier().filter(F.col("status") == "todo")
    assert revived.count() == 2
    assert revived.agg(F.max("retry_times")).first()[0] == 0

    # idempotent on empty failed table
    assert engine.reload_failed() == 0
