"""R5 stall monitors + applyInPandasWithState stateful dedup counter."""

from pyspark.sql import functions as F

from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.synthweb import SyntheticWeb
from feapder_spark.streaming.stateful import run_stateful_dedup

SF = "/root/testdata/sf0.001"


def test_health_check_alarms(spark, tmp_path):
    # a crawl of only permanently-failing urls trips the success-rate alarm
    web = SyntheticWeb(n_hosts=2, pages_per_host=1, seed=42)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, CrawlConfig(batch_size=8, max_retries=2))
    engine.seed([{"url": "http://host-bad.test/page-0"}, {"url": "http://host-bad.test/page-1"}])
    engine.run()
    alarms = engine.health_check(failed_threshold=1, min_success_rate=0.5)
    assert any("success_rate" in a for a in alarms)
    assert any("failed_count" in a for a in alarms)

    # a healthy crawl raises none (link-free, non-flaky fixture)
    healthy = SyntheticWeb(n_hosts=2, pages_per_host=2, seed=42, n_links=0, flaky_every=10**9)
    engine2 = CrawlEngine(spark, str(tmp_path / "wh2"), healthy, CrawlConfig(batch_size=8))
    engine2.seed([{"url": healthy.url(h, p)} for h in range(2) for p in range(2)])
    engine2.run()
    assert engine2.health_check() == []


def test_stateful_dedup_counter_matches_batch(spark):
    res = run_stateful_dedup(spark, SF)
    got = {r.event_type: r.total_distinct for r in res.collect()}
    expected = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == expected and len(got) >= 3
