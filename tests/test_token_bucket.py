"""Token-bucket rate limiting: accrual across iterations, burst cap, spend."""

from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.synthweb import SyntheticWeb


def test_token_bucket_accrual_pattern(spark, tmp_path):
    # one host, 10 pages, rate 1/iter, burst 3 ⇒ leases go 3,1,1,1,1,1,1,1
    web = SyntheticWeb(n_hosts=1, pages_per_host=10, seed=42, flaky_every=10**9, n_links=0)
    seeds = [{"url": web.url(0, p)} for p in range(10)]
    cfg = CrawlConfig(batch_size=100, token_bucket={"rate": 1.0, "burst": 3.0})
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(seeds)
    stats = engine.run(max_iterations=8)
    leases = [s.leased for s in stats]
    assert leases[0] == 3, f"burst should allow 3 first: {leases}"
    assert all(l == 1 for l in leases[1:]), f"then rate-limited to 1/iter: {leases}"


def test_token_bucket_burst_recovery(spark, tmp_path):
    # rate 2/iter, burst 4: first iteration spends the burst, then 2/iter
    web = SyntheticWeb(n_hosts=1, pages_per_host=12, seed=42, flaky_every=10**9, n_links=0)
    seeds = [{"url": web.url(0, p)} for p in range(12)]
    cfg = CrawlConfig(batch_size=100, token_bucket={"rate": 2.0, "burst": 4.0})
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(seeds)
    stats = engine.run(max_iterations=6)
    leases = [s.leased for s in stats]
    assert leases[0] == 4 and all(l == 2 for l in leases[1:]), leases
