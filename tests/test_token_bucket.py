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


def test_prune_drops_only_refilled_rows(spark):
    # burst 3, default rate 1, host "c" rate 0: at iteration 9 —
    #   a: at burst already            -> dropped (== absent-host default)
    #   b: 0 tokens, idle 4 iters      -> as-of 4 >= 3, dropped
    #   c: zero-rate, never refills    -> kept forever
    #   d: spent this iteration        -> as-of 1 < 3, kept
    from feapder_spark.crawl.politeness import BUCKETS_DDL, TokenBuckets

    tb = TokenBuckets(rate=1.0, burst=3.0, default_rate_hosts={"c": 0.0})
    state = spark.createDataFrame(
        [("a", 3.0, 5), ("b", 0.0, 5), ("c", 1.0, 0), ("d", 1.0, 9)], BUCKETS_DDL
    )
    kept = {r.host for r in tb.prune(state, iteration=9).collect()}
    assert kept == {"c", "d"}


def test_bucket_state_stays_bounded_to_refilling_hosts(spark, tmp_path):
    # host 0 drains in iteration 0 and refills to burst 3 iterations later;
    # its state row must then DISAPPEAR (it equals the absent-host default),
    # leaving only the still-active host — the table tracks refilling hosts,
    # not every host ever crawled
    web = SyntheticWeb(n_hosts=2, pages_per_host=12, seed=42, flaky_every=10**9, n_links=0)
    seeds = [{"url": web.url(0, p)} for p in range(2)] + [
        {"url": web.url(1, p)} for p in range(12)
    ]
    cfg = CrawlConfig(batch_size=100, token_bucket={"rate": 1.0, "burst": 3.0})
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(seeds)
    engine.run(max_iterations=12)
    rows = engine.t("token_buckets").read().collect()
    assert len(rows) == 1, rows  # host 0's refilled row pruned, host 1 remains
    assert rows[0].tokens < 3.0
