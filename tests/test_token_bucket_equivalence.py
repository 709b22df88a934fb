"""Token-bucket crawl must reproduce the oracle exactly — rate limiting
changes the lease schedule but must preserve the pinned ordering contract
(priority asc, fingerprint lex) and the final state."""

from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.oracle import run_oracle
from feapder_spark.crawl.synthweb import SyntheticWeb


def test_token_bucket_engine_matches_oracle(spark, tmp_path):
    web = SyntheticWeb(n_hosts=5, pages_per_host=4, seed=42)
    seeds = web.seeds(5)
    tb = {"rate": 1.5, "burst": 3.0}
    golden = run_oracle(web, seeds, batch_size=16, token_bucket=tb, max_iterations=30)

    cfg = CrawlConfig(batch_size=16, token_bucket=tb)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(seeds)
    engine.run(max_iterations=30)

    order = [
        r.fingerprint
        for r in engine.t("crawl_order").read().orderBy("seq").select("fingerprint").collect()
    ]
    seen = {r.fingerprint for r in engine.t("seen").read().collect()}
    assert order == golden.crawl_order
    assert seen == golden.seen
    # metrics (incl. idle-accrual ticks) must line up iteration by iteration
    m = {
        r.iteration: (r.leased, r.fetched_ok, r.retried, r.failed)
        for r in engine.t("metrics").read().collect()
    }
    for om in golden.metrics:
        assert m[om["iteration"]] == (om["leased"], om["fetched_ok"], om["retried"], om["failed"]), (
            om,
            m.get(om["iteration"]),
        )
