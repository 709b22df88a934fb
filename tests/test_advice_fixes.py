"""Round-2 regression tests for the round-1 advisor findings (ADVICE.md):

1. politeness ``__default__`` must still cap hosts that only the token-bucket
   dimension names (engine budgets = min(static-or-default, token budget)).
2. item fingerprints of NULL values hash as str(None) — no NULL item_fp rows.
3. token-bucket idle-accrual ticks must not trip the frozen-frontier alarm.
4. reload_failed preserves the parked request's priority and parser routing.
"""

from pyspark.sql import functions as F

from feapder_spark.crawl import semantics as S
from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.oracle import run_oracle
from feapder_spark.crawl.synthweb import SyntheticWeb
from feapder_spark.examples import none_title_parse


def test_politeness_plus_token_bucket_matches_oracle(spark, tmp_path):
    # the ADVICE.md repro: every due host gets a token-bucket budget row, so
    # a union+min merge would bypass the politeness default cap of 1
    web = SyntheticWeb(n_hosts=5, pages_per_host=4, seed=42)
    seeds = web.seeds(5)
    pol = {"__default__": 1, "host-0.test": 2}
    tb = {"rate": 5.0, "burst": 8.0}
    golden = run_oracle(
        web, seeds, batch_size=16, politeness=pol, token_bucket=tb, max_iterations=40
    )

    cfg = CrawlConfig(batch_size=16, politeness=pol, token_bucket=tb)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(seeds)
    engine.run(max_iterations=40)

    order = [
        r.fingerprint
        for r in engine.t("crawl_order").read().orderBy("seq").select("fingerprint").collect()
    ]
    assert order == golden.crawl_order
    seen = {r.fingerprint for r in engine.t("seen").read().collect()}
    assert seen == golden.seen
    m = {
        r.iteration: (r.leased, r.fetched_ok, r.retried, r.failed)
        for r in engine.t("metrics").read().collect()
    }
    for om in golden.metrics:
        assert m[om["iteration"]] == (
            om["leased"], om["fetched_ok"], om["retried"], om["failed"],
        ), (om, m.get(om["iteration"]))
    # the safety cap itself: no iteration leases more than default*hosts + cap
    per_iter = [om["leased"] for om in golden.metrics]
    assert max(per_iter) <= 1 * 4 + 2  # 4 default-capped hosts + host-0 at 2


def test_none_title_item_fp_not_null(spark, tmp_path):
    web = SyntheticWeb(n_hosts=2, pages_per_host=2, seed=42, n_links=0, flaky_every=10**9)
    cfg = CrawlConfig(batch_size=8, parse_fn=none_title_parse)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed([{"url": web.url(h, p)} for h in range(2) for p in range(2)])
    engine.run()
    items = engine.t("items").read().collect()
    assert len(items) == 4
    assert all(r.title is None for r in items)
    assert all(r.item_fp is not None for r in items)
    # bit-equal to the reference fingerprint semantics (str(None) = 'None')
    for r in items:
        expected = S.item_fingerprint(
            {"doc_id": r.doc_id, "url": r.url, "title": None, "n_spans": r.n_spans}
        )
        assert r.item_fp == expected


def test_idle_accrual_ticks_do_not_trip_frozen_alarm(spark, tmp_path):
    # rate<1 forces idle-accrual ticks (leased=0) between every lease; a
    # successful crawl with many such ticks must raise no alarms
    web = SyntheticWeb(n_hosts=1, pages_per_host=4, seed=42, n_links=0, flaky_every=10**9)
    cfg = CrawlConfig(batch_size=8, token_bucket={"rate": 0.5, "burst": 1.0})
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed([{"url": web.url(0, p)} for p in range(4)])
    engine.run(max_iterations=30)
    stats = [c["label"]["stats"] for c in engine.store.list_checkpoints() if c["label"].get("stats")]
    assert sum(1 for s in stats if s["leased"] == 0) >= 3  # ticks really happened
    assert engine.health_check() == []


def test_reload_failed_preserves_priority_and_parser(spark, tmp_path):
    web = SyntheticWeb(n_hosts=2, pages_per_host=1, seed=42)
    cfg = CrawlConfig(batch_size=8, max_retries=1)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(
        [{"url": "http://host-bad.test/page-0", "priority": 100, "parser_name": "DetailParser"}]
    )
    engine.run()
    parked = engine.t("failed").read().collect()
    assert len(parked) == 1 and parked[0].priority == 100
    assert parked[0].parser_name == "DetailParser"

    assert engine.reload_failed() == 1
    revived = engine.frontier().filter(F.col("status") == "todo").collect()
    assert len(revived) == 1
    assert revived[0].priority == 100
    assert revived[0].parser_name == "DetailParser"
    assert revived[0].retry_times == 0
    assert revived[0].url_canon == parked[0].url_canon
