"""Per-request callback routing (VERDICT r2 #2): the reference serializes a
callback NAME with each request (request.py:248-252) and dispatches
``getattr(parser, callback)`` at parse time (parser_control.py:562-570) —
the list-page→detail-page pattern.  The callback column rides the frontier,
the failed park, and reload."""

from pyspark.sql import functions as F

from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.oracle import run_oracle
from feapder_spark.crawl.synthweb import SyntheticWeb
from feapder_spark.examples import CallbackSpider


def test_two_callback_spider_matches_oracle(spark, tmp_path):
    web = SyntheticWeb(n_hosts=4, pages_per_host=3, seed=42)
    spider = CallbackSpider()
    spider.start_urls = [web.url(h, 0) for h in range(4)]
    spider.start(spark, str(tmp_path / "wh"), web)
    engine = spider.engine

    golden = run_oracle(
        web,
        [{"url": u} for u in spider.start_urls],
        batch_size=16,
        default_parser="CallbackSpider",
        parsers={"CallbackSpider": spider.parse},
        callbacks={"parse": spider.parse, "parse_detail": spider.parse_detail},
    )
    order = [
        r.fingerprint
        for r in engine.t("crawl_order").read().orderBy("seq").select("fingerprint").collect()
    ]
    assert order == golden.crawl_order
    assert {r.fingerprint for r in engine.t("seen").read().collect()} == golden.seen
    docs = {
        r.doc_id: [s.asDict() for s in r.spans] for r in engine.t("docs").read().collect()
    }
    assert docs == golden.docs
    items = {r.item_fp: r.title for r in engine.t("items").read().collect()}
    assert items == {fp: it["title"] for fp, it in golden.items.items()}
    titles = set(items.values())
    # both callbacks actually ran: seeds via parse, links via parse_detail
    assert any(t.startswith("CBLIST:") for t in titles)
    assert any(t.startswith("CBDETAIL:") for t in titles)
    # per-callback doc routing: every link-discovered page is a detail page
    n_list = sum(1 for t in titles if t.startswith("CBLIST:"))
    assert n_list == 4  # exactly the seeds


def test_callback_survives_park_and_reload(spark, tmp_path):
    web = SyntheticWeb(n_hosts=2, pages_per_host=1, seed=42)
    cfg = CrawlConfig(batch_size=8, max_retries=1)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed([{"url": "http://host-bad.test/page-0", "callback": "parse_detail"}])
    engine.run()
    parked = engine.t("failed").read().collect()
    assert len(parked) == 1 and parked[0].callback == "parse_detail"
    assert engine.reload_failed() == 1
    revived = engine.frontier().filter(F.col("status") == "todo").collect()
    assert revived[0].callback == "parse_detail"


def test_missing_callback_routes_to_retry_then_failed(spark, tmp_path):
    # an unresolvable callback name is a dispatch exception in the reference
    # (getattr AttributeError → retry path, parser_control.py:555-570)
    web = SyntheticWeb(n_hosts=1, pages_per_host=1, seed=42, n_links=0, flaky_every=10**9)
    seeds = [{"url": web.url(0, 0), "callback": "nope"}]
    cfg = CrawlConfig(batch_size=8, max_retries=1, callbacks={})
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(seeds)
    engine.run()

    golden = run_oracle(web, seeds, batch_size=8, max_retries=1, callbacks={})
    order = [
        r.fingerprint
        for r in engine.t("crawl_order").read().orderBy("seq").select("fingerprint").collect()
    ]
    assert order == golden.crawl_order and len(order) == 2  # attempt + 1 retry
    assert {r.fingerprint for r in engine.t("failed").read().collect()} == golden.failed
    assert engine.t("docs").read().count() == 0 == len(golden.docs)
