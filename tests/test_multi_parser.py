"""Multi-parser dispatch (J2, parser_control.py:85-86 + add_parser), the
exception_request / failed_request hooks (R2/R3, base_parser.py:71-95), and
request body/payload flow through the frontier (network/request.py:45-81,
fingerprint with body args request.py:465-480)."""

from pyspark.sql import functions as F

from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.oracle import run_oracle
from feapder_spark.crawl.synthweb import FormWeb, SyntheticWeb
from feapder_spark.examples import (
    detail_parse,
    list_parse,
    rewrite_badhost_exception_request,
    tag_failed_request,
)
from feapder_spark.urlnorm import request_fingerprint


def _order_seen_docs_items(engine):
    order = [
        r.fingerprint
        for r in engine.t("crawl_order").read().orderBy("seq").select("fingerprint").collect()
    ]
    seen = {r.fingerprint for r in engine.t("seen").read().collect()}
    docs = {
        r.doc_id: [s.asDict() for s in r.spans]
        for r in engine.t("docs").read().collect()
    }
    items = {r.item_fp: r.title for r in engine.t("items").read().collect()}
    return order, seen, docs, items


def test_two_parser_routing_matches_oracle(spark, tmp_path):
    web = SyntheticWeb(n_hosts=4, pages_per_host=3, seed=42)
    seeds = [
        {"url": web.url(h, 0), "parser_name": "ListParser"} for h in range(4)
    ]
    parsers = {"ListParser": list_parse, "DetailParser": detail_parse}
    golden = run_oracle(web, seeds, batch_size=16, parsers=parsers)

    cfg = CrawlConfig(
        batch_size=16,
        parsers={name: {"parse_fn": fn} for name, fn in parsers.items()},
    )
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(seeds)
    engine.run()

    order, seen, docs, items = _order_seen_docs_items(engine)
    assert order == golden.crawl_order
    assert seen == golden.seen
    assert docs == golden.docs
    assert items == {fp: it["title"] for fp, it in golden.items.items()}
    # both templates actually ran
    titles = set(items.values())
    assert any(t.startswith("LIST:") for t in titles)
    assert any(t.startswith("DETAIL:") for t in titles)
    # per-parser doc routing: detail pages came from links, list pages from seeds
    n_list = sum(1 for t in titles if t.startswith("LIST:"))
    assert n_list <= len(seeds)


def test_spider_add_parser_facade(spark, tmp_path):
    from feapder_spark.examples import DetailParser, ListDemoSpider

    web = SyntheticWeb(n_hosts=3, pages_per_host=2, seed=7)
    sp = ListDemoSpider()
    # the list template routes links to "DetailParser" by name
    sp.add_parser(DetailParser)
    sp.start(spark, str(tmp_path / "wh"), web)
    items = {r.title for r in sp.engine.t("items").read().collect()}
    assert any(t.startswith("LIST:") for t in items)
    assert any(t.startswith("DETAIL:") for t in items)


def test_exception_request_transforms_and_failed_request_annotates(spark, tmp_path):
    # every bad-host request is rewritten to host-0 by exception_request; the
    # genuinely un-rewritable failures (host-9 within a 1-host web → 404)
    # exhaust retries and pass through failed_request
    web = SyntheticWeb(n_hosts=1, pages_per_host=3, seed=42, n_links=0, flaky_every=10**9)
    cfg = CrawlConfig(
        batch_size=8,
        max_retries=1,
        exception_request=rewrite_badhost_exception_request,
        failed_request=tag_failed_request,
    )
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(
        [
            {"url": "http://host-bad.test/page-1"},   # rewritten → host-0/page-1 (200)
            {"url": "http://host-9.test/page-0"},     # 404 forever → failed_request
            {"url": "http://host-0.test/page-0"},     # plain success
        ]
    )
    engine.run()
    docs = {r.url for r in engine.t("docs").read().collect()}
    # the rewritten request was fetched under its new identity
    assert "http://host-0.test/page-1" in docs
    failed = engine.t("failed").read().collect()
    assert {r.url for r in failed} == {"http://host-9.test/page-0"}
    # failed_request's annotation landed on the parked row
    assert all(r.priority == 999 for r in failed)


def test_payload_flows_and_fingerprints_differ(spark, tmp_path):
    web = FormWeb(n_hosts=2, pages_per_host=2, seed=42, n_links=0, flaky_every=10**9)
    seeds = [
        {"url": web.url(0, 0), "method": "POST", "data": {"task": "1"}},
        {"url": web.url(0, 0), "method": "POST", "data": {"task": "2"}},
        {"url": web.url(0, 1)},
    ]
    golden = run_oracle(web, seeds, batch_size=8)
    cfg = CrawlConfig(batch_size=8)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(seeds)
    engine.run()

    order, seen, docs, _ = _order_seen_docs_items(engine)
    assert order == golden.crawl_order
    assert seen == golden.seen
    assert docs == golden.docs
    # same url + different body args ⇒ distinct fingerprints, both crawled
    fp1 = request_fingerprint(web.url(0, 0), data={"task": "1"})
    fp2 = request_fingerprint(web.url(0, 0), data={"task": "2"})
    assert fp1 != fp2 and fp1 in seen and fp2 in seen
    # the payload actually reached the fetch: reflected params in the spans
    texts = " ".join(
        s["text"] or "" for s in docs[fp1]
    )
    assert "task=1" in texts
    # payload survives the frontier round-trip (frontier carries MAP column)
    raw = engine.t("frontier").read().filter(F.col("payload").isNotNull()).collect()
    assert {tuple(sorted(r.payload.items())) for r in raw} == {(("task", "1"),), (("task", "2"),)}
