"""Round-3 reference surfaces: lifecycle start/end callbacks
(scheduler.py:460-501), auto_request=False skip-download requests
(request.py:68-70; parser_control.py:96,162-163), and request_sync
depth-first inline execution (parser_control.py:190-195)."""

import hashlib
import os

from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.oracle import run_oracle
from feapder_spark.crawl.synthweb import MarkingWeb, SyntheticWeb
from feapder_spark.examples import sync_badlink_parse, sync_inline_parse
from feapder_spark.urlnorm import canonicalize_url, get_md5


def _metrics(engine):
    return {
        r.iteration: (r.leased, r.fetched_ok, r.links_new, r.links_dup, r.retried, r.failed)
        for r in engine.t("metrics").read().collect()
    }


def _check_against(engine, golden):
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
    m = _metrics(engine)
    for om in golden.metrics:
        assert m[om["iteration"]] == (
            om["leased"], om["fetched_ok"], om["links_new"],
            om["links_dup"], om["retried"], om["failed"],
        ), (om, m.get(om["iteration"]))


# -- lifecycle callbacks ------------------------------------------------------

def test_end_callback_fires_once_after_resumed_drain(spark, tmp_path):
    web = SyntheticWeb(n_hosts=2, pages_per_host=3, seed=42, n_links=0, flaky_every=10**9)
    seeds = [{"url": web.url(h, p)} for h in range(2) for p in range(3)]
    events = []
    cfg = CrawlConfig(
        batch_size=2,
        on_start=lambda: events.append("start"),
        on_end=lambda: events.append("end"),
    )
    e1 = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    e1.seed(seeds)
    e1.run(max_iterations=1)  # interrupted: 4 of 6 pages still due
    assert events == ["start"]  # no premature end

    e2 = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    e2.resume()
    assert not e2.seed(seeds)  # resume: no re-seed
    e2.run()  # drains → end fires exactly once
    assert events == ["start", "start", "end"]
    # a crawl that is already drained ends immediately (start+end, no lease)
    e2.run()
    assert events == ["start", "start", "end", "start", "end"]


# -- auto_request=False -------------------------------------------------------

def test_auto_request_false_skips_download(spark, tmp_path):
    mdir = str(tmp_path / "markers")
    web = MarkingWeb(
        n_hosts=2, pages_per_host=2, seed=42, n_links=0, flaky_every=10**9,
        marker_dir=mdir,
    )
    skipped = web.url(1, 0)
    seeds = [{"url": web.url(0, 0)}, {"url": skipped, "auto_request": False}]
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, CrawlConfig(batch_size=8))
    engine.seed(seeds)
    engine.run()

    plain = SyntheticWeb(n_hosts=2, pages_per_host=2, seed=42, n_links=0, flaky_every=10**9)
    golden = run_oracle(plain, seeds, batch_size=8)
    _check_against(engine, golden)

    # the resolver was NEVER called for the skipped URL (response=None)
    marker = hashlib.md5(f"{skipped}|0".encode()).hexdigest()
    assert not os.path.exists(os.path.join(mdir, marker))
    fp = get_md5(canonicalize_url(skipped))
    doc = engine.t("docs").read().filter(f"doc_id = '{fp}'").collect()
    assert len(doc) == 1 and list(doc[0].spans) == []  # empty document emitted


# -- request_sync -------------------------------------------------------------

def test_request_sync_inline_execution_matches_oracle(spark, tmp_path):
    web = SyntheticWeb(n_hosts=2, pages_per_host=2, seed=42, n_links=0, flaky_every=10**9)
    seeds = [{"url": web.url(h, 0)} for h in range(2)]
    cfg = CrawlConfig(batch_size=8, parse_fn=sync_inline_parse)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(seeds)
    engine.run()

    golden = run_oracle(web, seeds, batch_size=8, parsers={"TestParser": sync_inline_parse})
    _check_against(engine, golden)

    # the inline page was fetched+parsed (docs) but never queued or claimed
    inline_fp = get_md5(canonicalize_url(web.url(0, 1)))
    doc_ids = {r.doc_id for r in engine.t("docs").read().collect()}
    assert inline_fp in doc_ids
    seen = {r.fingerprint for r in engine.t("seen").read().collect()}
    assert inline_fp not in seen
    order = [r.fingerprint for r in engine.t("crawl_order").read().collect()]
    assert inline_fp not in order
    # one iteration: 2 leases, 4 fetched_ok (2 seeds + 2 inline details)
    assert _metrics(engine)[0][:2] == (2, 4)


def test_request_sync_failure_reenqueues_via_retry(spark, tmp_path):
    web = SyntheticWeb(n_hosts=1, pages_per_host=1, seed=42, n_links=0, flaky_every=10**9)
    seeds = [{"url": web.url(0, 0)}]
    cfg = CrawlConfig(batch_size=8, max_retries=1, parse_fn=sync_badlink_parse)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(seeds)
    engine.run()

    golden = run_oracle(
        web, seeds, batch_size=8, max_retries=1,
        parsers={"TestParser": sync_badlink_parse},
    )
    _check_against(engine, golden)
    # the inline failure re-enqueued (retry_times=1), then exhausted → failed
    bad_fp = get_md5(canonicalize_url("http://host-bad.test/page-0"))
    assert {r.fingerprint for r in engine.t("failed").read().collect()} == {bad_fp}
    assert golden.failed == {bad_fp}
