"""Golden crawl runs: the Spark engine must reproduce the pure-Python
reference-semantics oracle exactly (SURVEY §5 test plan #2):

- identical crawl ordering (lease sequence of fingerprints)
- identical final URL-seen set
- per-row span-sequence equality on the docs table (the input_hint invariant)
- identical failed set and item fingerprints
"""

import pytest

from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.oracle import run_oracle
from feapder_spark.crawl.synthweb import SyntheticWeb


def _spark_state(engine):
    order = [
        r.fingerprint
        for r in engine.t("crawl_order").read().orderBy("seq").select("fingerprint").collect()
    ]
    seen = {r.fingerprint for r in engine.t("seen").read().collect()}
    failed = {r.fingerprint for r in engine.t("failed").read().collect()}
    items = {r.item_fp for r in engine.t("items").read().collect()}
    docs = {}
    for r in engine.t("docs").read().collect():
        docs[r.doc_id] = [
            {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
            for s in r.spans
        ]
    return order, seen, failed, items, docs


@pytest.fixture(scope="module")
def web():
    return SyntheticWeb(n_hosts=8, pages_per_host=6, seed=42)


def _run_both(spark, tmp, web, politeness=None, batch_size=16):
    seeds = web.seeds(8)
    golden = run_oracle(web, seeds, batch_size=batch_size, politeness=politeness)
    cfg = CrawlConfig(batch_size=batch_size, politeness=politeness)
    engine = CrawlEngine(spark, str(tmp / "wh"), web, cfg)
    assert engine.seed(seeds) is True
    engine.run()
    return golden, engine


@pytest.fixture(scope="module")
def main_run(spark, tmp_path_factory, web):
    """One engine-vs-oracle run shared by several assertions (crawls are
    the expensive part of this suite)."""
    return _run_both(spark, tmp_path_factory.mktemp("equiv"), web)


def test_engine_matches_oracle(main_run):
    golden, engine = main_run
    order, seen, failed, items, docs = _spark_state(engine)

    assert seen == golden.seen, "final URL-seen set must match the oracle"
    assert order == golden.crawl_order, "lease order must match (priority asc, fp lex)"
    assert failed == golden.failed
    assert items == set(golden.items.keys())
    assert set(docs.keys()) == set(golden.docs.keys())
    for doc_id, spans in golden.docs.items():
        assert docs[doc_id] == spans, f"span-sequence mismatch for {doc_id}"


def test_engine_matches_oracle_under_politeness(spark, tmp_path, web):
    budgets = web.politeness_budgets(hot_cap=3)
    golden, engine = _run_both(spark, tmp_path, web, politeness=budgets)
    order, seen, failed, items, docs = _spark_state(engine)
    assert order == golden.crawl_order
    assert seen == golden.seen
    assert docs.keys() == golden.docs.keys()


def test_metrics_match_oracle(main_run):
    golden, engine = main_run
    m = {
        r.iteration: (r.leased, r.fetched_ok, r.links_new, r.retried, r.failed)
        for r in engine.t("metrics").read().collect()
    }
    for om in golden.metrics:
        assert m[om["iteration"]] == (
            om["leased"], om["fetched_ok"], om["links_new"], om["retried"], om["failed"],
        )
    # per-partition lineage recorded for every iteration
    parts = engine.t("metrics_partitions").read()
    assert parts.count() > 0
    assert parts.select("iteration").distinct().count() == len(golden.metrics)


def test_seeding_skipped_on_existing_frontier(spark, tmp_path, web):
    seeds = web.seeds(4)
    engine = CrawlEngine(spark, str(tmp_path / "wh2"), web, CrawlConfig(batch_size=8))
    assert engine.seed(seeds) is True
    # second seed call is a no-op (resume semantics, scheduler.py:197-201)
    assert engine.seed(seeds) is False
