"""Regression tests for the round-4 ADVICE defects.

1. Legacy task buckets without manifest stats must stay claimable (silent
   task starvation).
2. Two add_requests for one URL within one iteration under TTL must not
   lose the request (same-key tombstone shadowing both rows).
3. A TTL re-claim of a fingerprint leased in the same batch must not
   double-decrement frontier_size (fast-path over-lease hazard).
4. Resuming an items store under a different items_buckets must not
   mis-prune the dedup read (silent duplicate items).
5. A store committed under the pre-callback schema must resume cleanly
   (typed-NULL backfill on read, Iceberg add-column parity).
6. Bucket-modulus changes on resume are refused loudly (tasks, bloom).
"""

import pytest
from pyspark.sql import functions as F

from feapder_spark.crawl.engine import FAILED_DDL, CrawlConfig, CrawlEngine
from feapder_spark.crawl.synthweb import SyntheticWeb
from feapder_spark.crawl.tasks import DONE, FAILED, TASKS_DDL, TaskManager
from feapder_spark.store import SnapshotStore

OLD_FRONTIER_DDL = (
    "fingerprint STRING, url STRING, url_canon STRING, host STRING, "
    "priority INT, retry_times INT, parser_name STRING, status STRING, "
    "added_iteration INT, method STRING, payload MAP<STRING, STRING>"
)
OLD_FAILED_DDL = (
    "fingerprint STRING, url STRING, url_canon STRING, host STRING, "
    "priority INT, parser_name STRING, retry_times INT, status_code INT, "
    "method STRING, payload MAP<STRING, STRING>"
)


def _quiet_web(**kw):
    return SyntheticWeb(n_hosts=1, pages_per_host=4, seed=42, n_links=0,
                        flaky_every=10**9, **kw)


def test_legacy_buckets_without_stats_stay_claimable(spark, tmp_path):
    """ADVICE r4 #1: buckets present in the partition map but absent from
    state_counts (pre-existing data) must be read, not treated as empty."""
    store = SnapshotStore(spark, str(tmp_path))
    tm = TaskManager(spark, store, n_buckets=4)
    legacy = spark.createDataFrame(
        [(i, f"u{i}", 0, "P") for i in range(8)], TASKS_DDL
    )
    # committed outside _commit_buckets: partitions exist, NO state stats
    tm.table.commit_partitions(tm._with_bucket(legacy), "bucket")
    # a stats-bearing commit that touches ONLY bucket 0
    tm.add_tasks([(100, "u100", 0, "P")])
    sc = (tm.table.manifest().meta or {})["state_counts"]
    assert set(sc) == {"0"}, "precondition: stats cover only the touched bucket"
    # all 9 todos must be claimable — including the stat-less buckets 1-3
    claimed = tm.claim_batch(limit=100)
    assert claimed.count() == 9
    assert tm.rollup(verify=True)["by_state"] == {2: 9}


def test_ttl_same_iteration_double_add_keeps_request(spark, tmp_path):
    """ADVICE r4 #2: TTL re-add whose row-version key equals the visible
    row's key keeps the pending row instead of losing both."""
    web = _quiet_web()
    e = CrawlEngine(spark, str(tmp_path), web, CrawlConfig(seen_ttl_seconds=0))
    e._init_tables()
    assert e.add_requests([{"url": web.url(0, 0)}]) == 1
    # TTL=0: the seen claim has already expired; same iteration ⇒ same key
    assert e.add_requests([{"url": web.url(0, 0)}]) == 0
    assert e.frontier().count() == 1, "request must survive the re-add"
    assert e.frontier_size == 1
    # across iterations the normal replace path still works: the old version
    # is tombstoned, the new one appended
    e.iteration = 1
    assert e.add_requests([{"url": web.url(0, 0)}]) == 1
    vis = e.frontier().collect()
    assert len(vis) == 1 and vis[0].added_iteration == 1
    assert e.frontier_size == 1


def test_ttl_leased_reclaim_no_double_decrement(spark, tmp_path):
    """ADVICE r4 #3: a fingerprint leased this batch AND re-claimed via a
    discovered link (TTL expired) is tombstoned once, not twice."""
    web = _quiet_web()
    cfg = CrawlConfig(
        seen_ttl_seconds=0, batch_size=10,
        parse_fn=lambda url_canon, html: ([], [url_canon], "t"),  # self-link
    )
    e = CrawlEngine(spark, str(tmp_path), web, cfg)
    e.seed([{"url": web.url(0, 0)}])
    stats = e.run(max_iterations=1)
    assert stats[0].leased == 1 and stats[0].links_new == 1
    assert e.frontier().count() == 1
    assert e.frontier_size == 1, "leased row must not be counted twice"


def test_items_modulus_change_disables_pruning(spark, tmp_path):
    """ADVICE r4 #4: a store resumed with a different items_buckets must read
    the whole items table (old segments' bucket keys are meaningless under
    the new modulus)."""
    web = _quiet_web()
    e1 = CrawlEngine(
        spark, str(tmp_path), web,
        CrawlConfig(items_buckets=8, items_prune_min_leaf_parts=0),
    )
    e1.seed([{"url": web.url(0, p)} for p in range(4)])
    e1.run()
    total = e1.t("items").read().count()
    assert total == 4
    assert e1._items_pruning_safe()

    e2 = CrawlEngine(
        spark, str(tmp_path), web,
        CrawlConfig(items_buckets=3, items_prune_min_leaf_parts=0),
    )
    assert not e2._items_pruning_safe()
    # the dedup right side sees EVERY committed fingerprint despite the
    # modulus change — no silent miss
    probe = e1.t("items").read().select("item_fp", "doc_id", "url", "title", "n_spans")
    side = {r.item_fp for r in e2._items_seen_side(probe).collect()}
    assert side == {r.item_fp for r in probe.collect()}
    # and the mixed flag sticks to future commits
    assert e2._items_meta().get("bucket_modulus_mixed") is True


def test_old_schema_store_resumes_with_null_backfill(spark, tmp_path):
    """ADVICE r4 #5: frontier/failed tables committed before the
    callback/auto_request columns existed read back with typed NULLs."""
    web = _quiet_web()
    e = CrawlEngine(spark, str(tmp_path), web, CrawlConfig(batch_size=10))
    e._init_tables()
    url = web.url(0, 0)
    old_row = (
        "fp0", url, url, "host-0.test", 300, 0, "TestParser", "todo", 0, None, None,
    )
    e.t("frontier").commit(
        spark.createDataFrame([old_row], OLD_FRONTIER_DDL), mode="append"
    )
    vis = e.frontier()
    assert {"callback", "auto_request"} <= set(vis.columns)
    r = vis.collect()[0]
    assert r.callback is None and r.auto_request is None
    # the crawl loop runs over the legacy row (NULL auto_request ⇒ fetch)
    e.frontier_size = 1
    stats = e.run(max_iterations=1)
    assert stats and stats[0].leased == 1 and stats[0].fetched_ok == 1

    old_failed = (
        "fpf", url, url, "host-0.test", 300, "TestParser", 11, 500, None, None,
    )
    e.t("failed").commit(
        spark.createDataFrame([old_failed], OLD_FAILED_DDL), mode="overwrite"
    )
    assert e.reload_failed() == 1
    assert e.frontier().filter(F.col("fingerprint") == "fpf").count() == 1


def test_modulus_guards_refuse_resume(spark, tmp_path):
    """Bucket placement is a pure function of the modulus: resuming with a
    different one must fail loudly, not silently mis-prune."""
    store = SnapshotStore(spark, str(tmp_path / "tasks"))
    tm = TaskManager(spark, store, n_buckets=4)
    tm.add_tasks([(1, "u1", 0, "P")])
    with pytest.raises(ValueError, match="n_buckets=4"):
        TaskManager(spark, store, n_buckets=8)

    web = _quiet_web()
    wh = str(tmp_path / "bloom")
    e1 = CrawlEngine(
        spark, wh, web, CrawlConfig(seen_set="bloom", bloom_buckets=8,
                                    bloom_capacity_per_bucket=1000),
    )
    e1.seed([{"url": web.url(0, 0)}])
    e2 = CrawlEngine(
        spark, wh, web, CrawlConfig(seen_set="bloom", bloom_buckets=16,
                                    bloom_capacity_per_bucket=1000),
    )
    with pytest.raises(ValueError, match="bloom_buckets=8"):
        e2._init_tables()
    # the resume path (never re-inits tables) must refuse too
    e3 = CrawlEngine(
        spark, wh, web, CrawlConfig(seen_set="bloom", bloom_buckets=16,
                                    bloom_capacity_per_bucket=1000),
    )
    with pytest.raises(ValueError, match="bloom_buckets=8"):
        e3.resume()
