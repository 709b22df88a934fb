"""Band-partitioned frontier (VERDICT r3 #1): the per-iteration lease read
opens only the lowest-priority bands whose visible counts cover batch_size —
the last O(frontier) read in the loop becomes O(lease).  Reference bound to
match: the Redis zset take is O(log n + k) per lease (redisdb.py:472-523),
never a full scan.  Also covers rollup-from-stats (VERDICT r3 #4)."""

import pytest
from pyspark.sql import functions as F

from feapder_spark.crawl import frontier as FR
from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.synthweb import SyntheticWeb
from feapder_spark.crawl.tasks import DONE, FAILED, TaskManager
from feapder_spark.store import SnapshotStore


def _web(**kw):
    return SyntheticWeb(n_hosts=4, pages_per_host=10, seed=42, **kw)


def test_band_pruned_lease_matches_full_read(spark, tmp_path):
    """The pruned lease leases exactly the rows the full-frontier top-k
    would, and records which bands it opened."""
    web = _web(n_links=0, flaky_every=10**9)
    e = CrawlEngine(spark, str(tmp_path), web, CrawlConfig(batch_size=3))
    seeds = [
        {"url": web.url(h, p), "priority": 100 if p == 0 else 300}
        for h in range(4)
        for p in range(10)
    ]
    e.seed(seeds)
    # 4 rows in band 100, 36 in band 300; k=3 is covered by band 100 alone
    assert e._lease_band_keys(3) == ["100"]
    assert e._lease_band_keys(5) == ["100", "300"]
    expected = [
        r.fingerprint
        for r in FR.take_batch(
            e._read_frontier().filter(F.col("status") == "todo"), 3
        ).collect()
    ]
    e._iterate()
    assert e._last_lease_bands == ["100"]
    leased = [
        r.fingerprint
        for r in e.t("crawl_order").read().orderBy("seq").collect()
    ]
    assert leased == expected


def test_band_prune_opens_one_hot_band_of_2m_frontier(spark, tmp_path):
    """Scale smoke: leasing 1000 rows against a 2M-row frontier with one hot
    band opens only that band's dirs."""
    web = _web(n_links=0)
    # max_retries=0: failed fetches park instead of re-adding into band 0,
    # so the post-lease visible count of the hot band is deterministic
    e = CrawlEngine(spark, str(tmp_path), web, CrawlConfig(batch_size=1000, max_retries=0))
    e._init_tables()
    adds = spark.range(2_000_000).select(
        F.md5(F.col("id").cast("string")).alias("fingerprint"),
        F.concat(F.lit("http://h.test/p"), F.col("id")).alias("url"),
        F.concat(F.lit("http://h.test/p"), F.col("id")).alias("url_canon"),
        F.lit("h.test").alias("host"),
        F.when(F.col("id") < 1000, 0).otherwise(300).cast("int").alias("priority"),
        F.lit(0).cast("int").alias("retry_times"),
        F.lit("TestParser").alias("parser_name"),
        F.lit("todo").alias("status"),
        F.lit(0).cast("int").alias("added_iteration"),
        F.lit(None).cast("string").alias("method"),
        F.lit(None).cast("map<string,string>").alias("payload"),
        F.lit(None).cast("string").alias("callback"),
        F.lit(True).alias("auto_request"),
    )
    e._commit_frontier_adds(adds, 2_000_000)
    e.frontier_size = 2_000_000
    keys = e._lease_band_keys(1000)
    assert keys == ["0"]
    sub_files = e.t("frontier").read_partition_subset(keys).inputFiles()
    assert sub_files and all("pb=0" in f for f in sub_files)
    all_files = e.t("frontier").read().inputFiles()
    assert len(sub_files) < len(all_files)
    # the visible count bookkeeping survives a lease: leased rows tombstone
    # in the same band, so the next lease skips ahead correctly
    st = e._iterate()
    assert st.leased == 1000 and e._last_lease_bands == ["0"]
    assert e._lease_band_keys(1000) == ["300"]


def _direct_adds(spark, rows):
    """rows: (fp, url, host, priority) → frontier-schema DataFrame."""
    full = [
        (fp, url, url, host, pr, 0, "TestParser", "todo", 0, None, None, None, True)
        for fp, url, host, pr in rows
    ]
    return spark.createDataFrame(full, FR.FRONTIER_DDL)


def test_gated_lease_opens_band_subset_and_matches_full_read(spark, tmp_path):
    """VERDICT r4 #1: with host budgets active, the lease must still open
    only a band subset when the lowest bands hold ≥ k gated-eligible rows —
    and lease exactly what the full-read gated lease would."""
    web = _web(n_links=0)
    e = CrawlEngine(
        spark, str(tmp_path), web,
        CrawlConfig(batch_size=3, max_retries=0, politeness={"__default__": 1}),
    )
    e._init_tables()
    rows = [(f"a{h}", f"http://h{h}.test/lo", f"h{h}.test", 100) for h in range(4)]
    rows += [
        (f"z{h}-{p}", f"http://h{h}.test/p{p}", f"h{h}.test", 300)
        for h in range(4) for p in range(9)
    ]
    e._commit_frontier_adds(_direct_adds(spark, rows), len(rows))
    e.frontier_size = len(rows)
    # expected = the gated top-k over the WHOLE frontier
    expected = [
        r.fingerprint
        for r in FR.take_batch(
            e._read_frontier_due(), 3, FR.budgets_df(spark, {}), default_budget=1
        ).collect()
    ]
    st = e._iterate()
    assert st.leased == 3
    assert e._last_lease_bands == ["100"], "band 100 has 4 hosts × budget 1 ≥ k=3"
    leased = [r.fingerprint for r in e.t("crawl_order").read().orderBy("seq").collect()]
    assert leased == expected


def test_gated_lease_expands_bands_until_k_eligible(spark, tmp_path):
    """When the gate starves the lowest band (all its rows on one host),
    the lease widens coverage geometrically — opening a STRICT subset of
    bands — and still equals the full-read gated lease."""
    web = _web(n_links=0)
    e = CrawlEngine(
        spark, str(tmp_path), web,
        CrawlConfig(batch_size=2, max_retries=0, politeness={"__default__": 1}),
    )
    e._init_tables()
    rows = [(f"a{p}", f"http://hA.test/p{p}", "hA.test", 100) for p in range(4)]
    rows += [(f"m{h}", f"http://h{h}.test/m", f"h{h}.test", 200) for h in range(4)]
    rows += [(f"z{p}", f"http://hF.test/z{p}", "hF.test", 300) for p in range(8)]
    e._commit_frontier_adds(_direct_adds(spark, rows), len(rows))
    e.frontier_size = len(rows)
    expected = [
        r.fingerprint
        for r in FR.take_batch(
            e._read_frontier_due(), 2, FR.budgets_df(spark, {}), default_budget=1
        ).collect()
    ]
    st = e._iterate()
    assert st.leased == 2
    # attempt 1 opens band 100 (4 visible ≥ k=2) but only 1 eligible row
    # (one host, budget 1); attempt 2 covers 8 rows = bands 100+200, whose
    # 5 eligible rows satisfy k — band 300 stays closed
    assert e._last_lease_bands == ["100", "200"]
    sub_files = e.t("frontier").read_partition_subset(["100", "200"]).inputFiles()
    all_files = e.t("frontier").read().inputFiles()
    assert len(sub_files) < len(all_files)
    leased = [r.fingerprint for r in e.t("crawl_order").read().orderBy("seq").collect()]
    assert leased == expected


def test_gated_multiband_crawl_matches_oracle(spark, tmp_path):
    """End-to-end: a multi-band frontier under politeness + token buckets
    (the production-default gated config) must reproduce the oracle crawl
    exactly while the engine leases through band-pruned reads."""
    from feapder_spark.crawl.oracle import run_oracle

    web = SyntheticWeb(n_hosts=4, pages_per_host=4, seed=42)
    seeds = [
        {"url": web.url(h, p), "priority": 100 if p == 0 else 300}
        for h in range(4) for p in range(4)
    ]
    tb = {"rate": 1.0, "burst": 2.0}
    pol = {"__default__": 2}
    golden = run_oracle(
        web, seeds, batch_size=4, politeness=pol, token_bucket=tb, max_iterations=25
    )
    cfg = CrawlConfig(batch_size=4, politeness=pol, token_bucket=tb)
    e = CrawlEngine(spark, str(tmp_path), web, cfg)
    e.seed(seeds)
    pruned_iters = 0
    for _ in range(25):
        st = e._iterate()
        if st is None:
            break
        if e._last_lease_bands is not None:
            pruned_iters += 1
    e.flush_metrics()
    order = [r.fingerprint for r in e.t("crawl_order").read().orderBy("seq").collect()]
    assert order == golden.crawl_order
    assert {r.fingerprint for r in e.t("seen").read().collect()} == golden.seen
    assert pruned_iters > 0, "the gated path must lease through banded reads"


def test_legacy_unbanded_store_falls_back_then_compacts_into_bands(spark, tmp_path):
    """A store with plain (unbanded) frontier segments reads whole — correct,
    just unpruned — and the first compaction migrates it into bands."""
    web = _web(n_links=0, flaky_every=10**9)
    e = CrawlEngine(spark, str(tmp_path), web, CrawlConfig(batch_size=2))
    e._init_tables()
    rows = [
        (
            F"fp{p}", web.url(0, p), web.url(0, p), "host-0.test", 300, 0,
            "TestParser", "todo", 0, None, None, None, True,
        )
        for p in range(3)
    ]
    e.t("frontier").commit(
        spark.createDataFrame(rows, FR.FRONTIER_DDL), mode="append"
    )
    e.frontier_size = 3
    assert e._lease_band_keys(2) is None  # counts can't bound a legacy store
    st = e._iterate()
    assert st.leased == 2 and e._last_lease_bands is None
    e.compact_frontier()
    assert e._lease_band_keys(1) == ["300"]
    st2 = e._iterate()
    assert st2.leased == 1 and e._last_lease_bands == ["300"]


def test_band_counts_invariant_across_messy_lifecycle(spark, tmp_path):
    """The manifest-derived per-band visible counts (what _lease_band_keys
    prunes on) must equal the ACTUAL visible frontier grouped by band, at
    every point of a lifecycle that mixes iterations, mid-crawl injection,
    failed-reload and compaction."""
    web = _web()  # default links include the always-failing host
    e = CrawlEngine(
        spark, str(tmp_path), web, CrawlConfig(batch_size=4, max_retries=0)
    )

    def check(tag):
        am = e.t("frontier").manifest()
        tm = e.t("frontier_tombs").manifest()
        a = (am.meta or {}).get("part_rows", {})
        t = (tm.meta or {}).get("part_rows", {}) if tm else {}
        derived = {
            b: a[b] - t.get(b, 0) for b in a if a[b] - t.get(b, 0) != 0
        }
        actual = {
            str(r.priority): r.n
            for r in e.frontier().groupBy("priority").agg(F.count("*").alias("n")).collect()
        }
        assert derived == actual, f"{tag}: derived {derived} != actual {actual}"
        assert sum(derived.values()) == e.frontier_size, tag

    e.seed(web.seeds(6))
    check("seeded")
    e._iterate()
    check("iter0")
    e.add_requests([{"url": web.url(2, 9), "priority": 50}])
    check("injected")
    e._iterate()
    check("iter1")
    if e.t("failed").read().count() > 0:
        e.reload_failed()
        check("reloaded")
    e._iterate()
    check("iter2")
    e.compact_frontier()
    check("compacted")
    e._iterate()
    check("iter3")


def test_rollup_served_from_manifest_stats_zero_jobs(spark, tmp_path):
    """VERDICT r3 #4: rollup() on a stats-bearing table is a driver-side
    dict sum — no table scan — and matches the verify=True scan exactly."""
    store = SnapshotStore(spark, str(tmp_path))
    tm = TaskManager(spark, store, n_buckets=4)
    tm.add_tasks([(i, f"u{i}", 0, "P") for i in range(20)])
    tm.claim_batch(limit=5)
    tm.update_state([1, 2], DONE)
    tm.update_state([3], FAILED)
    expected = tm.rollup(verify=True)
    tm.read = lambda: (_ for _ in ()).throw(AssertionError("rollup scanned the table"))
    got = tm.rollup()
    assert got == expected
    assert got["total"] == 20 and got["done"] == 3 and got["failed"] == 1
    with pytest.raises(AssertionError):
        tm.rollup(verify=True)
