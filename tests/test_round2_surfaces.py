"""Round-2 surface tests: seen-set TTL (ExpireFilter in the loop), batch
ETA/speed alarms, the related-spider gate, CSV/console sinks, deterministic
user-agent rotation, and the composed bucketed embedding near-dup operator."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.oracle import run_oracle
from feapder_spark.crawl.synthweb import SyntheticWeb
from feapder_spark.crawl.tasks import BatchManager, TaskManager
from feapder_spark.store import SnapshotStore

SF = "/root/testdata/sf0.001"


def test_seen_ttl_recrawls_and_matches_oracle(spark, tmp_path):
    """ExpireFilter semantics (expirefilter.py:17-81): a claim older than the
    TTL stops deduping, so rediscovered links re-crawl — engine and oracle
    must replay the same infinite-ish crawl step for step."""
    web = SyntheticWeb(n_hosts=3, pages_per_host=3, seed=42, flaky_every=10**9)
    seeds = web.seeds(3)
    golden = run_oracle(
        web, seeds, batch_size=64, max_retries=0, max_iterations=6, seen_ttl_iterations=2
    )
    cfg = CrawlConfig(batch_size=64, max_retries=0, seen_ttl_iterations=2)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(seeds)
    engine.run(max_iterations=6)

    order = [
        r.fingerprint
        for r in engine.t("crawl_order").read().orderBy("seq").select("fingerprint").collect()
    ]
    assert order == golden.crawl_order
    # the TTL actually caused re-crawls: some fingerprint leased twice
    assert len(order) > len(set(order))
    m = {
        r.iteration: (r.leased, r.fetched_ok, r.links_new, r.links_dup)
        for r in engine.t("metrics").read().collect()
    }
    for om in golden.metrics:
        assert m[om["iteration"]] == (
            om["leased"], om["fetched_ok"], om["links_new"], om["links_dup"],
        )


def test_get_deal_speed_and_overflow(spark, tmp_path):
    """get_deal_speed math, verbatim from batch_spider.py:551-593."""
    store = SnapshotStore(spark, str(tmp_path / "wh"))
    tasks = TaskManager(spark, store)
    bm = BatchManager(spark, store, tasks, interval_days=1.0)
    t0 = datetime(2026, 1, 1, 0, 0, 0)

    # first observation primes the state, no estimate yet
    assert bm.get_deal_speed(100, 10, t0, t0 + timedelta(hours=1)) is None
    # 20 more done over the next hour → 20/h; 70 left → 12600 s needed;
    # elapsed 2 h + 12600 s − 86400 s deadline → finishes 66600 s early
    speed, need, overflow, _at = bm.get_deal_speed(100, 30, t0, t0 + timedelta(hours=2))
    assert speed == 20
    assert need == 70 / (20 / 3600)
    assert overflow == 7200 + need - 86400
    # unchanged done_count returns the cached estimate
    assert bm.get_deal_speed(100, 30, t0, t0 + timedelta(hours=3))[0] == 20

    # a tight deadline makes the same progress overflow → alarm fires
    bm2 = BatchManager(spark, store, tasks, interval_days=0.01, table="batch_record2")
    tasks.add_tasks([(i, f"u{i}", 0, "P") for i in range(1, 101)])
    bm2.record_batch(t0)
    tasks.update_state(list(range(1, 11)), 1)
    bm2.update_progress(t0 + timedelta(hours=1))
    assert bm2.speed_alarm(t0 + timedelta(hours=1)) is None  # primes state
    tasks.update_state(list(range(11, 31)), 1)
    bm2.update_progress(t0 + timedelta(hours=2))
    alarm = bm2.speed_alarm(t0 + timedelta(hours=2))
    assert alarm is not None and "overflow" in alarm


def test_related_spider_gate(spark, tmp_path):
    """J5: a finished batch waits for its related spider
    (batch_spider.py:848-872) before flipping is_done."""
    store = SnapshotStore(spark, str(tmp_path / "wh"))
    tasks = TaskManager(spark, store)
    bm = BatchManager(spark, store, tasks, interval_days=7.0)
    t0 = datetime(2026, 1, 1)
    tasks.add_tasks([(1, "u1", 0, "P"), (2, "u2", 0, "P")])
    assert bm.check_batch(t0) == "started_first_batch"
    tasks.update_state([1, 2], 1)  # all done

    # related spider still has frontier rows → gate holds
    related_frontier = spark.createDataFrame([("fp1",)], "fingerprint STRING")
    assert bm.check_batch(t0 + timedelta(hours=1), related_frontier=related_frontier) == "waiting_related"
    assert bm.latest().is_done == 0

    # related batch record not done → gate holds
    rel_tasks = TaskManager(spark, store, table="rel_tasks")
    rel_bm = BatchManager(spark, store, rel_tasks, table="rel_batch")
    rel_tasks.add_tasks([(1, "r1", 0, "P")])
    rel_bm.record_batch(t0)
    empty_frontier = related_frontier.limit(0)
    assert bm.check_batch(t0 + timedelta(hours=2), related_frontier=empty_frontier,
                          related_batch=rel_bm) == "waiting_related"

    # related finishes → batch flips done
    rel_tasks.update_state([1], 1)
    rel_bm.update_progress(t0 + timedelta(hours=3))
    assert rel_bm.latest().is_done == 1
    assert bm.check_batch(t0 + timedelta(hours=3), related_frontier=empty_frontier,
                          related_batch=rel_bm) == "batch_done"
    assert bm.latest().is_done == 1


def test_csv_and_console_sinks(spark, tmp_path):
    from feapder_spark.sources.sinks import ConsolePipeline, CsvPipeline

    items = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id INT, name STRING"
    )
    csvp = CsvPipeline(str(tmp_path / "csv"))
    assert csvp.save_items("demo", items) is True
    assert csvp.save_items("demo", items.filter(F.col("id") > 2)) is True
    back = csvp.read_back(spark, "demo", "id INT, name STRING")
    assert back.count() == 4  # two appended batches
    assert {r.name for r in back.collect()} == {"a", "b", "c"}

    cp = ConsolePipeline(max_rows=2)
    assert cp.save_items("demo", items) is True
    assert cp.batches_seen == 1


def test_user_agent_rotation_deterministic(spark, tmp_path):
    from feapder_spark.crawl.fetcher import UA_POOL, with_user_agent

    df = spark.createDataFrame([(f"fp-{i}",) for i in range(200)], "fingerprint STRING")
    a = {r.fingerprint: r.user_agent for r in with_user_agent(df).collect()}
    b = {r.fingerprint: r.user_agent for r in with_user_agent(df).collect()}
    assert a == b  # same request → same UA, every run
    assert set(a.values()) <= set(UA_POOL)
    assert len(set(a.values())) >= 3  # the pool actually rotates

    # rides through the engine fetch stage untouched
    web = SyntheticWeb(n_hosts=2, pages_per_host=2, seed=42, n_links=0, flaky_every=10**9)
    engine = CrawlEngine(
        spark, str(tmp_path / "wh"), web, CrawlConfig(batch_size=8, user_agent_rotation=True)
    )
    engine.seed([{"url": web.url(h, p)} for h in range(2) for p in range(2)])
    stats = engine.run()
    assert sum(s.fetched_ok for s in stats) == 4


def test_bucketed_neardup_subset_of_bruteforce(spark):
    """The composed LSH→verify pipeline's pairs are exactly the brute-force
    near-dup pairs that share a bucket (recall dial = n_bits)."""
    from feapder_spark.operators.similarity import bucket_expr, bucketed_neardup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {(r.vec_a, r.vec_b) for r in bucketed_neardup_pairs(emb, 0.45, n_bits=4).collect()}
    # brute force reference
    from feapder_spark.operators.similarity import _dot, _norm

    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (_norm(F.col("emb_a")) * _norm(F.col("emb_b")))
    brute = a.join(b, F.col("vec_a") < F.col("vec_b")).withColumn("cos", cos).filter(
        F.col("cos") >= 0.45
    )
    buckets = {r.vec_id: r.b for r in emb.select("vec_id", bucket_expr(n_bits=4).alias("b")).collect()}
    expected = {
        (r.vec_a, r.vec_b) for r in brute.collect() if buckets[r.vec_a] == buckets[r.vec_b]
    }
    assert got == expected


def test_add_requests_mid_crawl(spark, tmp_path):
    """S6: standing seed injection — new requests join the live frontier
    with claim-on-enqueue dedup; duplicates of already-claimed URLs drop."""
    web = SyntheticWeb(n_hosts=3, pages_per_host=3, seed=42, n_links=0, flaky_every=10**9)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, CrawlConfig(batch_size=4))
    engine.seed([{"url": web.url(0, 0)}, {"url": web.url(0, 1)}])
    engine.run(max_iterations=1)

    added = engine.add_requests(
        [
            {"url": web.url(0, 0)},                     # dup of a claimed seed → dropped
            {"url": web.url(1, 0), "priority": 100},    # fresh
            {"url": web.url(2, 0)},                     # fresh
        ]
    )
    assert added == 2
    assert engine.frontier().count() == 2  # the two fresh rows (seeds drained)
    engine.run()
    docs = {r.url for r in engine.t("docs").read().collect()}
    assert web.url(1, 0) in docs and web.url(2, 0) in docs
    # claimed exactly once each
    assert engine.t("seen").read().count() == 4


class _FlakyPipeline:
    """Fails the first call, succeeds afterwards (transient export failure)."""

    def __init__(self):
        self.calls = 0

    def save_items(self, table_name, items):
        self.calls += 1
        if self.calls == 1:
            raise IOError("transient sink outage")
        return True


def test_failed_item_park_and_reload(spark, tmp_path):
    """S10: a failing export parks the batch WITHOUT committing fingerprints
    (export-then-commit ordering, item_buffer.py:351-414); reload re-exports."""
    from feapder_spark.crawl.items import ItemTable

    store = SnapshotStore(spark, str(tmp_path / "wh"))
    t = ItemTable(spark, store, "DemoItem", "id INT, name STRING", unique_key=["id"])
    items = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, name STRING")
    sink = _FlakyPipeline()

    assert t.save_items(items, pipelines=[sink]) == 0  # export failed → parked
    assert t.read().count() == 0                        # fingerprints NOT committed
    assert t._failed_table().read().count() == 2

    assert t.reload_failed_items(pipelines=[sink]) == 2  # retry succeeds
    assert t.read().count() == 2
    assert t._failed_table().read().count() == 0
    # idempotent: re-saving the same items is a dedup no-op now
    assert t.save_items(items, pipelines=[sink]) == 0
    assert t.read().count() == 2


def test_download_midware_reroutes_fetch_only(spark, tmp_path):
    """download_midware (base_parser.py:32-41): the outgoing fetch is
    transformed, the request identity is not — the doc lands under the
    ORIGINAL canonical url."""
    from feapder_spark.examples import mirror_download_midware
    from feapder_spark.urlnorm import canonicalize_url, get_md5

    web = SyntheticWeb(n_hosts=1, pages_per_host=2, seed=42, n_links=0, flaky_every=10**9)
    cfg = CrawlConfig(batch_size=8, download_midware=mirror_download_midware)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    bad = "http://host-bad.test/page-1"
    engine.seed([{"url": bad}, {"url": web.url(0, 0)}])
    stats = engine.run()
    assert sum(s.fetched_ok for s in stats) == 2  # bad-host fetch rerouted → 200
    docs = {r.url for r in engine.t("docs").read().collect()}
    assert canonicalize_url(bad) in docs  # identity preserved
    assert engine.t("failed").read().count() == 0
    # seen set claimed the ORIGINAL fingerprint
    assert get_md5(canonicalize_url(bad)) in {
        r.fingerprint for r in engine.t("seen").read().collect()
    }


def test_item_pre_to_db_transform(spark, tmp_path):
    """Item.pre_to_db (item.py:59-63): items transform before export."""
    from feapder_spark.crawl.items import ItemTable

    store = SnapshotStore(spark, str(tmp_path / "wh"))
    t = ItemTable(
        spark, store, "CleanItem", "id INT, name STRING", unique_key=["id"],
        pre_to_db=lambda df: df.withColumn("name", F.upper(F.col("name"))),
    )
    t.save_items(spark.createDataFrame([(1, "a"), (2, "b")], "id INT, name STRING"))
    assert {r.name for r in t.read().collect()} == {"A", "B"}
    # dedup happens on the POST-transform fingerprint (re-save is a no-op)
    assert t.save_items(spark.createDataFrame([(1, "a")], "id INT, name STRING")) == 0


def test_multiband_lsh_recall_dominates_single_table(spark):
    """Multi-band LSH (banding trick): pairs found = brute-force near-dups
    colliding in ANY table; recall must dominate the single-table pipeline."""
    from feapder_spark.operators.similarity import (
        _dot,
        _norm,
        bucket_expr,
        bucketed_neardup_pairs,
        multiband_neardup_pairs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    single = {(r.vec_a, r.vec_b) for r in bucketed_neardup_pairs(emb, 0.45, n_bits=4).collect()}
    multi = {(r.vec_a, r.vec_b) for r in multiband_neardup_pairs(emb, 0.45, 4, 6).collect()}
    assert single <= multi  # table 0 of the multiband IS the single table

    # exactness: multiband == brute-force pairs sharing any of the 6 buckets
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    cos = _dot(F.col("emb_a"), F.col("emb_b")) / (_norm(F.col("emb_a")) * _norm(F.col("emb_b")))
    brute = a.join(b, F.col("vec_a") < F.col("vec_b")).withColumn("cos", cos).filter(
        F.col("cos") >= 0.45
    )
    buckets = {
        r.vec_id: [r[f"b{t}"] for t in range(6)]
        for r in emb.select(
            "vec_id", *[bucket_expr(n_bits=4, offset=t * 4).alias(f"b{t}") for t in range(6)]
        ).collect()
    }
    expected = {
        (r.vec_a, r.vec_b)
        for r in brute.collect()
        if any(x == y for x, y in zip(buckets[r.vec_a], buckets[r.vec_b]))
    }
    assert multi == expected
