"""Round-3 regression tests for the round-2 advisor findings (ADVICE.md):

1. commit_partitions on a table with legacy segment-mode data migrates the
   segments into partitions instead of silently dropping them (the seen_set
   state-erasure hazard); the reverse direction (append commit on a
   partition-mode table) raises instead of dropping the partition map.
2. a TTL-expired fingerprint re-claimed while its original frontier row is
   still visible REPLACES that row (one visible version, the oracle's
   dict-keyed frontier), never duplicates it.
3. a url-rewritten request's recomputed fingerprint folds the row's payload
   in (request_fingerprint(url, data=payload), request.py:465-480).
4. retry_times is incremented BEFORE the failed_request hook, so a
   hook-returned replacement dict is parked as returned.
5. expire_snapshots skips stray non-version files and one bad table does not
   abort the sweep.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from feapder_spark.crawl import semantics as S
from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.fetcher import route_failures_hooked
from feapder_spark.crawl.oracle import run_oracle
from feapder_spark.crawl.synthweb import SyntheticWeb
from feapder_spark.examples import link_to_starved_parse
from feapder_spark.store import SnapshotStore
from feapder_spark.store.snapshot import SnapshotTable
from feapder_spark.urlnorm import request_fingerprint


# -- 1: segment→partition migration ----------------------------------------

def test_commit_partitions_migrates_legacy_segments(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "tbl")
    legacy = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "bucket INT, v STRING")
    t.commit(legacy, mode="append")
    # first partition-mode commit overwrites bucket 2 only; buckets 1 and 3
    # must survive via migration (pre-fix they silently vanished)
    t.commit_partitions(
        spark.createDataFrame([(2, "B")], "bucket INT, v STRING"), "bucket"
    )
    rows = {(r.bucket, r.v) for r in t.read().collect()}
    assert rows == {(1, "a"), (2, "B"), (3, "c")}
    m = t.manifest()
    assert not m.segments and set(m.partitions) == {"1", "2", "3"}
    # pruned read still works over migrated partitions
    assert {r.v for r in t.read_partitions([1]).collect()} == {"a"}


def test_append_commit_on_partition_table_raises(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "tbl")
    t.commit_partitions(spark.createDataFrame([(1, "a")], "bucket INT, v STRING"), "bucket")
    with pytest.raises(ValueError, match="partition mode"):
        t.commit(spark.createDataFrame([(9, "z")], "bucket INT, v STRING"), mode="append")
    # metadata-only commit preserves the partition map
    t.commit(None, meta={"mark": 1})
    assert t.manifest().partitions and t.read().count() == 1


# -- 2: TTL re-claim replaces the stale visible row -------------------------

def test_ttl_reclaim_replaces_stale_visible_row(spark, tmp_path):
    # host-1/page-0 is discovered at iteration 0 but politeness-starved
    # (budget 0) so its frontier row stays visible; at iteration 2 the claim
    # has expired (ttl=2) and the link is re-discovered — the engine must
    # REPLACE the visible row (tombstone + append), not append a duplicate.
    web = SyntheticWeb(n_hosts=2, pages_per_host=6, seed=11, n_links=0, flaky_every=10**9)
    seeds = [{"url": web.url(0, p)} for p in range(6)]
    pol = {"host-1.test": 0, "__default__": 10}
    cfg = CrawlConfig(
        batch_size=2, politeness=pol, seen_ttl_iterations=2,
        parse_fn=link_to_starved_parse,
    )
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(seeds)
    engine.run(max_iterations=3)

    from feapder_spark.urlnorm import canonicalize_url, get_md5

    fp = get_md5(canonicalize_url("http://host-1.test/page-0"))
    visible = engine.frontier().filter(F.col("fingerprint") == fp).collect()
    assert len(visible) == 1, f"duplicate visible rows for re-claimed fp: {visible}"
    # the re-claim's row, not iter 0's.  TTL-mode links append at row version
    # iteration+1 (= 3 for the re-claim at iteration 2) so a re-claim of a
    # fingerprint leased in the SAME batch can never share the row-version
    # key its lease tombstone just wrote (ADVICE r4) — the version constant
    # is the only thing that changed; replace semantics are identical.
    assert visible[0].added_iteration == 3

    golden = run_oracle(
        web, seeds, batch_size=2, politeness=pol, seen_ttl_iterations=2,
        parsers={"TestParser": link_to_starved_parse}, max_iterations=3,
    )
    order = [
        r.fingerprint
        for r in engine.t("crawl_order").read().orderBy("seq").select("fingerprint").collect()
    ]
    assert order == golden.crawl_order
    m = {
        r.iteration: (r.leased, r.links_new, r.links_dup)
        for r in engine.t("metrics").read().collect()
    }
    for om in golden.metrics:
        assert m[om["iteration"]] == (om["leased"], om["links_new"], om["links_dup"])
    # the re-claim happened: iteration 2 claimed the link as new again
    assert m[2][1] == 1


# -- 3 & 4: failure-hook identity + retry_times ordering --------------------

def _failure_frame(spark, payload=None):
    return spark.createDataFrame(
        [
            (
                "f0", "http://host-0.test/page-0", "http://host-0.test/page-0",
                "host-0.test", 300, "TestParser", 9, 503, "POST", payload,
            )
        ],
        "fingerprint STRING, url STRING, url_canon STRING, host STRING, "
        "priority INT, parser_name STRING, retry_times INT, status_code INT, "
        "method STRING, payload MAP<STRING, STRING>",
    )


def test_rewritten_request_fingerprint_includes_payload(spark):
    payload = {"q": "1", "page": "2"}

    def rewrite(d):
        return {"url": "http://host-0.test/page-3"}

    out = route_failures_hooked(_failure_frame(spark, payload), 20, exception_request=rewrite).collect()
    assert len(out) == 1
    got = out[0]
    # MAP round-trip may reorder keys; the engine folds whatever the row
    # carries — both orderings must be accepted
    expected = {
        request_fingerprint("http://host-0.test/page-3", data={"q": "1", "page": "2"}),
        request_fingerprint("http://host-0.test/page-3", data={"page": "2", "q": "1"}),
    }
    assert got.fingerprint in expected
    assert got.fingerprint != request_fingerprint("http://host-0.test/page-3")


def test_failed_request_hook_sees_final_retry_and_wins(spark):
    # the hook runs on executors, so it reports what it observed through the
    # row it returns: priority echoes the retry count the hook saw
    def on_failed(d):
        return {"retry_times": 99, "priority": int(d["retry_times"])}

    out = route_failures_hooked(
        _failure_frame(spark), max_retries=5, failed_request=on_failed
    ).collect()
    assert out[0].route == S.STATUS_FAILED
    assert out[0].priority == 10  # hook observed the post-increment count
    assert out[0].retry_times == 99  # hook-returned value parked, not clobbered


# -- 5: expire_snapshots robustness -----------------------------------------

def test_expire_snapshots_ignores_stray_files(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path))
    t = store.table("a")
    t.commit(spark.createDataFrame([(1,)], "x INT"), mode="overwrite")
    store.checkpoint({"i": 0}, ["a"])
    t.commit(spark.createDataFrame([(2,)], "x INT"), mode="overwrite")
    store.checkpoint({"i": 1}, ["a"])
    # stray files GC must skip: editor temp in _versions, a partial write
    vdir = os.path.join(str(tmp_path), "a", "_versions")
    open(os.path.join(vdir, ".0.json.swp"), "w").write("junk")
    open(os.path.join(vdir, "garbage.txt"), "w").write("{}")
    stats = store.expire_snapshots(keep_checkpoints=1)
    assert stats["errors"] == []
    assert stats["versions_deleted"] >= 1
    assert os.path.exists(os.path.join(vdir, ".0.json.swp"))  # untouched
    assert t.read().collect()[0].x == 2  # current version intact
