"""Task/Batch state machine + Item/UpdateItem sinks (SURVEY §1.6, §2 K5).

Mirrors the reference's task lifecycle tests (tests/batch-spider/
spiders/test_spider.py:18-52 state transitions; task claim
task_spider.py:383-395; lost-task recovery 398-418; batch_record lifecycle
batch_spider.py:610-846)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from feapder_spark.crawl.items import ItemTable, item_fp_col, table_name_of
from feapder_spark.crawl.semantics import item_fingerprint
from feapder_spark.crawl.tasks import CLAIMED, DONE, FAILED, TODO, BatchManager, TaskManager
from feapder_spark.operators.merge import merge_update, merge_upsert
from feapder_spark.store import SnapshotStore


@pytest.fixture
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "wh"))


def _states(tm):
    return {r.id: r.state for r in tm.read().collect()}


def test_claim_done_failed_lifecycle(spark, store):
    tm = TaskManager(spark, store)
    tm.add_tasks([(i, f"http://h.test/{i}", TODO, "TestParser") for i in range(1, 11)])

    claimed = tm.claim_batch(limit=4)
    assert sorted(r.id for r in claimed.collect()) == [1, 2, 3, 4]
    st = _states(tm)
    assert all(st[i] == CLAIMED for i in (1, 2, 3, 4))
    assert all(st[i] == TODO for i in range(5, 11))

    # writeback: 1,2 done; 3 failed (update_task_batch semantics)
    tm.update_state([1, 2], DONE)
    tm.update_state([3], FAILED)
    roll = tm.rollup()
    assert roll["total"] == 10 and roll["done"] == 3 and roll["failed"] == 1

    # task 4 is lost (claimed, never finished) → recover
    lost = [r.id for r in tm.lost_tasks().collect()]
    assert lost == [4]
    assert tm.reset_lost() == 1
    assert _states(tm)[4] == TODO


def test_claim_empty_and_condition(spark, store):
    tm = TaskManager(spark, store)
    tm.add_tasks([(1, "u1", DONE, "p"), (2, "u2", TODO, "p")])
    got = tm.claim_batch(limit=10, condition=F.col("id") > 1)
    assert [r.id for r in got.collect()] == [2]
    assert tm.claim_batch(limit=10).count() == 0  # nothing left todo


def test_batch_record_lifecycle(spark, store):
    tm = TaskManager(spark, store)
    tm.add_tasks([(i, f"u{i}", TODO, "p") for i in range(1, 5)])
    bm = BatchManager(spark, store, tm, interval_days=7)

    t0 = datetime(2026, 1, 1)
    assert bm.check_batch(t0) == "started_first_batch"
    assert bm.latest().total_count == 4 and bm.latest().is_done == 0

    # work through the batch
    tm.claim_batch(limit=4)
    tm.update_state([1, 2, 3], DONE)
    tm.update_state([4], FAILED)
    assert bm.check_batch(t0 + timedelta(days=1)) == "batch_done"
    latest = bm.latest()
    assert latest.done_count == 4 and latest.fail_count == 1 and latest.is_done == 1

    # interval elapses → new batch resets all non-failed tasks to todo
    assert bm.check_batch(t0 + timedelta(days=8)) == "started_new_batch"
    st = _states(tm)
    assert st[4] == FAILED, "failed tasks are NOT reset (batch_spider.py:595-608)"
    assert all(st[i] == TODO for i in (1, 2, 3))
    assert bm.latest().id == 2


def test_merge_update_and_upsert(spark):
    target = spark.createDataFrame([(1, "a", 0), (2, "b", 0)], "id INT, v STRING, state INT")
    src = spark.createDataFrame([(2, 9)], "id INT, state INT")
    out = {r.id: (r.v, r.state) for r in merge_update(target, src, ["id"], ["state"]).collect()}
    assert out == {1: ("a", 0), 2: ("b", 9)}

    src2 = spark.createDataFrame([(2, "B", 5), (3, "c", 1)], "id INT, v STRING, state INT")
    out2 = {r.id: (r.v, r.state) for r in merge_upsert(target, src2, ["id"]).collect()}
    assert out2 == {1: ("a", 0), 2: ("B", 5), 3: ("c", 1)}


def test_item_table_name():
    # item.py:97-106 / tools.key2underline: class name → snake, _item stripped
    assert table_name_of("SpiderDataItem") == "spider_data"
    assert table_name_of("TaskItem") == "task"
    assert table_name_of("Thing") == "thing"


def test_item_fingerprint_matches_python(spark):
    # JVM item_fp_col must equal the pure-python semantics.item_fingerprint
    item = {"id": 7, "title": "hello"}
    expected = item_fingerprint(item)
    df = spark.createDataFrame([(7, "hello")], "id INT, title STRING")
    got = df.select(item_fp_col(["id", "title"]).alias("fp")).first().fp
    assert got == expected


def test_item_save_dedup_and_update(spark, store):
    it = ItemTable(spark, store, "SpiderDataItem", "id INT, title STRING",
                   unique_key=["id"], update_key=["title"], key_cols=["id"])
    df = spark.createDataFrame([(1, "t1"), (2, "t2"), (1, "t1-dup")], "id INT, title STRING")
    # unique_key=[id] → in-batch dup on id collapses; 2 exported
    assert it.save_items(df) == 2
    # re-save: all fingerprints already recorded
    assert it.save_items(df) == 0
    # UpdateItem: update title of id=1, insert id=3
    it.update_items(spark.createDataFrame([(1, "T1-new"), (3, "t3")], "id INT, title STRING"))
    rows = {r.id: r.title for r in it.read().collect()}
    assert rows[1] == "T1-new" and rows[3] == "t3" and 2 in rows


def test_task_transitions_rewrite_only_touched_buckets(spark, tmp_path):
    """VERDICT r1 scale item: a claim against a big task table must rewrite
    only the claimed rows' buckets (dynamic partition overwrite), never the
    whole table."""
    from feapder_spark.store import SnapshotStore

    store = SnapshotStore(spark, str(tmp_path / "wh"))
    tm = TaskManager(spark, store, n_buckets=8)
    tm.add_tasks([(i, f"u{i}", 0, "P") for i in range(1, 801)])  # all 8 buckets
    before = dict(tm.table.manifest().partitions)
    assert len(before) == 8

    # claim 10 tasks: ids 1..10 → buckets {1..10 % 8} = {0..7}\... ids 1-10 → buckets 1,2,...,7,0,1,2
    claimed = tm.claim_batch(limit=10)
    assert claimed.count() == 10
    after = dict(tm.table.manifest().partitions)
    changed = {k for k in after if after[k] != before[k]}
    expected = {str(i % 8) for i in range(1, 11)}
    assert changed == expected  # untouched buckets carry the old dirs

    # a single-id state writeback touches exactly one bucket
    before2 = after
    tm.update_state([16], 1)
    after2 = dict(tm.table.manifest().partitions)
    assert {k for k in after2 if after2[k] != before2[k]} == {"0"}
    # correctness: full view reflects the transitions
    states = {r.id: r.state for r in tm.read().collect()}
    assert states[16] == 1 and states[1] == 2 and states[700] == 0
