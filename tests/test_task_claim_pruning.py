"""Task-claim read-side pruning (VERDICT r2 #3): per-bucket state counts in
the manifest meta let claim/lost scans open only buckets that can match —
a claim against a table with one todo bucket opens exactly one partition dir."""

from feapder_spark.crawl.tasks import CLAIMED, DONE, TODO, TaskManager
from feapder_spark.store import SnapshotStore


def test_claim_reads_only_todo_buckets(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path))
    tm = TaskManager(spark, store, n_buckets=16)
    tm.add_tasks([(i, f"http://host-{i % 5}.test/page-{i % 7}", 0, "T") for i in range(160)])
    # drive every bucket except bucket 3 to DONE
    tm.update_state([i for i in range(160) if i % 16 != 3], DONE)

    assert tm._buckets_in_state(0) == [3]
    frame = tm._state_frame(TODO, 0)
    dirs = {f.split("pb=")[1].split("/")[0] for f in frame.inputFiles()}
    assert dirs == {"3"}  # ONE partition dir opened, not 16

    claimed = tm.claim_batch(limit=5)
    assert [r.id for r in claimed.collect()] == [3, 19, 35, 51, 67]
    # stats updated by the claim commit: bucket 3 carries both residues
    assert tm._buckets_in_state(1) == [3]
    lost = tm.lost_tasks()
    ldirs = {f.split("pb=")[1].split("/")[0] for f in lost.inputFiles()}
    assert ldirs == {"3"}
    assert lost.count() == 5
    assert tm.reset_lost() == 5
    assert tm._buckets_in_state(1) == []
    # everything still accounted for (rollup reads the whole table by design)
    roll = tm.rollup()
    assert roll["total"] == 160 and roll["by_state"][TODO] == 10


def test_stats_survive_init_task_and_legacy_tables(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path))
    tm = TaskManager(spark, store, n_buckets=4)
    tm.add_tasks([(i, "u", 0, "T") for i in range(8)])
    tm.update_state(list(range(8)), DONE)
    assert tm._buckets_in_state(0) == []
    tm.init_task()  # new-batch reset: every non-failed task back to todo
    assert sorted(tm._buckets_in_state(0)) == [0, 1, 2, 3]
    assert tm.claim_batch(limit=8).count() == 8

    # a table with no recorded stats (legacy manifest) falls back to full read
    tm2 = TaskManager(spark, store, table="legacy", n_buckets=4)
    tm2.table.create_empty("id INT, url STRING, state INT, parser_name STRING")
    assert tm2._buckets_in_state(0) is None
    assert tm2.claim_batch(limit=5).count() == 0
