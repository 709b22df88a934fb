"""Snapshot store: atomic versioned commits, time travel, checkpoint resume."""

import pytest

from feapder_spark.store import SnapshotStore


@pytest.fixture
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "warehouse"))


def test_append_and_overwrite_versions(store, spark):
    t = store.table("frontier")
    df1 = spark.createDataFrame([(1, "a")], "id INT, v STRING")
    df2 = spark.createDataFrame([(2, "b")], "id INT, v STRING")
    v0 = t.commit(df1, mode="append")
    v1 = t.commit(df2, mode="append")
    assert (v0, v1) == (0, 1)
    assert t.read().count() == 2
    assert t.read(version=0).count() == 1  # time travel
    t.commit(df1, mode="overwrite")
    assert t.read().count() == 1


def test_empty_table_has_schema(store, spark):
    t = store.table("seen")
    t.create_empty("fingerprint STRING, added_at TIMESTAMP")
    df = t.read()
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["fingerprint", "added_at"]


def test_rollback(store, spark):
    t = store.table("t")
    t.commit(spark.createDataFrame([(1,)], "x INT"))
    t.commit(spark.createDataFrame([(2,)], "x INT"))
    assert t.read().count() == 2
    t.rollback(0)
    assert t.read().count() == 1
    # committing after rollback creates a fresh lineage from v0's segments
    t.commit(spark.createDataFrame([(3,)], "x INT"))
    assert sorted(r.x for r in t.read().collect()) == [1, 3]


def test_checkpoint_restore(store, spark):
    a, b = store.table("a"), store.table("b")
    a.commit(spark.createDataFrame([(1,)], "x INT"))
    b.commit(spark.createDataFrame([(10,)], "x INT"))
    store.checkpoint({"iteration": 0}, ["a", "b"])
    # a torn iteration: a commits, b doesn't, no checkpoint written
    a.commit(spark.createDataFrame([(2,)], "x INT"))
    ckpt = store.restore_last_checkpoint()
    assert ckpt["label"] == {"iteration": 0}
    assert a.read().count() == 1 and b.read().count() == 1


def test_expire_snapshots_gc(spark, tmp_path):
    """expire_snapshots drops versions/segments outside the resume window;
    current reads and last-checkpoint resume stay intact, storage shrinks."""
    import os

    from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
    from feapder_spark.crawl.synthweb import SyntheticWeb

    web = SyntheticWeb(n_hosts=3, pages_per_host=3, seed=42)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, CrawlConfig(batch_size=8))
    engine.seed(web.seeds(3))
    engine.run()
    docs_before = engine.t("docs").read().count()
    seen_before = {r.fingerprint for r in engine.t("seen").read().collect()}

    def du(root):
        total = 0
        for dirpath, _d, files in os.walk(root):
            total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
        return total

    # compaction rewrites the frontier (overwrite) — its old delta segments
    # become unreferenced once the checkpoints that referenced them expire
    # (append-only tables keep every segment referenced by design)
    engine.compact_frontier()
    size_before = du(str(tmp_path / "wh"))
    stats = engine.expire_snapshots(keep_checkpoints=1)
    assert stats["versions_deleted"] > 0 and stats["segments_deleted"] > 0
    assert du(str(tmp_path / "wh")) < size_before

    # current state fully readable after GC
    assert engine.t("docs").read().count() == docs_before
    assert {r.fingerprint for r in engine.t("seen").read().collect()} == seen_before
    # resume from the retained window still works
    e2 = CrawlEngine(spark, str(tmp_path / "wh"), web, CrawlConfig(batch_size=8))
    ckpt = e2.resume()
    assert ckpt is not None
    # the crawl had drained, so seeding proceeds — but every seed is already
    # claimed: nothing re-enters the frontier, state unchanged
    e2.seed(web.seeds(3))
    assert e2.frontier().count() == 0
    assert e2.t("docs").read().count() == docs_before
    # idempotent
    stats2 = engine.expire_snapshots(keep_checkpoints=1)
    assert stats2["segments_deleted"] == 0


def test_partitioned_writes_colocate_buckets(store, spark, tmp_path):
    """shuffle_to must yield ~one healthy file per bucket dir, not the
    input-partitions x buckets small-file explosion (a 32-partition frame
    over 8 buckets previously wrote up to 256 shards per commit)."""
    import os

    from pyspark.sql import functions as F

    t = store.table("colocate")
    df = (
        spark.range(10_000)
        .repartition(32)  # adversarial input partitioning
        .select(
            F.col("id"),
            F.pmod(F.col("id"), F.lit(8)).cast("int").alias("b"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
    )
    t.commit_append_partitioned(df, "b", shuffle_to=8)
    man = t.manifest()
    seg = man.segments[-1]
    root = os.path.join(t.root, "data", seg)
    for d in sorted(os.listdir(root)):
        if not d.startswith("pb="):
            continue
        files = [f for f in os.listdir(os.path.join(root, d)) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d}: {len(files)} files (want 1 per bucket)"
    # and the data round-trips
    assert t.read().count() == 10_000

    t2 = store.table("colocate_ovw")
    t2.commit_partitions(df, "b", shuffle_to=8)
    root2 = os.path.join(t2.root, "data")
    seg_dirs = os.listdir(root2)
    assert len(seg_dirs) == 1
    for d in sorted(os.listdir(os.path.join(root2, seg_dirs[0]))):
        if not d.startswith("pb="):
            continue
        files = [
            f
            for f in os.listdir(os.path.join(root2, seg_dirs[0], d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"{d}: {len(files)} files (want 1 per bucket)"
    assert t2.read().count() == 10_000
