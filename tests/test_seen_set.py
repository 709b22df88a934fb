"""Distributed seen-set operators: exact anti-join path and bucketed Bloom."""

from pyspark.sql import functions as F

from feapder_spark.operators.seen_set import BloomSeenSet, dedup_new, mark_in_batch_first


def test_mark_in_batch_first(spark):
    df = spark.createDataFrame(
        [("f1", 300), ("f1", 100), ("f2", 300)], "fingerprint STRING, priority INT"
    )
    out = mark_in_batch_first(df).collect()
    by_fp = {}
    for r in out:
        by_fp.setdefault(r.fingerprint, []).append((r.priority, r.is_first_in_batch))
    # lowest priority wins the 'first' slot for f1
    assert sorted(by_fp["f1"]) == [(100, 1), (300, 0)]
    assert by_fp["f2"] == [(300, 1)]


def test_dedup_new_exact(spark):
    cand = spark.createDataFrame(
        [("f1", 300), ("f2", 300), ("f2", 200), ("f3", 300)],
        "fingerprint STRING, priority INT",
    )
    seen = spark.createDataFrame([("f1",)], "fingerprint STRING")
    new = dedup_new(cand, seen)
    rows = {(r.fingerprint, r.priority) for r in new.collect()}
    assert rows == {("f2", 200), ("f3", 300)}


def test_bloom_seen_set_claim_semantics(spark):
    bss = BloomSeenSet(num_buckets=8, capacity_per_bucket=1000, error_rate=1e-5)
    blobs = bss.empty_blobs(spark)
    cand1 = spark.createDataFrame([(f"fp-{i}",) for i in range(50)], "fingerprint STRING")
    res1, blobs1, touched1 = bss.check_and_add(cand1, blobs)
    assert res1.agg(F.sum("is_new")).first()[0] == 50
    blobs1 = blobs1.localCheckpoint()  # materialize before reuse

    # second batch: 25 repeats + 25 fresh
    cand2 = spark.createDataFrame([(f"fp-{i}",) for i in range(25, 75)], "fingerprint STRING")
    res2, blobs2, _ = bss.check_and_add(cand2, blobs1)
    got = {r.fingerprint: r.is_new for r in res2.collect()}
    assert sum(got.values()) == 25
    assert all(got[f"fp-{i}"] == 0 for i in range(25, 50))
    assert all(got[f"fp-{i}"] == 1 for i in range(50, 75))


def test_bloom_seen_set_generation_rotation(spark):
    bss = BloomSeenSet(num_buckets=2, capacity_per_bucket=40, error_rate=0.01)
    blobs = bss.empty_blobs(spark).localCheckpoint()
    for batch in range(3):
        cand = spark.createDataFrame(
            [(f"g-{batch}-{i}",) for i in range(60)], "fingerprint STRING"
        )
        res, blobs, _ = bss.check_and_add(cand, blobs)
        # false positives are expected: P=0.01 nominal, higher while a
        # generation is overfilled awaiting rotation — only no-false-negative
        # and rotation behaviour are contractual here
        assert res.agg(F.sum("is_new")).first()[0] >= 45
        blobs = blobs.localCheckpoint()
    # at least one bucket should have chained a second generation
    max_gen = blobs.agg(F.max("generation")).first()[0]
    assert max_gen >= 1
    # old generations still answer membership: re-check batch 0
    cand0 = spark.createDataFrame([(f"g-0-{i}",) for i in range(60)], "fingerprint STRING")
    res0, _, _ = bss.check_and_add(cand0, blobs)
    assert res0.agg(F.sum("is_new")).first()[0] == 0


def test_bloom_incremental_touched_only(spark):
    """The scale contract: candidates touching 1 bucket must (a) emit touched
    blobs for exactly that bucket, (b) pass every other blob through
    JVM-side untouched (same bytes, no Python round-trip)."""
    bss = BloomSeenSet(num_buckets=16, capacity_per_bucket=1000, error_rate=1e-5)
    seed_cands = spark.createDataFrame([(f"fp-{i}",) for i in range(200)], "fingerprint STRING")
    _, blobs, _ = bss.check_and_add(seed_cands, bss.empty_blobs(spark))
    blobs = blobs.localCheckpoint()
    n_buckets_before = blobs.select("bucket").distinct().count()
    assert n_buckets_before > 4  # spread over many buckets

    # one candidate → exactly one touched bucket
    one = spark.createDataFrame([("fp-0",)], "fingerprint STRING")
    res, new_blobs, touched = bss.check_and_add(one, blobs)
    assert res.collect()[0].is_new == 0
    t = touched.collect()
    expected_bucket = one.select(bss.bucket_col("fingerprint").alias("b")).collect()[0].b
    assert {r.bucket for r in t} == {expected_bucket}
    # untouched blobs byte-identical through the passthrough branch
    before = {(r.bucket, r.generation): bytes(r.bits) for r in blobs.collect()}
    after = {(r.bucket, r.generation): bytes(r.bits) for r in new_blobs.collect()}
    untouched_keys = [k for k in before if k[0] != t[0].bucket]
    assert untouched_keys and all(before[k] == after[k] for k in untouched_keys)


def test_commit_partitions_rewrites_only_touched(spark, tmp_path):
    """SnapshotTable.commit_partitions: a commit's new segment contains only
    the touched partitions; untouched partitions carry over by reference."""
    import os

    from feapder_spark.store import SnapshotStore

    store = SnapshotStore(spark, str(tmp_path / "wh"))
    t = store.table("blobs")
    t.create_empty(BloomSeenSet.BLOBS_SCHEMA)
    full = spark.createDataFrame(
        [(b, 0, bytearray([b])) for b in range(8)], BloomSeenSet.BLOBS_SCHEMA
    )
    t.commit_partitions(full, "bucket")
    v1 = t.manifest()
    assert set(v1.partitions) == {str(b) for b in range(8)}

    delta = spark.createDataFrame([(3, 0, bytearray([99]))], BloomSeenSet.BLOBS_SCHEMA)
    t.commit_partitions(delta, "bucket")
    v2 = t.manifest()
    # only bucket 3's dir changed; the other 7 carry the v1 paths
    changed = {k for k in v2.partitions if v2.partitions[k] != v1.partitions[k]}
    assert changed == {"3"}
    seg_dir = os.path.join(t.root, "data", v2.partitions["3"].split("/")[0])
    assert sorted(d for d in os.listdir(seg_dir) if d.startswith("pb=")) == ["pb=3"]
    # full read reflects the overwrite; partition-pruned read hits one dir
    rows = {r.bucket: bytes(r.bits) for r in t.read().collect()}
    assert rows[3] == b"\x63" and rows[0] == b"\x00" and len(rows) == 8
    pruned = t.read_partitions([3, 5, 99]).collect()
    assert {r.bucket for r in pruned} == {3, 5}
    # rollback restores the old partition map (snapshot semantics)
    t.rollback(v1.version)
    assert {r.bucket: bytes(r.bits) for r in t.read().collect()}[3] == b"\x03"
