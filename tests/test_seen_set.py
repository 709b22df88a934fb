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
    res1, blobs1 = bss.check_and_add(cand1, blobs)
    assert res1.agg(F.sum("is_new")).first()[0] == 50
    blobs1 = blobs1.localCheckpoint()  # materialize before reuse

    # second batch: 25 repeats + 25 fresh
    cand2 = spark.createDataFrame([(f"fp-{i}",) for i in range(25, 75)], "fingerprint STRING")
    res2, blobs2 = bss.check_and_add(cand2, blobs1)
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
        res, blobs = bss.check_and_add(cand, blobs)
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
    res0, _ = bss.check_and_add(cand0, blobs)
    assert res0.agg(F.sum("is_new")).first()[0] == 0
