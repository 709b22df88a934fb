"""Multi-band LSH recall validation (VERDICT r2 #8): the (n_bits, n_tables)
dial is verified against the brute-force all-pairs baseline — recall is
monotone in the table count and reaches ≥0.9 at the documented setting
(4 bits × 16 tables on the sandbox embeddings; these synthetic vectors are
unclustered, so the sandbox needs more tables than clustered real-world
near-dups would — the recall≈1-(1-p^b)^T tradeoff itself is what's pinned)."""

from pyspark.sql import functions as F

from feapder_spark.operators import similarity as SIM

SF_DIR = "/root/testdata/sf0.001"
THRESHOLD = 0.45


def _true_pairs(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    cos = SIM._dot(F.col("emb_a"), F.col("emb_b")) / (
        SIM._norm(F.col("emb_a")) * SIM._norm(F.col("emb_b"))
    )
    out = pairs.withColumn("cos", cos).filter(F.col("cos") >= THRESHOLD)
    return {(r.vec_a, r.vec_b) for r in out.select("vec_a", "vec_b").collect()}


def test_multiband_recall_monotone_and_high_at_documented_setting(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    truth = _true_pairs(spark)
    assert truth  # the fixture has near-dup pairs to find

    recalls = []
    for n_tables in (1, 4, 8, 16):
        got = {
            (r.vec_a, r.vec_b)
            for r in SIM.multiband_neardup_pairs(
                emb, threshold=THRESHOLD, n_bits=4, n_tables=n_tables
            ).select("vec_a", "vec_b").collect()
        }
        # exact-verify guarantees no false positives: found ⊆ truth
        assert got <= truth, got - truth
        recalls.append(len(got) / len(truth))

    # more tables never lose pairs (candidates are a union over tables)
    assert recalls == sorted(recalls), recalls
    # the documented setting: 4 bits × 16 tables reaches ≥0.9 recall
    assert recalls[-1] >= 0.9, recalls


def test_adaptive_bits_holds_bucket_size_constant():
    """The bit count must grow with the table so E[bucket] stays ~target:
    10x rows => ~+3.3 bits, keeping the bucket self-join's Sigma n_b^2
    output linear in N instead of quadratic."""
    from feapder_spark.operators.similarity import adaptive_bits

    assert adaptive_bits(500) == 4          # oracle scale == the static SQL
    assert adaptive_bits(2_000) == 6
    assert adaptive_bits(20_000) == 10
    assert adaptive_bits(10**9) == 16       # hi clamp
    assert adaptive_bits(10) == 4           # lo clamp
    assert adaptive_bits(20_000, hi=64 // 6) == 10  # multiband dim budget
    # expected bucket size stays within 2x of target across 6 decades
    for n in [10**k for k in range(3, 9)]:
        bits = adaptive_bits(n)
        if bits < 16:  # below the clamp the invariant must hold
            assert 16 <= n / (1 << bits) <= 64, (n, bits)
