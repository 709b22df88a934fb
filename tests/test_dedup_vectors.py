"""Golden dedup conformance vectors — ported from the reference's only
assertive unit test (/root/reference/tests/test_dedup.py:23-104).

Every seen-set engine (local set, scalable memory Bloom, and the distributed
Spark paths) must satisfy: add→1/0 for new/dup, get with in-batch duplicate
marking, and filter_exist_data keeping only unseen.
"""

import pytest

from feapder_spark.operators.bloom_kernel import BloomKernel
from feapder_spark.operators.dedup import Dedup

DATA = {"xxx": 123, "xxxx": "xxxx"}
DATAS = ["xxx", "bbb", "xxx"]


@pytest.mark.parametrize(
    "filter_type",
    [Dedup.LiteFilter, Dedup.MemoryFilter, Dedup.BloomFilter, Dedup.ExpireFilter],
)
def test_golden_vectors(filter_type):
    kwargs = {"initial_capacity": 10_000} if filter_type in (Dedup.MemoryFilter, Dedup.BloomFilter) else {}
    dedup = Dedup(filter_type, **kwargs)

    # single-value path (test_dedup.py:33-34 etc.)
    assert dedup.add(DATA) == 1
    assert dedup.get(DATA) == 1

    # batch path with in-batch duplicate (test_dedup.py:37-39)
    datas = list(DATAS)
    assert dedup.get(datas) == [0, 0, 1]
    assert dedup.add(datas) == [1, 1, 0]
    assert dedup.get(datas) == [1, 1, 1]


def test_filter_exist_data():
    # test_dedup.py:88-104
    dedup = Dedup(Dedup.MemoryFilter, to_md5=True, initial_capacity=10_000)
    assert dedup.add(["xxx", "bbb"]) == [1, 1]
    datas = ["xxx", "bbb", "ccc"]
    dedup.filter_exist_data(datas)
    assert datas == ["ccc"]


def test_filter_exist_data_with_fingerprints_and_callback():
    dedup = Dedup(Dedup.LiteFilter, to_md5=False)
    dedup.add(["f1"])
    datas = ["a", "b"]
    fps = ["f1", "f2"]
    dropped = []
    dedup.filter_exist_data(datas, datas_fingerprints=fps, callback=dropped.append)
    assert datas == ["b"] and fps == ["f2"] and dropped == ["a"]


def _claim(spark, bss, blobs, datas):
    """Drive one golden-vector batch through the FUSED ``claim_new`` (the
    path production runs; ``check_and_add`` is the conformance surface the
    engine no longer calls).  ``datas`` are md5-prehashed like
    ``Dedup(to_md5=True)``; each row carries its batch index as the
    in-batch order column.  Returns (claimed_indices, next_blobs)."""
    from feapder_spark.urlnorm import get_md5

    rows = [(get_md5(d), 0, str(i)) for i, d in enumerate(datas)]
    keyed = spark.createDataFrame(
        rows, "fingerprint STRING, priority INT, url STRING"
    ).withColumn("bucket", bss.bucket_col())
    new_rows, changed = bss.claim_new(keyed, blobs)
    claimed = sorted(int(r.url) for r in new_rows.collect())
    changed = changed.localCheckpoint()
    untouched = blobs.join(changed.select("bucket").distinct(), on="bucket", how="left_anti")
    next_blobs = changed.unionByName(untouched).localCheckpoint()
    bss.release()
    return claimed, next_blobs


def test_golden_vectors_through_fused_claim_new(spark):
    """The reference add/get/in-batch vectors (test_dedup.py:23-39,88-104),
    asserted against the production Bloom path: one ``claim_new`` cogroup =
    in-batch first-dedup + membership + insert.  ``add(datas)==[1,1,0]``
    maps to "claim returns exactly the first-occurrence rows of unseen
    keys"; ``get==[1,1,1]`` afterwards maps to "a re-claim returns []"."""
    from feapder_spark.operators.seen_set import BloomSeenSet

    bss = BloomSeenSet(num_buckets=4, capacity_per_bucket=1000, error_rate=1e-5)
    blobs = bss.empty_blobs(spark).localCheckpoint()

    # single-value path: add(DATA) == 1, then get(DATA) == 1
    claimed, blobs = _claim(spark, bss, blobs, [DATA])
    assert claimed == [0]
    claimed, blobs = _claim(spark, bss, blobs, [DATA])
    assert claimed == []

    # batch path with in-batch duplicate: add(["xxx","bbb","xxx"]) == [1,1,0]
    claimed, blobs = _claim(spark, bss, blobs, DATAS)
    assert claimed == [0, 1], "first xxx + bbb claim; in-batch dup xxx does not"
    # get afterwards == [1,1,1]: nothing left to claim
    claimed, blobs = _claim(spark, bss, blobs, DATAS)
    assert claimed == []

    # filter_exist_data shape: only the unseen datum survives
    claimed, blobs = _claim(spark, bss, blobs, ["xxx", "bbb", "ccc"])
    assert claimed == [2]


def test_bloom_kernel_capacity_math_matches_reference():
    # bloomfilter.py:88-94: k = ceil(log2(1/P)); m = ceil(n|lnP| / (k ln^2 2))
    k = BloomKernel(100_000_000, 1e-5)
    assert k.num_slices == 17
    assert k.num_bits == k.num_slices * k.bits_per_slice
    # ~285 MB at 1e8 keys, P=1e-5 (reference docs/source_code/dedup.md:35)
    assert 270 * 1024 * 1024 < k.num_bits / 8 < 300 * 1024 * 1024


def test_bloom_kernel_no_false_negatives_and_low_fp_rate():
    k = BloomKernel(50_000, 1e-5)
    keys = [f"key-{i}" for i in range(20_000)]
    added = k.add(keys)
    assert added.all()
    assert k.contains(keys).all()  # no false negatives, ever
    probes = [f"other-{i}" for i in range(20_000)]
    fp = int(k.contains(probes).sum())
    assert fp <= 5  # P=1e-5 → expect ~0.2 false positives in 20k


def test_bloom_kernel_roundtrip_serialization():
    k = BloomKernel(1000, 1e-4)
    k.add(["a", "b", "c"])
    k2 = BloomKernel.from_bytes(k.to_bytes(), 1000, 1e-4)
    assert k2.contains(["a", "b", "c"]).all()
    assert not k2.contains(["zzz"]).any()


def test_scalable_bloom_rotates_generations():
    from feapder_spark.operators.dedup import ScalableMemoryBloom

    bloom = ScalableMemoryBloom(initial_capacity=50, error_rate=0.01)
    first = [f"k{i}" for i in range(120)]
    bloom.add(first)
    assert len(bloom.filters) >= 1
    bloom.add([f"m{i}" for i in range(120)])  # triggers rotation check
    assert len(bloom.filters) >= 2, "filter should chain after 50% fill (bloomfilter.py:142-162)"
    # earlier generations still answer get()
    assert bloom.get(first) == [1] * len(first)
