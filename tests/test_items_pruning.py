"""Items-table bucket pruning (VERDICT r2 top task): the per-iteration item
dedup anti-join must read only the batch's buckets — the reference's item
dedup is an O(batch) Redis check (item_buffer.py:180-217); this matches its
I/O bound on a ≥1M-row items table."""

from pyspark.sql import functions as F

from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.synthweb import SyntheticWeb
from feapder_spark.store.snapshot import SnapshotTable


def test_commit_append_partitioned_roundtrip(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path), "t")
    # legacy unpartitioned segment first — must stay readable (whole) forever
    t.commit(spark.createDataFrame([("legacy", 0)], "k STRING, v INT"), mode="append")
    df = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        F.col("id").cast("int").alias("v"),
        (F.col("id") % 8).cast("int").alias("b"),
    )
    t.commit_append_partitioned(df, "b")
    t.commit_append_partitioned(
        spark.createDataFrame([("extra", 500, 3)], "k STRING, v INT, b INT"), "b"
    )
    assert t.read().count() == 102  # legacy + 100 + 1; placement col dropped
    assert "b" not in t.read().columns
    # subset read: bucket 3 rows from BOTH partitioned segments + the whole
    # legacy segment (unprunable, included for correctness)
    sub = t.read_partition_subset([3])
    ks = {r.k for r in sub.collect()}
    assert "extra" in ks and "legacy" in ks
    assert all(k == "legacy" or k == "extra" or int(k[1:]) % 8 == 3 for k in ks)
    assert t.leaf_partition_count() == 1 + 8 + 1  # legacy + 8 buckets + 1 bucket


def test_items_dedup_read_prunes_to_batch_buckets(spark, tmp_path):
    web = SyntheticWeb(n_hosts=1, pages_per_host=4, seed=42, n_links=0, flaky_every=10**9)
    cfg = CrawlConfig(batch_size=8, items_buckets=64, items_prune_min_leaf_parts=8)
    # first crawl produces the real item fingerprints
    e1 = CrawlEngine(spark, str(tmp_path / "wh1"), web, cfg)
    e1.seed([{"url": web.url(0, p)} for p in range(4)])
    e1.run()
    real_items = e1.t("items").read()
    assert real_items.count() == 4

    # second warehouse: pre-populate a 1M-row bucket-partitioned items table
    # (synthetic fps) PLUS the 4 real fps
    e2 = CrawlEngine(spark, str(tmp_path / "wh2"), web, cfg)
    e2._init_tables()
    bulk = spark.range(1_000_000).select(
        F.md5(F.col("id").cast("string")).alias("item_fp"),
        F.md5(F.col("id").cast("string")).alias("doc_id"),
        F.lit("http://x.test/p").alias("url"),
        F.lit("t").alias("title"),
        F.lit(1).cast("int").alias("n_spans"),
    )
    seeded = bulk.unionByName(real_items.select(*bulk.columns))
    # the modulus the placement keys were computed with must ride the commit
    # (ADVICE r4): without it the engine assumes unknown placement and reads
    # the whole table rather than risk a silent dedup miss
    e2.t("items").commit_append_partitioned(
        seeded.withColumn("ib", e2._item_bucket_col()), "ib", meta=e2._items_meta()
    )
    assert e2.t("items").leaf_partition_count() > cfg.items_prune_min_leaf_parts

    # the dedup read touches EXACTLY the batch's buckets — on a 1M-row table
    pruned = e2._items_seen_side(real_items)
    batch_buckets = {
        r[0] for r in real_items.select(e2._item_bucket_col().alias("b")).distinct().collect()
    }
    touched_dirs = {f.split("pb=")[1].split("/")[0] for f in pruned.inputFiles()}
    assert touched_dirs == {str(b) for b in batch_buckets}
    assert len(touched_dirs) <= 4 < cfg.items_buckets

    # end-to-end: the crawl dedups against the pre-populated fps — nothing
    # appended, equivalence of the items path preserved
    e2.seed([{"url": web.url(0, p)} for p in range(4)])
    e2.run()
    assert e2.t("items").read().count() == 1_000_004
