"""Bloom seen-set crawl: the scale path must reproduce the oracle exactly
at test scale (P=1e-5 over a few hundred keys ⇒ false positives are
~impossible, so behaviour must be identical to the exact path)."""

from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.oracle import run_oracle
from feapder_spark.crawl.synthweb import SyntheticWeb


def test_bloom_engine_matches_oracle(spark, tmp_path):
    web = SyntheticWeb(n_hosts=6, pages_per_host=5, seed=42)
    seeds = web.seeds(6)
    golden = run_oracle(web, seeds, batch_size=12)

    # prune threshold 0 ⇒ the driver-side partition-pruned read path runs
    # (the default threshold only engages it on many-bucket tables)
    cfg = CrawlConfig(
        batch_size=12, seen_set="bloom", bloom_buckets=8,
        bloom_capacity_per_bucket=10_000, bloom_prune_read_min_partitions=0,
    )
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    assert engine.seed(seeds) is True
    engine.run()

    order = [
        r.fingerprint
        for r in engine.t("crawl_order").read().orderBy("seq").select("fingerprint").collect()
    ]
    docs = {r.doc_id for r in engine.t("docs").read().select("doc_id").collect()}
    failed = {r.fingerprint for r in engine.t("failed").read().collect()}
    assert order == golden.crawl_order
    assert docs == set(golden.docs.keys())
    assert failed == golden.failed
    # blobs exist and only the touched buckets are materialized
    blobs = engine.t("seen_set").read()
    assert 0 < blobs.count() <= 8 * 2
    # incremental commits: the table is partition-mode and its current state
    # references more than one commit's segment — proof that later iterations
    # rewrote only their touched buckets instead of the whole set
    man = engine.t("seen_set").manifest()
    assert man.partitions
    segments_referenced = {p.split("/")[0] for p in man.partitions.values()}
    assert len(segments_referenced) > 1


def test_bloom_with_politeness_matches_oracle(spark, tmp_path):
    """The scale seen-set composed with the politeness gate must still replay
    the oracle exactly (bloom membership is behaviorally exact at P=1e-5)."""
    web = SyntheticWeb(n_hosts=5, pages_per_host=4, seed=42)
    seeds = web.seeds(5)
    pol = {"__default__": 2, "host-0.test": 1}
    golden = run_oracle(web, seeds, batch_size=16, politeness=pol, max_iterations=40)
    cfg = CrawlConfig(
        batch_size=16, politeness=pol, seen_set="bloom",
        bloom_buckets=8, bloom_capacity_per_bucket=10_000,
    )
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(seeds)
    engine.run(max_iterations=40)
    order = [
        r.fingerprint
        for r in engine.t("crawl_order").read().orderBy("seq").select("fingerprint").collect()
    ]
    assert order == golden.crawl_order
    docs = {r.doc_id for r in engine.t("docs").read().select("doc_id").collect()}
    assert docs == set(golden.docs.keys())


def test_bloom_rejects_ttl_config(spark, tmp_path):
    """Bloom bits cannot expire — the reference pairs BloomFilter XOR
    ExpireFilter the same way; the engine must refuse the combination."""
    import pytest

    web = SyntheticWeb(n_hosts=2, pages_per_host=2, seed=42)
    with pytest.raises(ValueError, match="TTL"):
        CrawlEngine(
            spark, str(tmp_path / "wh"), web,
            CrawlConfig(seen_set="bloom", seen_ttl_iterations=5),
        )
