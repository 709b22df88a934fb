"""Benchmark harness (driver contract).

Runs (a) the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) and (b) the crawl-engine throughput bench on a
deterministic synthetic frontier (seed=42, no network — BASELINE.md
protocol), on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total query suite seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "crawl": {"urls_per_sec": ..., "urls": ..., "dedup_checks": ...},
   "dedup_keys_per_sec": ...}

The reference's published numbers (BASELINE.md): ExpireFilter ≈38k keys/s,
in-proc Bloom ≈20k keys/s, Redis Bloom ≈2.9k keys/s — `dedup_keys_per_sec`
is the direct comparison.  Scaling evidence (local[8] vs local[32]) is
produced by scripts/run_scaling.py into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "frontier_topk_lease",
    "seen_antijoin",
    "inbatch_dup_mark",
    "task_state_rollup",
    "batch_progress",
    "politeness_host_rank",
    "dedup_exact",
    "token_stats",
    "quality_score",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_verified_dups",
    "simhash",
    "embedding_cosine_topk",
    "ann_ivf_topk",
    "ann_verified_neardups",
    "ann_multiband_neardups",
    "sessionize",
    "crawl_rate_window",
    "pricing_rollup",
]


def crawl_bench(spark, n_hosts=150, pages_per_host=60, batch_size=6000, max_iterations=4, seen="exact"):
    """Crawl throughput: URLs fetched+deduped per second on the synthetic
    frontier (the north-star metric at sandbox scale).  Seeds cover the
    whole page grid so every iteration leases a full batch — measuring
    steady-state throughput, not ramp-up."""
    from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
    from feapder_spark.crawl.synthweb import SyntheticWeb

    web = SyntheticWeb(n_hosts=n_hosts, pages_per_host=pages_per_host, seed=42)
    seeds = [
        {"url": web.url(h, p), "priority": 300}
        for h in range(n_hosts)
        for p in range(pages_per_host)
    ]
    with tempfile.TemporaryDirectory() as wh:
        # bloom sizing follows the workload: ~50k fingerprints at bench scale
        # → 32 buckets × 30k capacity ≈ 0.1 MB blobs (same bucket-count-scales-
        # with-keys rule a 10^10 deployment uses: 4096 × 2.5e6)
        engine = CrawlEngine(
            spark, wh, web,
            CrawlConfig(batch_size=batch_size, seen_set=seen, bloom_buckets=32,
                        bloom_capacity_per_bucket=30_000),
        )
        engine.seed(seeds)
        t0 = time.time()
        stats = engine.run(max_iterations=max_iterations)
        wall = time.time() - t0
        urls = sum(s.leased for s in stats)
        dedup_checks = sum(s.links_new + s.links_dup for s in stats)
    return {
        "urls": urls,
        "dedup_checks": dedup_checks,
        "iterations": len(stats),
        "wall_sec": round(wall, 2),
        "urls_per_sec": round(urls / wall, 1),
        "checks_per_sec": round((urls + dedup_checks) / wall, 1),
    }


# Canary anchor for cross-round comparability (BENCH/BASELINE.md §0): the
# host's absolute speed drifts ~2x across hours, so every headline number is
# also reported normalized to this FIXED reference canary —
#   time-like metrics:       norm = value * (canary_now / CANARY_REF)
#   throughput-like metrics: norm = value * (CANARY_REF / canary_now)
# CANARY_REF is an arbitrary round-invariant anchor (close to this VM's
# fast-phase md5 rate); only ratios of normalized numbers across rounds are
# meaningful, never the anchor itself.  Single-thread canary ≠ a perfect
# model of 32-thread Spark throughput, so treat normalized deltas within
# ~15% as host noise.
CANARY_REF = 1000.0


def host_canary() -> float:
    """Single-thread md5 throughput (MB/s) over a fixed buffer — a host-speed
    canary, not an engine metric: this VM's absolute throughput swings ~2x
    across hours (the unchanged pure-python dedup microbench measured 485k
    keys/s when BENCH_r02 was recorded and ~112k the next day; this canary
    read ~630 MB/s during the slow phase).  Engine changes cannot move this
    number, so cross-round timing comparisons should be read against it."""
    import hashlib

    buf = b"x" * 65536
    t0 = time.time()
    k = 0
    while time.time() - t0 < 0.5:
        hashlib.md5(buf).digest()
        k += 1
    return round(k * 65536 / (time.time() - t0) / 1e6, 1)


def dedup_bench(n_keys=200_000):
    """In-process vectorized Bloom throughput vs the reference's ~20k/s."""
    from feapder_spark.operators.dedup import ScalableMemoryBloom

    bloom = ScalableMemoryBloom(initial_capacity=1_000_000)
    keys = [f"key-{i}" for i in range(n_keys)]
    t0 = time.time()
    bloom.add(keys)
    return round(n_keys / (time.time() - t0), 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    # run twice, report the warm pass: the first run measures the CPU
    # governor ramping up (observed 45k->317k keys/s across back-to-back
    # identical runs), not the code
    host_canary()
    canary = host_canary()
    dedup_bench()  # before the Spark JVM exists (CPU-clean)
    dedup_rate = dedup_bench()

    from feapder_spark import queries as Q
    from feapder_spark.session import get_spark

    from pyspark.sql import functions as F

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=max(8, cpus))
    spark.range(1_000_000).groupBy(F.col("id") % 7).count().collect()  # JVM warm-up

    # per-query best-of-N (default 2): a 32-worker run has no idle cores to
    # absorb neighbor load, so single query runs swing 2-4x on this shared
    # VM (BENCH/BASELINE.md §5 — one full-suite pass read 100.9 s where the
    # re-run minutes later read 34.6 s at the same single-thread canary);
    # the min of two passes measures the engine, not the neighbor.
    suite_reps = int(os.environ.get("SPARK_GRAFT_SUITE_REPS", "2"))
    timings: dict[str, float] = {}
    for _ in range(max(1, suite_reps)):
        for name in HEADLINE:
            fn = Q.QUERIES[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    if os.environ.get("SPARK_GRAFT_SUITE_ONLY"):
        # sf-scaling re-anchor mode (BASELINE §3): only the query suite
        # depends on sf_dir — the crawl/dedup sections run on synthetic
        # inputs of their own and would just add noise to an sf1-vs-sf0.1
        # comparison, so skip them and emit suite timings alone.
        print(json.dumps({
            "metric": "headline query suite wall time at sf",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "suite_reps": suite_reps,
            "sf": sf,
            "cpus": cpus,
            "host_canary_md5_mbps": canary,
        }))
        return

    # warm the crawl path once (python workers, Arrow codecs, commit pools)
    # so the exact-vs-bloom pair compares engines, not who ran first
    crawl_bench(spark, n_hosts=20, pages_per_host=10, batch_size=200, max_iterations=1)
    # interleaved best-of-N pairs (VERDICT r4 #3): single crawl runs swing
    # 30-60% on this disk-bound host, so the bloom-vs-exact bar is recorded
    # IN the bench JSON as the best of N interleaved pairs (interleaving
    # cancels host drift), not a one-shot snapshot
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    exact_runs, bloom_runs = [], []
    for _ in range(reps):
        exact_runs.append(crawl_bench(spark))
        bloom_runs.append(crawl_bench(spark, seen="bloom"))
    crawl = max(exact_runs, key=lambda r: r["urls_per_sec"])
    crawl_bloom = max(bloom_runs, key=lambda r: r["urls_per_sec"])
    pair_ratios = [
        round(b["urls_per_sec"] / e["urls_per_sec"], 3)
        for e, b in zip(exact_runs, bloom_runs)
    ]
    # production-shaped pair: ONE big-batch iteration (a 10^10-frontier
    # deployment leases 1e5-1e6 rows per iteration, so per-iteration fixed
    # costs — where the Bloom path pays an extra Arrow stage — amortize out;
    # at this shape the scale path runs at parity with the exact path)
    big_exact_runs, big_bloom_runs = [], []
    for _ in range(reps):
        big_exact_runs.append(crawl_bench(spark, batch_size=24000, max_iterations=1))
        big_bloom_runs.append(
            crawl_bench(spark, batch_size=24000, max_iterations=1, seen="bloom")
        )
    crawl_big = max(big_exact_runs, key=lambda r: r["urls_per_sec"])
    crawl_bloom_big = max(big_bloom_runs, key=lambda r: r["urls_per_sec"])
    big_pair_ratios = [
        round(b["urls_per_sec"] / e["urls_per_sec"], 3)
        for e, b in zip(big_exact_runs, big_bloom_runs)
    ]

    # canary-normalized headline numbers (see CANARY_REF note): the column a
    # cross-round comparison should read
    t_norm = canary / CANARY_REF  # multiply time-like values
    r_norm = CANARY_REF / canary  # multiply throughput-like values
    normalized = {
        "suite_sec": round(sum(timings.values()) * t_norm, 3),
        "crawl_urls_per_sec": round(crawl["urls_per_sec"] * r_norm, 1),
        "crawl_bloom_urls_per_sec": round(crawl_bloom["urls_per_sec"] * r_norm, 1),
        "crawl_bigbatch_urls_per_sec": round(crawl_big["urls_per_sec"] * r_norm, 1),
        "crawl_bloom_bigbatch_urls_per_sec": round(
            crawl_bloom_big["urls_per_sec"] * r_norm, 1
        ),
        "dedup_keys_per_sec": round(dedup_rate * r_norm, 1),
    }

    out = {
        "metric": "headline query suite wall time at sf (plus crawl URLs/sec + dedup keys/sec)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "suite_reps": suite_reps,
        "sf": sf,
        "cpus": cpus,
        "crawl": crawl,
        "crawl_bloom": crawl_bloom,
        "crawl_bigbatch": crawl_big,
        "crawl_bloom_bigbatch": crawl_bloom_big,
        "crawl_pair_reps": reps,
        "crawl_pair_ratios": pair_ratios,
        "crawl_bigbatch_pair_ratios": big_pair_ratios,
        # the bloom-vs-exact bar is judged on INTERLEAVED pairs (each pair
        # shares a host phase); ratios of independent bests would compare
        # runs from different phases on a host that swings 30-60%
        "bloom_over_exact_best": max(pair_ratios),
        "bloom_over_exact_median": sorted(pair_ratios)[len(pair_ratios) // 2],
        "bloom_over_exact_bigbatch_best": max(big_pair_ratios),
        "bloom_over_exact_bigbatch_median": sorted(big_pair_ratios)[
            len(big_pair_ratios) // 2
        ],
        "dedup_keys_per_sec": dedup_rate,
        "host_canary_md5_mbps": canary,
        "canary_ref": CANARY_REF,
        "normalized": normalized,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
