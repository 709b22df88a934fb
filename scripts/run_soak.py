"""Long-run compaction soak (VERDICT r4 #8): 560 TTL-mode crawl iterations
with every compaction knob AT ITS DEFAULT (compact_min_segments=512),
recording per-iteration wall time and frontier segment/file counts.

What it proves: per-band file counts grow one segment per iteration until
the default segment-count trigger fires (at 512 adds segments), compaction
folds the delta log back to one segment per band, and the post-compaction
lease wall returns to the first-decile level — i.e. the default cadence
BOUNDS the drift instead of letting it run away.  TTL mode
(seen_ttl_iterations) keeps the frontier perpetually re-claimable, which is
exactly the reference's ExpireFilter incremental-crawl loop — the
configuration where a crawl genuinely runs for 10^3+ iterations.

Usage:  python scripts/run_soak.py [iters] [warehouse]
Prints one JSON line; exits non-zero if the trigger never fired (when
iters > 512) or wall-time drift is unbounded.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 560
    wh = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak_wh"
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("feapder_spark_soak")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
    from feapder_spark.crawl.synthweb import SyntheticWeb

    web = SyntheticWeb(n_hosts=2, pages_per_host=8, seed=42, flaky_every=10**9)
    cfg = CrawlConfig(batch_size=6, seen_ttl_iterations=3)  # all knobs default
    assert cfg.compact_min_segments == 512, "soak must run the DEFAULT cadence"
    engine = CrawlEngine(spark, wh, web, cfg)
    engine.seed(web.seeds(4))

    walls, seg_traj, compactions = [], [], 0
    prev_segs = 0
    for i in range(iters):
        t0 = time.time()
        st = engine._iterate()
        walls.append(time.time() - t0)
        if st is None:
            break
        segs = len(engine.t("frontier").manifest().segments or [])
        if segs < prev_segs:
            compactions += 1
        prev_segs = segs
        seg_traj.append(segs)

    n = len(walls)
    dec = max(1, n // 10)
    first_decile = sum(walls[:dec]) / dec
    last_decile = sum(walls[-dec:]) / dec
    # wall right after each compaction vs right before it (drift reset)
    report = {
        "iterations": n,
        "compactions_fired": compactions,
        "max_adds_segments": max(seg_traj),
        "final_adds_segments": seg_traj[-1],
        "first_decile_wall_sec": round(first_decile, 3),
        "last_decile_wall_sec": round(last_decile, 3),
        "decile_ratio": round(last_decile / first_decile, 3),
        "max_wall_sec": round(max(walls), 3),
        "frontier_leaf_files": engine.t("frontier").leaf_partition_count(),
    }
    print(json.dumps(report))
    ok = True
    if n > 513 and compactions == 0:
        ok = False  # the default trigger must have fired
    if report["decile_ratio"] > 2.0:
        ok = False  # lease/iteration wall must stay flat across the soak
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
