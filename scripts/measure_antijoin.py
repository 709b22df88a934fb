"""Measure the visible-set anti-join on a tombstone-heavy frontier
(VERDICT r4 #5, the fingerprint co-partitioning seam).

Fixture: 2M frontier adds, 1M tombstones (a delta log HALF tombstones — the
worst shape between compactions).  Three measurements, each with shuffle
bytes pulled from the Spark REST status API:

  1. broadcast path (tombstone_rows ≤ cfg.tombs_broadcast_max_rows): the
     tombstone side broadcasts, the adds side needs no Exchange;
  2. shuffle path (bound forced to 0): the plain anti-join both sides
     shuffle — what every visibility read cost before round 5;
  3. one full crawl iteration (batch 50k) for the wall-time denominator.

Prints one JSON line for BASELINE §4.

Usage: python scripts/measure_antijoin.py [warehouse]
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

UI_PORT = 4057


def rest_totals() -> dict:
    base = f"http://localhost:{UI_PORT}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/applications/{app_id}/stages?status=complete"))
    return {
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
    }


def main() -> int:
    wh = sys.argv[1] if len(sys.argv) > 1 else "/tmp/aj_wh"
    n_tombs_arg = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "6g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("antijoin_measure")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
    from feapder_spark.crawl.synthweb import SyntheticWeb

    web = SyntheticWeb(n_hosts=4, pages_per_host=10, seed=42)
    engine = CrawlEngine(
        spark, wh, web, CrawlConfig(batch_size=50_000, max_retries=0)
    )
    engine._init_tables()
    n_adds, n_tombs = 2_000_000, n_tombs_arg
    adds = spark.range(n_adds).select(
        F.md5(F.col("id").cast("string")).alias("fingerprint"),
        F.concat(F.lit("http://h"), F.col("id") % 50, F.lit(".test/p"), F.col("id")).alias("url"),
        F.concat(F.lit("http://h"), F.col("id") % 50, F.lit(".test/p"), F.col("id")).alias("url_canon"),
        F.concat(F.lit("h"), F.col("id") % 50, F.lit(".test")).alias("host"),
        F.lit(300).cast("int").alias("priority"),
        F.lit(0).cast("int").alias("retry_times"),
        F.lit("TestParser").alias("parser_name"),
        F.lit("todo").alias("status"),
        F.lit(0).cast("int").alias("added_iteration"),
        F.lit(None).cast("string").alias("method"),
        F.lit(None).cast("map<string,string>").alias("payload"),
        F.lit(None).cast("string").alias("callback"),
        F.lit(True).alias("auto_request"),
    )
    engine._commit_frontier_adds(adds, n_adds)
    tombs = spark.range(n_tombs).select(
        F.md5(F.col("id").cast("string")).alias("fingerprint"),
        F.lit(0).cast("int").alias("retry_times"),
        F.lit(0).cast("int").alias("added_iteration"),
        F.lit(300).cast("int").alias("priority"),
    )
    engine._commit_frontier_tombs(tombs, n_tombs)
    engine.frontier_size = n_adds - n_tombs
    engine.tombstone_rows = n_tombs

    out = {"adds": n_adds, "tombs": n_tombs}
    for label, bound in (("broadcast", 2_000_000), ("shuffle", 0)):
        engine.cfg.tombs_broadcast_max_rows = bound
        # warm read (parquet footers, code paths), then measured read
        engine._read_frontier_due().count()
        before = rest_totals()
        t0 = time.time()
        n_visible = engine._read_frontier_due().count()
        wall = time.time() - t0
        after = rest_totals()
        out[label] = {
            "visible_rows": n_visible,
            "wall_sec": round(wall, 2),
            "shuffle_bytes": after["shuffle_write"] - before["shuffle_write"],
            "input_bytes": after["input_bytes"] - before["input_bytes"],
        }
    assert out["broadcast"]["visible_rows"] == out["shuffle"]["visible_rows"] == n_adds - n_tombs

    # denominator: one real iteration (lease 50k + fetch/parse + commits)
    engine.cfg.tombs_broadcast_max_rows = 1_000_000
    t0 = time.time()
    st = engine._iterate()
    out["iteration_wall_sec"] = round(time.time() - t0, 2)
    out["iteration_leased"] = st.leased if st else 0
    out["visible_read_pct_of_iteration"] = round(
        100.0 * out["broadcast"]["wall_sec"] / out["iteration_wall_sec"], 1
    )
    out["shuffle_bytes_drop_pct"] = round(
        100.0 * (1 - out["broadcast"]["shuffle_bytes"] / max(1, out["shuffle"]["shuffle_bytes"])), 1
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
