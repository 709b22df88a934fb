"""Measure the gated-lease rank-cap skew bound (WindowGroupLimit, round 5).

The politeness gate ranks due rows per host; without a literal cap the
host-hash shuffle ships a hot host's ENTIRE due set into one window task.
With the driver-known cap (engine._budget_cap) Catalyst inserts
WindowGroupLimit in Partial mode before the Exchange, so each input
partition ships at most cap rows per host.

Fixture: a Zipf-extreme frontier — ONE host holds `hot_rows` due rows
(default 4M), 999 cold hosts hold 1k each; budget 3/host (token-bucket
burst 3).  Measures wall + shuffle bytes (REST) for the eligible count at
cap=None vs cap=3, interleaved, best-of-2 each.

Prints one JSON line for BASELINE §5.

Usage: python scripts/measure_windowcap.py [hot_rows]
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

UI_PORT = 4058


def rest_shuffle() -> int:
    base = f"http://localhost:{UI_PORT}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/applications/{app_id}/stages?status=complete")
    )
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> int:
    hot_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "8g")
        .appName("windowcap_measure")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from feapder_spark.crawl import frontier as FR

    hot = spark.range(hot_rows).select(
        F.lit("hot.test").alias("host"),
        F.lit(0).alias("priority"),
        F.sha1(F.col("id").cast("string")).alias("fingerprint"),
    )
    cold = spark.range(999 * 1000).select(
        F.concat(F.lit("cold-"), (F.col("id") % 999).cast("string")).alias("host"),
        F.lit(0).alias("priority"),
        F.sha1(F.concat(F.lit("c"), F.col("id").cast("string"))).alias("fingerprint"),
    )
    due = hot.unionByName(cold).repartition(16).persist()
    n = due.count()  # materialize once so both variants read a warm cache
    budgets = spark.createDataFrame([("hot.test", 3)], "host STRING, budget INT")

    def run(cap):
        before = rest_shuffle()
        t0 = time.time()
        k = FR.eligible_under_politeness(due, budgets, default_budget=3, max_budget=cap).count()
        wall = time.time() - t0
        return k, round(wall, 2), rest_shuffle() - before

    out = {"due_rows": n, "hot_rows": hot_rows, "budget": 3, "reps": 2}
    walls = {"uncapped": [], "capped": []}
    bytes_ = {"uncapped": [], "capped": []}
    counts = set()
    for _ in range(2):  # interleaved best-of-2
        for name, cap in (("uncapped", None), ("capped", 3)):
            k, w, b = run(cap)
            counts.add(k)
            walls[name].append(w)
            bytes_[name].append(b)
    assert len(counts) == 1, counts  # identical eligible count either way
    out["eligible"] = counts.pop()
    for name in ("uncapped", "capped"):
        out[f"{name}_wall_best"] = min(walls[name])
        out[f"{name}_shuffle_bytes"] = min(bytes_[name])
    out["shuffle_reduction"] = round(
        1 - out["capped_shuffle_bytes"] / max(1, out["uncapped_shuffle_bytes"]), 4
    )
    out["speedup_best"] = round(out["uncapped_wall_best"] / out["capped_wall_best"], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
