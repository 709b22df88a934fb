"""Extra measurement harness for optimization rounds (guide §1).

NOT the driver bench (bench.py is frozen).  This script:
  - times individual declared queries with the noop sink (best-of-N),
  - optionally dumps .explain("formatted") per query to a directory.

Usage:
  python bench_extra.py [--sf /root/testdata/sf1.0] [--reps 2]
                        [--plans plans/r06/suffix] [query ...]

Prints one JSON line {"queries": {name: best_sec}, "sf_dir": ..., "reps": N}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="dir/suffix: write <dir>/<query>_<suffix>.txt explain dumps")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from feapder_spark import queries as Q
    from feapder_spark.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(8, args.cpus))
    spark.range(1_000_000).groupBy(F.col("id") % 7).count().collect()  # JVM warm-up

    names = args.queries or list(Q.QUERIES)
    plans_dir = suffix = None
    if args.plans:
        plans_dir, _, suffix = args.plans.rpartition("/")
        if "_" in suffix or suffix in ("before", "after"):
            plans_dir = os.path.dirname(args.plans) or "."
            suffix = os.path.basename(args.plans)
        os.makedirs(plans_dir, exist_ok=True)

    timings: dict[str, float] = {}
    for _ in range(max(0, args.reps)):
        for name in names:
            fn = Q.QUERIES[name]
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            spark.sparkContext.setJobDescription(None)
    if plans_dir is not None:
        for name in names:
            df = Q.QUERIES[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)

    print(json.dumps({"queries": timings, "sf_dir": args.sf, "reps": args.reps,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
