"""Scale smoke: frontier operators on a 2M-row frontier.

The sandbox can't host 10^10 rows, but the *plan shape* must already hold:
take-batch stays a per-partition top-k (sub-linear driver traffic), the
politeness rank gate stays a hash-partitioned window, and the seen anti-join
shuffles only the candidate side.  This test materializes a 2M-row synthetic
frontier and asserts the lease is correct and fast."""

import time

from pyspark.sql import functions as F

from feapder_spark.crawl import frontier as FR


def test_take_batch_on_2m_row_frontier(spark, tmp_path):
    n = 2_000_000
    frontier = (
        spark.range(n)
        .select(
            F.md5(F.col("id").cast("string")).alias("fingerprint"),
            F.concat(F.lit("http://host-"), (F.col("id") % 1000).cast("string"), F.lit(".test/p")).alias("url"),
            (F.col("id") % 997).cast("int").alias("priority"),
            F.concat(F.lit("host-"), (F.col("id") % 1000).cast("string"), F.lit(".test")).alias("host"),
            F.lit("todo").alias("status"),
        )
    )
    path = str(tmp_path / "frontier2m")
    frontier.write.parquet(path)
    due = spark.read.parquet(path).filter(F.col("status") == "todo")

    t0 = time.time()
    batch = FR.take_batch(due, 1000).collect()
    wall = time.time() - t0
    assert len(batch) == 1000
    # correctness: exactly the priority-0/1 rows in fingerprint order prefix
    assert all(r.priority <= 1 for r in batch)
    prios = [r.priority for r in batch]
    assert prios == sorted(prios)
    # the 2M-row lease must complete in seconds (TakeOrderedAndProject),
    # generous bound for CI noise
    assert wall < 20, f"lease over 2M rows took {wall:.1f}s"


def test_politeness_gate_on_2m_rows(spark, tmp_path):
    n = 2_000_000
    due = spark.range(n).select(
        F.md5(F.col("id").cast("string")).alias("fingerprint"),
        (F.col("id") % 3).cast("int").alias("priority"),
        F.concat(F.lit("h"), (F.col("id") % 50).cast("string")).alias("host"),
    )
    budgets = spark.createDataFrame([(f"h{i}", 10) for i in range(50)], "host STRING, budget INT")
    t0 = time.time()
    out = FR.eligible_under_politeness(due, budgets).groupBy("host").count().collect()
    wall = time.time() - t0
    assert len(out) == 50 and all(r["count"] == 10 for r in out)
    assert wall < 40, f"politeness gate over 2M rows took {wall:.1f}s"
