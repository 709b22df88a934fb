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


def test_iteration_commit_is_delta_not_rewrite(spark, tmp_path):
    """The round-1 scale-killer regression guard: one iteration over a 2M-row
    frontier must commit O(batch) rows (new-link/retry appends + tombstones),
    never rewrite the 2M-row adds segment."""
    import os

    from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
    from feapder_spark.crawl.synthweb import SyntheticWeb

    n = 2_000_000
    web = SyntheticWeb(n_hosts=1000, pages_per_host=2000, seed=42, n_links=2)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, CrawlConfig(batch_size=1000))
    engine._init_tables()
    adds = (
        spark.range(n)
        .select(
            F.concat(
                F.lit("http://host-"), (F.col("id") % 1000).cast("string"),
                F.lit(".test/page-"), (F.col("id") / 1000).cast("int").cast("string"),
            ).alias("url")
        )
        .withColumn("url_canon", F.col("url"))
        .withColumn("fingerprint", F.md5("url_canon"))
        .withColumn(
            "host", F.lower(F.coalesce(F.parse_url("url_canon", F.lit("HOST")), F.lit("")))
        )
        .withColumn("priority", F.lit(300))
        .withColumn("retry_times", F.lit(0))
        .withColumn("parser_name", F.lit("TestParser"))
        .withColumn("status", F.lit("todo"))
        .withColumn("added_iteration", F.lit(0))
        .withColumn("method", F.lit(None).cast("string"))
        .withColumn("payload", F.lit(None).cast("map<string,string>"))
        .withColumn("callback", F.lit(None).cast("string"))
        .withColumn("auto_request", F.lit(True))
    )
    engine.t("frontier").commit(adds, mode="append")
    engine.frontier_size = n
    engine.iteration = 1
    base_segments = list(engine.t("frontier").manifest().segments)

    stats = engine.run(max_iterations=1)
    st = stats[0]
    assert st.leased == 1000

    man = engine.t("frontier").manifest()
    # the base 2M-row segment is untouched; exactly one small delta appended
    assert man.segments[: len(base_segments)] == base_segments
    new_segs = man.segments[len(base_segments):]
    assert len(new_segs) == 1
    root = engine.t("frontier").root
    delta_rows = spark.read.parquet(os.path.join(root, "data", new_segs[0])).count()
    assert delta_rows == st.links_new + st.retried
    assert delta_rows < 20 * 1000  # O(batch), not O(frontier)
    assert engine.t("frontier_tombs").read().count() == 1000
    # visible set shrank/grew by exactly the delta
    assert engine.frontier_size == n - 1000 + st.links_new + st.retried
