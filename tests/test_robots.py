"""robots.txt cache + enforcement (north-star politeness addition)."""

from pyspark.sql import functions as F

from feapder_spark.crawl import robots as RB
from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine
from feapder_spark.crawl.frontier import eligible_under_politeness
from feapder_spark.crawl.synthweb import SyntheticWeb


def test_parse_robots_txt():
    delay, disallow = RB.parse_robots_txt(
        "User-agent: *\nDisallow: /private\nCrawl-delay: 2.5\n\n"
        "User-agent: other\nDisallow: /\n# comment\n"
    )
    assert delay == 2.5
    assert disallow == ["/private"]
    assert RB.parse_robots_txt("") == (0.0, [])


def test_filter_allowed(spark):
    cands = spark.createDataFrame(
        [
            ("h1", "http://h1/page-1"),
            ("h1", "http://h1/page-10"),  # prefix match → blocked too
            ("h1", "http://h1/page-2"),
            ("h2", "http://h2/page-1"),  # no robots row → allowed
        ],
        "host STRING, url_canon STRING",
    )
    robots = spark.createDataFrame([("h1", 0.0, ["/page-1"], 0)], RB.ROBOTS_DDL)
    kept = {r.url_canon for r in RB.filter_allowed(cands, robots).collect()}
    assert kept == {"http://h1/page-2", "http://h2/page-1"}


def test_budgets_from_robots_feed_rank_gate(spark):
    robots = spark.createDataFrame(
        [("slow.test", 5.0, [], 0), ("fast.test", 0.0, [], 0)], RB.ROBOTS_DDL
    )
    budgets = RB.budgets_from_robots(robots, window_seconds=10.0)
    b = {r.host: r.budget for r in budgets.collect()}
    assert b["slow.test"] == 2 and b["fast.test"] >= 10**6
    due = spark.createDataFrame(
        [("slow.test", f"fp{i}", 300) for i in range(5)]
        + [("fast.test", f"gp{i}", 300) for i in range(5)],
        "host STRING, fingerprint STRING, priority INT",
    )
    out = eligible_under_politeness(due, budgets)
    counts = {r.host: r.n for r in out.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert counts == {"slow.test": 2, "fast.test": 5}


def test_engine_respects_robots(spark, tmp_path):
    web = SyntheticWeb(n_hosts=8, pages_per_host=4, seed=42)
    # find hosts whose synthetic robots disallow /page-1
    blocked_hosts = [
        f"host-{i}.test"
        for i in range(8)
        if "/page-1" in RB.parse_robots_txt(web.robots_txt(f"host-{i}.test"))[1]
    ]
    assert blocked_hosts, "fixture must include disallowing hosts"

    cfg = CrawlConfig(batch_size=32, respect_robots=True)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(web.seeds(8))
    engine.run()

    # robots cached once per discovered host
    robots = engine.t("robots").read()
    assert robots.count() == robots.select("host").distinct().count() > 0

    # no doc from a disallowed path was ever fetched
    docs = engine.t("docs").read().select("url").collect()
    for r in docs:
        host = r.url.split("/")[2]
        path = "/" + r.url.split("/", 3)[3]
        if host in blocked_hosts:
            assert not path.startswith("/page-1"), f"disallowed fetch: {r.url}"
    # and disallowed urls never entered the frontier/failed either
    for tbl in ("frontier", "failed"):
        for r in engine.t(tbl).read().select("url").collect():
            host = r.url.split("/")[2]
            if host in blocked_hosts and r.url.count("/") >= 3:
                assert not ("/" + r.url.split("/", 3)[3]).startswith("/page-1")


def test_links_dropped_metric_separates_robots_from_dups(spark, tmp_path):
    """links_dup must count actual duplicates; robots-disallowed candidates
    land in links_dropped (round-1 conflation fix)."""
    web = SyntheticWeb(n_hosts=8, pages_per_host=4, seed=42)
    cfg = CrawlConfig(batch_size=32, respect_robots=True)
    engine = CrawlEngine(spark, str(tmp_path / "wh"), web, cfg)
    engine.seed(web.seeds(8))
    stats = engine.run()
    assert sum(s.links_dropped for s in stats) > 0  # fixture has disallowed links
    assert all(s.links_dropped >= 0 and s.links_dup >= 0 for s in stats)
    m = engine.t("metrics").read().collect()
    assert sum(r.links_dropped for r in m) == sum(s.links_dropped for s in stats)
    # without robots, nothing is dropped
    engine2 = CrawlEngine(spark, str(tmp_path / "wh2"), web, CrawlConfig(batch_size=32))
    engine2.seed(web.seeds(8))
    stats2 = engine2.run()
    assert all(s.links_dropped == 0 for s in stats2)
