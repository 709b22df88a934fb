"""robots.txt cache + enforcement (north-star graft addition).

The reference has no robots support (its only throttle is the global sleep,
parser_control.py:412-422); the north rule requires a per-host politeness
scheduler **with robots.txt caching**.  Shape:

- ``robots`` table: ``host, crawl_delay DOUBLE, disallow ARRAY<STRING>,
  fetched_iteration INT`` — the cache.  Hosts are fetched once (an Arrow
  mapInPandas stage over the not-yet-cached hosts) and the parsed policy is
  snapshot-committed; a TTL re-fetch is a predicate on fetched_iteration.
- enforcement is JVM-side: candidates join the (broadcast) robots table on
  host and are dropped when any disallow prefix matches the URL path
  (``F.exists`` over the array — no Python).
- crawl-delay → per-iteration budget: ``max(1, window / crawl_delay)`` rows
  per host per iteration, feeding the same rank-gate as static budgets
  (frontier.eligible_under_politeness).

The synthetic web serves deterministic robots.txt bodies so tests exercise
a real fetch→parse→cache→enforce loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROBOTS_DDL = "host STRING, crawl_delay DOUBLE, disallow ARRAY<STRING>, fetched_iteration INT"


def parse_robots_txt(text: str) -> tuple[float, list[str]]:
    """Minimal robots parser: the ``User-agent: *`` group's Disallow
    prefixes and Crawl-delay (public de-facto format)."""
    delay = 0.0
    disallow: list[str] = []
    active = False
    for raw in (text or "").splitlines():
        line = raw.split("#")[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key, value = key.strip().lower(), value.strip()
        if key == "user-agent":
            active = value == "*"
        elif active and key == "disallow" and value:
            disallow.append(value)
        elif active and key == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                pass
    return delay, disallow


def fetch_robots(spark: SparkSession, hosts: DataFrame, resolver, iteration: int) -> DataFrame:
    """Fetch+parse robots.txt for the given hosts (Arrow batch stage).
    ``resolver`` must expose ``robots_txt(host) -> str | None``."""

    def rob_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            rows = []
            for host in pdf["host"]:
                delay, disallow = parse_robots_txt(resolver.robots_txt(host))
                rows.append((host, float(delay), disallow, iteration))
            yield pd.DataFrame(rows, columns=["host", "crawl_delay", "disallow", "fetched_iteration"])

    return hosts.select("host").distinct().mapInPandas(rob_map, schema=ROBOTS_DDL)


def filter_allowed(cands: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop candidates whose URL path hits a disallow prefix of their host.
    Pure JVM: broadcast join + EXISTS over the prefix array."""
    path = F.coalesce(F.parse_url("url_canon", F.lit("PATH")), F.lit("/"))
    r = robots.select("host", "disallow")
    joined = cands.join(F.broadcast(r), on="host", how="left")
    blocked = F.when(
        F.col("disallow").isNotNull(),
        F.exists("disallow", lambda p: path.startswith(p)),
    ).otherwise(F.lit(False))
    return joined.filter(~blocked).drop("disallow")


def budgets_from_robots(robots: DataFrame, window_seconds: float = 10.0) -> DataFrame:
    """crawl_delay → per-iteration budget: one iteration ≈ window_seconds of
    wall time, so a host allows floor(window / delay) fetches (min 1)."""
    return robots.select(
        "host",
        F.when(
            F.col("crawl_delay") > 0,
            F.greatest(F.lit(1), F.floor(F.lit(window_seconds) / F.col("crawl_delay"))).cast("int"),
        )
        .otherwise(F.lit(1_000_000_000))
        .alias("budget"),
    )
