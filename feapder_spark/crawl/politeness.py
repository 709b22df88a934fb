"""Per-host token-bucket rate limiting with cross-iteration state.

The north rule asks for "a per-host politeness scheduler with robots.txt
caching and token-bucket rate limits".  The flat per-iteration budget
(frontier.eligible_under_politeness) is the stateless gate; this module adds
the *bucket*: hosts accrue ``rate`` tokens per iteration up to ``burst``,
each leased fetch spends one token, unused tokens carry over.  State lives
in a snapshot table (``host, tokens DOUBLE, updated_iteration INT``) —
state-as-table like every other engine state, so it checkpoints and resumes
with the crawl.

All arithmetic is JVM column math; the per-iteration update is one small
join + overwrite commit of a host-cardinality table (tiny next to the
frontier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKETS_DDL = "host STRING, tokens DOUBLE, updated_iteration INT"


class TokenBuckets:
    """Driver-side facade over the bucket state table."""

    def __init__(self, rate: float, burst: float, default_rate_hosts: dict[str, float] | None = None):
        self.rate = rate
        self.burst = burst
        self.per_host_rate = default_rate_hosts or {}

    def _rate_col(self, spark: SparkSession):
        if not self.per_host_rate:
            return F.lit(self.rate)
        mapping = F.create_map(
            *[x for h, r in self.per_host_rate.items() for x in (F.lit(h), F.lit(float(r)))]
        )
        return F.coalesce(mapping[F.col("host")], F.lit(self.rate))

    def accrue(self, spark: SparkSession, state: DataFrame, hosts: DataFrame, iteration: int) -> DataFrame:
        """New state after accrual: known hosts gain rate × elapsed
        iterations (capped at burst); unseen hosts start at burst."""
        joined = hosts.select("host").distinct().join(state, on="host", how="left")
        elapsed = F.greatest(F.lit(0), F.lit(iteration) - F.coalesce(F.col("updated_iteration"), F.lit(iteration)))
        tokens = F.least(
            F.lit(self.burst),
            F.coalesce(F.col("tokens"), F.lit(self.burst)) + elapsed * self._rate_col(spark),
        )
        return joined.select(
            "host", tokens.alias("tokens"), F.lit(iteration).alias("updated_iteration")
        )

    def prune(self, state: DataFrame, iteration: int) -> DataFrame:
        """Drop rows indistinguishable from an absent host.

        ``accrue`` starts an absent host at ``burst``, and a persisted row's
        as-of value is ``min(burst, tokens + elapsed·rate)`` — so once that
        value reaches burst the row IS the absent-host default forever (the
        min caps it there) and can be deleted.  This bounds the persisted
        state table to hosts still refilling (recently leased, or zero-rate
        hosts, which never refill and must stay) instead of growing with
        every host ever crawled — at web scale the difference between an
        O(active-hosts) and an O(total-hosts) overwrite per iteration.
        Behavior-invisible by construction: budgets/lease schedules are
        unchanged (test_token_bucket_equivalence pins this)."""
        elapsed = F.greatest(
            F.lit(0), F.lit(iteration) - F.col("updated_iteration")
        )
        as_of = F.col("tokens") + elapsed * self._rate_col(state.sparkSession)
        return state.filter(as_of < F.lit(self.burst))

    @staticmethod
    def budgets(state: DataFrame) -> DataFrame:
        """Per-iteration budget = whole tokens available now."""
        return state.select("host", F.floor("tokens").cast("int").alias("budget"))

    @staticmethod
    def spend(state: DataFrame, leased_per_host: DataFrame) -> DataFrame:
        """Subtract one token per leased fetch (floors at 0)."""
        joined = state.join(leased_per_host, on="host", how="left")
        return joined.select(
            "host",
            F.greatest(F.lit(0.0), F.col("tokens") - F.coalesce(F.col("n_leased"), F.lit(0)).cast("double")).alias("tokens"),
            "updated_iteration",
        )
