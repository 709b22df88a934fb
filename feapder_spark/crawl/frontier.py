"""Frontier operators: take-batch (lease), politeness gating, retry routing.

The reference frontier is a Redis zset with score=priority and a Lua
lease-take of the lowest-score members (collector.py:56-80 →
redisdb.py:472-523).  Here the frontier is a table and take-batch is the
pinned ordering contract (semantics.py ORDER_COLS):

    ORDER BY priority ASC, fingerprint ASC LIMIT k

which Catalyst executes as ``TakeOrderedAndProject`` — a per-partition
top-k + driver merge of k·P candidate rows, **not** a global sort: exactly
the plan that survives a 10^10-row frontier (each partition contributes at
most k rows to the driver).

Politeness (graft addition, north rule; reference's only throttle is the
global sleep at parser_control.py:412-422) is a per-host rank gate *before*
the global top-k: ``row_number() OVER (PARTITION BY host ORDER BY priority,
fingerprint) <= budget(host)``.  Budgets are a tiny dimension table —
broadcast joined.  Hot hosts (Zipf head) are thereby bounded per iteration,
which is also the skew bound for the host-partitioned fetch stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from feapder_spark.crawl import semantics as S

# added_iteration makes each (fingerprint, retry_times, added_iteration) row
# version unique — the key the tombstone delta log anti-joins on (a retry
# re-adds the same fingerprint with retry_times+1; a revived failed request
# re-adds retry_times=0 at a later iteration)
# method/payload carry TaskSpider-style per-task request params through the
# frontier (network/request.py:45-81); the fingerprint covers the body args
# (request.py:465-480 via urlnorm.request_fingerprint)
# callback is the reference's per-request callback *name* serialized with the
# request (request.py:248-252) and dispatched getattr-style at parse time
# (parser_control.py:562-570) — the list-page→detail-page pattern
# auto_request=false skips the download: the callback receives response=None
# (request.py:68-70; parser_control.py:96,162-163); NULL means true
FRONTIER_DDL = (
    "fingerprint STRING, url STRING, url_canon STRING, host STRING, "
    "priority INT, retry_times INT, parser_name STRING, status STRING, "
    "added_iteration INT, method STRING, payload MAP<STRING, STRING>, "
    "callback STRING, auto_request BOOLEAN"
)


def budgets_df(spark: SparkSession, budgets: dict[str, int]) -> DataFrame:
    rows = [(h, int(b)) for h, b in budgets.items() if h != "__default__"]
    return spark.createDataFrame(rows, "host STRING, budget INT")


def merge_budgets(base: DataFrame | None, base_default: int, extra: DataFrame) -> DataFrame:
    """Combine two per-host budget sources into one: effective budget =
    min over sources, where a host absent from a source falls back to that
    source's default (``base_default`` for the static politeness dimension,
    unlimited for the dynamic one).

    A plain union+min would let a dynamic row (token bucket / robots
    crawl-delay) *bypass* the static ``__default__`` cap: every due host gets
    an explicit dynamic row, so the downstream coalesce-to-default never
    fires.  The full-outer join keeps the default in the min for hosts the
    static dimension doesn't name (the oracle computes
    ``min(static.get(h, default), dynamic.get(h, inf))``, oracle.py:100-106).
    """
    if base is None:
        return extra
    b = base.withColumnRenamed("budget", "_base_budget")
    e = extra.withColumnRenamed("budget", "_extra_budget")
    return b.join(e, on="host", how="full_outer").select(
        "host",
        F.least(
            F.coalesce(F.col("_base_budget"), F.lit(int(base_default))),
            F.coalesce(F.col("_extra_budget"), F.lit(2_000_000_000)),
        )
        .cast("int")
        .alias("budget"),
    )


def eligible_under_politeness(
    due: DataFrame,
    budgets: DataFrame | None,
    default_budget: int = 1_000_000_000,
    max_budget: int | None = None,
    broadcast_budgets: bool = True,
) -> DataFrame:
    """Keep at most budget(host) due rows per host, chosen in the lease order.

    ``max_budget`` — a driver-known upper bound on EVERY host's effective
    budget (e.g. floor(burst) with token buckets on) — is applied as a
    LITERAL rank filter directly on the window.  The per-host budget filter
    compares against a joined column, which Catalyst's InferWindowGroupLimit
    cannot use; the literal cap lets it insert WindowGroupLimit in Partial
    mode BEFORE the host-hash shuffle, so a Zipf-hot host contributes at
    most ``max_budget`` rows per input partition to the window task instead
    of its entire due set — the skew bound for the politeness-gated lease
    at web scale.  Rows it drops have rank > max_budget >= budget(host) and
    were never eligible, so results are unchanged (plan test pins both the
    node and the equality).

    ``broadcast_budgets=False`` drops the broadcast hint: with
    ``respect_robots`` on, the budgets frame is HOST-cardinality (one row
    per host ever robots-fetched) — force-broadcasting it at web scale
    would OOM the executors, so the engine disables the hint once its
    driver-tracked row bound exceeds cfg.budgets_broadcast_max_rows and
    lets Spark plan a shuffle join (whose probe side is already pruned to
    ≤ max_budget rows per host by the WindowGroupLimit cap).
    """
    if budgets is None:
        return due
    w = Window.partitionBy("host").orderBy(*[F.col(c) for c in S.ORDER_COLS])
    ranked = due.withColumn("_host_rank", F.row_number().over(w))
    if max_budget is not None:
        ranked = ranked.filter(F.col("_host_rank") <= F.lit(int(max_budget)))
    bside = F.broadcast(budgets) if broadcast_budgets else budgets
    return (
        ranked.join(bside, on="host", how="left")
        .filter(F.col("_host_rank") <= F.coalesce(F.col("budget"), F.lit(default_budget)))
        .drop("_host_rank", "budget")
    )


def take_batch(
    due: DataFrame,
    k: int,
    budgets: DataFrame | None = None,
    default_budget: int = 1_000_000_000,
    max_budget: int | None = None,
    broadcast_budgets: bool = True,
) -> DataFrame:
    """Lease the next batch: politeness gate → global top-k by (priority, fp).

    Compiles to window + TakeOrderedAndProject; no global sort, no collect.
    """
    eligible = eligible_under_politeness(
        due, budgets, default_budget, max_budget, broadcast_budgets
    )
    return eligible.orderBy(*[F.col(c) for c in S.ORDER_COLS]).limit(k)


# above this row count the lease-seq derivation switches from the one-task
# concat to the range-partitioned path (also the target rows/partition there)
LEASE_SEQ_NARROW_MAX = 100_000


def with_lease_seq(batch: DataFrame, seq_start: int, n_rows: int | None = None) -> DataFrame:
    """Assign the global lease sequence (contiguous ``seq_start..+n-1`` in
    (priority, fingerprint) order) without a single-partition WindowExec.

    Small batches (``n_rows`` unknown or ≤ LEASE_SEQ_NARROW_MAX): sort and
    coalesce to one partition (coalesce concatenates range-sorted partitions
    in partition order, preserving the global sort), where
    ``monotonically_increasing_id`` yields the contiguous row index — one
    job, pure JVM.

    Mega-batches (the 10^6-10^7-row production lease): the one-task funnel
    would serialize k rows, so derive seq from per-range-partition counts +
    in-partition row index instead (the Iceberg/zipWithIndex-scale path):
    range-partition on the lease order, sort within partitions, freeze
    partition ids + local indices with an eager localCheckpoint, collect the
    ≤4096 per-partition counts (one tiny job), and add each partition's
    cumulative offset via a broadcast join — every stage O(n/P) per task,
    no global funnel.  RangePartitioner assigns ascending key ranges to
    ascending partition ids, so offsets in pid order ARE the global order.
    """
    cols = [F.col(c) for c in S.ORDER_COLS]
    if n_rows is None or n_rows <= LEASE_SEQ_NARROW_MAX:
        ordered = batch.orderBy(*cols).coalesce(1)
        return ordered.withColumn(
            "seq", F.monotonically_increasing_id() + F.lit(seq_start)
        )
    num_parts = min((n_rows + LEASE_SEQ_NARROW_MAX - 1) // LEASE_SEQ_NARROW_MAX, 4096)
    ranged = (
        batch.repartitionByRange(num_parts, *cols)
        .sortWithinPartitions(*cols)
        .select(
            "*",
            F.spark_partition_id().alias("_pid"),
            # upper 31 bits = partition id, lower 33 = in-partition index
            F.monotonically_increasing_id().alias("_mid"),
        )
        .localCheckpoint()  # freeze pid/index before the two consumer jobs
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], seq_start
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = batch.sparkSession.createDataFrame(offsets, "_pid INT, _off LONG")
    local_idx = F.col("_mid") - F.col("_pid").cast("long") * F.lit(1 << 33)
    return (
        ranged.join(F.broadcast(off_df), on="_pid")
        .withColumn("seq", F.col("_off") + local_idx)
        .drop("_pid", "_mid", "_off")
    )


def route_failures(failures: DataFrame, max_retries: int = S.MAX_RETRIES) -> DataFrame:
    """Retry/failed routing (parser_control.py:298-301, semantics.failure_route):
    adds ``route`` ('todo'=retry | 'failed') and increments retry_times.
    An abandoned request (validate returned False, CODE_ABANDONED) fails
    immediately with no retry (parser_control.py:158-160)."""
    abandoned = F.col("status_code") == S.CODE_ABANDONED
    return failures.withColumn(
        "route",
        F.when(abandoned | (F.col("retry_times") + 1 > max_retries), F.lit(S.STATUS_FAILED)).otherwise(
            F.lit(S.STATUS_TODO)
        ),
    ).withColumn("retry_times", F.col("retry_times") + 1)
