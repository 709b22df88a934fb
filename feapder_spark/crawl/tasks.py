"""Task & batch lifecycle — the TaskSpider/BatchSpider state machine.

Reference semantics (citations into /root/reference):

- task table ``id, url(≙param), state, parser_name`` with states
  0=todo, 2=claimed, 1=done, -1=failed (task_spider.py:64-71;
  tests/batch-spider/table.sql:13-18)
- claim: SELECT WHERE state=0 [AND cond] [ORDER BY] LIMIT n, then
  UPDATE 0→2 for the claimed ids (task_spider.py:363-396, 10k chunks)
- lost tasks: rows stuck in state=2 when the frontier is empty
  (task_spider.py:398-418); bulk reset 2→0 (batch_spider.py:536-549)
- done/failed writeback via UpdateItem on the task table, transactional
  with item export (base_parser.py:150-191, item_buffer.py:251-284)
- batch_record lifecycle: per-batch row with total/done/fail counts and
  is_done; a new batch starts when now - batch_date ≥ interval, resetting
  task states except failed (batch_spider.py:288-314, 595-608, 610-846)
- progress rollup: SELECT state, count(*) GROUP BY state
  (batch_spider.py:419-437)

All state transitions are MERGE-emulating snapshot commits (operators/
merge.py); at scale these become Iceberg MERGE INTO with partition pruning.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feapder_spark.operators.merge import merge_update
from feapder_spark.store import SnapshotStore

TASKS_DDL = "id INT, url STRING, state INT, parser_name STRING"
BATCH_RECORD_DDL = (
    "id INT, batch_date TIMESTAMP, total_count LONG, done_count LONG, fail_count LONG, "
    "interval DOUBLE, interval_unit STRING, create_time TIMESTAMP, update_time TIMESTAMP, "
    "is_done INT"
)

TODO, CLAIMED, DONE, FAILED = 0, 2, 1, -1


def roll_done(progress: dict) -> bool:
    """Self-progress completion (ignoring the related-spider gate)."""
    return bool(progress) and progress.get("total", 0) > 0 and progress.get("done") == progress.get("total")


class TaskManager:
    """Task table in bucket-partitioned mode: rows live in ``id % n_buckets``
    partitions, and every state transition rewrites ONLY the partitions
    containing matched rows (SnapshotTable.commit_partitions = Iceberg
    dynamic partition overwrite) — a 10k-row claim against a 10^8-row table
    moves O(10k-rows'-buckets), not O(table).  The MERGE join itself
    (operators/merge.merge_update) broadcasts the ≤10k-row source, matching
    the reference's 10k claim chunks (task_spider.py:363-396).

    The READ side prunes too: each commit maintains per-bucket
    [todo, claimed, done, failed] counts in the manifest meta (Iceberg
    partition-stats parity), so ``claim_batch`` opens only buckets with
    todo>0, the lost-task scans only buckets with claimed>0, and ``rollup``
    is a driver-side dict sum with zero Spark jobs — near the end of a
    10^8-task batch the claim reads a handful of dirs, not every bucket, and
    the monitor tick reads none."""

    def __init__(self, spark: SparkSession, store: SnapshotStore, table: str = "tasks",
                 n_buckets: int = 16):
        self.spark = spark
        self.store = store
        self.n_buckets = n_buckets
        self.table = store.table(table)
        if not self.table.exists():
            self.table.create_empty(TASKS_DDL)
        # bucket placement is a pure function of (id, n_buckets); resuming a
        # store under a different modulus would prune reads by the wrong
        # bucket ids and silently skip rows — refuse loudly instead
        m = self.table.manifest()
        rec = (m.meta or {}).get("bucket_modulus") if m else None
        if rec is not None and int(rec) != n_buckets:
            raise ValueError(
                f"task table was committed with n_buckets={rec}; resuming with "
                f"{n_buckets} would mis-prune bucket reads — keep the original"
            )

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.col("id"), F.lit(self.n_buckets)).cast("int")
        )

    def read(self) -> DataFrame:
        return self.table.read().drop("bucket")

    def _read_buckets(self, keys) -> DataFrame:
        if not (self.table.manifest().partitions or {}):
            return self.read()
        return self.table.read_partitions(keys).drop("bucket")

    def _commit_buckets(self, df: DataFrame) -> None:
        wb = self._with_bucket(df).persist()
        # per-bucket state counts ride the commit (≤n_buckets tiny rows, over
        # the frame the write is about to materialize anyway); untouched
        # buckets carry their previous counts forward.  All four states are
        # counted so rollup() can be served driver-side (Iceberg
        # partition-stats parity) — see :meth:`rollup`.
        counts = {
            str(r.bucket): [int(r.todo), int(r.claimed), int(r.done), int(r.failed)]
            for r in wb.groupBy("bucket").agg(
                F.sum((F.col("state") == TODO).cast("long")).alias("todo"),
                F.sum((F.col("state") == CLAIMED).cast("long")).alias("claimed"),
                F.sum((F.col("state") == DONE).cast("long")).alias("done"),
                F.sum((F.col("state") == FAILED).cast("long")).alias("failed"),
            ).collect()
        }
        prev = self.table.manifest()
        merged = dict((prev.meta or {}).get("state_counts", {})) if prev else {}
        merged.update(counts)
        # one write task per touched bucket: colocated buckets emit one
        # healthy file each instead of input-partitions x buckets shards
        self.table.commit_partitions(
            wb, "bucket",
            meta={"state_counts": merged, "bucket_modulus": self.n_buckets},
            shuffle_to=max(1, len(counts)),
        )
        wb.unpersist()

    def _buckets_in_state(self, idx: int) -> list[int] | None:
        """Buckets whose manifest stats show rows in the given state slot
        (0=todo, 1=claimed, 2=done, 3=failed); None = no stats recorded
        (read everything).  Buckets present in the partition map but ABSENT
        from the stats (pre-existing data committed outside _commit_buckets)
        are always included: their state mix is unknown, and treating them as
        empty would strand legacy todo/claimed rows forever."""
        m = self.table.manifest()
        sc = (m.meta or {}).get("state_counts") if m else None
        if sc is None:
            return None
        keys = [int(b) for b, c in sc.items() if idx < len(c) and c[idx] > 0]
        keys += [int(b) for b in (m.partitions or {}) if b not in sc]
        return keys

    def _state_frame(self, state: int, idx: int) -> DataFrame:
        keys = self._buckets_in_state(idx)
        base = self.read() if keys is None else self._read_buckets(keys)
        return base.filter(F.col("state") == state)

    def _touched(self, df: DataFrame) -> list[int]:
        return [
            r.b
            for r in df.select(
                F.pmod(F.col("id"), F.lit(self.n_buckets)).cast("int").alias("b")
            ).distinct().collect()
        ]

    def add_tasks(self, rows: list[tuple]) -> None:
        new = self.spark.createDataFrame(rows, TASKS_DDL)
        touched = sorted({int(r[0]) % self.n_buckets for r in rows})
        existing = self._read_buckets(touched)
        self._commit_buckets(existing.unionByName(new))

    # -- claim / recover -----------------------------------------------------
    def claim_batch(self, limit: int = 10_000, condition=None) -> DataFrame:
        """Claim ≤limit todo tasks: select + state 0→2, BOTH sides pruned —
        the scan opens only buckets with todo>0 (manifest stats), the commit
        rewrites only the claimed rows' buckets (task_spider.py:363-396)."""
        todo = self._state_frame(TODO, 0)
        if condition is not None:
            todo = todo.filter(condition)
        claimed = todo.orderBy("id").limit(limit).persist()
        n = claimed.count()
        if n == 0:
            claimed.unpersist()
            return claimed
        self._merge_state(claimed.select("id"), CLAIMED)
        return claimed

    def _merge_state(self, ids_df: DataFrame, state: int) -> None:
        touched = self._touched(ids_df)
        subset = self._read_buckets(touched)
        updated = merge_update(
            subset, ids_df.withColumn("state", F.lit(state)), ["id"], ["state"]
        )
        self._commit_buckets(updated)

    def lost_tasks(self, limit: int = 10_000) -> DataFrame:
        """Tasks stuck in claimed state (task_spider.py:398-418); reads only
        buckets with claimed>0."""
        return self._state_frame(CLAIMED, 1).orderBy("id").limit(limit)

    def reset_lost(self) -> int:
        """Bulk 2→0 reset (batch_spider.py:536-549); returns #reset."""
        lost = self._state_frame(CLAIMED, 1).select("id").persist()
        n = lost.count()
        if n:
            self._merge_state(lost, TODO)
        lost.unpersist()
        return n

    # -- writeback (update_task_batch → UpdateItem → MERGE, K5) ---------------
    def update_state(self, ids: list[int], state: int) -> None:
        src = self.spark.createDataFrame([(i,) for i in ids], "id INT")
        self._merge_state(src, state)

    def init_task(self) -> None:
        """New-batch reset: every non-failed task back to todo
        (batch_spider.py:595-608: UPDATE state=0 WHERE state != -1) — a
        whole-table transition, so every partition legitimately rewrites."""
        tasks = self.read()
        updated = tasks.withColumn(
            "state", F.when(F.col("state") != FAILED, F.lit(TODO)).otherwise(F.col("state"))
        )
        self._commit_buckets(updated)

    # -- rollups ---------------------------------------------------------------
    def rollup(self, verify: bool = False) -> dict:
        """state → count (batch_spider.py:419-437, A1).

        Served from the manifest's per-bucket state counts when they cover
        every partition — a driver-side dict sum, ZERO Spark jobs, so the
        monitor loop's per-tick calls (check_batch/update_progress) stop
        scanning a 10^8-row task table.  Falls back to the groupBy scan when
        stats are missing/partial (legacy stores, pre-4-state counts), or
        when ``verify=True`` — the reference's double-check-under-lock before
        declaring a batch done (batch_spider.py:632-639)."""
        m = self.table.manifest()
        sc = (m.meta or {}).get("state_counts") if m else None
        stats_complete = (
            not verify
            and sc is not None
            and not (m.segments or [])
            and all(len(c) >= 4 for c in sc.values())
            and all(b in sc for b in (m.partitions or {}))
        )
        if stats_complete:
            counts = {}
            for state, idx in ((TODO, 0), (CLAIMED, 1), (DONE, 2), (FAILED, 3)):
                n = sum(c[idx] for c in sc.values())
                if n:
                    counts[state] = n
        else:
            rows = self.read().groupBy("state").agg(F.count("*").alias("n")).collect()
            counts = {r.state: r.n for r in rows}
        total = sum(counts.values())
        done = counts.get(DONE, 0) + counts.get(FAILED, 0)
        return {"total": total, "done": done, "failed": counts.get(FAILED, 0), "by_state": counts}


class BatchManager:
    """batch_record lifecycle (batch_spider.py:187-914)."""

    def __init__(self, spark: SparkSession, store: SnapshotStore, tasks: TaskManager,
                 interval_days: float = 7.0, table: str = "batch_record"):
        self.spark = spark
        self.tasks = tasks
        self.interval = timedelta(days=interval_days)
        self.interval_days = interval_days
        self.table = store.table(table)
        if not self.table.exists():
            self.table.create_empty(BATCH_RECORD_DDL)
        # get_deal_speed observation state (batch_spider.py:565-567)
        self._last_done_count: int | None = None
        self._last_done_time: datetime | None = None
        self._deal_speed_cached: tuple | None = None

    def latest(self):
        rows = self.table.read().orderBy(F.desc("id")).limit(1).collect()
        return rows[0] if rows else None

    def record_batch(self, now: datetime) -> None:
        """Insert a new batch row (batch_spider.py:874-914) after resetting
        task states (init_task)."""
        latest = self.latest()
        next_id = (latest.id + 1) if latest else 1
        roll = self.tasks.rollup()
        row = (
            next_id, now, roll["total"], 0, 0,
            float(self.interval_days), "day", now, now, 0,
        )
        self.table.commit(self.spark.createDataFrame([row], BATCH_RECORD_DDL), mode="append")

    def update_progress(self, now: datetime, related_done: bool = True) -> dict:
        """Roll task counts into the latest batch row (A2,
        batch_spider.py:439-468); marks is_done when done==total — unless a
        related spider is still running (update_is_done is gated on the
        related check, batch_spider.py:782-800)."""
        latest = self.latest()
        if latest is None:
            return {}
        roll = self.tasks.rollup()
        is_done = 1 if roll["total"] > 0 and roll["done"] == roll["total"] and related_done else 0
        src = self.spark.createDataFrame(
            [(latest.id, roll["total"], roll["done"], roll["failed"], now, is_done)],
            "id INT, total_count LONG, done_count LONG, fail_count LONG, update_time TIMESTAMP, is_done INT",
        )
        self.table.commit(
            merge_update(
                self.table.read(), src, ["id"],
                ["total_count", "done_count", "fail_count", "update_time", "is_done"],
            ),
            mode="overwrite",
        )
        return {**roll, "is_done": is_done}

    def get_deal_speed(self, total_count: int, done_count: int, last_batch_date: datetime,
                       now: datetime) -> tuple | None:
        """Crawl-speed/ETA estimate (batch_spider.py:551-593, verbatim
        semantics): on each observation where done_count advanced, speed =
        Δdone/Δt; returns the cached
        ``(deal_speed rows/hour, need_time sec, overflow_time sec, at)``
        until the next advance — ``overflow_time`` > 0 means the batch will
        miss its deadline by that many seconds (< 0: early by that much).
        ``now`` is an explicit datetime so the math is deterministic."""
        if self._last_done_count is None:
            self._last_done_count = done_count
            self._last_done_time = now
        elif done_count > self._last_done_count:
            dt = (now - self._last_done_time).total_seconds()
            speed = (done_count - self._last_done_count) / dt  # rows/sec
            need_time = (total_count - done_count) / speed  # sec
            overflow_time = (
                (now - last_batch_date).total_seconds()
                + need_time
                - self.interval.total_seconds()
            )
            self._last_done_count = done_count
            self._last_done_time = now
            self._deal_speed_cached = (
                int(speed * 3600), need_time, overflow_time, now.strftime("%Y-%m-%d %H:%M:%S"),
            )
        return self._deal_speed_cached

    def speed_alarm(self, now: datetime) -> str | None:
        """Overflow alerting (batch_spider.py:723-837): alarm when the ETA
        from the latest batch row's progress passes the batch deadline."""
        latest = self.latest()
        if latest is None:
            return None
        sp = self.get_deal_speed(latest.total_count, latest.done_count, latest.batch_date, now)
        if sp is None:
            return None
        deal_speed, need_time, overflow_time, at = sp
        if overflow_time > 0:
            return (
                f"batch overflow: ETA exceeds the deadline by {int(overflow_time)}s "
                f"(speed {deal_speed}/h, need {int(need_time)}s, observed {at})"
            )
        return None

    def related_is_done(self, related_frontier: DataFrame | None = None,
                        related_batch: "BatchManager | None" = None) -> bool:
        """Related-spider gate (batch_spider.py:848-872 / task_spider.py:
        444-470): this batch cannot end while a dependency spider still has
        frontier rows, or while its latest batch row is not is_done.  A
        related batch table with no rows counts as done (the reference warns
        and returns True)."""
        if related_frontier is not None and related_frontier.limit(1).count() > 0:
            return False
        if related_batch is not None:
            latest = related_batch.latest()
            if latest is not None and not latest.is_done:
                return False
        return True

    def check_batch(self, now: datetime, related_frontier: DataFrame | None = None,
                    related_batch: "BatchManager | None" = None) -> str:
        """Batch lifecycle decision (batch_spider.py:610-846): start the
        first batch, start a new batch when the interval elapsed (resetting
        non-failed tasks), else update progress.  A finished batch waits for
        its related spiders before flipping is_done.  Returns the action.
        """
        latest = self.latest()
        if latest is None:
            self.record_batch(now)
            return "started_first_batch"
        if now - latest.batch_date >= self.interval:
            self.tasks.init_task()
            self.record_batch(now)
            return "started_new_batch"
        related_done = self.related_is_done(related_frontier, related_batch)
        progress = self.update_progress(now, related_done=related_done)
        if progress.get("is_done"):
            return "batch_done"
        if roll_done(progress) and not related_done:
            return "waiting_related"
        return "in_progress"
