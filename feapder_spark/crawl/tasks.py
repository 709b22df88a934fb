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


class TaskManager:
    def __init__(self, spark: SparkSession, store: SnapshotStore, table: str = "tasks"):
        self.spark = spark
        self.store = store
        self.table = store.table(table)
        if not self.table.exists():
            self.table.create_empty(TASKS_DDL)

    def add_tasks(self, rows: list[tuple]) -> None:
        self.table.commit(self.spark.createDataFrame(rows, TASKS_DDL), mode="append")

    def read(self) -> DataFrame:
        return self.table.read()

    # -- claim / recover -----------------------------------------------------
    def claim_batch(self, limit: int = 10_000, condition=None) -> DataFrame:
        """Claim ≤limit todo tasks: select + state 0→2 in one snapshot
        commit; returns the claimed rows (task_spider.py:363-396)."""
        tasks = self.read()
        todo = tasks.filter(F.col("state") == TODO)
        if condition is not None:
            todo = todo.filter(condition)
        claimed = todo.orderBy("id").limit(limit).persist()
        n = claimed.count()
        if n == 0:
            claimed.unpersist()
            return claimed
        updated = merge_update(
            tasks, claimed.select("id").withColumn("state", F.lit(CLAIMED)), ["id"], ["state"]
        )
        self.table.commit(updated, mode="overwrite")
        return claimed

    def lost_tasks(self, limit: int = 10_000) -> DataFrame:
        """Tasks stuck in claimed state (task_spider.py:398-418)."""
        return self.read().filter(F.col("state") == CLAIMED).orderBy("id").limit(limit)

    def reset_lost(self) -> int:
        """Bulk 2→0 reset (batch_spider.py:536-549); returns #reset."""
        tasks = self.read()
        lost = tasks.filter(F.col("state") == CLAIMED).select("id").persist()
        n = lost.count()
        if n:
            updated = merge_update(
                tasks, lost.withColumn("state", F.lit(TODO)), ["id"], ["state"]
            )
            self.table.commit(updated, mode="overwrite")
        lost.unpersist()
        return n

    # -- writeback (update_task_batch → UpdateItem → MERGE, K5) ---------------
    def update_state(self, ids: list[int], state: int) -> None:
        src = self.spark.createDataFrame([(i, state) for i in ids], "id INT, state INT")
        self.table.commit(merge_update(self.read(), src, ["id"], ["state"]), mode="overwrite")

    def init_task(self) -> None:
        """New-batch reset: every non-failed task back to todo
        (batch_spider.py:595-608: UPDATE state=0 WHERE state != -1)."""
        tasks = self.read()
        updated = tasks.withColumn(
            "state", F.when(F.col("state") != FAILED, F.lit(TODO)).otherwise(F.col("state"))
        )
        self.table.commit(updated, mode="overwrite")

    # -- rollups ---------------------------------------------------------------
    def rollup(self) -> dict:
        """state → count (batch_spider.py:419-437, A1)."""
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

    def update_progress(self, now: datetime) -> dict:
        """Roll task counts into the latest batch row (A2,
        batch_spider.py:439-468); marks is_done when done==total."""
        latest = self.latest()
        if latest is None:
            return {}
        roll = self.tasks.rollup()
        is_done = 1 if roll["total"] > 0 and roll["done"] == roll["total"] else 0
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

    def check_batch(self, now: datetime) -> str:
        """Batch lifecycle decision (batch_spider.py:610-846): start the
        first batch, start a new batch when the interval elapsed (resetting
        non-failed tasks), else update progress.  Returns the action taken.
        """
        latest = self.latest()
        if latest is None:
            self.record_batch(now)
            return "started_first_batch"
        if now - latest.batch_date >= self.interval:
            self.tasks.init_task()
            self.record_batch(now)
            return "started_new_batch"
        progress = self.update_progress(now)
        return "batch_done" if progress.get("is_done") else "in_progress"
