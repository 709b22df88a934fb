"""Item / UpdateItem sinks (reference network/item.py, buffer/item_buffer.py).

- ``Item``: dynamic-dict records routed to a per-class table named by
  snake-casing the class name with ``_item`` stripped (item.py:97-106,
  tools.py:2252); here each item class is an explicit-schema snapshot table.
- item fingerprint = md5 over sorted key+str(value) pairs, restricted to
  ``__unique_key__`` when declared (item.py:141-153) — computed JVM-side.
- dedup-then-export-then-commit-fingerprint ordering: fingerprints are only
  recorded after a successful export (item_buffer.py:180-217, 356-358) —
  with snapshot commits the export IS the fingerprint commit, so the
  ordering holds by construction.
- ``UpdateItem`` → MERGE on ``__update_key__`` columns (item.py:161-177,
  mysql ON DUPLICATE KEY UPDATE → operators/merge.merge_update).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feapder_spark.operators.merge import merge_update, merge_upsert
from feapder_spark.store import SnapshotStore


def table_name_of(item_class_name: str) -> str:
    """CamelCase → snake_case with trailing _item stripped
    (item.py:97-106 + tools.key2underline semantics, tools.py:2252)."""
    snake = re.sub(r"(?<!^)(?=[A-Z])", "_", item_class_name).lower()
    if snake.endswith("_item"):
        snake = snake[: -len("_item")]
    return snake


def item_fp_col(columns: list[str]) -> F.Column:
    """md5 over sorted key+str(value) pairs (item.py:141-153), JVM-side."""
    parts = []
    for k in sorted(columns):
        parts.append(F.lit(k))
        parts.append(F.coalesce(F.col(k).cast("string"), F.lit("None")))
    return F.md5(F.concat(*parts))


class ItemTable:
    def __init__(
        self,
        spark: SparkSession,
        store: SnapshotStore,
        item_class_name: str,
        schema_ddl: str,
        unique_key: list[str] | None = None,
        update_key: list[str] | None = None,
        key_cols: list[str] | None = None,
        pre_to_db=None,
    ):
        self.spark = spark
        self.name = table_name_of(item_class_name)
        self.schema_ddl = schema_ddl
        self.unique_key = unique_key
        self.update_key = update_key
        self.key_cols = key_cols or ["id"]
        # Item.pre_to_db (item.py:59-63): a DataFrame→DataFrame transform
        # applied before fingerprinting/export (use JVM column expressions,
        # not per-row Python, for the hot path)
        self.pre_to_db = pre_to_db
        self._store = store
        self.table = store.table(self.name)
        if not self.table.exists():
            self.table.create_empty(schema_ddl + ", __fp STRING")

    def read(self) -> DataFrame:
        return self.table.read()

    def _with_fp(self, df: DataFrame) -> DataFrame:
        cols = self.unique_key or [c for c in df.columns]
        return df.withColumn("__fp", item_fp_col(cols))

    def save_items(self, df: DataFrame, pipelines: list | None = None) -> int:
        """Item path: in-batch dedup + anti-join vs recorded fingerprints,
        then export (the snapshot commit records the fingerprints with the
        rows — item_buffer's export-then-add ordering by construction).

        ``pipelines``: extra export targets (sources/sinks.py contract).  If
        any pipeline raises or returns falsy, the batch is PARKED in a
        ``<table>__failed_items`` table and the fingerprints are NOT
        committed — the reference's transient-export-failure path
        (item_buffer.py:351-414: failed exports are retained and re-exported
        later); call :meth:`reload_failed_items` to retry.  Returns rows
        exported (0 when the batch parked)."""
        if self.pre_to_db is not None:
            df = self.pre_to_db(df)
        fp = self._with_fp(df)
        firsts = fp.dropDuplicates(["__fp"])
        new = firsts.join(self.read().select("__fp"), on="__fp", how="left_anti").persist()
        n = new.count()
        if n:
            ok = True
            for p in pipelines or []:
                try:
                    if not p.save_items(self.name, new.drop("__fp")):
                        ok = False
                except Exception:
                    ok = False
            if not ok:
                self._failed_table().commit(new.select(*self.read().columns), mode="append")
                new.unpersist()
                return 0
            self.table.commit(new.select(*self.read().columns), mode="append")
        new.unpersist()
        return n

    def _failed_table(self):
        name = f"{self.name}__failed_items"
        t = self._store.table(name)
        if not t.exists():
            t.create_empty(self.schema_ddl + ", __fp STRING")
        return t

    def reload_failed_items(self, pipelines: list | None = None) -> int:
        """Re-export every parked item batch (S10,
        handle_failed_items semantics: core/handle_failed_items.py) and clear
        the park on success.  Returns rows successfully re-exported."""
        parked = self._failed_table().read().localCheckpoint()
        n = parked.count()
        if n == 0:
            return 0
        # clear the park first; a still-failing export re-parks the batch
        self._failed_table().commit(
            self.spark.createDataFrame([], self.schema_ddl + ", __fp STRING"),
            mode="overwrite",
        )
        return self.save_items(parked.drop("__fp"), pipelines=pipelines)

    def update_items(self, df: DataFrame) -> None:
        """UpdateItem path: MERGE on __update_key__ (upsert when the row is
        new, update of the update-key columns when it exists)."""
        keys = self.key_cols
        src = self._with_fp(df)
        target = self.read()
        if self.update_key:
            merged = merge_update(target, src, keys, self.update_key)
            # rows in src absent from target are appended (the insert half)
            new_rows = src.join(target.select(*keys), on=keys, how="left_anti")
            merged = merged.unionByName(new_rows.select(*target.columns))
        else:
            merged = merge_upsert(target, src, keys)
        self.table.commit(merged, mode="overwrite")
