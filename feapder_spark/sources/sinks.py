"""Item export sinks beyond the snapshot tables (SURVEY §2 K3/K4).

The reference routes item batches through pluggable pipelines
(pipelines/__init__.py Pipeline.save_items contract); the snapshot ItemTable
is the SQL/Mongo-shaped sink (K1/K2).  These are the two trivial ones:

- :class:`CsvPipeline` — pipelines/csv_pipeline.py:20-80 (one CSV file tree
  per item table, append across flushes).
- :class:`ConsolePipeline` — pipelines/console_pipeline.py (log each batch;
  here: truncated driver-side echo, returns the count like save_items).

Both keep the save_items(table_name, items_df) -> bool contract so they slot
wherever ItemTable commits do.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class CsvPipeline:
    """CSV export: each save_items appends one directory of part files under
    ``{root}/{table_name}/`` (distributed write — no driver collect; a
    single-file CSV at 100 TB is the anti-pattern, so the reference's
    one-file behaviour is deliberately widened to a part-file tree)."""

    def __init__(self, root: str, header: bool = True):
        self.root = root
        self.header = header
        self._batch_seq: dict[str, int] = {}

    def save_items(self, table_name: str, items: DataFrame) -> bool:
        seq = self._batch_seq.get(table_name, 0)
        path = os.path.join(self.root, table_name, f"batch-{seq:05d}")
        items.write.mode("overwrite").option("header", str(self.header).lower()).csv(path)
        self._batch_seq[table_name] = seq + 1
        return True

    def read_back(self, spark, table_name: str, schema_ddl: str) -> DataFrame:
        return (
            spark.read.schema(schema_ddl)
            .option("header", str(self.header).lower())
            .csv(os.path.join(self.root, table_name, "batch-*"))
        )


class ConsolePipeline:
    """Console export (debug sink): prints ≤``max_rows`` rows per batch and
    returns True — the pipeline contract's success signal."""

    def __init__(self, max_rows: int = 20):
        self.max_rows = max_rows
        self.batches_seen = 0

    def save_items(self, table_name: str, items: DataFrame) -> bool:
        print(f"[console_pipeline] table={table_name}")
        items.show(self.max_rows, truncate=40)
        self.batches_seen += 1
        return True
