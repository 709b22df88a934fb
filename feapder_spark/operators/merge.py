"""MERGE-INTO emulation on snapshot tables.

The reference's task/batch writebacks are MySQL ``INSERT ... ON DUPLICATE
KEY UPDATE`` (tools.py:2110-2251) and ``UPDATE`` statements; Iceberg gives
``MERGE INTO``.  The parquet snapshot store has no row-level ops, so a merge
is expressed with joins + union and committed as an overwrite — same result,
copy-on-write, which is exactly what Iceberg's COW mode does under MERGE.
At 100 TB the overwrite would prune to the partitions containing matches;
the interface here is the seam where a real Iceberg MERGE plugs in.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_update(target: DataFrame, source: DataFrame, keys: Iterable[str], set_cols: Iterable[str]) -> DataFrame:
    """UPDATE target SET set_cols = source.set_cols WHERE keys match.

    Rows of ``target`` without a match pass through unchanged.  ``source``
    must be unique per key.
    """
    keys = list(keys)
    set_cols = list(set_cols)
    src = source.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__v_{c}") for c in set_cols],
    )
    cond = [target[k] == src[f"__k_{k}"] for k in keys]
    joined = target.join(F.broadcast(src), cond, "left")
    out_cols = []
    for c in target.columns:
        if c in set_cols:
            out_cols.append(F.coalesce(F.col(f"__v_{c}"), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def merge_upsert(target: DataFrame, source: DataFrame, keys: Iterable[str]) -> DataFrame:
    """INSERT ... ON DUPLICATE KEY UPDATE: matching target rows replaced by
    source rows, non-matching source rows appended."""
    keys = list(keys)
    kept = target.join(source.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(source.select(*target.columns))
