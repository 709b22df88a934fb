"""Fetch stage — ``mapInPandas`` over the leased micro-batch (SURVEY S7).

The reference dispatches per-request downloads on worker threads
(network/downloader/_requests.py:18-46, dispatch request.py:396-406).  Here
fetch is an Arrow-batched ``mapInPandas`` stage: each executor receives a
pandas batch of (url, retry_times) and resolves them against the
deterministic synthetic web (no network in this sandbox; a production
deployment would swap ``resolver`` for an async HTTP pool per executor —
the session-reuse pattern of _requests.py:30-39).

The batch is repartitioned by host first so one executor owns a host's
fetches — the politeness scheduler's rate decisions then bind locally, and
hot-host skew is bounded upstream by the per-host budget (frontier.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FETCH_EXTRA_DDL = "status_code INT, content STRING, fetch_partition INT"


def fetch_batch(batch: DataFrame, resolver, by_host: bool = True) -> DataFrame:
    """Resolve each leased request; appends status_code/content/fetch_partition.

    ``resolver`` must be picklable and expose ``resolve(url, attempt) ->
    (status_code, html)`` (crawl/synthweb.py).
    """
    schema_ddl = batch._jdf.schema().toDDL() + ", " + FETCH_EXTRA_DDL

    def fetch_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in it:
            if not len(pdf):
                continue
            results = [resolver.resolve(u, attempt=int(r)) for u, r in zip(pdf["url"], pdf["retry_times"])]
            yield pdf.assign(
                status_code=[s for s, _ in results],
                content=[c for _, c in results],
                fetch_partition=pid,
            )

    src = batch.repartition("host") if by_host else batch
    return src.mapInPandas(fetch_map, schema=schema_ddl)


def fetch_metrics(fetched: DataFrame) -> DataFrame:
    """Per-partition fetch lineage (north-star metrics requirement)."""
    return fetched.groupBy("fetch_partition").agg(
        F.count("*").alias("fetched"),
        F.sum((F.col("status_code") == 200).cast("long")).alias("ok"),
        F.sum((F.col("status_code") != 200).cast("long")).alias("errors"),
    )
