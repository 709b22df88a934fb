"""Custom stateful streaming operator — ``applyInPandasWithState``.

SURVEY §2.10: the reference has no event-time streaming, so this is an
engine-introduced capability per the build brief ("applyInPandasWithState
for custom stateful operators"): a streaming per-key seen-counter that
deduplicates events by key across micro-batches, emitting (key, new_in_batch,
total_distinct) — the streaming analog of the crawl engine's claim-on-enqueue
seen set.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("new_in_batch", T.LongType()),
        T.StructField("total_distinct", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [T.StructField("seen_ids", T.ArrayType(T.LongType()))]
)


def dedup_counter(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-event_type stateful dedup: track distinct user_ids across
    micro-batches (a bounded exact set; production would hold a Bloom blob
    in state — same shape as the engine's bucketed seen set)."""
    seen = set(state.get[0]) if state.exists else set()
    new = 0
    for pdf in pdfs:
        for uid in pdf["user_id"]:
            uid = int(uid)
            if uid not in seen:
                seen.add(uid)
                new += 1
    state.update((sorted(seen),))
    yield pd.DataFrame([(key[0], new, len(seen))], columns=["event_type", "new_in_batch", "total_distinct"])


def run_stateful_dedup(spark, sf_dir: str) -> DataFrame:
    """Drive the stateful operator over the parquet-backed stream; returns
    the final per-key totals (update mode, memory sink)."""
    src = (
        spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
        )
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    out = (
        src.groupBy("event_type")
        .applyInPandasWithState(
            dedup_counter, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # last update per key = final totals
    res = spark.sql("SELECT * FROM stateful_dedup")
    w = F.row_number().over(Window.partitionBy("event_type").orderBy(F.desc("total_distinct")))
    return res.withColumn("rn", w).filter(F.col("rn") == 1).drop("rn")
