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

from feapder_spark.crawl.semantics import CODE_ABANDONED, CODE_VALIDATE_RETRY

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

    n_parts = batch.sparkSession.sparkContext.defaultParallelism
    src = batch.repartition(n_parts, "host") if by_host else batch.repartition(n_parts)
    return src.mapInPandas(fetch_map, schema=schema_ddl)


FETCH_PARSE_EXTRA_DDL = (
    "status_code INT, title STRING, n_spans INT, spans_json STRING, "
    "links_json STRING, stage_partition INT"
)


def fetch_parse_batch(
    batch: DataFrame,
    resolver,
    by_host: bool = True,
    use_cache: bool = False,
    validate=None,
    host_salt_splits: int = 1,
    parse_fn=None,
) -> DataFrame:
    """Fused fetch+parse: ONE Arrow hop per task instead of a chain of
    python evals (a chained canonicalize→fetch→parse pipeline runs several
    python workers per task — at local[32] that oversubscribes the box and
    *anti*-scales; fusing keeps exactly one python worker per task and the
    raw HTML never crosses the JVM boundary at all).

    Output = batch columns + status_code, title, n_spans, spans_json,
    links_json (JSON array of {u: absolute url, c: canonical url, h: host} —
    canonicalization happens here in python; the md5 fingerprint stays
    JVM-side).

    ``use_cache``: the batch carries ``cached_status``/``cached_content``
    columns (left-joined from the fetch_cache table, SURVEY S8/J4); cached
    rows skip the resolver, fresh 200s emit ``content`` for the cache commit.

    ``validate``: user hook ``(url, html) -> bool`` (base_parser.py:43-57):
    False ⇒ abandoned (status -2, straight to failed), raise ⇒ retry path
    (status -1), applied only to fetched 200s.
    """
    import json as _json

    from feapder_spark.crawl import html as H
    from feapder_spark.urlnorm import canonicalize_url, host_of

    base = batch.drop("cached_status", "cached_content")  # input-only columns
    schema_ddl = base._jdf.schema().toDDL() + ", " + FETCH_PARSE_EXTRA_DDL
    if use_cache:
        schema_ddl += ", content STRING"

    def fp_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in it:
            if not len(pdf):
                continue
            codes, titles, n_spans_l, spans_l, links_l, contents = [], [], [], [], [], []
            cached_status = pdf["cached_status"] if use_cache else [None] * len(pdf)
            cached_content = pdf["cached_content"] if use_cache else [None] * len(pdf)
            for url, url_canon, retry, c_status, c_content in zip(
                pdf["url"], pdf["url_canon"], pdf["retry_times"], cached_status, cached_content
            ):
                from_cache = use_cache and c_status is not None and not pd.isna(c_status)
                if from_cache:
                    status, raw = int(c_status), c_content
                else:
                    status, raw = resolver.resolve(url, attempt=int(retry))
                if status == 200 and validate is not None:
                    try:
                        if not validate(url, raw):
                            status = CODE_ABANDONED
                    except Exception:
                        status = CODE_VALIDATE_RETRY
                codes.append(status)
                if status == 200:
                    spans, links, title = (parse_fn or H.parse_document)(url_canon, raw)
                    titles.append(title)
                    n_spans_l.append(len(spans))
                    spans_l.append(_json.dumps(spans))
                    links_l.append(
                        _json.dumps(
                            [
                                {"u": ln, "c": (c := canonicalize_url(ln)), "h": host_of(c)}
                                for ln in links
                            ]
                        )
                    )
                    contents.append(None if from_cache else raw)
                else:
                    titles.append(None)
                    n_spans_l.append(0)
                    spans_l.append(None)
                    links_l.append(None)
                    contents.append(None)
            out = pdf.drop(columns=["cached_status", "cached_content"], errors="ignore").assign(
                status_code=codes,
                title=titles,
                n_spans=n_spans_l,
                spans_json=spans_l,
                links_json=links_l,
                stage_partition=pid,
            )
            if use_cache:
                out = out.assign(content=contents)
            yield out

    # explicit partition count: AQE's byte-based coalescing would collapse
    # this CPU-bound (per-row python) stage into a couple of tasks — URL rows
    # are tiny but each costs a fetch+parse.  An explicit count is honored
    # by AQE; by_host keeps one host's fetches on one executor (politeness).
    # host_salt_splits > 1 salts the partition key so one hot (Zipf-head)
    # domain spreads over up to that many executors — the explicit skew
    # handling the north rule asks for; the per-host rate budget still binds
    # globally because it is enforced upstream at lease time (frontier.py).
    n_parts = batch.sparkSession.sparkContext.defaultParallelism
    if by_host and host_salt_splits > 1:
        salt = F.pmod(F.xxhash64("fingerprint"), F.lit(host_salt_splits))
        src = batch.repartition(n_parts, F.col("host"), salt)
    elif by_host:
        src = batch.repartition(n_parts, "host")
    else:
        src = batch.repartition(n_parts)
    return src.mapInPandas(fp_map, schema=schema_ddl)


def fetch_metrics(fetched: DataFrame) -> DataFrame:
    """Per-partition fetch lineage (north-star metrics requirement)."""
    return fetched.groupBy("fetch_partition").agg(
        F.count("*").alias("fetched"),
        F.sum((F.col("status_code") == 200).cast("long")).alias("ok"),
        F.sum((F.col("status_code") != 200).cast("long")).alias("errors"),
    )
