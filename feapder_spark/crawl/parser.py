"""Parse stage — Arrow-batched document parsing + link candidates.

The reference's parse path (parser_control.py:183-230 dispatching the user
``parse`` generator over a Response) becomes one ``mapInPandas`` stage that
runs the pure-Python pipeline in crawl/html.py (control-char strip →
absolute-link rewrite → span extraction → link extraction, the exact
ordering of response.py:126-241) over each Arrow batch, emitting:

- one row per fetched document with its span sequence (serialized as JSON
  inside the UDF, revived JVM-side with ``from_json`` into the typed
  ``ARRAY<STRUCT<kind,text,media_ref,offset>>`` of the input_hint — no
  Python object ping-pong)
- the extracted absolute links as a JSON array, exploded JVM-side

Fingerprinting of the link candidates is **pure JVM**: for GET requests the
reference fingerprint is md5(canonical_url) (request.py:465-480 with no body
args), so after the canonicalize pandas-UDF the fingerprint is the built-in
``F.md5`` — no Python in that hot path.
"""

from __future__ import annotations

from collections.abc import Iterator

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feapder_spark.crawl import html as H
from feapder_spark.urlnorm import canonicalize_url

SPANS_DDL = "ARRAY<STRUCT<kind: STRING, text: STRING, media_ref: STRING, offset: INT>>"

PARSED_SCHEMA = (
    "fingerprint STRING, url_canon STRING, title STRING, n_spans INT, "
    "spans_json STRING, links_json STRING, parse_partition INT"
)


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """Vectorized w3lib-equivalent canonicalization (tools.py:487-491)."""
    return urls.map(canonicalize_url)


def parse_fetched(fetched_ok: DataFrame) -> DataFrame:
    """Parse 200-responses into (doc row + links).  Input needs columns
    fingerprint, url_canon, content."""

    def parse_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in it:
            if not len(pdf):
                continue
            rows = []
            for fp, url_canon, content in zip(pdf["fingerprint"], pdf["url_canon"], pdf["content"]):
                spans, links, title = H.parse_document(url_canon, content)
                rows.append(
                    (fp, url_canon, title, len(spans), json.dumps(spans), json.dumps(links), pid)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "fingerprint", "url_canon", "title", "n_spans",
                    "spans_json", "links_json", "parse_partition",
                ],
            )

    return fetched_ok.select("fingerprint", "url_canon", "content").mapInPandas(
        parse_map, schema=PARSED_SCHEMA
    )


def docs_from_parsed(parsed: DataFrame) -> DataFrame:
    """Typed docs table per input_hint: (doc_id, spans ARRAY<STRUCT<...>>)."""
    return parsed.select(
        F.col("fingerprint").alias("doc_id"),
        F.col("url_canon").alias("url"),
        F.from_json("spans_json", SPANS_DDL).alias("spans"),
    )


def link_candidates(parsed: DataFrame) -> DataFrame:
    """Absolute link URLs → canonical form + fingerprint, all-but-canon JVM-side."""
    links = parsed.select(F.explode(F.from_json("links_json", "ARRAY<STRING>")).alias("url"))
    return (
        links.withColumn("url_canon", canonicalize_udf("url"))
        .withColumn("fingerprint", F.md5("url_canon"))
        .withColumn(
            "host",
            F.lower(F.coalesce(F.parse_url("url_canon", F.lit("HOST")), F.lit(""))),
        )
    )


# -- fused fetch+parse frame (fetcher.fetch_parse_batch) helpers ------------

FUSED_LINKS_DDL = (
    "ARRAY<STRUCT<u: STRING, c: STRING, h: STRING, p: STRING, cb: STRING, "
    "ar: BOOLEAN>>"
)


def docs_from_fused(fused_ok: DataFrame) -> DataFrame:
    """Typed docs rows from the fused fetch+parse frame (status==200 rows)."""
    return fused_ok.select(
        F.col("fingerprint").alias("doc_id"),
        F.col("url_canon").alias("url"),
        F.from_json("spans_json", SPANS_DDL).alias("spans"),
    )


def link_candidates_fused(fused_ok: DataFrame) -> DataFrame:
    """Candidate rows from the fused frame; canonical form came from the
    python stage, fingerprint is the JVM md5.  ``parser_name`` is the
    per-link parser routing chosen by the emitting parser (bare links
    inherit the emitting row's parser — request.py:100-110); ``callback``
    is the per-request callback name (request.py:248-252)."""
    links = fused_ok.select(F.explode(F.from_json("links_json", FUSED_LINKS_DDL)).alias("l"))
    return links.select(
        F.col("l.u").alias("url"),
        F.col("l.c").alias("url_canon"),
        F.col("l.h").alias("host"),
        F.md5("l.c").alias("fingerprint"),
        F.col("l.p").alias("parser_name"),
        F.col("l.cb").alias("callback"),
        F.col("l.ar").alias("auto_request"),
    )
