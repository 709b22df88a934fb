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

# Deterministic user-agent rotation (P13): the reference picks a random UA
# per request from a bundled pool (network/user_agent.py + request.py
# random_user_agent); distributed determinism demands a pure column instead —
# same request, same UA, across retries, executors and reruns.
UA_POOL = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/120.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 13_5) AppleWebKit/605.1.15 Version/16.5 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 Chrome/119.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; rv:121.0) Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 Mobile/15E148 Safari/604.1",
)


def with_user_agent(df: DataFrame, pool: tuple[str, ...] = UA_POOL) -> DataFrame:
    """Append a deterministic ``user_agent`` column: the pool entry selected
    by hash(fingerprint) — JVM-side, no Python, stable across retries."""
    arr = F.array(*[F.lit(u) for u in pool])
    idx = F.pmod(F.xxhash64("fingerprint"), F.lit(len(pool))).cast("int") + F.lit(1)
    return df.withColumn("user_agent", F.element_at(arr, idx))


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
    "links_json STRING, stage_partition INT, inline_sync BOOLEAN"
)


def fetch_parse_batch(
    batch: DataFrame,
    resolver,
    by_host: bool = True,
    use_cache: bool = False,
    validate=None,
    host_salt_splits: int = 1,
    parse_fn=None,
    parsers: dict | None = None,
    callbacks: dict | None = None,
    download_midware=None,
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

    ``parsers``: multi-parser dispatch (parser_control.py:85-86: each request
    routes to the parser whose name matches its ``parser_name``) — a dict
    ``{parser_name: {"parse_fn": fn, "validate": fn, "callbacks": {...}}}``;
    rows whose parser_name has no entry fall back to the batch-level hooks.
    Each parse_fn may emit links as plain URLs (routed back to the emitting
    row's parser, the reference's default-callback rule, request.py:100-110),
    ``(url, parser_name)`` pairs (explicit parser routing), or
    ``(url, parser_name_or_None, callback_name)`` triples.

    ``callbacks``: per-request callback dispatch for the default parser
    (request.py:248-252 serializes a callback NAME with the request;
    parser_control.py:562-570 resolves it getattr-style at parse time) —
    ``{callback_name: fn}``.  A row whose ``callback`` column is set parses
    with ``parsers[pname]["callbacks"][cb]`` (falling back to this dict);
    an unresolvable name routes the request to the retry path, mirroring the
    reference's dispatch AttributeError → exception handling
    (parser_control.py:555-570).

    Rows may carry ``method``/``payload`` columns (TaskSpider per-task
    params, network/request.py:45-81); they are forwarded to the resolver
    when present.

    ``download_midware``: pre-fetch request transform
    (base_parser.py:32-41 / request.py:396-406 download_midware chain):
    ``fn(req_dict) -> dict | None`` where the dict may override
    url/method/data for the fetch.  As in the reference, the request's
    IDENTITY (fingerprint, url_canon) is unchanged — the midware only shapes
    the outgoing fetch (headers/proxy-style rewrites).  The dict may instead
    carry ``"response": (status_code, html)`` — a midware-SUPPLIED response
    that skips the download entirely, mirroring the reference's
    download-midware-returns-(request, response) pattern
    (parser_control.py:509-530: a user midware may hand back a prefetched/
    mocked Response and the downloader is bypassed); validate and parse run
    on it exactly as on a fetched response.
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

        from feapder_spark.urlnorm import get_md5

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in it:
            if not len(pdf):
                continue
            base_cols = [c for c in pdf.columns if c not in ("cached_status", "cached_content")]
            codes, titles, n_spans_l, spans_l, links_l, contents = [], [], [], [], [], []
            extra_rows: list[dict] = []  # synthesized request_sync rows
            cur_idx = 0  # current batch row (template for inline rows)
            inline_depth = 0

            def dispatch(pname, cb):
                """(parse_fn, validate_fn, cb_missing) for a request."""
                spec = (parsers or {}).get(pname)
                row_validate = spec.get("validate", validate) if spec else validate
                rp = (spec.get("parse_fn") if spec else None) or parse_fn or H.parse_document
                missing = False
                if cb:
                    # per-request callback dispatch (parser_control.py:562-570)
                    cb_fns = (spec or {}).get("callbacks") or callbacks or {}
                    rp = cb_fns.get(cb)
                    if rp is None:
                        missing = True  # getattr AttributeError → retry
                return rp, row_validate, missing

            def handle(url, url_canon, retry, pname, cb, method, data, ar_skip,
                       c_status, c_content):
                """Fetch+validate+parse one request.  request_sync links
                recurse depth-first here (parser_control.py:190-195), landing
                as extra output rows; returns (status, title, n_spans,
                spans_json, links_json, cache_content)."""
                nonlocal inline_depth
                rp, row_validate, cb_missing = dispatch(pname, cb)
                from_cache = use_cache and c_status is not None and not pd.isna(c_status)
                fetch_url, fetch_method, fetch_data = url, method, data
                supplied = None  # midware-supplied (status, html), skips fetch
                if download_midware is not None and not from_cache and not ar_skip:
                    mw = download_midware(
                        {"url": fetch_url, "method": fetch_method, "data": fetch_data}
                    )
                    if isinstance(mw, dict):
                        if mw.get("response") is not None:
                            supplied = mw["response"]
                        fetch_url = mw.get("url", fetch_url)
                        fetch_method = mw.get("method", fetch_method)
                        fetch_data = mw.get("data", fetch_data)
                if ar_skip:
                    # auto_request=False: no download, the callback receives
                    # response=None (parser_control.py:96,162-163)
                    status, raw = 200, None
                elif supplied is not None:
                    # midware supplied the response — downloader bypassed
                    # (parser_control.py:509-530)
                    status, raw = int(supplied[0]), supplied[1]
                elif from_cache:
                    status, raw = int(c_status), c_content
                elif fetch_method is not None or fetch_data is not None:
                    status, raw = resolver.resolve(
                        fetch_url, attempt=int(retry),
                        method=fetch_method or "GET", data=fetch_data,
                    )
                else:
                    status, raw = resolver.resolve(fetch_url, attempt=int(retry))
                if status == 200 and not ar_skip and row_validate is not None:
                    try:
                        if not row_validate(url, raw):
                            status = CODE_ABANDONED
                    except Exception:
                        status = CODE_VALIDATE_RETRY
                if status == 200 and cb_missing:
                    status = CODE_VALIDATE_RETRY
                if status != 200:
                    return status, None, 0, None, None, None
                spans, links, title = rp(url_canon, raw)
                out_links = []
                for ln in links:
                    # bare url inherits the row's parser; (url, parser) pairs
                    # route explicitly; (url, parser_or_None, callback)
                    # triples add a callback name; dict form adds
                    # auto_request / request_sync (request.py:68-70)
                    lp, lcb, lar, lsync = pname, None, None, False
                    if isinstance(ln, dict):
                        lp = ln.get("parser_name") or pname
                        lcb = ln.get("callback")
                        lar = ln.get("auto_request")
                        lsync = bool(ln.get("request_sync"))
                        ln = ln["url"]
                    elif isinstance(ln, (tuple, list)):
                        if len(ln) >= 3:
                            ln, lp, lcb = ln[0], ln[1], ln[2]
                        else:
                            ln, lp = ln[0], ln[1]
                        if lp is None:
                            lp = pname
                    c = canonicalize_url(ln)
                    if lsync:
                        if inline_depth >= 20:
                            raise RecursionError(
                                "request_sync recursion depth > 20 (cycle?)"
                            )
                        inline_depth += 1
                        try:
                            run_inline(ln, c, lp, lcb, lar)
                        finally:
                            inline_depth -= 1
                    else:
                        out_links.append(
                            {"u": ln, "c": c, "h": host_of(c), "p": lp,
                             "cb": lcb, "ar": lar}
                        )
                return (
                    status, title, len(spans), _json.dumps(spans),
                    _json.dumps(out_links),
                    None if (from_cache or ar_skip) else raw,
                )

            def run_inline(url, url_canon, pname, cb, ar):
                """Execute a request_sync link NOW, inside this task
                (depth-first, parser_control.py:190-195).  Like the
                reference, it never enters the queue and never claims the
                seen set; it surfaces as an extra output row (inline_sync)
                so docs/items/metrics see it and a failure can re-enqueue
                through the normal retry route."""
                status, title, n_sp, spans_j, links_j, content = handle(
                    url, url_canon, 0, pname, cb, None, None, ar is False,
                    None, None,
                )
                row = {c: pdf.iloc[cur_idx][c] for c in base_cols}
                row.update(
                    fingerprint=get_md5(url_canon), url=url, url_canon=url_canon,
                    host=host_of(url_canon), retry_times=0, parser_name=pname,
                    method=None, payload=None,
                    status_code=status, title=title, n_spans=n_sp,
                    spans_json=spans_j, links_json=links_j,
                    stage_partition=pid, inline_sync=True,
                )
                if "callback" in row:
                    row["callback"] = cb
                if "auto_request" in row:
                    row["auto_request"] = ar is not False
                if use_cache:
                    row["content"] = content
                extra_rows.append(row)

            cached_status = pdf["cached_status"] if use_cache else [None] * len(pdf)
            cached_content = pdf["cached_content"] if use_cache else [None] * len(pdf)
            pnames = pdf["parser_name"] if "parser_name" in pdf.columns else [None] * len(pdf)
            methods = pdf["method"] if "method" in pdf.columns else [None] * len(pdf)
            payloads = pdf["payload"] if "payload" in pdf.columns else [None] * len(pdf)
            row_cbs = pdf["callback"] if "callback" in pdf.columns else [None] * len(pdf)
            ars = pdf["auto_request"] if "auto_request" in pdf.columns else [None] * len(pdf)
            for i, (url, url_canon, retry, c_status, c_content, pname, method, payload, cb, ar) in enumerate(
                zip(
                    pdf["url"], pdf["url_canon"], pdf["retry_times"], cached_status,
                    cached_content, pnames, methods, payloads, row_cbs, ars,
                )
            ):
                cur_idx = i
                ar_skip = ar is not None and not pd.isna(ar) and not bool(ar)
                status, title, n_sp, spans_j, links_j, content = handle(
                    url, url_canon, retry, pname, cb,
                    method, dict(payload) if payload is not None else None,
                    ar_skip, c_status, c_content,
                )
                codes.append(status)
                titles.append(title)
                n_spans_l.append(n_sp)
                spans_l.append(spans_j)
                links_l.append(links_j)
                contents.append(content)
            out = pdf.drop(columns=["cached_status", "cached_content"], errors="ignore").assign(
                status_code=codes,
                title=titles,
                n_spans=n_spans_l,
                spans_json=spans_l,
                links_json=links_l,
                stage_partition=pid,
                inline_sync=False,
            )
            if use_cache:
                out = out.assign(content=contents)
            if extra_rows:
                out = pd.concat(
                    [out, pd.DataFrame(extra_rows, columns=list(out.columns))],
                    ignore_index=True,
                )
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


def route_failures_hooked(
    failures: DataFrame,
    max_retries: int,
    exception_request=None,
    failed_request=None,
) -> DataFrame:
    """Failure routing with the reference's user hooks (parser_control.py:
    283-342 over base_parser.py:71-95), as one Arrow stage over the (small)
    failure frame.  Must mirror frontier.route_failures when both hooks pass.

    - ``exception_request(req_dict) -> dict | False | None`` runs first and
      may replace url/priority/parser_name/payload (a url change recomputes
      url_canon/host/fingerprint — the transformed request re-enqueues
      without dedup, like the reference's filter_repeat=False), return False
      to abandon, or None to keep the request as-is.
    - terminal rows (retry exhausted or abandoned) then pass through
      ``failed_request(req_dict) -> dict | None`` before parking; a returned
      dict replaces the parked row (the reference's "modified request enters
      the failed table" rule).  Item emission from failed_request is not
      supported — route items through a parse hook instead.
    """
    from feapder_spark.crawl.semantics import STATUS_FAILED, failure_route
    from feapder_spark.urlnorm import canonicalize_url, host_of, request_fingerprint

    schema_ddl = failures._jdf.schema().toDDL() + ", route STRING"

    def rmap(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            cols = list(pdf.columns)
            out_rows = []
            for _, row in pdf.iterrows():
                d = {c: row[c] for c in cols}
                abandoned = int(d["status_code"]) == CODE_ABANDONED
                if exception_request is not None:
                    res = exception_request(dict(d))
                    if res is False:
                        abandoned = True
                    elif isinstance(res, dict):
                        d.update(res)
                        if "url" in res:
                            d["url_canon"] = canonicalize_url(d["url"])
                            d["host"] = host_of(d["url_canon"])
                            # the row's payload folds into the recomputed
                            # identity (request.py:465-480) — a url-rewritten
                            # POST must still dedup against a later re-seed
                            # of the same url+payload
                            payload = d.get("payload")
                            d["fingerprint"] = request_fingerprint(
                                d["url"],
                                data=dict(payload) if payload is not None else None,
                            )
                if abandoned:
                    d["route"] = STATUS_FAILED
                else:
                    d["route"] = failure_route(int(d["retry_times"]), max_retries)
                # increment BEFORE the failed_request hook so a hook-returned
                # replacement dict (which may set retry_times or fields
                # derived from it) is never silently overwritten before parking
                d["retry_times"] = int(d["retry_times"]) + 1
                if d["route"] == STATUS_FAILED and failed_request is not None:
                    res = failed_request(dict(d))
                    if isinstance(res, dict):
                        d.update(res)
                out_rows.append(d)
            yield pd.DataFrame(out_rows, columns=cols + ["route"])

    return failures.mapInPandas(rmap, schema=schema_ddl)


def fetch_metrics(fetched: DataFrame) -> DataFrame:
    """Per-partition fetch lineage (north-star metrics requirement)."""
    return fetched.groupBy("fetch_partition").agg(
        F.count("*").alias("fetched"),
        F.sum((F.col("status_code") == 200).cast("long")).alias("ok"),
        F.sum((F.col("status_code") != 200).cast("long")).alias("errors"),
    )
