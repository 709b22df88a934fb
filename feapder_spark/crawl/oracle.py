"""Pure-Python reference-semantics oracle (SURVEY §7 M0).

A ~150-line sequential implementation of the pinned crawl contract
(crawl/semantics.py) over the synthetic web.  It produces the golden
outputs the Spark engine must reproduce exactly:

- ``crawl_order``: fingerprints in lease order (priority ASC, fingerprint
  ASC, batch-at-a-time — the zset contract, redisdb.py:308-361)
- final ``seen`` fingerprint set (claim-on-enqueue, request_buffer.py:42-50)
- ``docs``: per-document span sequences (kind, text, media_ref, offset)
- ``failed`` fingerprints (retry>max routing, parser_control.py:298-301)
- ``items`` with item fingerprints (item.py:141-153)
- per-iteration metrics

No Spark, no threads — the whole point is an independent, obviously-correct
serial reading of the reference semantics to diff the distributed engine
against (SURVEY §5 test plan).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from feapder_spark.crawl import html as H
from feapder_spark.crawl import semantics as S
from feapder_spark.crawl.synthweb import SyntheticWeb
from feapder_spark.urlnorm import canonicalize_url, get_md5, host_of, request_fingerprint


@dataclass
class OracleResult:
    crawl_order: list[str] = field(default_factory=list)  # fingerprints in lease order
    seen: set = field(default_factory=set)
    docs: dict = field(default_factory=dict)  # doc_id -> list[span dict]
    failed: set = field(default_factory=set)
    items: dict = field(default_factory=dict)  # item fingerprint -> item dict
    metrics: list = field(default_factory=list)
    iterations: int = 0


def run_oracle(
    web: SyntheticWeb,
    seeds: list[dict],
    batch_size: int = S.DEFAULT_BATCH_SIZE,
    max_retries: int = S.MAX_RETRIES,
    max_iterations: int | None = None,
    politeness: dict[str, int] | None = None,
    token_bucket: dict | None = None,
    parsers: dict | None = None,
    default_parser: str = "TestParser",
    seen_ttl_iterations: int | None = None,
) -> OracleResult:
    """``parsers``: multi-parser dispatch mirror (parser_control.py:85-86) —
    {parser_name: parse_fn}; rows route by their parser_name, links emitted
    as (url, parser_name) pairs route explicitly, bare links inherit the
    emitting row's parser.  Seeds may carry method/data (TaskSpider params);
    body args fold into the fingerprint (request.py:465-480)."""
    res = OracleResult()
    # frontier: fingerprint -> row dict
    frontier: dict[str, dict] = {}
    # claim log for ExpireFilter semantics: fp -> latest claim iteration
    seen_at: dict[str, int] = {}
    # token-bucket state mirroring crawl/politeness.py exactly: hosts carry
    # (tokens, updated_iteration) only while they have due rows; a host
    # absent from an iteration's due set drops out and restarts at burst
    bucket_state: dict[str, tuple[float, int]] = {}

    def enqueue(
        url: str,
        priority: int,
        *,
        claim: bool = True,
        retry_times: int = 0,
        parser_name: str | None = None,
        method: str | None = None,
        data: dict | None = None,
    ) -> bool:
        """Returns True when the request was (re)claimed as new."""
        canon = canonicalize_url(url)
        fp = request_fingerprint(url, data=data) if data else get_md5(canon)
        claimed = False
        if claim:
            prev = seen_at.get(fp)
            alive = prev is not None and (
                seen_ttl_iterations is None or prev > res.iterations - seen_ttl_iterations
            )
            if alive:
                return False  # claim-on-enqueue dedup (request_buffer.py:42-50)
            seen_at[fp] = res.iterations  # (re)claim; expired claims renew
            res.seen.add(fp)
            claimed = True
        frontier[fp] = {
            "fingerprint": fp,
            "url": url,
            "url_canon": canon,
            "host": host_of(url),
            "priority": priority,
            "retry_times": retry_times,
            "status": S.STATUS_TODO,
            "parser_name": parser_name or default_parser,
            "method": method,
            "data": data,
        }
        return claimed

    for seed in seeds:
        enqueue(
            seed["url"],
            seed.get("priority", S.DEFAULT_PRIORITY),
            parser_name=seed.get("parser_name"),
            method=seed.get("method"),
            data=seed.get("data"),
        )

    while True:
        if max_iterations is not None and res.iterations >= max_iterations:
            break
        due = [r for r in frontier.values() if r["status"] == S.STATUS_TODO]
        # per-host budgets: static politeness and/or token-bucket accrual
        budgets: dict[str, int] | None = None
        default_budget = 10**9
        if politeness:
            default_budget = politeness.get("__default__", 10**9)
            budgets = {h: b for h, b in politeness.items() if h != "__default__"}
        if token_bucket:
            rate, burst = token_bucket["rate"], token_bucket["burst"]
            due_hosts = {r["host"] for r in due}
            accrued: dict[str, tuple[float, int]] = {}
            for h in due_hosts:
                if h in bucket_state:
                    tokens, upd = bucket_state[h]
                    tokens = min(burst, tokens + (res.iterations - upd) * rate)
                else:
                    tokens = burst
                accrued[h] = (tokens, res.iterations)
            tb_budgets = {h: int(t) for h, (t, _) in accrued.items()}
            if budgets is None:
                budgets = tb_budgets
            else:
                budgets = {
                    h: min(budgets.get(h, default_budget), tb_budgets.get(h, 10**9))
                    for h in set(budgets) | set(tb_budgets)
                }
        if budgets is not None:
            per_host_count: dict[str, int] = {}
            eligible = []
            for r in sorted(due, key=lambda r: (r["priority"], r["fingerprint"])):
                budget = budgets.get(r["host"], default_budget)
                c = per_host_count.get(r["host"], 0)
                if c < budget:
                    per_host_count[r["host"]] = c + 1
                    eligible.append(r)
        else:
            eligible = due
        batch = sorted(eligible, key=lambda r: (r["priority"], r["fingerprint"]))[:batch_size]
        if not batch:
            if token_bucket and due and token_bucket["rate"] > 0:
                # idle-accrual tick (engine mirror: state not updated, so
                # elapsed-iterations accrual covers the idle gap)
                res.metrics.append(
                    {"iteration": res.iterations, "leased": 0, "fetched_ok": 0,
                     "links_new": 0, "links_dup": 0, "retried": 0, "failed": 0}
                )
                res.iterations += 1
                continue
            break
        if token_bucket:
            # spend one token per leased fetch; state rows exist only for due hosts
            spent: dict[str, int] = {}
            for r in batch:
                spent[r["host"]] = spent.get(r["host"], 0) + 1
            bucket_state = {
                h: (max(0.0, t - spent.get(h, 0)), upd) for h, (t, upd) in accrued.items()
            }
        m = {"iteration": res.iterations, "leased": len(batch), "fetched_ok": 0,
             "links_new": 0, "links_dup": 0, "retried": 0, "failed": 0}
        for r in batch:
            res.crawl_order.append(r["fingerprint"])
            if r["method"] is not None or r["data"] is not None:
                status, raw = web.resolve(
                    r["url"], attempt=r["retry_times"],
                    method=r["method"] or "GET", data=r["data"],
                )
            else:
                status, raw = web.resolve(r["url"], attempt=r["retry_times"])
            if status == 200:
                m["fetched_ok"] += 1
                parse_fn = (parsers or {}).get(r["parser_name"]) or H.parse_document
                spans, links, title = parse_fn(r["url_canon"], raw)
                doc_id = r["fingerprint"]
                res.docs[doc_id] = spans
                item = {"doc_id": doc_id, "url": r["url_canon"], "title": title, "n_spans": len(spans)}
                ifp = S.item_fingerprint(item)
                if ifp not in res.items:  # item dedup (item_buffer.py:180-217)
                    res.items[ifp] = item
                for link in links:
                    link_parser = r["parser_name"]
                    if isinstance(link, (tuple, list)):
                        link, link_parser = link[0], link[1]
                    if enqueue(link, S.DEFAULT_PRIORITY, parser_name=link_parser):
                        m["links_new"] += 1
                    else:
                        m["links_dup"] += 1
                del frontier[r["fingerprint"]]  # ack (zrem)
            else:
                route = S.failure_route(r["retry_times"], max_retries)
                if route == S.STATUS_FAILED:
                    m["failed"] += 1
                    res.failed.add(r["fingerprint"])
                    del frontier[r["fingerprint"]]
                else:
                    m["retried"] += 1
                    # retry re-enqueue, no dedup (parser_control.py:344-377)
                    r["retry_times"] += 1
        res.metrics.append(m)
        res.iterations += 1
    return res
