"""Pinned crawl-loop semantics shared by the Spark engine and the oracle.

One module holds every contract constant and tiny predicate so the two
implementations can never drift apart.  Sources (reference, read-only):

- DEFAULT_PRIORITY = 300, lower is more urgent (request.py:68,114)
- MAX_RETRIES = 10 (setting.py:61); a request that fails with
  ``retry_times + 1 > MAX_RETRIES`` routes to failed (parser_control.py:298-301)
- LEASE_SECONDS = 600 (setting.py:113, REQUEST_LOST_TIMEOUT)
- BATCH_SIZE default 32 (setting.py:55, COLLECTOR_TASK_COUNT)
- take-batch ordering: priority ASC, then fingerprint ASC — the distributed
  (Redis zset) contract: score=priority, ties lexicographic by member
  (redisdb.py:308-361); SURVEY §7 pins this over the AirSpider heap's
  unstable ties.
- dedup is claim-on-enqueue: a URL is claimed the moment it is first
  enqueued (request_buffer.py:42-50); retries skip dedup
  (filter_repeat=False, parser_control.py:347).
"""

from __future__ import annotations

DEFAULT_PRIORITY = 300
MAX_RETRIES = 10
LEASE_SECONDS = 600
DEFAULT_BATCH_SIZE = 32

ORDER_COLS = ("priority", "fingerprint")

STATUS_TODO = "todo"
STATUS_DONE = "done"
STATUS_FAILED = "failed"

# synthetic status codes for the validate hook (base_parser.py:43-57 contract:
# False => abandon without retry, parser_control.py:158-160; raise => retry,
# parser_control.py:555-557)
CODE_ABANDONED = -2
CODE_VALIDATE_RETRY = -1


def failure_route(retry_times: int, max_retries: int = MAX_RETRIES) -> str:
    """Route a just-failed request (parser_control.py:298-301):
    ``retry_times`` is the count *before* this failure; failed when
    retry_times + 1 > max_retries, else retry."""
    return STATUS_FAILED if retry_times + 1 > max_retries else STATUS_TODO


def item_fingerprint(item: dict, unique_keys: list[str] | None = None) -> str:
    """Item fingerprint (item.py:141-153): md5 over sorted key+str(value)
    pairs, restricted to __unique_key__ columns when declared."""
    from feapder_spark.urlnorm import get_md5

    keys = sorted(unique_keys or item.keys())
    args = []
    for k in keys:
        args.append(k)
        args.append(str(item[k]))
    return get_md5(*args)
