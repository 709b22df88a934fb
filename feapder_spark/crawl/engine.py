"""The crawl engine — iterative DataFrame jobs over snapshot tables.

One driver loop collapses the reference's three spider lifecycles
(AirSpider/Spider/BatchSpider, SURVEY §3) into:

    while frontier has due rows:
        batch   = politeness-gated top-k of frontier      (lease, S2/O1/O2)
        fetched = mapInPandas resolve                      (S7)
        parsed  = mapInPandas span+link extraction         (P5-P9)
        new     = anti-join(candidate links, seen)         (F1/J1/F7)
        commit seen+docs+items+failed+frontier+order+metrics as one
        checkpointed snapshot group                        (B1/B2/K1-K6)

Delivery semantics mirror the reference: at-least-once with
claim-on-enqueue dedup (request_buffer.py:42-50), priority-ascending lease
order with lexicographic fingerprint ties (redisdb.py:308-361), retry≤10
routing to a failed table (parser_control.py:298-342), item export
transactional with the fingerprint commit (item_buffer.py:351-358), and
resume-from-checkpoint that skips re-seeding when the frontier is non-empty
(scheduler.py:197-201).

Scale notes (the 100 TB story):
- take-batch is TakeOrderedAndProject (per-partition top-k), never a global
  sort; the frontier scan prunes on status/priority columns.
- the seen set is either the exact fingerprint table (anti-join, shuffle
  bounded by candidate count — fingerprints are 16 B) or the bucketed Bloom
  blobs (operators/seen_set.py): partition-pruned read of the touched
  buckets only + dynamic-partition-overwrite commit of the same.
- the frontier is a DELTA log: adds are append-only, a lease appends
  tombstones keyed by (fingerprint, retry_times, added_iteration), and the
  visible set is adds ⟕anti tombstones — per-iteration write bytes are
  O(batch), never O(frontier).  Compaction folds tombstones back in when
  they exceed the visible size.  On Iceberg both tables bucket by
  fingerprint so the anti-join is co-partitioned (storage-partitioned
  join, no shuffle); that bucketing is this store's one deferred seam.
- each iteration's lineage is cut by persisted micro-batch frames; state
  never accumulates in driver memory (no collect of data rows anywhere).
"""

from __future__ import annotations

import os as _os
import time as _time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

# opt-in phase timing: SPARK_GRAFT_TRACE=1 prints per-iteration phase walls
# (lease/agg job, claim, commits, checkpoint) — for locating driver-side
# serial cost; zero overhead when unset
_TRACE = bool(_os.environ.get("SPARK_GRAFT_TRACE"))

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from feapder_spark.crawl import frontier as FR
from feapder_spark.crawl import robots as RB
from feapder_spark.crawl.politeness import BUCKETS_DDL, TokenBuckets
from feapder_spark.crawl import semantics as S
from feapder_spark.crawl.fetcher import (
    fetch_parse_batch,
    route_failures_hooked,
    with_user_agent,
)
from feapder_spark.crawl.parser import (
    FUSED_LINKS_DDL,
    canonicalize_udf,
    docs_from_fused,
    link_candidates_fused,
)
from feapder_spark.crawl.items import item_fp_col as _items_fp_col
from feapder_spark.urlnorm import request_fingerprint
from feapder_spark.operators.seen_set import (
    BloomSeenSet,
    dedup_first,
    dedup_new,
    prune_expired,
)
from feapder_spark.store import SnapshotStore

SEEN_DDL = "fingerprint STRING, added_iteration INT, added_at TIMESTAMP"
DOCS_DDL = (
    "doc_id STRING, url STRING, "
    "spans ARRAY<STRUCT<kind: STRING, text: STRING, media_ref: STRING, offset: INT>>"
)
ITEMS_DDL = "item_fp STRING, doc_id STRING, url STRING, title STRING, n_spans INT"
# the failed park keeps the full frontier row (the reference re-puts the
# original serialized request, preserving priority, parser routing and the
# request payload — handle_failed_requests.py:29-54), not just the url
FAILED_DDL = (
    "fingerprint STRING, url STRING, url_canon STRING, host STRING, "
    "priority INT, parser_name STRING, retry_times INT, status_code INT, "
    "method STRING, payload MAP<STRING, STRING>, callback STRING, "
    "auto_request BOOLEAN"
)
ORDER_DDL = "seq LONG, iteration INT, fingerprint STRING"
METRICS_DDL = (
    "iteration INT, leased LONG, fetched_ok LONG, links_new LONG, links_dup LONG, "
    "links_dropped LONG, retried LONG, failed LONG"
)
PART_METRICS_DDL = "iteration INT, stage STRING, partition_id INT, rows LONG"
FETCH_CACHE_DDL = "fingerprint STRING, status_code INT, content STRING"
# tombstone delta log: one row per leased frontier-row version; the visible
# frontier is adds ⟕anti tombstones on exactly these three columns
TOMBS_DDL = "fingerprint STRING, retry_times INT, added_iteration INT"

TABLES = [
    "frontier", "frontier_tombs", "seen", "seen_set", "docs", "items", "failed",
    "crawl_order", "metrics", "metrics_partitions", "fetch_cache", "robots",
    "token_buckets",
]

_ITEM_KEYS = ["doc_id", "n_spans", "title", "url"]  # sorted, item.py:141-153


def item_fp_col() -> F.Column:
    """JVM-side item fingerprint = md5 over sorted key+str(value) pairs.
    Delegates to items.item_fp_col so NULL values hash as str(None)='None'
    (item.py:141-153) — a raw concat would yield NULL fingerprints that the
    left-anti dedup join can never match."""
    return _items_fp_col(_ITEM_KEYS)


@dataclass
class CrawlConfig:
    batch_size: int = S.DEFAULT_BATCH_SIZE
    max_retries: int = S.MAX_RETRIES
    default_parser: str = "TestParser"
    politeness: dict | None = None  # host -> per-iteration budget; "__default__" key
    link_priority: int = S.DEFAULT_PRIORITY
    # frontier tombstone compaction: fold the delta log back into the adds
    # table when tombstones exceed max(this floor, visible frontier size)
    compact_min_tombstones: int = 100_000
    # ExpireFilter semantics (dedup/expirefilter.py:17-81): a claimed
    # fingerprint stops deduping after the TTL, so the URL re-crawls.
    # seen_ttl_iterations is the deterministic loop unit (mirrored by the
    # oracle); seen_ttl_seconds applies wall-clock prune_expired on read.
    # Exact seen set only — Bloom bits can't expire (the reference pairs
    # BloomFilter xor ExpireFilter the same way, dedup/__init__.py).
    seen_ttl_iterations: int | None = None
    seen_ttl_seconds: int | None = None
    # P13: deterministic user-agent rotation column on the fetch batch
    user_agent_rotation: bool = False
    # URL-seen set implementation: "exact" (fingerprint table, anti-join) or
    # "bloom" (bucketed scalable-Bloom blobs — the 10^10-frontier scale path;
    # only touched buckets move per iteration, memory ~3 bytes/URL at P=1e-5)
    seen_set: str = "exact"
    bloom_buckets: int = 64
    bloom_capacity_per_bucket: int = 1_000_000
    bloom_error_rate: float = 1e-5
    # driver-side blob-partition pruning engages above this partition count
    # (below it, scanning the whole small table beats an extra driver job)
    bloom_prune_read_min_partitions: int = 256
    # item-fingerprint bucketing: items append hive-partitioned by
    # pmod(xxhash64(item_fp), items_buckets) so the per-iteration dedup
    # anti-join reads ONLY the batch's buckets (the reference's item dedup is
    # an O(batch) Redis check, item_buffer.py:180-217 — this matches its
    # I/O bound at 10^10 items).  At scale size buckets so one bucket's
    # fingerprint column ~ a few hundred MB (10^10 items → ~4096 buckets).
    items_buckets: int = 64
    # pruned read engages above this many leaf partition dirs (below it the
    # whole-table scan beats the extra driver job computing touched buckets)
    items_prune_min_leaf_parts: int = 64
    # S8/J4: reuse previously-fetched 200 responses from the fetch_cache
    # table (request.py:498-532 response-cache semantics, TTL = table prune)
    use_fetch_cache: bool = False
    # north-star politeness: fetch+cache robots.txt per host, drop disallowed
    # candidates, derive per-iteration budgets from Crawl-delay
    respect_robots: bool = False
    robots_window_seconds: float = 10.0
    # token-bucket rate limiting (north rule): {"rate": r, "burst": b,
    # "hosts": {host: rate}} — hosts accrue r tokens/iteration up to b,
    # each leased fetch spends one, unused tokens carry over
    token_bucket: dict | None = None
    # F4: user validate hook (url, html) -> bool; False ⇒ abandon (no retry),
    # raise ⇒ retry (base_parser.py:43-57).  Must be picklable.
    validate: object = None
    # user parse hook (url_canon, html) -> (spans, links, title); defaults to
    # the reference-ordered pipeline (html.parse_document) — the parser
    # subclass contract of the reference (base_parser.py:21-123)
    parse_fn: object = None
    # multi-parser dispatch (parser_control.py:85-86, add_parser):
    # {parser_name: {"parse_fn": fn, "validate": fn, "callbacks": {...}}};
    # each request routes to the parser matching its parser_name column,
    # falling back to parse_fn/validate above.  Links emitted as
    # (url, parser_name) pairs route explicitly; bare links inherit the
    # emitting row's parser; (url, parser_or_None, callback) triples add a
    # per-request callback name.
    parsers: dict | None = None
    # per-request callback table for the default parser (request.py:248-252
    # serializes a callback NAME; parser_control.py:562-570 dispatches it) —
    # {callback_name: fn}; rows with a callback column parse with that fn
    callbacks: dict | None = None
    # failure hooks (base_parser.py:71-95): exception_request(req_dict) runs
    # on every non-200 row BEFORE retry routing and may return a replacement
    # dict (url/priority/parser_name/payload), False to abandon, or None to
    # keep the request unchanged; failed_request(req_dict) observes each
    # terminal failure and may return a replacement dict for the failed park.
    exception_request: object = None
    failed_request: object = None
    # pre-fetch request transform (download_midware, base_parser.py:32-41):
    # fn(req_dict) -> dict overriding url/method/data for the outgoing fetch;
    # request identity (fingerprint/url_canon) is unchanged, as in the
    # reference (the original request is what retries and parks)
    download_midware: object = None
    # explicit hot-domain salting: split one host over up to N executors
    host_salt_splits: int = 1
    # lifecycle callbacks (scheduler.py:460-501 spider_start/spider_end +
    # Spider begin_callback/end_callback): on_start fires at each run()
    # entry; on_end fires ONCE per crawl completion — when the loop observes
    # the frontier drained (a max_iterations cut does NOT end the crawl; the
    # resumed run that drains it fires the hook).  Driver-side, no pickling.
    on_start: object = None
    on_end: object = None


@dataclass
class IterationStats:
    iteration: int
    leased: int
    fetched_ok: int
    links_new: int
    links_dup: int
    retried: int
    failed: int
    links_dropped: int = 0  # robots-disallowed candidates (not dups)


class CrawlEngine:
    def __init__(self, spark: SparkSession, warehouse: str, resolver, config: CrawlConfig | None = None):
        self.spark = spark
        self.store = SnapshotStore(spark, warehouse)
        self.resolver = resolver
        self.cfg = config or CrawlConfig()
        self.iteration = 0
        self.next_seq = 0
        self.frontier_size = 0  # maintained from known per-iteration deltas
        self.tombstone_rows = 0  # delta-log size; compaction resets it
        self._obs_fallbacks = 0  # diagnostics: links_new Observation misses
        self._budgets = (
            FR.budgets_df(spark, self.cfg.politeness) if self.cfg.politeness else None
        )
        self._default_budget = (
            (self.cfg.politeness or {}).get("__default__", 1_000_000_000)
        )
        tb = self.cfg.token_bucket
        self._buckets = (
            TokenBuckets(tb["rate"], tb["burst"], tb.get("hosts")) if tb else None
        )
        if self.cfg.seen_set == "bloom" and (
            self.cfg.seen_ttl_iterations is not None or self.cfg.seen_ttl_seconds is not None
        ):
            # the reference offers BloomFilter XOR ExpireFilter for the same
            # reason: bloom bits cannot expire (dedup/__init__.py)
            raise ValueError("seen-set TTL requires seen_set='exact' (Bloom bits cannot expire)")
        self._bloom = (
            BloomSeenSet(
                num_buckets=self.cfg.bloom_buckets,
                capacity_per_bucket=self.cfg.bloom_capacity_per_bucket,
                error_rate=self.cfg.bloom_error_rate,
            )
            if self.cfg.seen_set == "bloom"
            else None
        )

    # -- setup ---------------------------------------------------------------
    def t(self, name: str):
        return self.store.table(name)

    def _sized(self, df, n_rows: int, rows_per_file: int = 100_000):
        """Right-size write parallelism from a known row count: tiny frames
        become 1 task instead of <shuffle.partitions> empty files, big
        frames keep full parallelism (same rule a production writer uses
        to hit healthy parquet file sizes)."""
        target = max(1, min(self.spark.sparkContext.defaultParallelism, n_rows // rows_per_file + 1))
        return df.coalesce(target)

    def _init_tables(self):
        ddls = {
            "frontier": FR.FRONTIER_DDL,
            "frontier_tombs": TOMBS_DDL,
            "seen": SEEN_DDL,
            "docs": DOCS_DDL,
            "items": ITEMS_DDL,
            "failed": FAILED_DDL,
            "crawl_order": ORDER_DDL,
            "metrics": METRICS_DDL,
            "metrics_partitions": PART_METRICS_DDL,
            "seen_set": BloomSeenSet.BLOBS_SCHEMA,
            "fetch_cache": FETCH_CACHE_DDL,
            "robots": RB.ROBOTS_DDL,
            "token_buckets": BUCKETS_DDL,
        }
        for name, ddl in ddls.items():
            if not self.t(name).exists():
                self.t(name).create_empty(ddl)

    def seed(self, seeds: list[dict]) -> bool:
        """Seed the frontier; skipped when a frontier already exists
        (resume semantics, scheduler.py:197-201).  Returns True if seeded."""
        self._init_tables()
        if self._read_frontier().limit(1).count() > 0:
            return False
        # seeding onto a drained frontier: truncate the delta log so stale
        # tombstones (whose row-version keys restart with a fresh engine's
        # iteration counter) can never shadow the new seed rows
        if self.t("frontier_tombs").read().limit(1).count() > 0:
            self.t("frontier").commit(
                self.spark.createDataFrame([], FR.FRONTIER_DDL), mode="overwrite"
            )
            self.t("frontier_tombs").commit(
                self.spark.createDataFrame([], TOMBS_DDL), mode="overwrite"
            )
            self.tombstone_rows = 0
        rows = []
        for s in seeds:
            data = s.get("data")
            # body args fold into the fingerprint (request.py:465-480); the
            # str(dict) hash needs the user's insertion order, so it is
            # computed here (seed lists are driver-side already), not in JVM
            fp_pre = request_fingerprint(s["url"], data=data) if data else None
            rows.append(
                (
                    s["url"], int(s.get("priority", S.DEFAULT_PRIORITY)),
                    s.get("parser_name", self.cfg.default_parser),
                    s.get("method"), data, fp_pre, s.get("callback"),
                    bool(s.get("auto_request", True)),
                )
            )
        df = self.spark.createDataFrame(
            rows,
            "url STRING, priority INT, parser_name STRING, method STRING, "
            "payload MAP<STRING, STRING>, fp_pre STRING, callback STRING, "
            "auto_request BOOLEAN",
        )
        cands = (
            df.withColumn("url_canon", canonicalize_udf("url"))
            .withColumn("fingerprint", F.coalesce(F.col("fp_pre"), F.md5("url_canon")))
            .drop("fp_pre")
            .withColumn("host", F.lower(F.coalesce(F.parse_url("url_canon", F.lit("HOST")), F.lit(""))))
            .withColumn("retry_times", F.lit(0))
            .withColumn("added_iteration", F.lit(self.iteration))
        )
        if self.cfg.respect_robots:
            cands = self._apply_robots(cands)
        # the frontier is empty here (checked above), so stale_tombs is empty
        new_rows, seen_commit, _obs, _stale = self._claim_new(cands)
        n_seeded = new_rows.count()
        self.frontier_size = n_seeded
        self.t("frontier").commit(self._sized(new_rows, n_seeded), mode="append")
        seen_commit(n_seeded, self.iteration)
        if self._bloom is not None:
            self._bloom.release()
        self.store.checkpoint(self._label(), TABLES)
        new_rows.unpersist()
        return True

    @staticmethod
    def _frontier_cols():
        return [
            "fingerprint", "url", "url_canon", "host", "priority", "retry_times",
            "parser_name", "status", "added_iteration", "method", "payload",
            "callback", "auto_request",
        ]

    def _label(self, **extra) -> dict:
        label = {
            "iteration": self.iteration,
            "next_seq": self.next_seq,
            "frontier_size": self.frontier_size,
            "tombstone_rows": self.tombstone_rows,
        }
        label.update(extra)
        return label

    def frontier(self) -> DataFrame:
        """Public accessor for the visible frontier."""
        return self._read_frontier()

    def add_requests(self, seeds: list[dict]) -> int:
        """Mid-crawl request injection (S6 — the reference Spider's standing
        seed-table pull / TaskSpider distribute_task, spider.py start-request
        loop): claim-on-enqueue dedup against the live seen set, append the
        survivors to the frontier, checkpoint.  Returns requests added."""
        self._init_tables()
        rows = []
        for s in seeds:
            data = s.get("data")
            fp_pre = request_fingerprint(s["url"], data=data) if data else None
            rows.append(
                (
                    s["url"], int(s.get("priority", S.DEFAULT_PRIORITY)),
                    s.get("parser_name", self.cfg.default_parser),
                    s.get("method"), data, fp_pre, s.get("callback"),
                    bool(s.get("auto_request", True)),
                )
            )
        df = self.spark.createDataFrame(
            rows,
            "url STRING, priority INT, parser_name STRING, method STRING, "
            "payload MAP<STRING, STRING>, fp_pre STRING, callback STRING, "
            "auto_request BOOLEAN",
        )
        cands = (
            df.withColumn("url_canon", canonicalize_udf("url"))
            .withColumn("fingerprint", F.coalesce(F.col("fp_pre"), F.md5("url_canon")))
            .drop("fp_pre")
            .withColumn("host", F.lower(F.coalesce(F.parse_url("url_canon", F.lit("HOST")), F.lit(""))))
            .withColumn("retry_times", F.lit(0))
            .withColumn("added_iteration", F.lit(self.iteration))
        )
        if self.cfg.respect_robots:
            cands = self._apply_robots(cands)
        new_rows, seen_commit, _obs, stale = self._claim_new(cands)
        n_new = new_rows.count()
        n_stale = 0
        if n_new:
            if stale is not None:
                # TTL re-claims replace their stale visible rows (oracle's
                # dict-keyed frontier): tombstone BEFORE appending
                stale = stale.persist()
                n_stale = stale.count()
                if n_stale:
                    self.t("frontier_tombs").commit(stale, mode="append")
                    self.tombstone_rows += n_stale
                stale.unpersist()
            self.t("frontier").commit(self._sized(new_rows, n_new), mode="append")
        seen_commit(n_new, self.iteration)  # no-op write at 0; releases caches
        if self._bloom is not None:
            self._bloom.release()
        self.frontier_size += n_new - n_stale
        self.store.checkpoint(self._label(added_requests=n_new), TABLES)
        new_rows.unpersist()
        return n_new

    def _read_frontier(self) -> DataFrame:
        """Visible frontier = adds ⟕anti tombstones on the row-version key.
        On Iceberg both sides bucket by fingerprint, making this a
        storage-partitioned join (no shuffle); here it is a plain anti-join
        whose shuffle is bounded by the delta-log size between compactions."""
        adds = self.t("frontier").read()
        tombs = self.t("frontier_tombs").read()
        return adds.join(
            tombs, on=["fingerprint", "retry_times", "added_iteration"], how="left_anti"
        )

    def _apply_robots(self, cands):
        """Fetch robots.txt for not-yet-cached hosts (commit to the robots
        table), then drop disallowed candidates (crawl/robots.py)."""
        robots_t = self.t("robots")
        missing = cands.select("host").distinct().join(
            robots_t.read().select("host"), on="host", how="left_anti"
        )
        fetched = RB.fetch_robots(self.spark, missing, self.resolver, self.iteration).persist()
        n_miss = fetched.count()
        if n_miss:
            robots_t.commit(self._sized(fetched, n_miss), mode="append")
        fetched.unpersist()
        return RB.filter_allowed(cands, robots_t.read())

    def _iteration_budgets(self):
        """Per-iteration host budgets: robots crawl-delay budgets when
        enabled, else the static politeness dimension."""
        if self.cfg.respect_robots:
            dyn = RB.budgets_from_robots(self.t("robots").read(), self.cfg.robots_window_seconds)
            # full-outer min so the static __default__ still caps hosts that
            # only the robots dimension names (frontier.merge_budgets)
            return FR.merge_budgets(self._budgets, self._default_budget, dyn)
        return self._budgets

    def _claim_new(self, cands):
        """Claim-on-enqueue dedup, exact or Bloom path.

        Returns (new_rows_df_persisted, seen_commit_fn, observation,
        stale_tombs) — the commit fn is run with the iteration's other table
        commits; the Observation carries count(new_rows) as a free by-product
        of whichever commit job materializes the frame FIRST (no dedicated
        count() job — one less fixed-cost Spark job per iteration).  Exact
        path: anti-join vs the fingerprint table (J1).  Bloom path: cogrouped
        check+add over the bucketed blobs (only touched buckets move).

        ``stale_tombs`` (TTL mode only, else None): with an expiring seen set
        a fingerprint can be RE-claimed while its original frontier row is
        still visible (politeness-starved, never leased) — the oracle's
        dict-keyed frontier REPLACES that row on re-claim, so the engine
        tombstones the stale visible version before appending the new one
        (otherwise the URL fetches twice and crawl_order diverges).
        """
        obs = Observation()
        if self._bloom is None:
            seen_df = self.t("seen").read()
            if self.cfg.seen_ttl_iterations is not None:
                # ExpireFilter-on-read: expired claims no longer dedup, so
                # the URL re-crawls; rows stay (newest added_iteration wins
                # through the filter) — expirefilter.py:71-75 as a predicate
                seen_df = seen_df.filter(
                    F.col("added_iteration") > self.iteration - self.cfg.seen_ttl_iterations
                )
            if self.cfg.seen_ttl_seconds is not None:
                seen_df = prune_expired(seen_df, self.cfg.seen_ttl_seconds)
            new_rows = (
                dedup_new(cands, seen_df, order_cols=("priority", "url"))
                .withColumn("status", F.lit(S.STATUS_TODO))
                .select(*self._frontier_cols())
                .observe(obs, F.count(F.lit(1)).alias("n_new"))
                .persist()
            )
            stale_tombs = None
            if (
                self.cfg.seen_ttl_iterations is not None
                or self.cfg.seen_ttl_seconds is not None
            ):
                # visible rows shadowed by a TTL re-claim; the read paths are
                # pinned to the pre-iteration snapshot (manifest resolved at
                # DataFrame construction), so this composes with the
                # concurrent commits safely.  TTL is an exact-set-only mode,
                # so the extra frontier read rides the iteration only when
                # the user opted into expiry.
                stale_tombs = self._read_frontier().select(
                    "fingerprint", "retry_times", "added_iteration"
                ).join(new_rows.select("fingerprint"), on="fingerprint", how="left_semi")

            def commit_fn(n_bound, iteration):
                # n_bound is an upper bound (candidate link count) used only
                # to size write parallelism; the exact count arrives via obs
                if n_bound == 0:
                    return
                self.t("seen").commit(
                    self._sized(
                        new_rows.select("fingerprint")
                        .withColumn("added_iteration", F.lit(iteration))
                        .withColumn("added_at", F.current_timestamp()),
                        n_bound,
                    ),
                    mode="append",
                )

            return new_rows, commit_fn, obs, stale_tombs

        firsts = dedup_first(cands, order_cols=("priority", "url")).persist()
        # driver-side partition pruning: collect the candidates' bucket ids
        # (≤ num_buckets tiny ints) and read ONLY those blob partitions — the
        # untouched ~15 MB blobs are never opened, in Python or the JVM.
        # Worth one extra driver job only when the table has enough
        # partitions to prune (same logic as a broadcast threshold): a small
        # blob table is cheaper to scan whole and let check_and_add's
        # semi-join prune in-JVM.
        n_parts = len(self.t("seen_set").manifest().partitions or {})
        if n_parts > self.cfg.bloom_prune_read_min_partitions:
            touched_keys = [
                r[0]
                for r in firsts.select(self._bloom.bucket_col("fingerprint").alias("bucket"))
                .distinct()
                .collect()
            ]
            blobs = self.t("seen_set").read_partitions(touched_keys)
        else:
            blobs = self.t("seen_set").read()
        results, _, touched = self._bloom.check_and_add(firsts.select("fingerprint"), blobs)
        new_rows = (
            firsts.join(results.filter(F.col("is_new") == 1).select("fingerprint"), on="fingerprint")
            .withColumn("status", F.lit(S.STATUS_TODO))
            .select(*self._frontier_cols())
            .observe(obs, F.count(F.lit(1)).alias("n_new"))
            .persist()
        )

        def commit_fn(n_bound, iteration):
            # dynamic partition overwrite: only touched buckets move
            # (membership bits advanced even for dup-only buckets)
            if n_bound > 0:
                self.t("seen_set").commit_partitions(touched, "bucket")
            firsts.unpersist()

        return new_rows, commit_fn, obs, None

    def _item_bucket_col(self) -> F.Column:
        """Placement bucket for the items table — a pure function of item_fp,
        recomputed identically by writers and the pruned-read side."""
        return F.pmod(F.xxhash64("item_fp"), F.lit(self.cfg.items_buckets)).cast("int")

    def _items_seen_side(self, item_rows: DataFrame) -> DataFrame:
        """Right side of the items-dedup anti-join.  Above the leaf-dir
        threshold: collect the batch's bucket ids (≤items_buckets tiny ints,
        over the already-persisted fetched frame) and read only those buckets'
        dirs — per-iteration items I/O ∝ batch buckets, never O(table).
        Below it the whole (small) table is cheaper than the extra job."""
        items_t = self.t("items")
        if items_t.leaf_partition_count() > self.cfg.items_prune_min_leaf_parts:
            touched = [
                r[0]
                for r in item_rows.select(self._item_bucket_col().alias("b"))
                .distinct()
                .collect()
            ]
            return items_t.read_partition_subset(touched).select("item_fp")
        return items_t.read().select("item_fp")

    # -- the loop -------------------------------------------------------------
    def run(self, max_iterations: int | None = None) -> list[IterationStats]:
        if self.cfg.on_start is not None:
            self.cfg.on_start()
        stats = []
        drained = False
        while max_iterations is None or len(stats) < max_iterations:
            st = self._iterate()
            if st is None:
                drained = True
                break
            stats.append(st)
        self.flush_metrics()
        if drained and self.cfg.on_end is not None:
            # crawl completion (scheduler.py:460-501): fires only when the
            # frontier actually drained, so an interrupted run defers the
            # end hook to the resumed run that finishes the crawl
            self.cfg.on_end()
        return stats

    def resume(self) -> dict | None:
        """Roll state back to the last complete checkpoint and restore the
        loop counters; then call run()."""
        ckpt = self.store.restore_last_checkpoint()
        if ckpt:
            self.iteration = ckpt["label"]["iteration"]
            self.next_seq = ckpt["label"]["next_seq"]
            self.frontier_size = ckpt["label"].get("frontier_size", 0)
            self.tombstone_rows = ckpt["label"].get("tombstone_rows", 0)
        return ckpt

    def _iterate(self) -> IterationStats | None:
        _t0 = _time.time()
        cfg = self.cfg
        due = self._read_frontier().filter(F.col("status") == S.STATUS_TODO)
        budgets = self._iteration_budgets()
        accrued = None
        if self._buckets is not None:
            state = self.t("token_buckets").read()
            accrued = self._buckets.accrue(
                self.spark, state, due.select("host"), self.iteration
            ).persist()
            tb_budgets = TokenBuckets.budgets(accrued)
            # min(coalesce(static, default), token_budget) per host — a plain
            # union+min would let every token-bucket row bypass the static
            # __default__ cap (oracle.py:100-106 takes the min with default)
            budgets = FR.merge_budgets(budgets, self._default_budget, tb_budgets)
        # the global lease-seq window (bounded, single-partition over ≤k rows)
        # is NOT applied here: only the crawl_order audit commit needs seq, so
        # it runs inside that commit's thread, off the iteration critical path
        if budgets is None and 0 < self.frontier_size <= cfg.batch_size:
            # whole-frontier lease (drain phases; production mega-batches):
            # |due| <= k and no politeness gate, so the global top-k is the
            # identity on the leased SET — skip the sort+GlobalLimit funnel
            # that would drag every row through ONE task before the fetch
            # stage repartitions (the crawl_order audit still derives seq
            # from its own sort, so lease semantics are unchanged)
            batch = due.persist()
        else:
            batch = FR.take_batch(due, cfg.batch_size, budgets, self._default_budget).persist()

        # fused fetch+parse: one python eval per task (fetcher.py rationale)
        # host-grouped partitioning only matters when per-host rate limits
        # exist; otherwise round-robin balances perfectly (no host-hash skew)
        fetch_input = batch
        if cfg.user_agent_rotation:
            # P13: deterministic UA column (hash-rotated, JVM-side) rides the
            # batch into the fetch stage for a real HTTP pool to consume
            fetch_input = with_user_agent(fetch_input)
        if cfg.use_fetch_cache:
            cache = self.t("fetch_cache").read().select(
                "fingerprint",
                F.col("status_code").alias("cached_status"),
                F.col("content").alias("cached_content"),
            )
            fetch_input = fetch_input.join(cache, on="fingerprint", how="left")
        fetched = fetch_parse_batch(
            fetch_input,
            self.resolver,
            by_host=cfg.politeness is not None or cfg.respect_robots or self._buckets is not None,
            use_cache=cfg.use_fetch_cache,
            validate=cfg.validate,
            host_salt_splits=cfg.host_salt_splits,
            parse_fn=cfg.parse_fn,
            parsers=cfg.parsers,
            callbacks=cfg.callbacks,
            download_midware=cfg.download_midware,
        ).persist()
        parsed = fetched.filter(F.col("status_code") == 200)

        # ONE aggregation job covers lease count + fetch outcome + retry
        # routing + link counts — it is also the action that materializes the
        # persisted batch and fetched frames (no separate batch.count() job)
        # (must mirror frontier.route_failures exactly: abandoned ⇒ failed)
        retry_ok = F.col("retry_times") + 1 <= cfg.max_retries
        not_ok = F.col("status_code") != 200
        abandoned = F.col("status_code") == S.CODE_ABANDONED
        frow = fetched.agg(
            # leased counts batch rows only — request_sync rows are executed
            # inline (never queued), so they appear in fetched but are not
            # leases (no tombstone, no crawl_order seq)
            F.sum((~F.col("inline_sync")).cast("long")).alias("leased"),
            F.sum((~not_ok).cast("long")).alias("ok"),
            F.sum((not_ok & retry_ok & ~abandoned).cast("long")).alias("retried"),
            F.sum((not_ok & (~retry_ok | abandoned)).cast("long")).alias("failed"),
            F.sum(
                F.coalesce(F.size(F.from_json("links_json", FUSED_LINKS_DDL)), F.lit(0)).cast("long")
            ).alias("links_total"),
            *(
                [F.sum(F.col("content").isNotNull().cast("long")).alias("cache_new")]
                if cfg.use_fetch_cache
                else []
            ),
        ).first()
        _t_agg = _time.time()
        leased = int(frow["leased"] or 0)
        if leased == 0:
            batch.unpersist()
            fetched.unpersist()
            if accrued is not None:
                accrued.unpersist()
            if (
                self._buckets is not None
                and self._buckets.rate > 0
                and self.frontier_size > 0
            ):
                # idle-accrual tick: due rows exist but every host is out of
                # tokens — advance the iteration so buckets refill (the
                # reference's collector just sleeps, collector.py:57-61).
                # Bucket state is NOT committed, so elapsed-iterations accrual
                # covers the idle gap (politeness.TokenBuckets.accrue).
                st = IterationStats(self.iteration, 0, 0, 0, 0, 0, 0)
                self.iteration += 1
                self.store.checkpoint(self._label(stats=st.__dict__), TABLES)
                return st
            return None
        fetched_ok = int(frow["ok"] or 0)
        retried_n = int(frow["retried"] or 0)
        failed_n = int(frow["failed"] or 0)
        links_total = int(frow["links_total"] or 0)

        # --- discovered links → claim-on-enqueue dedup ---
        cands = (
            link_candidates_fused(parsed)
            .withColumn("priority", F.lit(cfg.link_priority))
            .withColumn("retry_times", F.lit(0))
            .withColumn("parser_name", F.coalesce(F.col("parser_name"), F.lit(cfg.default_parser)))
            .withColumn("added_iteration", F.lit(self.iteration))
            .withColumn("method", F.lit(None).cast("string"))
            .withColumn("payload", F.lit(None).cast("map<string,string>"))
            .withColumn("auto_request", F.coalesce(F.col("auto_request"), F.lit(True)))
        )
        kept_obs = None
        if links_total > 0:
            if cfg.respect_robots:
                # count the robots survivors as a free by-product of the same
                # commit job, so robots-dropped links stop inflating links_dup
                kept_obs = Observation()
                cands = self._apply_robots(cands).observe(
                    kept_obs, F.count(F.lit(1)).alias("n_kept")
                )
            new_rows, seen_commit, links_obs, stale = self._claim_new(cands)
        else:
            # zero candidate links: skip the dedup machinery entirely — no
            # seen read, no Bloom blobs read/cogroup, no seen commit (the
            # bloom path's fixed per-iteration Arrow cost drops to nothing
            # on link-less iterations)
            new_rows = self.spark.createDataFrame([], FR.FRONTIER_DDL).persist()
            seen_commit = lambda n_bound, iteration: None  # noqa: E731
            links_obs, stale = None, None
        # links_new is NOT counted here — it arrives via the Observation as a
        # by-product of the commit job that materializes new_rows (one fewer
        # driver job per iteration); until then use links_total as the bound
        n_stale = 0
        if stale is not None and links_total > 0:
            # TTL mode only: count+persist the stale visible rows a re-claim
            # shadows (bounded by the re-claimed links, usually ~0)
            stale = stale.persist()
            n_stale = stale.count()
            if n_stale == 0:
                stale.unpersist()

        # --- retry / failed routing ---
        failures = fetched.filter(not_ok)
        fail_src = failures.select(*self._frontier_cols(), "status_code")
        routed_persisted = False
        if cfg.exception_request is not None or cfg.failed_request is not None:
            # user hooks may transform requests or flip routing, so the
            # route counts come from the routed frame, not the fetch agg
            routed = route_failures_hooked(
                fail_src, cfg.max_retries, cfg.exception_request, cfg.failed_request
            ).persist()
            routed_persisted = True
            counts = {r["route"]: r["n"] for r in routed.groupBy("route").agg(F.count(F.lit(1)).alias("n")).collect()}
            retried_n = int(counts.get(S.STATUS_TODO, 0))
            failed_n = int(counts.get(S.STATUS_FAILED, 0))
        else:
            routed = FR.route_failures(fail_src, cfg.max_retries)
        retries = routed.filter(F.col("route") == S.STATUS_TODO).select(*self._frontier_cols())
        failed_new = routed.filter(F.col("route") == S.STATUS_FAILED).select(
            "fingerprint", "url", "url_canon", "host", "priority", "parser_name",
            "retry_times", "status_code", "method", "payload", "callback",
            "auto_request",
        )

        # --- items (export-then-commit-fingerprint, item_buffer.py:351-358) ---
        item_rows = parsed.select(
            F.col("fingerprint").alias("doc_id"),
            F.col("url_canon").alias("url"),
            "title",
            "n_spans",
        ).withColumn("item_fp", item_fp_col())
        # bucket-pruned dedup: the anti-join's right side reads ONLY the
        # batch's item_fp buckets (and only the item_fp column — parquet
        # projection pruning), so per-iteration read bytes track the batch,
        # not the accumulated items table
        items_new = item_rows.join(
            self._items_seen_side(item_rows), on="item_fp", how="left_anti"
        ).select("item_fp", "doc_id", "url", "title", "n_spans")

        # --- per-partition lineage metrics ---
        part_metrics = (
            fetched.groupBy(F.col("stage_partition").alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .withColumn("stage", F.lit("fetch_parse"))
            .withColumn("iteration", F.lit(self.iteration))
            .select("iteration", "stage", "partition_id", "rows")
        )

        # --- commits; the CHECKPOINT (not commit order) is the atomicity
        # gate — restore rolls every table back to the last complete
        # checkpoint, so the independent table commits run concurrently
        # (Spark schedules jobs from multiple driver threads in parallel);
        # empty frames skip their commit entirely.
        # frontier delta: append the new/retry rows and tombstone the leased
        # row versions — O(batch) write bytes, never an O(frontier) rewrite
        additions = retries.unionByName(new_rows)
        tombstones = batch.select("fingerprint", "retry_times", "added_iteration")
        if n_stale:
            tombstones = tombstones.unionByName(stale)
        self.tombstone_rows += leased + n_stale

        # links_new > 0 requires candidates, i.e. links_total > 0; the
        # additions commit is the job that materializes new_rows and fires
        # the links Observation
        may_have_new = links_total > 0
        commits = [lambda: seen_commit(links_total, self.iteration)]
        if retried_n > 0 or may_have_new:
            commits.append(
                lambda: self.t("frontier").commit(
                    self._sized(additions, retried_n + links_total), mode="append"
                )
            )
        commits.append(
            lambda: self.t("frontier_tombs").commit(
                self._sized(tombstones, leased + n_stale), mode="append"
            )
        )
        if fetched_ok > 0:
            commits.append(
                # span docs are wide (~10 KB/row): size for ~200 MB files,
                # not the 100k-rows default meant for slim rows
                lambda: self.t("docs").commit(
                    self._sized(docs_from_fused(parsed), fetched_ok, rows_per_file=20_000),
                    mode="append",
                )
            )
            commits.append(
                # bucket-aligned placement: shuffle_to colocates each ib
                # bucket's rows so the hive write emits ~1 file per bucket,
                # not input-partitions x buckets
                lambda: self.t("items").commit_append_partitioned(
                    items_new.withColumn("ib", self._item_bucket_col()),
                    "ib",
                    shuffle_to=max(1, min(self.spark.sparkContext.defaultParallelism,
                                          fetched_ok // 100_000 + 1)),
                )
            )
        if failed_n > 0:
            commits.append(
                lambda: self.t("failed").commit(self._sized(failed_new, failed_n), mode="append")
            )
        commits.append(
            # the global lease-seq window runs here, inside the commit thread
            # (bounded by k; concurrent with the big docs/frontier writes)
            lambda: self.t("crawl_order").commit(
                self._sized(
                    FR.with_lease_seq(batch, self.next_seq).select(
                        "seq", F.lit(self.iteration).alias("iteration"), "fingerprint"
                    ),
                    leased,
                ),
                mode="append",
            )
        )
        commits.append(lambda: self.t("metrics_partitions").commit(self._sized(part_metrics, 64), mode="append"))
        if accrued is not None:
            leased_ph = batch.groupBy("host").agg(F.count("*").alias("n_leased"))
            new_state = self._buckets.spend(accrued, leased_ph)
            commits.append(
                lambda: self.t("token_buckets").commit(self._sized(new_state, 10_000), mode="overwrite")
            )
        if cfg.use_fetch_cache and int(frow["cache_new"] or 0) > 0:
            cache_rows = fetched.filter(F.col("content").isNotNull()).select(
                "fingerprint", "status_code", "content"
            )
            commits.append(
                lambda: self.t("fetch_cache").commit(
                    self._sized(cache_rows, int(frow["cache_new"])), mode="append"
                )
            )
        _t_pre = _time.time()
        with ThreadPoolExecutor(max_workers=len(commits)) as pool:
            for fut in [pool.submit(c) for c in commits]:
                fut.result()  # propagate any commit failure before checkpointing
        _t_commits = _time.time()
        if self._bloom is not None:
            self._bloom.release()
        # the Observation fired inside whichever commit materialized new_rows
        # (the seen commit consumes it when candidates existed); with zero
        # candidate links, links_new is definitionally zero.  When a cache
        # race swallows the metrics (both consumers read an InMemoryScan and
        # neither query surfaces the inner CollectMetrics), fall back to a
        # count over the now-hot cache — correctness never depends on obs.
        links_new = 0
        links_dropped = 0
        if may_have_new:
            try:
                links_new = int(links_obs.get["n_new"])
            except Exception:
                self._obs_fallbacks += 1
                links_new = new_rows.count()
            if kept_obs is not None:
                try:
                    links_dropped = links_total - int(kept_obs.get["n_kept"])
                except Exception:
                    self._obs_fallbacks += 1
        self.frontier_size = self.frontier_size - leased + retried_n + links_new - n_stale
        st = IterationStats(
            iteration=self.iteration,
            leased=leased,
            fetched_ok=fetched_ok,
            links_new=links_new,
            links_dup=links_total - links_dropped - links_new,
            retried=retried_n,
            failed=failed_n,
            links_dropped=links_dropped,
        )
        self.iteration += 1
        self.next_seq += leased
        # iteration summary travels in the checkpoint label (no Spark job);
        # the metrics table is materialized from the labels at end of run()
        self.store.checkpoint(self._label(stats=st.__dict__), TABLES)
        if _TRACE:
            _t_end = _time.time()
            print(
                f"TRACE iter={st.iteration} agg={_t_agg - _t0:.2f} "
                f"route+plan={_t_pre - _t_agg:.2f} commits={_t_commits - _t_pre:.2f} "
                f"obs+ckpt={_t_end - _t_commits:.2f} total={_t_end - _t0:.2f}",
                flush=True,
            )

        for df in (batch, fetched, new_rows):
            df.unpersist()
        if n_stale:
            stale.unpersist()
        if routed_persisted:
            routed.unpersist()
        if accrued is not None:
            accrued.unpersist()
        if self.tombstone_rows >= max(self.cfg.compact_min_tombstones, self.frontier_size):
            self.compact_frontier()
        return st

    def expire_snapshots(self, keep_checkpoints: int = 2) -> dict:
        """Storage GC (Iceberg expire_snapshots parity): drop table versions
        and data segments outside the resume window — see
        SnapshotStore.expire_snapshots.  Run between iterations (maintenance,
        like compact_frontier)."""
        return self.store.expire_snapshots(keep_checkpoints=keep_checkpoints)

    def compact_frontier(self) -> None:
        """Fold the tombstone delta log back into the adds table: adds :=
        visible, tombstones := ∅.  The visible set is unchanged (pure
        maintenance, like Iceberg rewrite_data_files), so crawl semantics
        are unaffected; runs when tombstones outgrow the visible frontier."""
        visible = self._read_frontier()
        self.t("frontier").commit(self._sized(visible, self.frontier_size), mode="overwrite")
        self.t("frontier_tombs").commit(
            self.spark.createDataFrame([], TOMBS_DDL), mode="overwrite"
        )
        self.tombstone_rows = 0
        self.store.checkpoint(self._label(compacted=True), TABLES)

    def health_check(self, failed_threshold: int = 1000, min_success_rate: float = 0.5) -> list[str]:
        """Stall/alarm monitors (scheduler.py:321-405): too many failures,
        low success rate, frozen frontier.  Driver-side over the checkpoint
        labels — no Spark job."""
        alarms = []
        stats = [c["label"]["stats"] for c in self.store.list_checkpoints() if c["label"].get("stats")]
        if not stats:
            return alarms
        total_failed = sum(s["failed"] for s in stats)
        if total_failed > failed_threshold:
            alarms.append(f"failed_count {total_failed} > {failed_threshold}")
        leased = sum(s["leased"] for s in stats)
        ok = sum(s["fetched_ok"] for s in stats)
        if leased and ok / leased < min_success_rate:
            alarms.append(f"success_rate {ok / leased:.2f} < {min_success_rate}")
        # frozen-frontier window: only iterations that actually leased count —
        # token-bucket idle-accrual ticks (leased=0 while hosts refill) are
        # legitimate rate-limit waits, not stalls
        active = [s for s in stats if s["leased"] > 0]
        if len(active) >= 3 and all(
            s["fetched_ok"] == 0 and s["links_new"] == 0 for s in active[-3:]
        ):
            alarms.append("frontier frozen: 3 iterations with no progress")
        return alarms

    def reload_failed(self) -> int:
        """Re-enqueue every parked failed request with retry_times reset to
        0, skipping dedup (they are already claimed in the seen set) —
        HandleFailedRequests.reput semantics (core/handle_failed_requests.py:
        29-54; retries bypass the dedup filter, parser_control.py:347).
        Clears the failed table.  Returns the number re-enqueued."""
        failed = self.t("failed").read().persist()
        n = failed.count()
        if n == 0:
            failed.unpersist()
            return 0
        # restore the original priority / parser routing / canonical form from
        # the parked row (reput of the original request, not a recompute).
        # Terminal failures were tombstoned at lease time, so the revived
        # rows are plain appends — added_iteration = the current iteration
        # keeps the row-version key unique (the original add is in the past).
        revived = (
            failed.withColumn("retry_times", F.lit(0))
            .withColumn("status", F.lit(S.STATUS_TODO))
            .withColumn("added_iteration", F.lit(self.iteration))
            .select(*self._frontier_cols())
        )
        self.frontier_size += n
        self.t("frontier").commit(self._sized(revived, n), mode="append")
        self.t("failed").commit(
            self.spark.createDataFrame([], FAILED_DDL), mode="overwrite"
        )
        self.store.checkpoint(self._label(reloaded_failed=n), TABLES)
        failed.unpersist()
        return n

    def flush_metrics(self) -> None:
        """Materialize the metrics table from the checkpoint labels
        (overwrite — idempotent across resumes and crashes)."""
        rows = []
        for ckpt in self.store.list_checkpoints():
            stx = ckpt["label"].get("stats")
            if stx:
                rows.append(
                    (
                        stx["iteration"], stx["leased"], stx["fetched_ok"], stx["links_new"],
                        stx["links_dup"], stx.get("links_dropped", 0), stx["retried"],
                        stx["failed"],
                    )
                )
        if rows:
            self.t("metrics").commit(self.spark.createDataFrame(rows, METRICS_DDL), mode="overwrite")
