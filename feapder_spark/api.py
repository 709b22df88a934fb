"""User-facing Spider API — the familiar subclass contract of the reference
(core/base_parser.py:21-123: start_requests / parse / validate hooks), bound
to the distributed CrawlEngine.

A feapder user writes::

    class MySpider(feapder.AirSpider):
        def start_requests(self): yield feapder.Request("http://...", priority=100)
        def validate(self, request, response): return response.status_code == 200
        def parse(self, request, response): yield Item(...)

Here the same shape::

    class MySpider(Spider):
        start_urls = [...]                      # or override start_requests()
        def validate(self, url, html): ...      # optional (F4 semantics)
        def parse(self, url_canon, html): ...   # optional; returns
                                                # (spans, links, title); defaults
                                                # to the reference-ordered pipeline

    MySpider().start(spark, warehouse, resolver, batch_size=1000)

Hooks run vectorized inside the fused Arrow stage (no per-row Python in the
plan); they must be picklable, so override them as plain methods (bound
methods of a picklable instance work).
"""

from __future__ import annotations

from feapder_spark.crawl import semantics as S
from feapder_spark.crawl.engine import CrawlConfig, CrawlEngine, IterationStats


class BaseParser:
    """Secondary parser for :meth:`Spider.add_parser` — the reference's
    multi-template surface (core/base_parser.py:21-123 + Spider.add_parser,
    core/scheduler.py add_parser / parser_control.py:85-86 name-dispatch).
    Requests whose ``parser_name`` equals this class's name route here."""

    @property
    def name(self) -> str:
        return type(self).__name__

    def validate(self, url: str, html: str) -> bool:  # noqa: ARG002
        return True

    def parse(self, url_canon: str, html: str):
        from feapder_spark.crawl import html as H

        return H.parse_document(url_canon, html)


def _callbacks_of(obj) -> dict | None:
    """The per-request callback table of a parser instance: every
    ``parse_*`` method by name, plus ``parse`` itself — the reference
    dispatches ``getattr(parser, request.callback)``
    (parser_control.py:562-570); bound methods of a picklable instance ship
    to the executors like every other hook."""
    out = {"parse": obj.parse}
    for n in dir(type(obj)):
        if n.startswith("parse_"):
            m = getattr(obj, n)
            if callable(m):
                out[n] = m
    return out


class Spider:
    """Subclass-and-run facade over CrawlEngine."""

    start_urls: list[str] = []
    batch_size: int = 1000
    max_retries: int = S.MAX_RETRIES
    politeness: dict | None = None
    respect_robots: bool = False
    use_fetch_cache: bool = False
    seen_set: str = "exact"

    def __getstate__(self):
        """Hooks are bound methods, so the spider instance ships to the
        executors — strip the driver-only engine handle (holds the
        SparkSession) before pickling."""
        state = dict(self.__dict__)
        state.pop("engine", None)
        return state

    # -- the reference's hook surface (base_parser.py:21-123) ----------------
    def start_requests(self):
        """Yield seed dicts/urls (S1).  Default: ``start_urls`` at default
        priority."""
        for url in self.start_urls:
            yield url

    def validate(self, url: str, html: str) -> bool:  # noqa: ARG002
        """F4 hook: False ⇒ abandon, raise ⇒ retry.  Default: accept."""
        return True

    def parse(self, url_canon: str, html: str):
        """Parse hook: (spans, links, title).  Default: the
        reference-ordered pipeline (crawl/html.py)."""
        from feapder_spark.crawl import html as H

        return H.parse_document(url_canon, html)

    def start_callback(self):
        """Fires at each run() entry (Spider begin_callback,
        core/scheduler.py spider start).  Driver-side."""

    def end_callback(self):
        """Fires once per crawl completion — when the loop drains the
        frontier (spider_end/end_callback, core/scheduler.py:460-501); an
        interrupted run defers it to the resumed run that finishes."""

    # -- lifecycle -------------------------------------------------------------
    def add_parser(self, parser) -> None:
        """Register a secondary parser (Spider.add_parser of the reference,
        tests/spider-integration/main.py:19-24).  Accepts a BaseParser
        subclass or instance; requests route to it by parser_name."""
        if isinstance(parser, type):
            parser = parser()
        if not hasattr(self, "_extra_parsers"):
            self._extra_parsers = []
        self._extra_parsers.append(parser)

    def _config(self) -> CrawlConfig:
        cls = type(self)
        overrides_validate = cls.validate is not Spider.validate
        overrides_parse = cls.parse is not Spider.parse
        parsers = None
        for p in getattr(self, "_extra_parsers", []):
            parsers = parsers or {}
            pcls = type(p)
            spec = {"parse_fn": p.parse, "callbacks": _callbacks_of(p)}
            if pcls.validate is not BaseParser.validate:
                spec["validate"] = p.validate
            parsers[p.name] = spec
        return CrawlConfig(
            batch_size=self.batch_size,
            max_retries=self.max_retries,
            politeness=self.politeness,
            respect_robots=self.respect_robots,
            use_fetch_cache=self.use_fetch_cache,
            seen_set=self.seen_set,
            default_parser=cls.__name__,
            validate=self.validate if overrides_validate else None,
            parse_fn=self.parse if overrides_parse else None,
            parsers=parsers,
            callbacks=_callbacks_of(self),
            on_start=(
                self.start_callback if cls.start_callback is not Spider.start_callback else None
            ),
            on_end=(
                self.end_callback if cls.end_callback is not Spider.end_callback else None
            ),
        )

    def _seeds(self) -> list[dict]:
        seeds = []
        for s in self.start_requests():
            if isinstance(s, str):
                seeds.append({"url": s})
            else:
                seeds.append(dict(s))
        return seeds

    def start(self, spark, warehouse: str, resolver, max_iterations: int | None = None) -> list[IterationStats]:
        """Seed (skipped when resuming onto an existing frontier) and run."""
        engine = CrawlEngine(spark, warehouse, resolver, self._config())
        self.engine = engine
        engine.resume()
        engine.seed(self._seeds())
        return engine.run(max_iterations=max_iterations)
