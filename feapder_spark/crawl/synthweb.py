"""Deterministic synthetic web — the fetch resolver for tests and benches.

No network exists in this sandbox (and the north rule's bench input must be
synthesized), so fetch is a pure function ``resolve(url, attempt) →
(status_code, html)`` keyed only on (seed, url, attempt).  The same object
drives the Spark fetch UDF and the pure-Python oracle.

Shape (FIXTURES.md §9): ``n_hosts`` hosts with Zipf(s)-skewed in-link
popularity (hot-domain skew exercises politeness + salting), ``pages_per_host``
pages each, pages made of interleaved text paragraphs and media refs
(img/link/script), anchors including: relative links, unsorted-query links
(canonicalization exercise), duplicate links (dedup exercise), stop-list
links (javascript/.css/.jpg — filter exercise, tools.py:421-455), and links
into an always-failing host (retry/failed-path exercise,
parser_control.py:298-342).  A deterministic subset of URLs is *flaky*:
fails the first ``flaky_failures`` attempts then succeeds (retry-success
path).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

BAD_HOST = "host-bad.test"

_WORDS = (
    "spark frontier crawl fetch parse dedup priority lease retry batch "
    "snapshot commit bloom bucket shard shuffle skew salt host page link "
    "media span text token vector stream window merge join scan filter"
).split()


def _h(parts: str, seed: int) -> int:
    """Deterministic 64-bit stream from (seed, parts)."""
    d = hashlib.md5(f"{seed}:{parts}".encode()).digest()
    return int.from_bytes(d[:8], "big")


@dataclass
class SyntheticWeb:
    n_hosts: int = 50
    pages_per_host: int = 40
    seed: int = 42
    zipf_s: float = 1.2
    n_links: int = 8
    flaky_every: int = 7  # every k-th url (by hash) is flaky
    flaky_failures: int = 2  # flaky urls fail this many attempts, then succeed
    page_weight: int = 1  # multiplies paragraph count (1 ≈ 2 KB pages; 5 ≈ 10 KB — realistic web sizes for benches)
    _zipf_cum: list = field(default_factory=list, init=False, repr=False)

    def __post_init__(self):
        weights = [1.0 / ((i + 1) ** self.zipf_s) for i in range(self.n_hosts)]
        total = sum(weights)
        acc, cum = 0.0, []
        for w in weights:
            acc += w / total
            cum.append(acc)
        self._zipf_cum = cum

    # -- url helpers --------------------------------------------------------
    def url(self, host_i: int, page_j: int) -> str:
        return f"http://host-{host_i}.test/page-{page_j}"

    def seeds(self, n_seeds: int = 20) -> list[dict]:
        """Seed list (FIXTURES.md §2): mostly page-0 of the first hosts at
        default priority 300, a few at 100/500 to exercise ordering."""
        out = []
        for i in range(n_seeds):
            host = i % self.n_hosts
            prio = 100 if i % 7 == 3 else (500 if i % 11 == 5 else 300)
            out.append({"url": self.url(host, 0), "priority": prio, "parser_name": "TestParser"})
        return out

    def _zipf_host(self, x: int) -> int:
        u = (x % 10**9) / 10**9
        for i, c in enumerate(self._zipf_cum):
            if u <= c:
                return i
        return self.n_hosts - 1

    def _is_flaky(self, url: str) -> bool:
        return _h("flaky:" + url, self.seed) % self.flaky_every == 0

    # -- page generation -----------------------------------------------------
    def gen_page(self, url: str) -> str:
        """Deterministic page: interleaved <p> text and media tags + anchors.

        One md5 seeds a ``random.Random`` stream per page (Mersenne Twister —
        stable across CPython versions), so page generation costs one hash
        instead of ~50 (this is the fetch stage's hot loop in benches).
        """
        import random

        rng = random.Random(_h("page:" + url, self.seed))
        n_paras = (2 + rng.randrange(4)) * self.page_weight
        parts = [f"<html><head><title>Page {url.rsplit('/', 1)[-1]} of {url.split('/')[2]}</title>"]
        if rng.randrange(3) == 0:
            parts.append(f'<link rel="stylesheet" href="/static/style-{rng.randrange(5)}.css">')
        parts.append("</head><body>")
        for _ in range(n_paras):
            words = " ".join(_WORDS[rng.randrange(len(_WORDS))] for _ in range(6 + rng.randrange(10)))
            parts.append(f"<p>{words}</p>")
            if rng.randrange(2) == 0:
                parts.append(f'<img src="/media/img-{rng.randrange(200)}.webp" alt="">')
        if rng.randrange(4) == 0:
            parts.append(f'<script src="/static/app-{rng.randrange(3)}.min"></script>')

        # anchors
        anchors = []
        n_links = 1 + rng.randrange(self.n_links) if self.n_links > 0 else 0
        for _ in range(n_links):
            kind = rng.randrange(10)
            if kind == 0:  # stop-list exercise
                anchors.append(
                    ["javascript:void(0)", "/assets/pic.jpg", "/theme.css", "/sheet.xls"][rng.randrange(4)]
                )
            elif kind == 1:  # bad-host link (always fails → retry→failed path)
                anchors.append(f"http://{BAD_HOST}/page-{rng.randrange(5)}")
            else:
                host = self._zipf_host(rng.randrange(10**9))
                page = rng.randrange(self.pages_per_host)
                form = rng.randrange(4)
                target = self.url(host, page)
                if form == 0:  # relative link
                    anchors.append(f"/page-{page}" if f"host-{host}.test" == url.split("/")[2] else target)
                elif form == 1:  # unsorted query params → canonicalization exercise
                    anchors.append(f"{target}?b=2&a=1")
                elif form == 2 and anchors:  # duplicate of a previous link → dedup exercise
                    anchors.append(anchors[-1])
                else:
                    anchors.append(target)
        for a in anchors:
            parts.append(f'<a href="{a}">anchor {_WORDS[rng.randrange(len(_WORDS))]}</a>')
        parts.append("</body></html>")
        return "".join(parts)

    # -- the resolver ---------------------------------------------------------
    def resolve(self, url: str, attempt: int = 0) -> tuple[int, str]:
        """Pure fetch: (status_code, html).  attempt = current retry_times."""
        try:
            host = url.split("/")[2]
        except IndexError:
            return 400, ""
        if host == BAD_HOST:
            return 503, ""
        if not (host.startswith("host-") and host.endswith(".test")):
            return 404, ""
        try:
            host_i = int(host[len("host-") : -len(".test")])
        except ValueError:
            return 404, ""
        path = url.split("/", 3)[3] if url.count("/") >= 3 else ""
        page_part = path.split("?")[0]
        if not page_part.startswith("page-"):
            return 404, ""
        try:
            page_j = int(page_part[len("page-") :])
        except ValueError:
            return 404, ""
        if host_i >= self.n_hosts or page_j >= self.pages_per_host:
            return 404, ""
        canonical = self.url(host_i, page_j)
        if self._is_flaky(canonical) and attempt < self.flaky_failures:
            return 503, ""
        return 200, self.gen_page(canonical)

    def robots_txt(self, host: str) -> str:
        """Deterministic synthetic robots.txt: ~1/3 of hosts disallow the
        /page-1 prefix, ~1/4 declare a crawl-delay."""
        x = _h("robots:" + host, self.seed)
        lines = ["User-agent: *"]
        if x % 3 == 0:
            lines.append("Disallow: /page-1")
        if x % 4 == 0:
            lines.append(f"Crawl-delay: {1 + x % 5}")
        return "\n".join(lines)

    def politeness_budgets(self, default_per_iter: int = 1_000_000, hot_cap: int = 4) -> dict[str, int]:
        """Per-host max fetches per iteration; hot (low-index Zipf) hosts get
        a tight cap so the politeness scheduler is actually exercised."""
        budgets = {}
        for i in range(min(3, self.n_hosts)):
            budgets[f"host-{i}.test"] = hot_cap
        budgets["__default__"] = default_per_iter
        return budgets


@dataclass
class FormWeb(SyntheticWeb):
    """Payload-aware resolver: page content varies with the request's POST
    params (TaskSpider-style per-task fetches, network/request.py:45-81).
    Deterministic: params are reflected into the page body sorted by key."""

    def resolve(self, url: str, attempt: int = 0, method: str = "GET", data: dict | None = None):
        status, html = super().resolve(url, attempt)
        if status == 200 and data:
            reflected = "".join(f"<p>param {k}={v}</p>" for k, v in sorted(data.items()))
            html = html.replace("</body>", reflected + "</body>")
        return status, html


@dataclass
class MarkingWeb(SyntheticWeb):
    """Test instrument: records every resolve() call as a marker file in
    ``marker_dir`` (executors share the local FS in local mode) — used to
    verify the fetch cache actually skips the resolver (S8 tests)."""

    marker_dir: str = ""

    def resolve(self, url: str, attempt: int = 0) -> tuple[int, str]:
        if self.marker_dir:
            import os

            os.makedirs(self.marker_dir, exist_ok=True)
            name = hashlib.md5(f"{url}|{attempt}".encode()).hexdigest()
            open(os.path.join(self.marker_dir, name), "w").close()
        return super().resolve(url, attempt)
