"""HTML processing — span extraction, link extraction, absolutization.

Pure Python, shared verbatim by the Spark parse UDF and the pure-Python
reference oracle so span semantics can never diverge between them.

Reference semantics reproduced (citations into /root/reference):

- absolute-link rewriting of ``a@href, img@src, link@href, script@src`` with
  four regexes applied in that fixed order (network/response.py:212-232);
  regex patterns match the reference's (response.py:213-218).
- control-character stripping ``[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]``
  (response.py:30-37, 234-241) applied before extraction.
- link extraction: ``<a href>`` regex, order-preserving dedup, substring
  stop-list (utils/tools.py:421-455 ``get_urls``).
- span sequence: the interleaved text+media document model of the
  ``input_hint`` — text spans are the visible text segments between tags in
  source order; media spans are img/link/script refs in source order; each
  span carries its 0-based position.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

# response.py:213-218 — same four patterns, same order (a, img, link, script)
_ABS_REGEXES = [
    re.compile(r'(<a.*?href\s*?=\s*?["\'])(.+?)(["\'])', re.S | re.I),
    re.compile(r'(<img.*?src\s*?=\s*?["\'])(.+?)(["\'])', re.S | re.I),
    re.compile(r'(<link.*?href\s*?=\s*?["\'])(.+?)(["\'])', re.S | re.I),
    re.compile(r'(<script.*?src\s*?=\s*?["\'])(.+?)(["\'])', re.S | re.I),
]

# response.py:30-37
_CONTROL_CHARS = re.compile("[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]")

# tools.py:439 — anchor href extraction regex
_A_HREF = re.compile(r'<a.*?href.*?=.*?["|\'](.*?)["|\']', re.S | re.I)

# tools.py:422-437 — default stop-list (substring match)
STOP_URLS = (
    "javascript",
    "+",
    ".css",
    ".js",
    ".rar",
    ".xls",
    ".exe",
    ".apk",
    ".doc",
    ".jpg",
    ".png",
    ".flv",
    ".mp4",
)

# media span sources, in-document order: img@src, link@href, script@src
_MEDIA_TAG = re.compile(
    r'<img[^>]*?src\s*=\s*["\'](?P<img>[^"\']+)["\']'
    r'|<link[^>]*?href\s*=\s*["\'](?P<link>[^"\']+)["\']'
    r'|<script[^>]*?src\s*=\s*["\'](?P<script>[^"\']+)["\']',
    re.S | re.I,
)

_TAG = re.compile(r"<[^>]+>")


def strip_control_chars(text: str) -> str:
    return _CONTROL_CHARS.sub("", text)


def _urljoin_is_identity(link: str) -> bool:
    """True when ``urljoin(base, link) == link`` for EVERY base: a lowercase
    absolute http(s) URL with a non-empty netloc (the char after ``://`` is
    not ``/``, ``?`` or ``#`` — those start path/query/fragment, leaving an
    empty authority that same-scheme urljoin resolves against the base) and
    none of the characters urlsplit strips (tab/newline/CR, surrounding
    whitespace).  Verified by 400k-pair fuzz + the hypothesis property
    test_make_absolute_matches_urljoin_exactly; excluded edges fall back to
    the real urljoin."""
    if link.startswith("http://"):
        rest = link[7:]
    elif link.startswith("https://"):
        rest = link[8:]
    else:
        return False
    if not rest or rest[0] in "/?#":
        return False  # empty netloc: same-scheme urljoin merges with base
    for ch in ";#\t\n\r":
        # ';'/'#' start params/fragment, and EMPTY ones don't round-trip
        # urlunparse ("http://h/a;" -> "http://h/a"); tab/CR/LF are stripped
        # by urlsplit.  Links carrying any of these take the full urljoin.
        if ch in link:
            return False
    if link[-1] == "?":
        return False  # empty query doesn't round-trip ("a?" -> "a")
    return link == link.strip()


def _base_ctx(base: str) -> tuple[str, str] | None:
    """(authority_root, dir_prefix) for fast relative joins, or None when the
    base needs the real urljoin (non-http scheme, query/fragment/params,
    dot segments, stray whitespace).  Cached: absolutize_links calls
    make_absolute many times with the same page base."""
    if base.startswith("http://"):
        scheme_end = 7
    elif base.startswith("https://"):
        scheme_end = 8
    else:
        return None
    if (
        "?" in base or "#" in base or ";" in base
        or "\t" in base or "\n" in base or "\r" in base
        or base != base.strip()
        # C0 controls (urlsplit lstrips WHATWG C0-or-space, str.strip does
        # not): a leading one already fails the scheme prefix above, but
        # guard explicitly so the invariant doesn't rest on that accident
        or base[0] <= " " or base[-1] <= " "
        or "/." in base
        # "//" in the base PATH: Python's urljoin collapses repeated
        # slashes during the merge (fuzz-discovered) — slow path
        or "//" in base[scheme_end:]
    ):
        return None
    slash = base.find("/", scheme_end)
    if slash == -1:
        return (base, base + "/")
    return (base[:slash], base[: base.rfind("/") + 1])


_BASE_CTX_CACHE: dict = {}


def _fast_rel(ctx: tuple[str, str], link: str) -> str | None:
    """``urljoin(base, link)`` by pure string concat for plain relative
    references — ``page-3``, ``sub/dir?b=2&a=1``, ``/rooted/path`` — the
    dominant link shapes on real pages.  Returns None for every shape whose
    join is not literally prefix+link: scheme/protocol-relative links
    (``:``/leading ``//``), fragments/params (empty ones don't round-trip
    urlunsplit), query-only refs (resolve against the full base path, not
    the dir), trailing-``?`` (empty query doesn't round-trip), dot segments
    (RFC remove_dot_segments applies), whitespace (urlsplit strips it).
    Soundness is pinned by the hypothesis property test
    (test_make_absolute_relative_matches_urljoin) + a 400k-pair fuzz."""
    if (
        ":" in link or "#" in link or ";" in link
        or "\t" in link or "\n" in link or "\r" in link
        or link != link.strip()
        # leading C0 controls other than \t\r\n ('\x01page'): urlsplit
        # lstrips the WHATWG C0-control-or-space class but str.strip() does
        # not, so the strip() guard above misses them (fuzz-found) — any
        # first char <= SPACE takes the real urljoin
        or link[0] <= " "
        or link[0] in "?."
        or link[-1] == "?"
        # "//" anywhere: a leading one is protocol-relative, and an INNER
        # one is collapsed by Python's urljoin when the base path is empty
        # ('https://h' + 'a//b' -> 'https://h/a/b') — fuzz-discovered
        or "//" in link
        or "/." in link
    ):
        return None
    if link[0] == "/":
        return ctx[0] + link
    return ctx[1] + link


def make_absolute(base_url: str, link: str) -> str:
    """Relative→absolute (response.py:181-210 / tools.py:458-468 urljoin).

    Two fast paths bracket the real urljoin (urlparse×2 + merge was ~30% of
    the fused parse stage's python time): absolute http(s) links
    short-circuit to identity, and plain relative references concat against
    a cached per-base prefix."""
    if not link:
        return link
    if _urljoin_is_identity(link):
        return link
    ctx = _BASE_CTX_CACHE.get(base_url)
    if ctx is None and base_url not in _BASE_CTX_CACHE:
        if len(_BASE_CTX_CACHE) > 4096:
            _BASE_CTX_CACHE.clear()
        ctx = _BASE_CTX_CACHE[base_url] = _base_ctx(base_url)
    if ctx is not None:
        fast = _fast_rel(ctx, link)
        if fast is not None:
            return fast
    try:
        return urljoin(base_url, link)
    except ValueError:
        return link


def absolutize_links(base_url: str, html: str) -> str:
    """Rewrite the four tag/attr patterns in fixed order (response.py:212-232)."""
    for regex in _ABS_REGEXES:
        html = regex.sub(lambda m: m.group(1) + make_absolute(base_url, m.group(2)) + m.group(3), html)
    return html


def extract_links(html: str, stop_urls: tuple[str, ...] = STOP_URLS) -> list[str]:
    """tools.get_urls semantics: regex scan, order-preserving dedup,
    substring stop-list (tools.py:421-455)."""
    urls = _A_HREF.findall(html)
    urls = sorted(set(urls), key=urls.index)
    out = []
    for url in urls:
        if not any(stop in url for stop in stop_urls):
            out.append(url)
    return out


def extract_spans(html: str) -> list[dict]:
    """Interleaved text+media span sequence (the input_hint document model).

    Scans the document once in source order: every img/link/script ref is a
    media span; every non-empty visible text segment between tags is a text
    span.  Returns ``[{kind, text, media_ref, offset}, ...]`` with 0-based
    offsets.  Run on html that has already been absolutized + control-char
    stripped (same ordering as the reference's text pipeline,
    response.py:126-241).
    """
    spans: list[dict] = []

    # collect media positions first so text segmentation can interleave
    media = [
        (m.start(), m.group("img") or m.group("link") or m.group("script"))
        for m in _MEDIA_TAG.finditer(html)
    ]

    # visible text segments: strip every tag, keep the segment start offsets
    text_segments = []
    pos = 0
    for m in _TAG.finditer(html):
        seg = html[pos : m.start()].strip()
        if seg:
            text_segments.append((pos, seg))
        pos = m.end()
    tail = html[pos:].strip()
    if tail:
        text_segments.append((pos, tail))

    merged = sorted(
        [(p, "media", ref) for p, ref in media] + [(p, "text", t) for p, t in text_segments]
    )
    for offset, (pos, kind, payload) in enumerate(merged):
        if kind == "media":
            spans.append({"kind": "media", "text": "", "media_ref": payload, "offset": offset})
        else:
            spans.append({"kind": "text", "text": payload, "media_ref": "", "offset": offset})
    return spans


def parse_document(base_url: str, raw_html: str) -> tuple[list[dict], list[str], str]:
    """Full reference-ordered parse pipeline for one fetched page:
    control-char strip → absolute-link rewrite → (spans, links, title).

    Returns (spans, links, title).  Links are absolute (extraction happens on
    the rewritten html, matching the reference flow where ``response.text``
    is already rewritten when parsers call ``get_urls``).

    ``raw_html`` may be None (auto_request=False: the callback receives
    response=None, parser_control.py:96,162-163) — an empty document.
    """
    if raw_html is None:
        return [], [], None
    html = strip_control_chars(raw_html)
    html = absolutize_links(base_url, html)
    spans = extract_spans(html)
    links = extract_links(html)
    m = re.search(r"<title[^>]*>(.*?)</title>", html, re.S | re.I)
    title = m.group(1).strip() if m else ""
    return spans, links, title


# ---------------------------------------------------------------------------
# Encoding detection (P7) — response.py:126-166 priority chain:
# explicit > header charset > body-declared <meta>/<?xml?> > guess > utf-8.
# The header/meta parsing reimplements the public w3lib behaviours
# (http_content_type_encoding / html_body_declared_encoding) from scratch;
# the content guess uses chardet only when the library exists (import-gated —
# not bundled in this image).
# ---------------------------------------------------------------------------

_HEADER_CHARSET = re.compile(r"charset\s*=\s*[\"']?([\w.\-]+)", re.I)
_META_CHARSET = re.compile(rb'<meta[^>]+charset\s*=\s*["\']?([\w.\-]+)', re.I)
_XML_ENCODING = re.compile(rb'<\?xml[^>]+encoding\s*=\s*["\']([\w.\-]+)', re.I)


def _valid_codec(name: str | None) -> str | None:
    if not name:
        return None
    import codecs

    try:
        return codecs.lookup(name).name
    except LookupError:
        return None


def detect_encoding(content: bytes, headers: dict | None = None, declared: str | None = None) -> str:
    """Resolve the decode charset for a fetched body (response.py:126-166).

    Priority: ``declared`` (user/override) > Content-Type header charset >
    body-declared ``<meta charset>`` / ``<?xml encoding>`` (first 4 KiB) >
    chardet guess when available > utf-8.
    """
    enc = _valid_codec(declared)
    if enc:
        return enc
    if headers:
        ctype = headers.get("Content-Type") or headers.get("content-type") or ""
        m = _HEADER_CHARSET.search(ctype)
        enc = _valid_codec(m.group(1) if m else None)
        if enc:
            return enc
    head = content[:4096]
    m = _META_CHARSET.search(head) or _XML_ENCODING.search(head)
    enc = _valid_codec(m.group(1).decode("ascii", "ignore") if m else None)
    if enc:
        return enc
    try:  # chardet is optional in this image
        import chardet

        guess = chardet.detect(content[:8192]).get("encoding")
        enc = _valid_codec(guess)
        if enc:
            return enc
    except ImportError:
        pass
    return "utf-8"


def decode_content(content: bytes, headers: dict | None = None, declared: str | None = None) -> str:
    """bytes → str via :func:`detect_encoding`, errors replaced (the
    reference decodes with ``errors='replace'``, response.py:167-178)."""
    return content.decode(detect_encoding(content, headers, declared), errors="replace")
