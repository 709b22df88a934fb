"""Response facade — the object a reference parser body works against
(network/response.py:96-374: ``response.xpath/css/re``, ``.text``, ``.url``,
``.urljoin``), so a feapder ``parse(self, request, response)`` body ports
verbatim into a :class:`~feapder_spark.api.Spider.parse` hook.

Construction is cheap (the DOM parses lazily on first selector use); one
Response per row inside the fused Arrow stage is the intended pattern::

    class MySpider(Spider):
        def parse(self, url_canon, html):
            r = Response(url_canon, html)
            title = r.xpath("//title/text()").get()
            links = r.css("a::attr(href)").extract()
            ...
"""

from __future__ import annotations

import re as _re
from urllib.parse import urljoin as _urljoin

from feapder_spark.crawl.selector import Selector, SelectorList


class Response:
    """Minimal reference-shaped response: url + decoded text + selectors."""

    def __init__(self, url: str, text: str, status_code: int = 200, headers: dict | None = None):
        self.url = url
        self.text = text
        self.status_code = status_code
        self.headers = headers or {}
        self._selector: Selector | None = None

    @classmethod
    def from_bytes(cls, url: str, content: bytes, headers: dict | None = None,
                   status_code: int = 200, encoding: str | None = None) -> "Response":
        """Decode a raw body via the P7 chain (header > meta > guess > utf-8)."""
        from feapder_spark.crawl.html import decode_content

        return cls(url, decode_content(content, headers, encoding), status_code, headers)

    # -- selector surface (response.py:320-374) ------------------------------
    @property
    def selector(self) -> Selector:
        if self._selector is None:
            self._selector = Selector(text=self.text)
        return self._selector

    def xpath(self, query: str) -> SelectorList:
        return self.selector.xpath(query)

    def css(self, query: str) -> SelectorList:
        return self.selector.css(query)

    def re(self, pattern: str) -> list[str]:
        return _re.findall(pattern, self.text or "")

    def re_first(self, pattern: str, default=None):
        m = _re.search(pattern, self.text or "")
        return m.group(1) if (m and m.groups()) else (m.group(0) if m else default)

    # -- helpers (response.py:181-210) ----------------------------------------
    def urljoin(self, link: str) -> str:
        return _urljoin(self.url, link)

    @property
    def ok(self) -> bool:
        return 200 <= self.status_code < 300
