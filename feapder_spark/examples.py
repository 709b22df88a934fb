"""Example spiders — the user-facing shape of the Spider API.

Like any Spark application code, a spider class must be importable on the
executors (ship your module with ``spark-submit --py-files``); these live in
the package so tests and docs share them.
"""

from __future__ import annotations

from feapder_spark.api import BaseParser, Spider


class DemoSpider(Spider):
    """Plain crawl: default parse (reference-ordered span/link pipeline)."""

    start_urls = ["http://host-0.test/page-0", "http://host-1.test/page-0"]
    batch_size = 16


# -- multi-parser templates (parser_control.py:85-86 routing) ---------------

def list_parse(url_canon, html):
    """List template: routes every discovered link to the detail template
    via explicit (url, parser_name) callback pairs."""
    from feapder_spark.crawl import html as H

    spans, links, title = H.parse_document(url_canon, html)
    return spans, [(ln, "DetailParser") for ln in links], "LIST:" + title


def detail_parse(url_canon, html):
    """Detail template: leaf pages — no further links."""
    from feapder_spark.crawl import html as H

    spans, _links, title = H.parse_document(url_canon, html)
    return spans, [], "DETAIL:" + title


class SelectorSpider(Spider):
    """A reference-style parse body: build a Response and extract with
    xpath/css exactly as a feapder parser would (response.py:320-374)."""

    start_urls = ["http://host-0.test/page-0", "http://host-1.test/page-0"]
    batch_size = 16

    def parse(self, url_canon, html):
        from feapder_spark.crawl import html as H
        from feapder_spark.crawl.response import Response

        r = Response(url_canon, html)
        title = r.xpath("//title/text()").get() or ""
        links = [r.urljoin(u) for u in r.css("a::attr(href)").extract()]
        links = [u for u in links if not any(b in u for b in H.STOP_URLS)]
        spans, _links_ref, _t = H.parse_document(url_canon, html)
        return spans, links, "SEL:" + title


class ListDemoSpider(Spider):
    """Two-template crawl: the spider is the list parser, registered
    DetailParser handles the routed detail links (spider-integration
    main.py:19-24 shape)."""

    start_urls = ["http://host-0.test/page-0", "http://host-1.test/page-0"]
    batch_size = 16

    def parse(self, url_canon, html):
        return list_parse(url_canon, html)


class DetailParser(BaseParser):
    def parse(self, url_canon, html):
        return detail_parse(url_canon, html)


class CallbackSpider(Spider):
    """The reference's most common shape — ONE parser class with a list
    callback and a detail callback, requests carrying the callback NAME
    (tests/spider/spiders/test_spider.py over request.py:248-252 /
    parser_control.py:562-570).  Links emitted as (url, None, callback)
    triples route to ``parse_detail`` within this same spider."""

    start_urls = ["http://host-0.test/page-0", "http://host-1.test/page-0"]
    batch_size = 16

    def parse(self, url_canon, html):  # list pages (the default callback)
        from feapder_spark.crawl import html as H

        spans, links, title = H.parse_document(url_canon, html)
        return spans, [(ln, None, "parse_detail") for ln in links], "CBLIST:" + title

    def parse_detail(self, url_canon, html):  # routed by callback name
        from feapder_spark.crawl import html as H

        spans, _links, title = H.parse_document(url_canon, html)
        return spans, [], "CBDETAIL:" + title


def mirror_download_midware(req):
    """download_midware example (base_parser.py:32-41): fetch bad-host URLs
    from a mirror; the request identity (fingerprint/url_canon) stays the
    original, only the outgoing fetch is rerouted."""
    if "host-bad.test" in req["url"]:
        return {"url": req["url"].replace("host-bad.test", "host-0.test")}
    return None


def rewrite_badhost_exception_request(req):
    """exception_request hook example (base_parser.py:71-83): requests that
    failed on the always-failing host are rewritten to a good mirror URL and
    re-enter the retry path with a boosted priority."""
    if "host-bad.test" in req["url"]:
        page = req["url"].rsplit("-", 1)[-1]
        return {"url": f"http://host-0.test/page-{page}", "priority": 100}
    return None


def tag_failed_request(req):
    """failed_request hook example (base_parser.py:85-95): annotate the
    parked row (demote priority so a reload crawls them last)."""
    return {"priority": 999}


def link_to_starved_parse(url_canon, html):
    """Every page emits one link to a politeness-starved page — the TTL
    re-claim scenario (ADVICE r2: an expired claim whose original frontier
    row is still visible must be replaced, not duplicated)."""
    from feapder_spark.crawl import html as H

    spans, _links, title = H.parse_document(url_canon, html)
    return spans, ["http://host-1.test/page-0"], title


def sync_inline_parse(url_canon, html):
    """request_sync example (parser_control.py:190-195): page-0 pulls its
    detail page depth-first within the SAME fused stage — the inline request
    never enters the frontier and never claims the seen set."""
    from feapder_spark.crawl import html as H

    spans, _links, title = H.parse_document(url_canon, html)
    links = []
    if url_canon.endswith("page-0"):
        links = [{"url": url_canon.replace("page-0", "page-1"), "request_sync": True}]
    return spans, links, "SY:" + (title or "")


def sync_badlink_parse(url_canon, html):
    """request_sync link into the always-failing host — the inline failure
    re-enqueues through the normal retry route."""
    from feapder_spark.crawl import html as H

    spans, _links, title = H.parse_document(url_canon, html)
    links = []
    if url_canon.endswith("page-0"):
        links = [{"url": "http://host-bad.test/page-0", "request_sync": True}]
    return spans, links, title


def none_title_parse(url_canon, html):
    """Parse hook returning title=None — exercises str(None) fingerprint
    semantics (item.py:141-153) through the JVM item_fp path."""
    from feapder_spark.crawl import html as H

    spans, links, _ = H.parse_document(url_canon, html)
    return spans, links, None


class HookedDemoSpider(Spider):
    """Custom validate (abandon host-1) + custom parse (uppercase titles)."""

    start_urls = ["http://host-0.test/page-0", "http://host-1.test/page-0"]
    batch_size = 16

    def validate(self, url, html):
        return "host-1" not in url

    def parse(self, url_canon, html):
        from feapder_spark.crawl import html as H

        spans, links, title = H.parse_document(url_canon, html)
        return spans, links, title.upper()
