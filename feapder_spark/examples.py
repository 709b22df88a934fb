"""Example spiders — the user-facing shape of the Spider API.

Like any Spark application code, a spider class must be importable on the
executors (ship your module with ``spark-submit --py-files``); these live in
the package so tests and docs share them.
"""

from __future__ import annotations

from feapder_spark.api import Spider


class DemoSpider(Spider):
    """Plain crawl: default parse (reference-ordered span/link pipeline)."""

    start_urls = ["http://host-0.test/page-0", "http://host-1.test/page-0"]
    batch_size = 16


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
