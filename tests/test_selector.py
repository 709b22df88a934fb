"""P9 selector surface: the Response.xpath/css/re extraction contract
(network/selector.py:111-158) on the stdlib-DOM Selector."""

import pytest

from feapder_spark.crawl.selector import Selector

DOC = """
<html><head><title>Demo Page</title></head><body>
  <div id="main" class="content wide">
    <p class="intro">Hello <b>world</b></p>
    <ul>
      <li><a href="/a" class="nav">First</a></li>
      <li><a href="/b" class="nav ext">Second</a></li>
      <li><a href="http://x.test/c">Third link</a></li>
    </ul>
    <img src="/pic.webp" alt="pic">
  </div>
  <div class="footer"><p>bye 42</p></div>
</body></html>
"""


def test_css_basic():
    s = Selector(text=DOC)
    assert s.css("title::text").get() == "Demo Page"
    assert s.css("a::attr(href)").extract() == ["/a", "/b", "http://x.test/c"]
    assert s.css(".intro::text").get() == "Hello world"
    assert s.css("#main p.intro b::text").get() == "world"
    assert s.css("a.ext::attr(href)").extract() == ["/b"]
    assert s.css("img::attr(src)").extract_first() == "/pic.webp"
    assert s.css("div.footer p::text").get() == "bye 42"
    assert s.css("a[href=/b]::text").get() == "Second"
    assert s.css("nonexistent::text").extract_first("fallback") == "fallback"


def test_xpath_subset():
    s = Selector(text=DOC)
    assert s.xpath("//title/text()").get() == "Demo Page"
    assert s.xpath("//a/@href").extract() == ["/a", "/b", "http://x.test/c"]
    assert s.xpath('//div[@id="main"]//a/@href').extract() == ["/a", "/b", "http://x.test/c"]
    assert s.xpath('//a[@class="nav"]/text()').get() == "First"
    assert s.xpath("//img/@src").get() == "/pic.webp"
    assert s.xpath('//div[@class]//p/text()').extract_first() == "Hello world"


def test_re_and_chaining():
    s = Selector(text=DOC)
    assert s.re(r"bye (\d+)") == ["42"]
    assert s.css("ul li").re(r'href="([^"]+)"') == ["/a", "/b", "http://x.test/c"]
    assert s.css("ul li").re_first(r"Third (\w+)") == "link"
    # node selectors extract outer html
    li = s.css("li")
    assert len(li) == 3 and li[0].get().startswith("<li>")
    # nested css on a node selector
    assert li[1].css("a::text").get() == "Second"


def test_forgiving_parse():
    # unclosed tags and void elements must not break the tree
    s = Selector(text="<div><p>one<p>two<br><img src='x.png'></div>")
    assert s.css("p::text").extract() == ["one", "two"]
    assert s.css("img::attr(src)").get() == "x.png"


def test_unsupported_raises():
    s = Selector(text=DOC)
    with pytest.raises(ValueError):
        s.css("a > b")
    with pytest.raises(ValueError):
        s.xpath("//a/following-sibling::b")


def test_response_facade():
    from feapder_spark.crawl.response import Response

    r = Response("http://h1.test/a/b", "<html><title>T1</title><a href='/x'>x</a> code 77</html>")
    assert r.xpath("//title/text()").get() == "T1"
    assert r.css("a::attr(href)").extract() == ["/x"]
    assert r.urljoin("/x") == "http://h1.test/x"
    assert r.urljoin("y") == "http://h1.test/a/y"
    assert r.re(r"code (\d+)") == ["77"]
    assert r.re_first(r"code (\d+)") == "77"
    assert r.ok

    body = '<meta charset="iso-8859-1"><p>caf\xe9</p>'.encode("iso-8859-1")
    r2 = Response.from_bytes("http://h1.test/", body)
    assert "café" in r2.text


def test_selector_spider_end_to_end(spark, tmp_path):
    from feapder_spark.crawl.synthweb import SyntheticWeb
    from feapder_spark.examples import SelectorSpider

    web = SyntheticWeb(n_hosts=2, pages_per_host=2, seed=42, flaky_every=10**9)
    sp = SelectorSpider()
    sp.start(spark, str(tmp_path / "wh"), web)
    items = [r.title for r in sp.engine.t("items").read().collect()]
    assert items and all(t.startswith("SEL:Page") for t in items)
    # selector-extracted links actually drove the crawl beyond the seeds
    assert sp.engine.t("docs").read().count() > 2
