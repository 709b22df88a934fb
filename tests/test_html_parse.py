"""HTML pipeline unit tests: rewrite order, control chars, spans, stop-list."""

from feapder_spark.crawl import html as H


def test_strip_control_chars():
    assert H.strip_control_chars("a\x00b\x1fc\x7fd\x0be") == "abcde"
    # \t \n \r are NOT stripped (outside [\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F])
    assert H.strip_control_chars("a\tb\nc") == "a\tb\nc"


def test_absolutize_links_all_four_patterns():
    html = (
        '<a href="/x">t</a><img src="i.webp"><link href="s.css">'
        '<script src="a.js"></script>'
    )
    out = H.absolutize_links("http://h.test/dir/page", html)
    assert '<a href="http://h.test/x">' in out
    assert '<img src="http://h.test/dir/i.webp">' in out
    assert '<link href="http://h.test/dir/s.css">' in out
    assert '<script src="http://h.test/dir/a.js">' in out


def test_extract_links_order_dedup_stoplist():
    html = (
        '<a href="http://h.test/1">a</a><a href="javascript:void(0)">b</a>'
        '<a href="http://h.test/2">c</a><a href="http://h.test/1">dup</a>'
        '<a href="http://h.test/p.jpg">img</a>'
    )
    # order-preserving dedup + substring stop-list (tools.py:421-455)
    assert H.extract_links(html) == ["http://h.test/1", "http://h.test/2"]


def test_extract_spans_interleaving():
    html = '<html><body><p>one two</p><img src="http://h.test/a.webp"><p>three</p></body></html>'
    spans = H.extract_spans(html)
    assert [(s["kind"], s["offset"]) for s in spans] == [("text", 0), ("media", 1), ("text", 2)]
    assert spans[0]["text"] == "one two" and spans[0]["media_ref"] == ""
    assert spans[1]["media_ref"] == "http://h.test/a.webp" and spans[1]["text"] == ""


def test_parse_document_pipeline_order():
    raw = '<html><title>T\x00itle</title><body><a href="/next">n</a><img src="pic.webp"></body></html>'
    spans, links, title = H.parse_document("http://h.test/base/", raw)
    assert title == "Title"  # control char stripped before extraction
    assert links == ["http://h.test/next"]  # absolutized before extraction
    media = [s for s in spans if s["kind"] == "media"]
    assert media[0]["media_ref"] == "http://h.test/base/pic.webp"


def test_detect_encoding_priority_chain():
    """P7 (response.py:126-166): header charset > meta charset > utf-8."""
    from feapder_spark.crawl.html import decode_content, detect_encoding

    body_plain = "<html><body>café</body></html>".encode("utf-8")
    # 1. explicit override wins
    assert detect_encoding(body_plain, declared="latin-1") == "iso8859-1"
    # 2. header charset next
    assert (
        detect_encoding(body_plain, headers={"Content-Type": "text/html; charset=GBK"})
        == "gbk"
    )
    # 3. body-declared meta charset
    meta_doc = b'<html><head><meta charset="iso-8859-1"></head><body>caf\xe9</body></html>'
    assert detect_encoding(meta_doc) == "iso8859-1"
    assert "café" in decode_content(meta_doc)
    # http-equiv form and xml declaration
    equiv = b'<meta http-equiv="Content-Type" content="text/html; charset=utf-16le">'
    assert detect_encoding(equiv) == "utf-16-le"
    xml = b'<?xml version="1.0" encoding="ISO-8859-1"?><root/>'
    assert detect_encoding(xml) == "iso8859-1"
    # 4. fallback
    assert detect_encoding(b"no declarations here") == "utf-8"
    # invalid names fall through the chain
    assert detect_encoding(b'<meta charset="not-a-codec">junk') == "utf-8"
