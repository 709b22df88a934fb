"""Selector surface (P9) — the reference's Response.xpath/css/re extraction
contract (network/selector.py:111-158: ``Selector(text=...)`` with
``.xpath()``, ``.css()``, ``.re()``, SelectorList ``.extract()`` /
``.extract_first()``), rebuilt on the stdlib ``html.parser`` DOM because this
image ships neither parsel nor lxml.

Supported query subset (documented, tested — the shapes the reference's own
tests and demo spiders use):

- css:   ``tag``, ``.class``, ``#id``, ``tag.class``, ``tag#id``,
         ``tag[attr]``, ``tag[attr=value]``, descendant chains with spaces,
         and the parsel pseudo-elements ``::text`` / ``::attr(name)``.
- xpath: ``//tag``, ``//tag[@attr]``, ``//tag[@attr="v"]``, trailing
         ``/text()`` and ``/@attr``, and ``//tag1//tag2`` descendant chains.
- re:    full Python regex over the selected text (or the whole document).

Hooks run driver- or executor-side (pure Python, picklable) — inside the
fused Arrow parse stage a user's ``parse_fn`` can build a Selector per page.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "text_parts")

    def __init__(self, tag: str, attrs: dict, parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node] = []
        self.parent = parent
        self.text_parts: list[str] = []

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()

    def own_text(self) -> str:
        return "".join(self.text_parts)

    def all_text(self) -> str:
        return "".join(n.own_text() for n in self.iter())

    def outer_html(self) -> str:
        attrs = "".join(f' {k}="{v}"' for k, v in self.attrs.items())
        if self.tag in _VOID_TAGS:
            return f"<{self.tag}{attrs}>"
        inner = "".join(
            part
            for part in self._inner_parts()
        )
        return f"<{self.tag}{attrs}>{inner}</{self.tag}>"

    def _inner_parts(self):
        # interleave own text before children is not tracked; emit text then children
        yield self.own_text()
        for c in self.children:
            yield c.outer_html()


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("__root__", {}, None)
        self.cur = self.root

    # HTML5 implied end tags: a new <p>/<li>/... closes an open one
    _AUTO_CLOSE = {"p", "li", "tr", "td", "th", "dd", "dt", "option"}

    def handle_starttag(self, tag, attrs):
        if tag in self._AUTO_CLOSE and self.cur.tag == tag:
            self.handle_endtag(tag)
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        # walk up to the nearest open tag with this name (forgiving parse)
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data):
        self.cur.text_parts.append(data)


_CSS_STEP = re.compile(
    r"^(?P<tag>[\w*-]+)?(?:#(?P<id>[\w-]+))?(?:\.(?P<cls>[\w-]+))?"
    r"(?:\[(?P<attr>[\w-]+)(?:=(?P<q>[\"']?)(?P<val>[^\]\"']*)(?P=q))?\])?$"
)


def _match(node: Node, tag, id_, cls, attr, val) -> bool:
    if node.tag == "__root__":
        return False
    if tag and tag != "*" and node.tag != tag:
        return False
    if id_ and node.attrs.get("id") != id_:
        return False
    if cls and cls not in (node.attrs.get("class") or "").split():
        return False
    if attr:
        if attr not in node.attrs:
            return False
        if val is not None and node.attrs.get(attr) != val:
            return False
    return True


class SelectorList(list):
    def extract(self) -> list[str]:
        return [s.get() for s in self]

    getall = extract

    def extract_first(self, default=None):
        return self[0].get() if self else default

    get = extract_first

    def re(self, pattern: str) -> list[str]:
        out = []
        for s in self:
            out.extend(re.findall(pattern, s.get() or ""))
        return out

    def re_first(self, pattern: str, default=None):
        r = self.re(pattern)
        return r[0] if r else default


class Selector:
    """One node (or the document root) plus an optional extracted value."""

    def __init__(self, text: str | None = None, _node: Node | None = None, _value: str | None = None):
        if text is not None:
            tb = _TreeBuilder()
            tb.feed(text)
            self._node = tb.root
        else:
            self._node = _node
        self._value = _value

    # -- extraction --------------------------------------------------------
    def get(self) -> str | None:
        if self._value is not None:
            return self._value
        if self._node is None:
            return None
        if self._node.tag == "__root__":
            return "".join(c.outer_html() for c in self._node.children)
        return self._node.outer_html()

    extract = get

    def re(self, pattern: str) -> list[str]:
        return re.findall(pattern, self.get() or "")

    # -- css -----------------------------------------------------------------
    def css(self, query: str) -> SelectorList:
        query = query.strip()
        pseudo = None
        m = re.search(r"::(text|attr\(([\w-]+)\))$", query)
        if m:
            pseudo = ("text", None) if m.group(1) == "text" else ("attr", m.group(2))
            query = query[: m.start()].strip()
        nodes = [self._node] if self._node is not None else []
        for step in query.split():
            sm = _CSS_STEP.match(step)
            if not sm:
                raise ValueError(f"unsupported css step: {step!r}")
            tag, id_, cls = sm.group("tag"), sm.group("id"), sm.group("cls")
            attr, val = sm.group("attr"), sm.group("val") if sm.group("attr") else None
            nxt, seen = [], set()
            for base in nodes:
                for n in base.iter():
                    if n is base:
                        continue
                    if _match(n, tag, id_, cls, attr, val) and id(n) not in seen:
                        seen.add(id(n))
                        nxt.append(n)
            nodes = nxt
        return self._wrap(nodes, pseudo)

    # -- xpath (subset) --------------------------------------------------------
    def xpath(self, query: str) -> SelectorList:
        query = query.strip()
        pseudo = None
        if query.endswith("/text()"):
            pseudo = ("text", None)
            query = query[: -len("/text()")]
        else:
            am = re.search(r"/@([\w-]+)$", query)
            if am:
                pseudo = ("attr", am.group(1))
                query = query[: am.start()]
        steps = [s for s in query.split("//") if s]
        nodes = [self._node] if self._node is not None else []
        for step in steps:
            xm = re.match(r'^([\w*-]+)(?:\[@([\w-]+)(?:=["\']([^"\']*)["\'])?\])?$', step.strip("/"))
            if not xm:
                raise ValueError(f"unsupported xpath step: {step!r}")
            tag, attr, val = xm.groups()
            nxt, seen = [], set()
            for base in nodes:
                for n in base.iter():
                    if n is base:
                        continue
                    if _match(n, tag, None, None, attr, val) and id(n) not in seen:
                        seen.add(id(n))
                        nxt.append(n)
            nodes = nxt
        return self._wrap(nodes, pseudo)

    def _wrap(self, nodes: list[Node], pseudo) -> SelectorList:
        out = SelectorList()
        for n in nodes:
            if pseudo is None:
                out.append(Selector(_node=n))
            elif pseudo[0] == "text":
                out.append(Selector(_value=n.all_text()))
            else:
                if pseudo[1] in n.attrs:
                    out.append(Selector(_value=n.attrs[pseudo[1]]))
        return out
