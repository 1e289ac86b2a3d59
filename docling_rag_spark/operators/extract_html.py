"""HTML main-content extraction -> Block list (the north-rule core, X1).

From-scratch DOM walk over stdlib ``html.parser`` with
Boilerpipe/Readability-family heuristics: structural boilerplate containers
(nav/header/footer/aside + class/id hints) are pruned, and every candidate
text run is scored by **link density** (chars inside <a> / total chars) and
length — high-link-density or tiny fragments are boilerplate and dropped.
Replaces the reference's delegation to Docling's HTML backend
(core/parser.py:56-66) with a pure, deterministic function of the markup.

Block mapping: h1..h6 -> heading blocks; <pre> -> code (verbatim);
<table> -> table (cells joined ' | ', rows joined newline, never split);
consecutive <li> -> one text block (one item per line); other text runs ->
text blocks with whitespace collapsed.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from docling_rag_spark.config import (
    HTML_DROP_HINTS,
    HTML_DROP_TAGS,
    HTML_MAX_LINK_DENSITY,
    HTML_MIN_TEXT_CHARS,
)
from docling_rag_spark.operators.blocks import Block

_WS_RE = re.compile(r"\s+")
# C0/C1 control characters (crawler pages embed NULs and stray controls);
# \t\n\r are whitespace and already collapsed by _WS_RE before this runs
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
_VOID_TAGS = frozenset({
    "br", "hr", "img", "meta", "link", "input", "area", "base", "col",
    "embed", "source", "track", "wbr",
})
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
# tags that do NOT break a running inline text accumulation
_INLINE_TAGS = frozenset({
    "a", "abbr", "b", "bdi", "cite", "code", "data", "dfn", "em", "i",
    "kbd", "mark", "q", "s", "small", "span", "strong", "sub", "sup",
    "time", "u", "var", "br", "img", "wbr",
})
_SENTENCE_END = (".", "!", "?", ":", ";", "…")


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[object] = []  # _Node | str


# Hostile-markup guard: beyond this depth, new elements are flattened into
# their parent instead of nested. Keeps the later recursive walk well under
# Python's recursion limit on crawler-bait like 50k nested <div>s, while
# leaving any real document (depth < 100 in practice) untouched.
MAX_TREE_DEPTH = 256

# HTML5 implied end tags: an open element whose tag keys this map is
# auto-closed when any start tag in its value set arrives. Real crawl
# pages omit </p> </li> </td> </tr> constantly; without this, rows and
# paragraphs nest instead of closing and table structure collapses.
_BLOCK_STARTERS = frozenset({
    "address", "article", "aside", "blockquote", "details", "div", "dl",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hr", "main", "menu", "nav", "ol", "p",
    "pre", "section", "summary", "table", "ul", "li", "dt", "dd",
})
_TABLE_SECTIONS = frozenset({"tr", "tbody", "thead", "tfoot"})
_IMPLIED_END: dict[str, frozenset[str]] = {
    "p": _BLOCK_STARTERS,
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "td": frozenset({"td", "th"}) | _TABLE_SECTIONS,
    "th": frozenset({"td", "th"}) | _TABLE_SECTIONS,
    "tr": _TABLE_SECTIONS,
    "option": frozenset({"option", "optgroup"}),
}


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        while (len(self._stack) > 1
               and tag in _IMPLIED_END.get(self._stack[-1].tag, ())):
            self._stack.pop()
        node = _Node(tag, {k: (v or "") for k, v in attrs})
        self._stack[-1].children.append(node)
        if tag not in _VOID_TAGS and len(self._stack) < MAX_TREE_DEPTH:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(_Node(tag, {k: (v or "") for k, v in attrs}))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return
        # stray end tag: ignore (tolerant parse)

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def _is_boilerplate(node: _Node) -> bool:
    if node.tag in HTML_DROP_TAGS:
        return True
    hint = (node.attrs.get("class", "") + " " + node.attrs.get("id", "")).lower()
    if hint.strip():
        return any(h in hint for h in HTML_DROP_HINTS)
    return False


def _inline_text(node: _Node, in_link: bool = False) -> tuple[str, int]:
    """Flatten a subtree to text; returns (raw text, chars inside <a>)."""
    out: list[str] = []
    link_chars = 0
    for ch in node.children:
        if isinstance(ch, str):
            out.append(ch)
            if in_link:
                link_chars += len(ch.strip())
        else:
            if _is_boilerplate(ch):
                continue
            if ch.tag == "br":
                out.append(" ")
                continue
            t, lc = _inline_text(ch, in_link or ch.tag == "a")
            # block-level descendants (nested tables/divs inside a cell)
            # get word boundaries; inline tags concatenate seamlessly
            out.append(t if ch.tag in _INLINE_TAGS else f" {t} ")
            link_chars += lc
    return "".join(out), link_chars


def _clean(text: str) -> str:
    return _CTRL_RE.sub("", _WS_RE.sub(" ", text)).strip()


def _keep_text(text: str, link_chars: int) -> bool:
    if not text:
        return False
    if len(text) and link_chars / max(len(text), 1) > HTML_MAX_LINK_DENSITY:
        return False
    if len(text) < HTML_MIN_TEXT_CHARS and not text.endswith(_SENTENCE_END):
        return False
    return True


def _serialize_table(node: _Node) -> str:
    rows: list[str] = []

    def visit(n: _Node) -> None:
        for ch in n.children:
            if not isinstance(ch, _Node):
                continue
            if ch.tag == "tr":
                cells = [
                    _clean(_inline_text(c)[0])
                    for c in ch.children
                    if isinstance(c, _Node) and c.tag in ("td", "th")
                ]
                if any(cells):
                    rows.append(" | ".join(cells))
            elif ch.tag in ("thead", "tbody", "tfoot"):
                visit(ch)

    visit(node)
    return "\n".join(rows)


def _pre_text(node: _Node) -> str:
    """Verbatim code text: <br> and block-level wrappers (div-per-line
    syntax highlighters) become real newlines, never collapsed spaces."""
    out: list[str] = []

    def visit(n: _Node) -> None:
        for ch in n.children:
            if isinstance(ch, str):
                out.append(ch)
            elif ch.tag == "br":
                out.append("\n")
            elif _is_boilerplate(ch):
                continue
            else:
                visit(ch)
                if ch.tag not in _INLINE_TAGS and out and not out[-1].endswith("\n"):
                    out.append("\n")

    visit(node)
    return "".join(out).strip("\n").rstrip()


class _Walker:
    def __init__(self) -> None:
        self.blocks: list[Block] = []
        self._run: list[str] = []       # pending inline text pieces
        self._run_links = 0

    def _flush_run(self) -> None:
        if self._run:
            text = _clean("".join(self._run))
            if _keep_text(text, self._run_links):
                self.blocks.append(Block("text", text))
            self._run = []
            self._run_links = 0

    def _emit_text(self, text: str, link_chars: int) -> None:
        text = _clean(text)
        if _keep_text(text, link_chars):
            self.blocks.append(Block("text", text))

    def walk(self, node: _Node) -> None:
        for ch in node.children:
            if isinstance(ch, str):
                self._run.append(ch)
                continue
            if _is_boilerplate(ch):
                self._flush_run()
                continue
            tag = ch.tag
            if tag in _INLINE_TAGS:
                t, lc = _inline_text(ch, tag == "a")
                self._run.append(t)
                self._run_links += lc
            elif tag in _HEADING_TAGS:
                self._flush_run()
                text = _clean(_inline_text(ch)[0])
                if text:
                    self.blocks.append(Block("heading", text, level=int(tag[1])))
            elif tag == "pre":
                self._flush_run()
                body = _pre_text(ch)
                if body.strip():
                    self.blocks.append(Block("code", body))
            elif tag == "table":
                self._flush_run()
                body = _serialize_table(ch)
                if body:
                    self.blocks.append(Block("table", body))
            elif tag in ("ul", "ol"):
                self._flush_run()
                self._emit_list(ch)
            elif tag in ("p", "blockquote", "dd", "dt", "figcaption", "caption"):
                self._flush_run()
                t, lc = _inline_text(ch)
                self._emit_text(t, lc)
            else:  # generic container: recurse
                self._flush_run()
                self.walk(ch)
                self._flush_run()

    def _emit_list(self, node: _Node) -> None:
        items: list[str] = []
        link_chars = 0
        total = 0
        for ch in node.children:
            if isinstance(ch, _Node) and ch.tag == "li":
                t, lc = _inline_text(ch, False)
                t = _clean(t)
                if t:
                    items.append(t)
                    link_chars += lc
                    total += len(t)
        if not items:
            return
        # a list that is mostly links is a menu -> boilerplate
        if link_chars / max(total, 1) > HTML_MAX_LINK_DENSITY:
            return
        self.blocks.append(Block("text", "\n".join(items)))


def extract_html(html: str) -> list[Block]:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    root = builder.root
    # descend into <html><body> if present
    walker = _Walker()
    walker.walk(root)
    walker._flush_run()
    return walker.blocks
