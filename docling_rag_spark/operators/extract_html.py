"""HTML main-content extraction -> Block list (the north-rule core, X1).

From-scratch DOM walk with Boilerpipe/Readability-family heuristics:
structural boilerplate containers (nav/header/footer/aside + class/id hints)
are pruned, and every candidate text run is scored by **link density**
(chars inside <a> / total chars) and length — high-link-density or tiny
fragments are boilerplate and dropped. Replaces the reference's delegation
to Docling's HTML backend (core/parser.py:56-66) with a pure, deterministic
function of the markup.

Tokenizer: a regex-driven scanner (``_fast_feed``) drives the tree builder
directly — stdlib ``html.parser`` spends ~2/3 of total parse CPU in its
per-tag regex machinery, and the scanner replicates the only behaviors the
tree consumes (lowercased start/end tags, startend tags, charref-unescaped
data, raw-text <script>/<style> content, class/id attribute values) at ~3×
the throughput. The stdlib-backed path is retained (``engine="stdlib"``)
and a differential test pins block-for-block equivalence across the full
synthetic corpus, the fixture set, and an adversarial-markup matrix.

Block mapping: h1..h6 -> heading blocks; <pre> -> code (verbatim);
<table> -> table (cells joined ' | ', rows joined newline, never split);
consecutive <li> -> one text block (one item per line); other text runs ->
text blocks with whitespace collapsed.
"""

from __future__ import annotations

import re
from html import unescape
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
        self.start_node(tag, {k: (v or "") for k, v in attrs})

    def start_node(self, tag, attrs: dict[str, str]):
        """Fast-path entry: attrs already a dict (html.parser events funnel
        here through handle_starttag)."""
        stack = self._stack
        while len(stack) > 1 and tag in _IMPLIED_END.get(stack[-1].tag, ()):
            stack.pop()
        node = _Node(tag, attrs)
        stack[-1].children.append(node)
        if tag not in _VOID_TAGS and len(stack) < MAX_TREE_DEPTH:
            stack.append(node)

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
    s = _WS_RE.sub(" ", text)
    # isprintable() is a C-speed screen: every char _CTRL_RE strips is
    # non-printable (and space IS printable), so printable strings — the
    # overwhelming majority — skip the second regex entirely
    if not s.isprintable():
        s = _CTRL_RE.sub("", s)
    return s.strip()


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


# ---------------------------------------------------------------------------
# Fast tokenizer: drives _TreeBuilder.handle_* directly (those methods touch
# only self.root/_stack, never HTMLParser state), so the tree semantics —
# implied end tags, depth guard, stray-end tolerance — are shared verbatim
# between both engines.

# start tag: lowercase-insensitive name, quote-aware attribute blob, optional
# self-closing slash. Mirrors html.parser's tagfind_tolerant name charset.
_STARTTAG_RE = re.compile(
    r'<([a-zA-Z][^\t\n\r\f />\x00]*)'
    r'((?:\s+[^\s/>][^\s/=>]*(?:\s*=\s*(?:"[^"]*"|\'[^\']*\'|[^>\s]*))?)*)'
    r'\s*(/?)>'
)
_ENDTAG_RE = re.compile(r'</\s*([a-zA-Z][^\t\n\r\f />\x00]*)[^>]*>')
_ATTR_RE = re.compile(
    r'([^\s/>][^\s/=>]*)(?:\s*=\s*("([^"]*)"|\'([^\']*)\'|([^>\s]*)))?')
# raw-text elements (html.parser CDATA_CONTENT_ELEMENTS): content is opaque
# until a real close tag — name must terminate at whitespace, '/' or '>'
_RAWTEXT_END = {
    t: re.compile(r'</\s*%s(?=[\s/>])[^>]*>|</\s*%s>' % (t, t), re.I)
    for t in ("script", "style")
}


def _parse_attrs(blob: str) -> dict[str, str]:
    if not blob:
        return {}
    attrs: dict[str, str] = {}
    for m in _ATTR_RE.finditer(blob):
        name = m.group(1).lower()
        val = m.group(3)
        if val is None:
            val = m.group(4)
        if val is None:
            val = m.group(5) or ""
        attrs[name] = unescape(val) if "&" in val else val
    return attrs


def _fast_feed(html: str, builder: _TreeBuilder) -> None:
    """Tokenize ``html`` into the same handler calls html.parser would make
    for the constructs the tree consumes. Single forward pass, no buffering:
    an unterminated construct at EOF is dropped (what close() does to an
    incomplete tag) except unterminated raw text, which stays data."""
    pos, n = 0, len(html)
    find = html.find
    data = builder.handle_data
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            seg = html[pos:]
            data(unescape(seg) if "&" in seg else seg)
            break
        if lt > pos:
            seg = html[pos:lt]
            data(unescape(seg) if "&" in seg else seg)
        nxt = html[lt + 1:lt + 2]
        if nxt == "!":
            if html.startswith("<!--", lt):
                # HTML5 abruptly-closed comments: <!--> and <!---> are
                # complete empty comments (html.parser instead leaks the
                # whole tail as data — pinned divergence, spec wins)
                if html.startswith(">", lt + 4):
                    pos = lt + 5
                elif html.startswith("->", lt + 4):
                    pos = lt + 6
                else:
                    end = find("-->", lt + 4)
                    pos = n if end < 0 else end + 3
            else:  # <!DOCTYPE ...>, bogus <!...>
                end = find(">", lt + 2)
                pos = n if end < 0 else end + 1
        elif nxt == "?":
            end = find(">", lt + 2)
            pos = n if end < 0 else end + 1
        elif nxt == "/":
            m = _ENDTAG_RE.match(html, lt)
            if m:
                builder.handle_endtag(m.group(1).lower())
                pos = m.end()
            else:  # </>, </123>, or unterminated: skip to '>' silently
                end = find(">", lt + 2)
                pos = n if end < 0 else end + 1
        elif nxt and nxt.isalpha():
            m = _STARTTAG_RE.match(html, lt)
            if m is None:
                # no well-formed start tag here (unterminated at EOF, or
                # pathological attrs): emit '<' as data like html.parser's
                # tolerant fallback and rescan from the next char
                data("<")
                pos = lt + 1
                continue
            tag, blob, selfclose = m.group(1, 2, 3)
            tag = tag.lower()
            attrs = _parse_attrs(blob) if blob else {}
            pos = m.end()
            if selfclose:
                builder.handle_startendtag(tag, attrs.items())
                continue
            builder.start_node(tag, attrs)
            rawtext = _RAWTEXT_END.get(tag)
            if rawtext is not None:
                m2 = rawtext.search(html, pos)
                if m2 is None:
                    data(html[pos:])  # raw: never unescaped
                    pos = n
                else:
                    data(html[pos:m2.start()])
                    builder.handle_endtag(tag)
                    pos = m2.end()
        else:
            # '<' followed by non-name char: literal data (html.parser
            # emits the lone '<' and continues after it)
            data("<")
            pos = lt + 1


def extract_html(html: str, engine: str = "fast") -> list[Block]:
    builder = _TreeBuilder()
    if engine == "fast":
        _fast_feed(html, builder)
    else:
        builder.feed(html)
        builder.close()
    root = builder.root
    # descend into <html><body> if present
    walker = _Walker()
    walker.walk(root)
    walker._flush_run()
    return walker.blocks
