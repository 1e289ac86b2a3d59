"""Differential tests: fast regex tokenizer vs stdlib html.parser.

The fast scanner (`_fast_feed`) replaces html.parser in the extraction hot
path (~2/3 of HTML parse CPU). These tests pin that both engines build the
SAME tree — adjacent data chunks merged, since chunk boundaries are a
non-semantic artifact — over (a) the full synthetic page corpus at two
seeds, (b) the authored fixture documents, and (c) an adversarial-markup
matrix. The constructs where the engines legitimately diverge (stdlib
quirks on pathological input where the fast scanner follows the HTML5 spec)
are pinned with explicit expected trees instead.
"""

from __future__ import annotations

import pytest

from docling_rag_spark.operators.charset import detect_decode
from docling_rag_spark.operators.extract_html import (
    _TreeBuilder,
    _fast_feed,
    extract_html,
)
from docling_rag_spark.sources import fixtures as FX
from docling_rag_spark.sources.pages import generate_pages


def _tree(html: str, engine: str):
    b = _TreeBuilder()
    if engine == "fast":
        _fast_feed(html, b)
    else:
        b.feed(html)
        b.close()

    def ser(n):
        if isinstance(n, str):
            return n
        return (n.tag, tuple(sorted(n.attrs.items())),
                tuple(ser(c) for c in n.children))

    return _merge_data(ser(b.root))


def _merge_data(t):
    if isinstance(t, str):
        return t
    tag, attrs, ch = t
    out: list = []
    for c in ch:
        c = _merge_data(c)
        if isinstance(c, str) and out and isinstance(out[-1], str):
            out[-1] += c
        else:
            out.append(c)
    return (tag, attrs, tuple(x for x in out if x != ""))


EQUIVALENT_CASES = [
    "<p>a<p>b</p>",
    "<ul><li>one<li>two</ul>",
    "<table><tr><td>a<td>b<tr><td>c</table>",
    '<div CLASS="Nav Menu" ID=Main>x</div>',
    "<a href='q' title=\"t&amp;t\" data-x=v disabled>link</a>",
    "<a href=/foo/bar>x</a>",
    "<a href=foo/>y</a>",
    "<br/><div/><img src=x/>",
    '<script>if (a<b) { document.write("</div>"); }</script><p>after</p>',
    '<script>var s = "</scriptxyz>"; x;</script><p>tail</p>',
    "<style>p > a { color: red }</style><p>styled</p>",
    "<!-- comment <div> -->text",
    "<!DOCTYPE html><p>x</p>",
    '<?xml version="1.0"?><p>pi</p>',
    "a &amp; b &#65; &nbsp; &amp c &unknown; d",
    "x < y and 2<3 but <em>fine</em>",
    "</p>stray</div>",
    "<p>unterminated <",
    '<p>weird <a href="no close',
    "<P>UPPER <EM>case</EM></P>",
    '<p title="a>b">gt in attr</p>',
    "<div     class=x     >spacey</div>",
    '<div\nclass="nl">nl</div>',
    '<img alt="A&#768;">combining',
    "<td>cell outside table",
    "<option>a<option>b<optgroup><option>c",
    "<dt>t<dd>d<dt>t2",
    "<!>z",
    "<>empty</>",
    "<3 heart",
    "<\x00nul",
    '<a b=">">q</a>',
    "<a b='>'>q</a>",
    ("<div>" * 300) + "deep" + ("</div>" * 300),
    "<p>ent in data &lt;tag&gt;</p>",
    "<script></script><p>empty raw</p>",
    '<script type="text/javascript"> </script  >tailjunk',
    "<style>@media (max-width: 10px) { }</style>",
    '<svg><circle r="1"/></svg>after',
    '<a href="x" href="y">dup</a>',
    "<em>a<strong>b</em>c</strong>",
    "",
    "plain text only",
    "&;&#;&#x;",
    "<p>tab\tand\rreturn</p>",
]


@pytest.mark.parametrize("case", EQUIVALENT_CASES, ids=range(len(EQUIVALENT_CASES)))
def test_adversarial_markup_equivalent(case):
    assert _tree(case, "fast") == _tree(case, "stdlib")


# Pathological constructs where the engines intentionally differ — the fast
# scanner follows the HTML5 spec, stdlib html.parser has historical quirks.
# The FAST tree is pinned; a comment records what stdlib does instead.
DIVERGENT_CASES = [
    # unterminated raw text: fast keeps the tail as script content (it is
    # inert either way — script is a drop tag); stdlib buffers it forever
    # and drops it at close()
    ("<script>unterminated raw",
     ("#root", (), (("script", (), ("unterminated raw",)),))),
    # HTML5 abruptly-closed empty comments <!--> / <!--->: fast closes the
    # comment and keeps the tail as data; stdlib leaks the WHOLE construct
    # plus tail as literal data ("<!-->y" appears in extracted text)
    ("<!--->x", ("#root", (), ("x",))),
    ("<!-->y", ("#root", (), ("y",))),
    # junk-attributed raw-text end tag: fast ends the element at
    # '</script foo="bar">' and keeps 'x' as data; stdlib swallows 'x'
    ('<script></script foo="bar">x', ("#root", (), (("script", (), ()), "x"))),
]


@pytest.mark.parametrize("case,expected", DIVERGENT_CASES,
                         ids=[c[:20] for c, _ in DIVERGENT_CASES])
def test_divergent_cases_pinned(case, expected):
    assert _tree(case, "fast") == expected


def test_fixture_documents_equivalent():
    pages = [FX.HTML_ARTICLE, FX.HTML_TABLE_PAGE]
    for enc in ("utf-8", "cp1251", "koi8_r"):
        raw = FX.cyrillic_html(enc, declare=(enc == "cp1251"))
        pages.append(detect_decode(raw)[0])
    for html in pages:
        assert _tree(html, "fast") == _tree(html, "stdlib")
        assert extract_html(html, engine="fast") == \
            extract_html(html, engine="stdlib")


def test_corpus_equivalent_two_seeds():
    """Block-for-block equality across every decodable HTML page in the
    synthetic corpus at two generator seeds (~1.8k HTML docs)."""
    checked = 0
    for seed in (11, 42):
        pdf = generate_pages(2000, seed=seed)
        for html in pdf["html"]:
            if not isinstance(html, (bytes, bytearray)):
                continue
            try:
                text, _enc = detect_decode(html)
            except Exception:
                continue
            if "<html" not in text[:400].lower():
                continue
            assert extract_html(text, engine="fast") == \
                extract_html(text, engine="stdlib")
            checked += 1
    assert checked > 1500
