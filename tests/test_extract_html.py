from docling_rag_spark.operators.extract_html import extract_html
from docling_rag_spark.sources.fixtures import (
    HTML_ARTICLE,
    HTML_ARTICLE_MAIN_TEXTS,
    HTML_TABLE_PAGE,
)


def test_boilerplate_stripped_main_kept():
    blocks = extract_html(HTML_ARTICLE)
    got = [(b.kind, b.text) for b in blocks]
    assert got == HTML_ARTICLE_MAIN_TEXTS
    # nothing from nav / sidebar / footer / related leaked through
    joined = "\n".join(b.text for b in blocks)
    for boiler in ("Home", "Pricing", "Link one", "Copyright", "Subscribe"):
        assert boiler not in joined


def test_heading_levels():
    blocks = extract_html(HTML_ARTICLE)
    heads = [(b.level, b.text) for b in blocks if b.kind == "heading"]
    assert heads == [(1, "Query Engines"), (2, "Vectorized Execution")]


def test_table_serialization():
    blocks = extract_html(HTML_TABLE_PAGE)
    tables = [b for b in blocks if b.kind == "table"]
    assert len(tables) == 1
    assert tables[0].text == (
        "Medium | Latency\nL1 cache | 1 ns\nSSD read | 150 us"
    )


def test_link_density_drops_menus():
    html = "<body><p><a href='/a'>one</a> <a href='/b'>two</a></p>" \
           "<p>This sentence is genuine running prose with facts.</p></body>"
    blocks = extract_html(html)
    assert [b.text for b in blocks] == [
        "This sentence is genuine running prose with facts."
    ]


def test_short_fragments_dropped_unless_sentencey():
    html = "<body><div>Tags</div><div>Short but a sentence.</div></body>"
    texts = [b.text for b in extract_html(html)]
    assert texts == ["Short but a sentence."]


def test_malformed_html_tolerated():
    blocks = extract_html("<body><p>unclosed paragraph with enough characters here")
    assert [b.text for b in blocks] == [
        "unclosed paragraph with enough characters here"
    ]


def test_entities_decoded():
    blocks = extract_html(
        "<body><p>fish &amp; chips cost &lt;5 euro, which is cheap.</p></body>"
    )
    assert blocks[0].text == "fish & chips cost <5 euro, which is cheap."
