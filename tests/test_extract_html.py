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


# --- hostile real-crawl markup ----------------------------------------------

def _texts(blocks):
    return [b.text for b in blocks]


def test_unclosed_tag_soup_matches_closed_variant():
    """Byte-identity across malformed variants: the same content with and
    without closing tags extracts to the identical block list."""
    body = ("<h1>Заголовок статьи</h1>"
            "<p>Первый абзац статьи достаточно длинный для порога.</p>"
            "<p>Второй абзац тоже достаточно длинный для порога отбора.")
    closed = f"<html><body><div>{body}</p></div></body></html>"
    soup = f"<div>{body}"  # no closing tags anywhere
    a, b = extract_html(closed), extract_html(soup)
    assert _texts(a) == _texts(b)
    assert a[0].text == "Заголовок статьи"


def test_deep_nesting_no_crash():
    depth = 50_000
    html = "<div>" * depth + \
        "<p>Deep but perfectly extractable paragraph content here.</p>" + \
        "</div>" * depth
    blocks = extract_html(html)
    assert _texts(blocks) == ["Deep but perfectly extractable paragraph "
                              "content here."]


def test_script_style_cdata_soup_dropped():
    html = ("<p>Real content sentence that is long enough to keep.</p>"
            "<script>var x = '<p>fake</p>'; /* <![CDATA[ junk ]]> */"
            "if (a < b && c > d) {}</script>"
            "<style>.x { content: '<div>nope</div>'; }</style>"
            "<!-- commented <p>also fake</p> -->"
            "<p>Second real sentence, also long enough to keep.</p>")
    assert _texts(extract_html(html)) == [
        "Real content sentence that is long enough to keep.",
        "Second real sentence, also long enough to keep."]


def test_nested_tables_flattened_deterministically():
    html = ("<table><tr><th>Город</th><th>Данные</th></tr>"
            "<tr><td>Москва</td><td><table><tr><td>x</td><td>y</td></tr>"
            "</table></td></tr></table>")
    blocks = extract_html(html)
    assert len(blocks) == 1 and blocks[0].kind == "table"
    assert blocks[0].text == "Город | Данные\nМосква | x y"
    # idempotent on re-parse of its own serialization context
    assert extract_html(html)[0].text == blocks[0].text


def test_control_chars_stripped_rtl_preserved():
    html = ("<p>Text with\x00 embedded\x01 NULs survives extraction "
            "cleanly here.</p>"
            "<p>עברית مع العربية — RTL content stays byte-for-byte intact "
            "in the output.</p>")
    texts = _texts(extract_html(html))
    assert texts[0] == "Text with embedded NULs survives extraction cleanly here."
    assert texts[1] == ("עברית مع العربية — RTL content stays byte-for-byte "
                        "intact in the output.")


def test_stray_end_tags_and_mismatched_nesting():
    html = ("</div></p><p>Paragraph one is long enough to pass the "
            "threshold.</p></section><b><p>Paragraph two misnested inside "
            "an unclosed bold tag, long enough.</p>")
    texts = _texts(extract_html(html))
    assert "Paragraph one is long enough to pass the threshold." in texts
    assert any("Paragraph two misnested" in t for t in texts)
