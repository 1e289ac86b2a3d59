from docling_rag_spark.operators.extract_markdown import extract_markdown
from docling_rag_spark.sources.fixtures import E2E_MARKDOWN


def kinds(blocks):
    return [(b.kind, b.level) if b.kind == "heading" else b.kind for b in blocks]


def test_e2e_fixture_blocks():
    blocks = extract_markdown(E2E_MARKDOWN)
    assert kinds(blocks) == [("heading", 1), "text", ("heading", 2), "code"]
    assert blocks[0].text == "Database Architecture"
    assert blocks[1].text == "The DWH uses a star schema with fact and dimension tables."
    assert blocks[2].text == "SQL Example"
    assert blocks[3].text == "SELECT customer_id, SUM(amount)\nFROM fact_sales\nGROUP BY customer_id;"


def test_paragraph_softwrap_joined():
    blocks = extract_markdown("line one\nline two\n\nnext para\n")
    assert [b.text for b in blocks] == ["line one line two", "next para"]


def test_table_block():
    md = "| a | b |\n|---|---|\n| 1 | 2 |\n"
    blocks = extract_markdown(md)
    assert len(blocks) == 1 and blocks[0].kind == "table"
    assert blocks[0].text == "| a | b |\n|---|---|\n| 1 | 2 |"


def test_list_items_one_block():
    blocks = extract_markdown("- first item\n- second item\n1. third\n")
    assert len(blocks) == 1 and blocks[0].kind == "text"
    assert blocks[0].text == "first item\nsecond item\nthird"


def test_unclosed_fence_tolerated():
    blocks = extract_markdown("```\ncode here\n")
    assert [b.kind for b in blocks] == ["code"]
    assert blocks[0].text == "code here"


def test_empty_doc():
    assert extract_markdown("") == []
    assert extract_markdown("\n\n  \n") == []


def test_setext_headings_and_thematic_break():
    md = ("Main Title\n==========\n\nintro paragraph text here\n\n"
          "Section Two\n-----------\n\nbody text\n\n---\n\ntail text\n")
    blocks = extract_markdown(md)
    kinds = [(b.kind, getattr(b, "level", None), b.text) for b in blocks]
    assert kinds[0] == ("heading", 1, "Main Title")
    assert ("heading", 2, "Section Two") in kinds
    # the bare --- with no pending paragraph is a break, not a heading
    assert sum(1 for k, _, _ in kinds if k == "heading") == 2
    assert [b.text for b in blocks if b.kind == "text"] == [
        "intro paragraph text here", "body text", "tail text"]


def test_blockquote_text_preserved_markers_stripped():
    md = ("> quoted wisdom line one\n> and line two\n\n"
          ">> nested quote depth two\n\nplain after\n")
    blocks = extract_markdown(md)
    texts = [b.text for b in blocks if b.kind == "text"]
    assert texts[0] == "quoted wisdom line one and line two"
    assert texts[1] == "nested quote depth two"
    assert texts[2] == "plain after"


def test_fence_info_string_with_spaces():
    """CommonMark allows arbitrary info strings ('```js {highlight}');
    the opening fence must not be demoted to a paragraph."""
    bs = extract_markdown(
        "``` python example\nx = 1\n```\n\nA paragraph after the fence.")
    assert (bs[0].kind, bs[0].text) == ("code", "x = 1")
    assert bs[1].text == "A paragraph after the fence."


def test_longer_closing_fence_and_backticks_in_code():
    bs = extract_markdown("````\ncode with ``` inside\n````\nafter para.")
    assert (bs[0].kind, bs[0].text) == ("code", "code with ``` inside")
    assert bs[1].text == "after para."


def test_heading_keeps_unspaced_trailing_hash():
    """'# Intro to C#' keeps its '#'; a whitespace-preceded closing
    sequence ('# foo ##') is still stripped (CommonMark)."""
    assert extract_markdown("# Intro to C#\n")[0].text == "Intro to C#"
    assert extract_markdown("# foo ##\n")[0].text == "foo"
