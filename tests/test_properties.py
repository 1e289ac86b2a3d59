"""Property-based invariants (hypothesis) for the deterministic core.

These pin the contracts that make "byte-identical extracted text per url"
hold under arbitrary content: span integrity, budget enforcement, chunk-id
density, determinism, and extractor totality (never raises on weird input).
Pure-Python properties — no Spark session, so hypothesis can run hundreds
of examples cheaply.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_rag_spark.functions.tokens import count_tokens, token_spans
from docling_rag_spark.operators.blocks import Block, chunk_blocks
from docling_rag_spark.operators.extract_html import extract_html
from docling_rag_spark.operators.extract_markdown import extract_markdown

# text including unicode (cyrillic, CJK, emoji) and whitespace runs
_text = st.text(
    alphabet=st.characters(codec="utf-8",
                           categories=("L", "N", "P", "Zs", "S")),
    min_size=0, max_size=400)
_kind = st.sampled_from(["text", "heading", "code", "table"])


@st.composite
def _blocks(draw):
    n = draw(st.integers(0, 12))
    out = []
    for _ in range(n):
        kind = draw(_kind)
        text = draw(_text)
        level = draw(st.integers(1, 6)) if kind == "heading" else 0
        page = draw(st.integers(1, 9))
        out.append(Block(kind, text, level=level, page=page))
    return out


@given(_blocks(), st.integers(8, 64))
@settings(max_examples=150, deadline=None)
def test_chunk_invariants(blocks, budget):
    extracted, chunks = chunk_blocks(blocks, max_tokens=budget)
    raw = extracted.encode("utf-8")
    for i, c in enumerate(chunks):
        # dense reading-order ids (reference core/chunker.py:79)
        assert c.chunk_id == i
        # byte span reconstructs the text exactly
        assert raw[c.span[0]:c.span[1]].decode("utf-8") == c.text
        # non-atomic chunks respect the budget; token_count is truthful
        if c.element_type == "text":
            assert c.token_count <= budget
        # recorded token_count is exactly the counter's answer on the text
        assert c.token_count == count_tokens(c.text)
        assert c.element_type in ("text", "table", "code")
        assert c.page_number >= 1
        # context = heading path + text (reference core/chunker.py:80)
        assert c.context_text == "\n".join([*c.headings, c.text])


@given(_blocks(), st.integers(8, 64))
@settings(max_examples=60, deadline=None)
def test_chunk_deterministic(blocks, budget):
    assert chunk_blocks(blocks, max_tokens=budget) == \
        chunk_blocks(blocks, max_tokens=budget)


@given(_text)
@settings(max_examples=150, deadline=None)
def test_token_spans_partition_consistent(text):
    spans = token_spans(text)
    assert len(spans) == count_tokens(text)
    # spans are strictly ordered, non-overlapping, in-bounds
    prev = 0
    for s, e in spans:
        assert prev <= s < e <= len(text)
        prev = e


@given(st.text(min_size=0, max_size=2000))
@settings(max_examples=100, deadline=None)
def test_markdown_extractor_total(text):
    blocks = extract_markdown(text)
    for b in blocks:
        assert b.kind in ("heading", "text", "code", "table")
        assert isinstance(b.text, str)


@given(st.text(min_size=0, max_size=2000))
@settings(max_examples=100, deadline=None)
def test_html_extractor_total_on_junk(text):
    # arbitrary junk (not even valid html) must never raise
    blocks = extract_html(text)
    for b in blocks:
        assert b.kind in ("heading", "text", "code", "table")


@given(st.lists(st.tuples(_kind, _text), max_size=8), st.integers(8, 64))
@settings(max_examples=60, deadline=None)
def test_extracted_text_contains_all_chunks_in_order(pairs, budget):
    blocks = [Block(k, t) for k, t in pairs]
    extracted, chunks = chunk_blocks(blocks, max_tokens=budget)
    pos = 0
    for c in chunks:
        found = extracted.find(c.text, pos)
        assert found >= 0
        pos = found


# --- charset detector properties (round 3) -----------------------------------

_ru_words = st.lists(
    st.text(alphabet="абвгдежзиклмнопрстуфхцчшщыьэюя", min_size=3,
            max_size=10),
    min_size=8, max_size=40)


@settings(max_examples=150, deadline=None)
@given(_ru_words, st.sampled_from(["cp1251", "koi8_r"]))
def test_charset_heuristic_recovers_russian(words, codec):
    """Any undeclared lowercase-Russian text round-trips through the case
    heuristic: detect_decode(text.encode(codec)) == text."""
    from docling_rag_spark.operators.charset import detect_decode
    text = " ".join(words)
    got, enc = detect_decode(text.encode(codec))
    assert enc == codec
    assert got == text


@settings(max_examples=150, deadline=None)
@given(st.text(min_size=0, max_size=500))
def test_charset_utf8_is_self_identifying(text):
    from docling_rag_spark.operators.charset import detect_decode
    got, enc = detect_decode(text.encode("utf-8"))
    assert enc == "utf-8" and got == text


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_charset_detector_total(payload):
    """detect_decode never raises on arbitrary bytes and always returns a
    str (fail-soft contract of the decode layer)."""
    from docling_rag_spark.operators.charset import detect_decode
    got, enc = detect_decode(payload)
    assert isinstance(got, str) and isinstance(enc, str)
