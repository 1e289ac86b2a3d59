"""Block model + hierarchical token-budget chunker (the HybridChunker analog).

A format extractor (markdown / html / pdf) turns one document into an ordered
list of :class:`Block` rows — the Spark-side analog of the reference's
in-memory ``DoclingDocument`` tree (reference: core/parser.py:87-117). The
chunker then re-implements, from scratch, the *contract* of docling-core's
``HybridChunker`` as used by the reference (core/chunker.py:45-93;
CLAUDE.md:127-132):

  * structure-aware: a heading starts a new section; the live heading path is
    recorded on every chunk (``headings``) and prepended in ``context_text``;
  * tables and code blocks are atomic — never split, never merged;
  * text sections exceeding the token budget are split at token boundaries,
    preferring sentence ends;
  * adjacent small text blocks under the same heading path are greedily
    merged up to the budget ("merges small peer chunks");
  * ``chunk_id`` enumerates chunks per document in reading order
    (core/chunker.py:79); ``page_number`` = first item's page, default 1
    (core/chunker.py:34-42); ``element_type`` ∈ {text, table, code}
    (core/chunker.py:21-31).

Everything here is a pure function of (blocks, budget) — this is what makes
"byte-identical extracted text per url" a testable invariant. ``span`` is the
UTF-8 **byte** range of the chunk text inside ``extracted_text``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from docling_rag_spark.config import CHUNK_MAX_TOKENS
from docling_rag_spark.functions.tokens import count_tokens, token_spans

BLOCK_SEP = "\n\n"
_SENTENCE_ENDS = frozenset({".", "!", "?"})


@dataclass
class Block:
    kind: str            # 'heading' | 'text' | 'code' | 'table'
    text: str
    level: int = 0       # heading level (1..6) for kind == 'heading'
    page: int = 1


@dataclass
class Chunk:
    chunk_id: int
    text: str
    context_text: str
    page_number: int
    element_type: str            # 'text' | 'table' | 'code'
    headings: list[str]
    char_span: tuple[int, int]   # char offsets into extracted_text
    span: tuple[int, int] = (0, 0)  # byte offsets (filled by _byte_spans)
    token_count: int = 0


@dataclass
class _Piece:
    """A contiguous slice of extracted_text feeding one chunk."""
    start: int
    end: int
    page: int
    tokens: int


def assemble_extracted_text(blocks: list[Block]) -> tuple[str, list[tuple[int, int]]]:
    """Join non-empty block texts with BLOCK_SEP; return text + char offsets."""
    parts: list[str] = []
    offsets: list[tuple[int, int]] = []
    pos = 0
    for b in blocks:
        if pos:
            pos += len(BLOCK_SEP)
        offsets.append((pos, pos + len(b.text)))
        parts.append(b.text)
        pos += len(b.text)
    return BLOCK_SEP.join(parts), offsets


def _split_long_text(text: str, base: int, page: int, budget: int) -> list[_Piece]:
    """Split one over-budget text block into <=budget-token pieces.

    Window = next `budget` tokens; within a window we cut after the last
    sentence-ending token in its second half (so pieces stay >= budget/2),
    else at the window end. Piece bounds are token-aligned => no stray
    whitespace at piece edges.
    """
    spans = token_spans(text)
    pieces: list[_Piece] = []
    i = 0
    n = len(spans)
    while i < n:
        j = min(i + budget, n)
        cut = j
        if j < n:  # look for a sentence end in the second half of the window
            for k in range(j - 1, i + budget // 2 - 1, -1):
                s, e = spans[k]
                if text[s:e] in _SENTENCE_ENDS:
                    cut = k + 1
                    break
        start = spans[i][0]
        end = spans[cut - 1][1]
        pieces.append(_Piece(base + start, base + end, page, cut - i))
        i = cut
    return pieces


def chunk_blocks(blocks: list[Block], max_tokens: int = CHUNK_MAX_TOKENS
                 ) -> tuple[str, list[Chunk]]:
    """Chunk a block list; returns (extracted_text, chunks with byte spans)."""
    blocks = [b for b in blocks if b.text and b.text.strip()]
    extracted, offsets = assemble_extracted_text(blocks)

    chunks: list[Chunk] = []
    heading_stack: list[tuple[int, str]] = []   # (level, text)
    pending: list[_Piece] = []
    pending_tokens = 0

    def emit(pieces: list[_Piece], element_type: str) -> None:
        start, end = pieces[0].start, pieces[-1].end
        text = extracted[start:end]
        headings = [t for _, t in heading_stack]
        chunks.append(Chunk(
            chunk_id=len(chunks),
            text=text,
            context_text="\n".join([*headings, text]),
            page_number=pieces[0].page,
            element_type=element_type,
            headings=headings,
            char_span=(start, end),
            token_count=sum(p.tokens for p in pieces),
        ))

    def flush() -> None:
        nonlocal pending, pending_tokens
        if pending:
            emit(pending, "text")
            pending = []
            pending_tokens = 0

    for b, (off, end) in zip(blocks, offsets):
        if b.kind == "heading":
            flush()
            lvl = b.level or 1
            while heading_stack and heading_stack[-1][0] >= lvl:
                heading_stack.pop()
            heading_stack.append((lvl, b.text))
        elif b.kind in ("table", "code"):
            flush()
            emit([_Piece(off, end, b.page, count_tokens(b.text))], b.kind)
        else:  # text
            t = count_tokens(b.text)
            if t > max_tokens:
                flush()
                for piece in _split_long_text(b.text, off, b.page, max_tokens):
                    emit([piece], "text")
            else:
                if pending and pending_tokens + t > max_tokens:
                    flush()
                pending.append(_Piece(off, end, b.page, t))
                pending_tokens += t
    flush()

    _byte_spans(extracted, chunks)
    return extracted, chunks


def _byte_spans(extracted: str, chunks: list[Chunk]) -> None:
    """Convert char spans -> UTF-8 byte spans in one forward pass."""
    if extracted.isascii():  # 1 byte per char: spans are already byte spans
        for c in chunks:
            c.span = c.char_span
        return
    marks = sorted({0, *(m for c in chunks for m in c.char_span)})
    byte_of: dict[int, int] = {}
    bpos = cpos = 0
    for m in marks:
        bpos += len(extracted[cpos:m].encode("utf-8"))
        cpos = m
        byte_of[m] = bpos
    for c in chunks:
        c.span = (byte_of[c.char_span[0]], byte_of[c.char_span[1]])
