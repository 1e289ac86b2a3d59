"""Minimal from-scratch PDF text-layer reader + digital/scan detector.

Replaces the reference's pypdfium2-based text-layer detection
(core/parser.py:16-53) and the Docling PDF parse (core/parser.py:87-117) for
the digital-text path. OCR is out of scope (no models in this environment;
reference ``ocr=off`` path) — scan pages simply yield no text.

Detection semantics mirror the reference exactly:
  * sample ``min(n, 10)`` pages evenly: ``step=(n-1)/max(count-1,1)``,
    ``indices = sorted({round(i*step)})`` (core/parser.py:37-39);
  * a page is "texty" if its stripped text has >= 100 chars
    (core/parser.py:17,44-45);
  * digital iff texty/sampled >= 0.5 (core/parser.py:18,46);
  * any read error -> (False, 0, 0) fail-soft (core/parser.py:29-31).

The reader is a tolerant scanner over the PDF object graph: it resolves the
page tree (/Root -> /Pages -> /Kids, recursively), pulls each page's
/Contents streams (FlateDecode supported via zlib), and decodes the text
operators Tj / TJ / ' / " including escape sequences and octal escapes. This
covers real digital-text PDFs with unencrypted, Flate-or-plain content
streams — the fixture shapes of the reference test-suite
(tests/pdf_fixtures.py) and typical Common-Crawl digital PDFs.
"""

from __future__ import annotations

import re
import zlib

from docling_rag_spark.config import (
    DETECT_MAX_PAGES,
    DETECT_MIN_CHARS,
    DETECT_TEXT_RATIO,
)
from docling_rag_spark.operators.blocks import Block

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_TEXT_SHOW_RE = re.compile(rb"\((?:\\.|[^()\\])*\)\s*(?:Tj|')|\[(?:[^\]]*)\]\s*TJ", re.DOTALL)
_STRING_RE = re.compile(rb"\((?:\\.|[^()\\])*\)", re.DOTALL)
_ESCAPE_RE = re.compile(rb"\\([0-7]{1,3}|.)", re.DOTALL)
_ESCAPE_MAP = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
               b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


class PdfError(Exception):
    pass


def _parse_objects(data: bytes) -> dict[int, bytes]:
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(3)
    if not objs:
        raise PdfError("no objects")
    return objs


def _dict_part(body: bytes) -> bytes:
    """The object's dictionary portion (before any stream keyword)."""
    idx = body.find(b"stream")
    return body[:idx] if idx >= 0 else body


_PAGES_TYPE_RE = re.compile(rb"/Type\s*/Pages\b")
_PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page\b")


def _find_pages(objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in page-tree order; falls back to object order."""
    roots = [n for n, b in objs.items()
             if _PAGES_TYPE_RE.search(_dict_part(b)) and b"/Parent" not in _dict_part(b)]
    ordered: list[int] = []
    seen: set[int] = set()

    def descend(num: int) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        body = _dict_part(objs[num])
        if _PAGES_TYPE_RE.search(body):
            km = re.search(rb"/Kids\s*\[(.*?)\]", body, re.DOTALL)
            if km:
                for r in _REF_RE.finditer(km.group(1)):
                    descend(int(r.group(1)))
        elif _PAGE_TYPE_RE.search(body):
            ordered.append(num)

    for r in roots:
        descend(r)
    if not ordered:  # tolerant fallback: any /Type /Page object, numeric order
        ordered = sorted(
            n for n, b in objs.items() if _PAGE_TYPE_RE.search(_dict_part(b))
        )
    if not ordered:
        raise PdfError("no pages")
    return ordered


def _content_bytes(objs: dict[int, bytes], page_body: bytes) -> bytes:
    cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", page_body)
    refs: list[int] = []
    if cm:
        refs = [int(cm.group(1))]
    else:
        am = re.search(rb"/Contents\s*\[(.*?)\]", page_body, re.DOTALL)
        if am:
            refs = [int(r.group(1)) for r in _REF_RE.finditer(am.group(1))]
    out = b""
    for ref in refs:
        body = objs.get(ref, b"")
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        raw = sm.group(1)
        if b"/FlateDecode" in _dict_part(body):
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        out += raw + b"\n"
    return out


def _decode_string(s: bytes) -> str:
    inner = s[1:-1]

    def sub(m: re.Match) -> bytes:
        g = m.group(1)
        if g[:1].isdigit():
            return bytes([int(g, 8) & 0xFF])
        return _ESCAPE_MAP.get(g, g)

    return _ESCAPE_RE.sub(sub, inner).decode("latin-1")


def _page_text(content: bytes) -> str:
    runs: list[str] = []
    for m in _TEXT_SHOW_RE.finditer(content):
        for sm in _STRING_RE.finditer(m.group(0)):
            runs.append(_decode_string(sm.group(0)))
    return "\n".join(r for r in runs if r)


def read_pdf_pages(data: bytes) -> list[str]:
    """Extracted text per page, in page order. Raises PdfError on junk input."""
    if not data.startswith(b"%PDF-"):
        raise PdfError("not a pdf")
    objs = _parse_objects(data)
    pages = _find_pages(objs)
    texts: list[str] = []
    for p in pages:
        try:
            texts.append(_page_text(_content_bytes(objs, _dict_part(objs[p]))))
        except Exception:
            texts.append("")  # unreadable page == page without text
    return texts


def detect_text_layer(data: bytes) -> tuple[bool, int, int]:
    """(has_text_layer, texty_pages, pages_sampled) — reference S3 semantics."""
    try:
        page_texts = read_pdf_pages(data)
    except Exception:
        return False, 0, 0
    n = len(page_texts)
    if n == 0:
        return False, 0, 0
    count = min(n, DETECT_MAX_PAGES)
    step = (n - 1) / max(count - 1, 1)
    indices = sorted({round(i * step) for i in range(count)})
    text_pages = sum(
        1 for idx in indices if len(page_texts[idx].strip()) >= DETECT_MIN_CHARS
    )
    return (text_pages / len(indices)) >= DETECT_TEXT_RATIO, text_pages, len(indices)


def extract_pdf(data: bytes) -> list[Block]:
    """Digital-text PDF -> one text block per non-empty page (reading order)."""
    blocks: list[Block] = []
    for i, text in enumerate(read_pdf_pages(data)):
        t = text.strip()
        if t:
            blocks.append(Block("text", t, page=i + 1))
    return blocks
