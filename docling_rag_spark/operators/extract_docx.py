"""DOCX (OOXML WordprocessingML) -> Block list.

Closes the last format-parity gap with the reference's
``SUPPORTED_EXTENSIONS = {.pdf, .docx, .md}`` (core/parser.py:9): a .docx is
a zip archive whose main part ``word/document.xml`` holds the body as
``w:p`` paragraphs and ``w:tbl`` tables. Stdlib-only parse (zipfile +
xml.etree — defused by construction: we never resolve external entities;
ElementTree does not expand external DTDs).

Block mapping (mirrors the docling DocumentConverter item labels the
reference chunks over, SURVEY.md §2.10 X1/X2):
  * paragraph with ``w:pStyle`` matching Heading{1..6}/Title → heading
    (Title = level 1);
  * paragraph in a Code/SourceCode-styled run → code;
  * ``w:tbl`` → one atomic table block, cells joined ``' | '``, rows by
    newline (same serialization as the HTML table path);
  * other paragraphs → text; empty paragraphs dropped;
  * text runs concatenate ``w:t`` leaves; ``w:tab`` → tab, ``w:br`` →
    newline inside the paragraph.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

from docling_rag_spark.operators.blocks import Block

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_HEADING_STYLE_RE = re.compile(r"(?:heading|berschrift)(\d)$", re.IGNORECASE)
_CODE_STYLE_RE = re.compile(r"(?:code|sourcecode|verbatim)", re.IGNORECASE)

DOCX_MAGIC = b"PK\x03\x04"
# decompression cap: a 1 MB crafted docx can inflate ~1000:1; an oversized
# document.xml becomes a catchable fail-soft error, not an executor OOM
MAX_DOCUMENT_XML_BYTES = 64 * 1024 * 1024


def is_docx(payload: bytes) -> bool:
    """Sniff without opening the archive: zip magic + the main part's name,
    which appears uncompressed in the local file header / central directory
    (a full ZipFile parse here would be repeated by extract_docx on every
    row of the hot path)."""
    return (payload.startswith(DOCX_MAGIC)
            and payload.find(b"word/document.xml") != -1)


_MC = "{http://schemas.openxmlformats.org/markup-compatibility/2006}"


def _run_text(p) -> str:
    out: list[str] = []

    def visit(node) -> None:
        tag = node.tag
        if tag == f"{_W}t":
            out.append(node.text or "")
        elif tag == f"{_W}tab":
            out.append("\t")
        elif tag in (f"{_W}br", f"{_W}cr"):
            out.append("\n")
        elif tag == f"{_MC}AlternateContent":
            # Choice and Fallback carry the SAME content twice (text boxes,
            # drawings); read exactly one branch or the text duplicates
            branch = node.find(f"{_MC}Fallback")
            if branch is None:
                branch = node.find(f"{_MC}Choice")
            if branch is not None:
                for ch in branch:
                    visit(ch)
        else:
            for ch in node:
                visit(ch)

    for ch in p:
        visit(ch)
    return "".join(out)


def _content_elements(parent):
    """Direct w:p / w:tbl children, descending through w:sdt content
    controls (Word wraps TOCs, cover pages, and templated sections in
    sdt; skipping them silently drops whole sections)."""
    for child in parent:
        if child.tag in (f"{_W}p", f"{_W}tbl"):
            yield child
        elif child.tag == f"{_W}sdt":
            content = child.find(f"{_W}sdtContent")
            if content is not None:
                yield from _content_elements(content)


def _p_style(p) -> str:
    el = p.find(f"{_W}pPr/{_W}pStyle")
    return (el.get(f"{_W}val") or "") if el is not None else ""


def _table_text(tbl) -> str:
    rows: list[str] = []
    for tr in tbl.findall(f"{_W}tr"):
        cells = []
        for tc in tr.findall(f"{_W}tc"):
            cells.append(" ".join(
                t for t in (
                    (_run_text(el) if el.tag == f"{_W}p"
                     else _table_text(el).replace("\n", " ")).strip()
                    for el in _content_elements(tc)) if t))
        if any(cells):
            rows.append(" | ".join(cells))
    return "\n".join(rows)


def extract_docx(payload: bytes) -> list[Block]:
    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        info = z.getinfo("word/document.xml")
        if info.file_size > MAX_DOCUMENT_XML_BYTES:
            raise ValueError(
                f"document.xml inflates to {info.file_size} bytes "
                f"(cap {MAX_DOCUMENT_XML_BYTES}); refusing decompression")
        xml_bytes = z.read("word/document.xml")
    root = ET.fromstring(xml_bytes)
    body = root.find(f"{_W}body")
    if body is None:
        return []
    blocks: list[Block] = []
    for child in _content_elements(body):
        if child.tag == f"{_W}p":
            style = _p_style(child)
            text = _run_text(child).strip()
            if not text:
                continue
            m = _HEADING_STYLE_RE.search(style)
            if m or style.lower() == "title":
                level = int(m.group(1)) if m else 1
                blocks.append(Block("heading", re.sub(r"\s+", " ", text),
                                    level=min(level, 6)))
            elif _CODE_STYLE_RE.search(style):
                blocks.append(Block("code", text))
            else:
                blocks.append(Block("text", re.sub(r"\s+", " ", text)))
        elif child.tag == f"{_W}tbl":
            body_text = _table_text(child)
            if body_text:
                blocks.append(Block("table", body_text))
    return blocks


# --- deterministic fixture builder (tests / synthetic corpus) ----------------

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types"><Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>")
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/></Relationships>')


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))


def build_docx(items: list[tuple[str, object]]) -> bytes:
    """items: ('heading', (level, text)) | ('text'|'code', text)
    | ('table', [[cell, ...], ...]) | ('sdt_text', text) → minimal valid
    .docx bytes ('sdt_text' wraps the paragraph in a w:sdt content
    control, the shape Word gives TOCs and templated sections)."""
    ns = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
    parts: list[str] = [f'<?xml version="1.0" encoding="UTF-8" '
                        f'standalone="yes"?><w:document {ns}><w:body>']
    for kind, payload in items:
        if kind == "heading":
            level, text = payload
            parts.append(
                f'<w:p><w:pPr><w:pStyle w:val="Heading{level}"/></w:pPr>'
                f"<w:r><w:t>{_esc(text)}</w:t></w:r></w:p>")
        elif kind == "code":
            parts.append(
                '<w:p><w:pPr><w:pStyle w:val="SourceCode"/></w:pPr>'
                f"<w:r><w:t>{_esc(str(payload))}</w:t></w:r></w:p>")
        elif kind == "table":
            rows = "".join(
                "<w:tr>" + "".join(
                    f"<w:tc><w:p><w:r><w:t>{_esc(str(c))}</w:t></w:r></w:p>"
                    "</w:tc>" for c in row) + "</w:tr>"
                for row in payload)
            parts.append(f"<w:tbl>{rows}</w:tbl>")
        elif kind == "sdt_text":
            parts.append(
                "<w:sdt><w:sdtPr/><w:sdtContent>"
                f"<w:p><w:r><w:t>{_esc(str(payload))}</w:t></w:r></w:p>"
                "</w:sdtContent></w:sdt>")
        else:
            parts.append(f"<w:p><w:r><w:t>{_esc(str(payload))}</w:t></w:r>"
                         "</w:p>")
    parts.append("</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("word/document.xml", "".join(parts))
    return buf.getvalue()
