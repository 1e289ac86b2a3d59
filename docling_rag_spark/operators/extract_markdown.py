"""Markdown / plain-text -> Block list.

Covers the reference's ``.md`` input path (core/parser.py:9; the Docling
markdown backend produced heading/code/table/text items which HybridChunker
consumed — reference e2e fixture tests/test_integration.py:22-27). From
scratch: ATX headings, fenced code, pipe tables, lists, paragraphs.

Deterministic normalization: paragraph soft-wraps join with a single space;
list items join with newlines; code fences keep inner text verbatim (fence
markers excluded); table rows keep their raw pipe lines.
"""

from __future__ import annotations

import re

from docling_rag_spark.operators.blocks import Block

# a trailing '#' run is a closing sequence ONLY when whitespace-preceded
# (CommonMark): '# Intro to C#' keeps its '#', '# foo ##' drops it
_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)(?:\s+#+)?\s*$")
# opening fence: 3+ backticks/tildes + arbitrary info string (spaces
# allowed per CommonMark; backtick fences forbid backticks in the info)
_FENCE_RE = re.compile(r"^(```+|~~~+)(.*)$")
_CLOSE_FENCE_RE = re.compile(r"^(```+|~~~+)\s*$")
_TABLE_RE = re.compile(r"^\s*\|.*\|\s*$")
_LIST_RE = re.compile(r"^\s*(?:[-*+]|\d+[.)])\s+(.*)$")
# setext underline: '===' -> h1 / '---' -> h2, but ONLY under a pending
# paragraph line (CommonMark); a bare '---' with nothing pending is a
# thematic break and is dropped
_SETEXT_RE = re.compile(r"^\s*(=+|-+)\s*$")
_BLOCKQUOTE_RE = re.compile(r"^\s*(?:>\s?)+")


def extract_markdown(text: str) -> list[Block]:
    blocks: list[Block] = []
    lines = text.split("\n")
    i, n = 0, len(lines)
    para: list[str] = []
    items: list[str] = []

    def flush_para() -> None:
        if para:
            blocks.append(Block("text", " ".join(para)))
            para.clear()

    def flush_items() -> None:
        if items:
            blocks.append(Block("text", "\n".join(items)))
            items.clear()

    while i < n:
        line = lines[i]
        stripped = line.strip()

        fence = _FENCE_RE.match(stripped)
        if fence and not (fence.group(1)[0] == "`" and "`" in fence.group(2)):
            flush_para(); flush_items()
            marker = fence.group(1)
            i += 1
            code: list[str] = []
            while i < n:
                close = _CLOSE_FENCE_RE.match(lines[i].strip())
                if (close and close.group(1)[0] == marker[0]
                        and len(close.group(1)) >= len(marker)):
                    break
                code.append(lines[i])
                i += 1
            i += 1  # skip closing fence (or EOF)
            body = "\n".join(code).strip("\n")
            if body.strip():
                blocks.append(Block("code", body))
            continue

        if not stripped:
            flush_para(); flush_items()
            i += 1
            continue

        m = _HEADING_RE.match(stripped)
        if m:
            flush_para(); flush_items()
            blocks.append(Block("heading", m.group(2), level=len(m.group(1))))
            i += 1
            continue

        m = _SETEXT_RE.match(line)
        if m:
            if para:  # setext heading closes the pending paragraph line(s)
                blocks.append(Block(
                    "heading", " ".join(para),
                    level=1 if m.group(1)[0] == "=" else 2))
                para.clear()
            # else: thematic break — structural only, no text
            flush_items()
            i += 1
            continue

        bq = _BLOCKQUOTE_RE.match(line)
        if bq:  # quoted content keeps its text, loses the marker
            line = line[bq.end():]
            stripped = line.strip()
            if not stripped:
                flush_para(); flush_items()
                i += 1
                continue

        if _TABLE_RE.match(line):
            flush_para(); flush_items()
            rows: list[str] = []
            while i < n and _TABLE_RE.match(lines[i]):
                rows.append(lines[i].strip())
                i += 1
            blocks.append(Block("table", "\n".join(rows)))
            continue

        m = _LIST_RE.match(line)
        if m:
            flush_para()
            items.append(m.group(1).strip())
            i += 1
            continue

        flush_items()
        para.append(stripped)
        i += 1

    flush_para(); flush_items()
    return blocks
