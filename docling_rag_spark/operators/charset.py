"""Charset sniffing + decoding for crawl HTML/markdown payloads.

The reference is a Russian-language RAG (reference CLAUDE.md:4) whose
Docling converter handles source encodings inside
``DocumentConverter.convert()`` (reference core/parser.py:116); a real
Common-Crawl slice of Russian pages is heavily windows-1251 / koi8-r.
Decoding those strictly as UTF-8 with ``errors='replace'`` produces clean
``status='ok'`` mojibake — silent wrongness — so every textual payload goes
through this detector before parsing:

1. **BOM** (utf-8-sig / utf-16 le/be) wins outright.
2. **Declared charset**: ``<meta charset=…>``, ``<meta http-equiv
   Content-Type …charset=…>``, or an ``<?xml encoding=…?>`` prolog in the
   first 4 KiB (charset declarations are ASCII in every encoding we accept,
   including cp1251/koi8-r, so the byte-regex is safe pre-decode).
3. **Strict UTF-8 probe**: valid UTF-8 is self-identifying.
4. **Cyrillic case heuristic** for undeclared 8-bit pages: cp1251 maps
   lowercase Cyrillic to 0xE0–0xFF while koi8-r maps it to 0xC0–0xDF;
   running Russian text is overwhelmingly lowercase, so whichever decode
   yields more lowercase Cyrillic wins. Pages with no Cyrillic signal fall
   back to cp1252 (Western superset of latin-1).

Pure function of the payload bytes — deterministic across executors, no
external detector library (none ships in this sandbox).
"""

from __future__ import annotations

import codecs
import re

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE)
_XML_ENCODING_RE = re.compile(
    rb"""<\?xml[^>]+encoding\s*=\s*["']([a-zA-Z0-9_\-]+)""", re.IGNORECASE)

# Accepted declared charsets -> python codec. Anything else declared is
# looked up via codecs (unknown names fall through to the heuristic).
_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "windows-1251": "cp1251", "win-1251": "cp1251", "cp1251": "cp1251",
    "koi8-r": "koi8_r", "koi8r": "koi8_r", "koi8_r": "koi8_r",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "us-ascii": "ascii", "ascii": "ascii",
}

_LOWER_CYR = set("абвгдежзийклмнопрстуфхцчшщъыьэюяё")
# control bytes that mark a payload as binary: <9 or 14..31
_CTRL_BYTES = bytes(range(0, 9)) + bytes(range(14, 32))


def declared_charset(head: bytes) -> str | None:
    """Codec named by a meta/xml declaration in ``head``, or None."""
    for rx in (_META_CHARSET_RE, _XML_ENCODING_RE):
        m = rx.search(head)
        if m:
            name = m.group(1).decode("ascii", errors="replace").lower()
            if name in _ALIASES:
                return _ALIASES[name]
            try:
                info = codecs.lookup(name)
            except LookupError:
                return None
            # bytes-to-bytes codecs ('hex', 'zlib', 'base64', …) resolve in
            # codecs.lookup but raise on bytes.decode — a page declaring one
            # must fall through to the heuristic, not error out
            try:
                b"".decode(info.name)
            except Exception:
                return None
            return info.name
    return None


def sniff_bom(data: bytes) -> tuple[str, int] | None:
    """(codec, bom_length) when a BOM is present."""
    if data.startswith(codecs.BOM_UTF8):
        return "utf-8", len(codecs.BOM_UTF8)
    if data.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le", 2
    if data.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be", 2
    return None


def _lower_cyrillic_score(text: str) -> int:
    return sum(1 for ch in text if ch in _LOWER_CYR)


def _plausible_utf16(data: bytes, codec: str) -> bool:
    """Guard against 8-bit pages whose first two bytes collide with a
    UTF-16 BOM: cp1251 'юя' is 0xFE 0xFF (the BE BOM) and 'яю' is the LE
    BOM, so a Russian page can open with one by accident. Genuine UTF-16
    decodes to ordinary text; an 8-bit page read as UTF-16 lands almost
    entirely in the private-use area / stray controls. Probe the head and
    require the garbage ratio to stay small."""
    if len(data) % 2:
        # crawler truncation mid-code-unit: judge the even prefix — a
        # genuine UTF-16 page loses only its final code unit this way
        data = data[:-1]
    probe = data[:4096].decode(codec, errors="replace")
    if not probe:
        return True
    bad = sum(
        1 for ch in probe
        if 0xE000 <= ord(ch) <= 0xF8FF      # private use area
        or ord(ch) == 0xFFFD                # replacement
        or (ord(ch) < 32 and ch not in "\t\n\r\f")
        or 0x80 <= ord(ch) <= 0x9F)         # C1 controls
    return bad <= len(probe) // 20


def detect_decode(data: bytes) -> tuple[str, str]:
    """Decode crawl bytes -> (text, codec_used). Never raises."""
    bom = sniff_bom(data)
    if bom:
        codec, n = bom
        if not codec.startswith("utf-16") or _plausible_utf16(data[n:], codec):
            return data[n:].decode(codec, errors="replace"), codec
    enc = declared_charset(data[:4096])
    if enc is not None:
        return data.decode(enc, errors="replace"), enc
    try:
        return data.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass
    # undeclared 8-bit page: cp1251 vs koi8-r by lowercase-Cyrillic mass
    # (sampled head keeps the probe O(1) for huge payloads)
    probe = data[:16384]
    as_1251 = probe.decode("cp1251", errors="replace")
    as_koi8 = probe.decode("koi8_r", errors="replace")
    s1251, skoi8 = (_lower_cyrillic_score(as_1251),
                    _lower_cyrillic_score(as_koi8))
    if max(s1251, skoi8) >= max(8, len(probe) // 200):
        codec = "cp1251" if s1251 >= skoi8 else "koi8_r"
        return data.decode(codec, errors="replace"), codec
    return data.decode("cp1252", errors="replace"), "cp1252"


def looks_binary(head: bytes) -> bool:
    """True for payloads that no accepted text codec could mean: NULs
    (outside a utf-16 BOM context) or a high control-byte ratio."""
    if not head:
        return False
    if sniff_bom(head):
        return False
    if b"\x00" in head:
        return True
    # C-speed control-byte count: translate(None, delete=ctrl) drops exactly
    # the bytes the old per-byte loop counted (<9 or 14..31)
    ctrl = len(head) - len(head.translate(None, _CTRL_BYTES))
    return ctrl > len(head) // 20
