"""Detector matrix mirrors reference tests/core/test_parser.py:49-92."""

from docling_rag_spark.operators.extract_pdf import (
    detect_text_layer,
    extract_pdf,
    read_pdf_pages,
)
from docling_rag_spark.sources.fixtures import build_scan_pdf, build_text_pdf

LONG = "This line is long enough to pass the one-hundred character page threshold easily, padded words here."
assert len(LONG) >= 100


def test_text_pdf_three_pages_detected():
    pdf = build_text_pdf([LONG] * 3)
    assert detect_text_layer(pdf) == (True, 3, 3)


def test_fifteen_pages_samples_ten():
    pdf = build_text_pdf([LONG] * 15)
    has, texty, sampled = detect_text_layer(pdf)
    assert (has, sampled) == (True, 10)
    assert texty == 10


def test_scan_pdf_no_text():
    pdf = build_scan_pdf(4)
    assert detect_text_layer(pdf) == (False, 0, 4)


def test_short_text_is_scan():
    pdf = build_text_pdf(["too short"])
    assert detect_text_layer(pdf) == (False, 0, 1)


def test_corrupt_bytes_fail_soft():
    assert detect_text_layer(b"definitely not a pdf") == (False, 0, 0)
    assert detect_text_layer(b"%PDF-1.4 garbage") == (False, 0, 0)


def test_mixed_half_ratio():
    # 2 texty of 4 sampled -> ratio 0.5 -> digital
    pdf = build_text_pdf([LONG, "x", LONG, "y"])
    assert detect_text_layer(pdf) == (True, 2, 4)


def test_page_order_and_text_roundtrip():
    pdf = build_text_pdf(["page one text", "page two text"])
    assert read_pdf_pages(pdf) == ["page one text", "page two text"]


def test_multiline_and_escapes():
    pdf = build_text_pdf(["line (a)\nline \\b"])
    assert read_pdf_pages(pdf) == ["line (a)\nline \\b"]


def test_flate_compressed_stream():
    pdf = build_text_pdf([LONG], compress=True)
    assert detect_text_layer(pdf) == (True, 1, 1)


def test_extract_blocks_pages_and_provenance():
    pdf = build_text_pdf(["first page body", "", "third page body"])
    blocks = extract_pdf(pdf)
    assert [(b.page, b.text) for b in blocks] == [
        (1, "first page body"),
        (3, "third page body"),
    ]
