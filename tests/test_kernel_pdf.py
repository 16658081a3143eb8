"""PDF-branch kernel: layout-aware block ordering (W4)."""

import pytest

from ocr_service_spark.kernel.dispatch import extract_document
from ocr_service_spark.kernel.extract_pdf import (
    PdfBlock,
    extract_pdf,
    is_pdf,
    make_graft_pdf,
)


def test_xy_sort_merge():
    # emitted out of order; expected = y-band rows top-down, x left-right
    blocks = [
        PdfBlock(1, 300, 40, 100, 20, "right-top"),
        PdfBlock(1, 10, 120, 100, 20, "left-bottom"),
        PdfBlock(1, 10, 41, 100, 20, "left-top"),
        PdfBlock(1, 300, 121, 100, 20, "right-bottom"),
    ]
    raw = make_graft_pdf(blocks)
    assert is_pdf(raw)
    r = extract_pdf(raw)
    assert r.text == "left-top\nright-top\nleft-bottom\nright-bottom"


def test_multipage_separator_and_spans():
    blocks = [
        PdfBlock(2, 0, 0, 50, 10, "page two"),
        PdfBlock(1, 0, 0, 50, 10, "page one"),
    ]
    r = extract_pdf(make_graft_pdf(blocks))
    assert r.text == "page one\n\npage two"
    assert r.n_pages == 2
    for start, end, rank, conf in r.spans:
        assert 0.0 <= conf <= 1.0
    assert r.text[r.spans[0][0]:r.spans[0][1]] == "page one"
    assert r.text[r.spans[1][0]:r.spans[1][1]] == "page two"


def test_real_pdf_is_stubbed():
    with pytest.raises(NotImplementedError):
        extract_pdf(b"%PDF-1.4\nreal pdf binary")
    res = extract_document(b"%PDF-1.4\nreal pdf binary")
    assert res.text is None and res.error and res.kind == "pdf"


def test_corrupt_block_lines_skipped():
    raw = b"%PDF-1.7\n%%GRAFT-BLOCKS\n1 0 0 10 10 aGVsbG8=\nnot a block line\n"
    r = extract_pdf(raw)
    assert r.text == "hello"
