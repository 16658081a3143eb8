"""PDF-branch extraction kernel: layout-aware block ordering.

The reference rasterizes PDF pages and OCRs them page-by-page
(reference core/ocr_engine.py:137-176), carrying per-region bboxes
(core/ocr_engine.py:244-267). The north rule's PDF branch is
"layout-aware block ordering (x/y-sorted block merge)".

Real PDF decoding needs poppler/pypdf, which are NOT in this container.
Per the build contract, the decode step is stubbed: if a genuine PDF
arrives we raise NotImplementedError (caught by the UDF into an error
column — the analog of the reference's per-page skip-on-error,
core/ocr_engine.py:163-165). The Spark-side plumbing is exercised with
a deterministic self-describing block format ("GRAFT-BLOCKS") that the
synthetic corpus emits for its PDF-like payloads: a %PDF header followed
by one base64 text block per line with (page, x, y, w, h) geometry —
so block parsing, the (page, y-band, x) sort merge, span bookkeeping and
multi-page concat (reference core/processor.py:207-232) are all real
and tested.
"""

from __future__ import annotations

import base64
import binascii
import re
from dataclasses import dataclass

__all__ = ["PdfBlock", "PdfExtraction", "is_pdf", "make_graft_pdf", "extract_pdf"]

PDF_MAGIC = b"%PDF"
GRAFT_MARKER = b"%%GRAFT-BLOCKS"
# y tolerance band for "same visual line" during the x/y sort merge
Y_BAND = 4

PAGE_SEPARATOR = "\n\n"
BLOCK_SEPARATOR = "\n"


@dataclass
class PdfBlock:
    page: int
    x: int
    y: int
    w: int
    h: int
    text: str


@dataclass
class PdfExtraction:
    text: str
    # (start, end, node_idx, confidence): node_idx = rank in layout order
    spans: list[tuple[int, int, int, float]]
    blocks: list[PdfBlock]
    n_pages: int


def is_pdf(raw: bytes) -> bool:
    """Format dispatch on magic bytes — the Spark analog of the
    reference's extension dispatch (core/ocr_engine.py:98-112)."""
    return raw[:4] == PDF_MAGIC


def make_graft_pdf(blocks: list[PdfBlock]) -> bytes:
    """Serialize blocks into the deterministic sandbox PDF stand-in."""
    lines = [b"%PDF-1.7", GRAFT_MARKER]
    for b in blocks:
        payload = base64.b64encode(b.text.encode("utf-8")).decode("ascii")
        lines.append(f"{b.page} {b.x} {b.y} {b.w} {b.h} {payload}".encode("ascii"))
    return b"\n".join(lines) + b"\n"


# payload group optional: an empty-text block serializes with a
# trailing space that the line strip removes (fuzz-found), so the
# geometry-only form must parse too
_BLOCK_RE = re.compile(
    rb"^(\d+) (-?\d+) (-?\d+) (\d+) (\d+)(?: ([A-Za-z0-9+/=]*))?$"
)


def _parse_graft_blocks(raw: bytes) -> list[PdfBlock]:
    blocks: list[PdfBlock] = []
    for line in raw.split(b"\n")[2:]:
        line = line.strip()
        if not line:
            continue
        m = _BLOCK_RE.match(line)
        if not m:
            continue  # tolerate corrupt block lines (error-skip path)
        page, x, y, w, h = (int(m.group(i)) for i in range(1, 6))
        try:
            text = base64.b64decode(m.group(6) or b"").decode(
                "utf-8", errors="replace")
        except binascii.Error:
            continue  # payload not valid base64 (bad padding): skip line
        blocks.append(PdfBlock(page=page, x=x, y=y, w=w, h=h, text=text))
    return blocks


def block_confidence(b: PdfBlock) -> float:
    """Deterministic geometry-derived confidence (area-normalized),
    analog of per-region OCR confidence (core/ocr_engine.py:254)."""
    area = max(1, b.w * b.h)
    fill = min(1.0, len(b.text) / (area / 64.0)) if area else 0.0
    return round(0.5 + 0.5 * fill, 4)


def extract_pdf(raw: bytes) -> PdfExtraction:
    """Layout-aware block merge.

    Sort key = (page, y // Y_BAND, x): top-to-bottom in y bands, then
    left-to-right — the W4 ordering of SURVEY.md §2.5, replacing the
    reference's implicit raster order. Blocks within a page join with
    newline; pages join with a blank line, replacing the reference's
    page-separator concat (core/processor.py:221). Deterministic: pure
    integer sort keys, ties broken by (y, x, input order).
    """
    if not raw.startswith(PDF_MAGIC):
        raise ValueError("not a PDF payload")
    if GRAFT_MARKER not in raw[:64]:
        # Real PDF: decoding requires poppler/pypdf — unavailable here.
        raise NotImplementedError(
            "real PDF decode not available in this environment "
            "(stub; reference analog core/ocr_engine.py:101-103)"
        )
    blocks = _parse_graft_blocks(raw)
    order = sorted(
        range(len(blocks)),
        key=lambda i: (
            blocks[i].page,
            blocks[i].y // Y_BAND,
            blocks[i].x,
            blocks[i].y,
            i,
        ),
    )
    parts: list[str] = []
    spans: list[tuple[int, int, int, float]] = []
    pos = 0
    prev_page: int | None = None
    pages = set()
    for rank, i in enumerate(order):
        b = blocks[i]
        pages.add(b.page)
        if parts:
            sep = PAGE_SEPARATOR if b.page != prev_page else BLOCK_SEPARATOR
            pos += len(sep)
            parts.append(sep)
        start = pos
        end = start + len(b.text)
        spans.append((start, end, rank, block_confidence(b)))
        parts.append(b.text)
        pos = end
        prev_page = b.page
    return PdfExtraction(
        text="".join(parts), spans=spans, blocks=blocks, n_pages=len(pages)
    )
