"""Property-based fuzz for the PDF-branch kernel (the W4 layout-order
merge): serialization round-trip, span/byte-offset integrity, layout
ordering, and the skip-on-corrupt contract — the same treatment
test_kernel_fuzz gives the HTML branch and test_warc_fuzz the WARC
source."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_service_spark.kernel.extract_pdf import (
    Y_BAND,
    PdfBlock,
    extract_pdf,
    is_pdf,
    make_graft_pdf,
)

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40)

_block = st.builds(
    PdfBlock,
    page=st.integers(min_value=0, max_value=5),
    x=st.integers(min_value=-50, max_value=200),
    y=st.integers(min_value=-50, max_value=400),
    w=st.integers(min_value=0, max_value=100),
    h=st.integers(min_value=0, max_value=60),
    text=_text,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_block, max_size=12))
def test_roundtrip_spans_and_layout_order(blocks):
    ext = extract_pdf(make_graft_pdf(blocks))
    assert len(ext.blocks) == len(blocks)
    # spans index ext.text exactly, in layout-rank order
    ordered = sorted(
        range(len(blocks)),
        key=lambda i: (blocks[i].page, blocks[i].y // Y_BAND,
                       blocks[i].x, blocks[i].y, i),
    )
    assert len(ext.spans) == len(blocks)
    for rank, (start, end, node_idx, conf) in enumerate(ext.spans):
        assert node_idx == rank
        assert ext.text[start:end] == blocks[ordered[rank]].text
        assert 0.0 <= conf <= 1.0
    # layout keys are non-decreasing across the emitted order
    keys = [(blocks[i].page, blocks[i].y // Y_BAND, blocks[i].x)
            for i in ordered]
    assert keys == sorted(keys)
    assert ext.n_pages == len({b.page for b in blocks})


@settings(max_examples=200, deadline=None)
@given(st.lists(_block, min_size=1, max_size=6), st.binary(max_size=64),
       st.integers(min_value=0, max_value=6))
def test_corrupt_lines_are_skipped_not_fatal(blocks, junk, pos):
    raw = make_graft_pdf(blocks)
    lines = raw.split(b"\n")
    lines.insert(min(2 + pos, len(lines)), junk)  # inject after header
    ext = extract_pdf(b"\n".join(lines))
    # corrupt lines are skipped; junk containing newlines contributes
    # several lines, each of which MAY happen to parse as a block
    assert len(blocks) <= len(ext.blocks) <= len(blocks) + junk.count(b"\n") + 1


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_dispatch_never_misroutes(raw):
    import pytest

    if raw[:4] != b"%PDF":
        assert not is_pdf(raw)
        with pytest.raises(ValueError):
            extract_pdf(raw)
    elif b"%%GRAFT-BLOCKS" not in raw[:64]:
        with pytest.raises(NotImplementedError):
            extract_pdf(raw)  # real-PDF decode is stubbed by contract
    else:
        extract_pdf(raw)  # graft container: never raises on any body


def test_bad_base64_padding_line_is_skipped():
    """Review-found: a line matching the block regex whose payload
    length is not a multiple of 4 must be skipped, not raise
    binascii.Error out of extract_pdf."""
    ext = extract_pdf(b"%PDF-1.7\n%%GRAFT-BLOCKS\n1 2 3 4 5 abc\n")
    assert ext.blocks == [] and ext.text == ""
