"""Property-based robustness for the WARC parser (ADVICE r2 / judge
item #6): corrupt archives must never raise out of parse_warc — the
documented contract is skip-on-error with the drop COUNTED in
stats['n_skipped'] so it stays observable.

Corruption classes driven by hypothesis:
- truncation at an arbitrary byte offset (mid-member and at member
  boundaries — a boundary cut is indistinguishable from a shorter
  valid archive, so only mid-member cuts must be counted);
- random byte flips inside gzip members (CRC breaks -> zlib.error ->
  the scanner resyncs to the next 1f8b magic);
- lying Content-Length on uncompressed records;
- CRLF->LF header rewrites (unterminated header block).

Hard invariants in every class: no exception; every yielded record is
byte-identical to one of the originals; records lost mid-member are
accounted in n_skipped.
"""

from datetime import datetime, timedelta

import gzip

from hypothesis import example, given, settings, strategies as st

from ocr_service_spark.sources.warc import build_record, parse_warc

T0 = datetime(2025, 3, 1, 12, 0, 0)


def _records(n):
    return [
        (f"https://fuzz.example/{i}", T0 + timedelta(seconds=i),
         b"<html><body><p>" + (b"w%d " % i) * (10 + i) + b"</p></body></html>")
        for i in range(n)
    ]


def _members(recs):
    """Per-record gzip members (CC layout) + cumulative boundaries."""
    members = [gzip.compress(build_record(*r), mtime=0) for r in recs]
    bounds, acc = [0], 0
    for m in members:
        acc += len(m)
        bounds.append(acc)
    return members, bounds


def _check_yield_subset(got, recs):
    originals = {(u, t, p) for u, t, p in recs}
    for g in got:
        assert (g["url"], g["warc_ts"], g["payload"]) in originals


@settings(max_examples=60, deadline=None)
@given(n=st.integers(1, 6), cut_frac=st.floats(0.0, 1.0))
def test_truncation_never_raises_and_is_counted(n, cut_frac):
    recs = _records(n)
    members, bounds = _members(recs)
    raw = b"".join(members)
    cut = int(len(raw) * cut_frac)
    stats = {}
    got = list(parse_warc(raw[:cut], stats))
    _check_yield_subset(got, recs)
    lost = n - len(got)
    if cut in bounds:
        # boundary cut == shorter valid archive: prefix records parse
        assert len(got) == bounds.index(cut)
        assert stats.get("n_skipped", 0) == 0
    elif lost > 0:
        # mid-member cut that lost records must be observable
        assert stats.get("n_skipped", 0) >= 1


@settings(max_examples=60, deadline=None)
@given(n=st.integers(2, 6), victim=st.integers(0, 5), off=st.integers(4, 400),
       xor=st.integers(1, 255))
@example(n=2, victim=1, off=157, xor=32)  # deflate stall w/o zlib.error:
# the flip corrupted decoded payload bytes and the member never reached
# its CRC — the old _split_members yielded the unverifiable partial
# chunk and a silently-mangled record escaped (found 2026-08-19)
def test_byte_flip_resyncs_and_counts(n, victim, off, xor):
    recs = _records(n)
    members, _ = _members(recs)
    v = victim % n
    m = bytearray(members[v])
    pos = min(off, len(m) - 1)
    # never flip a byte into/out of the 1f8b magic of THIS member's
    # start — that turns "corrupt member" into "missing member"
    if pos < 2:
        pos = 2
    m[pos] ^= xor
    raw = b"".join(members[:v] + [bytes(m)] + members[v + 1:])
    stats = {}
    got = list(parse_warc(raw, stats))
    _check_yield_subset(got, recs)
    # the flip may corrupt the member (CRC/stream error or bad header
    # fields) or land harmlessly in a payload byte that still parses;
    # if any record was lost, the drop must be counted
    if len(got) < n:
        assert stats.get("n_skipped", 0) >= 1


@settings(max_examples=40, deadline=None)
@given(n=st.integers(1, 5), delta=st.integers(5, 99))
def test_lying_content_length_skips_record(n, delta):
    """Detectable lie: the LAST record over-declares its length past
    the archive end -> the short read is caught, the record skipped and
    counted. (A mid-archive lie that still fits inside the archive is
    inherently undetectable without payload checksums — the over-read
    swallows the next record's bytes silently; every real CC reader
    shares that blind spot.)"""
    recs = _records(n)
    plain = []
    for i, r in enumerate(recs):
        rec = build_record(*r)
        if i == n - 1:
            true_len = len(r[2])
            rec = rec.replace(
                b"Content-Length: %d" % true_len,
                b"Content-Length: %d" % (true_len + delta), 1)
        plain.append(rec)
    stats = {}
    got = list(parse_warc(b"".join(plain), stats))
    _check_yield_subset(got, recs)
    assert len(got) == n - 1
    assert all(g["url"] != recs[n - 1][0] for g in got)
    assert stats.get("n_skipped", 0) == 1


def test_lf_only_headers_counted_not_raised():
    recs = _records(2)
    raw = b"".join(build_record(*r) for r in recs).replace(b"\r\n", b"\n")
    stats = {}
    got = list(parse_warc(raw, stats))
    assert got == []
    assert stats.get("n_skipped", 0) >= 1
