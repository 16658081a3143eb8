"""WARC connector: member-gzip and plain archives parse to identical
records; non-response/malformed records skip; the Spark reader streams
records out of binaryFile rows and feeds the extraction pipeline."""

from datetime import datetime

import pyspark.sql.functions as F

from ocr_service_spark.sources.warc import (
    build_record,
    parse_warc,
    read_warc,
    write_warc_bytes,
)

RECS = [
    ("https://a.example/1", datetime(2025, 1, 1, 0, 0, 0), b"<html><body><p>" + b"alpha beta " * 30 + b"</p></body></html>"),
    ("https://a.example/2", datetime(2025, 1, 2, 3, 4, 5), b"<html><body><p>" + b"gamma delta " * 30 + b"</p></body></html>"),
]


def test_parse_roundtrip_gzip_and_plain():
    for member_gzip in (True, False):
        raw = write_warc_bytes(RECS, member_gzip=member_gzip)
        got = list(parse_warc(raw))
        assert [(g["url"], g["warc_ts"], g["payload"]) for g in got] == RECS


def test_non_response_and_malformed_records_skipped():
    good = build_record(*RECS[0])
    warcinfo = good.replace(b"WARC-Type: response", b"WARC-Type: warcinfo")
    broken = good.replace(b"Content-Length: ", b"Content-Length: x")
    raw = warcinfo + broken + good
    got = list(parse_warc(raw))
    assert len(got) == 1 and got[0]["url"] == RECS[0][0]


def test_skip_accounting_and_file_stats(spark, tmp_path):
    """read_warc surfaces per-file n_skipped; warc_file_stats reports
    one row per archive even when every record was dropped."""
    from ocr_service_spark.sources.warc import warc_file_stats

    d = tmp_path / "warcs"
    d.mkdir()
    # clean archive, archive with one truncated member, fully-corrupt
    (d / "clean.warc.gz").write_bytes(write_warc_bytes(RECS))
    import gzip as _gz
    good = _gz.compress(build_record(*RECS[0]), mtime=0)
    cut = _gz.compress(build_record(*RECS[1]), mtime=0)[:40]
    (d / "partial.warc.gz").write_bytes(good + cut)
    (d / "garbage.warc.gz").write_bytes(b"\x1f\x8b" + b"\x00" * 64)

    rows = read_warc(spark, str(d)).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.warc_file.rsplit("/", 1)[-1], []).append(r)
    assert len(by_file["clean.warc.gz"]) == 2
    assert all(r.n_skipped == 0 for r in by_file["clean.warc.gz"])
    assert len(by_file["partial.warc.gz"]) == 1
    assert by_file["partial.warc.gz"][0].n_skipped >= 1
    assert "garbage.warc.gz" not in by_file  # no rows ...

    stats = {r.warc_file.rsplit("/", 1)[-1]: r
             for r in warc_file_stats(spark, str(d)).collect()}
    assert set(stats) == {"clean.warc.gz", "partial.warc.gz",
                          "garbage.warc.gz"}  # ... but never invisible
    assert stats["clean.warc.gz"].n_records == 2
    assert stats["clean.warc.gz"].n_skipped == 0
    assert stats["partial.warc.gz"].n_records == 1
    assert stats["partial.warc.gz"].n_skipped >= 1
    assert stats["garbage.warc.gz"].n_records == 0
    assert stats["garbage.warc.gz"].n_skipped >= 1


def test_read_warc_spark_and_extraction(spark, tmp_path):
    import gzip

    d = tmp_path / "warcs"
    d.mkdir()
    (d / "part-0.warc.gz").write_bytes(write_warc_bytes(RECS[:1]))
    (d / "part-1.warc.gz").write_bytes(write_warc_bytes(RECS[1:]))
    df = read_warc(spark, str(d))
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {u for u, _, _ in RECS}
    assert rows["https://a.example/1"].warc_ts == RECS[0][1]

    from ocr_service_spark.pipeline import extract_documents

    out = extract_documents(
        df.withColumn("doc_id", F.xxhash64("url")).withColumn("lang", F.lit("en"))
    ).collect()
    texts = {r.url: r.extracted_text for r in out}
    assert texts["https://a.example/1"].startswith("alpha beta")
    assert all(r.error is None for r in out)
