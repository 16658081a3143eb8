"""Source-tier tests (S1/S5/S6/S8): binaryFile scan → extraction,
glob filtering, corrections dim fallback, golden pairing join."""

import pyspark.sql.functions as F

from ocr_service_spark.corpus import gen_docs
from ocr_service_spark.pipeline import extract_documents
from ocr_service_spark.sources.readers import (
    read_binary_pages,
    read_corrections,
    read_goldens,
)


def test_binary_pages_scan_to_extraction(spark, tmp_path):
    pages = tmp_path / "pages"
    pages.mkdir()
    docs = [d for d in gen_docs(40) if d.kind == "html"][:10]
    for d in docs:
        (pages / f"{d.doc_id:05d}.html").write_bytes(d.html)
    (pages / "ignore.bin").write_bytes(b"not a page")

    df = read_binary_pages(spark, str(pages), glob="*.html")
    assert df.count() == 10
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"]

    out = extract_documents(df.withColumn("doc_id", F.lit(0)))
    got = {r.url.rsplit("/", 1)[-1]: r.extracted_text for r in out.collect()}
    for d in docs:
        assert got[f"{d.doc_id:05d}.html"] == d.expected_text


def test_corrections_source_fallback_and_json(spark, tmp_path):
    dim = read_corrections(spark)
    pairs = {(r.original, r.corrected) for r in dim.collect()}
    assert ("Маркуталь", "Мариуполь") in pairs

    p = tmp_path / "corr.json"
    p.write_text('{"original": "teh", "corrected": "the"}\n')
    dim2 = read_corrections(spark, str(p))
    assert {(r.original, r.corrected) for r in dim2.collect()} == {("teh", "the")}


def test_golden_pairing_join(spark, tmp_path):
    g = tmp_path / "goldens"
    g.mkdir()
    (g / "01 certificate alpha.txt").write_text("alpha golden text")
    (g / "certificate beta.txt").write_text("beta golden text")

    goldens = read_goldens(spark, str(g))
    by_name = {r.base_name: r.expected_text for r in goldens.collect()}
    assert by_name == {
        "certificate alpha": "alpha golden text",
        "certificate beta": "beta golden text",
    }

    results = spark.createDataFrame(
        [("certificate alpha", "alpha golden text"),
         ("certificate gamma", "whatever")],
        "base_name string, extracted_text string")
    paired = results.join(goldens, "base_name")  # J3 inner pairing
    assert paired.count() == 1
    unpaired = results.join(goldens, "base_name", "left_anti")
    assert [r.base_name for r in unpaired.collect()] == ["certificate gamma"]
