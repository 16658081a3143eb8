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


def _make_docx(path, paragraphs):
    """Minimal well-formed docx: zip with word/document.xml. Each
    paragraph is a list of runs; a run is text, or ("tab",)/("br",)."""
    import zipfile

    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = []
    for runs in paragraphs:
        parts = []
        for r in runs:
            if r == ("tab",):
                parts.append("<w:tab/>")
            elif r == ("br",):
                parts.append("<w:br/>")
            else:
                parts.append(f'<w:t xml:space="preserve">{r}</w:t>')
        body.append(f"<w:p><w:r>{''.join(parts)}</w:r></w:p>")
    doc = (f'<?xml version="1.0"?><w:document xmlns:w="{w}">'
           f"<w:body>{''.join(body)}</w:body></w:document>")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", doc)


def _make_xlsx(path, sheets):
    """Minimal xlsx: shared strings for str cells, numbers inline.
    `sheets` = [(name, [[cell, ...], ...])]."""
    import zipfile

    s = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    shared: list[str] = []

    def cell_xml(ref, v):
        if isinstance(v, str):
            if v not in shared:
                shared.append(v)
            return f'<c r="{ref}" t="s"><v>{shared.index(v)}</v></c>'
        return f'<c r="{ref}"><v>{v}</v></c>'

    sheet_xml = {}
    wb_sheets, rels = [], []
    for i, (name, rows) in enumerate(sheets, start=1):
        rows_xml = []
        for ri, row in enumerate(rows, start=1):
            cells = "".join(
                cell_xml(f"{chr(64 + ci)}{ri}", v)
                for ci, v in enumerate(row, start=1))
            rows_xml.append(f'<row r="{ri}">{cells}</row>')
        sheet_xml[f"xl/worksheets/sheet{i}.xml"] = (
            f'<?xml version="1.0"?><worksheet xmlns="{s}">'
            f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>")
        wb_sheets.append(
            f'<sheet name="{name}" sheetId="{i}" r:id="rId{i}"/>')
        rels.append(f'<Relationship Id="rId{i}" Type="{rel}/worksheet" '
                    f'Target="worksheets/sheet{i}.xml"/>')
    sst = "".join(f"<si><t>{t}</t></si>" for t in shared)
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/workbook.xml",
                   f'<?xml version="1.0"?><workbook xmlns="{s}" '
                   f'xmlns:r="{rel}"><sheets>{"".join(wb_sheets)}</sheets>'
                   "</workbook>")
        z.writestr("xl/_rels/workbook.xml.rels",
                   '<?xml version="1.0"?><Relationships xmlns='
                   '"http://schemas.openxmlformats.org/package/2006/'
                   f'relationships">{"".join(rels)}</Relationships>')
        z.writestr("xl/sharedStrings.xml",
                   f'<?xml version="1.0"?><sst xmlns="{s}">{sst}</sst>')
        for p, xml in sheet_xml.items():
            z.writestr(p, xml)


def test_office_parsers_pure_python(tmp_path):
    from ocr_service_spark.sources.office import docx_text, xlsx_text

    d = tmp_path / "a.docx"
    _make_docx(d, [["Параграф один", " продолжение"],
                   ["строка два", ("tab",), "после таба"]])
    assert docx_text(d.read_bytes()) == (
        "Параграф один продолжение\nстрока два\tпосле таба")

    x = tmp_path / "b.xlsx"
    _make_xlsx(x, [("Данные", [["name", "qty"], ["widget", 3]]),
                   ("Итоги", [["total", 3]])])
    assert xlsx_text(x.read_bytes()) == (
        "Лист: Данные\nname\tqty\nwidget\t3\n\n"
        "Лист: Итоги\ntotal\t3")

    # unreadable → '' (reference logs-and-returns-'')
    assert docx_text(b"not a zip") == ""
    assert xlsx_text(b"junk") == ""


def test_golden_reader_docx_xlsx(spark, tmp_path):
    g = tmp_path / "goldens"
    g.mkdir()
    (g / "01 certificate alpha.txt").write_text("alpha golden text")
    _make_docx(g / "02 certificate beta.docx", [["beta line one"],
                                                ["beta line two"]])
    _make_xlsx(g / "certificate gamma.xlsx",
               [("Лист1", [["k", "v"], ["rows", 2]])])
    (g / "certificate delta.bin").write_bytes(b"ignored by glob")

    goldens = read_goldens(spark, str(g))
    by_name = {r.base_name: r.expected_text for r in goldens.collect()}
    assert by_name == {
        "certificate alpha": "alpha golden text",
        "certificate beta": "beta line one\nbeta line two",
        "certificate gamma": "Лист: Лист1\nk\tv\nrows\t2",
    }
