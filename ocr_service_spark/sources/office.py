"""Pure-Python docx/xlsx text extraction for the golden-reference
reader (S8 parity; reference utils/dataset_loader.py:104-152 reads
goldens with python-docx / pandas.read_excel — neither library ships in
this environment, and both formats are just zip + XML, so the parsers
below use only the stdlib and run fine inside executor-side Arrow
batches).

Semantics mirror the reference loader:

- docx  → paragraph texts joined by '\\n' (python-docx `p.text` is the
  concatenation of the paragraph's run texts; tabs/breaks inside runs
  become '\\t'/'\\n' like python-docx renders them).
- xlsx  → per sheet, "Лист: {name}" then the cell grid, sheets joined
  by '\\n\\n' (reference: pd.read_excel(sheet_name=None) + to_string).
  The grid here is rows of values joined by '\\t' — a deterministic
  rendering of the same cells; pandas' to_string column padding is a
  display artifact, not part of the data contract, and is documented
  as the one divergence.
- anything unreadable → "" (the reference logs and returns "").
"""

from __future__ import annotations

import zipfile
import xml.etree.ElementTree as ET
from io import BytesIO

__all__ = ["docx_text", "xlsx_text"]

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_PKG_REL = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
            "relationships}id")


def docx_text(data: bytes) -> str:
    """word/document.xml → '\\n'-joined paragraph texts ('' on any
    failure, like the reference's load_reference_text)."""
    try:
        with zipfile.ZipFile(BytesIO(data)) as z:
            root = ET.fromstring(z.read("word/document.xml"))
    except Exception:
        return ""
    paragraphs = []
    for p in root.iter(f"{_W}p"):
        parts: list[str] = []
        for node in p.iter():
            if node.tag == f"{_W}t":
                parts.append(node.text or "")
            elif node.tag == f"{_W}tab":
                parts.append("\t")
            elif node.tag == f"{_W}br":
                parts.append("\n")
        paragraphs.append("".join(parts))
    return "\n".join(paragraphs)


def _cell_value(c, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(tn.text or "" for tn in c.iter(f"{_S}t"))
    v = c.find(f"{_S}v")
    if v is None or v.text is None:
        return ""
    if t == "s":
        try:
            return shared[int(v.text)]
        except (ValueError, IndexError):
            return ""
    return v.text


def _col_index(ref: str) -> int:
    """'C7' → 2 (0-based column)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return max(n - 1, 0)


def xlsx_text(data: bytes) -> str:
    """All sheets, in workbook order: 'Лист: {name}' header + the cell
    grid as '\\t'-joined rows, sheets joined by '\\n\\n' ('' on any
    failure)."""
    try:
        with zipfile.ZipFile(BytesIO(data)) as z:
            names = set(z.namelist())
            shared: list[str] = []
            if "xl/sharedStrings.xml" in names:
                sroot = ET.fromstring(z.read("xl/sharedStrings.xml"))
                shared = [
                    "".join(t.text or "" for t in si.iter(f"{_S}t"))
                    for si in sroot.iter(f"{_S}si")
                ]
            wb = ET.fromstring(z.read("xl/workbook.xml"))
            rels = {}
            if "xl/_rels/workbook.xml.rels" in names:
                rroot = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
                for rel in rroot:
                    rels[rel.get("Id")] = rel.get("Target", "").lstrip("/")
            sheets = []
            for i, sh in enumerate(wb.iter(f"{_S}sheet")):
                target = rels.get(sh.get(_PKG_REL), f"worksheets/sheet{i + 1}.xml")
                if not target.startswith("xl/"):
                    target = f"xl/{target}"
                sheets.append((sh.get("name", f"Sheet{i + 1}"), target))
            out = []
            for name, target in sheets:
                if target not in names:
                    continue
                sheet = ET.fromstring(z.read(target))
                rows = []
                for row in sheet.iter(f"{_S}row"):
                    cells: list[str] = []
                    for c in row.iter(f"{_S}c"):
                        # honor the cell reference so sparse rows keep
                        # their column positions
                        idx = _col_index(c.get("r", ""))
                        while len(cells) < idx:
                            cells.append("")
                        cells.append(_cell_value(c, shared))
                    rows.append("\t".join(cells))
                out.append(f"Лист: {name}\n" + "\n".join(rows))
            return "\n\n".join(out)
    except Exception:
        return ""
