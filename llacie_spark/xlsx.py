"""Minimal XLSX reader/writer on the stdlib — the reference's artifact format.

The reference's vocabulary and gold-annotation artifacts are Excel workbooks
(``/root/reference/llacie/vocab.py:86-97`` reads the vocab sheet with pandas
``read_excel``; ``llacie/db.py:720-766`` imports the annotation sheet the
same way). This sandbox has no openpyxl/pandas-excel engine, so users handed
those artifacts previously had to pre-convert to CSV offline. XLSX is just a
zip of XML parts, so the subset those loaders need — one rectangular sheet,
header row, shared/inline strings, numbers — reads fine with ``zipfile`` +
``xml.etree``:

- ``xl/workbook.xml``          sheet names -> relationship ids
- ``xl/_rels/workbook.xml.rels`` relationship ids -> worksheet parts
- ``xl/sharedStrings.xml``     the string pool (cell type ``s`` indexes it)
- ``xl/worksheets/sheetN.xml`` rows of ``<c r="B2" t="s"><v>3</v></c>``

Driver-side by design: these artifacts are tiny (~1k vocab rows, ~100 gold
episodes) and are broadcast into Spark jobs afterwards — the same shape as
the CSV loaders they sit beside (``vocab.Vocab.from_csv``,
``gold.load_gold_csv``). Not a general Excel engine: no formula evaluation
(cached values are used), no styles, no dates-as-numbers conversion.

The writer emits the same subset (inline strings + plain numbers) and exists
so tests can synthesize workbook twins of the CSV fixtures without any
external dependency; it writes files this reader and openpyxl both accept.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_DOC_REL = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """A -> 0, B -> 1, ..., AA -> 26 (base-26 with no zero digit)."""
    m = _CELL_REF.match(ref)
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _col_name(i: int) -> str:
    name = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        name = chr(ord("A") + r) + name
    return name


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(x.text or "" for x in is_el.iter(f"{_NS}t")) if is_el is not None else ""
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t in ("str", "b"):
        return v.text if t == "str" else bool(int(v.text))
    # numeric: ints stay ints (the vocab 'n' column, episode ids)
    num = float(v.text)
    return int(num) if num.is_integer() else num


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        return [s.get("name") for s in wb.iter(f"{_NS}sheet")]


def read_rows(path: str, sheet: str | None = None) -> list[dict]:
    """Read one sheet as a list of dict rows keyed by the header row.

    ``sheet`` picks a worksheet by name (default: the first). Sparse cells
    come back as None; trailing all-empty rows are dropped. Header cells are
    stringified (a numeric header would otherwise make unusable keys)."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = {s.get("name"): s.get(_DOC_REL) for s in wb.iter(f"{_NS}sheet")}
        if not sheets:
            raise ValueError(f"no worksheets in {path!r}")
        if sheet is None:
            sheet = next(iter(sheets))
        if sheet not in sheets:
            raise ValueError(f"sheet {sheet!r} not in {sorted(sheets)} ({path!r})")
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target = next(
            r.get("Target")
            for r in rels.iter(f"{_REL_NS}Relationship")
            if r.get("Id") == sheets[sheet]
        )
        # relationship targets are relative to xl/ — except absolute ones
        # ('/xl/worksheets/sheet1.xml', emitted by some producers), which are
        # package-rooted and must NOT get the 'xl/' prefix re-applied
        if target.startswith("/"):
            part = target.lstrip("/")
        elif target.startswith("xl/"):
            part = target
        else:
            part = f"xl/{target}"
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(f"{_NS}t"))
                for si in sst.iter(f"{_NS}si")
            ]
        ws = ET.fromstring(z.read(part))
        grid: list[list] = []
        for row in ws.iter(f"{_NS}row"):
            cells: list = []
            for c in row.iter(f"{_NS}c"):
                idx = _col_index(c.get("r")) if c.get("r") else len(cells)
                while len(cells) <= idx:
                    cells.append(None)
                cells[idx] = _cell_value(c, shared)
            grid.append(cells)
    while grid and all(v is None for v in grid[-1]):
        grid.pop()
    if not grid:
        return []
    header = ["" if h is None else str(h) for h in grid[0]]
    out = []
    for cells in grid[1:]:
        cells = cells + [None] * (len(header) - len(cells))
        out.append(dict(zip(header, cells)))
    return out


def write_rows(path: str, rows: list[dict], sheet: str = "Sheet1", columns: list[str] | None = None) -> None:
    """Write dict rows as a single-sheet workbook (header + data).

    Strings become inline strings, ints/floats numeric cells, bools b-cells,
    None an omitted cell — the exact subset :func:`read_rows` consumes."""
    cols = columns or (list(rows[0].keys()) if rows else [])

    def esc(s: str) -> str:
        # quote escaping matters for the sheet-name attribute
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;")
        )

    def cell_xml(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return (
            f'<c r="{ref}" t="inlineStr"><is>'
            f'<t xml:space="preserve">{esc(str(v))}</t></is></c>'
        )

    body = []
    for rno, vals in enumerate([dict(zip(cols, cols))] + rows, start=1):
        cells = "".join(
            cell_xml(f"{_col_name(i)}{rno}", vals.get(c)) for i, c in enumerate(cols)
        )
        body.append(f'<row r="{rno}">{cells}</row>')
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            "</Types>",
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f'<sheets><sheet name="{esc(sheet)}" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>",
        )
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
