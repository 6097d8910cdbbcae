"""draw_curves full-port test: reference workbook layout -> figures.

Builds a minimal Results.xlsx (two dataset columns, the reference's
row layout: row0 zero-shot, rows 2:27 five methods x five shots,
scripts/draw_curves.py:44-60) WITHOUT openpyxl — the same zip+XML
format the reader consumes — then checks per-dataset + average figures
exist and the parsed columns round-trip.
"""

import os
import zipfile

import numpy as np
import pytest

from mvlpt_tpu.cli.draw_curves import (
    METHODS, SHOTS, draw_from_csv, draw_from_sheet, read_xlsx_sheet)

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="imcls_fewshot" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(i):
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_minimal_xlsx(path, columns, omit_empty_rows=False):
    """columns: dict name -> list of floats (27 rows, reference layout).

    ``omit_empty_rows`` mimics real Excel output, which writes no
    ``<row>`` element at all for blank rows — positions are carried by
    each row's ``r`` attribute."""
    names = list(columns)
    shared = "".join(f"<si><t>{n}</t></si>" for n in names)
    ss = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
          f'count="{len(names)}" uniqueCount="{len(names)}">{shared}</sst>')

    rows_xml = []
    header = "".join(
        f'<c r="{_col_letter(j)}1" t="s"><v>{j}</v></c>'
        for j in range(len(names)))
    rows_xml.append(f'<row r="1">{header}</row>')
    n_rows = max(len(v) for v in columns.values())
    for i in range(n_rows):
        cells = []
        for j, n in enumerate(names):
            vals = columns[n]
            if i < len(vals) and vals[i] is not None:
                cells.append(
                    f'<c r="{_col_letter(j)}{i + 2}"><v>{vals[i]}</v></c>')
        if omit_empty_rows and not cells:
            continue
        rows_xml.append(f'<row r="{i + 2}">{"".join(cells)}</row>')
    sheet = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             f'<worksheet xmlns="http://schemas.openxmlformats.org/'
             f'spreadsheetml/2006/main"><sheetData>'
             f'{"".join(rows_xml)}</sheetData></worksheet>')

    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WB)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", ss)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _ref_column(rng):
    """27-row column in the released layout: [zs, blank, 25 method rows]."""
    col = [round(50 + 30 * rng.rand(), 2), None]
    for _ in range(25):
        col.append(round(50 + 40 * rng.rand(), 2))
    return col


def test_read_xlsx_sheet_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    cols = {"OxfordPets": _ref_column(rng), "DTD": _ref_column(rng)}
    path = str(tmp_path / "Results.xlsx")
    write_minimal_xlsx(path, cols)
    parsed = read_xlsx_sheet(path, "imcls_fewshot")
    assert set(parsed) == {"OxfordPets", "DTD"}
    assert parsed["DTD"][0] == cols["DTD"][0]
    assert parsed["DTD"][1] is None  # sparse cell
    np.testing.assert_allclose(
        [v for v in parsed["OxfordPets"][2:27]], cols["OxfordPets"][2:27])


def test_read_xlsx_excel_omits_blank_rows(tmp_path):
    """Excel writes no <row> element for blank rows; positions must come
    from the r attribute, not document order, or every method block
    below the blank separator row shifts by one."""
    rng = np.random.RandomState(3)
    cols = {"OxfordPets": _ref_column(rng), "DTD": _ref_column(rng)}
    explicit = str(tmp_path / "explicit.xlsx")
    sparse = str(tmp_path / "sparse.xlsx")
    write_minimal_xlsx(explicit, cols)
    write_minimal_xlsx(sparse, cols, omit_empty_rows=True)
    a = read_xlsx_sheet(explicit, "imcls_fewshot")
    b = read_xlsx_sheet(sparse, "imcls_fewshot")
    assert a == b
    assert b["OxfordPets"][1] is None  # the blank separator row survived


def test_read_xlsx_missing_sheet_errors(tmp_path):
    path = str(tmp_path / "Results.xlsx")
    write_minimal_xlsx(path, {"X": [1.0]})
    with pytest.raises(SystemExit, match="nope"):
        read_xlsx_sheet(path, "nope")


def test_draw_from_sheet_reference_layout(tmp_path):
    pytest.importorskip("matplotlib")
    rng = np.random.RandomState(1)
    cols = {"OxfordPets": _ref_column(rng), "DTD": _ref_column(rng)}
    path = str(tmp_path / "Results.xlsx")
    write_minimal_xlsx(path, cols)
    out = str(tmp_path / "main_curves")
    draw_from_sheet(path, "imcls_fewshot", out,
                    datasets=["OxfordPets", "DTD"], fmt="png")
    assert os.path.exists(os.path.join(out, "OxfordPets.png"))
    assert os.path.exists(os.path.join(out, "DTD.png"))
    assert os.path.exists(os.path.join(out, "average.png"))
    # sanity: every method consumed exactly one value per shot
    assert all(len(range(*m[0].indices(27))) == len(SHOTS)
               for m in METHODS.values())


def test_draw_from_csv(tmp_path):
    pytest.importorskip("matplotlib")
    csv_path = tmp_path / "res.csv"
    csv_path.write_text(
        "method,dataset,shots,accuracy\n"
        "coop,pets,1,60\ncoop,pets,16,80\nlinear,pets,1,40\n")
    out = str(tmp_path / "figs")
    draw_from_csv(str(csv_path), out)
    assert os.path.exists(os.path.join(out, "pets_curve.png"))
