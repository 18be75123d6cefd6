"""Excel sink/scan (sources/xlsxio.py — SURVEY.md S7): dependency-free
SpreadsheetML round trip, typing inference, the bounded-report guard, and
fidelity vs the zip/XML structure itself."""

import zipfile

import pytest
from pyspark.sql import functions as F

from audit_anomaly_detection_etl_spark.sources import xlsxio


def test_xlsx_roundtrip_values_and_types(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "alpha & <beta>", 1.5, True),
            (2, "ünïcode ✓", -0.25, False),
            (3, None, 7942.52, None),
        ],
        "k long, name string, amount double, flag boolean",
    )
    p = str(tmp_path / "report.xlsx")
    n = xlsxio.write_xlsx(df, p)
    assert n == 3
    back = xlsxio.read_xlsx(spark, p)
    assert back.columns == ["k", "name", "amount", "flag"]
    assert dict(back.dtypes) == {
        "k": "bigint", "name": "string", "amount": "double", "flag": "boolean"
    }
    rows = {r["k"]: r for r in back.collect()}
    assert rows[1]["name"] == "alpha & <beta>"      # XML escaping survives
    assert rows[2]["name"] == "ünïcode ✓"           # unicode survives
    assert rows[3]["name"] is None and rows[3]["flag"] is None
    assert rows[3]["amount"] == 7942.52             # repr round trip exact
    assert rows[1]["flag"] is True and rows[2]["flag"] is False


def test_xlsx_is_a_valid_zip_package(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    p = str(tmp_path / "r.xlsx")
    xlsxio.write_xlsx(df, p)
    with zipfile.ZipFile(p) as z:
        names = set(z.namelist())
    assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/worksheets/sheet1.xml"} <= names


def test_xlsx_reader_accepts_shared_strings(spark, tmp_path):
    """Files written by Excel/openpyxl use a sharedStrings table instead of
    inline strings — the reader must resolve s-typed cells through it."""
    p = str(tmp_path / "ext.xlsx")
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sheet = (
        f'<worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    )
    sst = (
        f'<sst {ns}><si><t>id</t></si><si><t>val</t></si><si><t>row-1</t></si></sst>'
    )
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", xlsxio._CONTENT_TYPES)
        z.writestr("_rels/.rels", xlsxio._ROOT_RELS)
        z.writestr("xl/workbook.xml", xlsxio._WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", xlsxio._WORKBOOK_RELS)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    back = xlsxio.read_xlsx(spark, p)
    assert back.columns == ["id", "val"]
    r = back.collect()[0]
    assert r["id"] == "row-1" and r["val"] == 42


def test_xlsx_bounded_report_guard(spark, tmp_path):
    df = spark.range(100).select(F.col("id"))
    with pytest.raises(ValueError, match="aggregate first"):
        xlsxio.write_xlsx(df, str(tmp_path / "big.xlsx"), max_rows=50)


def test_nonfinite_doubles_roundtrip_as_null(spark, tmp_path):
    """Excel has no NaN/Infinity: non-finite numeric cells are written
    empty (-> null on read) and, critically, do NOT demote the rest of the
    column to string."""
    df = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, float("inf")), (4, 2.5)],
        "id long, x double",
    )
    p = str(tmp_path / "nonfinite.xlsx")
    xlsxio.write_xlsx(df, p)
    back = xlsxio.read_xlsx(spark, p)
    assert dict(back.dtypes)["x"] == "double"
    got = {r["id"]: r["x"] for r in back.collect()}
    assert got[1] == 1.5 and got[4] == 2.5
    assert got[2] is None and got[3] is None


def test_blank_sheet_reads_as_empty_frame(spark, tmp_path):
    """Excel writes <sheetData/> for blank sheets; the reader returns a
    0-column, 0-row frame instead of raising on an empty DDL schema."""
    import zipfile

    p = str(tmp_path / "blank.xlsx")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", xlsxio._CONTENT_TYPES)
        z.writestr("_rels/.rels", xlsxio._ROOT_RELS)
        z.writestr("xl/workbook.xml", xlsxio._WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", xlsxio._WORKBOOK_RELS)
        z.writestr(
            "xl/worksheets/sheet1.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData/></worksheet>',
        )
    back = xlsxio.read_xlsx(spark, p)
    assert back.columns == [] and back.count() == 0


def test_control_chars_roundtrip_via_x_escape(spark, tmp_path):
    """XML 1.0 cannot carry control chars; the SpreadsheetML _xHHHH_ escape
    (what Excel itself writes) must round-trip them losslessly — including
    literal text that already looks like an escape."""
    df = spark.createDataFrame(
        [(1, "bell\x07and\x1funit"), (2, "literal _x0007_ text"), (3, "plain")],
        "id long, t string",
    )
    p = str(tmp_path / "ctrl.xlsx")
    xlsxio.write_xlsx(df, p)
    back = {r["id"]: r["t"] for r in xlsxio.read_xlsx(spark, p).collect()}
    assert back[1] == "bell\x07and\x1funit"
    assert back[2] == "literal _x0007_ text"
    assert back[3] == "plain"


def test_cr_and_noncharacters_roundtrip(spark, tmp_path):
    """\\r is XML-legal but parsers MUST normalize it to \\n (XML 1.0
    §2.11) — carried raw it silently corrupts; U+FFFE/U+FFFF are not XML
    chars at all — carried raw the engine writes a file expat refuses to
    parse. Both must ride the _xHHHH_ escape (Excel writes _x000D_ too)."""
    df = spark.createDataFrame(
        [(1, "a\rb"), (2, "crlf\r\nkept"), (3, "non￾char￿")],
        "id long, t string",
    )
    p = str(tmp_path / "cr.xlsx")
    xlsxio.write_xlsx(df, p)
    back = {r["id"]: r["t"] for r in xlsxio.read_xlsx(spark, p).collect()}
    assert back[1] == "a\rb"
    assert back[2] == "crlf\r\nkept"
    assert back[3] == "non￾char￿"


# --- property fuzz: the SpreadsheetML _xHHHH_ escape layer ---------------

from hypothesis import given, settings
from hypothesis import strategies as st

from audit_anomaly_detection_etl_spark.sources.xlsxio import (
    _X_ESCAPE_RE,
    _XML_ILLEGAL_RE,
    _x_escape,
    _x_unescape,
)

# adversarial fragments: whole escape-shaped tokens (so OVERLAPPING tokens
# like '_x005F_x0041_' actually occur), bare pieces of the token syntax,
# XML-illegal controls, XML-special characters, and ordinary text
_adversarial = st.lists(
    st.one_of(
        st.sampled_from(
            ["_x0041_", "_x005F_", "_x0001_", "_", "x0041_", "_x0041",
             "x005F", "<", ">", "&", '"', "A", "9", "é", "　", " "]
        ),
        st.characters(min_codepoint=0, max_codepoint=0x1F),
        st.text(max_size=6),
    ),
    max_size=12,
).map("".join)


@settings(max_examples=200, deadline=None)
@given(_adversarial)
def test_x_escape_roundtrip_lossless(s):
    esc = _x_escape(s)
    # escaped form is XML-legal and carries no *unintentional* escape
    # sequences: every _xHHHH_ in it decodes back to exactly the original
    assert _XML_ILLEGAL_RE.search(esc) is None
    assert _x_unescape(esc) == s


def test_literal_escape_text_survives(spark, tmp_path):
    # a cell whose TEXT is literally '_x0041_' must come back as that text,
    # not decode to 'A' (the _x005F_ self-escape rule, ECMA-376 §22.9.2.19)
    from audit_anomaly_detection_etl_spark.sources import xlsxio

    p = str(tmp_path / "lit.xlsx")
    df = spark.createDataFrame([("_x0041_",), ("_x005F_x0041_",)], "s string")
    xlsxio.write_xlsx(df, p)
    got = sorted(r["s"] for r in xlsxio.read_xlsx(spark, p).collect())
    assert got == ["_x0041_", "_x005F_x0041_"]


def test_datetime_and_date_roundtrip(spark, tmp_path):
    """Round 5 (verdict item 8): timestamps/dates written as ECMA-376
    native ``t="d"`` ISO-8601 cells come back typed — timestamp when any
    cell carries a time part, date when all are midnight; sub-second
    precision survives."""
    import datetime as dt

    from audit_anomaly_detection_etl_spark.sources import xlsxio

    p = str(tmp_path / "dt.xlsx")
    rows = [
        (dt.datetime(2024, 3, 1, 14, 30, 5, 250000), dt.date(2024, 3, 1), "a"),
        (dt.datetime(1999, 12, 31, 23, 59, 59), dt.date(1900, 3, 1), "b"),
        (None, None, None),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, d date, s string")
    xlsxio.write_xlsx(df, p)
    back = xlsxio.read_xlsx(spark, p)
    assert dict(back.dtypes) == {"ts": "timestamp", "d": "date", "s": "string"}
    got = sorted(back.collect(), key=lambda r: (r["s"] is None, r["s"] or ""))
    exp = sorted(rows, key=lambda r: (r[2] is None, r[2] or ""))
    for g, e in zip(got, exp):
        assert (g["ts"], g["d"], g["s"]) == e


def test_excel_style_serial_dates_recognized(spark, tmp_path):
    """A file the way EXCEL writes dates — numeric serials + a date style in
    styles.xml — reads back as timestamps, including the post-1900-02-28
    Lotus offset; unstyled numbers in the same sheet stay numeric."""
    import datetime as dt
    import struct  # noqa: F401
    import zipfile

    from audit_anomaly_detection_etl_spark.sources import xlsxio
    from audit_anomaly_detection_etl_spark.sources.xlsxio import (
        _CONTENT_TYPES,
        _ROOT_RELS,
        _WORKBOOK,
        _WORKBOOK_RELS,
    )

    styles = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd hh:mm"/></numFmts>'
        "<cellXfs count=\"3\">"
        '<xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/>'
        "</cellXfs></styleSheet>"
    )
    # serial 45355 = 2024-03-04; 45355.5 adds 12h; 61 = 1900-03-01
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>when</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>n</t></is></c></row>'
        '<row r="2"><c r="A2" s="1"><v>45355</v></c><c r="B2"><v>45355</v></c></row>'
        '<row r="3"><c r="A3" s="2"><v>45355.5</v></c><c r="B3"><v>7</v></c></row>'
        '<row r="4"><c r="A4" s="1"><v>61</v></c><c r="B4"><v>0</v></c></row>'
        "</sheetData></worksheet>"
    )
    p = str(tmp_path / "excel_serial.xlsx")
    ct = _CONTENT_TYPES.replace(
        "</Types>",
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.styles+xml"/></Types>',
    )
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/styles.xml", styles)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    back = xlsxio.read_xlsx(spark, p)
    assert dict(back.dtypes) == {"when": "timestamp", "n": "bigint"}
    got = sorted(r["when"] for r in back.collect())
    assert got == [
        dt.datetime(1900, 3, 1),
        dt.datetime(2024, 3, 4),
        dt.datetime(2024, 3, 4, 12, 0),
    ]
