"""Excel (.xlsx) sink/scan without any Excel library — SURVEY.md §2 S7.

Reference analogue: the Kedro ``pandas.ExcelDataSet`` audit-report outputs
(``conf/base/catalog.yml:40-45,63-77,104-109``). Those are *bounded
per-audit reports* (hundreds to thousands of rows a human opens in Excel),
not data-plane tables — so the right Spark shape is a DRIVER-side sink over
a bounded ``collect()``, exactly like the reference writes them from a
single pandas frame. The hard cap defaults to Excel's own sheet limit and
``write_xlsx`` refuses anything larger rather than silently truncating.

No openpyxl/xlsxwriter ships in this sandbox, and none is needed: .xlsx is
a ZIP of SpreadsheetML XML parts (ECMA-376, public spec). The writer emits
the five mandatory parts with inline strings (no sharedStrings table — the
simplest valid form, and what keeps the reader dependency-free too); the
reader accepts both inline strings and sharedStrings-indexed cells so files
written by Excel/openpyxl round-trip as well.

Typing across the trip: numbers are written without a type attribute
(SpreadsheetML's numeric default) and strings as ``t="inlineStr"``. The
reader rebuilds a column as long/double when EVERY populated cell in it is
numeric, else string — same inference grain as the CSV scan.

Dates/timestamps (round 5 — the reference's features/report outputs carry
submission datetimes): written as ECMA-376 native date cells — ``t="d"``
with an ISO-8601 literal (§18.17.4.1 date1904=false semantics; the
spec-blessed lossless form, no styles part needed). The reader recognizes
BOTH that form and what Excel itself writes (numeric serials styled with a
date number format): when a ``styles.xml`` is present, cells whose xf
points at a built-in date numFmtId (14-22, 45-47) or a custom format whose
code contains date tokens are converted from the 1899-12-30 serial epoch
(including the deliberate Lotus leap-year-bug offset for serials >= 60,
which the epoch choice absorbs). A column whose populated cells are all
dates comes back as ``timestamp`` (``date`` when no cell carries a time
part). Binary stays out of scope (stringify upstream).
"""

from __future__ import annotations

import datetime as _dt
import os
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

# Excel's hard per-sheet row limit (2^20), minus the header row
MAX_XLSX_ROWS = 1_048_575

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_INT_RE = re.compile(r"^-?\d+$")
_NUM_RE = re.compile(r"^-?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?$")

# XML 1.0 cannot carry these code points at all (not even entity-escaped);
# SpreadsheetML's own convention (ECMA-376 §22.9.2.19, what Excel writes) is
# the _xHHHH_ escape. Literal '_xHHHH_'-shaped text must itself be escaped
# as _x005F_xHHHH_ so the round trip is lossless.
# \r is XML-legal but parsers MUST normalize it to \n (XML 1.0 §2.11), so a
# raw CR silently corrupts the round trip — Excel escapes it as _x000D_ for
# exactly this reason. U+FFFE/U+FFFF and lone surrogates are not XML chars
# at all: expat rejects a file carrying them raw.
_XML_ILLEGAL_RE = re.compile(
    "[\x00-\x08\x0b-\x0c\x0d\x0e-\x1f\ud800-\udfff\ufffe\uffff]"
)
_X_ESCAPE_RE = re.compile(r"_x([0-9A-Fa-f]{4})_")
# escape-side match is a LOOKAHEAD on the leading underscore: tokens can
# OVERLAP (the trailing '_' of '_x005F_' is the lead of a following
# 'x0041_'), and a consuming match would skip the second token — literal
# '_x005F_x0041_' text then corrupts to '_x005FA' after a round trip. The
# lookahead escapes every underscore that starts a token shape, consuming
# nothing, so overlapping tokens each get their own _x005F_. The shape's
# closing '_' may also MATERIALIZE in the escaped output: an illegal char
# right after '_xHHHH' becomes an '_x00NN_' escape whose lead underscore
# completes the spurious token (literal '_x0041'+\\x01 would decode as
# 'A'+...), so the lookahead accepts 'closing _ OR illegal char' there.
_X_LEAD_RE = re.compile(
    "_(?=x[0-9A-Fa-f]{4}"
    "(?:_|[\x00-\x08\x0b-\x1f\ud800-\udfff\ufffe\uffff]))"
)


def _x_escape(s: str) -> str:
    s = _X_LEAD_RE.sub("_x005F_", s)
    return _XML_ILLEGAL_RE.sub(lambda m: f"_x{ord(m.group(0)):04X}_", s)


def _x_unescape(s: str) -> str:
    return _X_ESCAPE_RE.sub(lambda m: chr(int(m.group(1), 16)), s)


def _col_letter(i: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, AB, ..."""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)
_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _cell_xml(ref: str, v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, _dt.datetime):
        # ECMA-376 native date cell; naive ISO-8601 (session tz is UTC)
        return f'<c r="{ref}" t="d"><v>{v.replace(tzinfo=None).isoformat()}</v></c>'
    if isinstance(v, _dt.date):
        return f'<c r="{ref}" t="d"><v>{v.isoformat()}</v></c>'
    if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
        # SpreadsheetML numeric cells cannot carry NaN/Infinity (Excel would
        # reject the file, and 'nan' text would silently demote the whole
        # column to string on read-back). Excel's own representation of a
        # non-finite number is an empty cell -> null after the round trip.
        return ""
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    return (
        f'<c r="{ref}" t="inlineStr"><is><t>{escape(_x_escape(str(v)))}</t></is></c>'
    )


def write_xlsx(df: DataFrame, path: str, max_rows: int = MAX_XLSX_ROWS) -> int:
    """Write a DataFrame as a single-sheet .xlsx report; returns row count.

    Driver-side by design (see module docstring): Excel is the
    human-report sink, bounded by its own 2^20-row sheet limit. Raises
    ``ValueError`` past ``max_rows`` instead of truncating — if the result
    is too big for Excel it is not an Excel report; the caller should
    aggregate first or use the parquet/ORC/CSV sinks.
    """
    cols = df.columns
    # bounded collect: limit+1 detects overflow without a full count
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_xlsx: result exceeds {max_rows} rows — aggregate first "
            "or use a data-plane sink (parquet/ORC/CSV)"
        )
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
             "<sheetData>"]
    head = "".join(
        _cell_xml(f"{_col_letter(i)}1", c) for i, c in enumerate(cols)
    )
    parts.append(f'<row r="1">{head}</row>')
    for rn, row in enumerate(rows, start=2):
        body = "".join(
            _cell_xml(f"{_col_letter(i)}{rn}", row[c]) for i, c in enumerate(cols)
        )
        parts.append(f'<row r="{rn}">{body}</row>')
    parts.append("</sheetData></worksheet>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", "".join(parts))
    return len(rows)


def _cell_ref_to_col(ref: str) -> int:
    i = 0
    for ch in ref:
        if ch.isdigit():
            break
        i = i * 26 + (ord(ch) - ord("A") + 1)
    return i - 1


# Built-in ECMA-376 date/time number formats (§18.8.30) + the token test
# for custom formats: any of y/d/h/s, or 'm' (month/minute), outside
# bracketed color/locale sections and quoted literals.
_BUILTIN_DATE_FMT_IDS = set(range(14, 23)) | {45, 46, 47}
_DATE_TOKEN_RE = re.compile(r"[ymdhs]", re.IGNORECASE)


def _strip_fmt_literals(code: str) -> str:
    return re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", code)


def _date_style_indexes(z: zipfile.ZipFile) -> set[int]:
    """Indexes into cellXfs whose numFmt renders as a date/time — the set a
    serial-number cell's ``s=`` attribute is tested against."""
    if "xl/styles.xml" not in z.namelist():
        return set()
    root = ET.fromstring(z.read("xl/styles.xml"))
    custom_date_ids = set()
    for nf in root.iter(f"{_NS}numFmt"):
        code = _strip_fmt_literals(nf.get("formatCode") or "")
        if _DATE_TOKEN_RE.search(code):
            custom_date_ids.add(int(nf.get("numFmtId")))
    out = set()
    cellxfs = root.find(f"{_NS}cellXfs")
    if cellxfs is None:
        return out
    for i, xf in enumerate(cellxfs.findall(f"{_NS}xf")):
        fmt = int(xf.get("numFmtId") or 0)
        if fmt in _BUILTIN_DATE_FMT_IDS or fmt in custom_date_ids:
            out.add(i)
    return out


# serial 0 == 1899-12-30 in the date1900 system: Lotus counted from
# 1900-01-00 AND invented 1900-02-29 (serial 60); for every real date past
# that phantom day (serial >= 61, i.e. all of 1900-03-01 onward) the -2-day
# epoch shift gives the correct calendar date, and pre-1900 serials never
# occur in practice (Excel cannot even enter them).
_SERIAL_EPOCH = _dt.datetime(1899, 12, 30)


def _from_serial(text: str) -> _dt.datetime:
    # round to whole seconds: serials carry ~microsecond float noise
    return _SERIAL_EPOCH + _dt.timedelta(
        seconds=round(float(text) * 86400.0)
    )


def _parse_iso_cell(text: str):
    t = text.strip()
    try:
        if "T" in t or ":" in t:
            return _dt.datetime.fromisoformat(t.rstrip("Z"))
        d = _dt.date.fromisoformat(t)
        return _dt.datetime(d.year, d.month, d.day)
    except ValueError:
        return None


def _read_rows(path: str) -> list[list]:
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        date_styles = _date_style_indexes(z)
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    out = []
    for row in sheet.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for ci, c in enumerate(row.iter(f"{_NS}c")):
            ref = c.get("r")
            idx = _cell_ref_to_col(ref) if ref else ci
            t = c.get("t")
            if t == "inlineStr":
                cells[idx] = _x_unescape(
                    "".join(x.text or "" for x in c.iter(f"{_NS}t"))
                )
                continue
            v = c.find(f"{_NS}v")
            if v is None or v.text is None:
                cells[idx] = None
            elif t == "s":
                cells[idx] = _x_unescape(shared[int(v.text)])
            elif t == "b":
                cells[idx] = v.text == "1"
            elif t == "d":
                # ECMA-376 native ISO-8601 date cell (what write_xlsx emits);
                # an unparseable literal degrades to string, never a crash
                cells[idx] = _parse_iso_cell(v.text) or v.text
            elif (
                t is None
                and date_styles
                and int(c.get("s") or -1) in date_styles
                and _NUM_RE.match(v.text or "")
            ):
                # Excel-written serial with a date style
                cells[idx] = _from_serial(v.text)
            else:
                cells[idx] = v.text  # numeric text; typed per-column below
        width = max(cells) + 1 if cells else 0
        out.append([cells.get(i) for i in range(width)])
    return out


def read_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """Scan a single-sheet .xlsx back to a DataFrame. First row = header.

    A column comes back long/double when every populated cell is numeric
    (bool stays boolean), else string — the same inference grain as a
    header CSV scan. Driver-side parse (reports are bounded by
    construction — see write_xlsx); the result is a regular distributed
    DataFrame afterwards.
    """
    raw = _read_rows(path)
    if not raw:
        # a blank sheet (Excel writes <sheetData/> for these) has no header
        # row to derive a schema from: a 0-column, 0-row frame is the honest
        # result (schema="" would raise a DDL ParseException)
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], schema=StructType([]))
    header = [str(h) for h in raw[0]]
    body = [r + [None] * (len(header) - len(r)) for r in raw[1:]]
    types = []
    for i in range(len(header)):
        vals = [r[i] for r in body if r[i] is not None]
        if vals and all(isinstance(v, bool) for v in vals):
            types.append("boolean")
        elif vals and all(isinstance(v, _dt.datetime) for v in vals):
            # all-midnight columns round-trip as DATE, else TIMESTAMP
            types.append(
                "date"
                if all(v.time() == _dt.time(0, 0) for v in vals)
                else "timestamp"
            )
        elif vals and all(
            isinstance(v, str) and _INT_RE.match(v) for v in vals
        ):
            types.append("long")
        elif vals and all(
            isinstance(v, str) and _NUM_RE.match(v) for v in vals
        ):
            types.append("double")
        else:
            types.append("string")
    conv = {"long": int, "double": float, "boolean": None, "string": str}
    typed = []
    for r in body:
        rr = []
        for i, t in enumerate(types):
            v = r[i]
            if v is None:
                rr.append(None)
            elif t == "boolean":
                rr.append(bool(v))
            elif t == "timestamp":
                rr.append(v)
            elif t == "date":
                rr.append(v.date())
            else:
                rr.append(conv[t](v))
        typed.append(tuple(rr))
    schema = ", ".join(f"`{h}` {t}" for h, t in zip(header, types))
    return spark.createDataFrame(typed, schema=schema)
