"""Golden-workbook tests for the stdlib BIFF8 ``.xls`` decoder and the
quarantining drop-dir reader (VERDICT r10 "What's missing" #2).

The fixtures hand-roll BOTH layers independently of the decoder: a
BIFF8 record writer (SST/LABELSST/LABEL/NUMBER/RK/MULRK/BOOLERR) and a
minimal OLE2 compound-file writer with two layouts — the regular FAT
chain (stream >= the 4096 cutoff) and the mini-stream (64-byte mini
sectors inside the root chain), so both read paths are exercised.
"""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from xero_api_etl_utilities_spark.sources.biff import (
    OLE2_MAGIC,
    _parse_sst,
    decode_xls_grid,
    ole2_stream,
)
from xero_api_etl_utilities_spark.sources.excel_grid import decode_workbook_grid

# ---------------------------------------------------------------------------
# BIFF8 workbook-stream writer (test-only, independent of the reader)
# ---------------------------------------------------------------------------


def _rec(op: int, data: bytes) -> bytes:
    return struct.pack("<HH", op, len(data)) + data


def _ustr(s: str) -> bytes:
    """BIFF8 unicode string: cch, option byte, chars (compressed when
    latin-1 fits, wide otherwise)."""
    try:
        raw = s.encode("latin-1")
        return struct.pack("<HB", len(s), 0) + raw
    except UnicodeEncodeError:
        return struct.pack("<HB", len(s), 1) + s.encode("utf-16-le")


def _bof(substream_type: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, substream_type, 0xDBB, 0x7CC, 0, 0))


def _rk_from_int(v: int) -> int:
    assert -(1 << 29) <= v < (1 << 29)
    return ((v & ((1 << 30) - 1)) << 2) | 2


def xls_workbook_stream(
    rows: dict[int, dict[str, object]],
    extra_globals: bytes = b"",
    extra_sheet: bytes = b"",
) -> bytes:
    """Build a two-sheet BIFF8 Workbook stream; ``rows`` populates the
    'A4 Summary' sheet (1-based rows, letter columns — the xlsx
    fixture convention). Strings go through the SST except ones
    prefixed 'inline:' (LABEL records); ints divisible by RK limits go
    as NUMBER doubles, 'rk:'-prefixed ints as RK records.
    ``extra_globals``/``extra_sheet`` splice raw records into the
    globals substream / the 'A4 Summary' substream (1904-flag and
    FORMULA scope pins)."""
    sst: list[str] = []
    cell_recs: list[bytes] = []
    for r in sorted(rows):
        for col, v in sorted(rows[r].items()):
            ri, ci = r - 1, ord(col) - 65
            if isinstance(v, str) and v.startswith("inline:"):
                cell_recs.append(
                    _rec(0x0204, struct.pack("<HHH", ri, ci, 0) + _ustr(v[7:]))
                )
            elif isinstance(v, str) and v.startswith("rk:"):
                cell_recs.append(
                    _rec(0x027E, struct.pack("<HHHI", ri, ci, 0, _rk_from_int(int(v[3:]))))
                )
            elif isinstance(v, str) and v.startswith("mulrk:"):
                ints = [int(x) for x in v[6:].split(",")]
                body = struct.pack("<HH", ri, ci)
                for x in ints:
                    body += struct.pack("<HI", 0, _rk_from_int(x))
                body += struct.pack("<H", ci + len(ints) - 1)
                cell_recs.append(_rec(0x00BD, body))
            elif isinstance(v, bool):
                cell_recs.append(
                    _rec(0x0205, struct.pack("<HHHBB", ri, ci, 0, int(v), 0))
                )
            elif isinstance(v, str):
                sst.append(v)
                cell_recs.append(
                    _rec(0x00FD, struct.pack("<HHHI", ri, ci, 0, len(sst) - 1))
                )
            else:
                cell_recs.append(
                    _rec(0x0203, struct.pack("<HHHd", ri, ci, 0, float(v)))
                )

    sheet1 = _bof(0x0010) + _rec(0x000A, b"")
    sheet2 = _bof(0x0010) + extra_sheet + b"".join(cell_recs) + _rec(0x000A, b"")

    sst_body = struct.pack("<II", len(sst), len(sst)) + b"".join(
        _ustr(s) for s in sst
    )

    def bsheet(pos: int, name: str) -> bytes:
        raw = name.encode("latin-1")
        return _rec(0x0085, struct.pack("<IHBB", pos, 0, len(raw), 0) + raw)

    # two passes: globals length depends only on record SIZES, which
    # don't change when the lbPlyPos placeholders are patched
    def globals_part(p1: int, p2: int) -> bytes:
        return (
            _bof(0x0005)
            + extra_globals
            + _rec(0x00FC, sst_body)
            + bsheet(p1, "Front")
            + bsheet(p2, "A4 Summary")
            + _rec(0x000A, b"")
        )

    glen = len(globals_part(0, 0))
    return globals_part(glen, glen + len(sheet1)) + sheet1 + sheet2


# ---------------------------------------------------------------------------
# Minimal OLE2 compound-file writer (test-only)
# ---------------------------------------------------------------------------

_FREE, _EOC, _FATSECT = 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD


def _dirent(name: str, etype: int, start: int, size: int, child: int = _FREE) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    ent = raw + b"\x00" * (64 - len(raw))
    ent += struct.pack("<HBB", len(raw), etype, 1)
    ent += struct.pack("<III", _FREE, _FREE, child)
    ent += b"\x00" * 36  # clsid + state + times
    ent += struct.pack("<IQ", start, size)
    assert len(ent) == 128
    return ent


def _pad(data: bytes, unit: int) -> bytes:
    n = (len(data) + unit - 1) // unit or 1
    return data + b"\x00" * (n * unit - len(data))


def _header(n_fat: int, dir_start: int, minifat_start: int, n_minifat: int) -> bytes:
    h = bytearray(512)
    h[0:8] = OLE2_MAGIC
    struct.pack_into("<HHHHH", h, 24, 0x3E, 0x3, 0xFFFE, 9, 6)
    struct.pack_into("<I", h, 44, n_fat)
    struct.pack_into("<I", h, 48, dir_start)
    struct.pack_into("<I", h, 56, 4096)
    struct.pack_into("<II", h, 60, minifat_start, n_minifat)
    struct.pack_into("<II", h, 68, _EOC, 0)
    struct.pack_into("<109I", h, 76, 0, *([_FREE] * 108))
    return bytes(h)


def ole2_bytes(stream: bytes, name: str = "Workbook") -> bytes:
    """Wrap one stream in a single-FAT-sector OLE2 file.  Streams under
    the 4096 cutoff go to the mini-stream (spec rule); larger ones get
    a regular FAT chain."""
    if len(stream) >= 4096:
        data = _pad(stream, 512)
        n = len(data) // 512
        # sectors: 0=FAT, 1=directory, 2..2+n-1=stream
        fat = [_FATSECT, _EOC] + [2 + i + 1 for i in range(n - 1)] + [_EOC]
        fat += [_FREE] * (128 - len(fat))
        dirs = _dirent("Root Entry", 5, _EOC, 0, child=1) + _dirent(
            name, 2, 2, len(stream)
        )
        return (
            _header(1, 1, _EOC, 0)
            + struct.pack("<128I", *fat)
            + _pad(dirs, 512)
            + data
        )
    container = _pad(stream, 64)
    m = len(container) // 64
    container = _pad(container, 512)
    k = len(container) // 512
    # sectors: 0=FAT, 1=directory, 2=miniFAT, 3..3+k-1=mini container
    fat = [_FATSECT, _EOC, _EOC] + [3 + i + 1 for i in range(k - 1)] + [_EOC]
    fat += [_FREE] * (128 - len(fat))
    minifat = [i + 1 for i in range(m - 1)] + [_EOC]
    minifat += [_FREE] * (128 - len(minifat))
    dirs = _dirent("Root Entry", 5, 3, m * 64, child=1) + _dirent(
        name, 2, 0, len(stream)
    )
    return (
        _header(1, 1, 2, 1)
        + struct.pack("<128I", *fat)
        + _pad(dirs, 512)
        + struct.pack("<128I", *minifat)
        + container
    )


def _xls_bytes(rows: dict[int, dict[str, object]], pad_to_regular: bool = False) -> bytes:
    stream = xls_workbook_stream(rows)
    if pad_to_regular and len(stream) < 4096:
        # zero tail after the last EOF record is never parsed; this
        # forces the regular-FAT placement for small fixtures
        stream += b"\x00" * (4096 - len(stream))
    return ole2_bytes(stream)


_DD01_ROWS = {
    3: {"B": 45292},
    15: {"D": 1.25},
    21: {"C": "Amount"},
    22: {"C": 100.5, "D": "10-643", "E": "rk:12", "F": "inline:note a"},
    23: {"C": 0.004},
    25: {"C": 59.5},
    26: {"C": "Amount"},
    27: {"C": -40, "D": "10643", "E": "mulrk:7,8"},
    28: {"D": "Total Charges"},
    31: {"F": "Total Debtors", "G": 120},
}

# the same grid expressed in the xlsx fixture dialect (no rk/mulrk
# markers — plain numbers), for byte-parity across the two decoders
_DD01_ROWS_XLSX = {
    3: {"B": 45292},
    15: {"D": 1.25},
    21: {"C": "Amount"},
    22: {"C": 100.5, "D": "10-643", "E": 12, "F": "inline:note a"},
    23: {"C": 0.004},
    25: {"C": 59.5},
    26: {"C": "Amount"},
    27: {"C": -40, "D": "10643", "E": 7, "F": 8},
    28: {"D": "Total Charges"},
    31: {"F": "Total Debtors", "G": 120},
}


def test_decode_xls_grid_values_ministream():
    got = dict(decode_xls_grid(_xls_bytes(_DD01_ROWS), "A4 Summary"))
    assert got[3][1] == "45292"            # NUMBER integral → no .0
    assert got[15][3] == "1.25"
    assert got[21][2] == "Amount"          # SST string
    assert got[22][3] == "10-643"
    assert got[22][4] == "12"              # RK integer
    assert got[22][5] == "note a"          # inline LABEL
    assert got[27][2] == "-40"
    assert got[27][4] == "7" and got[27][5] == "8"   # MULRK pair
    assert got[4] == [None] * 7            # absent row materialized
    assert max(got) == 31 and len(got) == 31


def test_regular_fat_layout_decodes_identically():
    mini = decode_xls_grid(_xls_bytes(_DD01_ROWS), "A4 Summary")
    regular = decode_xls_grid(_xls_bytes(_DD01_ROWS, pad_to_regular=True), "A4 Summary")
    assert mini == regular
    blob = _xls_bytes(_DD01_ROWS, pad_to_regular=True)
    assert len(ole2_stream(blob, "Workbook")) >= 4096


def test_xls_matches_xlsx_grid_exactly():
    """The two container decoders must be indistinguishable downstream:
    same rows, same textual cell forms."""
    from tests.test_xlsx_decode import _xlsx_bytes

    via_xls = decode_workbook_grid(_xls_bytes(_DD01_ROWS), "A4 Summary")
    via_xlsx = decode_workbook_grid(_xlsx_bytes(_DD01_ROWS_XLSX), "A4 Summary")
    assert via_xls == via_xlsx


def test_sst_continue_boundary_restarts_option_byte():
    """A string split across SST/CONTINUE re-declares its width at the
    boundary — compressed first half, wide second half here."""
    s1, s2 = "abc", "déf"
    head = struct.pack("<II", 1, 1) + struct.pack("<HB", 6, 0) + s1.encode()
    cont = bytes([1]) + s2.encode("utf-16-le")
    assert _parse_sst([head, cont]) == ["abcdéf"]


def test_boolerr_and_missing_sheet():
    rows = {1: {"A": True, "B": False}}
    got = dict(decode_xls_grid(_xls_bytes(rows), "A4 Summary"))
    assert got[1][0] == "True" and got[1][1] == "False"
    try:
        decode_xls_grid(_xls_bytes(rows), "No Such Sheet")
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


class TestFuzzXls:
    @settings(max_examples=80, deadline=None)
    @given(st.binary(min_size=0, max_size=2048))
    def test_random_bytes_fail_cleanly(self, data):
        try:
            decode_xls_grid(data, "Sheet1")
        except (ValueError, KeyError):
            pass

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=1024))
    def test_ole2_prefixed_garbage_fails_cleanly(self, tail):
        try:
            decode_xls_grid(OLE2_MAGIC + tail, "Sheet1")
        except (ValueError, KeyError):
            pass

    @settings(max_examples=40, deadline=None)
    @given(st.integers(min_value=0, max_value=4095), st.binary(min_size=1, max_size=64))
    def test_bitflipped_valid_file_fails_cleanly(self, pos, junk):
        blob = bytearray(_xls_bytes(_DD01_ROWS))
        pos = pos % len(blob)
        blob[pos : pos + len(junk)] = junk
        try:
            decode_xls_grid(bytes(blob), "A4 Summary")
        except (ValueError, KeyError):
            pass


def test_quarantine_routing_end_to_end(spark, tmp_path):
    """The r10 'done' criterion: a drop-dir with a legacy .xls twin, an
    OLE2-magic garbage file, and plain junk — the good files decode to
    byte-identical grids, the bad files each land in quarantine with a
    diagnosable reason, and ZERO tasks fail."""
    from tests.test_xlsx_decode import _xlsx_bytes
    from xero_api_etl_utilities_spark.sources.excel_grid import (
        read_workbook_grids_with_quarantine,
    )

    (tmp_path / "DD 01.xlsx").write_bytes(_xlsx_bytes(_DD01_ROWS_XLSX))
    (tmp_path / "DD 02.xls").write_bytes(_xls_bytes(_DD01_ROWS))
    (tmp_path / "DD 03.xls").write_bytes(OLE2_MAGIC + b"\x00" * 600)
    (tmp_path / "DD 04.xls").write_bytes(b"not a workbook at all")

    grid, quarantine = read_workbook_grids_with_quarantine(spark, str(tmp_path))
    rows = grid.collect()
    by_file: dict[str, dict] = {}
    for r in rows:
        by_file.setdefault(r["src_file"], {})[r["row_idx"]] = tuple(
            r[c] for c in "ABCDEFG"
        )
    assert set(by_file) == {"DD 01.xlsx", "DD 02.xls"}
    assert by_file["DD 01.xlsx"] == by_file["DD 02.xls"]  # decoder parity

    q = {r["src_file"]: r["reason"] for r in quarantine.collect()}
    assert set(q) == {"DD 03.xls", "DD 04.xls"}
    assert "OLE2" in q["DD 03.xls"] or "Workbook" in q["DD 03.xls"]
    assert "unrecognized workbook container" in q["DD 04.xls"]


# ---------------------------------------------------------------------------
# Out-of-scope BIFF8 features must fail LOUDLY, never decode silently
# (VERDICT r11 "What's missing" #4)
# ---------------------------------------------------------------------------


def test_1904_date_mode_raises_before_any_cell():
    """A 1904-flagged workbook must raise (its serial dates would
    decode 1462 days shifted), while the explicit 1900 flag decodes
    identically to no DATEMODE record at all."""
    import pytest

    rows = {3: {"B": 45292}, 21: {"C": "Amount"}}
    flagged = ole2_bytes(
        xls_workbook_stream(rows, extra_globals=_rec(0x0022, struct.pack("<H", 1)))
    )
    with pytest.raises(ValueError, match="1904"):
        decode_xls_grid(flagged, "A4 Summary")

    plain = decode_xls_grid(ole2_bytes(xls_workbook_stream(rows)), "A4 Summary")
    mode1900 = decode_xls_grid(
        ole2_bytes(
            xls_workbook_stream(rows, extra_globals=_rec(0x0022, struct.pack("<H", 0)))
        ),
        "A4 Summary",
    )
    assert mode1900 == plain and plain


def test_formula_cell_fails_the_sheet():
    """A cached-FORMULA cell must fail the workbook instead of
    emitting a grid with a silent hole where the formula cell was."""
    import pytest

    # FORMULA record: row 21, col C, ixfe + cached-result + grbit +
    # chn + cce payload (content irrelevant — the opcode is the pin)
    formula = _rec(0x0006, struct.pack("<HHH", 21, 2, 0) + bytes(16))
    blob = ole2_bytes(
        xls_workbook_stream({3: {"B": 45292}}, extra_sheet=formula)
    )
    with pytest.raises(ValueError, match="FORMULA"):
        decode_xls_grid(blob, "A4 Summary")


def test_1904_and_formula_route_to_quarantine(spark, tmp_path):
    """End-to-end: the two out-of-scope workbooks land in quarantine
    with diagnosable reasons; a plain sibling still decodes; zero
    tasks fail."""
    from xero_api_etl_utilities_spark.sources.excel_grid import (
        read_workbook_grids_with_quarantine,
    )

    rows = {3: {"B": 45292}, 22: {"C": 100.5}}
    (tmp_path / "DD 01.xls").write_bytes(ole2_bytes(xls_workbook_stream(rows)))
    (tmp_path / "DD 02.xls").write_bytes(
        ole2_bytes(
            xls_workbook_stream(
                rows, extra_globals=_rec(0x0022, struct.pack("<H", 1))
            )
        )
    )
    (tmp_path / "DD 03.xls").write_bytes(
        ole2_bytes(
            xls_workbook_stream(
                rows,
                extra_sheet=_rec(0x0006, struct.pack("<HHH", 21, 2, 0) + bytes(16)),
            )
        )
    )

    grid, quarantine = read_workbook_grids_with_quarantine(spark, str(tmp_path))
    assert {r["src_file"] for r in grid.collect()} == {"DD 01.xls"}
    q = {r["src_file"]: r["reason"] for r in quarantine.collect()}
    assert set(q) == {"DD 02.xls", "DD 03.xls"}
    assert "1904" in q["DD 02.xls"]
    assert "FORMULA" in q["DD 03.xls"]


def test_difat_self_cycle_raises_not_spins():
    """A DIFAT sector pointing at itself with a huge declared n_difat
    must raise promptly (ADVICE r11: the walk was bounded only by the
    header-declared count, up to 2^32-1 iterations)."""
    import pytest

    blob = bytearray(_xls_bytes(_DD01_ROWS, pad_to_regular=True))
    # header: declare a DIFAT chain starting at sector 0 with a huge
    # count, and make sector 0's last slot point back at itself
    struct.pack_into("<II", blob, 68, 0, 0xFFFFFFF0)
    struct.pack_into("<I", blob, 512 + 512 - 4, 0)
    with pytest.raises(ValueError):
        ole2_stream(bytes(blob), "Workbook")


def test_sst_odd_utf16_split_raises():
    """A wide SST string whose first segment holds an odd byte count
    must raise instead of misreading the leftover byte as the
    continuation option byte (ADVICE r11)."""
    import pytest

    # cch=2 wide chars; segment 1 carries 3 bytes (one full char + one
    # dangling byte), segment 2 would carry the rest
    seg1 = struct.pack("<II", 1, 1) + struct.pack("<HB", 2, 1) + b"a\x00b"
    seg2 = b"\x01" + "c".encode("utf-16-le")
    with pytest.raises(ValueError, match="odd UTF-16"):
        _parse_sst([seg1, seg2])
