"""Legacy Excel ``.xls`` extraction (BIFF8, [MS-XLS]) — widens the S6
format matrix past the ``.doc`` row the same way the reference's
textract-style dispatch handled the whole legacy Office family
[R: functions/simple/main.py ⚠ — reference tree is empty; capability
reconstructed from BASELINE.json's format-matrix brief].

Pure-Python reader of the real on-disk format, reusing the [MS-CFB]
container reader from doc.py:

1. **Workbook stream** (``Workbook``, BIFF8; ``Book``, BIFF5-7): a flat
   sequence of records ``(u16 type, u16 len, data)``; the *globals*
   substream (BOF dt=0x0005) carries SST + BOUNDSHEET; each worksheet
   substream starts at its BOUNDSHEET's ``lbPlyPos``.
2. **SST** (0x00FC) with **CONTINUE** (0x003C) spill: strings are
   ``XLUnicodeRichExtendedString`` — when character data crosses a
   record boundary the continuation restates the ``fHighByte`` option
   byte (the classic BIFF trap); rich runs / ExtRst payloads continue
   raw and are skipped.
3. **Cell records**: LABELSST, LABEL (inline), NUMBER, RK, MULRK,
   BOOLERR and FORMULA (cached result; string results via the trailing
   STRING record).

Output conventions match extract_xlsx (X5) exactly so the two Excel
generations read the same to downstream text ops: rows are
TAB-joined cells in column order, sheets (in BOUNDSHEET document order)
are blank-line separated, and everything flows through normalize_text
(X17).  Numbers render shortest-form: integral values as integers,
non-integral via Python ``repr`` (the deterministic float convention
pinned by the golden).
"""

from __future__ import annotations

import struct

from .doc import CfbFile, _DocError
from .normalize import normalize_text

_SST = 0x00FC
_CONTINUE = 0x003C
_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207

_ERR_NAMES = {0x00: "#NULL!", 0x07: "#DIV/0!", 0x0F: "#VALUE!",
              0x17: "#REF!", 0x1D: "#NAME?", 0x24: "#NUM!", 0x2A: "#N/A"}


class _XlsError(ValueError):
    pass


def _records(stream: bytes, pos: int = 0):
    """Yield (type, data_offset, length) from *pos* until stream end or a
    malformed header.  Offsets (not slices) so SST/CONTINUE grouping can
    peek ahead without copying."""
    n = len(stream)
    while pos + 4 <= n:
        rt, ln = struct.unpack_from("<HH", stream, pos)
        if pos + 4 + ln > n:
            break
        yield rt, pos + 4, ln
        pos += 4 + ln


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _rk_value(rk: int) -> float:
    f_x100 = rk & 0x01
    f_int = rk & 0x02
    if f_int:
        v = rk >> 2
        if v & 0x20000000:  # 30-bit sign extend
            v -= 0x40000000
        val = float(v)
    else:
        (val,) = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))
    return val / 100.0 if f_x100 else val


class _Frags:
    """Cursor over an SST record + its CONTINUE spill fragments.

    ``read_raw`` crosses fragment boundaries byte-transparently (headers,
    rich-run and ExtRst payloads continue unframed); ``read_chars`` reads
    character data, re-reading the restated option byte whenever the
    char run resumes in a new fragment ([MS-XLS] 2.5.293: only the
    fHighByte bit of the restated byte is meaningful).
    """

    def __init__(self, frags: list[bytes]) -> None:
        self.frags = frags
        self.fi = 0
        self.off = 0

    def _avail(self) -> int:
        return len(self.frags[self.fi]) - self.off

    def _advance(self) -> bool:
        while self.fi < len(self.frags) and self._avail() == 0:
            self.fi += 1
            self.off = 0
        return self.fi < len(self.frags)

    def read_raw(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            if not self._advance():
                raise _XlsError("SST truncated")
            take = min(n, self._avail())
            out += self.frags[self.fi][self.off : self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_chars(self, cch: int, high: bool) -> str:
        parts: list[str] = []
        while cch > 0:
            if self.fi >= len(self.frags):
                raise _XlsError("SST char run truncated")
            if self._avail() == 0:
                # char run resumes in the next fragment: restated flag byte
                self.fi += 1
                self.off = 0
                while (self.fi < len(self.frags)
                       and not self.frags[self.fi]):
                    self.fi += 1
                if self.fi >= len(self.frags):
                    raise _XlsError("SST continuation missing")
                high = bool(self.frags[self.fi][0] & 0x01)
                self.off = 1
            width = 2 if high else 1
            take_ch = min(cch, self._avail() // width)
            if take_ch == 0:
                # an odd trailing byte can't hold a char; legal BIFF splits
                # at char boundaries — treat the remainder as exhausted
                self.off = len(self.frags[self.fi])
                continue
            raw = self.frags[self.fi][self.off : self.off + take_ch * width]
            self.off += take_ch * width
            cch -= take_ch
            parts.append(raw.decode("utf-16-le" if high else "latin-1",
                                    "replace"))
        return "".join(parts)


def _parse_sst(stream: bytes, sst_off: int, sst_len: int,
               records) -> tuple[list[str], list[tuple[int, int, int]]]:
    """*records* is the live record iterator positioned right after the
    SST header; consumes its CONTINUE records."""
    frags = [stream[sst_off : sst_off + sst_len]]
    tail = []
    for rt, off, ln in records:
        if rt == _CONTINUE:
            frags.append(stream[off : off + ln])
        else:
            tail.append((rt, off, ln))
            break
    cur = _Frags(frags)
    cur.read_raw(4)  # cstTotal
    (cst_unique,) = struct.unpack("<I", cur.read_raw(4))
    strings: list[str] = []
    for _ in range(min(cst_unique, 1_000_000)):
        hdr = cur.read_raw(3)
        cch, flags = struct.unpack("<HB", hdr)
        high = bool(flags & 0x01)
        ext = bool(flags & 0x04)
        rich = bool(flags & 0x08)
        c_run = struct.unpack("<H", cur.read_raw(2))[0] if rich else 0
        cb_ext = struct.unpack("<I", cur.read_raw(4))[0] if ext else 0
        strings.append(cur.read_chars(cch, high))
        if c_run:
            cur.read_raw(4 * c_run)
        if cb_ext:
            cur.read_raw(cb_ext)
    return strings, tail


def _xl_unicode_string(data: bytes, off: int) -> str:
    """XLUnicodeString (u16 cch, u8 flags, chars) — LABEL / STRING bodies."""
    cch, flags = struct.unpack_from("<HB", data, off)
    off += 3
    if flags & 0x01:
        return data[off : off + 2 * cch].decode("utf-16-le", "replace")
    return data[off : off + cch].decode("latin-1", "replace")


def _sheet_cells(stream: bytes, start: int, sst: list[str]) -> dict:
    cells: dict[tuple[int, int], str] = {}
    pending_formula: tuple[int, int] | None = None
    for rt, off, ln in _records(stream, start):
        if rt == _EOF:
            break
        data = stream[off : off + ln]
        if rt == _LABELSST and ln >= 10:
            rw, col, _, isst = struct.unpack_from("<HHHI", data, 0)
            if isst < len(sst):
                cells[(rw, col)] = sst[isst]
        elif rt == _LABEL and ln >= 9:
            rw, col = struct.unpack_from("<HH", data, 0)
            cells[(rw, col)] = _xl_unicode_string(data, 6)
        elif rt == _NUMBER and ln >= 14:
            rw, col = struct.unpack_from("<HH", data, 0)
            (num,) = struct.unpack_from("<d", data, 6)
            cells[(rw, col)] = _fmt_num(num)
        elif rt == _RK and ln >= 10:
            rw, col = struct.unpack_from("<HH", data, 0)
            (rk,) = struct.unpack_from("<I", data, 6)
            cells[(rw, col)] = _fmt_num(_rk_value(rk))
        elif rt == _MULRK and ln >= 12:
            rw, col_first = struct.unpack_from("<HH", data, 0)
            n = (ln - 6) // 6
            for k in range(n):
                (rk,) = struct.unpack_from("<I", data, 4 + 6 * k + 2)
                cells[(rw, col_first + k)] = _fmt_num(_rk_value(rk))
        elif rt == _BOOLERR and ln >= 8:
            rw, col = struct.unpack_from("<HH", data, 0)
            b_val, f_err = data[6], data[7]
            if f_err:
                cells[(rw, col)] = _ERR_NAMES.get(b_val, "#ERR!")
            else:
                cells[(rw, col)] = "TRUE" if b_val else "FALSE"
        elif rt == _FORMULA and ln >= 14:
            rw, col = struct.unpack_from("<HH", data, 0)
            if data[12:14] == b"\xff\xff":
                kind = data[6]
                if kind == 0x00:  # cached string -> following STRING record
                    pending_formula = (rw, col)
                elif kind == 0x01:
                    cells[(rw, col)] = "TRUE" if data[8] else "FALSE"
                elif kind == 0x02:
                    cells[(rw, col)] = _ERR_NAMES.get(data[8], "#ERR!")
                # 0x03 = cached blank: no output cell
            else:
                (num,) = struct.unpack_from("<d", data, 6)
                cells[(rw, col)] = _fmt_num(num)
        elif rt == _STRING and pending_formula is not None:
            cells[pending_formula] = _xl_unicode_string(data, 0)
            pending_formula = None
    return cells


def extract_xls(payload: bytes) -> str:
    """bytes (OLE .xls) -> plain text (see module docstring conventions)."""
    cfb = CfbFile(payload)
    try:
        stream = cfb.read_stream("Workbook")
    except _DocError:
        stream = cfb.read_stream("Book")  # BIFF5-7 name
    if len(stream) < 8:
        raise _XlsError("Workbook stream too short")
    (w_ident,) = struct.unpack_from("<H", stream, 0)
    if w_ident != _BOF:
        raise _XlsError(f"Workbook stream does not start with BOF "
                        f"(0x{w_ident:04x})")

    sst: list[str] = []
    sheets: list[tuple[int, str]] = []  # (lbPlyPos, name) in document order
    rec_iter = _records(stream, 0)
    pending: tuple[int, int, int] | None = None  # carried past an SST scan
    while True:
        if pending is not None:
            rt, off, ln = pending
            pending = None
        else:
            try:
                rt, off, ln = next(rec_iter)
            except StopIteration:
                break
        if rt == _EOF:
            break  # end of the globals substream
        if rt == _SST:
            sst, tail = _parse_sst(stream, off, ln, rec_iter)
            pending = tail[0] if tail else None
        elif rt == _BOUNDSHEET and ln >= 8:
            sheets.append(_boundsheet(stream[off : off + ln]))

    if not sheets:
        raise _XlsError("no BOUNDSHEET records")

    out: list[str] = []
    for pos, _name in sheets:
        if not (0 <= pos < len(stream)):
            continue
        cells = _sheet_cells(stream, pos, sst)
        rows: dict[int, dict[int, str]] = {}
        for (rw, col), v in cells.items():
            rows.setdefault(rw, {})[col] = v
        lines = []
        for rw in sorted(rows):
            cols = rows[rw]
            lines.append("\t".join(cols[c] for c in sorted(cols)))
        out.append("\n".join(lines))
    return normalize_text("\n\n".join(out))


def _boundsheet(data: bytes) -> tuple[int, str]:
    (pos,) = struct.unpack_from("<I", data, 0)
    cch = data[6]
    flags = data[7]
    if flags & 0x01:
        name = data[8 : 8 + 2 * cch].decode("utf-16-le", "replace")
    else:
        name = data[8 : 8 + cch].decode("latin-1", "replace")
    return pos, name
