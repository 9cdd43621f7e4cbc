"""X8 — legacy Word ``.doc`` extraction (upgrades the SURVEY.md §7 gap).

Reference analogue: the simple Lambda forked the bundled ``antiword``
static binary on a /tmp copy of the payload
[R: functions/simple/main.py ⚠; bin-linux_x64/antiword ⚠].  No binaries
here, so this is a pure-Python reader of the real on-disk formats:

1. **CFB / OLE2 compound file** ([MS-CFB]): 512/4096-byte sectors, header
   DIFAT + chained DIFAT, FAT chains, directory tree, miniFAT + mini
   stream for streams under the 4096-byte cutoff.
2. **Word 97+ binary** ([MS-DOC]): FIB at the head of the
   ``WordDocument`` stream (wIdent 0xA5EC); flag bit 0x0200 selects the
   ``1Table``/``0Table`` stream; fcClx/lcbClx at FIB offsets
   0x01A2/0x01A6 locate the Clx; the Pcdt's PlcPcd maps character
   positions to pieces; each PCD's FcCompressed picks 8-bit cp1252
   (fc/2) or UTF-16LE (fc) text in the WordDocument stream.

Word 6/95 files (nFib < 0x0069 or no parseable Clx) fall back to the
fcMin..fcMac contiguous-text range, which is how those versions stored
text.  Paragraph marks (CR) map to newlines; field/control chars are
stripped; output goes through normalize_text (X17) like every extractor.
"""

from __future__ import annotations

import struct

from .normalize import normalize_text

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


class _DocError(ValueError):
    pass


# ------------------------------------------------------------------- CFB

class CfbFile:
    """Minimal [MS-CFB] reader: enough to list streams and read them."""

    def __init__(self, data: bytes) -> None:
        if not data.startswith(CFB_MAGIC):
            raise _DocError("not a CFB file")
        if len(data) < 512:
            raise _DocError("truncated CFB header")
        self.data = data
        (self.sector_shift,) = struct.unpack_from("<H", data, 30)
        (self.mini_shift,) = struct.unpack_from("<H", data, 32)
        self.sector_size = 1 << self.sector_shift
        self.mini_size = 1 << self.mini_shift
        (self.n_fat,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat,) = struct.unpack_from("<I", data, 64)
        (self.difat_start,) = struct.unpack_from("<I", data, 68)
        (self.n_difat,) = struct.unpack_from("<I", data, 72)
        self.fat = self._load_fat()
        self.dir_entries = self._load_directory()
        self.mini_fat = self._load_minifat()
        self.mini_stream = (
            self._read_chain(self.dir_entries[0]["start"], self.dir_entries[0]["size"])
            if self.dir_entries else b""
        )

    def _sector(self, idx: int) -> bytes:
        off = 512 + idx * self.sector_size
        return self.data[off : off + self.sector_size]

    def _load_fat(self) -> list[int]:
        difat: list[int] = list(struct.unpack_from("<109I", self.data, 76))
        nxt = self.difat_start
        guard = 0
        while nxt not in (_ENDOFCHAIN, _FREESECT) and guard < self.n_difat + 2:
            sec = self._sector(nxt)
            vals = struct.unpack(f"<{self.sector_size // 4}I", sec)
            difat.extend(vals[:-1])
            nxt = vals[-1]
            guard += 1
        fat: list[int] = []
        for s in difat:
            if s in (_FREESECT, _ENDOFCHAIN):
                continue
            sec = self._sector(s)
            if len(sec) < self.sector_size:
                break
            fat.extend(struct.unpack(f"<{self.sector_size // 4}I", sec))
        return fat

    def _read_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        sec = start
        guard = 0
        limit = len(self.fat) + 2
        while sec not in (_ENDOFCHAIN, _FREESECT) and guard < limit:
            out += self._sector(sec)
            if sec >= len(self.fat):
                break
            sec = self.fat[sec]
            guard += 1
        return bytes(out[:size]) if size else bytes(out)

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        sec = start
        guard = 0
        limit = len(self.mini_fat) + 2
        while sec not in (_ENDOFCHAIN, _FREESECT) and guard < limit:
            off = sec * self.mini_size
            out += self.mini_stream[off : off + self.mini_size]
            if sec >= len(self.mini_fat):
                break
            sec = self.mini_fat[sec]
            guard += 1
        return bytes(out[:size])

    def _load_minifat(self) -> list[int]:
        if self.minifat_start in (_ENDOFCHAIN, _FREESECT) or self.n_minifat == 0:
            return []
        raw = self._read_chain(self.minifat_start, self.n_minifat * self.sector_size)
        return list(struct.unpack(f"<{len(raw) // 4}I", raw[: len(raw) // 4 * 4]))

    def _load_directory(self) -> list[dict]:
        raw = self._read_chain(self.dir_start, 0)
        entries = []
        for off in range(0, len(raw) - 127, 128):
            (name_len,) = struct.unpack_from("<H", raw, off + 64)
            if name_len < 2 or name_len > 64:
                continue
            name = raw[off : off + name_len - 2].decode("utf-16-le", "replace")
            etype = raw[off + 66]
            (start,) = struct.unpack_from("<I", raw, off + 116)
            (size,) = struct.unpack_from("<Q", raw, off + 120)
            if self.sector_shift == 9:  # 512-byte sectors: high dword unused
                size &= 0xFFFFFFFF
            entries.append({"name": name, "type": etype, "start": start, "size": size})
        return entries

    def read_stream(self, name: str) -> bytes:
        for e in self.dir_entries:
            if e["name"] == name and e["type"] == 2:
                if e["size"] < self.mini_cutoff and self.mini_fat:
                    return self._read_mini_chain(e["start"], e["size"])
                return self._read_chain(e["start"], e["size"])
        raise _DocError(f"stream {name!r} not found")


def ole_subtype(payload: bytes) -> str:
    """CFB directory sniff: ``doc`` | ``xls`` | ``ppt`` | ``ole``.

    The OLE magic alone can't distinguish the legacy Office family — the
    application lives in the directory's stream names ([MS-CFB] storage
    conventions).  An unparseable container returns ``doc`` so the
    extractor surfaces the real parse error in the status row; a parseable
    container with none of the known streams is ``ole`` (routed to the
    ``unsupported_legacy`` quarantine by the dispatcher)."""
    try:
        names = {e["name"] for e in CfbFile(payload).dir_entries
                 if e["type"] == 2}
    except Exception:  # noqa: BLE001 — sniff never raises
        return "doc"
    if not names:
        # a directory with no streams at all is damage (truncation), not
        # an unknown application: let extract_doc report the real error
        return "doc"
    if "WordDocument" in names:
        return "doc"
    if "Workbook" in names or "Book" in names:
        return "xls"
    if "PowerPoint Document" in names:
        return "ppt"
    if ("__properties_version1.0" in names
            or any(n.startswith("__substg1.0_") for n in names)):
        return "msg"
    return "ole"


# ------------------------------------------------------------------ .doc

_CONTROL_MAP = {
    0x0007: "\t",   # cell mark -> tab
    0x000B: "\n",   # hard line break
    0x000C: "\n",   # page break / section mark
    0x000D: "\n",   # paragraph mark
    0x001E: "-",    # non-breaking hyphen
    0x00A0: " ",
}


def _clean_word_text(s: str) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if o in _CONTROL_MAP:
            out.append(_CONTROL_MAP[o])
        elif o < 32:
            continue  # field chars (0x13/0x14/0x15), other controls
        else:
            out.append(ch)
    return "".join(out)


def _pieces_from_clx(clx: bytes, word_stream: bytes) -> str | None:
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:  # Prc (property modifier) - skip
        if pos + 3 > len(clx):
            return None
        (cb,) = struct.unpack_from("<H", clx, pos + 1)
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:  # Pcdt marker
        return None
    (lcb,) = struct.unpack_from("<I", clx, pos + 1)
    plc = clx[pos + 5 : pos + 5 + lcb]
    if len(plc) < lcb or lcb < 4 or (lcb - 4) % 12 != 0:
        return None
    n = (lcb - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    texts = []
    for i in range(n):
        off = 4 * (n + 1) + 8 * i
        (fc_raw,) = struct.unpack_from("<I", plc, off + 2)
        n_chars = cps[i + 1] - cps[i]
        fc = fc_raw & 0x3FFFFFFF
        compressed = bool(fc_raw & 0x40000000)
        if compressed:
            chunk = word_stream[fc // 2 : fc // 2 + n_chars]
            texts.append(chunk.decode("cp1252", "replace"))
        else:
            chunk = word_stream[fc : fc + 2 * n_chars]
            texts.append(chunk.decode("utf-16-le", "replace"))
    return "".join(texts)


def extract_doc(payload: bytes) -> str:
    """bytes (OLE .doc) -> plain text."""
    cfb = CfbFile(payload)
    word = cfb.read_stream("WordDocument")
    if len(word) < 0x0200:
        raise _DocError("WordDocument stream too short")
    (w_ident,) = struct.unpack_from("<H", word, 0)
    if w_ident != 0xA5EC:
        raise _DocError(f"bad FIB wIdent 0x{w_ident:04x}")
    (flags,) = struct.unpack_from("<H", word, 10)
    table_name = "1Table" if flags & 0x0200 else "0Table"

    text: str | None = None
    if len(word) >= 0x01AA:
        (fc_clx,) = struct.unpack_from("<I", word, 0x01A2)
        (lcb_clx,) = struct.unpack_from("<I", word, 0x01A6)
        if lcb_clx:
            try:
                table = cfb.read_stream(table_name)
            except _DocError:
                table = b""
            clx = table[fc_clx : fc_clx + lcb_clx]
            if len(clx) == lcb_clx:
                text = _pieces_from_clx(clx, word)
    if text is None:
        # Word 6/95 fallback: contiguous text at fcMin..fcMac
        (fc_min,) = struct.unpack_from("<I", word, 24)
        (fc_mac,) = struct.unpack_from("<I", word, 28)
        if not (0 <= fc_min < fc_mac <= len(word)):
            raise _DocError("no piece table and no valid fcMin/fcMac")
        text = word[fc_min:fc_mac].decode("cp1252", "replace")
    return normalize_text(_clean_word_text(text))
