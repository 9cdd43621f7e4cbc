"""CCITT Group 4 (ITU-T T.6, 2-D MMR) decoder for fax-encoded TIFF
scans (X14, round 4 — the last honestly-quarantined TIFF compression).

Reference analogue: Tesseract ingests fax TIFFs via libtiff's G3/G4
codec [R: functions/ocr/main.py ⚠].  This is a from-scratch T.6
implementation: every row is coded 2-D against the previous row's
changing elements with vertical (|a1-b1| <= 3), pass (b2 < a1) and
horizontal modes; horizontal runs use the T.4 modified-Huffman white /
black code tables (terminating 0..63 + makeup 64..2560, including the
shared extended makeups).  The corpus writer (corpusgen._g4_encode) is
an independent implementation of the same procedure — the two share
ONLY the published code tables below, and the closed loop is pinned by
hand-derived bitstreams in tests (all-white page = one V0 bit per row;
a horizontal-mode row checked code by code against the spec tables), so
a table typo breaks the spec-pin test rather than hiding in a shared
quirk.

No real G4 sample exists on this host to fixture against (unlike the
GIF/JPEG reference files); the spec-pin tests are the substitute.
"""

from __future__ import annotations

from bisect import bisect_right

from .ocr import OcrError

# T.4 modified-Huffman run-length codes, (bit-length, code-value) -> run.
# Terminating codes 0..63 and makeup codes 64..2560 (the >= 1792 rows are
# the extended makeups shared by both colours).

_WHITE_CODES = {
    (8, 0b00110101): 0, (6, 0b000111): 1, (4, 0b0111): 2, (4, 0b1000): 3,
    (4, 0b1011): 4, (4, 0b1100): 5, (4, 0b1110): 6, (4, 0b1111): 7,
    (5, 0b10011): 8, (5, 0b10100): 9, (5, 0b00111): 10, (5, 0b01000): 11,
    (6, 0b001000): 12, (6, 0b000011): 13, (6, 0b110100): 14,
    (6, 0b110101): 15, (6, 0b101010): 16, (6, 0b101011): 17,
    (7, 0b0100111): 18, (7, 0b0001100): 19, (7, 0b0001000): 20,
    (7, 0b0010111): 21, (7, 0b0000011): 22, (7, 0b0000100): 23,
    (7, 0b0101000): 24, (7, 0b0101011): 25, (7, 0b0010011): 26,
    (7, 0b0100100): 27, (7, 0b0011000): 28, (8, 0b00000010): 29,
    (8, 0b00000011): 30, (8, 0b00011010): 31, (8, 0b00011011): 32,
    (8, 0b00010010): 33, (8, 0b00010011): 34, (8, 0b00010100): 35,
    (8, 0b00010101): 36, (8, 0b00010110): 37, (8, 0b00010111): 38,
    (8, 0b00101000): 39, (8, 0b00101001): 40, (8, 0b00101010): 41,
    (8, 0b00101011): 42, (8, 0b00101100): 43, (8, 0b00101101): 44,
    (8, 0b00000100): 45, (8, 0b00000101): 46, (8, 0b00001010): 47,
    (8, 0b00001011): 48, (8, 0b01010010): 49, (8, 0b01010011): 50,
    (8, 0b01010100): 51, (8, 0b01010101): 52, (8, 0b00100100): 53,
    (8, 0b00100101): 54, (8, 0b01011000): 55, (8, 0b01011001): 56,
    (8, 0b01011010): 57, (8, 0b01011011): 58, (8, 0b01001010): 59,
    (8, 0b01001011): 60, (8, 0b00110010): 61, (8, 0b00110011): 62,
    (8, 0b00110100): 63,
    # makeup
    (5, 0b11011): 64, (5, 0b10010): 128, (6, 0b010111): 192,
    (7, 0b0110111): 256, (8, 0b00110110): 320, (8, 0b00110111): 384,
    (8, 0b01100100): 448, (8, 0b01100101): 512, (8, 0b01101000): 576,
    (8, 0b01100111): 640, (9, 0b011001100): 704, (9, 0b011001101): 768,
    (9, 0b011010010): 832, (9, 0b011010011): 896, (9, 0b011010100): 960,
    (9, 0b011010101): 1024, (9, 0b011010110): 1088, (9, 0b011010111): 1152,
    (9, 0b011011000): 1216, (9, 0b011011001): 1280, (9, 0b011011010): 1344,
    (9, 0b011011011): 1408, (9, 0b010011000): 1472, (9, 0b010011001): 1536,
    (9, 0b010011010): 1600, (6, 0b011000): 1664, (9, 0b010011011): 1728,
}

_BLACK_CODES = {
    (10, 0b0000110111): 0, (3, 0b010): 1, (2, 0b11): 2, (2, 0b10): 3,
    (3, 0b011): 4, (4, 0b0011): 5, (4, 0b0010): 6, (5, 0b00011): 7,
    (6, 0b000101): 8, (6, 0b000100): 9, (7, 0b0000100): 10,
    (7, 0b0000101): 11, (7, 0b0000111): 12, (8, 0b00000100): 13,
    (8, 0b00000111): 14, (9, 0b000011000): 15, (10, 0b0000010111): 16,
    (10, 0b0000011000): 17, (10, 0b0000001000): 18,
    (11, 0b00001100111): 19, (11, 0b00001101000): 20,
    (11, 0b00001101100): 21, (11, 0b00000110111): 22,
    (11, 0b00000101000): 23, (11, 0b00000010111): 24,
    (11, 0b00000011000): 25, (12, 0b000011001010): 26,
    (12, 0b000011001011): 27, (12, 0b000011001100): 28,
    (12, 0b000011001101): 29, (12, 0b000001101000): 30,
    (12, 0b000001101001): 31, (12, 0b000001101010): 32,
    (12, 0b000001101011): 33, (12, 0b000011010010): 34,
    (12, 0b000011010011): 35, (12, 0b000011010100): 36,
    (12, 0b000011010101): 37, (12, 0b000011010110): 38,
    (12, 0b000011010111): 39, (12, 0b000001101100): 40,
    (12, 0b000001101101): 41, (12, 0b000011011010): 42,
    (12, 0b000011011011): 43, (12, 0b000001010100): 44,
    (12, 0b000001010101): 45, (12, 0b000001010110): 46,
    (12, 0b000001010111): 47, (12, 0b000001100100): 48,
    (12, 0b000001100101): 49, (12, 0b000001010010): 50,
    (12, 0b000001010011): 51, (12, 0b000000100100): 52,
    (12, 0b000000110111): 53, (12, 0b000000111000): 54,
    (12, 0b000000100111): 55, (12, 0b000000101000): 56,
    (12, 0b000001011000): 57, (12, 0b000001011001): 58,
    (12, 0b000000101011): 59, (12, 0b000000101100): 60,
    (12, 0b000001011010): 61, (12, 0b000001100110): 62,
    (12, 0b000001100111): 63,
    # makeup
    (10, 0b0000001111): 64, (12, 0b000011001000): 128,
    (12, 0b000011001001): 192, (12, 0b000001011011): 256,
    (12, 0b000000110011): 320, (12, 0b000000110100): 384,
    (12, 0b000000110101): 448, (13, 0b0000001101100): 512,
    (13, 0b0000001101101): 576, (13, 0b0000001001010): 640,
    (13, 0b0000001001011): 704, (13, 0b0000001001100): 768,
    (13, 0b0000001001101): 832, (13, 0b0000001110010): 896,
    (13, 0b0000001110011): 960, (13, 0b0000001110100): 1024,
    (13, 0b0000001110101): 1088, (13, 0b0000001110110): 1152,
    (13, 0b0000001110111): 1216, (13, 0b0000001010010): 1280,
    (13, 0b0000001010011): 1344, (13, 0b0000001010100): 1408,
    (13, 0b0000001010101): 1472, (13, 0b0000001011010): 1536,
    (13, 0b0000001011011): 1600, (13, 0b0000001100100): 1664,
    (13, 0b0000001100101): 1728,
}

# extended makeups (T.4 §2.2.3 table 3), shared by both colours
_EXT_MAKEUP = {
    (11, 0b00000001000): 1792, (11, 0b00000001100): 1856,
    (11, 0b00000001101): 1920, (12, 0b000000010010): 1984,
    (12, 0b000000010011): 2048, (12, 0b000000010100): 2112,
    (12, 0b000000010101): 2176, (12, 0b000000010110): 2240,
    (12, 0b000000010111): 2304, (12, 0b000000011100): 2368,
    (12, 0b000000011101): 2432, (12, 0b000000011110): 2496,
    (12, 0b000000011111): 2560,
}
_WHITE_CODES.update(_EXT_MAKEUP)
_BLACK_CODES.update(_EXT_MAKEUP)

_MAX_CODE_LEN = 14


class _Bits:
    """MSB-first bit reader."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise OcrError("g4: bit underrun")
        b = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def exhausted(self) -> bool:
        return self.pos >= 8 * len(self.data)


def _read_run(bits: _Bits, table) -> int:
    """One complete run length: zero or more makeup codes (>= 64), then a
    terminating code (< 64)."""
    total = 0
    while True:
        code = 0
        length = 0
        while length < _MAX_CODE_LEN:
            code = (code << 1) | bits.bit()
            length += 1
            run = table.get((length, code))
            if run is not None:
                break
        else:
            raise OcrError("g4: invalid run-length code")
        total += run
        if run < 64:
            return total


def _decode_2d_row(bits: _Bits, ref: list[int], w: int) -> list[int]:
    """One 2-D coded row (T.6, also T.4 2-D) against the reference line's
    changing elements.  Returns the row's transition positions."""
    cur: list[int] = []
    a0 = -1
    color = 0  # white

    def b1b2() -> tuple[int, int]:
        i = bisect_right(ref, a0)
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else w
        b2 = ref[i + 1] if i + 1 < len(ref) else w
        return b1, b2

    while (a0 if a0 > 0 else 0) < w:
        b1, b2 = b1b2()
        # mode decode
        if bits.bit():  # 1 -> V0
            a1 = b1
            mode = "v"
        elif bits.bit():  # 01x
            a1 = b1 + 1 if bits.bit() else b1 - 1  # 011 VR1 / 010 VL1
            mode = "v"
        elif bits.bit():  # 001 -> horizontal
            mode = "h"
        elif bits.bit():  # 0001 -> pass
            mode = "p"
        elif bits.bit():  # 00001x
            a1 = b1 + 2 if bits.bit() else b1 - 2  # VR2 / VL2
            mode = "v"
        elif bits.bit():  # 000001x
            a1 = b1 + 3 if bits.bit() else b1 - 3  # VR3 / VL3
            mode = "v"
        elif bits.bit():  # 0000001 -> 2-D extension (T.4 §4.2.1.3 e)
            ext = (bits.bit() << 2) | (bits.bit() << 1) | bits.bit()
            if ext != 0b111:
                raise OcrError(f"ccitt: unsupported 2-D extension {ext:03b}")
            # uncompressed mode (T.4 §4.2.1.4 / T.6 §2.2.8): literal
            # pixels coded as zero-runs+black ('0'*n+'1', n<=4; 000001 =
            # five whites alone), terminated by an exit code 0^m 0000001 T
            # (m<=4 embedded whites; T = colour of the following run)
            pos = a0 if a0 > 0 else 0
            while True:
                z = 0
                while not bits.bit():
                    z += 1
                    if z > 10:
                        raise OcrError("ccitt: bad uncompressed code")
                px = ([0] * z + [1] if z <= 4 else
                      [0] * 5 if z == 5 else [0] * (z - 6))
                for p in px:
                    if pos >= w:
                        raise OcrError("ccitt: uncompressed past row end")
                    if p != color:
                        cur.append(pos)
                        color ^= 1
                    pos += 1
                if z >= 6:
                    t = bits.bit()
                    if t != color:
                        if pos < w:
                            cur.append(pos)
                        color = t
                    break
            a0 = pos
            continue
        else:  # 00000000... -> EOL territory mid-row = corrupt
            raise OcrError("ccitt: premature EOL/EOFB")
        if mode == "p":
            a0 = b2
            continue
        if mode == "h":
            start = a0 if a0 > 0 else 0
            r1 = _read_run(bits, _BLACK_CODES if color else _WHITE_CODES)
            r2 = _read_run(bits, _WHITE_CODES if color else _BLACK_CODES)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > w or a1 > w:
                raise OcrError("ccitt: run past row end")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
            continue
        # vertical
        if a1 < 0 or a1 > w:
            raise OcrError("ccitt: vertical move past row bounds")
        cur.append(a1)
        a0 = a1
        color ^= 1
    return cur


def _decode_1d_row(bits: _Bits, w: int) -> list[int]:
    """One 1-D modified-Huffman row (T.4): alternating white/black runs
    starting with white (a zero-length white run leads a black edge).
    Each color flip below the row width is a transition."""
    cur: list[int] = []
    total = 0
    color = 0
    while total < w:
        run = _read_run(bits, _BLACK_CODES if color else _WHITE_CODES)
        total += run
        if total > w:
            raise OcrError("ccitt: run past row end")
        if total < w:
            cur.append(total)
        color ^= 1
    return cur


def _render_row(cur: list[int], w: int) -> bytearray:
    """Transitions (alternating white->black from white) -> 8-bit row."""
    row = bytearray(b"\xff" * w)
    for i in range(0, len(cur) - 1, 2):
        s, e = cur[i], cur[i + 1]
        row[s:e] = b"\x00" * (e - s)
    if len(cur) % 2 == 1:  # trailing black run to row end
        row[cur[-1]:] = b"\x00" * (w - cur[-1])
    return row


def g4_decode(data: bytes, w: int, h: int) -> bytearray:
    """T.6 decode to an 8-bit BlackIsZero raster (ink 0, background 255).
    TIFF G4 strips carry no EOL codes; EOFB (two EOLs) may terminate the
    data and trailing fill bits are ignored."""
    if w <= 0 or h <= 0:
        raise OcrError("g4: bad dimensions")
    bits = _Bits(data)
    out = bytearray()
    ref: list[int] = []  # previous row's transitions (imaginary all-white)
    for _row in range(h):
        cur = _decode_2d_row(bits, ref, w)
        out += _render_row(cur, w)
        ref = cur
    return out


def _consume_eol(bits: _Bits, optional: bool = False) -> bool:
    """Consume fill zeros + the 000000000001 EOL.  T.4 rows are framed by
    EOLs with optional zero fill before them; returns False when
    *optional* and the next bits are not an EOL (nothing consumed --
    only valid at a position where data may start directly)."""
    if optional:
        # peek 12 bits without consuming
        save = bits.pos
        try:
            zeros = 0
            while not bits.bit():
                zeros += 1
                if zeros > 64:
                    break
            ok = zeros >= 11
        except OcrError:
            ok = False
        if not ok:
            bits.pos = save
            return False
        return True
    zeros = 0
    while not bits.bit():
        zeros += 1
        if zeros > 4096:
            raise OcrError("g3: runaway fill")
    if zeros < 11:
        raise OcrError("g3: expected EOL")
    return True


def mh_decode(data: bytes, w: int, h: int) -> bytearray:
    """CCITT RLE (TIFF Compression 2): modified-Huffman 1-D rows with NO
    EOL framing; per TIFF 6.0 each row begins on a byte boundary."""
    if w <= 0 or h <= 0:
        raise OcrError("mh: bad dimensions")
    bits = _Bits(data)
    out = bytearray()
    for _row in range(h):
        cur = _decode_1d_row(bits, w)
        out += _render_row(cur, w)
        bits.pos = (bits.pos + 7) & ~7  # next row is byte-aligned
    return out


def g3_decode(data: bytes, w: int, h: int, two_d: bool = False,
              eol: bool = True, byte_align: bool = False) -> bytearray:
    """CCITT Group 3 (T.4) decode: 1-D modified-Huffman or (``two_d``,
    T4Options bit 0 / PDF K>0) mixed 1-D/2-D where a tag bit picks the
    coding of each row.  Decodes exactly *h* rows; the RTC trailer, if
    present, is simply not read.

    Framing variants (PDF /CCITTFaxDecode DecodeParms):

    - ``eol=True`` — T.4/TIFF convention AND PDF ``/EndOfLine true``:
      every row preceded by fill + the 000000000001 EOL (leading EOL
      optional); in 2-D mode the tag bit follows each EOL.
    - ``eol=False`` — PDF's DEFAULT (``/EndOfLine false``): rows packed
      back-to-back with no EOL codes; in 2-D mode each row begins
      directly with its tag bit.
    - ``byte_align=True`` (PDF ``/EncodedByteAlign``, eol=False form) —
      each row's coded data begins on a byte boundary, the same layout
      as TIFF Compression-2 RLE (``mh_decode``)."""
    if w <= 0 or h <= 0:
        raise OcrError("g3: bad dimensions")
    bits = _Bits(data)
    out = bytearray()
    ref: list[int] = []
    if eol:
        _consume_eol(bits, optional=True)  # leading EOL customary, optional
    for row_i in range(h):
        if eol:
            if row_i:
                _consume_eol(bits)
        elif byte_align and row_i:
            bits.pos = (bits.pos + 7) & ~7  # rows begin byte-aligned
        if two_d:
            one_d = bits.bit()  # tag bit: 1 = this row is 1-D
            cur = (_decode_1d_row(bits, w) if one_d
                   else _decode_2d_row(bits, ref, w))
        else:
            cur = _decode_1d_row(bits, w)
        out += _render_row(cur, w)
        ref = cur
    return out
