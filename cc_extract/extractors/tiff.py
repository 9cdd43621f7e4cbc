"""Baseline TIFF grayscale decoder for the OCR-lite route (X14).

Reference analogue: Tesseract accepts TIFF scans via libtiff
[R: functions/ocr/main.py ⚠].  This is a from-scratch reader for the
subset a grayscale page scan needs — TIFF 6.0 baseline, both byte
orders, first IFD only, 8-bit single-sample, Compression 1 (none) or
32773 (PackBits RLE), PhotometricInterpretation 0/1 (WhiteIsZero
inverted to BlackIsZero), strip-organized.  Everything else (LZW/CCITT,
tiles, RGB, multi-page) raises, which the dispatcher turns into the
honest ``needs_ocr`` quarantine.  The corpus writer (corpusgen._tiff_gray) is an
independent implementation of the same spec.
"""

from __future__ import annotations

import struct

from .ocr import OcrError

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

# tag ids
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _ROWS_PER_STRIP, _STRIP_CNT, _SAMPLES = 273, 278, 279, 277

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_values(data: bytes, e: str, typ: int, count: int, val_field: bytes):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise OcrError(f"tiff: unsupported field type {typ}")
    total = size * count
    if total <= 4:
        raw = val_field[:total]
    else:
        (off,) = struct.unpack(e + "I", val_field)
        raw = data[off : off + total]
        if len(raw) < total:
            raise OcrError("tiff: value offset out of bounds")
    if typ == 3:
        return list(struct.unpack(e + "H" * count, raw))
    if typ == 4:
        return list(struct.unpack(e + "I" * count, raw))
    if typ == 1:
        return list(raw)
    raise OcrError(f"tiff: unexpected type {typ} for a scalar tag")


def _unpackbits(data: bytes) -> bytes:
    """PackBits RLE (TIFF 6.0 §9 / Apple PackBits): n in [0,127] copies
    n+1 literals; n in [-127,-1] repeats the next byte 1-n times; -128 is
    a no-op."""
    out = bytearray()
    i = 0
    nd = len(data)
    while i < nd:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= nd:
                raise OcrError("tiff: truncated PackBits repeat")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def decode_tiff_gray(payload: bytes) -> tuple[int, int, bytearray]:
    """Minimal TIFF decode: 8-bit grayscale, uncompressed, stripped.
    Returns (width, height, raster) row-major, BlackIsZero."""
    if payload[:4] not in TIFF_MAGICS:
        raise OcrError("not a TIFF")
    e = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise OcrError("tiff: truncated IFD offset")
    (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    pos = ifd_off + 2
    for _ in range(n_entries):
        if pos + 12 > len(payload):
            raise OcrError("tiff: truncated IFD")
        tag, typ, count = struct.unpack_from(e + "HHI", payload, pos)
        if tag in (_W, _H, _BITS, _COMP, _PHOTO, _STRIP_OFF,
                   _ROWS_PER_STRIP, _STRIP_CNT, _SAMPLES):
            tags[tag] = _read_values(payload, e, typ, count, payload[pos + 8 : pos + 12])
        pos += 12

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise OcrError(f"tiff: missing tag {tag}")
            return default
        return v[0]

    w, h = one(_W), one(_H)
    if not (0 < w < 1 << 20 and 0 < h < 1 << 20):
        raise OcrError("tiff: absurd dimensions")
    comp = one(_COMP, 1)
    if comp not in (1, 32773):
        raise OcrError(
            "tiff: only uncompressed (1) and PackBits (32773) supported"
        )
    if one(_BITS, 8) != 8 or one(_SAMPLES, 1) != 1:
        raise OcrError("tiff: only 8-bit single-sample grayscale supported")
    photo = one(_PHOTO, 1)
    if photo not in (0, 1):
        raise OcrError("tiff: only grayscale photometric supported")
    offs = tags.get(_STRIP_OFF)
    cnts = tags.get(_STRIP_CNT)
    if not offs or not cnts or len(offs) != len(cnts):
        raise OcrError("tiff: missing/mismatched strip tables")
    raster = bytearray()
    for off, cnt in zip(offs, cnts):
        chunk = payload[off : off + cnt]
        if len(chunk) < cnt:
            raise OcrError("tiff: truncated strip")
        raster += _unpackbits(chunk) if comp == 32773 else chunk
    if len(raster) < w * h:
        raise OcrError("tiff: short pixel data")
    raster = raster[: w * h]
    if photo == 0:  # WhiteIsZero -> invert to BlackIsZero
        raster = bytearray(255 - b for b in raster)
    return w, h, raster
