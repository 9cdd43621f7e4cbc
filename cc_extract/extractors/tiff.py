"""Baseline TIFF grayscale decoder for the OCR-lite route (X14).

Reference analogue: Tesseract accepts TIFF scans via libtiff
[R: functions/ocr/main.py ⚠].  This is a from-scratch reader for the
subset a page scan needs — TIFF 6.0 baseline, both byte orders,
multi-page via the IFD chain (round 4; cycle-guarded), 8-bit grayscale
/ RGB / RGBA (collapsed to BT.601 luminance, alpha ignored),
Compression 1 (none), 4 (CCITT Group 4 fax via the from-scratch T.6
codec in ccitt.py — round 4), 5 (LZW with the spec's EarlyChange and
optional per-channel horizontal Predictor 2 — the most common real
scan encoding) or 32773 (PackBits RLE),
PhotometricInterpretation 0/1/2 (WhiteIsZero inverted to BlackIsZero),
strip- or tile-organized (tags 322-325, per-tile compression, edge
padding cropped — round 4).  G3 fax (Compression 3) and other exotics
raise, which the dispatcher turns into the honest ``needs_ocr``
quarantine.  The corpus writer
(corpusgen._tiff_gray) is an independent implementation of the same
spec.
"""

from __future__ import annotations

import struct

from .ocr import OcrError

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

# tag ids
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _ROWS_PER_STRIP, _STRIP_CNT, _SAMPLES = 273, 278, 279, 277
_PREDICTOR, _T4OPTIONS = 317, 292
_TILE_W, _TILE_H, _TILE_OFF, _TILE_CNT = 322, 323, 324, 325

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


def _lzw_decode_tiff(data: bytes, max_out: int) -> bytes:
    """TIFF 6.0 §13 LZW: 8-bit strings, Clear=256, EOI=257, table grows
    from 258, codes packed MSB-first, widths 9->12 with the spec's
    "EarlyChange" — the decoder widens when next_code == 2^width - 1
    (one entry earlier than GIF's late change; TIFF blesses the
    off-by-one officially).  The encoder-side mirror in
    corpusgen._tiff_lzw_encode widens at 2^width (its table leads by
    one).  Per spec the writer must emit Clear at 4094 entries; the
    reader just honors Clear wherever it appears."""
    CLEAR, EOI = 256, 257
    out = bytearray()

    def reset():
        return {i: bytes([i]) for i in range(256)}, 9, EOI + 1

    table, width, next_code = reset()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                table, width, next_code = reset()
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise OcrError("tiff: bad initial LZW code")
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise OcrError("tiff: LZW code out of range")
            out += entry
            if len(out) > max_out:
                raise OcrError("tiff: LZW output overrun")
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) - 1 and width < 12:
                    width += 1
            prev = entry
        acc &= (1 << nbits) - 1  # keep the accumulator bounded
    return bytes(out)


def _undo_horizontal_predictor(strip: bytes, w: int, spp: int = 1) -> bytes:
    """TIFF Predictor 2 inverse: cumulative sum mod 256 along each row,
    per sample channel (vectorized: one uint8 cumsum per strip with
    natural wraparound)."""
    import numpy as np

    row_bytes = w * spp
    n_rows = (len(strip) + row_bytes - 1) // row_bytes
    if len(strip) == n_rows * row_bytes:
        a = np.frombuffer(strip, dtype=np.uint8).reshape(n_rows, w, spp)
        return np.cumsum(a, axis=1, dtype=np.uint8).tobytes()
    # ragged tail (malformed strip): per-row fallback
    out = bytearray(strip)
    for r in range(n_rows):
        base = r * row_bytes
        for i in range(base + spp, min(base + row_bytes, len(out))):
            out[i] = (out[i] + out[i - spp]) & 0xFF
    return bytes(out)


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


def _decode_ifd(payload: bytes, e: str, ifd_off: int) -> tuple[int, int, bytearray, int]:
    """Decode ONE image file directory.  Returns (width, height, raster,
    next IFD offset — 0 when this was the last page)."""
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
                   _ROWS_PER_STRIP, _STRIP_CNT, _SAMPLES, _PREDICTOR,
                   _T4OPTIONS, _TILE_W, _TILE_H, _TILE_OFF, _TILE_CNT):
            tags[tag] = _read_values(payload, e, typ, count, payload[pos + 8 : pos + 12])
        pos += 12
    if pos + 4 <= len(payload):
        (next_off,) = struct.unpack_from(e + "I", payload, pos)
    else:
        next_off = 0

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise OcrError(f"tiff: missing tag {tag}")
            return default
        return v[0]

    w, h = one(_W), one(_H)
    if not (0 < w < 1 << 20 and 0 < h < 1 << 20) or w * h > 1 << 26:
        raise OcrError("tiff: absurd dimensions")
    comp = one(_COMP, 1)
    if comp not in (1, 2, 3, 4, 5, 32773):
        raise OcrError(
            "tiff: only uncompressed (1), CCITT RLE (2), G3 (3), G4 (4), "
            "LZW (5) and PackBits (32773) supported"
        )
    spp = one(_SAMPLES, 1)
    bits = tags.get(_BITS, [8])
    photo = one(_PHOTO, 1)
    predictor = one(_PREDICTOR, 1)
    g3_2d = False
    if comp == 3:
        opts = one(_T4OPTIONS, 0)
        # bit 1 (uncompressed mode allowed) is a capability flag only:
        # the bitstream self-announces segments via the 0000001111
        # extension code, which _decode_2d_row handles (round 5)
        g3_2d = bool(opts & 1)
    if comp in (2, 3, 4):
        # fax page: 1-bit MinIsWhite bilevel per the CCITT convention
        if spp != 1 or bits != [1] or photo != 0 or predictor != 1:
            raise OcrError("tiff: fax must be 1-bit single-sample MinIsWhite")
    else:
        if spp not in (1, 3, 4) or any(b != 8 for b in bits):
            raise OcrError("tiff: only 8-bit gray/RGB/RGBA supported")
        if photo not in (0, 1, 2) or (photo == 2) != (spp in (3, 4)):
            raise OcrError("tiff: unsupported photometric/samples combination")
        if predictor not in (1, 2):
            raise OcrError("tiff: only predictor 1/2 supported")
    pxw = 1 if comp in (2, 3, 4) else spp  # bytes per pixel after codec decode
    if _TILE_W in tags:
        # tiled layout (round 4): independently compressed tw x tl tiles
        # in row-major tile order, edge tiles padded to full size
        tw_, tl_ = one(_TILE_W), one(_TILE_H)
        if tw_ <= 0 or tl_ <= 0 or tw_ % 16 or tl_ % 16:
            raise OcrError("tiff: bad tile geometry")
        offs = tags.get(_TILE_OFF)
        cnts = tags.get(_TILE_CNT)
        if not offs or not cnts or len(offs) != len(cnts):
            raise OcrError("tiff: missing/mismatched tile tables")
        tiles_x = (w + tw_ - 1) // tw_
        tiles_y = (h + tl_ - 1) // tl_
        if len(offs) < tiles_x * tiles_y:
            raise OcrError("tiff: short tile table")
        raster = bytearray(w * h * pxw)
        rowbytes = w * pxw
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                idx = ty * tiles_x + tx
                chunk = payload[offs[idx] : offs[idx] + cnts[idx]]
                if len(chunk) < cnts[idx]:
                    raise OcrError("tiff: truncated tile")
                if comp == 4:
                    from .ccitt import g4_decode

                    tile = bytes(g4_decode(chunk, tw_, tl_))
                elif comp == 3:
                    from .ccitt import g3_decode

                    tile = bytes(g3_decode(chunk, tw_, tl_, two_d=g3_2d))
                elif comp == 2:
                    from .ccitt import mh_decode

                    tile = bytes(mh_decode(chunk, tw_, tl_))
                elif comp == 5:
                    tile = _lzw_decode_tiff(chunk, tw_ * tl_ * spp)
                elif comp == 32773:
                    tile = _unpackbits(chunk)
                else:
                    tile = chunk
                if predictor == 2:
                    tile = _undo_horizontal_predictor(tile, tw_, spp)
                if len(tile) < tw_ * tl_ * pxw:
                    raise OcrError("tiff: short tile data")
                cw = min(tw_, w - tx * tw_) * pxw
                for r in range(min(tl_, h - ty * tl_)):
                    src = r * tw_ * pxw
                    dst = (ty * tl_ + r) * rowbytes + tx * tw_ * pxw
                    raster[dst : dst + cw] = tile[src : src + cw]
    else:
        rps = one(_ROWS_PER_STRIP, h)
        offs = tags.get(_STRIP_OFF)
        cnts = tags.get(_STRIP_CNT)
        if not offs or not cnts or len(offs) != len(cnts):
            raise OcrError("tiff: missing/mismatched strip tables")
        raster = bytearray()
        for si, (off, cnt) in enumerate(zip(offs, cnts)):
            chunk = payload[off : off + cnt]
            if len(chunk) < cnt:
                raise OcrError("tiff: truncated strip")
            n_rows = min(rps, h - si * rps)
            if comp == 4:
                # each strip is an independently coded T.6 block; the
                # decode already emits final 8-bit BlackIsZero rows
                from .ccitt import g4_decode

                strip = bytes(g4_decode(chunk, w, max(n_rows, 1)))
            elif comp == 3:
                from .ccitt import g3_decode

                strip = bytes(g3_decode(chunk, w, max(n_rows, 1), two_d=g3_2d))
            elif comp == 2:
                from .ccitt import mh_decode

                strip = bytes(mh_decode(chunk, w, max(n_rows, 1)))
            elif comp == 5:
                strip = _lzw_decode_tiff(chunk, max(n_rows, 1) * w * spp)
            elif comp == 32773:
                strip = _unpackbits(chunk)
            else:
                strip = chunk
            if predictor == 2:
                strip = _undo_horizontal_predictor(strip, w, spp)
            raster += strip
    if len(raster) < w * h * pxw:
        raise OcrError("tiff: short pixel data")
    if comp in (2, 3, 4):
        return w, h, raster[: w * h], next_off
    raster = raster[: w * h * spp]
    if spp in (3, 4):  # RGB(A) -> BT.601 luminance, alpha ignored (vectorized)
        import numpy as np

        a = np.frombuffer(bytes(raster), dtype=np.uint8).reshape(-1, spp)
        luma = (a[:, :3] @ np.array([299, 587, 114], dtype=np.int64)) // 1000
        raster = bytearray(luma.astype(np.uint8).tobytes())
    if photo == 0:  # WhiteIsZero -> invert to BlackIsZero (C-speed table)
        raster = bytearray(bytes(raster).translate(bytes(255 - i for i in range(256))))
    return w, h, raster, next_off


def decode_tiff_pages(payload: bytes, max_pages: int = 64) -> list[tuple[int, int, bytearray]]:
    """Walk the IFD chain (multi-page TIFF, round 4): decode every page,
    cycle-guarded by the visited-offset set and capped at *max_pages*
    against hostile chains.  Pages may differ in geometry — each is
    returned as its own (width, height, raster)."""
    if payload[:4] not in TIFF_MAGICS:
        raise OcrError("not a TIFF")
    e = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    pages: list[tuple[int, int, bytearray]] = []
    seen: set[int] = set()
    while ifd_off:
        if ifd_off in seen:
            raise OcrError("tiff: IFD chain cycle")
        if len(pages) >= max_pages:
            raise OcrError("tiff: too many pages")
        seen.add(ifd_off)
        w, h, raster, ifd_off = _decode_ifd(payload, e, ifd_off)
        pages.append((w, h, raster))
    if not pages:
        raise OcrError("tiff: empty IFD chain")
    return pages


def decode_tiff_gray(payload: bytes) -> tuple[int, int, bytearray]:
    """First-page-only TIFF decode (the single-raster surface).  Returns
    (width, height, raster) row-major, BlackIsZero."""
    if payload[:4] not in TIFF_MAGICS:
        raise OcrError("not a TIFF")
    e = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    if not ifd_off:
        raise OcrError("tiff: empty IFD chain")
    w, h, raster, _next = _decode_ifd(payload, e, ifd_off)
    return w, h, raster
