"""PNG decoder (ISO/IEC 15948 / W3C PNG spec) — from scratch, no image
libraries — producing an 8-bit luma raster for the OCR-lite route.

Coverage (vs the previous 8-bit-gray-only reader in ocr.py):
- color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA)
- tRNS transparency (per-palette-entry alpha; the exact-match
  transparent color for gray/RGB), composited over white like the
  alpha channels
- bit depths 1/2/4/8/16 where the spec allows them per type
- all five scanline filters (None/Sub/Up/Average/Paeth, spec §9)
- Adam7 interlace (spec §8.2): each of the 7 passes is an independently
  filtered sub-image scattered into the full raster
- alpha composited over white (a page scan's background), 16-bit samples
  take the high byte (the spec's own 8-bit reduction)

Luma uses integer coefficients summing to 256 ((77R + 150G + 29B) >> 8)
so a gray pixel encoded as R=G=B=g decodes back to exactly g — byte-exact
round trips for the synthetic scanned pages, deterministic (not
float-rounding-dependent) output for real color images.

A pixel-count cap (2^26) bounds memory against header-declared bombs,
matching the other image decoders.

Reference parity note: lambda-text-extractor routes images to an OCR
Lambda [R: functions/ocr ⚠]; the decode step itself is ours.
"""

from __future__ import annotations

import struct
import zlib

MAGIC = b"\x89PNG\r\n\x1a\n"
MAX_PIXELS = 1 << 26


class PngError(ValueError):
    pass


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

# Adam7 pass layout: (x_offset, y_offset, x_step, y_step), spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa = p - a if p >= a else a - p
    pb = p - b if p >= b else b - p
    pc = p - c if p >= c else c - p
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, off: int, w: int, h: int, bits_pp: int) -> bytearray:
    """Reverse the per-scanline filters for a (sub)image of w×h pixels
    starting at *off* in the decompressed stream; returns h×stride bytes
    (filter bytes stripped).  *bits_pp* = depth × channels."""
    stride = (w * bits_pp + 7) >> 3
    fstep = max(1, bits_pp >> 3)  # filter unit: one byte below 8 bpp
    need = (stride + 1) * h
    if len(raw) - off < need:
        raise PngError("short pixel data")
    out = bytearray(stride * h)
    for y in range(h):
        rs = off + y * (stride + 1)
        ftype = raw[rs]
        row = bytearray(raw[rs + 1 : rs + 1 + stride])
        os_ = y * stride
        ps = os_ - stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(fstep, stride):
                row[x] = (row[x] + row[x - fstep]) & 0xFF
        elif ftype == 2:  # Up
            if y:
                for x in range(stride):
                    row[x] = (row[x] + out[ps + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = row[x - fstep] if x >= fstep else 0
                up = out[ps + x] if y else 0
                row[x] = (row[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = row[x - fstep] if x >= fstep else 0
                up = out[ps + x] if y else 0
                ul = out[ps + x - fstep] if (y and x >= fstep) else 0
                row[x] = (row[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise PngError(f"bad filter type {ftype}")
        out[os_ : os_ + stride] = row
    return out


def _expand_row(data: bytearray, row: int, w: int, depth: int) -> list[int]:
    """One scanline's first-channel-stream samples at sub-byte depths,
    MSB-first (spec §7.2); used for gray<8 and palette indices."""
    stride = (w * depth + 7) >> 3
    base = row * stride
    out = []
    if depth == 4:
        for i in range(stride):
            b = data[base + i]
            out.append(b >> 4)
            out.append(b & 0x0F)
    elif depth == 2:
        for i in range(stride):
            b = data[base + i]
            out.extend(((b >> 6) & 3, (b >> 4) & 3, (b >> 2) & 3, b & 3))
    elif depth == 1:
        for i in range(stride):
            b = data[base + i]
            out.extend((b >> (7 - k)) & 1 for k in range(8))
    else:
        raise PngError(f"bad sub-byte depth {depth}")
    return out[:w]


def _luma(r: int, g: int, b: int) -> int:
    return (77 * r + 150 * g + 29 * b) >> 8


def _over_white(v: int, a: int) -> int:
    return (v * a + 255 * (255 - a) + 127) // 255


def _paint(luma: bytearray, W: int, unf: bytearray, w: int, h: int,
           depth: int, color: int, palette, coords, trns=None) -> None:
    """Convert one (sub)image's unfiltered bytes to luma and scatter at
    *coords* (an iterator of (x, y) raster positions, row-major)."""
    ch = _CHANNELS[color]
    if depth < 8:  # gray (type 0) or palette (type 3)
        scale = 255 // ((1 << depth) - 1) if color == 0 else 1
        it = iter(coords)
        for y in range(h):
            samples = _expand_row(unf, y, w, depth)
            for x in range(w):
                v = samples[x]
                px, py = next(it)
                if color == 3:
                    try:
                        r, g, b = palette[v]
                    except (IndexError, TypeError):
                        raise PngError("palette index out of range")
                    val = _luma(r, g, b)
                    if trns is not None and v < len(trns):
                        val = _over_white(val, trns[v])
                    luma[py * W + px] = val
                else:
                    if trns is not None and v == trns:
                        luma[py * W + px] = 255  # transparent -> white
                    else:
                        luma[py * W + px] = v * scale
        return
    step = depth >> 3  # bytes per sample (1 or 2); high byte reduces 16->8
    stride = w * ch * step
    it = iter(coords)
    for y in range(h):
        base = y * stride
        for x in range(w):
            o = base + x * ch * step
            px, py = next(it)
            if color == 0:
                v = unf[o]
                luma[py * W + px] = 255 if (
                    trns is not None and v == trns) else v
            elif color == 2:
                r, g, b = unf[o], unf[o + step], unf[o + 2 * step]
                luma[py * W + px] = 255 if (
                    trns is not None and (r, g, b) == trns
                ) else _luma(r, g, b)
            elif color == 3:
                idx = unf[o]
                try:
                    r, g, b = palette[idx]
                except (IndexError, TypeError):
                    raise PngError("palette index out of range")
                v = _luma(r, g, b)
                if trns is not None and idx < len(trns):
                    v = _over_white(v, trns[idx])
                luma[py * W + px] = v
            elif color == 4:
                luma[py * W + px] = _over_white(unf[o], unf[o + step])
            else:  # 6
                v = _luma(unf[o], unf[o + step], unf[o + 2 * step])
                luma[py * W + px] = _over_white(v, unf[o + 3 * step])


def decode_png(payload: bytes) -> tuple[int, int, bytearray]:
    """Full PNG decode -> (width, height, 8-bit luma raster)."""
    if not payload.startswith(MAGIC):
        raise PngError("not a PNG")
    pos = len(MAGIC)
    n = len(payload)
    w = h = -1
    depth = color = interlace = 0
    palette = None
    trns = None
    idat = bytearray()
    seen_ihdr = False
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        if length > n - pos - 8:
            raise PngError("truncated chunk")
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            if length != 13:
                raise PngError("bad IHDR")
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if color not in _CHANNELS or depth not in _VALID_DEPTHS[color]:
                raise PngError(f"bad depth/color ({depth}/{color})")
            if comp != 0 or filt != 0 or interlace not in (0, 1):
                raise PngError("unsupported PNG encoding")
            if w <= 0 or h <= 0:
                raise PngError("bad dimensions")
            if w * h > MAX_PIXELS:
                raise PngError("png: raster too large")
            seen_ihdr = True
        elif ctype == b"PLTE":
            if length % 3:
                raise PngError("bad PLTE length")
            palette = [
                (data[i], data[i + 1], data[i + 2]) for i in range(0, length, 3)
            ]
        elif ctype == b"tRNS":
            if color == 3:
                trns = list(data)  # per-entry alpha
            elif color == 0 and length >= 2:
                # 16-bit sample value; compare against the decoded 8-bit
                # (high-byte) sample only at depth 8/16 exactness — for
                # sub-byte depths the stored value fits the low byte
                (tv,) = struct.unpack_from(">H", data, 0)
                trns = (tv >> 8) if depth == 16 else (tv & 0xFF)
            elif color == 2 and length >= 6:
                tr, tg, tb = struct.unpack_from(">HHH", data, 0)
                if depth == 16:
                    trns = (tr >> 8, tg >> 8, tb >> 8)
                else:
                    trns = (tr & 0xFF, tg & 0xFF, tb & 0xFF)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if not seen_ihdr or not idat:
        raise PngError("missing IHDR/IDAT")
    if color == 3 and not palette:
        raise PngError("palette image without PLTE")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"bad IDAT: {e}") from e

    bits_pp = depth * _CHANNELS[color]
    luma = bytearray(w * h)
    if interlace == 0:
        unf = _unfilter(raw, 0, w, h, bits_pp)
        coords = ((x, y) for y in range(h) for x in range(w))
        _paint(luma, w, unf, w, h, depth, color, palette, coords, trns)
        return w, h, luma
    # Adam7: 7 sequential sub-images in one zlib stream
    off = 0
    for (x0, y0, dx, dy) in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * bits_pp + 7) >> 3
        unf = _unfilter(raw, off, pw, ph, bits_pp)
        off += (stride + 1) * ph
        coords = (
            (x0 + x * dx, y0 + y * dy) for y in range(ph) for x in range(pw)
        )
        _paint(luma, w, unf, pw, ph, depth, color, palette, coords, trns)
    return w, h, luma
