"""X14 — executed OCR-lite (SURVEY.md §2.4.3 upgraded from "modeled").

Reference analogue: the ``ocr`` Lambda — ghostscript rasterizes pages,
Tesseract recognizes each raster [R: functions/ocr/main.py ⚠].  Here the
raster arrives two ways, exactly like real scanned inputs do:

- a standalone image document: a real PNG (8-bit grayscale), parsed by the
  minimal from-scratch PNG reader below (chunk walk, IDAT inflate, filter
  reconstruction for types 0/1/2);
- a scanned-style PDF: an empty text layer whose pages carry the page
  raster as a ``/Subtype /Image`` FlateDecode grayscale XObject — the
  shape a real scanner-produced PDF has; we pull the raster instead of
  re-rasterizing.

Recognition is exact glyph matching against the shared 5x7 font
(cc_extract.glyphs) — an OCR model "trained" on the one font the corpus
renders, honest about every other container/encoding by raising (the
dispatcher routes those to the needs_ocr quarantine, the reference's
behavior for OCR failures).
"""

from __future__ import annotations

import struct
import zlib

from ..glyphs import ocr_raster
from .normalize import normalize_text

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class OcrError(ValueError):
    pass


# ------------------------------------------------------------- PNG reader

def decode_png_gray(payload: bytes) -> tuple[int, int, bytearray]:
    """Minimal PNG decode: 8-bit grayscale, non-interlaced, filter types
    0 (None) / 1 (Sub) / 2 (Up).  Returns (width, height, raster)."""
    if not payload.startswith(PNG_MAGIC):
        raise OcrError("not a PNG")
    pos = len(PNG_MAGIC)
    w = h = -1
    idat = bytearray()
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise OcrError("truncated chunk")
        if ctype == b"IHDR":
            if length != 13:
                raise OcrError("bad IHDR")
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 0:
                raise OcrError(f"unsupported PNG (depth={depth} color={color})")
            if comp != 0 or filt != 0 or interlace != 0:
                raise OcrError("unsupported PNG encoding")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if w <= 0 or h <= 0 or not idat:
        raise OcrError("missing IHDR/IDAT")
    if w * h > 1 << 26:
        raise OcrError("png: raster too large")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise OcrError(f"bad IDAT: {e}") from e
    stride = w + 1
    if len(raw) < stride * h:
        raise OcrError("short pixel data")
    raster = bytearray(w * h)
    prev_row_start = None
    for y in range(h):
        rs = y * stride
        ftype = raw[rs]
        row = bytearray(raw[rs + 1 : rs + 1 + w])
        if ftype == 1:  # Sub
            for x in range(1, w):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            if prev_row_start is not None:
                for x in range(w):
                    row[x] = (row[x] + raster[prev_row_start + x]) & 0xFF
        elif ftype != 0:
            raise OcrError(f"unsupported PNG filter {ftype}")
        raster[y * w : (y + 1) * w] = row
        prev_row_start = y * w
    return w, h, raster


# ----------------------------------------------------------------- public

def extract_image_ocr(payload: bytes) -> str:
    """Image document -> recognized text.  Raises OcrError for containers
    OCR-lite cannot decode (CCITT/tiled TIFF, arithmetic JPEG, corrupt
    payloads) — the dispatcher turns that into the needs_ocr quarantine
    row.  Decoders: the PNG reader below; baseline AND progressive JFIF
    (gray + YCbCr, restart markers) via the from-scratch T.81 decoder
    (extractors/jpeg.py); multi-page TIFF (extractors/tiff.py); GIF
    (extractors/gif.py)."""
    if payload.startswith(PNG_MAGIC):
        w, h, raster = decode_png_gray(payload)
        return normalize_text(ocr_raster(w, h, raster))
    if payload.startswith(b"\xff\xd8"):
        from .jpeg import decode_jpeg_gray  # function-level: jpeg imports OcrError

        w, h, raster = decode_jpeg_gray(payload)
        return normalize_text(ocr_raster(w, h, raster))
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import decode_tiff_pages

        texts = [ocr_raster(w, h, raster)
                 for w, h, raster in decode_tiff_pages(payload)]
        return normalize_text("\n\n".join(t for t in texts if t.strip()))
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif_gray

        w, h, raster = decode_gif_gray(payload)
        return normalize_text(ocr_raster(w, h, raster))
    raise OcrError(
        "no decoder for this image container (OCR-lite reads PNG/JPEG/TIFF/GIF)"
    )


def ocr_pdf_rasters(payload: bytes) -> str:
    """Scanned-style PDF -> recognized text from its page-image XObjects
    (FlateDecode 8-bit DeviceGray), pages joined with a blank line.
    Returns '' when the PDF carries no recognizable rasters."""
    from .pdf import pdf_scan_rasters

    texts = []
    for w, h, raster in pdf_scan_rasters(payload):
        t = ocr_raster(w, h, raster)
        if t.strip():
            texts.append(t)
    return normalize_text("\n\n".join(texts))
