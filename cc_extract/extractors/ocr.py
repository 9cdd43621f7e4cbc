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
    """PNG -> 8-bit luma raster.  Round 4: delegates to the full decoder
    in extractors/png.py (all five color types, depths 1-16, every
    scanline filter, Adam7 interlace) — this wrapper only converts the
    codec error into the OCR-quarantine error the dispatcher keys on.
    The name is kept for the multimodal/image-stats callers."""
    from .png import PngError, decode_png

    try:
        return decode_png(payload)
    except PngError as e:
        raise OcrError(str(e)) from e


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
    if payload[:2] == b"BM":
        from .bmp import BmpError, decode_bmp

        try:
            w, h, raster = decode_bmp(payload)
        except BmpError as e:
            raise OcrError(str(e)) from e
        return normalize_text(ocr_raster(w, h, raster))
    raise OcrError(
        "no decoder for this image container "
        "(OCR-lite reads PNG/JPEG/TIFF/GIF/BMP)"
    )


def ocr_pdf_rasters(payload: bytes, passwords=None) -> str:
    """Scanned-style PDF -> recognized text from its page-image XObjects
    (FlateDecode 8-bit DeviceGray), pages joined with a blank line.
    Returns '' when the PDF carries no recognizable rasters."""
    from .pdf import pdf_scan_rasters

    texts = []
    for w, h, raster in pdf_scan_rasters(payload, passwords):
        t = ocr_raster(w, h, raster)
        if t.strip():
            texts.append(t)
    return normalize_text("\n\n".join(texts))
