"""Legacy PowerPoint ``.ppt`` extraction ([MS-PPT]) — the third leg of
the legacy Office family next to doc.py (X8) and xls.py
[R: functions/simple/main.py ⚠ — reference tree is empty; capability
reconstructed from BASELINE.json's format-matrix brief].

Pure-Python reader over the [MS-CFB] container (doc.py's CfbFile): the
``PowerPoint Document`` stream is a tree of records with an 8-byte
header — ``u16 verAndInstance`` (low 4 bits recVer, 0xF = container),
``u16 recType``, ``u32 recLen`` — containers nesting child records in
their payload.  Text lives in two atom types harvested in document
order (the catppt/textract linear-scan convention; true presentation
order would need the CurrentUserAtom -> UserEditAtom -> PersistDirectory
indirection, a documented simplification — generated decks store slides
in order, as PowerPoint itself does for linear saves):

- **TextCharsAtom** (0x0FA0): UTF-16LE characters;
- **TextBytesAtom** (0x0FA8): the low bytes of UTF-16 chars whose high
  byte is zero — cp1252 in practice.

PPT text uses CR (and VT for soft wraps) as paragraph separators; both
map to newlines.  Output flows through normalize_text (X17) like every
extractor.
"""

from __future__ import annotations

import struct

from .doc import CfbFile
from .normalize import normalize_text

_TEXT_CHARS_ATOM = 0x0FA0
_TEXT_BYTES_ATOM = 0x0FA8


class _PptError(ValueError):
    pass


def _walk(data: bytes, pos: int, end: int, out: list[str],
          depth: int = 0) -> None:
    """Depth-first record walk, harvesting text atoms in document order."""
    if depth > 32:  # corrupt nesting guard
        return
    while pos + 8 <= end:
        ver_inst, rec_type, rec_len = struct.unpack_from("<HHI", data, pos)
        body = pos + 8
        body_end = body + rec_len
        if body_end > end:
            break  # truncated record: stop at this level, keep harvest
        if (ver_inst & 0x000F) == 0x000F:
            _walk(data, body, body_end, out, depth + 1)
        elif rec_type == _TEXT_CHARS_ATOM:
            out.append(data[body : body_end - (rec_len % 2)]
                       .decode("utf-16-le", "replace"))
        elif rec_type == _TEXT_BYTES_ATOM:
            out.append(data[body:body_end].decode("cp1252", "replace"))
        pos = body_end


def extract_ppt(payload: bytes) -> str:
    """bytes (OLE .ppt) -> plain text (see module docstring conventions)."""
    cfb = CfbFile(payload)
    stream = cfb.read_stream("PowerPoint Document")
    if len(stream) < 8:
        raise _PptError("PowerPoint Document stream too short")
    texts: list[str] = []
    _walk(stream, 0, len(stream), texts)
    if not texts:
        raise _PptError("no text atoms")
    # CR = paragraph mark, VT = soft line break; atoms -> one line each
    joined = "\n".join(texts)
    return normalize_text(joined.replace("\r\n", "\n").replace("\r", "\n")
                          .replace("\x0b", "\n"))
