"""Outlook ``.msg`` extraction ([MS-OXMSG]) — the fourth OLE
application next to doc/xls/ppt [R: functions/simple/main.py ⚠ —
reference tree is empty; capability reconstructed from BASELINE.json's
format-matrix brief].

A .msg file is a CFB container whose MAPI properties live in streams
named ``__substg1.0_PPPPTTTT`` — property id ``PPPP`` and type ``TTTT``
in hex: ``001F`` = PT_UNICODE (UTF-16LE), ``001E`` = PT_STRING8
(cp1252).  Harvested properties (top-level message only; recipient /
attachment storages are flattened by the CFB reader but their property
ids differ, and the generated corpus keeps them out — a documented
simplification):

- 0x0037 subject, 0x1000 body.

Output: the subject line, a blank line, then the body — the same
body-text-only convention as X13 (eml), which likewise drops transport
headers.  Flows through normalize_text (X17).
"""

from __future__ import annotations

from .doc import CfbFile, _DocError
from .normalize import normalize_text


class _MsgError(ValueError):
    pass


def _read_prop(cfb: CfbFile, prop: int) -> str | None:
    for name, codec in ((f"__substg1.0_{prop:04X}001F", "utf-16-le"),
                        (f"__substg1.0_{prop:04X}001E", "cp1252")):
        try:
            raw = cfb.read_stream(name)
        except _DocError:
            continue
        # writers that pad streams to the mini-cutoff leave NUL tails
        return raw.decode(codec, "replace").rstrip("\x00")
    return None


def extract_msg(payload: bytes) -> str:
    """bytes (OLE .msg) -> plain text (see module docstring conventions)."""
    cfb = CfbFile(payload)
    subject = _read_prop(cfb, 0x0037)
    body = _read_prop(cfb, 0x1000)
    if subject is None and body is None:
        raise _MsgError("no subject/body property streams")
    parts = [p for p in (subject, body) if p]
    return normalize_text("\n\n".join(parts))
