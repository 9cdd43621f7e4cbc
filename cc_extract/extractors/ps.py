"""X15 — PostScript text extraction (closes SURVEY.md §2.3 X15, which §7
originally declared out of scope).

Reference analogue: the ``.ps`` branch ran ghostscript ``ps2ascii``
[R: functions/simple/main.py ⚠, low confidence].  Ours extracts the text
a ps2ascii pass would see for straight-line text PostScript: literal
strings consumed by the text-painting operators ``show``, ``ashow``,
``widthshow``, ``awidthshow`` (the string is the last operand pushed
before the operator), with ``moveto`` / ``LF-in-procedures`` treated as
line boundaries.  PostScript literal strings share PDF's escape grammar
(``\\( \\) \\\\ \\n \\t \\ooo``, nesting) so the PDF parser's string
reader is reused verbatim (pdf.py:_parse_literal_string).

This is deliberately the same closed-loop subset trick as the PDF
writer/parser pair (SURVEY.md §5.2): corpusgen emits exactly this shape,
arbitrary real-world PostScript (procedures redefining show, Type 3
fonts, binary sections) falls out to ``status='error'`` per §2.7.
"""

from __future__ import annotations

import re

from .normalize import normalize_text
from .pdf import _PdfError, _parse_literal_string

_SHOW_OPS = (b"show", b"ashow", b"widthshow", b"awidthshow")
_TOKEN = re.compile(rb"\(|%[^\r\n]*|\b(?:a?(?:width)?show|moveto)\b")


def extract_ps(payload: bytes) -> str:
    """bytes -> text of the show-operator strings, moveto = newline."""
    if not payload.startswith(b"%!"):
        raise _PdfError("not PostScript (missing %! header)")
    out: list[str] = []
    pending: str | None = None  # last literal string awaiting its operator
    pos, n = 0, len(payload)
    while pos < n:
        m = _TOKEN.search(payload, pos)
        if not m:
            break
        tok = m.group(0)
        if tok == b"(":
            # unterminated/malformed string: propagate so the dispatcher
            # quarantines the doc as status='error' (module docstring
            # contract) instead of silently returning truncated text
            pending, pos = _parse_literal_string(payload, m.start())
            continue
        pos = m.end()
        if tok.startswith(b"%"):  # comment to end of line
            continue
        if tok == b"moveto":
            if out and out[-1] != "\n":
                out.append("\n")
            continue
        # a show-family operator paints the pending string
        if pending is not None:
            out.append(pending)
            pending = None
    return normalize_text("".join(out))
