"""X7 — RTF extraction (SURVEY.md §2.4.5, normative).

Reference analogue: the rtf branch of the simple Lambda — bundled ``UnRTF``
CLI binary [R: functions/simple/main.py ⚠; bin-linux_x64/unrtf ⚠].

Ours is a hand-written tokenizer over the RTF 1.9 spec subset:
- skip destination groups entirely: ``\\fonttbl \\colortbl \\stylesheet
  \\info \\pict \\*`` (and other non-text destinations below);
- ``\\par \\line`` -> newline, ``\\tab`` -> TAB, ``\\emdash`` etc. mapped;
- ``\\'hh`` hex escapes decoded via cp1252 (the \\ansicpg default here);
- ``\\uN`` unicode with ``\\ucN`` skip-count honored (skips N fallback
  chars after each \\u);
- all other control words ignored; group nesting tracked with a stack so
  ``\\ucN`` scoping is correct.
"""

from __future__ import annotations

import re

from .normalize import normalize_text

_CTRL = re.compile(
    rb"\\([a-zA-Z]{1,32})(-?\d{1,10})? ?"   # control word w/ optional param
    rb"|\\'([0-9a-fA-F]{2})"                 # hex escape
    rb"|\\([^a-zA-Z])"                       # control symbol
    rb"|([{}])"                              # group delimiters
)

_SKIP_DESTINATIONS = frozenset(
    "fonttbl colortbl stylesheet info pict object header footer footerf "
    "headerf footnote generator operator title subject author keywords "
    "doccomm themedata colorschememapping latentstyles datastore "
    "listtable listoverridetable rsidtbl xmlnstbl".split()
)

_SPECIAL = {
    "par": "\n", "line": "\n", "tab": "\t", "sect": "\n", "page": "\n",
    "emdash": "\u2014", "endash": "\u2013", "bullet": "\u2022",
    "lquote": "\u2018", "rquote": "\u2019",
    "ldblquote": "\u201c", "rdblquote": "\u201d",
    "emspace": " ", "enspace": " ", "qmspace": " ", "~": "\u00a0",
}


def extract_rtf(payload: bytes) -> str:
    if not payload.startswith(b"{\\rtf"):
        raise ValueError("not RTF (missing {\\rtf header)")
    out: list[str] = []
    # each stack frame: [skipping_dest, uc_skip_count]
    stack: list[list] = []
    skipping = False
    uc = 1
    pending_uc_skip = 0
    pos, n = 0, len(payload)
    while pos < n:
        m = _CTRL.search(payload, pos)
        if not m:
            text = payload[pos:]
            if not skipping and text:
                out.append(text.decode("cp1252", "replace"))
            break
        if m.start() > pos:
            text = payload[pos : m.start()]
            text = text.replace(b"\r", b"").replace(b"\n", b"")
            if pending_uc_skip and text:
                drop = min(pending_uc_skip, len(text))
                text = text[drop:]
                pending_uc_skip -= drop
            if not skipping and text:
                out.append(text.decode("cp1252", "replace"))
        pos = m.end()
        word, param, hexe, sym, brace = m.groups()
        if brace is not None:
            if brace == b"{":
                stack.append([skipping, uc])
            else:
                if stack:
                    skipping, uc = stack.pop()
                pending_uc_skip = 0
            continue
        if hexe is not None:
            if pending_uc_skip:
                pending_uc_skip -= 1
            elif not skipping:
                out.append(bytes([int(hexe, 16)]).decode("cp1252", "replace"))
            continue
        if sym is not None:
            s = sym.decode("latin-1")
            if s == "*":
                # \* marks an unknown destination group -> skip it
                skipping = True
            elif not skipping:
                if s in "\\{}":
                    out.append(s)
                elif s == "~":
                    out.append("\u00a0")
                elif s in ("\r", "\n"):
                    out.append("\n")
            continue
        w = word.decode("latin-1")
        if w in _SKIP_DESTINATIONS:
            skipping = True
            continue
        if w == "uc":
            uc = int(param or 1)
            continue
        if w == "u":
            code = int(param or 0)
            if code < 0:
                code += 65536
            if not skipping:
                out.append(chr(code))
            pending_uc_skip = uc
            continue
        if not skipping and w in _SPECIAL:
            out.append(_SPECIAL[w])
        # all other control words ignored
    return normalize_text("".join(out))
