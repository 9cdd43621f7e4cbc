"""X17 — shared whitespace/Unicode normalization (SURVEY.md §2.4.6).

Applied as the final step of every extractor.  The spec is pinned exactly
because the per-url byte-identity invariant [D: BASELINE.json north_rule]
depends on it:

1. CRLF / CR -> LF
2. strip trailing spaces/tabs per line
3. collapse >=3 consecutive LFs to 2
4. NFC unicode normalization
5. strip leading/trailing whitespace of the whole document

Reference analogue: the post-extraction whitespace cleanup the Lambda
functions applied before uploading text [R: functions/simple/main.py ⚠ —
see SURVEY.md §0.1 for citation semantics].
"""

from __future__ import annotations

import re
import unicodedata

_MULTI_LF = re.compile(r"\n{3,}")
_TRAIL_WS = re.compile(r"[ \t]+\n")


def normalize_text(s: str) -> str:
    if not s:
        return ""
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = _TRAIL_WS.sub("\n", s)
    s = _MULTI_LF.sub("\n\n", s)
    s = unicodedata.normalize("NFC", s)
    return s.strip()
