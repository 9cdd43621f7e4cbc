"""X1 — HTML main-content extraction (SURVEY.md §2.4.1, normative).

Reference analogue: the html branch of ``lambda-text-extractor``'s simple
Lambda — BeautifulSoup/lxml DOM walk dropping script/style, emitting visible
text [R: functions/simple/main.py ⚠] — upgraded per the north rule with
boilerplate-strip heuristics (tag-blacklist pruning, link-density and
text-density block filtering) [D: BASELINE.json north_star].

Implementation: a streaming two-pass walker over stdlib ``html.parser``
events (no third-party DOM libs exist in this environment, SURVEY.md §0.3):

pass 1 — event stream → list of *blocks*, where a block is the visible text
between block-level tag boundaries, annotated with
``(text, anchor_chars, n_tags)``;
pass 2 — drop a block iff::

    link_density = anchor_chars / total_chars          > 0.5
    OR (text_density = total_chars / (1 + n_tags) < 8  AND total_chars < 40)

Kept blocks join with ``\\n``; result goes through normalize_text (X17).
No DOM is retained — O(document) streaming, which is what lets the pandas
UDF process multi-MB pages without quadratic blowup.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .charset import decode_bytes
from .normalize import normalize_text

# Subtrees rooted at these tags are dropped entirely (§2.4.1 rule 1).
BLACKLIST_TAGS = frozenset(
    "script style noscript template svg head iframe object embed form "
    "nav aside footer header button select option".split()
)

# These emit block boundaries (§2.4.1 rule 2).
BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li tr br article section pre blockquote "
    "table ul ol".split()
)

LINK_DENSITY_MAX = 0.5
TEXT_DENSITY_MIN = 8.0
SHORT_BLOCK_CHARS = 40

_WS = re.compile(r"\s+")
_META_CHARSET = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-]+)", re.IGNORECASE
)


class _BlockWalker(HTMLParser):
    """Pass 1: html.parser events -> [(block_text, anchor_chars, n_tags)]."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self._parts: list[str] = []
        self._anchor_chars = 0
        self._n_tags = 0
        self._skip_depth = 0
        self._anchor_depth = 0

    def _flush(self) -> None:
        text = _WS.sub(" ", "".join(self._parts)).strip()
        if text:
            self.blocks.append((text, self._anchor_chars, self._n_tags))
        self._parts = []
        self._anchor_chars = 0
        self._n_tags = 0

    def handle_starttag(self, tag, attrs):
        if tag in BLACKLIST_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag in BLOCK_TAGS:
            self._flush()
        else:
            self._n_tags += 1
        if tag == "a":
            self._anchor_depth += 1

    def handle_endtag(self, tag):
        if tag in BLACKLIST_TAGS:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag == "a" and self._anchor_depth:
            self._anchor_depth -= 1
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        self._parts.append(data)
        if self._anchor_depth:
            self._anchor_chars += len(_WS.sub(" ", data).strip())

    def close(self):
        super().close()
        self._flush()


def _keep_block(text: str, anchor_chars: int, n_tags: int) -> bool:
    total = len(text)
    if total == 0:
        return False
    if anchor_chars / total > LINK_DENSITY_MAX:
        return False
    if total / (1.0 + n_tags) < TEXT_DENSITY_MIN and total < SHORT_BLOCK_CHARS:
        return False
    return True


def extract_html(payload: bytes) -> str:
    """bytes -> main-content plain text per the normative spec above."""
    declared = None
    m = _META_CHARSET.search(payload[:4096])
    if m:
        declared = m.group(1).decode("ascii", "ignore")
    doc = decode_bytes(payload, declared)
    walker = _BlockWalker()
    walker.feed(doc)
    walker.close()
    kept = [t for (t, a, n) in walker.blocks if _keep_block(t, a, n)]
    return normalize_text("\n".join(kept))
