"""Property-based tests (hypothesis) for the extractor surface — the
§5.3-item-4 robustness strategy upgraded from seeded-random loops to real
shrinking property tests now that hypothesis ships in the environment.

Invariants: the dispatcher NEVER raises (poison doc -> error row, §2.7);
normalization is idempotent and always NFC; extraction is deterministic;
magic-byte prefixes always dispatch to their format."""

from __future__ import annotations

import unicodedata

from hypothesis import given, settings, strategies as st

from cc_extract.extractors import extract_document
from cc_extract.extractors.normalize import normalize_text

MAGICS = [
    b"%PDF-1.4\n", b"PK\x03\x04", b"{\\rtf1", b"<html>", b"%!PS",
    b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0", b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1",
]


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_dispatch_never_raises_on_arbitrary_bytes(payload):
    res = extract_document(payload, "https://fuzz.example/doc")
    assert res["status"] in (
        "ok", "ok_ocr", "needs_ocr", "error", "unsupported", "unsupported_legacy"
    )
    assert isinstance(res["text"], str)


@settings(max_examples=100, deadline=None)
@given(st.sampled_from(MAGICS), st.binary(max_size=2048))
def test_dispatch_never_raises_on_magic_prefixed_garbage(magic, tail):
    """Valid magic + garbage body: the adversarial half of the corpus —
    must quarantine or error, never throw, and must sniff consistently."""
    res = extract_document(magic + tail, "https://fuzz.example/doc.bin")
    assert res["status"] in (
        "ok", "ok_ocr", "needs_ocr", "error", "unsupported", "unsupported_legacy"
    )


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2000))
def test_normalize_idempotent_and_nfc(s):
    once = normalize_text(s)
    assert normalize_text(once) == once
    assert unicodedata.is_normalized("NFC", once)
    # pinned invariants from §2.4.6
    assert "\r" not in once
    assert "\n\n\n" not in once
    assert once == once.strip()
    # spec step 2 strips trailing SPACES/TABS only — exotic trailing
    # whitespace (NBSP etc.) is content and survives, so assert exactly
    # the pinned invariant, not str.isspace()'s wider class (a hypothesis
    # run found '0\xa0\r0' falsifying the over-strict version)
    assert all(not ln.endswith((" ", "\t")) for ln in once.split("\n"))


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=4096))
def test_extraction_deterministic(payload):
    a = extract_document(payload, "https://fuzz.example/d")
    b = extract_document(payload, "https://fuzz.example/d")
    assert a == b


# ----------------------- fast HTML scanner vs stdlib (differential fuzz)

# Text alphabet deliberately excludes '<': raw '<' in text creates
# unterminated tag soup, where the two parsers legitimately diverge
# (stdlib invents tolerant tag names like "b'<"; the fast scanner falls
# back to text, the WHATWG-closer behavior — documented in html.py).
# Tag-soup robustness is covered by the never-raises fuzz tests instead.
_TAGS = ["p", "div", "span", "a", "li", "nav", "script", "style", "br", "b"]
_texts = st.text(
    alphabet="ab &;x#3-'\"", min_size=0, max_size=20
)


@st.composite
def _html_fragment(draw, depth=0):
    kind = draw(st.integers(0, 5 if depth < 3 else 1))
    if kind <= 1:
        return draw(_texts)
    if kind == 2:
        return f"<!-- {draw(_texts)} -->"
    tag = draw(st.sampled_from(_TAGS))
    attr = draw(st.sampled_from(["", ' href="x>y"', " id='a'", " data-x=1"]))
    if kind == 3:
        return f"<{tag}{attr}/>"
    if tag in ("script", "style"):
        return f"<{tag}{attr}>var x = '</div>';</{tag}>"
    inner = "".join(draw(st.lists(_html_fragment(depth + 1), max_size=3)))
    return f"<{tag.upper() if draw(st.booleans()) else tag}{attr}>{inner}</{tag}>"


@settings(max_examples=150, deadline=None)
@given(st.lists(_html_fragment(), max_size=6))
def test_html_fast_scanner_differential(frags):
    """Structured random HTML: the fast scanner's block output must equal
    the stdlib html.parser reference's."""
    from cc_extract.extractors.html import (
        _BlockState, _BlockWalkerStdlib, _scan_html,
    )

    doc = "<html><body>" + "".join(frags) + "</body></html>"
    w = _BlockWalkerStdlib()
    w.feed(doc)
    w.close()
    w.state.finish()
    fast = _BlockState()
    _scan_html(doc, fast)
    assert fast.blocks == w.state.blocks


@settings(max_examples=150, deadline=None)
@given(st.lists(_html_fragment(), max_size=6))
def test_scan_blocks_differential(frags):
    """Structured random HTML: the inlined production scanner must be
    block- and span-identical to the event-driven walker."""
    from cc_extract.extractors.html import (
        _BlockStateSpans, _scan_blocks, _scan_html,
    )

    doc = "<html><body>" + "".join(frags) + "</body></html>"
    ref = _BlockStateSpans()
    _scan_html(doc, ref)
    assert _scan_blocks(doc, want_spans=True) == (ref.blocks, ref.spans)
