"""Shared 5x7 bitmap glyph font + raster render/decode — the closed loop
behind the executed OCR-lite route (X14, SURVEY.md §2.4.3).

The reference's second Lambda rasterizes pages and runs Tesseract
[R: functions/ocr/main.py ⚠].  No OCR engine ships in this sandbox
(SURVEY.md §0.3 consequence 3), so the route is closed the same way the
PDF writer/parser pair is (§5.2): the corpus generator *renders* text into
a real raster (shipped as a valid PNG, or as a FlateDecode grayscale image
XObject inside a scanned-style PDF), and the extractor side *recognizes*
it back by exact glyph matching against this font table.  Like a Tesseract
model trained on one font, the decoder knows the font metrics; unlike a
stub, the pixels actually flow end to end and a corrupted raster fails
honestly.

Renderer and decoder share ONLY this module — the renderer lives in
corpusgen (writer side), the decoder in extractors/ocr.py (reader side).
"""

from __future__ import annotations

# Glyph cell geometry (the "trained font metrics")
CHAR_W = 5
CHAR_H = 7
X_PITCH = 6   # 5 px glyph + 1 px gap
Y_PITCH = 9   # 7 px glyph + 2 px leading
MARGIN = 2    # blank border around the text block

INK = 0       # black on
BG = 255      # white background

# Classic 5x7 dot-matrix font, uppercase + digits + period.
_FONT_ROWS: dict[str, tuple[str, ...]] = {
    "A": (".###.", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "B": ("####.", "#...#", "#...#", "####.", "#...#", "#...#", "####."),
    "C": (".###.", "#...#", "#....", "#....", "#....", "#...#", ".###."),
    "D": ("####.", "#...#", "#...#", "#...#", "#...#", "#...#", "####."),
    "E": ("#####", "#....", "#....", "####.", "#....", "#....", "#####"),
    "F": ("#####", "#....", "#....", "####.", "#....", "#....", "#...."),
    "G": (".###.", "#...#", "#....", "#.###", "#...#", "#...#", ".###."),
    "H": ("#...#", "#...#", "#...#", "#####", "#...#", "#...#", "#...#"),
    "I": (".###.", "..#..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "J": ("..###", "...#.", "...#.", "...#.", "...#.", "#..#.", ".##.."),
    "K": ("#...#", "#..#.", "#.#..", "##...", "#.#..", "#..#.", "#...#"),
    "L": ("#....", "#....", "#....", "#....", "#....", "#....", "#####"),
    "M": ("#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"),
    "N": ("#...#", "##..#", "#.#.#", "#..##", "#...#", "#...#", "#...#"),
    "O": (".###.", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "P": ("####.", "#...#", "#...#", "####.", "#....", "#....", "#...."),
    "Q": (".###.", "#...#", "#...#", "#...#", "#.#.#", "#..#.", ".##.#"),
    "R": ("####.", "#...#", "#...#", "####.", "#.#..", "#..#.", "#...#"),
    "S": (".###.", "#...#", "#....", ".###.", "....#", "#...#", ".###."),
    "T": ("#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."),
    "U": ("#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."),
    "V": ("#...#", "#...#", "#...#", "#...#", "#...#", ".#.#.", "..#.."),
    "W": ("#...#", "#...#", "#...#", "#.#.#", "#.#.#", "##.##", "#...#"),
    "X": ("#...#", "#...#", ".#.#.", "..#..", ".#.#.", "#...#", "#...#"),
    "Y": ("#...#", "#...#", ".#.#.", "..#..", "..#..", "..#..", "..#.."),
    "Z": ("#####", "....#", "...#.", "..#..", ".#...", "#....", "#####"),
    "0": (".###.", "#...#", "#..##", "#.#.#", "##..#", "#...#", ".###."),
    "1": ("..#..", ".##..", "..#..", "..#..", "..#..", "..#..", ".###."),
    "2": (".###.", "#...#", "....#", "..##.", ".#...", "#....", "#####"),
    "3": (".###.", "#...#", "....#", "..##.", "....#", "#...#", ".###."),
    "4": ("...#.", "..##.", ".#.#.", "#..#.", "#####", "...#.", "...#."),
    "5": ("#####", "#....", "####.", "....#", "....#", "#...#", ".###."),
    "6": (".###.", "#....", "#....", "####.", "#...#", "#...#", ".###."),
    "7": ("#####", "....#", "...#.", "..#..", ".#...", ".#...", ".#..."),
    "8": (".###.", "#...#", "#...#", ".###.", "#...#", "#...#", ".###."),
    "9": (".###.", "#...#", "#...#", ".####", "....#", "....#", ".###."),
    ".": (".....", ".....", ".....", ".....", ".....", ".##..", ".##.."),
}

# char -> 35-bit pattern (row-major); 0 pattern is reserved for space
FONT: dict[str, int] = {}
for _ch, _rows in _FONT_ROWS.items():
    _bits = 0
    for _r in _rows:
        for _c in _r:
            _bits = (_bits << 1) | (1 if _c == "#" else 0)
    FONT[_ch] = _bits
_REVERSE: dict[int, str] = {v: k for k, v in FONT.items()}
assert len(_REVERSE) == len(FONT), "font glyph patterns must be distinct"


def renderable(text: str, cols: int = 40) -> list[str]:
    """Uppercase + project to the font alphabet (unknown -> space), wrap
    hard at *cols* — the exact line layout the renderer emits and the
    decoder reads back."""
    out: list[str] = []
    for raw_line in text.upper().split("\n"):
        line = "".join(c if c in FONT or c == " " else " " for c in raw_line)
        while len(line) > cols:
            out.append(line[:cols])
            line = line[cols:]
        out.append(line)
    return out


def render_raster(text: str, cols: int = 40) -> tuple[int, int, bytearray]:
    """(width, height, grayscale bytes row-major): BG white, INK black."""
    lines = renderable(text, cols)
    n_cols = max((len(ln) for ln in lines), default=0)
    w = MARGIN * 2 + max(n_cols * X_PITCH - 1, 1)
    h = MARGIN * 2 + max(len(lines) * Y_PITCH - 2, 1)
    raster = bytearray([BG]) * (w * h)
    for li, line in enumerate(lines):
        y0 = MARGIN + li * Y_PITCH
        for ci, ch in enumerate(line):
            rows = _FONT_ROWS.get(ch)
            if rows is None:
                continue
            x0 = MARGIN + ci * X_PITCH
            for ry, rrow in enumerate(rows):
                base = (y0 + ry) * w + x0
                for rx, cbit in enumerate(rrow):
                    if cbit == "#":
                        raster[base + rx] = INK
    return w, h, raster


def ocr_raster(w: int, h: int, raster: bytes | bytearray) -> str:
    """Recognize a grayscale raster produced by (any renderer of) this
    font: threshold at 128, walk the fixed glyph grid, exact-match each
    5x7 cell.  Non-empty unmatched cells decode to '?' (honest failure,
    like any OCR confusion); empty cells are spaces."""
    lines: list[str] = []
    li = 0
    while MARGIN + li * Y_PITCH + CHAR_H <= h:
        y0 = MARGIN + li * Y_PITCH
        chars: list[str] = []
        ci = 0
        while MARGIN + ci * X_PITCH + CHAR_W <= w:
            x0 = MARGIN + ci * X_PITCH
            bits = 0
            for ry in range(CHAR_H):
                base = (y0 + ry) * w + x0
                for rx in range(CHAR_W):
                    bits = (bits << 1) | (1 if raster[base + rx] < 128 else 0)
            if bits == 0:
                chars.append(" ")
            else:
                chars.append(_REVERSE.get(bits, "?"))
            ci += 1
        lines.append("".join(chars).rstrip())
        li += 1
    return "\n".join(lines)
