"""X3/X4/X5 — OOXML extraction: docx / pptx / xlsx (SURVEY.md §2.4.4).

Reference analogue: the OOXML branches of the simple Lambda (unzip, parse
``word/document.xml`` / slide XML / sheet XML, join text runs)
[R: functions/simple/main.py ⚠] [D: BASELINE.json north_star "OOXML …
zip+XML extractors"].  Pure stdlib ``zipfile`` + ``xml.etree``;
namespace-agnostic matching on local names (``{*}t``) so namespace-version
drift between OOXML generators can't change output.

Normative semantics:
- docx: ``w:p`` -> line; ``w:t`` text runs concatenated; ``w:tab`` -> TAB;
  ``w:br``/``w:cr`` -> newline.
- pptx: slides in numeric filename order; ``a:p`` -> line; slide boundary ->
  blank line.
- xlsx: sharedStrings resolved, inline ``<is>`` handled; row -> line with
  TAB between cells; sheets in numeric filename order, blank-line separated.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

from .normalize import normalize_text


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _zip_open(payload: bytes) -> zipfile.ZipFile:
    return zipfile.ZipFile(io.BytesIO(payload))


def _numeric_order(names: list[str], pattern: str) -> list[str]:
    rx = re.compile(pattern)
    keyed = []
    for n in names:
        m = rx.fullmatch(n)
        if m:
            keyed.append((int(m.group(1)), n))
    return [n for _, n in sorted(keyed)]


# ------------------------------------------------------------------- docx

def _docx_paragraph_text(p: ET.Element) -> str:
    parts: list[str] = []
    for el in p.iter():
        loc = _local(el.tag)
        if loc == "t":
            parts.append(el.text or "")
        elif loc == "tab":
            parts.append("\t")
        elif loc in ("br", "cr"):
            parts.append("\n")
    return "".join(parts)


def extract_docx(payload: bytes) -> str:
    with _zip_open(payload) as zf:
        root = ET.fromstring(zf.read("word/document.xml"))
    lines = [
        _docx_paragraph_text(p) for p in root.iter() if _local(p.tag) == "p"
    ]
    return normalize_text("\n".join(lines))


# ------------------------------------------------------------------- pptx

def extract_pptx(payload: bytes) -> str:
    slides_out: list[str] = []
    with _zip_open(payload) as zf:
        slide_names = _numeric_order(
            zf.namelist(), r"ppt/slides/slide(\d+)\.xml"
        )
        for name in slide_names:
            root = ET.fromstring(zf.read(name))
            lines = []
            for p in root.iter():
                if _local(p.tag) != "p":
                    continue
                runs = [el.text or "" for el in p.iter() if _local(el.tag) == "t"]
                lines.append("".join(runs))
            slides_out.append("\n".join(lines))
    return normalize_text("\n\n".join(slides_out))


# ------------------------------------------------------------------- xlsx

def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    strings = []
    for si in root:
        if _local(si.tag) != "si":
            continue
        strings.append(
            "".join(el.text or "" for el in si.iter() if _local(el.tag) == "t")
        )
    return strings


def _cell_value(c: ET.Element, shared: list[str]) -> str:
    ctype = c.get("t", "n")
    if ctype == "inlineStr":
        return "".join(el.text or "" for el in c.iter() if _local(el.tag) == "t")
    v = None
    for el in c:
        if _local(el.tag) == "v":
            v = el.text or ""
            break
    if v is None:
        return ""
    if ctype == "s":
        try:
            return shared[int(v)]
        except (ValueError, IndexError):
            return ""
    return v


def extract_xlsx(payload: bytes) -> str:
    sheets_out: list[str] = []
    with _zip_open(payload) as zf:
        shared = _shared_strings(zf)
        sheet_names = _numeric_order(
            zf.namelist(), r"xl/worksheets/sheet(\d+)\.xml"
        )
        for name in sheet_names:
            root = ET.fromstring(zf.read(name))
            rows = []
            for row in root.iter():
                if _local(row.tag) != "row":
                    continue
                cells = [
                    _cell_value(c, shared)
                    for c in row
                    if _local(c.tag) == "c"
                ]
                rows.append("\t".join(cells))
            sheets_out.append("\n".join(rows))
    return normalize_text("\n\n".join(sheets_out))
