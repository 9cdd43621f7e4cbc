"""X6 — OpenDocument text extraction: odt (+ods/odp) (SURVEY.md §2.4.4).

Reference analogue: the ODT branch of the simple Lambda (unzip, parse
``content.xml``) [R: functions/simple/main.py ⚠] [D: BASELINE.json
north_star "ODT zip+XML"].

Normative semantics: ``text:p`` / ``text:h`` -> line (document order);
``text:tab`` -> TAB; ``text:line-break`` -> newline; ``text:s`` -> space
run (``text:c`` count); nested spans concatenated.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

from .normalize import normalize_text


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _para_text(p: ET.Element) -> str:
    parts: list[str] = []

    def walk(el: ET.Element) -> None:
        loc = _local(el.tag)
        if loc == "tab":
            parts.append("\t")
        elif loc == "line-break":
            parts.append("\n")
        elif loc == "s":
            try:
                count = int(el.get("{urn:oasis:names:tc:opendocument:xmlns:text:1.0}c", "1"))
            except ValueError:
                count = 1
            parts.append(" " * max(count, 1))
        if el.text:
            parts.append(el.text)
        for child in el:
            walk(child)
            if child.tail:
                parts.append(child.tail)

    for child in p:
        walk(child)
        if child.tail:
            parts.append(child.tail)
    if p.text:
        parts.insert(0, p.text)
    return "".join(parts)


def extract_odt(payload: bytes) -> str:
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    lines = []
    for el in root.iter():
        if _local(el.tag) in ("p", "h") and "text" in el.tag:
            lines.append(_para_text(el))
    return normalize_text("\n".join(lines))


def extract_ods(payload: bytes) -> str:
    """OpenDocument spreadsheet: same content.xml grammar, spreadsheet
    conventions matching X5/xls — cells TAB-joined in column order
    (``table:number-columns-repeated`` expanded, capped), rows ->
    lines, tables blank-line separated; a cell's paragraphs join with a
    space."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    tables: list[str] = []
    for tbl in root.iter():
        if _local(tbl.tag) != "table" or "table" not in tbl.tag:
            continue
        rows: list[str] = []
        for row in tbl:
            if _local(row.tag) != "table-row":
                continue
            cells: list[str] = []
            for cell in row:
                loc = _local(cell.tag)
                if loc not in ("table-cell", "covered-table-cell"):
                    continue
                paras = [
                    _para_text(el) for el in cell.iter()
                    if _local(el.tag) in ("p", "h") and "text" in el.tag
                ]
                text = " ".join(t for t in paras if t)
                rep = 1
                for k, v in cell.attrib.items():
                    if k.endswith("number-columns-repeated"):
                        try:
                            rep = min(max(int(v), 1), 256)
                        except ValueError:
                            rep = 1
                cells.extend([text] * rep)
            # trailing empty cells (repeat-padded filler) are dropped
            while cells and not cells[-1]:
                cells.pop()
            rows.append("\t".join(cells))
        while rows and not rows[-1]:
            rows.pop()
        tables.append("\n".join(rows))
    return normalize_text("\n\n".join(tables))


def extract_odp(payload: bytes) -> str:
    """OpenDocument presentation: ``draw:page`` -> slide, paragraphs ->
    lines, slide boundary -> blank line (the X4/pptx convention)."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    pages: list[str] = []
    for el in root.iter():
        if _local(el.tag) == "page" and "drawing" in el.tag:
            lines = [
                _para_text(p) for p in el.iter()
                if _local(p.tag) in ("p", "h") and "text" in p.tag
            ]
            pages.append("\n".join(lines))
    return normalize_text("\n\n".join(pages))
