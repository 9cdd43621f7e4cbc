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
