"""X9–X13 — text-like extractors: txt, csv, xml, json, eml (SURVEY.md §2.3).

Reference analogues [R: functions/simple/main.py ⚠]:
- txt/csv: chardet-detect then decode;
- xml: lxml ``itertext()``-style concatenation;
- json: string-value passthrough;
- eml: stdlib ``email`` parse preferring the text/plain part.
"""

from __future__ import annotations

import email
import email.policy
import json
import xml.etree.ElementTree as ET

from .charset import decode_bytes
from .normalize import normalize_text


def extract_txt(payload: bytes) -> str:
    return normalize_text(decode_bytes(payload))


def extract_csv(payload: bytes) -> str:
    # cells/delimiters preserved — a CSV *is* text (SURVEY.md X10)
    return normalize_text(decode_bytes(payload))


def extract_xml(payload: bytes) -> str:
    root = ET.fromstring(decode_bytes(payload))
    chunks = [t.strip() for t in root.itertext()]
    return normalize_text("\n".join(c for c in chunks if c))


def _json_strings(node, out: list[str]) -> None:
    if isinstance(node, str):
        out.append(node)
    elif isinstance(node, dict):
        for v in node.values():
            _json_strings(v, out)
    elif isinstance(node, list):
        for v in node:
            _json_strings(v, out)


def extract_json(payload: bytes) -> str:
    doc = json.loads(decode_bytes(payload))
    out: list[str] = []
    _json_strings(doc, out)
    return normalize_text("\n".join(out))


def extract_eml(payload: bytes) -> str:
    msg = email.message_from_bytes(payload, policy=email.policy.default)
    plain_parts: list[str] = []
    html_parts: list[bytes] = []
    for part in msg.walk():
        if part.is_multipart():
            continue
        ctype = part.get_content_type()
        if ctype == "text/plain":
            try:
                plain_parts.append(part.get_content())
            except (LookupError, UnicodeDecodeError, KeyError):
                plain_parts.append(decode_bytes(part.get_payload(decode=True) or b""))
        elif ctype == "text/html":
            html_parts.append(part.get_payload(decode=True) or b"")
    if plain_parts:
        return normalize_text("\n\n".join(plain_parts))
    if html_parts:
        from .html import extract_html
        return normalize_text("\n\n".join(extract_html(h) for h in html_parts))
    return ""
