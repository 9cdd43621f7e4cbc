"""EPUB e-book extraction (.epub: OCF zip + OPF package + XHTML chapters).

Reference analogue: the zip+HTML document branch of the simple Lambda
(unzip, extract each markup member) [R: functions/simple/main.py ⚠].
Public spec: EPUB OCF (``META-INF/container.xml`` names the OPF
rootfile via ``full-path``) and OPF package (manifest maps id -> href,
the SPINE's itemref order — not the manifest's — defines reading order;
hrefs resolve relative to the OPF's own directory).

Normative semantics:
- chapters = the spine's itemrefs resolved through the manifest,
  restricted to (X)HTML media types; each chapter goes through the same
  HTML scanner as a standalone page (boilerplate stripping included),
  texts joined by newline in spine order;
- manifest-only members (nav/toc, styles, fonts) are never extracted;
- malformed container/OPF degrades to every ``*.xhtml/html/htm`` member
  in name-sorted order (the realistic salvage for the broken-paczip
  long tail) — a chapter that fails to read is skipped, but a book that
  yields zero chapters raises, landing the row in status=error.
"""

from __future__ import annotations

import io
import posixpath
import xml.etree.ElementTree as ET
import zipfile

from .html import extract_html
from .normalize import normalize_text

_HTML_EXTS = ("xhtml", "html", "htm")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _opf_path(zf: zipfile.ZipFile) -> str | None:
    """OCF: META-INF/container.xml -> first rootfile's full-path."""
    try:
        root = ET.fromstring(zf.read("META-INF/container.xml"))
    except (KeyError, OSError, ET.ParseError):
        return None
    for el in root.iter():
        if _local(el.tag) == "rootfile":
            p = el.get("full-path")
            if p:
                return p
    return None


def _spine_hrefs(zf: zipfile.ZipFile, opf_path: str) -> list[str] | None:
    """OPF: spine itemref order resolved through the manifest; None when
    the package is unreadable or yields no HTML chapters."""
    try:
        root = ET.fromstring(zf.read(opf_path))
    except (KeyError, OSError, ET.ParseError):
        return None
    manifest: dict[str, tuple[str, str]] = {}
    spine: list[str] = []
    for el in root.iter():
        loc = _local(el.tag)
        if loc == "item":
            iid, href = el.get("id"), el.get("href")
            if iid and href:
                manifest[iid] = (href, el.get("media-type") or "")
        elif loc == "itemref":
            ref = el.get("idref")
            if ref:
                spine.append(ref)
    base = posixpath.dirname(opf_path)
    out: list[str] = []
    for ref in spine:
        href, mt = manifest.get(ref, (None, ""))
        if not href:
            continue
        ext = href.rsplit(".", 1)[-1].lower()
        if "html" in mt.lower() or ext in _HTML_EXTS:
            out.append(posixpath.normpath(posixpath.join(base, href)))
    return out or None


def extract_epub(payload: bytes) -> str:
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        names = set(zf.namelist())
        hrefs: list[str] | None = None
        opf = _opf_path(zf)
        if opf and opf in names:
            hrefs = _spine_hrefs(zf, opf)
        if hrefs is None:
            hrefs = sorted(
                n for n in names
                if n.rsplit(".", 1)[-1].lower() in _HTML_EXTS
                and not n.startswith("META-INF/")
            )
        chapters: list[str] = []
        for h in hrefs:
            if h not in names:
                continue
            try:
                text = extract_html(zf.read(h))
            except Exception:  # noqa: BLE001 — salvage the rest of the book
                continue
            if text.strip():
                chapters.append(text)
    if not chapters:
        raise ValueError("epub: no readable chapters")
    return normalize_text("\n".join(chapters))
