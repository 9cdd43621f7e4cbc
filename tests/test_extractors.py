"""Unit tests per extractor (SURVEY.md §5.3 item 3): hand-written minimal
inputs with exact expected strings, normalization edges, fuzz-robustness."""

from __future__ import annotations

import random

import pytest

from cc_extract.corpusgen import gen_corpus, _gen_pdf, _gen_docx, _gen_epub
from cc_extract.extractors import extract_document
from cc_extract.extractors.epub import extract_epub
from cc_extract.extractors.html import extract_html
from cc_extract.extractors.normalize import normalize_text
from cc_extract.extractors.ooxml import extract_docx, extract_pptx, extract_xlsx
from cc_extract.extractors.odt import extract_odt
from cc_extract.extractors.pdf import extract_pdf
from cc_extract.extractors.rtf import extract_rtf
from cc_extract.extractors.textlike import (
    extract_csv, extract_eml, extract_json, extract_txt, extract_xml,
)
from cc_extract.sniff import sniff_format


# ------------------------------------------------------------- normalize

def test_normalize_crlf_trailing_collapse():
    assert normalize_text("a  \r\nb\r\r\n\n\n\nc\t \n") == "a\nb\n\nc"


def test_normalize_nfc():
    # e + combining acute -> é (NFC)
    assert normalize_text("café") == "café"


# ------------------------------------------------------------------ html

def test_html_basic_blocks_and_blacklist():
    doc = b"""<html><head><title>t</title><script>var x=1;</script></head>
    <body><nav><a href="/">home</a><a href="/x">x</a></nav>
    <p>This is the first real paragraph of visible body content here.</p>
    <h2>A heading line</h2>
    <div>Another solid block of content text that is long enough to keep.</div>
    <footer><a href="/tos">tos</a></footer></body></html>"""
    out = extract_html(doc)
    assert "first real paragraph" in out
    assert "Another solid block" in out
    assert "A heading line" in out
    assert "var x=1" not in out
    assert "home" not in out  # nav is blacklisted
    assert "tos" not in out   # footer is blacklisted


def test_html_link_density_drop():
    doc = (b"<html><body><p><a href='1'>aaa</a> <a href='2'>bbb</a> zz</p>"
           b"<p>Normal paragraph with plenty of ordinary prose text to keep here.</p>"
           b"</body></html>")
    out = extract_html(doc)
    assert "aaa" not in out          # link_density > 0.5 -> dropped
    assert "Normal paragraph" in out


def test_html_entities_and_charset():
    doc = '<html><head><meta charset="cp1252"></head><body><p>caf\xe9 &amp; cr\xe8me, a fairly long sentence to survive density filters.</p></body></html>'.encode("cp1252")
    out = extract_html(doc)
    assert "café & crème" in out


def test_html_legacy_multibyte_charsets():
    """Declared-charset route for the corpus's non-Latin language packs:
    Shift_JIS / GBK / EUC-KR / windows-1251 / ISO-8859-7 pages must decode
    through the <meta> declaration (charset.py tries it before utf-8) with
    zero mojibake in the non-Latin body."""
    from cc_extract.corpusgen import _LANG_PACKS, _gen_html
    import re as _re

    seen = {}
    for seed in range(4000):
        b = _gen_html(random.Random(seed))
        m = _re.search(rb'charset="([^"]+)"', b)
        cs = m.group(1).decode()
        if cs in ("utf-8", "cp1252") or cs in seen:
            continue
        seen[cs] = b
        if len(seen) == len(_LANG_PACKS):
            break
    assert len(seen) == len(_LANG_PACKS)
    for lang, (charset, pool, _joiner) in _LANG_PACKS.items():
        body = extract_html(seen[charset])
        # at least half the pack's words appear intact — mojibake
        # (utf-8-bytes-as-latin-1 or '?' floods) would yield zero hits
        hits = sum(1 for w in pool if w in body)
        assert hits >= len(pool) // 2, (lang, charset, body[:120])
        # the non-Latin portion must carry no replacement chars; '?' may
        # appear only from the intentionally-lossy Latin title words
        non_latin = "".join(ch for ch in body if ord(ch) > 0x24F)
        assert non_latin and "�" not in body


# ------------------------------------------------------------------- pdf

def test_pdf_roundtrip_synthetic():
    rng = random.Random(7)
    payload = _gen_pdf(rng)
    text = extract_pdf(payload)
    assert len(text) > 20
    assert "\x00" not in text


def test_pdf_escapes_and_hex():
    import zlib
    content = rb"""BT /F1 12 Tf 72 720 Td (Hello \(world\) \\ end) Tj 0 -14 Td
[(A) -250 (B) -20 (C)] TJ T* <48492E> Tj ET"""
    comp = zlib.compress(content)
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(comp)).encode() +
           b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream\nendobj\n"
           b"trailer\n<< /Root 1 0 R >>\n%%EOF")
    text = extract_pdf(pdf)
    assert "Hello (world) \\ end" in text
    # TJ: -250 gap -> space, -20 gap -> no space
    assert "A BC" in text
    assert "HI." in text


def test_pdf_empty_text_layer_routes_needs_ocr():
    rng = random.Random(0)
    # force an empty-text pdf by generating until we get one
    for seed in range(500):
        rng = random.Random(seed)
        p = _gen_pdf(rng)
        res = extract_document(p)
        if res["status"] == "needs_ocr":
            assert res["fmt"] == "pdf"
            return
    pytest.fail("no empty-text pdf generated in 500 seeds")


# ----------------------------------------------------------------- ooxml

def _zip(entries):
    import io, zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n, d in entries:
            zf.writestr(n, d)
    return buf.getvalue()


def test_docx_exact():
    doc = _zip([("word/document.xml",
        '<w:document xmlns:w="http://x"><w:body>'
        '<w:p><w:r><w:t>Hello</w:t></w:r><w:r><w:tab/><w:t>World</w:t></w:r></w:p>'
        '<w:p><w:r><w:t>Line2</w:t><w:br/><w:t>Line3</w:t></w:r></w:p>'
        "</w:body></w:document>")])
    assert extract_docx(doc) == "Hello\tWorld\nLine2\nLine3"


def test_pptx_slide_order():
    slide = ('<p:sld xmlns:p="http://p" xmlns:a="http://a"><p:cSld>'
             "<a:p><a:r><a:t>{}</a:t></a:r></a:p></p:cSld></p:sld>")
    doc = _zip([
        ("ppt/presentation.xml", "<p/>"),
        ("ppt/slides/slide10.xml", slide.format("ten")),
        ("ppt/slides/slide2.xml", slide.format("two")),
        ("ppt/slides/slide1.xml", slide.format("one")),
    ])
    assert extract_pptx(doc) == "one\n\ntwo\n\nten"


def test_xlsx_shared_and_inline():
    doc = _zip([
        ("xl/workbook.xml", "<wb/>"),
        ("xl/sharedStrings.xml",
         '<sst xmlns="http://x"><si><t>alpha</t></si><si><t>beta</t></si></sst>'),
        ("xl/worksheets/sheet1.xml",
         '<worksheet xmlns="http://x"><sheetData>'
         '<row r="1"><c r="A1" t="s"><v>1</v></c><c r="B1"><v>42</v></c>'
         '<c r="C1" t="inlineStr"><is><t>inline</t></is></c></row>'
         "</sheetData></worksheet>"),
    ])
    assert extract_xlsx(doc) == "beta\t42\tinline"


def test_odt_exact():
    t = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    doc = _zip([
        ("mimetype", "application/vnd.oasis.opendocument.text"),
        ("content.xml",
         f'<office:document-content xmlns:office="urn:o" xmlns:text="{t}">'
         "<office:body><office:text>"
         "<text:h>Head</text:h><text:p>Para one<text:tab/>tabbed</text:p>"
         "<text:p>Second<text:line-break/>broken</text:p>"
         "</office:text></office:body></office:document-content>"),
    ])
    assert extract_odt(doc) == "Head\nPara one\ttabbed\nSecond\nbroken"


# ------------------------------------------------------------------ epub

_EPUB_CONTAINER = (
    '<?xml version="1.0"?><container version="1.0" '
    'xmlns="urn:oasis:names:tc:opendocument:xmlns:container"><rootfiles>'
    '<rootfile full-path="OEBPS/content.opf" '
    'media-type="application/oebps-package+xml"/></rootfiles></container>')


def _epub(opf: str, chapters: list[tuple[str, str]],
          container: str = _EPUB_CONTAINER):
    entries = [("mimetype", "application/epub+zip"),
               ("META-INF/container.xml", container),
               ("OEBPS/content.opf", opf)]
    entries += [(f"OEBPS/{n}", body) for n, body in chapters]
    return _zip(entries)


def test_epub_spine_order_not_manifest_order():
    """Reading order comes from the spine; the manifest lists chapters
    backwards here, and nav.xhtml (manifest-only) must not leak."""
    opf = ('<package xmlns="http://www.idpf.org/2007/opf">'
           '<manifest>'
           '<item id="b" href="text/b.xhtml" media-type="application/xhtml+xml"/>'
           '<item id="a" href="text/a.xhtml" media-type="application/xhtml+xml"/>'
           '<item id="nav" href="nav.xhtml" media-type="application/xhtml+xml"/>'
           '</manifest><spine><itemref idref="a"/><itemref idref="b"/></spine>'
           '</package>')
    doc = _epub(opf, [
        ("text/b.xhtml", "<html><body><p>second chapter text.</p></body></html>"),
        ("text/a.xhtml", "<html><body><p>first chapter text.</p></body></html>"),
        ("nav.xhtml", "<html><body><p>toc must not appear.</p></body></html>"),
    ])
    out = extract_epub(doc)
    assert out.index("first chapter") < out.index("second chapter")
    assert "toc must not appear" not in out


def test_epub_fallback_without_container():
    """No container.xml -> salvage every html-ish member name-sorted."""
    doc = _zip([
        ("mimetype", "application/epub+zip"),
        ("c2.xhtml", "<html><body><p>beta text.</p></body></html>"),
        ("c1.xhtml", "<html><body><p>alpha text.</p></body></html>"),
    ])
    out = extract_epub(doc)
    assert out.index("alpha") < out.index("beta")


def test_epub_missing_spine_item_skipped():
    opf = ('<package><manifest>'
           '<item id="a" href="a.xhtml" media-type="application/xhtml+xml"/>'
           '<item id="gone" href="gone.xhtml" media-type="application/xhtml+xml"/>'
           '</manifest><spine><itemref idref="gone"/><itemref idref="a"/>'
           '</spine></package>')
    doc = _epub(opf, [("a.xhtml", "<html><body><p>only chapter here.</p></body></html>")])
    assert "only chapter" in extract_epub(doc)


def test_epub_no_chapters_is_error_row():
    doc = _zip([("mimetype", "application/epub+zip"),
                ("META-INF/container.xml", _EPUB_CONTAINER)])
    r = extract_document(doc)
    assert r["fmt"] == "epub" and r["status"] == "error"


def test_epub_generated_corpus_roundtrip():
    rng = random.Random(99)
    doc = _gen_epub(rng)
    assert sniff_format(doc) == "epub"
    r = extract_document(doc)
    assert r["status"] == "ok" and len(r["text"]) > 50
    assert "table of contents" not in r["text"]


# ------------------------------------------------------------------- rtf

def test_rtf_exact():
    doc = (rb"{\rtf1\ansi\ansicpg1252\deff0{\fonttbl{\f0 Arial;}}"
           rb"{\colortbl;\red0\green0\blue0;}"
           rb"Caf\'e9 one\par second\tab tabbed\par " +
           b"\\u1055?\\u1088? done}")
    out = extract_rtf(doc)
    assert out == "Café one\nsecond\ttabbed\nПр done"


def test_rtf_skips_star_destinations():
    doc = rb"{\rtf1\ansi {\*\generator secret tool;}visible\par}"
    assert extract_rtf(doc) == "visible"


# -------------------------------------------------------------- textlike

def test_txt_charsets():
    assert extract_txt("héllo".encode("cp1252")) == "héllo"
    assert extract_txt("héllo".encode("utf-8")) == "héllo"
    assert extract_txt(b"\xef\xbb\xbfbom") == "bom"


def test_xml_itertext():
    assert extract_xml(b"<r><a>one</a><b>two<c>three</c></b></r>") == "one\ntwo\nthree"


def test_json_string_values():
    assert extract_json(b'{"a": "x", "b": [1, "y", {"c": "z"}]}') == "x\ny\nz"


def test_eml_prefers_plain():
    eml = (b"From: a@b\r\nSubject: s\r\nMIME-Version: 1.0\r\n"
           b'Content-Type: multipart/alternative; boundary="bb"\r\n\r\n'
           b"--bb\r\nContent-Type: text/plain; charset=utf-8\r\n\r\nplain body\r\n"
           b"--bb\r\nContent-Type: text/html\r\n\r\n<p>html body</p>\r\n--bb--\r\n")
    assert extract_eml(eml) == "plain body"


def test_csv_passthrough():
    assert extract_csv(b"a,b\n1,2") == "a,b\n1,2"


# ------------------------------------------------------------------ sniff

@pytest.mark.parametrize("payload,url,expected", [
    (b"%PDF-1.4 x", None, "pdf"),
    (b"{\\rtf1 x}", None, "rtf"),
    (b"<!DOCTYPE html><html>", None, "html"),
    (b"<?xml version='1.0'?><r/>", None, "xml"),
    (b'{"a": 1}', None, "json"),
    (b"plain words", None, "txt"),
    (b"a,b\n1,2", "http://x/f.csv", "csv"),
    (b"\x89PNG\r\n\x1a\nxxx", None, "image"),
    (b"\xff\xd8\xff\xe0xxx", None, "image"),
    (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1x", None, "doc"),
    (b"Received: from x\r\nFrom: a@b\r\n\r\nbody", None, "eml"),
    (b"", None, "unknown"),
])
def test_sniff(payload, url, expected):
    assert sniff_format(payload, url) == expected


def test_sniff_zip_kinds():
    assert sniff_format(_zip([("word/document.xml", "<w/>")])) == "docx"
    assert sniff_format(_zip([("ppt/presentation.xml", "<p/>")])) == "pptx"
    assert sniff_format(_zip([("xl/workbook.xml", "<w/>")])) == "xlsx"
    assert sniff_format(_zip([("mimetype", "application/vnd.oasis.opendocument.text"),
                              ("content.xml", "<c/>")])) == "odt"


# ------------------------------------------------- dispatch / robustness

def test_dispatch_never_raises_on_fuzz():
    """SURVEY.md §5.3 item 4: seeded byte-mutation fuzz; extractors must
    capture every failure as a status row, never an exception."""
    rng = random.Random(1234)
    rows = gen_corpus(80)
    for r in rows:
        b = bytearray(r["html"])
        for _ in range(rng.randint(1, 8)):
            if not b:
                break
            b[rng.randrange(len(b))] = rng.randrange(256)
        cut = rng.randrange(len(b) + 1)
        res = extract_document(bytes(b[:cut]), r["url"])
        assert res["status"] in ("ok", "ok_ocr", "needs_ocr", "error",
                                 "unsupported", "unsupported_legacy")


def test_dispatch_deterministic():
    rows = gen_corpus(40)
    a = [extract_document(r["html"], r["url"]) for r in rows]
    b = [extract_document(r["html"], r["url"]) for r in rows]
    assert a == b


def test_empty_payload():
    assert extract_document(b"")["status"] == "error"
    assert extract_document(None)["status"] == "error"


# -------------------------------------------------------- postscript (X15)

def test_ps_show_variants_and_escapes():
    from cc_extract.extractors.ps import extract_ps

    doc = (b"%!PS-Adobe-3.0\n"
           b"%%Title: (parens in comment) ignored show\n"
           b"/F findfont 12 scalefont setfont\n"
           b"72 720 moveto (Hello \\(world\\)) show\n"
           b"72 706 moveto 0 0 (second line) ashow\n"
           b"72 692 moveto 2 0 8#040 (third widthshow) widthshow\n"
           b"showpage\n%%EOF\n")
    assert extract_ps(doc) == "Hello (world)\nsecond line\nthird widthshow"


def test_ps_round_trip_via_dispatch():
    import random
    from cc_extract.corpusgen import _gen_ps

    rng = random.Random(11)
    res = extract_document(_gen_ps(rng), "https://x/doc.ps")
    assert (res["fmt"], res["status"]) == ("ps", "ok")
    assert len(res["text"]) > 50


def test_ps_not_postscript_raises_to_error_row():
    res = extract_document(b"%!PS\xff\xfe garbage (unterminated", "u.ps")
    assert res["fmt"] == "ps"
    assert res["status"] in ("ok", "error")  # never an exception


def test_ps_unterminated_string_is_error_not_truncation():
    # module contract: malformed PostScript quarantines as status='error';
    # a partial-text 'ok' row would silently truncate the document
    res = extract_document(b"%!PS\n72 720 moveto (no close paren show\n", "u.ps")
    assert (res["fmt"], res["status"]) == ("ps", "error")


# -------------------------------------------------------- OCR-lite (X14)

def test_ocr_png_round_trip():
    """Writer/reader closed loop: render text -> valid PNG -> recognized
    text equals the renderable projection (uppercase, font alphabet)."""
    from cc_extract.corpusgen import _png_gray
    from cc_extract.glyphs import render_raster, renderable
    from cc_extract.extractors.ocr import extract_image_ocr

    text = "The Quick Brown Fox 0123456789. second line here"
    w, h, raster = render_raster(text)
    png = _png_gray(w, h, bytes(raster))
    got = extract_image_ocr(png)
    want = "\n".join(ln.rstrip() for ln in renderable(text)).strip()
    assert got == want


def test_ocr_png_dispatch_status():
    from cc_extract.corpusgen import _png_gray
    from cc_extract.glyphs import render_raster

    w, h, raster = render_raster("scanned page")
    res = extract_document(_png_gray(w, h, bytes(raster)), "https://x/im.png")
    assert res["fmt"] == "image"
    assert res["status"] == "ok_ocr"
    assert "SCANNED PAGE" in res["text"]


def test_ocr_unreadable_images_quarantine():
    # JPEG: no decoder -> needs_ocr with reason
    res = extract_document(b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + b"\x01" * 64)
    assert (res["fmt"], res["status"]) == ("image", "needs_ocr")
    assert res["error"]
    # corrupt PNG body -> needs_ocr, never an exception
    res = extract_document(b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDRjunk" * 4)
    assert (res["fmt"], res["status"]) == ("image", "needs_ocr")
    # blank-but-valid PNG -> needs_ocr (empty recognition == empty pdf text layer)
    from cc_extract.corpusgen import _png_gray
    res = extract_document(_png_gray(8, 8, bytes([255] * 64)))
    assert (res["fmt"], res["status"]) == ("image", "needs_ocr")


def test_ocr_scanned_pdf_round_trip():
    """Empty text layer + grayscale image XObject -> ok_ocr with the
    rendered page text (the reference's rasterize->tesseract branch)."""
    import zlib as _z
    from cc_extract.glyphs import render_raster, renderable

    w, h, raster = render_raster("page one scan")
    comp_img = _z.compress(bytes(raster))
    content = _z.compress(f"q {w} 0 0 {h} 72 400 cm /Im1 Do Q".encode())
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /XObject /Subtype /Image /Width " + str(w).encode()
        + b" /Height " + str(h).encode()
        + b" /BitsPerComponent 8 /ColorSpace /DeviceGray /Filter /FlateDecode"
        b" /Length " + str(len(comp_img)).encode() + b" >>\nstream\n"
        + comp_img + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(content)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 4 0 R /Contents 2 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
        b"5 0 obj\n<< /Type /Catalog /Pages 4 0 R >>\nendobj\n"
        b"trailer\n<< /Root 5 0 R >>\n%%EOF"
    )
    res = extract_document(pdf, "https://x/scan.pdf")
    assert (res["fmt"], res["status"]) == ("pdf", "ok_ocr")
    assert res["text"] == "\n".join(renderable("page one scan")).strip()


def test_ocr_png_filter_reconstruction():
    """The PNG reader must reconstruct Sub/Up filtered scanlines, not just
    filter-0 (robustness beyond our own writer)."""
    import struct
    import zlib as _z
    from cc_extract.extractors.ocr import decode_png_gray
    from cc_extract.glyphs import render_raster

    w, h, raster = render_raster("AB")
    rows = [bytes(raster[y * w:(y + 1) * w]) for y in range(h)]
    scan = bytearray()
    for y, row in enumerate(rows):
        if y % 2 == 0 and y > 0:  # Up filter
            prev = rows[y - 1]
            scan += b"\x02" + bytes((row[x] - prev[x]) & 0xFF for x in range(w))
        elif y % 2 == 1:  # Sub filter
            enc = bytearray(row)
            for x in range(w - 1, 0, -1):
                enc[x] = (enc[x] - row[x - 1]) & 0xFF
            scan += b"\x01" + bytes(enc)
        else:
            scan += b"\x00" + row

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", _z.compress(bytes(scan)))
           + chunk(b"IEND", b""))
    w2, h2, out = decode_png_gray(png)
    assert (w2, h2) == (w, h)
    assert bytes(out) == bytes(raster)


# ------------------------------------------------------------ legacy .doc

def test_doc_roundtrip_both_encodings():
    from cc_extract.corpusgen import _gen_doc
    from cc_extract.extractors.doc import extract_doc
    rng = random.Random(11)
    payload = _gen_doc(rng)
    out = extract_doc(payload)
    assert "café résumé" in out          # UTF-16 piece decoded
    assert len(out.split("\n")) >= 2     # paragraph mark -> newline


def test_doc_truncated_is_error_row():
    from cc_extract.corpusgen import _gen_doc
    rng = random.Random(12)
    payload = _gen_doc(rng)[:700]  # header + partial directory only
    res = extract_document(payload)
    assert res["fmt"] == "doc" and res["status"] == "error"


def test_ole_subtype_routing():
    # the CFB directory's stream names route the legacy Office family
    from cc_extract.corpusgen import _cfb_container
    payload = _cfb_container([("Workbook", b"\x00" * 64), ("Extra", b"\x01" * 64)])
    res = extract_document(payload)
    # garbage Workbook stream: routed to xls, fails with the real reason
    assert res["fmt"] == "xls" and res["status"] == "error"
    assert "BOF" in res["error"]
    res = extract_document(_cfb_container([("VisioDocument", b"\x02" * 64)]))
    assert res["fmt"] == "ole" and res["status"] == "unsupported_legacy"
    assert "OLE" in res["error"]


def test_xls_roundtrip_and_cell_records():
    import random
    from cc_extract.corpusgen import _gen_xls
    from cc_extract.extractors.xls import extract_xls
    for seed in (0, 7, 23):
        out = extract_xls(_gen_xls(random.Random(seed)))
        assert out.strip()
        assert "\t" in out  # TAB-joined cells, the xlsx convention
    # hand-built workbook pinning every cell record + formats
    import struct
    from cc_extract.corpusgen import (_biff_rec, _cfb_container,
                                      _xls_sst_fragments)
    frags = _xls_sst_fragments([("héllo wörld", False), ("plain", True)],
                               cap=12)  # forces mid-string CONTINUE
    sst = _biff_rec(0x00FC, frags[0]) + b"".join(
        _biff_rec(0x003C, f) for f in frags[1:])
    cells = (
        _biff_rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0))      # héllo wörld
        + _biff_rec(0x00FD, struct.pack("<HHHI", 0, 1, 0, 1))    # plain (rich)
        + _biff_rec(0x0203, struct.pack("<HHHd", 1, 0, 0, 2.5))  # 2.5
        + _biff_rec(0x027E, struct.pack("<HHHI", 1, 1, 0,
                                        ((1234 & 0x3FFFFFFF) << 2) | 0x03))
        + _biff_rec(0x0205, struct.pack("<HHH", 2, 0, 0) + bytes([1, 0]))
        + _biff_rec(0x0205, struct.pack("<HHH", 2, 1, 0) + bytes([0x0F, 1]))
        + _biff_rec(0x0006, struct.pack("<HHH", 3, 0, 0)
                    + b"\x00\x00\x00\x00\x00\x00\xff\xff"
                    + struct.pack("<HIH", 0, 0, 0))
        + _biff_rec(0x0207, struct.pack("<HB", 6, 0) + b"cached")
    )
    bof = struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0)
    bof_g = struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0)
    sheet = _biff_rec(0x0809, bof) + cells + _biff_rec(0x000A, b"")
    name = b"S1"
    glob_len = (20 + (4 + 8 + len(name)) + len(sst) + 4)
    bs = _biff_rec(0x0085, struct.pack("<IHB", glob_len, 0, len(name))
                   + b"\x00" + name)
    wb = _biff_rec(0x0809, bof_g) + bs + sst + _biff_rec(0x000A, b"") + sheet
    out = extract_xls(_cfb_container([("Workbook", wb)]))
    lines = out.split("\n")
    assert lines[0] == "héllo wörld\tplain"
    assert lines[1] == "2.5\t12.34"       # NUMBER + RK int/x100
    assert lines[2] == "TRUE\t#VALUE!"    # BOOLERR both kinds
    assert lines[3] == "cached"           # FORMULA string via STRING


def test_ppt_roundtrip_and_text_atoms():
    import random
    from cc_extract.corpusgen import _gen_ppt, _ppt_rec, _cfb_container
    from cc_extract.extractors.ppt import extract_ppt
    for seed in (1, 9, 31):
        out = extract_ppt(_gen_ppt(random.Random(seed)))
        assert out.strip() and "\n" in out
    # hand-built deck: both atom kinds, CR/VT paragraph marks, nesting
    import struct
    atoms = (
        _ppt_rec(0x0000, 0x0F9F, struct.pack("<I", 0))
        + _ppt_rec(0x0000, 0x0FA0, "titré one\rline two".encode("utf-16-le"))
        + _ppt_rec(0x0000, 0x0FA8, b"bytes caf\xe9\x0bwrapped")
    )
    doc = _ppt_rec(0x000F, 0x03E8, _ppt_rec(0x000F, 0x0FF0, atoms))
    payload = _cfb_container([("Current User", b"\x00" * 24),
                              ("PowerPoint Document", doc)])
    out = extract_ppt(payload)
    assert out.split("\n") == ["titré one", "line two", "bytes café",
                               "wrapped"]


# ------------------------------------------------------------------ gzip

def test_gzip_transport_encoding_unwrapped():
    import gzip
    html = (b"<html><body><p>A long enough paragraph of plain visible "
            b"content to keep after density filters.</p></body></html>")
    wrapped = extract_document(gzip.compress(html, mtime=0))
    plain = extract_document(html)
    assert wrapped["fmt"] == "html" and wrapped["status"] == "ok"
    assert wrapped["text"] == plain["text"]


def test_gzip_corrupt_and_nested_are_error_rows():
    import gzip
    assert extract_document(b"\x1f\x8b\x08\x00junk")["status"] == "error"
    nested = extract_document(gzip.compress(gzip.compress(b"x")))
    assert nested["status"] == "error" and "nested" in nested["error"]


def test_bz2_xz_transport_encodings_unwrapped():
    """bz2/xz wrappers route exactly like gzip: unwrap + re-sniff, inner
    text byte-identical to the unwrapped extraction; mixed nesting (any
    wrapper inside any wrapper) is a single honest error row, never a
    second decompression."""
    import bz2
    import gzip
    import lzma
    html = (b"<html><body><p>A long enough paragraph of plain visible "
            b"content to keep after density filters.</p></body></html>")
    plain = extract_document(html)
    for codec, name in ((bz2.compress, "bz2"),
                        (lambda b: lzma.compress(b, format=lzma.FORMAT_XZ),
                         "xz")):
        res = extract_document(codec(html))
        assert res["fmt"] == "html" and res["status"] == "ok"
        assert res["text"] == plain["text"]
        corrupt = extract_document(codec(html)[:12])
        assert corrupt["fmt"] == name and corrupt["status"] == "error"
    mixed = extract_document(bz2.compress(gzip.compress(b"x")))
    assert mixed["fmt"] == "bz2" and mixed["status"] == "error"
    assert "nested" in mixed["error"]
    mixed2 = extract_document(
        gzip.compress(lzma.compress(b"x", format=lzma.FORMAT_XZ)))
    assert mixed2["fmt"] == "gzip" and mixed2["status"] == "error"
    assert "nested" in mixed2["error"]


def test_tar_bundle_depth1_order_and_tgz():
    """tar bundles mirror the zip semantics: NAME order (not archive
    order), directories skipped, nested tar AND nested zip skipped
    without recursing, all-binary bundle errors honestly; a .tar.gz
    rides gzip-unwrap -> tar route to the identical text."""
    import gzip
    import random
    from cc_extract.corpusgen import _gen_tar, _tar_bytes, _zip_bytes
    from cc_extract.extractors.archive import extract_tar

    for seed in (0, 4, 9, 23):
        res = extract_document(_gen_tar(random.Random(seed)),
                               "https://x/bundle.tar")
        assert res["fmt"] == "tar" and res["status"] == "ok"
        assert res["text"].strip()
    inner_tar = _tar_bytes([("i.txt", b"inner must not appear")])
    inner_zip = _zip_bytes([("z.txt", b"zip inner must not appear")])
    payload = _tar_bytes([
        ("b.txt", b"second part"),
        ("nested.tar", inner_tar),
        ("nested.zip", inner_zip),
        ("dir/", b""),
        ("a.txt", b"first part"),
    ])
    out = extract_tar(payload)
    assert out == "first part\n\nsecond part"
    tgz = extract_document(gzip.compress(payload, mtime=0))
    assert tgz["fmt"] == "tar" and tgz["status"] == "ok"
    assert tgz["text"] == out
    res = extract_document(_tar_bytes([("x.tar", inner_tar)]))
    assert res["fmt"] == "tar" and res["status"] == "error"
    assert "no extractable members" in res["error"]


def test_archive_depth1_refuses_before_recursing():
    """A gzip-wrapped archive member inside a bundle must be REFUSED at
    dispatch depth 1 (fmt-level unsupported), not recursively extracted:
    a zip(gzip(zip(...))) chain keeps only surface members."""
    import gzip
    from cc_extract.corpusgen import _tar_bytes, _zip_bytes
    from cc_extract.extractors import extract_document as ed

    deep = _zip_bytes([("t.txt", b"deep text must not surface")])
    chain = _zip_bytes([
        ("a.zip.gz", gzip.compress(deep, mtime=0)),
        ("ok.txt", b"surface text"),
    ])
    res = ed(chain)
    assert res["fmt"] == "zip" and res["status"] == "ok"
    assert res["text"] == "surface text"
    # and the member-level refusal is visible when dispatched directly
    member = ed(gzip.compress(deep, mtime=0), _depth=1)
    assert member["status"] == "unsupported"
    assert "nested archive" in member["error"]
    # same contract on the tar side
    chain_t = _tar_bytes([
        ("a.tar.gz", gzip.compress(_tar_bytes([("t.txt", b"deep")]),
                                   mtime=0)),
        ("ok.txt", b"surface text"),
    ])
    res_t = ed(chain_t)
    assert res_t["fmt"] == "tar" and res_t["status"] == "ok"
    assert res_t["text"] == "surface text"


def test_tar_sniff_checksum_guard():
    """5 mid-file magic bytes alone must NOT claim tar: prose with
    'ustar' at offset 257 fails the header-checksum pin and stays txt."""
    from cc_extract.sniff import sniff_format
    fake = (b"x" * 257 + b"ustar" + b"y" * 300)
    assert sniff_format(fake) == "txt"
    from cc_extract.corpusgen import _tar_bytes
    real = _tar_bytes([("a.txt", b"hello")])
    assert sniff_format(real) == "tar"


# -------------------------------------------------- PDF 1.5+ xref streams

def test_pdf_xref_stream_layout_extracts_identically():
    """Same content serialized classic (PDF 1.4 xref table) and modern
    (PDF 1.5 ObjStm + XRef stream) must extract to byte-identical text —
    the layout is transport, not content."""
    import random
    from cc_extract.corpusgen import _gen_pdf
    from cc_extract.extractors.pdf import extract_pdf

    for seed in range(8):
        classic = _gen_pdf(random.Random(seed), layout="classic")
        xref = _gen_pdf(random.Random(seed), layout="xref")
        assert xref.startswith(b"%PDF-1.5")
        assert b"/ObjStm" in xref and b"trailer" not in xref
        assert extract_pdf(xref) == extract_pdf(classic)


def test_pdf_xref_stream_structurally_valid():
    """Validate the writer against the PDF 1.5 spec itself (not just our
    own reader): decode the XRef stream's W [1 4 2] rows and check every
    type-1 offset lands on its `N 0 obj` header and every type-2 entry
    resolves through the ObjStm header to the right object number."""
    import random
    import re
    import struct
    import zlib
    from cc_extract.corpusgen import _gen_pdf

    data = _gen_pdf(random.Random(3), layout="xref")
    xref_pos = int(re.search(rb"startxref\n(\d+)\n%%EOF", data).group(1))
    m = re.match(rb"(\d+) 0 obj\n", data[xref_pos:])
    assert m, "startxref must point at the XRef stream object"
    dct = data[xref_pos:data.index(b"stream\n", xref_pos)]
    size = int(re.search(rb"/Size (\d+)", dct).group(1))
    length = int(re.search(rb"/Length (\d+)", dct).group(1))
    assert b"/W [1 4 2]" in dct and b"/Root" in dct
    sstart = data.index(b"stream\n", xref_pos) + len(b"stream\n")
    rows = zlib.decompress(data[sstart:sstart + length])
    assert len(rows) == size * 7

    objstm_entries = {}
    for num in range(size):
        typ, f2, f3 = struct.unpack(">BIH", rows[num * 7:(num + 1) * 7])
        if num == 0:
            assert typ == 0
        elif typ == 1:  # direct: offset points at the object header
            assert data[f2:].startswith(f"{num} 0 obj".encode()), num
        else:
            assert typ == 2
            objstm_entries[num] = (f2, f3)

    assert objstm_entries, "xref layout must pack some objects"
    # resolve every type-2 entry through the (single) ObjStm's header
    stm_nums = {v[0] for v in objstm_entries.values()}
    assert len(stm_nums) == 1
    stm_num = stm_nums.pop()
    spos = data.index(f"{stm_num} 0 obj".encode())
    sdct = data[spos:data.index(b"stream\n", spos)]
    first = int(re.search(rb"/First (\d+)", sdct).group(1))
    slen = int(re.search(rb"/Length (\d+)", sdct).group(1))
    sdata_start = data.index(b"stream\n", spos) + len(b"stream\n")
    sdata = zlib.decompress(data[sdata_start:sdata_start + slen])
    header = [int(x) for x in sdata[:first].split()]
    pairs = {header[2 * i]: header[2 * i + 1] for i in range(len(header) // 2)}
    for num, (stm, idx) in objstm_entries.items():
        assert stm == stm_num
        assert num in pairs
        assert sdata[first + pairs[num]:].startswith(b"<<")


def test_pdf_xref_stream_in_dispatch_corpus():
    """The corpus mixes ~20% xref-stream PDFs; they must extract ok (or
    route to the honest quarantines) through the full dispatcher."""
    from cc_extract.corpusgen import gen_corpus

    seen_15 = 0
    for r in gen_corpus(800):
        if not r["html"].startswith(b"%PDF-1.5"):
            continue
        seen_15 += 1
        res = extract_document(r["html"], r["url"])
        assert res["fmt"] == "pdf"
        assert res["status"] in ("ok", "ok_ocr", "needs_ocr")
        if res["status"] == "ok":
            assert len(res["text"]) > 20
    assert seen_15 >= 10, f"only {seen_15} xref-stream PDFs in 800 docs"


# --------------------------------------------------- baseline JPEG (X14)

def test_jpeg_round_trip_ocr():
    """Writer/reader closed loop over a REAL baseline JFIF: render text,
    encode (FDCT + Annex K Huffman), decode with the independent T.81
    decoder, recognize.  Near-lossless quant keeps pixel error far under
    the 128 binarization threshold."""
    from cc_extract.corpusgen import _jpeg_gray
    from cc_extract.extractors.jpeg import decode_jpeg_gray
    from cc_extract.glyphs import render_raster, ocr_raster

    text = "BASELINE JFIF 0123456789.\nSECOND SCAN LINE"
    w, h, raster = render_raster(text)
    payload = _jpeg_gray(w, h, bytes(raster))
    assert payload.startswith(b"\xff\xd8") and payload.endswith(b"\xff\xd9")
    w2, h2, out = decode_jpeg_gray(payload)
    assert (w2, h2) == (w, h)
    assert max(abs(a - b) for a, b in zip(raster, out)) < 32
    assert ocr_raster(w2, h2, out) == text


def test_jpeg_dispatch_ok_ocr():
    from cc_extract.corpusgen import _jpeg_gray
    from cc_extract.glyphs import render_raster

    w, h, raster = render_raster("DISPATCH ME")
    res = extract_document(_jpeg_gray(w, h, bytes(raster)), "https://x/scan.jpg")
    assert (res["fmt"], res["status"]) == ("image", "ok_ocr")
    assert res["text"] == "DISPATCH ME"


def test_jpeg_unsupported_and_garbage_quarantine():
    from cc_extract.corpusgen import _jpeg_gray
    from cc_extract.extractors.jpeg import decode_jpeg_gray
    from cc_extract.extractors.ocr import OcrError
    from cc_extract.glyphs import render_raster
    import pytest

    w, h, raster = render_raster("X")
    good = _jpeg_gray(w, h, bytes(raster))

    # progressive SOF2 -> honest raise (no silent wrong decode)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(OcrError):
        decode_jpeg_gray(prog)
    # truncated scan -> raise
    with pytest.raises(OcrError):
        decode_jpeg_gray(good[: len(good) // 2])
    # dispatcher: garbage JFIF -> needs_ocr quarantine row
    res = extract_document(b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + b"\x55" * 200,
                           "https://x/garbage.jpg")
    assert (res["fmt"], res["status"]) == ("image", "needs_ocr")


# ------------------------------------------- ToUnicode CMaps / Identity-H

def test_parse_tounicode_forms():
    """bfchar, incremental bfrange, and array-destination bfrange."""
    from cc_extract.extractors.pdf import _parse_tounicode

    cmap = b"""/CIDInit /ProcSet findresource begin
begincmap
2 beginbfchar
<0001> <0416>
<0002> <00480069>
endbfchar
1 beginbfrange
<0030> <0032> <0061>
endbfrange
1 beginbfrange
<0040> <0041> [<0058> <0059>]
endbfrange
endcmap"""
    m = _parse_tounicode(cmap)
    assert m[1] == "Ж"
    assert m[2] == "Hi"          # multi-code-unit destination
    assert (m[0x30], m[0x31], m[0x32]) == ("a", "b", "c")  # incremental
    assert (m[0x40], m[0x41]) == ("X", "Y")                # array form


def test_pdf_identity_h_with_font_switching():
    """One page mixing a simple latin-1 font (/F1, no ToUnicode) and a
    composite Identity-H font (/F2) — the Tf state machine must decode
    each string through the font active at paint time."""
    import zlib
    from cc_extract.extractors.pdf import extract_pdf

    cmap = (b"begincmap\n2 beginbfchar\n<0001> <0414>\n<0002> <0410>\n"
            b"endbfchar\nendcmap")
    content = (b"BT /F1 12 Tf 72 720 Td (latin part) Tj 0 -14 Td\n"
               b"/F2 12 Tf <00010002> Tj 0 -14 Td\n"
               b"/F1 12 Tf (back to latin) Tj ET")
    comp = zlib.compress(content)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
        b"/Resources << /Font << /F2 6 0 R >> >> /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(cmap)).encode()
        + b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n"
        b"6 0 obj\n<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
        b"/ToUnicode 5 0 R >>\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF"
    )
    assert extract_pdf(pdf) == "latin part\nДА\nback to latin"


def test_pdf_identity_h_corpus_round_trip():
    """Corpus Identity-H PDFs (~12%) extract non-latin text through both
    serialization layouts; digits ride the bfrange mapping."""
    import random
    from cc_extract.corpusgen import _gen_pdf
    from cc_extract.extractors.pdf import extract_pdf

    found = 0
    for seed in range(120):
        p = _gen_pdf(random.Random(seed))
        if b"/Identity-H" not in p:
            continue
        found += 1
        t = extract_pdf(p)
        assert any(ord(c) > 0x400 for c in t), t[:80]
    assert found >= 5, f"only {found} Identity-H PDFs in 120 seeds"


def test_scanned_pdf_with_dctdecode_jpeg_ocr():
    """Scanner-style PDFs embedding the page raster as a /DCTDecode JPEG
    XObject must flow through OCR-lite like Flate ones do."""
    import random
    from cc_extract.corpusgen import _gen_pdf

    found = 0
    for seed in range(4000):
        p = _gen_pdf(random.Random(seed))
        if b"/DCTDecode" not in p:
            continue
        found += 1
        res = extract_document(p, "https://x/scan.pdf")
        assert (res["fmt"], res["status"]) == ("pdf", "ok_ocr"), res["error"]
        assert len(res["text"]) > 10
        if found >= 3:
            break
    assert found >= 1, "no DCTDecode scanned PDF generated in 4000 seeds"


# ------------------------------------------------- fast HTML scanner (X1)

def _html_blocks_stdlib(doc: str):
    from cc_extract.extractors.html import _BlockWalkerStdlib
    w = _BlockWalkerStdlib()
    w.feed(doc)
    w.close()
    w.state.finish()
    return w.state.blocks


def _html_blocks_fast(doc: str):
    from cc_extract.extractors.html import _BlockState, _scan_html
    st = _BlockState()
    _scan_html(doc, st)
    return st.blocks


def test_html_fast_scanner_matches_stdlib_on_corpus():
    """The production scanner must emit block-for-block identical output
    to the stdlib html.parser reference on every corpus HTML doc."""
    from cc_extract.extractors.charset import decode_bytes

    n = 0
    for r in gen_corpus(600):
        head = r["html"][:200].lstrip()[:9].lower()
        if not head.startswith((b"<!doctype", b"<html")):
            continue
        n += 1
        doc = decode_bytes(r["html"], None)
        assert _html_blocks_fast(doc) == _html_blocks_stdlib(doc)
    assert n > 200


def test_html_fast_scanner_edge_cases():
    cases = [
        # comment containing tags
        "<p>keep</p><!-- <div>not a tag</div> --><p>also</p>",
        # script with markup inside a string (raw-text element)
        '<p>a</p><script>var s = "</p><div>";</script><p>b</p>',
        "<p>a</p><style>p > a { color: red }</style><p>b</p>",
        # quoted '>' inside an attribute value
        '<p><a href="x>y">link text here</a> plus trailing words</p>',
        # self-closing, uppercase, literal '<' in text, entities
        "<P>One<BR/>Two &amp; 3 < 4</P>",
        # malformed end tag, unterminated tag at EOF
        "<p>ok</p></ huh><div>tail",
        "<p>ok</p><a href=",
        # doctype + processing instruction
        "<!DOCTYPE html><?xml version='1'?><p>body text</p>",
    ]
    for doc in cases:
        assert _html_blocks_fast(doc) == _html_blocks_stdlib(doc), doc


def _scan_blocks_event_twin(doc: str):
    from cc_extract.extractors.html import _BlockStateSpans, _scan_html
    st = _BlockStateSpans()
    _scan_html(doc, st)
    return st.blocks, st.spans


def test_scan_blocks_matches_event_scanner():
    """The inlined production scanner (_scan_blocks) must be block- AND
    span-identical to the event-driven walker feeding _BlockStateSpans,
    over corpus HTML plus the adversarial edge cases."""
    from cc_extract.extractors.charset import decode_bytes
    from cc_extract.extractors.html import _scan_blocks

    n = 0
    for r in gen_corpus(600):
        head = r["html"][:200].lstrip()[:9].lower()
        if not head.startswith((b"<!doctype", b"<html")):
            continue
        n += 1
        doc = decode_bytes(r["html"], None)
        assert _scan_blocks(doc, want_spans=True) == \
            _scan_blocks_event_twin(doc)
    assert n > 200
    cases = [
        "<p>keep</p><!-- <div>not a tag</div> --><p>also</p>",
        '<p>a</p><script>var s = "</p><div>";</script><p>b</p>',
        "<p>a</p><style>p > a { color: red }</style><p>b</p>",
        '<p><a href="x>y">link text here</a> plus trailing words</p>',
        "<P>One<BR/>Two &amp; 3 < 4</P>",
        "<p>ok</p></ huh><div>tail",
        "<p>ok</p><a href=",
        "<!DOCTYPE html><?xml version='1'?><p>body text</p>",
        # self-closing blacklisted tag (net-zero skip depth)
        "<p>a</p><nav/><p>b still visible</p>",
        # nav subtree skipped, anchors inside and out
        '<nav><a href="/">home</a></nav><p><a href="x">in</a> out</p>',
        # script without a close tag: skipped to EOF
        "<p>seen</p><script>var x = 1; // no close",
        "<p>seen</p><script>var x = 1;</script",
        # unterminated comment / PI / start tag: rest flushed as data
        "<p>a</p><!-- never closed <p>gone",
        "<p>a</p><?php echo; no close",
        '<p>a</p><div class="x',
        # unquoted-attr trailing slash is NOT self-closing (veto)
        "<p>x<div data-r=1/>y</p>",
        # charrefs split across segments by inline tags
        "<p>&lt;tag&gt; one<b>&amp;</b> two&#33;</p>",
        # block tag storm (empty-state flush guard)
        "<table><tr><td></td></tr><tr></tr></table><p>t</p>",
        # whitespace-only segments must not open a span
        "<p>  \n\t  <b>word</b>  </p>",
    ]
    for doc in cases:
        assert _scan_blocks(doc, want_spans=True) == \
            _scan_blocks_event_twin(doc), doc


# ----------------------------------------------------- baseline TIFF (X14)

def test_tiff_round_trip_all_variants():
    """Writer/reader closed loop over baseline TIFF: both byte orders,
    both grayscale photometrics (WhiteIsZero inverted), two-strip layout."""
    from cc_extract.corpusgen import _tiff_gray
    from cc_extract.extractors.tiff import decode_tiff_gray
    from cc_extract.glyphs import render_raster, ocr_raster

    text = "TIFF BASELINE 0123456789."
    w, h, raster = render_raster(text)
    for be in (False, True):
        for wiz in (False, True):
            t = _tiff_gray(w, h, bytes(raster), big_endian=be, white_is_zero=wiz)
            w2, h2, out = decode_tiff_gray(t)
            assert (w2, h2) == (w, h)
            assert bytes(out) == bytes(raster)
            assert ocr_raster(w2, h2, out) == text


def test_tiff_dispatch_and_quarantine():
    import struct
    from cc_extract.corpusgen import _tiff_gray
    from cc_extract.glyphs import render_raster

    w, h, raster = render_raster("DISPATCH TIFF")
    res = extract_document(_tiff_gray(w, h, bytes(raster)), "https://x/s.tif")
    assert (res["fmt"], res["status"]) == ("image", "ok_ocr")
    assert res["text"] == "DISPATCH TIFF"
    # LZW-compressed -> honest quarantine
    e = "<"
    ifd = (struct.pack(e + "H", 3)
           + struct.pack(e + "HHI", 256, 3, 1) + struct.pack(e + "HH", 64, 0)
           + struct.pack(e + "HHI", 257, 3, 1) + struct.pack(e + "HH", 64, 0)
           + struct.pack(e + "HHI", 259, 3, 1) + struct.pack(e + "HH", 5, 0)
           + struct.pack(e + "I", 0))
    res = extract_document(b"II*\x00" + struct.pack(e + "I", 8) + ifd, "u.tif")
    assert (res["fmt"], res["status"]) == ("image", "needs_ocr")


def test_pdf_indirect_length_resolves_even_forward():
    """/Length as an indirect int ref must resolve through the object map
    (both reference directions); the endstream-search fallback would
    truncate this uncompressed stream at the literal 'endstream' inside
    its text."""
    from cc_extract.extractors.pdf import extract_pdf

    content = b"BT /F1 12 Tf 72 720 Td (the word endstream appears here) Tj ET"
    for length_first in (True, False):
        len_obj = b"5 0 obj\n" + str(len(content)).encode() + b"\nendobj\n"
        stream_obj = (
            b"4 0 obj\n<< /Length 5 0 R >>\nstream\n" + content
            + b"\nendstream\nendobj\n"
        )
        body = (len_obj + stream_obj) if length_first else (stream_obj + len_obj)
        pdf = (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
            + body + b"trailer\n<< /Root 1 0 R >>\n%%EOF"
        )
        assert extract_pdf(pdf) == "the word endstream appears here", length_first


def test_tiff_packbits_round_trip():
    """PackBits (Compression 32773) writer/reader closed loop, plus codec
    round-trip on adversarial rows."""
    import random
    from cc_extract.corpusgen import _packbits, _tiff_gray
    from cc_extract.extractors.tiff import _unpackbits, decode_tiff_gray
    from cc_extract.glyphs import render_raster, ocr_raster

    rng = random.Random(5)
    for _ in range(100):
        row = bytes(
            rng.choice([0, 0, 255, 255, 255, rng.randrange(256)])
            for _ in range(rng.randrange(1, 300))
        )
        assert _unpackbits(_packbits(row)) == row

    text = "PACKBITS 32773."
    w, h, raster = render_raster(text)
    t = _tiff_gray(w, h, bytes(raster), packbits=True)
    w2, h2, out = decode_tiff_gray(t)
    assert bytes(out) == bytes(raster)
    assert ocr_raster(w2, h2, out) == text
    res = extract_document(t, "https://x/pb.tif")
    assert (res["fmt"], res["status"]) == ("image", "ok_ocr")


# ------------------------------------------------------ GIF / LZW (X14)

def test_gif_round_trip_and_dispatch():
    """Writer/reader closed loop over GIF87a with real variable-width LZW
    (dict growth + the 4096 reset exercised by a random raster)."""
    import random
    from cc_extract.corpusgen import _gif_gray
    from cc_extract.extractors.gif import decode_gif_gray
    from cc_extract.glyphs import render_raster, ocr_raster

    text = "GIF LZW 0123456789."
    w, h, raster = render_raster(text)
    g = _gif_gray(w, h, bytes(raster))
    w2, h2, out = decode_gif_gray(g)
    assert (w2, h2) == (w, h)
    assert bytes(out) == bytes(raster)  # ink/bg raster is already binary
    assert ocr_raster(w2, h2, out) == text
    res = extract_document(g, "https://x/scan.gif")
    assert (res["fmt"], res["status"]) == ("image", "ok_ocr")
    assert res["text"] == text

    # 60k random pixels: > 4096 LZW codes, forces the CLEAR/reset path
    rng = random.Random(9)
    rnd = bytes(rng.choice([0, 255]) for _ in range(300 * 200))
    w2, h2, out = decode_gif_gray(_gif_gray(300, 200, rnd))
    assert bytes(out) == rnd


def test_gif_interlace_color_local_table_variants():
    """Round 4: interlaced row order, color palettes (collapsed to BT.601
    luminance on the decode side) and local color tables all decode to
    the same OCR text as the plain variant."""
    from cc_extract.corpusgen import _gif_gray
    from cc_extract.extractors.gif import decode_gif_gray
    from cc_extract.glyphs import render_raster, ocr_raster

    text = "INTERLACE AND COLOR 42."
    w, h, raster = render_raster(text)
    for interlaced in (False, True):
        for color in (False, True):
            for local in (False, True):
                g = _gif_gray(w, h, bytes(raster), interlaced=interlaced,
                              color=color, local_table=local)
                w2, h2, out = decode_gif_gray(g)
                assert (w2, h2) == (w, h)
                assert ocr_raster(w2, h2, out) == text, (interlaced, color, local)
    res = extract_document(
        _gif_gray(w, h, bytes(raster), interlaced=True, color=True),
        "https://x/scan.gif")
    assert (res["fmt"], res["status"]) == ("image", "ok_ocr")
    assert res["text"] == text


def test_gif_truncated_is_quarantined():
    from cc_extract.corpusgen import _gif_gray
    from cc_extract.glyphs import render_raster

    w, h, raster = render_raster("X")
    g = _gif_gray(w, h, bytes(raster))
    res = extract_document(g[:40], "https://x/t.gif")
    assert (res["fmt"], res["status"]) == ("image", "needs_ocr")


# Real GIFs produced by reference encoders (shipped with CPython's idlelib
# and the Tix/Tcl distributions on this host).  They pin the LZW decoder to
# the STANDARD late width-change convention — a writer/reader pair that
# shares a quirk (the round-3 TIFF-style EarlyChange bug) round-trips its
# own corpus but fails every one of these.  Expected hashes were computed
# once after validating all 37 reference GIFs on this host decode cleanly.
_REAL_GRAY_GIFS = {
    # name: (base64 bytes, width, height, md5 of decoded grayscale raster)
    "tix_info": (
        "R0lGODlhIAAgAIAAAAAAAP///yH5BAEAAAAALAAAAAAgACAAAAJ2jI+pywsPYUPA1BBbxlbP"
        "dHnPp4xcSXrgyUhqyJabg7aRSR+wfE/hDroBKbpPz1cZ8lLJlLOjfKKiFqEx5rD6sLxZixs8"
        "iozaMVL8BevKOXUVXXNj2HG3MIrrZOHFOoXe10d1BZbHpAQzSBS4OIdnkkhyZ7hQAAA7",
        32, 32, "c01a1f3fcf54b1f2f12ea33a8e047551"),
    "tix_srcfile": (
        "R0lGODlhDAAMAKEAAL+/vwAAAOjo6AAAACH5BAEAAAAALAAAAAAMAAwAAAIgRI4Ha+IfWHsO"
        "rUBpnAhegVXVF2pkBp5iyh3ehG7JHBUAOw==",
        12, 12, "22f947634657cf9137463f02fe5e7c23"),
    "idle_minusnode": (
        "R0lGODlhCwALAPEDAP///39/fwAAAMDAwCH5BAUAAAMALAAAAAALAAsAAAIcnI8Wy6wAIwhP"
        "QjqCvU94P1UWpm3kFmZNk7RDAQA7",
        11, 11, "f87145ea094ac717cc18450d83600886"),
    "idle_plusnode": (
        "R0lGODlhCwALAPEDAP///39/fwAAAMDAwCH5BAUAAAMALAAAAAALAAsAAAIfnI8Wy6wAIwgP"
        "ikhHiBfmLYThVAEdqXFYKX1Nk8RDAQA7",
        11, 11, "74099a4de63c31c8da5235fb463dbbbb"),
}


def test_gif_real_grayscale_fixtures_decode():
    """decode_gif_gray end-to-end on real reference-encoder grayscale GIFs:
    dimensions and full raster hash must match (ADVICE r3 high: the shared
    EarlyChange quirk made every real GIF fail at the first width boundary)."""
    import base64
    import hashlib
    from cc_extract.extractors.gif import decode_gif_gray

    for name, (b64, ew, eh, eraster_md5) in _REAL_GRAY_GIFS.items():
        payload = base64.b64decode(b64)
        w, h, raster = decode_gif_gray(payload)
        assert (w, h) == (ew, eh), name
        assert hashlib.md5(bytes(raster)).hexdigest() == eraster_md5, name


def test_gif_real_color_lzw_layer():
    """The raw LZW layer on a real 64-color GIF (Tcl 'powered by' logo,
    mcs=6): the stream crosses the 7->8->9-bit width boundaries, so any
    off-by-one in the width-change rule desyncs and either raises or
    produces the wrong pixel count/hash."""
    import base64
    import hashlib
    import struct
    from cc_extract.extractors.gif import _lzw_decode

    payload = base64.b64decode(_REAL_COLOR_GIF_B64)
    assert payload[:6] == b"GIF89a"
    _sw, _sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13 + 3 * (2 << (flags & 0x07))
    while payload[pos] == 0x21:  # skip extension blocks
        pos += 2
        while payload[pos] != 0:
            pos += 1 + payload[pos]
        pos += 1
    assert payload[pos] == 0x2C
    _l, _t, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
    assert not (iflags & 0xC0)
    pos += 10
    mcs = payload[pos]
    pos += 1
    sub = bytearray()
    while payload[pos] != 0:
        ln = payload[pos]
        sub += payload[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    idx = _lzw_decode(mcs, bytes(sub), w * h)
    assert (w, h, mcs) == (64, 100, 6)
    assert len(idx) == w * h
    assert hashlib.md5(bytes(idx)).hexdigest() == "697318279693d3d34bf82cbb306ec88d"

    # round 4: the color path decodes end-to-end too (palette -> BT.601
    # luminance raster)
    from cc_extract.extractors.gif import decode_gif_gray

    fw, fh, raster = decode_gif_gray(payload)
    assert (fw, fh) == (64, 100)
    assert hashlib.md5(bytes(raster)).hexdigest() == "1609ac33825c11b300153c3b9a4a3379"


_REAL_COLOR_GIF_B64 = (
    "R0lGODlhQABkAPUAAP//////zP//mf//AP/MzP/Mmf/MAP+Zmf+ZZv+ZAMz//8zM/8zMzMyZzMyZ"
    "mcyZZsyZAMxmZsxmM8xmAMwzM8wzAJnMzJmZzJmZmZlmmZlmZplmM5kzM5kzAGaZzGaZmWZmzGZm"
    "mWZmZmYzZmYzMzNmzDNmmTMzmTMzZgAzmQAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAACH+BSAtZGwtACH5BAEKAAIALAAAAABA"
    "AGQAAAb+QIFwSCwaj0UE4hGJIJ/QKPHBjEgklIp2y+1qndLw0Esum70Scfi8NUy4k8EAwu5eKdkz"
    "5Vk3GLpyA391hHZ8ZxADb22ChY5caUhsBgNwjY+YYEeTCVx+mKAPh2ZuW3GLoI5QEmeDWp9sEQQA"
    "BXmYq61cimyzAL4EqbhmnVqJZxK9FyUlDA+gwmWoBsRlAQAXKdnZGM9PrGaou2WzINrmHLdPEYRx"
    "ZgUAJebaKN1I63UJrl0PACby2qD2qCM0jYwEAOX+pUCHKRISBITEdSGATeEIMhMgoIJQSovDIxDr"
    "VPISYYHCFPTIUNJHaQuHEiA8SGLTzguBeAoZeokzslj+TxLaZp6ZoO8Lg5MXo13SQnQL0GxCwVHb"
    "cvPk0DlwUI0IuokmHS4UTOasIAHBLGBbEqGqsBZFNhNRo62t8KDiPxIjTIC4oACArXxn3KYAERfj"
    "3AL+TpoLAeBbBQNfywiW2RUTAcXyIjTe0rMM18qPjmLWxu8bRzafjaSyixnFAQBt5npJXQSUhISj"
    "SRBA+5gNh7ejHEnAOZoCAGdsZXf5nYIy6EISEmM+wS/P1DLMoaSSrngEgQKm6jzVDop7CvMLNzsa"
    "H9zRCXnESYN/tPUENEeCUWowj4I3/hQl3FfIVtmMgME/IdzziFvOHeFYHcg9tRBr2WiQiltRPMjL"
    "ARX+MJdCBxbIkxQoUAl4xiwMhJDNCRSEOE8qWpQ4UCHkJIaCBKx1AGMF50VhIY2iZUPCAx7MQ0ID"
    "ASDnSAeDRbGBIxSZQ4IDRZqDgnqO/CaFTnUUwBoHBOCWDWOgMLmlIwVUmU0FVZnzgX+FmBkFl2wc"
    "cCBA/chzwXyYpHBmIQjcuSYA75nDAIegBDinIw84oM0JFRAqDwFKPtIgEnQe42g2KBj3DwEaFrKG"
    "IxQcMM9B8vQXKiGjoinYjQCIeMCqdbRayAGvoiolFcFIgckBBMIqDwcI0MqGFB5g8oAGnOqqDQd8"
    "pgMFCA0xi5Kz2ZQKoxQmgLKpsPNUKu0TkGbSbKz+2pCghS2PSFHuIxK8hwIH6K4pwQHiFiIKFClh"
    "8t4J9BY6ggTv5EvIvk/0S182AQs5AgoWKPiIJkgoXMc3T9EbXwoWGHsMFB5YzAYyEmS8wMYMwPiR"
    "ESWMWIgvVXLAgJgpwCkcFCa4TMgBuMmsJkrRwgtFCjrXQUGQU7KGgcSPCIRECuoqWyUKDrCW8o5D"
    "R42JA/GgEEGQIiC67RNQw+iAPxKIlYIDO2rxRJFag5KBCfQ223YFT5STKX1g+rP3uEX4fTebGcSN"
    "9dMLNSQuvoO7jfjfZwTwYARi30124pDUITkkNo99BMNcyKK5hp33+vmHXBwA6hb3NsHF5lyUXk/+"
    "EVXquIXoWwSQhe65azhr4wgcgZPtX/B2kEevaxhBSHcHb0RiXeBOFmxewL4FBbI/gjARAIW+uhar"
    "V2o9VY1TPET3XDwweQS2SOB6F7/fbb4Q6A9uxeAr079m48jfnb8A9eOf/4yQkHeRoQMc4AAJ8IIC"
    "FBTqBBBsoARHQMERLHCBCcxgAjvAQTSwjFMJXODDHDiaEppQHlEo1AlXyEIUDq2FMGxhFGJIwxPO"
    "UB4q1AZ6FAJBc+QwBT/8oYwQpw0QMCBIJljABVw0GA848QLSWYCajIhEKWrDAwxQG21oJw8qXrEc"
    "QUoBAyxggTAqwC5GZGIS1eRED9BsWl1kDQhoLJBEc1jgAgywmgpBoEQdWkCFTrTAxnAmDxNszAN0"
    "NAcIYMKdC9jFkGoywQXUVIIL0MxPl6uhJhXzwk160oVqUIMHSrBDTYbylEZwYwmEuEJUuhJkICjl"
    "P15JSzGM0jxwqaUudzmEIAAAOw=="
)


def test_tiff_lzw_code_sequence_matches_spec():
    """Hand-derived TIFF 6.0 §13 example: the encoder must emit exactly
    [Clear, 'a', code(aa), 'b', code(bb), EOI] for 'aaabbb', 9-bit
    MSB-first — pinning Clear/EOI values, table growth order and packing
    direction against the spec rather than the decoder twin."""
    from cc_extract.corpusgen import _tiff_lzw_encode

    data = _tiff_lzw_encode(b"aaabbb")
    # unpack 9-bit MSB-first codes independently of both implementations
    acc = 0
    nbits = 0
    codes = []
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        if nbits >= 9:
            codes.append((acc >> (nbits - 9)) & 0x1FF)
            nbits -= 9
    assert codes[:6] == [256, ord("a"), 258, ord("b"), 260, 257]


def test_tiff_lzw_round_trip_all_variants():
    """LZW writer/reader closed loop: both byte orders, predictor 1/2,
    WhiteIsZero, plus a raster long enough to cross the 9->10-bit width
    boundary (the EarlyChange seam)."""
    import random
    from cc_extract.corpusgen import _tiff_gray
    from cc_extract.extractors.tiff import decode_tiff_gray
    from cc_extract.glyphs import render_raster, ocr_raster

    text = "TIFF LZW 0123456789."
    w, h, raster = render_raster(text)
    for be in (False, True):
        for pred in (1, 2):
            for wiz in (False, True):
                t = _tiff_gray(w, h, bytes(raster), big_endian=be,
                               white_is_zero=wiz, lzw=True, predictor=pred)
                w2, h2, out = decode_tiff_gray(t)
                assert (w2, h2) == (w, h)
                assert bytes(out) == bytes(raster), (be, pred, wiz)
                assert ocr_raster(w2, h2, out) == text

    # random raster: > 256 distinct pairs forces width growth; big enough
    # to cross 511 (9->10) and 1023 (10->11)
    rng = random.Random(11)
    rnd = bytes(rng.randrange(256) for _ in range(200 * 120))
    t = _tiff_gray(200, 120, rnd, lzw=True)
    _, _, out = decode_tiff_gray(t)
    assert bytes(out) == rnd
    t = _tiff_gray(200, 120, rnd, lzw=True, predictor=2)
    _, _, out = decode_tiff_gray(t)
    assert bytes(out) == rnd


def test_tiff_lzw_4094_reset():
    """A raster with enough entropy to fill the 4094-entry table forces
    the encoder's mid-stream Clear; the decoder must resynchronize."""
    import random
    from cc_extract.corpusgen import _tiff_lzw_encode
    from cc_extract.extractors.tiff import _lzw_decode_tiff

    rng = random.Random(5)
    data = bytes(rng.randrange(256) for _ in range(40000))
    enc = _tiff_lzw_encode(data)
    assert _lzw_decode_tiff(enc, len(data)) == data


def test_tiff_lzw_dispatch_ok_ocr():
    from cc_extract.corpusgen import _tiff_gray
    from cc_extract.glyphs import render_raster

    text = "LZW DISPATCH CHECK."
    w, h, raster = render_raster(text)
    t = _tiff_gray(w, h, bytes(raster), lzw=True, predictor=2)
    res = extract_document(t, "https://x/scan.tif")
    assert (res["fmt"], res["status"]) == ("image", "ok_ocr")
    assert res["text"] == text


def test_tiff_ccitt_still_quarantined():
    import struct as _s
    e = "<"
    ifd = (_s.pack(e + "H", 3)
           + _s.pack(e + "HHI", 256, 3, 1) + _s.pack(e + "HH", 64, 0)
           + _s.pack(e + "HHI", 257, 3, 1) + _s.pack(e + "HH", 64, 0)
           + _s.pack(e + "HHI", 259, 3, 1) + _s.pack(e + "HH", 4, 0)
           + _s.pack(e + "I", 0))
    payload = b"II*\x00" + _s.pack(e + "I", 8) + ifd
    res = extract_document(payload, "https://x/fax.tif")
    assert (res["fmt"], res["status"]) == ("image", "needs_ocr")


def test_pdf_differences_encoding():
    """Simple font with /Encoding /Differences: bytes 0x80.. must map
    through the AGL glyph names back to the accented chars; unmapped
    bytes keep the latin-1 path (PDF 32000-1 §9.6.6)."""
    import zlib
    from cc_extract.extractors.pdf import extract_pdf

    content = (
        b"BT /F1 12 Tf 72 720 Td (caf\x80 touch\x80 d\x81j\x82 "
        b"stra\x83e se\x84or gar\x85on plain.) Tj ET"
    )
    comp = zlib.compress(content)
    objs = []

    def add(body):
        objs.append(body)
        return len(objs)

    cid = add(b"<< /Length " + str(len(comp)).encode()
              + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream")
    f1 = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
             b" /Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding"
             b" /Differences [ 128 /eacute /agrave /agrave /germandbls"
             b" /ntilde /ccedilla ] >> >>")
    pages = add(b"PLACEHOLDER")
    page = add(f"<< /Type /Page /Parent {pages} 0 R /MediaBox [0 0 612 792] "
               f"/Resources << /Font << /F1 {f1} 0 R >> >> "
               f"/Contents {cid} 0 R >>".encode())
    objs[pages - 1] = f"<< /Type /Pages /Count 1 /Kids [{page} 0 R] >>".encode()
    cat = add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
    buf = bytearray(b"%PDF-1.4\n")
    for i, body in enumerate(objs, start=1):
        buf += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    buf += f"trailer\n<< /Root {cat} 0 R >>\n%%EOF".encode()

    text = extract_pdf(bytes(buf))
    # 0x80->eacute 0x81->agrave(!) 0x82->agrave 0x83->germandbls ...
    assert text == "café touché dàjà straße señor garçon plain."


def test_pdf_differences_corpus_round_trip():
    """Corpus diff-font PDFs (forced via the rng draws) extract to the
    same text a plain-encoding PDF of the same seed would."""
    import random
    from cc_extract.corpusgen import _gen_pdf, PDF_DIFF_FRACTION
    from cc_extract.extractors.pdf import extract_pdf

    found = 0
    for i in range(400):
        rng = random.Random(990000 + i)
        peek = random.Random(990000 + i)
        _ = peek.random()           # xref draw
        uni = peek.random() < 0.12  # unicode_font draw
        diff = peek.random() < PDF_DIFF_FRACTION and not uni
        empty = peek.random() < 0.03
        if not diff or empty or uni:
            continue
        payload = _gen_pdf(rng)
        text = extract_pdf(payload)
        assert text and "\x80" not in text and "\x85" not in text
        found += 1
        if found >= 5:
            break
    assert found >= 5, "rng never produced a diff-font pdf in 400 draws"


def test_glyph_names_table():
    from cc_extract.extractors.pdf import _glyph_to_char

    assert _glyph_to_char("eacute", 0x80) == "é"
    assert _glyph_to_char("Euro", 0x80) == "€"
    assert _glyph_to_char("uni0416", 0x80) == "Ж"
    assert _glyph_to_char("u1F600", 0x80) == "😀"
    assert _glyph_to_char("nosuchglyph", 0x41) == "A"  # latin-1 fallback


def test_jpeg_color_round_trip_all_samplings():
    """Round 4: YCbCr color JPEGs (content-derived chroma tint) decode to
    the Y plane across 4:2:0 / 4:2:2 / 4:4:4 — chroma blocks are entropy
    decoded for sync and discarded; the OCR raster must survive."""
    from cc_extract.corpusgen import _jpeg_color
    from cc_extract.extractors.jpeg import decode_jpeg_gray
    from cc_extract.glyphs import render_raster, ocr_raster

    text = "COLOR JPEG 420 422 444."
    w, h, raster = render_raster(text)
    for samp in [(2, 2), (2, 1), (1, 1), (1, 2)]:
        j = _jpeg_color(w, h, bytes(raster), sampling=samp)
        w2, h2, out = decode_jpeg_gray(j)
        assert (w2, h2) == (w, h), samp
        assert ocr_raster(w2, h2, out) == text, samp


def test_jpeg_color_dispatch_ok_ocr():
    from cc_extract.corpusgen import _jpeg_color
    from cc_extract.glyphs import render_raster

    text = "COLOR DISPATCH 7."
    w, h, raster = render_raster(text)
    res = extract_document(_jpeg_color(w, h, bytes(raster)), "https://x/scan.jpg")
    assert (res["fmt"], res["status"]) == ("image", "ok_ocr")
    assert res["text"] == text


def test_jpeg_color_desync_guard():
    """A color JPEG whose SOS references a missing chroma table must
    raise (quarantine), not silently decode garbage."""
    import pytest
    from cc_extract.corpusgen import _jpeg_color
    from cc_extract.extractors.jpeg import decode_jpeg_gray
    from cc_extract.extractors.ocr import OcrError
    from cc_extract.glyphs import render_raster

    w, h, raster = render_raster("X")
    j = bytearray(_jpeg_color(w, h, bytes(raster)))
    # flip the chroma DHT class/id byte so table (0,1) vanishes
    i = bytes(j).find(b"\xff\xc4")
    assert i != -1
    seg_end = i + 4 + int.from_bytes(j[i + 2 : i + 4], "big") - 2
    # find the third table header (chroma DC, class 0 id 1) inside DHT
    # simpler: truncate the DHT to only the two luma tables
    with pytest.raises(OcrError):
        # remove chroma tables by copying a gray-style DHT over: easiest
        # robust corruption — reference a bogus table id in SOS instead
        sos = bytes(j).find(b"\xff\xda")
        j2 = bytearray(j)
        j2[sos + 6 + 3] = 0x33  # comp 2's td/ta -> nonexistent tables
        decode_jpeg_gray(bytes(j2))


def test_tiff_rgb_round_trip():
    """Round 4: RGB TIFFs (SamplesPerPixel 3, Photometric 2) collapse to
    BT.601 luminance; per-channel Predictor 2 and both compressions."""
    from cc_extract.corpusgen import _tiff_gray
    from cc_extract.extractors.tiff import decode_tiff_gray
    from cc_extract.glyphs import render_raster, ocr_raster

    text = "RGB TIFF 99."
    w, h, raster = render_raster(text)
    for kw in [dict(rgb=True), dict(rgb=True, lzw=True),
               dict(rgb=True, lzw=True, predictor=2),
               dict(rgb=True, packbits=True, big_endian=True)]:
        t = _tiff_gray(w, h, bytes(raster), **kw)
        w2, h2, out = decode_tiff_gray(t)
        assert (w2, h2) == (w, h), kw
        assert ocr_raster(w2, h2, out) == text, kw
    res = extract_document(
        _tiff_gray(w, h, bytes(raster), rgb=True, lzw=True, predictor=2),
        "https://x/scan.tif")
    assert (res["fmt"], res["status"]) == ("image", "ok_ocr")
    assert res["text"] == text

def test_jpeg_restart_markers_round_trip():
    """Round 4: DRI/RSTn restart intervals — at each boundary the decoder
    byte-aligns past the marker, resets all DC predictors, and verifies
    the modulo-8 marker sequence.  Both writers exercise it (gray +
    color, all samplings); interval=1 restarts at every MCU, the
    harshest case for predictor-reset correctness."""
    from cc_extract.corpusgen import _jpeg_color, _jpeg_gray
    from cc_extract.extractors.jpeg import decode_jpeg_gray
    from cc_extract.glyphs import render_raster, ocr_raster

    text = "RESTART MARKERS 0123456789.\nSECOND SCAN LINE"
    w, h, raster = render_raster(text)
    for ri in (1, 2, 7, 100):
        j = _jpeg_gray(w, h, bytes(raster), restart_interval=ri)
        assert j.count(b"\xff\xdd") == 1  # DRI present
        w2, h2, out = decode_jpeg_gray(j)
        assert (w2, h2) == (w, h) and ocr_raster(w2, h2, out) == text, ri
    # >8 restarts proves the mod-8 sequence wraps correctly
    j = _jpeg_gray(w, h, bytes(raster), restart_interval=1)
    assert sum(j.count(bytes([0xFF, 0xD0 + m])) for m in range(8)) > 8
    for samp in [(2, 2), (2, 1), (1, 1)]:
        j = _jpeg_color(w, h, bytes(raster), sampling=samp, restart_interval=3)
        w2, h2, out = decode_jpeg_gray(j)
        assert ocr_raster(w2, h2, out) == text, samp


def test_jpeg_restart_marker_out_of_sequence_raises():
    """A corrupted restart sequence (RST number skipped) must raise, not
    desync into garbage pixels."""
    import pytest
    from cc_extract.corpusgen import _jpeg_gray
    from cc_extract.extractors.jpeg import decode_jpeg_gray
    from cc_extract.extractors.ocr import OcrError
    from cc_extract.glyphs import render_raster

    w, h, raster = render_raster("SEQUENCE CHECK LINE")
    j = bytearray(_jpeg_gray(w, h, bytes(raster), restart_interval=1))
    i = bytes(j).find(b"\xff\xd0")  # first restart: RST0 -> RST5
    assert i != -1
    j[i + 1] = 0xD5
    with pytest.raises(OcrError):
        decode_jpeg_gray(bytes(j))


def test_tiff_multipage_round_trip():
    """Round 4: the IFD chain — every page decodes, the OCR route joins
    page texts, and the single-page surface still reads page one.  Pages
    may differ in geometry; all compression variants chain."""
    from cc_extract.corpusgen import _tiff_gray
    from cc_extract.extractors.tiff import decode_tiff_gray, decode_tiff_pages
    from cc_extract.glyphs import render_raster, ocr_raster

    t1, t2, t3 = "MULTI PAGE ONE.", "PAGE TWO 22.", "THIRD PAGE 333."
    w1, h1, r1 = render_raster(t1)
    w2, h2, r2 = render_raster(t2)
    w3, h3, r3 = render_raster(t3)
    extra = [(w2, h2, bytes(r2)), (w3, h3, bytes(r3))]
    for kw in [dict(), dict(lzw=True, predictor=2),
               dict(packbits=True, big_endian=True, white_is_zero=True)]:
        t = _tiff_gray(w1, h1, bytes(r1), extra_pages=extra, **kw)
        pages = decode_tiff_pages(t)
        assert [ocr_raster(*p) for p in pages] == [t1, t2, t3], kw
        assert ocr_raster(*decode_tiff_gray(t)) == t1, kw
    res = extract_document(
        _tiff_gray(w1, h1, bytes(r1), extra_pages=extra, lzw=True),
        "https://x/scan.tif")
    assert (res["fmt"], res["status"]) == ("image", "ok_ocr")
    assert res["text"] == t1 + "\n\n" + t2 + "\n\n" + t3


def test_tiff_ifd_cycle_is_quarantined():
    """A hostile IFD chain that loops back on itself must raise (cycle
    guard), which the dispatcher turns into needs_ocr — never a hang."""
    import struct as _s

    import pytest
    from cc_extract.corpusgen import _tiff_gray
    from cc_extract.extractors.ocr import OcrError
    from cc_extract.extractors.tiff import decode_tiff_pages
    from cc_extract.glyphs import render_raster

    w, h, raster = render_raster("CYCLE")
    t = bytearray(_tiff_gray(w, h, bytes(raster)))
    (first_ifd,) = _s.unpack_from("<I", t, 4)
    # next-IFD pointer sits right after the entry array -> point it home
    (n_entries,) = _s.unpack_from("<H", t, first_ifd)
    _s.pack_into("<I", t, first_ifd + 2 + n_entries * 12, first_ifd)
    with pytest.raises(OcrError):
        decode_tiff_pages(bytes(t))
    res = extract_document(bytes(t), "https://x/scan.tif")
    assert (res["fmt"], res["status"]) == ("image", "needs_ocr")


# ------------------------------------------------ progressive JPEG (X14)

def test_jpeg_progressive_round_trip_ocr():
    """Writer/reader closed loop over progressive SOF2 (6-scan gray,
    10-scan color scripts): spectral selection, two-level successive
    approximation, EOB runs, refinement correction bits."""
    from cc_extract.corpusgen import _jpeg_progressive
    from cc_extract.extractors.jpeg import decode_jpeg_gray
    from cc_extract.glyphs import render_raster, ocr_raster

    text = "PROGRESSIVE JFIF 0123456789.\nSECOND SCAN LINE"
    w, h, raster = render_raster(text)
    p = _jpeg_progressive(w, h, bytes(raster))
    assert p.count(b"\xff\xc2") == 1 and p.count(b"\xff\xda") == 6
    w2, h2, out = decode_jpeg_gray(p)
    assert (w2, h2) == (w, h)
    assert ocr_raster(w2, h2, out) == text
    for samp in [(2, 2), (2, 1), (1, 1)]:
        p = _jpeg_progressive(w, h, bytes(raster), color=True, sampling=samp)
        assert p.count(b"\xff\xda") == 10
        w2, h2, out = decode_jpeg_gray(p)
        assert ocr_raster(w2, h2, out) == text, samp


def test_jpeg_progressive_bit_exact_vs_baseline():
    """The progressive path must reconstruct EXACTLY the coefficients the
    baseline path does (same quantization): decoded rasters bit-identical
    across noise (dense AC / ZRL), flat (max EOB runs), gradient, and
    sparse-impulse rasters, gray and color."""
    import random

    from cc_extract.corpusgen import _jpeg_gray, _jpeg_progressive
    from cc_extract.extractors.jpeg import decode_jpeg_gray

    rng = random.Random(7)
    for trial in range(12):
        w, h = rng.randint(1, 60), rng.randint(1, 60)
        kind = trial % 4
        if kind == 0:
            raster = bytes(rng.randrange(256) for _ in range(w * h))
        elif kind == 1:
            raster = bytes([rng.randrange(256)]) * (w * h)
        elif kind == 2:
            raster = bytes(((x * 3 + y * 5) % 256)
                           for y in range(h) for x in range(w))
        else:
            r = bytearray([200]) * (w * h)
            for _ in range(w * h // 37 + 1):
                r[rng.randrange(w * h)] = rng.randrange(256)
            raster = bytes(r)
        _, _, ob = decode_jpeg_gray(_jpeg_gray(w, h, raster))
        _, _, op = decode_jpeg_gray(_jpeg_progressive(w, h, raster))
        assert ob == op, f"trial {trial} {w}x{h} kind {kind}"
        if kind == 0:
            pc = _jpeg_progressive(w, h, raster, color=True,
                                   sampling=rng.choice([(2, 2), (2, 1), (1, 1)]))
            _, _, oc = decode_jpeg_gray(pc)
            assert oc == ob, f"trial {trial} color"


# Real reference-encoder (libjpeg) JPEGs shipped with Spark's mllib test
# data, the nodejs docs and the Rust embedded book on this host: 4
# progressive files (6-10 scans, gray + color, 4:2:2 and 4:4:4) and one
# baseline file with DRI=90 restart intervals.  They pin the decoder to
# the real bitstream grammar — a writer/reader pair sharing a quirk
# round-trips its own corpus but desyncs on every one of these (any
# EOBRUN/refinement/restart error surfaces as bit under/overrun).
# Hashes recorded after validating completion + plausible statistics.
_REAL_JPEGS = {
    # name: (width, height, md5 of decoded grayscale raster)
    "grayscale.jpg": (300, 215, "8cda7b078c8dff9b1b5fd203c2bbd3e5"),          # SOF2 gray, 6 scans
    "thin-white-stripe.jpg": (493, 58, "3055e28e8dc6e07a0013115fa315ed4c"),   # SOF2 color 4:4:4, 7 scans
    "full-white-stripe.jpg": (493, 312, "0802aaf3a4b006e005d9b87f7668e0d4"),  # SOF2 color 4:4:4, 9 scans
    "f3.jpg": (720, 477, "d7a684fb066aee2fb2cad2a2827d9662"),                 # SOF2 color 4:2:2ish (2,1), 10 scans
    "verify.jpeg": (720, 477, "2297982e684857012068ab8e15f04683"),            # SOF0 color, DRI=90 restarts
}


def test_jpeg_real_reference_fixtures_decode():
    import hashlib
    import os

    from cc_extract.extractors.jpeg import decode_jpeg_gray

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    for name, (ew, eh, emd5) in _REAL_JPEGS.items():
        payload = open(os.path.join(fixdir, name), "rb").read()
        w, h, raster = decode_jpeg_gray(payload)
        assert (w, h) == (ew, eh), name
        assert hashlib.md5(bytes(raster)).hexdigest() == emd5, name


def test_jpeg_progressive_dispatch_and_quarantine():
    from cc_extract.corpusgen import _jpeg_progressive
    from cc_extract.glyphs import render_raster

    text = "PROGRESSIVE DISPATCH 7."
    w, h, raster = render_raster(text)
    res = extract_document(_jpeg_progressive(w, h, bytes(raster)),
                           "https://x/scan.jpg")
    assert (res["fmt"], res["status"]) == ("image", "ok_ocr")
    assert res["text"] == text
    # truncating mid-scan must raise -> needs_ocr, never garbage text
    p = _jpeg_progressive(w, h, bytes(raster))
    res = extract_document(p[: int(len(p) * 0.6)], "https://x/scan.jpg")
    assert (res["fmt"], res["status"]) == ("image", "needs_ocr")


# ----------------------------------------------- CCITT Group 4 TIFF (X14)

def test_g4_spec_pinned_bitstreams():
    """The encoder's output checked code-by-code against hand-derived
    T.6/T.4 bitstreams — the closed loop cannot hide a shared table typo
    for these codes.  An all-white page is one V0 bit per row + EOFB; a
    '4 white, 8 black' row is horizontal mode 001 + white-4 (1011) +
    black-8 (000101)."""
    from cc_extract.corpusgen import _g4_encode
    from cc_extract.extractors.ccitt import g4_decode

    enc = _g4_encode(64, 3, bytes(64 * 3))
    bits = "".join(f"{b:08b}" for b in enc)
    assert bits.startswith("111" + "000000000001" * 2)

    row = bytes([0] * 4 + [1] * 8 + [0] * 52)
    enc = _g4_encode(64, 1, row)
    bits = "".join(f"{b:08b}" for b in enc)
    assert bits.startswith("001" + "1011" + "000101")
    assert bytes(g4_decode(enc, 64, 1)) == bytes(
        255 if b == 0 else 0 for b in row)


def test_g4_tiff_round_trip_and_dispatch():
    """Full fax-style page: G4 TIFF (1-bit MinIsWhite, Compression 4)
    encodes the rendered raster ~8x smaller and OCRs back exactly;
    multi-page G4 chains IFDs."""
    from cc_extract.corpusgen import _tiff_gray
    from cc_extract.extractors.tiff import decode_tiff_gray, decode_tiff_pages
    from cc_extract.glyphs import render_raster, ocr_raster

    text = "CCITT GROUP 4 FAX 0123456789.\nSECOND LINE OF THE SCAN"
    w, h, raster = render_raster(text)
    t = _tiff_gray(w, h, bytes(raster), g4=True)
    assert len(t) < w * h // 4  # fax compression actually compresses
    w2, h2, out = decode_tiff_gray(t)
    assert (w2, h2) == (w, h)
    assert ocr_raster(w2, h2, out) == text
    t2 = "G4 PAGE TWO."
    w3, h3, r3 = render_raster(t2)
    pages = decode_tiff_pages(
        _tiff_gray(w, h, bytes(raster), g4=True,
                   extra_pages=[(w3, h3, bytes(r3))]))
    assert [ocr_raster(*p) for p in pages] == [text, t2]
    res = extract_document(t, "https://x/fax.tif")
    assert (res["fmt"], res["status"]) == ("image", "ok_ocr")
    assert res["text"] == text


def test_g4_fuzz_round_trip():
    """Pattern-regime fuzz over the G4 pair: dense noise (every vertical
    offset), fax-width runs (makeup codes incl. the 2560 extended
    makeups), columnar structure (pass mode), tiny geometries."""
    import random

    from cc_extract.corpusgen import _g4_encode
    from cc_extract.extractors.ccitt import g4_decode

    rng = random.Random(99)
    for trial in range(16):
        kind = trial % 4
        if kind == 0:
            w, h = rng.randint(1, 100), rng.randint(1, 12)
            bi = bytes(rng.randint(0, 1) for _ in range(w * h))
        elif kind == 1:
            w, h = rng.randint(2700, 3500), rng.randint(1, 3)
            bi = bytearray(w * h)
            for _ in range(rng.randint(0, 6)):
                s = rng.randrange(w * h)
                e = min(w * h, s + rng.randint(1, 3000))
                for i in range(s, e):
                    bi[i] = 1
            bi = bytes(bi)
        elif kind == 2:
            w, h = rng.randint(10, 60), rng.randint(2, 20)
            cols = [rng.randint(0, 1) for _ in range(w)]
            bi = bytes(cols[x] for _ in range(h) for x in range(w))
        else:
            w, h = rng.randint(1, 8), rng.randint(1, 8)
            bi = bytes(rng.randint(0, 1) for _ in range(w * h))
        dec = g4_decode(_g4_encode(w, h, bi), w, h)
        assert bytes(dec) == bytes(255 if b == 0 else 0 for b in bi), \
            f"trial {trial} kind {kind} {w}x{h}"


def test_tiff_tiled_and_truncated_g4_quarantined():
    import struct as _s

    from cc_extract.corpusgen import _tiff_gray
    from cc_extract.glyphs import render_raster

    # G3 + T4Options uncompressed-mode bit -> honest quarantine
    # (RLE/G3/G4 all decode since round 4)
    e = "<"
    ifd = (_s.pack(e + "H", 4)
           + _s.pack(e + "HHI", 256, 3, 1) + _s.pack(e + "HH", 64, 0)
           + _s.pack(e + "HHI", 257, 3, 1) + _s.pack(e + "HH", 64, 0)
           + _s.pack(e + "HHI", 259, 3, 1) + _s.pack(e + "HH", 3, 0)
           + _s.pack(e + "HHI", 292, 4, 1) + _s.pack(e + "I", 2)
           + _s.pack(e + "I", 0))
    res = extract_document(b"II*\x00" + _s.pack(e + "I", 8) + ifd,
                           "https://x/fax_uncmp.tif")
    assert (res["fmt"], res["status"]) == ("image", "needs_ocr")
    # tiled dir missing its tile tables -> corrupt quarantine, no hang
    ifd = (_s.pack(e + "H", 4)
           + _s.pack(e + "HHI", 256, 3, 1) + _s.pack(e + "HH", 64, 0)
           + _s.pack(e + "HHI", 257, 3, 1) + _s.pack(e + "HH", 64, 0)
           + _s.pack(e + "HHI", 259, 3, 1) + _s.pack(e + "HH", 1, 0)
           + _s.pack(e + "HHI", 322, 3, 1) + _s.pack(e + "HH", 64, 0)
           + _s.pack(e + "I", 0))
    res = extract_document(b"II*\x00" + _s.pack(e + "I", 8) + ifd,
                           "https://x/tiled.tif")
    assert (res["fmt"], res["status"]) == ("image", "needs_ocr")
    # truncated G4 strip -> raise -> needs_ocr (never a hang/garbage)
    w, h, raster = render_raster("TRUNCATE ME NOW")
    t = _tiff_gray(w, h, bytes(raster), g4=True)
    res = extract_document(t[: len(t) - len(t) // 3], "https://x/fax.tif")
    assert (res["fmt"], res["status"]) == ("image", "needs_ocr")

def test_tiff_real_rgba_fixture_decodes():
    """Real reference-encoder TIFF (CPython's imghdr test image: 16x16
    uncompressed RGBA, ExtraSamples alpha): decodes via the RGBA->luma
    path.  Hash pinned after validating dimensions + plausible stats."""
    import hashlib
    import os

    from cc_extract.extractors.tiff import decode_tiff_gray

    path = os.path.join(os.path.dirname(__file__), "fixtures", "python.tiff")
    w, h, raster = decode_tiff_gray(open(path, "rb").read())
    assert (w, h) == (16, 16)
    assert hashlib.md5(bytes(raster)).hexdigest() == \
        "44254b2d50b2ae9999da47b27a0417ad"


def test_pdf_ccitt_scan_ocr():
    """Scanned-style PDF under /CCITTFaxDecode: K=-1 pure G4 (the most
    common real scanned-PDF encoding) AND every K>=0 G3 framing the
    route accepts since round 5 — /EndOfLine true (EOL-framed T.4), the
    PDF-default packed form (no EOLs, tag bit leads each 2-D row), and
    /EncodedByteAlign — all OCR end to end; a stream that is not valid
    for its declared K still quarantines."""
    import zlib as _zlib

    from cc_extract.corpusgen import _ccitt_encode, _g4_encode
    from cc_extract.glyphs import render_raster

    text = "CCITT IN PDF 42."
    w, h, raster = render_raster(text)
    bil = bytes(1 if b < 128 else 0 for b in raster)

    def pdf_with(fax: bytes, parms: str) -> bytes:
        objs = []

        def add(b):
            objs.append(b)
            return len(objs)

        img = add(
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/BitsPerComponent 1 /ColorSpace /DeviceGray "
            f"/Filter /CCITTFaxDecode "
            f"/DecodeParms << {parms} >> "
            f"/Length {len(fax)} >>".encode()
            + b"\nstream\n" + fax + b"\nendstream")
        raw = f"q {w} 0 0 {h} 72 400 cm /Im{img} Do Q".encode()
        comp = _zlib.compress(raw)
        cid = add(b"<< /Length " + str(len(comp)).encode()
                  + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream")
        pg = add(f"<< /Type /Page /Parent 9 0 R /Contents {cid} 0 R >>".encode())
        out = bytearray(b"%PDF-1.4\n")
        for i, body in enumerate(objs, 1):
            out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
        out += b"%%EOF"
        return bytes(out)

    dims = f"/Columns {w} /Rows {h}"
    variants = [
        (_g4_encode(w, h, bil), f"/K -1 {dims}"),
        (_ccitt_encode(w, h, bil, "g3_1d"), f"/K 0 {dims} /EndOfLine true"),
        (_ccitt_encode(w, h, bil, "g3_2d"), f"/K 4 {dims} /EndOfLine true"),
        (_ccitt_encode(w, h, bil, "mh"),
         f"/K 0 {dims} /EncodedByteAlign true"),
        (_ccitt_encode(w, h, bil, "g3_2d", eol=False), f"/K 4 {dims}"),
        (_ccitt_encode(w, h, bil, "g3_1d", eol=False), f"/K 0 {dims}"),
    ]
    for fax, parms in variants:
        res = extract_document(pdf_with(fax, parms), "https://x/scan.pdf")
        assert (res["fmt"], res["status"]) == ("pdf", "ok_ocr"), parms
        assert res["text"] == text, parms
    # G4 bits under a K=0 declaration are not a valid MH stream:
    # the decode raises inside pdf_scan_rasters -> honest quarantine
    res = extract_document(
        pdf_with(_g4_encode(w, h, bil), f"/K 0 {dims}"), "https://x/scan.pdf")
    assert (res["fmt"], res["status"]) == ("pdf", "needs_ocr")


def test_tiff_tiled_round_trip():
    """Round 4: tiled layout (tags 322-325) — per-tile compression with
    edge-tile padding cropped on stitch, all compressions + multipage;
    pixel-exact across geometries that do and don't divide the tile."""
    import random

    from cc_extract.corpusgen import _tiff_gray
    from cc_extract.extractors.tiff import decode_tiff_gray, decode_tiff_pages
    from cc_extract.glyphs import render_raster, ocr_raster

    text = "TILED TIFF LAYOUT 0123456789.\nSECOND SCAN LINE"
    w, h, raster = render_raster(text)
    for kw in [dict(), dict(lzw=True, predictor=2), dict(packbits=True),
               dict(big_endian=True, white_is_zero=True),
               dict(rgb=True, lzw=True, predictor=2)]:
        t = _tiff_gray(w, h, bytes(raster), tiled=True, **kw)
        w2, h2, out = decode_tiff_gray(t)
        assert (w2, h2) == (w, h), kw
        assert ocr_raster(w2, h2, out) == text, kw
    t2 = "TILED PAGE TWO."
    w3, h3, r3 = render_raster(t2)
    pages = decode_tiff_pages(
        _tiff_gray(w, h, bytes(raster), tiled=True, lzw=True,
                   extra_pages=[(w3, h3, bytes(r3))]))
    assert [ocr_raster(*p) for p in pages] == [text, t2]
    rng = random.Random(3)
    for tw, th in [(32, 32), (64, 32), (31, 33), (1, 1), (33, 65)]:
        r = bytes(rng.randrange(256) for _ in range(tw * th))
        t = _tiff_gray(tw, th, r, tiled=True, lzw=True, predictor=2)
        w2, h2, out = decode_tiff_gray(t)
        assert (w2, h2) == (tw, th) and bytes(out) == r, (tw, th)
    res = extract_document(
        _tiff_gray(w, h, bytes(raster), tiled=True, lzw=True),
        "https://x/tiled.tif")
    assert (res["fmt"], res["status"]) == ("image", "ok_ocr")
    assert res["text"] == text


def test_g3_tiff_round_trip_both_modes():
    """Round 4: CCITT Group 3 — EOL-framed 1-D modified-Huffman rows and
    the 2-D variant (T4Options bit 0, tag bit per row, 1-D anchor rows);
    fuzz plus full-page OCR through the dispatcher."""
    import random

    from cc_extract.corpusgen import _ccitt_encode, _tiff_gray
    from cc_extract.extractors.ccitt import g3_decode
    from cc_extract.glyphs import render_raster, ocr_raster

    rng = random.Random(11)
    for trial in range(10):
        w, h = rng.randint(1, 90), rng.randint(1, 12)
        bi = bytes(rng.randint(0, 1) for _ in range(w * h))
        want = bytes(255 if b == 0 else 0 for b in bi)
        assert bytes(g3_decode(_ccitt_encode(w, h, bi, "g3_1d"),
                               w, h, two_d=False)) == want, (trial, "1d")
        assert bytes(g3_decode(_ccitt_encode(w, h, bi, "g3_2d"),
                               w, h, two_d=True)) == want, (trial, "2d")
    text = "GROUP 3 FAX 0123456789.\nSECOND LINE OF THE SCAN"
    w, h, raster = render_raster(text)
    for g3 in ("1d", "2d"):
        res = extract_document(_tiff_gray(w, h, bytes(raster), g3=g3),
                               "https://x/fax.tif")
        assert (res["fmt"], res["status"]) == ("image", "ok_ocr"), g3
        assert res["text"] == text, g3


def test_image_decompression_bombs_quarantined():
    """Crafted headers declaring huge rasters (a few-KB G4/GIF/PNG/SOF2
    stream can legally expand to TBs — 1 bit per all-white fax row) must
    quarantine via the pixel-count caps instead of allocating."""
    import struct as _s

    e = "<"

    def tag(t, typ, cnt, val):
        return _s.pack(e + "HHI", t, typ, cnt) + _s.pack(e + "HH", val, 0)

    ifd = (_s.pack(e + "H", 7)
           + tag(256, 3, 1, 65000) + tag(257, 3, 1, 65000)
           + tag(258, 3, 1, 1) + tag(259, 3, 1, 4) + tag(262, 3, 1, 0)
           + _s.pack(e + "HHI", 273, 4, 1) + _s.pack(e + "I", 8)
           + _s.pack(e + "HHI", 279, 4, 1) + _s.pack(e + "I", 4)
           + _s.pack(e + "I", 0))
    doc = b"II*\x00" + _s.pack(e + "I", 12) + b"\xff\xff\xff\xff" + ifd
    assert extract_document(doc, "https://x/b.tif")["status"] == "needs_ocr"

    png = (b"\x89PNG\r\n\x1a\n" + _s.pack(">I", 13) + b"IHDR"
           + _s.pack(">IIBBBBB", 60000, 60000, 8, 0, 0, 0, 0) + b"\0\0\0\0"
           + _s.pack(">I", 4) + b"IDAT" + b"\x78\x9c\x03\x00" + b"\0\0\0\0")
    res = extract_document(png, "https://x/b.png")
    assert res["status"] == "needs_ocr" and "too large" in res["error"]

    seg = lambda m, b: _s.pack(">BBH", 0xFF, m, len(b) + 2) + b  # noqa: E731
    j = (b"\xff\xd8"
         + seg(0xC2, _s.pack(">BHHB", 8, 60000, 60000, 1) + b"\x01\x11\x00")
         + b"\xff\xd9")
    res = extract_document(j, "https://x/b.jpg")
    assert res["status"] == "needs_ocr" and "too large" in res["error"]

    g = (b"GIF87a" + _s.pack("<HHBBB", 60000, 60000, 0x80, 0, 0) + b"\0" * 6
         + b"\x2c" + _s.pack("<HHHHB", 0, 0, 60000, 60000, 0)
         + b"\x02" + b"\x01\x00" + b"\x00\x3b")
    res = extract_document(g, "https://x/b.gif")
    assert res["status"] == "needs_ocr" and "too large" in res["error"]


def test_ccitt_rle_round_trip():
    """Round 4: TIFF Compression 2 (CCITT RLE) — 1-D modified-Huffman
    rows, no EOL framing, every row byte-aligned."""
    import random

    from cc_extract.corpusgen import _ccitt_encode, _tiff_gray
    from cc_extract.extractors.ccitt import mh_decode
    from cc_extract.glyphs import render_raster, ocr_raster

    rng = random.Random(21)
    for trial in range(8):
        w, h = rng.randint(1, 90), rng.randint(1, 12)
        bi = bytes(rng.randint(0, 1) for _ in range(w * h))
        want = bytes(255 if b == 0 else 0 for b in bi)
        assert bytes(mh_decode(_ccitt_encode(w, h, bi, "mh"), w, h)) == want
    text = "CCITT RLE COMPRESSION 2."
    w, h, raster = render_raster(text)
    res = extract_document(_tiff_gray(w, h, bytes(raster), g3="mh"),
                           "https://x/fax.tif")
    assert (res["fmt"], res["status"]) == ("image", "ok_ocr")
    assert res["text"] == text


def test_pdf_encrypted_extracts_all_generations():
    """Restrictions-only encrypted PDFs (standard security handler, empty
    user password — the common crawl case) decrypt and extract across all
    three generations the corpus emits: RC4 V1/R2, AES-128 crypt filters
    V4/R4 (/AESV2) and AES-256 V5/R6 (/AESV3).  A corrupted /U (i.e. a
    real password) refuses honestly for each generation."""
    import random
    import re as _re

    from cc_extract.corpusgen import _gen_pdf

    rng = random.Random(77)
    seen = {"rc4": 0, "aesv2": 0, "aesv3": 0}
    quarantined = 0
    checked_u = set()
    for _ in range(700):
        p = _gen_pdf(rng)
        if b"/Encrypt" not in p:
            continue
        kind = ("aesv2" if b"/AESV2" in p
                else "aesv3" if b"/AESV3" in p else "rc4")
        seen[kind] += 1
        res = extract_document(p, "https://x/enc.pdf")
        if res["status"] == "error":
            # the ~8% unknown-password slice quarantines honestly
            assert "password not in candidate list" in res["error"], res
            quarantined += 1
            continue
        assert res["status"] in ("ok", "ok_ocr", "needs_ocr"), res
        if res["status"] == "ok":
            assert len(res["text"]) > 10
        if kind not in checked_u:
            checked_u.add(kind)
            # corrupt /U -> the empty-password check must fail -> error
            bad = _re.sub(rb"/U <([0-9a-f]{8})", rb"/U <deadbeef", p, count=1)
            assert bad != p
            res2 = extract_document(bad, "https://x/enc.pdf")
            assert res2["status"] == "error"
            assert "password" in res2["error"]
    assert all(n >= 2 for n in seen.values()), f"kinds too rare: {seen}"
    assert checked_u == {"rc4", "aesv2", "aesv3"}
    assert quarantined >= 1, "unknown-password slice never drawn"


def test_pdf_password_candidates_all_routes():
    """Non-empty passwords across every handler generation and both
    roles: a candidate from the sidecar list opens the document as the
    USER password (Algorithm 2/4/5 for R<=4, 2.B hash for R5/R6) and as
    the OWNER password (Algorithm 7 decrypts /O back to the padded user
    password; V5 unwraps the file key from /OE with udata=/U[:48]).  The
    extracted text is byte-identical to the same seed's empty-password
    twin, the candidate list is overridable, and the writer's sidecar
    list is pinned to the extractor's default."""
    import random

    from cc_extract.corpusgen import _KNOWN_PDF_PASSWORDS, _gen_pdf
    from cc_extract.extractors.pdf import DEFAULT_PASSWORDS, extract_pdf

    assert _KNOWN_PDF_PASSWORDS == DEFAULT_PASSWORDS

    def gen(enc):
        return _gen_pdf(random.Random(91), layout="classic", enc=enc)

    for kind in ("rc4", "aesv2", "aesv3"):
        ref = extract_pdf(gen((kind, b"", b"")))
        assert len(ref) > 10
        user = gen((kind, b"publica", b""))
        owner = gen((kind, b"junk$ecret99", b"crawl-sidecar-2026"))
        assert extract_pdf(user) == ref, kind
        assert extract_pdf(owner) == ref, kind
        # explicit candidate list overrides the default sidecar
        assert extract_pdf(user, passwords=("publica",)) == ref
        for doc in (user, owner):
            res = extract_document(doc, "https://x/enc.pdf",
                                   pdf_passwords=())
            assert res["status"] == "error"
            assert "password not in candidate list" in res["error"]
    # RC4 V1/R2's 5-byte owner key path (r==2 branch of Algorithm 7)
    # is covered by kind == "rc4" above; V5 R6 owner recovery goes
    # through /OE, pinned by kind == "aesv3".


def test_pdf_encrypted_unsupported_configs_refuse():
    """Unknown CFMs, missing crypt-filter routing, and malformed V5
    dictionaries quarantine as honest errors, never as garbage text."""
    import random

    from cc_extract.corpusgen import _gen_pdf

    rng = random.Random(7)  # seed 7 -> AESV2 (pinned by the smoke sweep)
    p = _gen_pdf(rng, layout="classic")
    assert b"/AESV2" in p
    # unknown CFM
    bad = p.replace(b"/CFM /AESV2", b"/CFM /AESV9", 1)
    res = extract_document(bad, "https://x/enc.pdf")
    assert res["status"] == "error" and "CFM" in res["error"]
    # streams routed through an Identity filter we don't model
    bad = p.replace(b"/StmF /StdCF", b"/StmF /Other", 1)
    res = extract_document(bad, "https://x/enc.pdf")
    assert res["status"] == "error" and "crypt filter" in res["error"]
    rng = random.Random(103)  # seed 103 -> AESV3
    p = _gen_pdf(rng, layout="classic")
    assert b"/AESV3" in p
    # truncated /UE -> malformed V5 dict
    bad = __import__("re").sub(rb"/UE <[0-9a-f]+>", rb"/UE <00>", p, count=1)
    res = extract_document(bad, "https://x/enc.pdf")
    assert res["status"] == "error"


def test_pdf_encrypted_corruption_fuzz_never_raises():
    """Byte-flip fuzz over encrypted PDFs (all three handler
    generations): corrupted ciphertext, mangled /Encrypt dicts and
    truncated tails must land in a status row (error/needs_ocr/ok),
    never an exception out of the dispatcher — AES padding failures,
    bad key lengths and misaligned streams all quarantine."""
    import random

    from cc_extract.corpusgen import _gen_pdf

    rng = random.Random(123)
    fuzzed = 0
    for seed in (7, 103, 14):  # aesv2 / aesv3 / rc4 pinned seeds
        base = _gen_pdf(random.Random(seed), layout="classic")
        assert b"/Encrypt" in base
        for _ in range(25):
            p = bytearray(base)
            for _k in range(rng.randint(1, 8)):
                p[rng.randrange(len(p))] = rng.randrange(256)
            res = extract_document(bytes(p), "https://x/fz.pdf")
            assert res["status"] in (
                "ok", "ok_ocr", "needs_ocr", "error", "unsupported"), res
            fuzzed += 1
        # truncation at arbitrary points
        for frac in (0.25, 0.5, 0.9):
            res = extract_document(base[: int(len(base) * frac)],
                                   "https://x/tr.pdf")
            assert res["status"] in (
                "ok", "ok_ocr", "needs_ocr", "error", "unsupported"), res
            fuzzed += 1
    assert fuzzed == 84


def test_pdf_filter_chains_extract_exact_text():
    """Every content-stream filter the reader claims (Flate, LZW,
    ASCII85+Flate, RunLength, ASCIIHex+Flate, none) yields the exact
    page text from a handcrafted one-page document — intent-level check,
    independent of the generator's own filter mix."""
    import zlib

    from cc_extract.corpusgen import (_a85_encode_cg, _rle_encode_cg,
                                      _tiff_lzw_encode)
    from cc_extract.extractors.pdf import extract_pdf

    raw = b"BT /F1 12 Tf 72 720 Td (Hello filters) Tj ET"
    cases = [
        ("/Filter /FlateDecode", zlib.compress(raw)),
        ("/Filter /LZWDecode", _tiff_lzw_encode(raw)),
        ("/Filter /LZWDecode /DecodeParms << /EarlyChange 1 >>",
         _tiff_lzw_encode(raw)),
        ("/Filter [ /ASCII85Decode /FlateDecode ]",
         _a85_encode_cg(zlib.compress(raw))),
        ("/Filter /RunLengthDecode", _rle_encode_cg(raw)),
        ("/Filter [ /ASCIIHexDecode /FlateDecode ]",
         zlib.compress(raw).hex().encode() + b">"),
        ("", raw),
    ]
    for clause, body in cases:
        clause_s = f" {clause}" if clause else ""
        objs = [
            f"<< /Length {len(body)}{clause_s} >>".encode()
            + b"\nstream\n" + body + b"\nendstream",
            b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 1 0 R >>",
            b"<< /Type /Catalog /Pages 2 0 R >>",
        ]
        import io
        buf = io.BytesIO()
        buf.write(b"%PDF-1.4\n")
        offs = [0]
        for i, b in enumerate(objs, 1):
            offs.append(buf.tell())
            buf.write(f"{i} 0 obj\n".encode() + b + b"\nendobj\n")
        xref = buf.tell()
        buf.write(f"xref\n0 {len(objs)+1}\n".encode())
        buf.write(b"0000000000 65535 f \n")
        for o in offs[1:]:
            buf.write(f"{o:010d} 00000 n \n".encode())
        buf.write(f"trailer\n<< /Size {len(objs)+1} /Root 4 0 R >>\n"
                  f"startxref\n{xref}\n%%EOF\n".encode())
        text = extract_pdf(buf.getvalue())
        assert text.strip() == "Hello filters", (clause, text)
    # unsupported configs degrade to no text, never raise: predictor on
    # Flate, EarlyChange=0 LZW, unknown filter
    for clause in (
        "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >>",
        "/Filter /LZWDecode /DecodeParms << /EarlyChange 0 >>",
        "/Filter /JBIG2Decode",
    ):
        body = zlib.compress(raw)
        objs0 = (f"<< /Length {len(body)} {clause} >>".encode()
                 + b"\nstream\n" + body + b"\nendstream")
        import io
        buf = io.BytesIO()
        buf.write(b"%PDF-1.4\n")
        objs = [objs0,
                b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Contents 1 0 R >>",
                b"<< /Type /Catalog /Pages 2 0 R >>"]
        for i, b in enumerate(objs, 1):
            buf.write(f"{i} 0 obj\n".encode() + b + b"\nendobj\n")
        buf.write(b"trailer\n<< /Size 5 /Root 4 0 R >>\n%%EOF\n")
        text = extract_pdf(buf.getvalue())
        assert isinstance(text, str) and "Hello" not in text, (clause, text)


def test_ccitt_uncompressed_mode():
    """Round 5: T.4 §4.2.1.4 / T.6 §2.2.8 UNCOMPRESSED mode — the last
    named fax quarantine becomes a real decode.  Fuzz round-trips the
    encoder's whole-row segments through G4 and G3 2-D (all framings);
    a hand-derived spec-pinned bitstream guards mid-row entry, the
    colour-flip exit, and the embedded-whites exit codes."""
    import random

    from cc_extract.corpusgen import _ccitt_encode, _tiff_gray
    from cc_extract.extractors.ccitt import (OcrError, _Bits,
                                             _decode_2d_row, g3_decode,
                                             g4_decode)
    from cc_extract.extractors.tiff import decode_tiff_gray
    from cc_extract.glyphs import ocr_raster, render_raster

    rng = random.Random(55)
    for _trial in range(8):
        w, h = rng.randint(1, 80), rng.randint(1, 10)
        bil = bytes(rng.random() < 0.35 for _ in range(w * h))
        expect = bytes(0 if b else 255 for b in bil)
        enc = _ccitt_encode(w, h, bil, "g4", uncompressed=True)
        assert bytes(g4_decode(enc, w, h)) == expect
        for eol in (True, False):
            enc = _ccitt_encode(w, h, bil, "g3_2d", uncompressed=True,
                                eol=eol)
            assert bytes(g3_decode(enc, w, h, two_d=True, eol=eol)) == expect

    def bits_of(s: str) -> _Bits:
        s = s.replace(" ", "")
        pad = (8 - len(s) % 8) % 8
        return _Bits(int(s + "0" * pad, 2).to_bytes((len(s) + pad) // 8,
                                                    "big"))

    # hand-derived (w=12): H(white2,black3) -> uncompressed from a0=5:
    # '0001'=3 whites+black(8), '1'=black(9), exit '00 0000001 0' embeds
    # the 2 trailing whites.  MH codes: white2=0111, black3=10.
    row = _decode_2d_row(
        bits_of("001 0111 10 0000001111 0001 1 00 0000001 0"), [], 12)
    assert row == [2, 5, 8, 10]
    # entry at row start + colour-flip exit (T=1): 2 embedded whites,
    # then V0 closes the black run at the row end
    row = _decode_2d_row(bits_of("0000001111 00 0000001 1 1"), [], 12)
    assert row == [2, 12]
    # unknown 2-D extension type refuses
    try:
        _decode_2d_row(bits_of("0000001 010 1"), [], 12)
        raise AssertionError("expected refusal")
    except OcrError as e:
        assert "extension" in str(e)
    # runaway zeros inside a segment refuse (not an infinite loop)
    try:
        _decode_2d_row(bits_of("0000001111 000000000000 1"), [], 12)
        raise AssertionError("expected refusal")
    except OcrError:
        pass

    # full TIFF pages: T6Options/T4Options bit 1 written, OCR end to end
    w, h, raster = render_raster("UNCOMP PAGE 7")
    for kw in (dict(g4=True), dict(g3="2d")):
        payload = _tiff_gray(w, h, bytes(raster), uncompressed=True, **kw)
        dw, dh, dec = decode_tiff_gray(payload)
        assert "UNCOMP PAGE 7" in ocr_raster(dw, dh, dec)


def test_ods_table_conventions():
    import random
    from cc_extract.corpusgen import _gen_ods
    from cc_extract.extractors.odt import extract_ods
    from cc_extract.extractors import extract_document
    payload = _gen_ods(random.Random(7))
    out = extract_ods(payload)
    assert "\t" in out  # TAB-joined cells, the xls/xlsx convention
    res = extract_document(payload, "https://x/a.ods")
    assert res["fmt"] == "ods" and res["status"] == "ok"
    # hand-built content pinning repeat expansion, multi-para cells,
    # trailing-filler drop and the repeat cap
    from cc_extract.corpusgen import _zip_bytes
    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        '<table:table table:name="T0"><table:table-row>'
        '<table:table-cell table:number-columns-repeated="2">'
        "<text:p>x</text:p></table:table-cell>"
        "<table:table-cell><text:p>a</text:p><text:p>b</text:p>"
        "</table:table-cell>"
        '<table:table-cell table:number-columns-repeated="1000"/>'
        "</table:table-row></table:table>"
        "</office:spreadsheet></office:body></office:document-content>"
    )
    payload = _zip_bytes([
        ("mimetype", b"application/vnd.oasis.opendocument.spreadsheet"),
        ("content.xml", content.encode()),
    ])
    assert extract_ods(payload) == "x\tx\ta b"


def test_odp_page_conventions():
    import random
    from cc_extract.corpusgen import _gen_odp
    from cc_extract.extractors.odt import extract_odp
    from cc_extract.extractors import extract_document
    payload = _gen_odp(random.Random(3))
    out = extract_odp(payload)
    assert "\n\n" in out  # slide boundary -> blank line (pptx convention)
    res = extract_document(payload, "https://x/a.odp")
    assert res["fmt"] == "odp" and res["status"] == "ok"


def test_msg_property_streams():
    from cc_extract.corpusgen import _cfb_container
    from cc_extract.extractors.msg import extract_msg
    from cc_extract.extractors import extract_document
    payload = _cfb_container([
        ("__substg1.0_0037001F", "sujét line".encode("utf-16-le")),
        ("__substg1.0_1000001E", b"body caf\xe9 text"),
    ])
    assert extract_msg(payload) == "sujét line\n\nbody café text"
    res = extract_document(payload, "https://x/a.msg")
    assert res["fmt"] == "msg" and res["status"] == "ok"
    # properties stream alone routes to msg but extraction errors honestly
    only_props = _cfb_container([("__properties_version1.0", b"\x00" * 16)])
    res = extract_document(only_props)
    assert res["fmt"] == "msg" and res["status"] == "error"
    assert "property" in res["error"]


def test_mht_rides_the_eml_route():
    import random
    from cc_extract.corpusgen import _gen_mht
    from cc_extract.extractors import extract_document
    for seed in (0, 5, 11):
        payload = _gen_mht(random.Random(seed))
        res = extract_document(payload, "https://x/saved.mht")
        # MHTML is MIME: sniffs as eml; the html root part goes through X1
        assert res["fmt"] == "eml" and res["status"] == "ok"
        assert res["text"].strip()
        assert "MultipartBoundary" not in res["text"]
        assert "base64" not in res["text"]


def test_zip_bundle_depth1_and_order():
    import random
    from cc_extract.corpusgen import _gen_zip, _zip_bytes
    from cc_extract.extractors.archive import extract_zip
    from cc_extract.extractors import extract_document
    for seed in (0, 4, 9):
        res = extract_document(_gen_zip(random.Random(seed)),
                               "https://x/bundle.zip")
        assert res["fmt"] == "zip" and res["status"] == "ok"
        assert res["text"].strip()
    # hand-built: name order (not insertion order), nested zip skipped,
    # directory skipped, all-binary bundle errors honestly
    inner = _zip_bytes([("i.txt", b"inner must not appear")])
    payload = _zip_bytes([
        ("b.txt", b"second part"),
        ("nested.zip", inner),
        ("dir/", b""),
        ("a.txt", b"first part"),
    ])
    out = extract_zip(payload)
    assert out == "first part\n\nsecond part"
    res = extract_document(_zip_bytes([("x.zip", inner)]))
    assert res["fmt"] == "zip" and res["status"] == "error"
    assert "no extractable members" in res["error"]
