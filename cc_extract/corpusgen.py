"""Deterministic synthetic CC-style corpus generator (FIXTURES.md §1,
SURVEY.md §5.2).  Seeded, pure-stdlib, NO external data
[D: BASELINE.json north_rule].

The reference shipped a handful of sample ``.doc/.docx/.pdf/.html/.rtf``
documents for manual testing [R: ⚠, SURVEY.md §5.1]; this module is that
idea scaled to a schema-complete corpus: every format the pipeline claims,
plus charset variants, boilerplate-heavy HTML, empty-text-layer PDFs
(OCR route), images, corrupt payloads, a duplicate-url tail (dedup), and a
1%-of-PDFs ≥1 MiB skew head (salting test §5.4).

Key design point: ``gen_doc(i, seed)`` is a pure function of ``(i, seed)``
so the corpus can be generated *distributed* — ``corpus_df`` builds it with
``spark.range(n).mapInPandas`` (each task generates its own id-range; no
driver-side materialization, no shuffle) which is how the 500k-doc bench
corpus stays cheap and how a 10^12-row synthetic load test would be fed.
"""

from __future__ import annotations

import random
import struct
import zlib
import zipfile
import io
from datetime import datetime, timedelta

SEED = 42

_WORDS = (
    "the quick brown fox jumps over lazy dog crawl web page text extract "
    "pipeline spark arrow batch column binary format document content "
    "main body article heading paragraph data table row cell value link "
    "index archive snapshot fetch parse token stream byte buffer shard "
    "partition bucket shuffle merge sort hash join filter scan query plan "
    "metric manifest resume lineage corpus fixture golden oracle sample "
    "naive café touché über straße señor garçon résumé déjà fiancée"
).split()

_DOMAINS = [f"site{i:02d}.example" for i in range(50)]
_EPOCH = datetime(2025, 1, 1)

# format mix (FIXTURES.md §1) as cumulative thresholds
_FMT_MIX = [
    ("html", 0.535), ("pdf", 0.15), ("txt", 0.075), ("doc", 0.02), ("docx", 0.05),
    ("rtf", 0.04), ("odt", 0.03), ("epub", 0.015), ("xlsx", 0.02), ("pptx", 0.02),
    ("xml", 0.01), ("json", 0.01), ("eml", 0.01), ("csv", 0.005),
    ("ps", 0.005), ("image", 0.003), ("corrupt", 0.002),
]
_CUM = []
_acc = 0.0
for _f, _p in _FMT_MIX:
    _acc += _p
    _CUM.append((_acc, _f))
_CUM[-1] = (1.01, _CUM[-1][1])  # float-sum guard

DUP_FRACTION = 0.02          # urls with a second, newer crawl row
PDF_EMPTY_TEXT_FRACTION = 0.03  # pdfs routed to needs_ocr
PDF_HUGE_FRACTION = 0.01     # pdfs >= 1 MiB (skew head)
PDF_XREF_STREAM_FRACTION = 0.2  # PDF 1.5+ layout: ObjStm + XRef stream
PDF_UNICODE_FRACTION = 0.12  # Identity-H composite font + ToUnicode CMap
PDF_DIFF_FRACTION = 0.12     # simple font with /Encoding /Differences
PDF_ENCRYPT_FRACTION = 0.06  # standard security handler, empty user pw
# (real-crawl incidence of restrictions-only encryption is low single
# digits; 6% keeps ~100 encrypted PDFs in the 20k golden across all
# three handler generations without the R6 KDF dominating wall time)

# the /Differences remap exercised by the corpus: the accented chars the
# word list carries, re-coded to 0x80.. and named via AGL glyph names
_PDF_DIFF_CHARS = "\u00e9\u00e0\u00fc\u00df\u00f1\u00e7"  # é à ü ß ñ ç
_PDF_DIFF_NAMES = ["eacute", "agrave", "udieresis", "germandbls",
                   "ntilde", "ccedilla"]
_PDF_DIFF_TRANS = str.maketrans(
    _PDF_DIFF_CHARS, "".join(chr(0x80 + i) for i in range(len(_PDF_DIFF_CHARS)))
)


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _sentences(rng: random.Random, n_sent: int) -> str:
    out = []
    for _ in range(n_sent):
        s = _words(rng, rng.randint(6, 16))
        out.append(s[0].upper() + s[1:] + ".")
    return " ".join(out)


# ----------------------------------------------------------------- HTML

# Non-Latin language packs: (HTML-declared charset, word pool, joiner).
# Each pool is encodable in its charset; the declared <meta charset> is
# what routes decoding through the legacy codec (charset.py tries the
# declaration BEFORE utf-8), which is exactly how real CC pages in these
# encodings survive extraction.
_LANG_PACKS = {
    "ja": ("Shift_JIS",
           ["データ", "処理", "分散", "計算", "結果", "高速", "変換",
            "文書", "解析", "抽出", "並列", "索引"], "、"),
    "zh": ("GBK",
           ["数据", "处理", "分布式", "计算", "结果", "快速", "转换",
            "文档", "分析", "提取", "并行", "索引"], ""),
    "ru": ("windows-1251",
           ["данные", "обработка", "таблица", "запрос", "результат",
            "быстро", "документ", "анализ", "поток", "индекс"], " "),
    "ko": ("EUC-KR",
           ["데이터", "처리", "분산", "계산", "결과", "변환", "문서",
            "분석", "추출", "병렬"], " "),
    "el": ("ISO-8859-7",
           ["δεδομένα", "επεξεργασία", "πίνακας", "ερώτημα",
            "αποτέλεσμα", "έγγραφο", "ανάλυση", "ροή"], " "),
}
# sentence-final punctuation per charset family: the ideographic full
# stop exists in Shift_JIS/GBK/EUC-KR but NOT in windows-1251/ISO-8859-7
_PACK_STOP = {"Shift_JIS": "。", "GBK": "。", "EUC-KR": "。",
              "windows-1251": ". ", "ISO-8859-7": ". "}


def _gen_html(rng: random.Random, domain: str | None = None) -> bytes:
    pack = None
    lang = "en"
    if rng.random() < 0.15:
        lang = rng.choice(sorted(_LANG_PACKS))
        pack = _LANG_PACKS[lang]
        charset = pack[0]
    else:
        charset = rng.choice(["utf-8", "utf-8", "utf-8", "cp1252"])
    nav_links = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in rng.sample(_WORDS[:30], 8)
    )
    farm = "".join(
        f'<a href="/p{j}">{rng.choice(_WORDS)}</a> ' for j in range(12)
    )
    # cross-domain "related sites" links: the only ABSOLUTE hrefs the
    # corpus emits — the edges cc_link_graph/cc_pagerank consume.  They
    # live in the <aside> boilerplate region, so extracted TEXT is
    # unaffected; the domain choice is rng-driven, so the graph is a
    # deterministic function of (i, seed) like everything else.
    related = "".join(
        f'<a href="https://{rng.choice(_DOMAINS)}/ref{j}.html">'
        f"{rng.choice(_WORDS)}</a> "
        for j in range(rng.randint(2, 5))
    )
    if pack:
        _, pool, joiner = pack

        stop = _PACK_STOP[pack[0]]

        def _psent(n_words: int) -> str:
            return joiner.join(rng.choice(pool) for _ in range(n_words)) + stop

        paras = "\n".join(
            f"<p>{_psent(rng.randint(6, 18))}</p>"
            for _ in range(rng.randint(3, 10))
        )
        lis = "".join(f"<li>{_psent(rng.randint(3, 6))}</li>"
                      for _ in range(rng.randint(2, 5)))
    else:
        paras = "\n".join(
            f"<p>{_sentences(rng, rng.randint(2, 6))}</p>"
            for _ in range(rng.randint(3, 10))
        )
        lis = "".join(f"<li>{_sentences(rng, 1)}</li>" for _ in range(rng.randint(2, 5)))
    title = _words(rng, 4)
    # Head metadata (description / og:title / canonical / lang) is DERIVED
    # from draws already made above — zero extra rng consumption, so the
    # 20k extracted-text golden is untouched (head subtrees are
    # blacklisted by X1) while cc_html_meta gets real fields to extract.
    first_para = paras.split("</p>", 1)[0]
    first_para = first_para[first_para.find(">") + 1:]
    desc = f"{title}: {first_para}"[:160].rstrip()
    slug = title.replace(" ", "-")
    # JSON-LD structured data (schema.org) — like the head metadata
    # above, DERIVED from draws already made (title/desc/slug/lang)
    # through an md5 stream, zero extra rng consumption: the 20k
    # extracted-text golden is untouched (script subtrees are
    # X1-blacklisted) while cc_jsonld gets real blocks to extract.
    # Variant classes by hash: attr quote style / case, @graph wrapper,
    # BreadcrumbList second block, a malformed-JSON block (must count
    # as invalid, never crash), and a no-JSON-LD class.
    import hashlib as _hashlib
    import json as _json
    hv = int(_hashlib.md5(f"ld:{slug}:{lang}".encode()).hexdigest(), 16)
    # Data table (2/3 of html docs) — same hash-only derivation: header
    # row (<th>), word first column + numeric cells, optional <caption>,
    # cells separated by markup whitespace.  The prose heuristic drops
    # most table rows as boilerplate (low text density — tables are not
    # prose), which is exactly the real-stack split cc_html_tables
    # exists for: tables come out as STRUCTURED rows, not prose text.
    hv2 = int(_hashlib.md5(f"tbl:{slug}:{lang}".encode()).hexdigest(), 16)
    if hv2 % 3 == 0:
        table_html = ""
    else:
        ncols = 2 + (hv2 >> 4) % 3
        nrows = 2 + (hv2 >> 8) % 5
        hdr = [_WORDS[(hv2 >> (12 + 7 * c)) % len(_WORDS)]
               for c in range(ncols)]
        trs = ["<tr>" + " ".join(f"<th>{w}</th>" for w in hdr) + "</tr>"]
        for ri in range(nrows):
            cells = []
            for c in range(ncols):
                x = (hv2 >> ((ri * ncols + c) % 40)) & 0xFFFF
                cells.append(f"<td>{_WORDS[x % len(_WORDS)]}</td>"
                             if c == 0 else f"<td>{x % 1000}</td>")
            trs.append("<tr>\n" + "\n".join(cells) + "\n</tr>")
        cap = (f"<caption>{hdr[0]} by {hdr[-1]}</caption>\n"
               if hv2 % 5 == 0 else "")
        table_html = ('<table class="data">\n' + cap
                      + "\n".join(trs) + "\n</table>\n")
    # Page-level robots directives (cc_meta_robots) — same hash-only
    # derivation, zero rng consumption: ~1/5 of html docs carry a
    # <meta name=robots> (directive mix incl. 'none', positive no-ops,
    # attr case/quote/order variants), and 0-2 related + 0-3 farm
    # anchors gain rel=nofollow.  rel goes BEFORE href so the
    # cc_link_graph edge regex (href="...">) keeps matching — the graph
    # op stays pinned while cc_meta_robots reports which edges a
    # polite ranker would drop.  Head/attr bytes never reach extracted
    # text, so the 20k golden is untouched.
    hv3 = int(_hashlib.md5(f"rb:{slug}:{lang}".encode()).hexdigest(), 16)
    if hv3 % 5 == 0:
        rb_content = ["noindex", "noindex, nofollow", "NOFOLLOW", "none",
                      "index, follow"][(hv3 >> 4) % 5]
        robots_meta = [
            f'<meta name="robots" content="{rb_content}">',
            f"<meta NAME='ROBOTS' CONTENT='{rb_content}'>",
            f'<meta content="{rb_content}" name=robots>',
        ][(hv3 >> 8) % 3] + "\n"
    else:
        robots_meta = ""
    related = related.replace(
        '<a href="https://', '<a rel="nofollow" href="https://',
        (hv3 >> 12) % 3)
    farm = farm.replace(
        '<a href="/p', '<a rel=NOFOLLOW href="/p', (hv3 >> 16) % 4)
    if hv % 13 == 0:
        ld_scripts = ""
    else:
        ld_attr = ['type="application/ld+json"',
                   "type='application/ld+json'",
                   'TYPE="application/LD+JSON"'][hv % 3]
        art = {"@context": "https://schema.org", "@type": "Article",
               "headline": title, "description": desc,
               "inLanguage": lang,
               "mainEntityOfPage": f"/canonical/{slug}"}
        if hv % 7 == 0:
            body1 = _json.dumps({"@context": "https://schema.org",
                                 "@graph": [art, {"@type": "WebSite",
                                                  "name": title}]})
        else:
            body1 = _json.dumps(art)
        ld_scripts = f"<script {ld_attr}>{body1}</script>\n"
        if hv % 4 == 0:
            crumbs = [{"@type": "ListItem", "position": j + 1, "name": w}
                      for j, w in enumerate(slug.split("-")[:3])]
            body2 = _json.dumps({"@context": "https://schema.org",
                                 "@type": "BreadcrumbList",
                                 "itemListElement": crumbs})
            ld_scripts += ('<script type="application/ld+json">'
                           f"{body2}</script>\n")
        if hv % 11 == 0:
            ld_scripts += ('<script type="application/ld+json">'
                           '{"@type": "Thing",,}</script>\n')
    # Per-DOMAIN template paragraph (cc_site_templates) — the in-main
    # boilerplate the X1 tag-blacklist CANNOT strip (it's a plain <p>
    # inside <div id=main>): a syndication disclaimer whose text is a
    # pure hash of the domain, so it recurs byte-identically on every
    # classic html page of the site.  Hash-only derivation, zero rng
    # consumption; ~1/4 of domains carry none (the absent class).
    # Extracted text CHANGES for carrier pages -> golden regenerated
    # per protocol.
    if domain is None:
        disclaimer = ""
    else:
        dh = int(_hashlib.md5(f"tmpl:{domain}".encode()).hexdigest(), 16)
        if dh % 4 == 0:
            disclaimer = ""
        else:
            w1 = _WORDS[(dh >> 8) % len(_WORDS)]
            w2 = _WORDS[(dh >> 16) % len(_WORDS)]
            disclaimer = (
                f"<p>Content syndicated by the {domain.split('.')[0]} "
                f"editorial desk. All {w1} material appears under the "
                f"{w2} licence and its terms apply.</p>\n")
    doc = f"""<!DOCTYPE html>
<html lang="{lang}"><head><meta charset="{charset}"><title>{title}</title>
<meta name="description" content="{desc}">
<meta property="og:title" content="{title}">
<meta property="og:type" content="article">
{robots_meta}<link rel="canonical" href="/canonical/{slug}">
{ld_scripts}<style>body {{ color: #333; }} .x {{ display:none }}</style>
<script>var tracker = "{_words(rng, 3)}"; loadAds();</script>
</head><body>
<nav><ul>{nav_links}</ul></nav>
<header><div class="banner">{rng.choice(_WORDS)}</div></header>
<div id="main">
<h1>{title} &amp; {rng.choice(_WORDS)} &mdash; {rng.choice(_WORDS)}</h1>
{paras}
{disclaimer}<h2>{_words(rng, 3)}</h2>
<ul>{lis}</ul>
{table_html}</div>
<aside><div>{farm}</div><div class="related">{related}</div></aside>
<footer><p><a href="/about">about</a> <a href="/tos">tos</a> <a href="/priv">priv</a></p></footer>
<script type="text/javascript">trailer();</script>
</body></html>"""
    # errors="replace": a char outside the declared charset transcodes to
    # '?' exactly as a real lossy publishing pipeline would — the bytes
    # always MATCH the declaration (the old utf-8 fallback silently
    # mislabeled the document and manufactured mojibake)
    return doc.encode(charset, errors="replace")


# ------------------------------------------------------------------ PDF

def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


_PDF_PW_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])  # standard security handler padding (ISO 32000-1, public constant)

# The corpus's stand-in for a curation password sidecar: publisher pages
# that disclose their PDF's password.  Must equal the extractor's
# DEFAULT_PASSWORDS (pinned by a test — the writer stays an independent
# transcription, the shared data is just the list).
_KNOWN_PDF_PASSWORDS = ("crawl-sidecar-2026", "publica")


def _pad_cg(pwd: bytes) -> bytes:
    """Algorithm 2 step a: truncate/pad the password to 32 bytes."""
    return (pwd + _PDF_PW_PAD)[:32]


def _rc4_cg(key: bytes, data: bytes) -> bytes:
    """Writer-side RC4 (independent of the extractor's copy)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _hash_2b_cg(pwd: bytes, salt: bytes, udata: bytes) -> bytes:
    """Writer-side transcription of ISO 32000-2 Algorithm 2.B (the R6
    password hash), independent of the extractor's copy — they share only
    the FIPS-vector-pinned AES primitive, so a transcription slip on
    either side fails the round trip instead of hiding."""
    import hashlib

    from .extractors import aes as _aes

    k = hashlib.sha256(pwd + salt + udata).digest()
    rnd = 0
    while True:
        block = (pwd + k + udata) * 64
        e = _aes.cbc_encrypt(k[:16], k[16:32], block)
        digest = {0: hashlib.sha256, 1: hashlib.sha384,
                  2: hashlib.sha512}[sum(e[:16]) % 3]
        k = digest(e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


def _encrypt_obj_streams(objs: list, enc_fn) -> None:
    """Re-encrypt every stream body in the object list in place; AES
    grows streams (IV + PKCS#7), so the dict's /Length is rewritten when
    the transform changes the byte count."""
    import re as _re

    for num in range(1, len(objs) + 1):
        body = objs[num - 1]
        si = body.find(b"\nstream\n")
        if si == -1:
            continue
        send = body.rfind(b"\nendstream")
        stream = body[si + 8: send]
        new = enc_fn(num, stream)
        head = body[:si]
        if len(new) != len(stream):
            ref = _re.search(rb"/Length (\d+) 0 R", head)
            if ref:  # indirect length: the integer object carries it
                objs[int(ref.group(1)) - 1] = b"%d" % len(new)
            else:
                head = _re.sub(rb"/Length \d+", b"/Length %d" % len(new),
                               head, count=1)
        objs[num - 1] = head + b"\nstream\n" + new + b"\nendstream"


def _a85_encode_cg(data: bytes) -> bytes:
    """Writer-side ASCII85 (ISO 32000 7.4.3), independent of the
    extractor's decoder: 4-byte groups to 5 base-85 digits, 'z' for zero
    groups, partial tail truncated, '~>' EOD."""
    out = bytearray()
    for i in range(0, len(data), 4):
        grp = data[i: i + 4]
        pad = 4 - len(grp)
        val = int.from_bytes(grp + b"\x00" * pad, "big")
        if val == 0 and pad == 0:
            out += b"z"
            continue
        digits = bytearray(5)
        for k in range(4, -1, -1):
            digits[k] = 33 + val % 85
            val //= 85
        out += digits[: 5 - pad]
    return bytes(out) + b"~>"


def _rle_encode_cg(data: bytes) -> bytes:
    """Writer-side RunLengthDecode encoder: repeat runs >= 3 as repeats,
    literals chunked at 128, EOD 128."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = i
    def flush_literals(upto):
        j = lit_start
        while j < upto:
            chunk = data[j: min(j + 128, upto)]
            out.append(len(chunk) - 1)
            out.extend(chunk)
            j += len(chunk)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(n)
    out.append(128)
    return bytes(out)


def _pdf_encode_stream(rng: random.Random, raw: bytes) -> tuple[str, bytes]:
    """Pick a realistic filter chain for a PDF content stream and encode
    *raw* with it.  Returns (dict clause, encoded bytes).  Mix: Flate
    dominates (what real writers emit), with LZW, ASCII85-wrapped Flate,
    RunLength, ASCIIHex-wrapped Flate and raw streams on the tail — each
    exercising a distinct decoder path in extractors/pdf.py."""
    pick = rng.random()
    if pick < 0.60:
        return "/Filter /FlateDecode", zlib.compress(raw)
    if pick < 0.72:
        return ("/Filter /LZWDecode /DecodeParms << /EarlyChange 1 >>",
                _tiff_lzw_encode(raw))
    if pick < 0.82:
        return ("/Filter [ /ASCII85Decode /FlateDecode ]",
                _a85_encode_cg(zlib.compress(raw)))
    if pick < 0.90:
        return "/Filter /RunLengthDecode", _rle_encode_cg(raw)
    if pick < 0.96:
        comp = zlib.compress(raw)
        return ("/Filter [ /ASCIIHexDecode /FlateDecode ]",
                comp.hex().encode("ascii") + b">")
    return "", raw  # no filter at all (legal, rare)


def _gen_pdf_content_stream(rng: random.Random, n_lines: int,
                            translate: dict | None = None) -> bytes:
    ops = ["BT /F1 12 Tf 72 720 Td"]
    for li in range(n_lines):
        line = _sentences(rng, 1)
        if translate is not None:
            line = line.translate(translate)
        style = rng.random()
        if style < 0.5:
            ops.append(f"({_pdf_escape(line)}) Tj")
            ops.append("0 -14 Td")
        elif style < 0.75:
            # TJ array with kerning gaps acting as spaces
            words = line.split(" ")
            parts = []
            for w in words:
                parts.append(f"({_pdf_escape(w)})")
                parts.append(str(rng.choice([-120, -150, -250])))
            ops.append("[" + " ".join(parts[:-1]) + "] TJ")
            ops.append("T*")
        elif style < 0.9:
            ops.append(f"({_pdf_escape(line)}) '")
        else:
            hexs = line.encode("latin-1", "replace").hex()
            ops.append(f"<{hexs}> Tj")
            ops.append("0 -14 TD")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


# Non-latin words for the Identity-H (composite font) PDF pages — the
# text a real CC crawl's international PDFs carry.  BMP-only so each char
# is one UTF-16 code unit in the ToUnicode CMap.
_UNICODE_WORDS = (
    "данные конвейер поток система σύστημα κείμενο δεδομένα 文本 数据 処理 "
    "текст страница 抽出 解析 αρχείο"
).split()


class _CidCodec:
    """char -> CID code assignment for a synthetic Identity-H font.
    Digits pre-map to their own codepoints so the CMap exercises the
    bfrange form; everything else gets sequential codes via bfchar."""

    def __init__(self) -> None:
        self.codes: dict[str, int] = {chr(c): c for c in range(0x30, 0x3A)}
        self._next = 1

    def code(self, ch: str) -> int:
        c = self.codes.get(ch)
        if c is None:
            while self._next in range(0x30, 0x3A):
                self._next += 1
            c = self._next
            self.codes[ch] = c
            self._next += 1
        return c

    def hex_string(self, text: str) -> str:
        return "<" + "".join(f"{self.code(ch):04x}" for ch in text) + ">"

    def tounicode_cmap(self) -> bytes:
        bfchars = "\n".join(
            f"<{code:04x}> <{ord(ch):04x}>"
            for ch, code in sorted(self.codes.items(), key=lambda kv: kv[1])
            if not ("0" <= ch <= "9")
        )
        n = sum(1 for ch in self.codes if not ("0" <= ch <= "9"))
        return (
            "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
            "/CMapName /SynthCID-UCS2 def\n/CMapType 2 def\n"
            "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
            "1 beginbfrange\n<0030> <0039> <0030>\nendbfrange\n"
            f"{n} beginbfchar\n{bfchars}\nendbfchar\n"
            "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"
        ).encode("utf-8")


def _gen_pdf_unicode_content(rng: random.Random, n_lines: int, codec: _CidCodec) -> bytes:
    """Content stream for an Identity-H page: 2-byte-CID hex strings under
    /F2, mixing Tj lines and TJ arrays with kern-gap spaces."""
    ops = ["BT /F2 12 Tf 72 720 Td"]
    for _ in range(n_lines):
        words = [rng.choice(_UNICODE_WORDS) for _ in range(rng.randint(3, 8))]
        if rng.random() < 0.3:
            words.append(str(rng.randint(0, 9999)))  # digits -> bfrange path
        if rng.random() < 0.3:
            parts = []
            for wd in words:
                parts.append(codec.hex_string(wd))
                parts.append(str(rng.choice([-150, -250])))
            ops.append("[" + " ".join(parts[:-1]) + "] TJ")
            ops.append("T*")
        else:
            ops.append(codec.hex_string(" ".join(words)) + " Tj")
            ops.append("0 -14 Td")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def _serialize_pdf_xref_stream(objs: list[bytes], catalog_id: int) -> bytes:
    """PDF 1.5+ serialization: stream-bearing objects stay direct; every
    other object (catalog, pages node, page dicts) packs into ONE
    ``/ObjStm``; the cross-reference is a ``/Type /XRef`` stream (W [1 4 2]
    binary rows: type 0 free / 1 direct-offset / 2 in-objstm) whose dict
    doubles as the trailer (/Root rides there — no classic ``trailer``).
    This is the layout virtually every post-2005 PDF writer emits and the
    round-2 verdict's top real-corpus robustness gap."""
    buf = io.BytesIO()
    buf.write(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    packed: list[tuple[int, bytes]] = []
    for i, body in enumerate(objs, start=1):
        # streams must stay direct (spec); scalar objects (indirect
        # /Length ints) also stay direct so stream extents resolve
        # before any ObjStm is decoded — dict objects pack
        if b"\nstream\n" in body or not body.startswith(b"<<"):
            offsets[i] = buf.tell()
            buf.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
        else:
            packed.append((i, body))

    objstm_num = len(objs) + 1
    xref_num = len(objs) + 2
    header_parts, body_parts = [], []
    off = 0
    for num, body in packed:
        header_parts.append(f"{num} {off}")
        body_parts.append(body + b"\n")
        off += len(body) + 1
    header = (" ".join(header_parts) + "\n").encode()
    comp = zlib.compress(header + b"".join(body_parts))
    offsets[objstm_num] = buf.tell()
    buf.write(
        f"{objstm_num} 0 obj\n<< /Type /ObjStm /N {len(packed)} "
        f"/First {len(header)} /Filter /FlateDecode /Length {len(comp)} "
        f">>\nstream\n".encode() + comp + b"\nendstream\nendobj\n"
    )

    xref_pos = buf.tell()
    offsets[xref_num] = xref_pos
    idx_in_stm = {num: i for i, (num, _) in enumerate(packed)}
    size = xref_num + 1
    rows = bytearray()
    for num in range(size):
        if num == 0:
            rows += struct.pack(">BIH", 0, 0, 65535)
        elif num in offsets:
            rows += struct.pack(">BIH", 1, offsets[num], 0)
        else:
            rows += struct.pack(">BIH", 2, objstm_num, idx_in_stm[num])
    xcomp = zlib.compress(bytes(rows))
    buf.write(
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
        f"/Root {catalog_id} 0 R /Filter /FlateDecode /Length {len(xcomp)} "
        f">>\nstream\n".encode() + xcomp + b"\nendstream\nendobj\n"
    )
    buf.write(f"startxref\n{xref_pos}\n%%EOF\n".encode())
    return buf.getvalue()


def _gen_pdf(rng: random.Random, layout: str | None = None,
             enc: tuple[str, bytes, bytes] | None = None) -> bytes:
    xref_stream = rng.random() < PDF_XREF_STREAM_FRACTION
    if layout is not None:  # test hook; production always draws
        xref_stream = layout == "xref"
    unicode_font = rng.random() < PDF_UNICODE_FRACTION
    diff_font = rng.random() < PDF_DIFF_FRACTION and not unicode_font
    empty_text = rng.random() < PDF_EMPTY_TEXT_FRACTION
    # 60% of empty-text PDFs are scanned-style: the page raster rides along
    # as a FlateDecode grayscale image XObject (what a scanner writes) and
    # the OCR-lite route recognizes it; the rest stay OCR-unreachable
    # (box-only vector pages) and populate the needs_ocr quarantine.
    scanned = empty_text and rng.random() < 0.6
    huge = rng.random() < PDF_HUGE_FRACTION
    n_pages = rng.randint(1, 5) if not huge else rng.randint(40, 80)
    objs: list[bytes] = []  # 1-indexed object bodies

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    codec = _CidCodec()
    page_obj_ids = []
    content_ids = []
    for _ in range(n_pages):
        if unicode_font and not empty_text:
            raw = _gen_pdf_unicode_content(rng, rng.randint(3, 12), codec)
            comp = zlib.compress(raw)
            cid = add(
                b"<< /Length " + str(len(comp)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream"
            )
            content_ids.append(cid)
            page_obj_ids.append(None)
            continue
        if scanned:
            from .glyphs import render_raster
            w, h, raster = render_raster(_sentences(rng, rng.randint(1, 3)))
            pick = rng.random()
            if pick < 0.35:
                # JPEG scan: the page raster embedded as /DCTDecode (the
                # JFIF bytes ARE the stream), what real scanners write
                jfif = _jpeg_gray(w, h, bytes(raster))
                img_id = add(
                    f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
                    f"/BitsPerComponent 8 /ColorSpace /DeviceGray "
                    f"/Filter /DCTDecode /Length {len(jfif)} >>".encode()
                    + b"\nstream\n" + jfif + b"\nendstream"
                )
            elif pick < 0.65:
                # fax scan: 1-bit /CCITTFaxDecode.  K=-1 G4 stays the
                # most common real scanned-PDF encoding; K>=0 G3 variants
                # (round 5) cover both /EndOfLine framings and
                # /EncodedByteAlign — everything pdf_scan_rasters decodes.
                bil = bytes(1 if b < 128 else 0 for b in raster)
                fv = rng.random()
                if fv < 0.4:
                    fax = _g4_encode(w, h, bil)
                    parms = f"/K -1 /Columns {w} /Rows {h}"
                elif fv < 0.5:
                    # T.6 uncompressed-mode segments inside G4 (round 5)
                    fax = _ccitt_encode(w, h, bil, "g4", uncompressed=True)
                    parms = f"/K -1 /Columns {w} /Rows {h}"
                elif fv < 0.65:
                    fax = _ccitt_encode(w, h, bil, "g3_1d")
                    parms = f"/K 0 /Columns {w} /Rows {h} /EndOfLine true"
                elif fv < 0.8:
                    fax = _ccitt_encode(w, h, bil, "g3_2d")
                    parms = f"/K 4 /Columns {w} /Rows {h} /EndOfLine true"
                elif fv < 0.9:
                    fax = _ccitt_encode(w, h, bil, "mh")
                    parms = (f"/K 0 /Columns {w} /Rows {h} "
                             f"/EncodedByteAlign true")
                else:
                    fax = _ccitt_encode(w, h, bil, "g3_2d", eol=False)
                    parms = f"/K 4 /Columns {w} /Rows {h}"
                img_id = add(
                    f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
                    f"/BitsPerComponent 1 /ColorSpace /DeviceGray "
                    f"/Filter /CCITTFaxDecode "
                    f"/DecodeParms << {parms} >> "
                    f"/Length {len(fax)} >>".encode()
                    + b"\nstream\n" + fax + b"\nendstream"
                )
            else:
                comp_img = zlib.compress(bytes(raster))
                img_id = add(
                    f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
                    f"/BitsPerComponent 8 /ColorSpace /DeviceGray "
                    f"/Filter /FlateDecode /Length {len(comp_img)} >>".encode()
                    + b"\nstream\n" + comp_img + b"\nendstream"
                )
            raw = f"q {w} 0 0 {h} 72 400 cm /Im{img_id} Do Q".encode()
        elif empty_text:
            raw = b"0.5 w 72 72 468 648 re S"  # draws a box, no text ops
        else:
            raw = _gen_pdf_content_stream(
                rng, rng.randint(4, 20),
                translate=_PDF_DIFF_TRANS if diff_font else None)
        fclause, comp = _pdf_encode_stream(rng, raw)
        fclause = f" {fclause}" if fclause else ""
        if rng.random() < 0.15:
            # indirect /Length N 0 R (what many real writers emit); the
            # int object precedes the stream here but the parser also
            # resolves forward references
            lid = add(str(len(comp)).encode())
            cid = add(
                f"<< /Length {lid} 0 R{fclause} >>".encode()
                + b"\nstream\n" + comp + b"\nendstream"
            )
        else:
            cid = add(
                f"<< /Length {len(comp)}{fclause} >>".encode()
                + b"\nstream\n" + comp + b"\nendstream"
            )
        content_ids.append(cid)
        page_obj_ids.append(None)  # placeholder; fill after pages node id known

    resources = ""
    if unicode_font and not empty_text:
        # composite Identity-H font + its ToUnicode CMap (built AFTER the
        # content loop so the codec holds every char the pages used)
        tu_cmap = codec.tounicode_cmap()
        tu_id = add(
            b"<< /Length " + str(len(tu_cmap)).encode() + b" >>\nstream\n"
            + tu_cmap + b"\nendstream"
        )
        f2_id = add(
            f"<< /Type /Font /Subtype /Type0 /BaseFont /SynthCID "
            f"/Encoding /Identity-H /ToUnicode {tu_id} 0 R >>".encode()
        )
        resources = f"/Resources << /Font << /F2 {f2_id} 0 R >> >> "
    elif diff_font and not empty_text:
        # simple font whose /Encoding /Differences remaps 0x80.. back to
        # the accented glyphs the content bytes stand for (PDF 32000-1
        # §9.6.6); the parser must honor the override, latin-1 elsewhere
        diffs = " ".join(f"/{n}" for n in _PDF_DIFF_NAMES)
        f1_id = add(
            f"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            f"/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding "
            f"/Differences [ 128 {diffs} ] >> >>".encode()
        )
        resources = f"/Resources << /Font << /F1 {f1_id} 0 R >> >> "

    pages_id = add(b"PLACEHOLDER_PAGES")
    kids = []
    for idx, cid in enumerate(content_ids):
        pid = add(
            f"<< /Type /Page /Parent {pages_id} 0 R /MediaBox [0 0 612 792] "
            f"{resources}/Contents {cid} 0 R >>".encode()
        )
        kids.append(pid)
    objs[pages_id - 1] = (
        "<< /Type /Pages /Count {} /Kids [{}] >>".format(
            n_pages, " ".join(f"{k} 0 R" for k in kids)
        ).encode()
    )
    if huge:
        blob = rng.getrandbits(8 * 1024).to_bytes(1024, "big") * 1100  # ~1.1 MiB, low entropy cost
        add(b"<< /Type /XObject /Subtype /Image /Length "
            + str(len(blob)).encode() + b" >>\nstream\n" + blob + b"\nendstream")
    catalog_id = add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode())

    if xref_stream:
        return _serialize_pdf_xref_stream(objs, catalog_id)

    # Standard security handler on a slice of classic-layout PDFs — the
    # "restrictions-only" encryption a real crawl constantly hits, across
    # all three generations: RC4 V1/R2 (Algorithms 1/2/3/4), AES-128
    # crypt filters V4/R4 (/AESV2), and AES-256 V5/R6 (/AESV3 with the
    # Algorithm-2.B hash + /Perms block).
    encrypted = rng.random() < PDF_ENCRYPT_FRACTION
    if enc is not None:  # test hook (kind, user_pw, owner_pw); prod draws
        encrypted = True
    trailer_extra = ""
    if encrypted:
        import hashlib

        from .extractors import aes as _aes

        pick = rng.random()
        # R6's Algorithm-2.B KDF deliberately burns ~10^4 AES blocks per
        # hash (6 per doc across writer+reader) — representative at 15%
        # of encrypted PDFs without dominating corpus generation time
        kind = "rc4" if pick < 0.45 else ("aesv2" if pick < 0.85 else "aesv3")
        # Password scenarios (fractions of the encrypted slice): 60%
        # restrictions-only (both empty) — the dominant real-crawl case;
        # 20% user password present in the curation sidecar list; 12%
        # user password unknown but the OWNER password in the list
        # (exercises Algorithm 7 // /OE recovery); 8% unknown in both
        # roles — stays an honest quarantine row.
        pq = rng.random()
        if pq < 0.60:
            user_pw = owner_pw = b""
        elif pq < 0.80:
            user_pw = _KNOWN_PDF_PASSWORDS[rng.randrange(2)].encode()
            owner_pw = b""
        elif pq < 0.92:
            user_pw = bytes(rng.randrange(33, 127) for _ in range(10))
            owner_pw = _KNOWN_PDF_PASSWORDS[rng.randrange(2)].encode()
        else:
            user_pw = b"forgotten-" + bytes(
                rng.randrange(48, 58) for _ in range(4))
            owner_pw = b""
        if enc is not None:
            kind, user_pw, owner_pw = enc
        if kind == "rc4":
            id0 = bytes(rng.randrange(256) for _ in range(16))
            perms = -44  # typical restrictions mask, any int is honored
            # Algorithm 3: /O from the owner password (user pw when the
            # owner pw is empty) encrypting the padded user password
            o_val = _rc4_cg(
                hashlib.md5(_pad_cg(owner_pw or user_pw)).digest()[:5],
                _pad_cg(user_pw))
            key = hashlib.md5(
                _pad_cg(user_pw) + o_val + struct.pack("<i", perms) + id0
            ).digest()[:5]
            u_val = _rc4_cg(key, _PDF_PW_PAD)

            def _enc(num, stream, _key=key):
                objkey = hashlib.md5(
                    _key + struct.pack("<I", num)[:3] + b"\x00\x00"
                ).digest()[:10]
                return _rc4_cg(objkey, stream)

            _encrypt_obj_streams(objs, _enc)
            enc_id = add(
                ("<< /Filter /Standard /V 1 /R 2 /P {} /O <{}> /U <{}> >>"
                 .format(perms, o_val.hex(), u_val.hex())).encode()
            )
            trailer_extra = (f" /Encrypt {enc_id} 0 R"
                             f" /ID [<{id0.hex()}> <{id0.hex()}>]")
        elif kind == "aesv2":
            id0 = bytes(rng.randrange(256) for _ in range(16))
            perms = -3904  # high-security restrictions mask
            # Algorithm 3 (R4): /O from the owner password (user pw when
            # the owner pw is empty) encrypting the padded user password
            d = hashlib.md5(_pad_cg(owner_pw or user_pw)).digest()
            for _ in range(50):
                d = hashlib.md5(d).digest()
            rc4key = d[:16]
            o_val = _rc4_cg(rc4key, _pad_cg(user_pw))
            for i in range(1, 20):
                o_val = _rc4_cg(bytes(b ^ i for b in rc4key), o_val)
            # Algorithm 2 (128-bit, 50-fold md5)
            d = hashlib.md5(
                _pad_cg(user_pw) + o_val + struct.pack("<i", perms) + id0
            ).digest()
            for _ in range(50):
                d = hashlib.md5(d[:16]).digest()
            key = d[:16]
            # Algorithm 5: /U (first 16 bytes significant, 16 pad)
            u_val = _rc4_cg(key, hashlib.md5(_PDF_PW_PAD + id0).digest())
            for i in range(1, 20):
                u_val = _rc4_cg(bytes(b ^ i for b in key), u_val)
            u_val += bytes(16)

            def _enc(num, stream, _key=key):
                objkey = hashlib.md5(
                    _key + struct.pack("<I", num)[:3] + b"\x00\x00sAlT"
                ).digest()[:16]
                iv = bytes(rng.randrange(256) for _ in range(16))
                pad = 16 - len(stream) % 16
                return iv + _aes.cbc_encrypt(
                    objkey, iv, stream + bytes([pad]) * pad)

            _encrypt_obj_streams(objs, _enc)
            enc_id = add((
                "<< /Filter /Standard /V 4 /R 4 /Length 128"
                " /CF << /StdCF << /AuthEvent /DocOpen /CFM /AESV2"
                " /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
                f" /P {perms} /O <{o_val.hex()}> /U <{u_val.hex()}> >>"
            ).encode())
            trailer_extra = (f" /Encrypt {enc_id} 0 R"
                             f" /ID [<{id0.hex()}> <{id0.hex()}>]")
        else:  # AES-256, V5/R6
            perms = -3904
            key = bytes(rng.randrange(256) for _ in range(32))
            vsalt = bytes(rng.randrange(256) for _ in range(8))
            ksalt = bytes(rng.randrange(256) for _ in range(8))
            upw = user_pw[:127]  # ISO 32000-2: UTF-8, 127-byte cap
            opw = (owner_pw or user_pw)[:127]
            u_val = _hash_2b_cg(upw, vsalt, b"") + vsalt + ksalt
            ue = _aes.cbc_encrypt(_hash_2b_cg(upw, ksalt, b""),
                                  bytes(16), key)
            ovs = bytes(rng.randrange(256) for _ in range(8))
            oks = bytes(rng.randrange(256) for _ in range(8))
            o_val = _hash_2b_cg(opw, ovs, u_val) + ovs + oks
            oe = _aes.cbc_encrypt(_hash_2b_cg(opw, oks, u_val),
                                  bytes(16), key)
            pblk = (struct.pack("<i", perms) + b"\xff\xff\xff\xffTadb"
                    + bytes(rng.randrange(256) for _ in range(4)))
            pval = _aes.ecb_encrypt(key, pblk)

            def _enc(num, stream, _key=key):
                iv = bytes(rng.randrange(256) for _ in range(16))
                pad = 16 - len(stream) % 16
                return iv + _aes.cbc_encrypt(
                    _key, iv, stream + bytes([pad]) * pad)

            _encrypt_obj_streams(objs, _enc)
            enc_id = add((
                "<< /Filter /Standard /V 5 /R 6 /Length 256"
                " /CF << /StdCF << /AuthEvent /DocOpen /CFM /AESV3"
                " /Length 32 >> >> /StmF /StdCF /StrF /StdCF"
                f" /P {perms} /U <{u_val.hex()}> /O <{o_val.hex()}>"
                f" /UE <{ue.hex()}> /OE <{oe.hex()}> /Perms <{pval.hex()}> >>"
            ).encode())
            trailer_extra = f" /Encrypt {enc_id} 0 R"

    buf = io.BytesIO()
    buf.write(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(buf.tell())
        buf.write(f"{i} 0 obj\n".encode() + body + b"\nendobj\n")
    xref_pos = buf.tell()
    buf.write(f"xref\n0 {len(objs)+1}\n".encode())
    buf.write(b"0000000000 65535 f \n")
    for off in offsets[1:]:
        buf.write(f"{off:010d} 00000 n \n".encode())
    buf.write(
        f"trailer\n<< /Size {len(objs)+1} /Root {catalog_id} 0 R{trailer_extra} >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n".encode()
    )
    return buf.getvalue()


# ---------------------------------------------------------------- OOXML

def _zip_bytes(entries: list[tuple[str, bytes]],
               stored: frozenset[str] | set[str] = frozenset()) -> bytes:
    """Deterministic zip container: member mtimes are PINNED.  Plain
    ``writestr(name, ...)`` stamps wall-clock into the DOS time fields,
    which made OOXML/ODT payload BYTES differ between processes (the
    extracted text never sees zip headers, so only a byte-level check —
    the WARC round-trip oracle — could catch it).  The corpus contract
    is 'pure function of (i, seed)'; this restores it.

    ``stored`` members are written uncompressed (EPUB OCF requires its
    ``mimetype`` entry ZIP_STORED and first)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in entries:
            zi = zipfile.ZipInfo(name, date_time=(2025, 1, 1, 0, 0, 0))
            zi.compress_type = (
                zipfile.ZIP_STORED if name in stored else zipfile.ZIP_DEFLATED)
            zi.external_attr = 0o600 << 16
            zf.writestr(zi, data)
    return buf.getvalue()


_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"


def _gen_docx(rng: random.Random) -> bytes:
    paras = []
    for _ in range(rng.randint(3, 12)):
        runs = [f"<w:r><w:t xml:space=\"preserve\">{_sentences(rng, rng.randint(1, 3))}</w:t></w:r>"]
        if rng.random() < 0.3:
            runs.append("<w:r><w:tab/><w:t>tabbed</w:t></w:r>")
        if rng.random() < 0.2:
            runs.append("<w:r><w:br/><w:t>after break</w:t></w:r>")
        paras.append(f"<w:p>{''.join(runs)}</w:p>")
    doc = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>{"".join(paras)}</w:body></w:document>'
    )
    return _zip_bytes([
        ("[Content_Types].xml",
         b'<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
         b'<Default Extension="xml" ContentType="application/xml"/></Types>'),
        ("word/document.xml", doc.encode("utf-8")),
    ])


def _gen_pptx(rng: random.Random) -> bytes:
    entries = [
        ("[Content_Types].xml", b'<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>'),
        ("ppt/presentation.xml", b'<?xml version="1.0"?><p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"/>'),
    ]
    for s in range(1, rng.randint(3, 10) + 1):
        paras = "".join(
            f'<a:p><a:r><a:t>{_sentences(rng, 1)}</a:t></a:r></a:p>'
            for _ in range(rng.randint(1, 4))
        )
        slide = (
            f'<?xml version="1.0"?><p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
            f'xmlns:a="{_A}"><p:cSld><p:spTree><p:sp><p:txBody>{paras}</p:txBody></p:sp></p:spTree></p:cSld></p:sld>'
        )
        entries.append((f"ppt/slides/slide{s}.xml", slide.encode("utf-8")))
    return _zip_bytes(entries)


def _gen_xlsx(rng: random.Random) -> bytes:
    shared = [
        _words(rng, rng.randint(1, 4)) for _ in range(rng.randint(4, 10))
    ]
    sst = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="{n}" uniqueCount="{n}">'.format(n=len(shared))
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    entries = [
        ("[Content_Types].xml", b'<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>'),
        ("xl/workbook.xml", b'<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="S1" sheetId="1"/><sheet name="S2" sheetId="2"/></sheets></workbook>'),
        ("xl/sharedStrings.xml", sst.encode("utf-8")),
    ]
    for sheet_n in (1, 2):
        rows = []
        for r in range(1, rng.randint(3, 8) + 1):
            cells = []
            for ci, col in enumerate("ABCD"):
                kind = rng.random()
                if kind < 0.4:
                    cells.append(f'<c r="{col}{r}" t="s"><v>{rng.randrange(len(shared))}</v></c>')
                elif kind < 0.6:
                    cells.append(f'<c r="{col}{r}" t="inlineStr"><is><t>{rng.choice(_WORDS)}</t></is></c>')
                else:
                    cells.append(f'<c r="{col}{r}"><v>{rng.randint(0, 9999)}</v></c>')
            rows.append(f'<row r="{r}">{"".join(cells)}</row>')
        sheet = (
            '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f'<sheetData>{"".join(rows)}</sheetData></worksheet>'
        )
        entries.append((f"xl/worksheets/sheet{sheet_n}.xml", sheet.encode("utf-8")))
    return _zip_bytes(entries)


def _gen_odt(rng: random.Random) -> bytes:
    t_ns = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    body = []
    body.append(f'<text:h text:outline-level="1">{_words(rng, 4)}</text:h>')
    for _ in range(rng.randint(3, 10)):
        s = _sentences(rng, rng.randint(1, 4))
        if rng.random() < 0.2:
            s += "<text:tab/>tabbed part"
        if rng.random() < 0.15:
            s += "<text:line-break/>broken line"
        body.append(f"<text:p>{s}</text:p>")
    content = (
        f'<?xml version="1.0"?><office:document-content '
        f'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        f'xmlns:text="{t_ns}"><office:body><office:text>{"".join(body)}'
        f"</office:text></office:body></office:document-content>"
    )
    return _zip_bytes([
        ("mimetype", b"application/vnd.oasis.opendocument.text"),
        ("content.xml", content.encode("utf-8")),
    ])


def _gen_ods(rng: random.Random) -> bytes:
    """OpenDocument spreadsheet: 1-2 tables, cells with repeated-column
    runs, multi-paragraph cells, trailing repeat-padded filler cells."""
    tables = []
    for t in range(1 if rng.random() < 0.7 else 2):
        rows = []
        ncols = rng.randint(2, 4)
        for r in range(rng.randint(2, 6)):
            cells = []
            for c in range(ncols):
                if rng.random() < 0.15:
                    cells.append('<table:table-cell '
                                 'table:number-columns-repeated="2">'
                                 f"<text:p>{_words(rng, 1)}</text:p>"
                                 "</table:table-cell>")
                elif rng.random() < 0.1:
                    cells.append("<table:table-cell>"
                                 f"<text:p>{_words(rng, 2)}</text:p>"
                                 f"<text:p>{_words(rng, 1)}</text:p>"
                                 "</table:table-cell>")
                else:
                    v = (str(rng.randint(0, 9999)) if rng.random() < 0.4
                         else _words(rng, rng.randint(1, 2)))
                    cells.append("<table:table-cell>"
                                 f"<text:p>{v}</text:p></table:table-cell>")
            # ODF writers pad rows to the column max with repeated empties
            cells.append('<table:table-cell '
                         'table:number-columns-repeated="1000"/>')
            rows.append(f"<table:table-row>{''.join(cells)}"
                        "</table:table-row>")
        tables.append(f'<table:table table:name="T{t}">{"".join(rows)}'
                      "</table:table>")
    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        f'<office:body><office:spreadsheet>{"".join(tables)}'
        "</office:spreadsheet></office:body></office:document-content>"
    )
    return _zip_bytes([
        ("mimetype", b"application/vnd.oasis.opendocument.spreadsheet"),
        ("content.xml", content.encode("utf-8")),
    ])


def _gen_odp(rng: random.Random) -> bytes:
    """OpenDocument presentation: draw:pages with title + outline frames."""
    pages = []
    for p in range(rng.randint(2, 6)):
        paras = "".join(
            f"<text:p>{_sentences(rng, rng.randint(1, 2))}</text:p>"
            for _ in range(rng.randint(1, 4)))
        pages.append(
            f'<draw:page draw:name="page{p + 1}">'
            f"<draw:frame><draw:text-box>"
            f"<text:p>{_words(rng, 3)}</text:p></draw:text-box></draw:frame>"
            f"<draw:frame><draw:text-box>{paras}</draw:text-box>"
            "</draw:frame></draw:page>")
    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        f'<office:body><office:presentation>{"".join(pages)}'
        "</office:presentation></office:body></office:document-content>"
    )
    return _zip_bytes([
        ("mimetype", b"application/vnd.oasis.opendocument.presentation"),
        ("content.xml", content.encode("utf-8")),
    ])


def _gen_msg(rng: random.Random) -> bytes:
    """Outlook .msg: CFB with MAPI property streams — subject 0x0037,
    body 0x1000, each PT_UNICODE (001F) or PT_STRING8 (001E)."""
    subject = _words(rng, rng.randint(3, 6))
    body = _sentences(rng, rng.randint(3, 10))
    if rng.random() < 0.3:
        body += " café résumé"
    streams = []
    if rng.random() < 0.6:
        streams.append(("__substg1.0_0037001F",
                        subject.encode("utf-16-le")))
    else:
        streams.append(("__substg1.0_0037001E",
                        subject.encode("cp1252", "replace")))
    if rng.random() < 0.6:
        streams.append(("__substg1.0_1000001F", body.encode("utf-16-le")))
    else:
        streams.append(("__substg1.0_1000001E",
                        body.encode("cp1252", "replace")))
    streams.append(("__properties_version1.0", b"\x00" * 32))
    return _cfb_container(streams)


def _gen_mht(rng: random.Random) -> bytes:
    """MHTML saved web page: multipart/related with a quoted-printable or
    base64 text/html root part (+ an image part that must be ignored).
    Sniffs as eml — extract_eml routes the html part through X1."""
    import base64
    import quopri

    title = _words(rng, 3)
    paras = "\n".join(f"<p>{_sentences(rng, rng.randint(1, 3))}</p>"
                      for _ in range(rng.randint(2, 6)))
    html = (f"<html><head><title>{title}</title></head><body>"
            f"<h1>{title}</h1>\n{paras}\n"
            "<div><a href='/x'>nav</a> <a href='/y'>links</a> "
            "<a href='/z'>bar</a></div></body></html>").encode("utf-8")
    boundary = f"----MultipartBoundary--{rng.randrange(10 ** 12):012d}----"
    if rng.random() < 0.5:
        enc, payload = "quoted-printable", quopri.encodestring(html)
    else:
        enc, payload = "base64", base64.encodebytes(html)
    img = base64.encodebytes(bytes(rng.randrange(256) for _ in range(48)))
    dom = rng.choice(_DOMAINS)
    parts = [
        f"From: <Saved by cc_extract>\r\n"
        f"Subject: {title.encode('ascii', 'replace').decode()}\r\n"
        f"MIME-Version: 1.0\r\n"
        f"Content-Type: multipart/related; type=\"text/html\"; "
        f"boundary=\"{boundary}\"\r\n\r\n",
        f"--{boundary}\r\n"
        f"Content-Type: text/html; charset=utf-8\r\n"
        f"Content-Transfer-Encoding: {enc}\r\n"
        f"Content-Location: https://{dom}/saved.html\r\n\r\n",
        payload.decode("ascii"), "\r\n",
        f"--{boundary}\r\n"
        f"Content-Type: image/png\r\n"
        f"Content-Transfer-Encoding: base64\r\n\r\n",
        img.decode("ascii"), "\r\n",
        f"--{boundary}--\r\n",
    ]
    return "".join(parts).encode("ascii")


def _gen_zip(rng: random.Random) -> bytes:
    """Plain zip bundle: 2-4 text-ish members (txt/csv/html/json mix),
    occasionally a nested zip (must be SKIPPED: depth-1) and an empty
    directory entry; insertion order deliberately differs from name
    order (the reader sorts by name)."""
    members: list[tuple[str, bytes]] = []
    n = rng.randint(2, 4)
    kinds = [rng.choice(["txt", "csv", "html", "json"]) for _ in range(n)]
    for k, kind in enumerate(kinds):
        name = f"part{k + 1:02d}.{kind}"
        members.append((name, _GENERATORS[kind](rng)))
    if rng.random() < 0.3:
        inner = _zip_bytes([("inner.txt", _gen_txt(rng))])
        members.append(("nested.zip", inner))
    members.append(("empty_dir/", b""))
    rng.shuffle(members)
    return _zip_bytes(members)


def _tar_bytes(entries: list[tuple[str, bytes]]) -> bytes:
    """Deterministic POSIX ustar container: member mtimes/uid/gid PINNED
    (same discipline as ``_zip_bytes`` — bundle headers never reach the
    extracted text, but byte-level corpus identity must be stable).
    A name ending in '/' becomes a directory entry."""
    import tarfile as _tarfile

    buf = io.BytesIO()
    with _tarfile.open(fileobj=buf, mode="w",
                       format=_tarfile.USTAR_FORMAT) as tf:
        for name, data in entries:
            ti = _tarfile.TarInfo(name.rstrip("/"))
            ti.mtime = 1735689600  # 2025-01-01T00:00:00Z
            ti.uid = ti.gid = 0
            ti.uname = ti.gname = ""
            if name.endswith("/"):
                ti.type = _tarfile.DIRTYPE
                ti.mode = 0o755
                tf.addfile(ti)
            else:
                ti.size = len(data)
                ti.mode = 0o644
                tf.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def _gen_tar(rng: random.Random) -> bytes:
    """Plain tar bundle, the ``_gen_zip`` semantics on the other archive
    family: 2-4 text-ish members in shuffled insertion order (reader
    sorts by name), occasionally a nested archive (SKIPPED: depth-1) and
    a directory entry; ~25% of bundles ship compression-wrapped as
    .tar.gz (the dispatcher unwraps, then routes tar)."""
    members: list[tuple[str, bytes]] = []
    n = rng.randint(2, 4)
    kinds = [rng.choice(["txt", "csv", "html", "json"]) for _ in range(n)]
    for k, kind in enumerate(kinds):
        name = f"part{k + 1:02d}.{kind}"
        members.append((name, _GENERATORS[kind](rng)))
    if rng.random() < 0.3:
        nested_kind = rng.random()
        if nested_kind < 0.5:
            members.append(("nested.tar",
                            _tar_bytes([("inner.txt", _gen_txt(rng))])))
        else:
            members.append(("nested.zip",
                            _zip_bytes([("inner.txt", _gen_txt(rng))])))
    members.append(("subdir/", b""))
    rng.shuffle(members)
    payload = _tar_bytes(members)
    if rng.random() < 0.25:
        import gzip as _gzip
        payload = _gzip.compress(payload, compresslevel=6, mtime=0)
    return payload


def _gen_epub(rng: random.Random) -> bytes:
    """EPUB OCF container: stored-first ``mimetype``, container.xml ->
    OPF rootfile, manifest in SHUFFLED order with the spine defining the
    true reading order (the extractor must follow the spine, not the
    manifest or the zip directory), plus a nav.xhtml that is in the
    manifest but NOT the spine (must never be extracted)."""
    n_ch = rng.randint(2, 5)
    chapters: list[tuple[str, bytes]] = []
    for c in range(1, n_ch + 1):
        title = _words(rng, 3)
        paras = "\n".join(
            f"<p>{_sentences(rng, rng.randint(2, 5))}</p>"
            for _ in range(rng.randint(2, 6)))
        chap = (
            '<?xml version="1.0" encoding="utf-8"?>\n'
            '<html xmlns="http://www.w3.org/1999/xhtml">'
            f"<head><title>{title}</title></head>\n"
            f"<body><h1>{title}</h1>\n{paras}\n</body></html>"
        )
        chapters.append((f"chap{c}.xhtml", chap.encode("utf-8")))
    order = list(range(1, n_ch + 1))
    rng.shuffle(order)
    items = "".join(
        f'<item id="c{c}" href="text/chap{c}.xhtml" '
        f'media-type="application/xhtml+xml"/>' for c in order)
    spine = "".join(f'<itemref idref="c{c}"/>' for c in range(1, n_ch + 1))
    opf = (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="uid">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        '<dc:identifier id="uid">urn:uuid:0</dc:identifier>'
        f"<dc:title>{_words(rng, 4)}</dc:title></metadata>"
        f'<manifest>{items}<item id="nav" href="nav.xhtml" '
        'media-type="application/xhtml+xml" properties="nav"/></manifest>'
        f"<spine>{spine}</spine></package>"
    )
    nav = (
        '<?xml version="1.0"?>'
        '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
        '<nav xmlns:epub="http://www.idpf.org/2007/ops" epub:type="toc">'
        '<ol><li><a href="text/chap1.xhtml">table of contents</a></li></ol>'
        "</nav></body></html>"
    )
    container = (
        '<?xml version="1.0"?>'
        '<container version="1.0" '
        'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles></container>'
    )
    entries = [
        ("mimetype", b"application/epub+zip"),
        ("META-INF/container.xml", container.encode("utf-8")),
        ("OEBPS/content.opf", opf.encode("utf-8")),
        ("OEBPS/nav.xhtml", nav.encode("utf-8")),
    ]
    entries += [(f"OEBPS/text/{n}", b) for n, b in chapters]
    return _zip_bytes(entries, stored={"mimetype"})


# ------------------------------------------------------------ legacy .doc

def _cfb_container(streams: list[tuple[str, bytes]]) -> bytes:
    """Minimal valid [MS-CFB] file, 512-byte sectors, no mini stream
    (streams padded past the 4096-byte cutoff)."""
    import struct

    SS = 512
    ENDOFCHAIN, FREESECT, FATSECT, NOSTREAM = 0xFFFFFFFE, 0xFFFFFFFF, 0xFFFFFFFD, 0xFFFFFFFF

    padded = []
    for name, data in streams:
        data = data + b"\x00" * max(0, 4096 - len(data))
        data += b"\x00" * ((-len(data)) % SS)
        padded.append((name, data))

    sectors: list[bytes] = []
    dir_sector_idx = 0
    sectors.append(b"")  # placeholder for directory
    starts = []
    for _, data in padded:
        starts.append(len(sectors))
        for off in range(0, len(data), SS):
            sectors.append(data[off : off + SS])
    fat_idx = len(sectors)

    fat = [FREESECT] * (SS // 4)
    fat[dir_sector_idx] = ENDOFCHAIN
    for (name, data), start in zip(padded, starts):
        n = len(data) // SS
        for i in range(n - 1):
            fat[start + i] = start + i + 1
        fat[start + n - 1] = ENDOFCHAIN
    fat[fat_idx] = FATSECT
    sectors.append(struct.pack(f"<{SS // 4}I", *fat))

    def dir_entry(name: str, etype: int, start: int, size: int,
                  left=NOSTREAM, right=NOSTREAM, child=NOSTREAM) -> bytes:
        raw_name = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[0 : len(raw_name)] = raw_name
        struct.pack_into("<H", e, 64, len(raw_name))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, left, right, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    assert 1 <= len(padded) <= 3  # one directory sector
    dirs = dir_entry("Root Entry", 5, ENDOFCHAIN, 0, child=1)
    for k, ((name, data), start) in enumerate(zip(padded, starts)):
        right = k + 2 if k + 1 < len(padded) else NOSTREAM
        dirs += dir_entry(name, 2, start, len(data), right=right)
    while len(dirs) < 4 * 128:
        dirs += dir_entry("", 0, 0, 0)  # unused slot -> skipped by readers
    sectors[dir_sector_idx] = dirs.ljust(SS, b"\x00")

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    import struct as _s
    _s.pack_into("<H", header, 26, 0x003E)   # minor version
    _s.pack_into("<H", header, 28, 0x0003)   # major version 3 (512-byte)
    _s.pack_into("<H", header, 30, 9)        # sector shift
    _s.pack_into("<H", header, 32, 6)        # mini sector shift
    _s.pack_into("<H", header, 24, 0xFFFE)   # byte order
    _s.pack_into("<I", header, 44, 1)        # number of FAT sectors
    _s.pack_into("<I", header, 48, dir_sector_idx)
    _s.pack_into("<I", header, 56, 4096)     # mini stream cutoff
    _s.pack_into("<I", header, 60, ENDOFCHAIN)  # first miniFAT sector
    _s.pack_into("<I", header, 64, 0)        # miniFAT count
    _s.pack_into("<I", header, 68, ENDOFCHAIN)  # first DIFAT sector
    _s.pack_into("<I", header, 72, 0)        # DIFAT sector count
    difat = [fat_idx] + [FREESECT] * 108
    _s.pack_into("<109I", header, 76, *difat)
    return bytes(header) + b"".join(sectors)


def _gen_doc(rng: random.Random) -> bytes:
    """Spec-correct minimal Word 97 binary: FIB + piece table (one cp1252
    piece + one UTF-16 piece) so the reader exercises both encodings."""
    import struct

    text1 = _sentences(rng, rng.randint(2, 6)).encode("ascii", "replace").decode()
    text2 = _sentences(rng, rng.randint(1, 4)) + " café résumé"
    part1 = (text1 + "\r").encode("cp1252")
    part2 = text2.encode("utf-16-le")

    TEXT1_OFF = 0x0800
    text2_off = TEXT1_OFF + len(part1)
    if text2_off % 2:  # utf-16 piece must be 2-byte aligned
        part1 += b" "
        text2_off += 1

    word = bytearray(text2_off + len(part2))
    struct.pack_into("<H", word, 0, 0xA5EC)        # wIdent
    struct.pack_into("<H", word, 2, 0x00C1)        # nFib (Word 97)
    struct.pack_into("<H", word, 10, 0x0200)       # fWhichTblStm -> 1Table
    struct.pack_into("<I", word, 24, TEXT1_OFF)    # fcMin (legacy fallback)
    struct.pack_into("<I", word, 28, text2_off)    # fcMac
    word[TEXT1_OFF : TEXT1_OFF + len(part1)] = part1
    word[text2_off : text2_off + len(part2)] = part2

    n1 = len(part1)
    n2 = len(part2) // 2
    cps = [0, n1, n1 + n2]
    pcd1 = struct.pack("<HIH", 0, (TEXT1_OFF * 2) | 0x40000000, 0)  # compressed
    pcd2 = struct.pack("<HIH", 0, text2_off, 0)                     # unicode
    plcpcd = struct.pack("<3I", *cps) + pcd1 + pcd2
    clx = b"\x02" + struct.pack("<I", len(plcpcd)) + plcpcd
    struct.pack_into("<I", word, 0x01A2, 0)          # fcClx (offset in 1Table)
    struct.pack_into("<I", word, 0x01A6, len(clx))   # lcbClx

    return _cfb_container([("WordDocument", bytes(word)), ("1Table", clx)])


# ----------------------------------------------------- legacy .xls/.ppt

def _biff_rec(rt: int, data: bytes) -> bytes:
    import struct
    return struct.pack("<HH", rt, len(data)) + data


def _xls_sst_fragments(strings: list[tuple[str, bool]],
                       cap: int) -> list[bytes]:
    """Serialize XLUnicodeRichExtendedStrings into SST + CONTINUE payload
    fragments of at most *cap* bytes, splitting only at legal points:
    never inside a header, char splits restate the option byte in the
    next fragment ([MS-XLS] 2.5.293).  ``strings`` carries (text, rich);
    rich strings get one synthetic FormatRun and are kept unsplit."""
    import struct

    frags: list[bytearray] = [bytearray()]

    def room() -> int:
        return cap - len(frags[-1])

    def new_frag() -> None:
        frags.append(bytearray())

    frags[0] += struct.pack("<II", len(strings), len(strings))
    for text, rich in strings:
        # write non-ascii strings uncompressed (UTF-16) so the reader's
        # fHighByte path sees real traffic even though latin-1 would fit
        high = any(ord(c) > 0x7F for c in text)
        flags = (0x01 if high else 0x00) | (0x08 if rich else 0x00)
        hdr = struct.pack("<HB", len(text), flags)
        if rich:
            hdr += struct.pack("<H", 1)  # one FormatRun
        chars = (text.encode("utf-16-le") if high
                 else text.encode("latin-1"))
        run = struct.pack("<HH", 0, 0) if rich else b""
        if rich:
            # keep rich strings whole (writer simplification; the reader
            # handles raw-continued run data anyway)
            if room() < len(hdr) + len(chars) + len(run):
                new_frag()
            frags[-1] += hdr + chars + run
            continue
        if room() < len(hdr) + (2 if high else 1):
            new_frag()  # header + at least one char must fit
        frags[-1] += hdr
        width = 2 if high else 1
        pos = 0
        while pos < len(chars):
            if room() < width:
                new_frag()
                frags[-1].append(0x01 if high else 0x00)  # restated flags
            take = min(len(chars) - pos, (room() // width) * width)
            frags[-1] += chars[pos : pos + take]
            pos += take
    return [bytes(f) for f in frags]


def _gen_xls(rng: random.Random) -> bytes:
    """Spec-correct minimal BIFF8 workbook: globals substream (BOF,
    BOUNDSHEETs, SST with CONTINUE spill, EOF) + 1-2 worksheet substreams
    exercising every cell record the reader supports (LABELSST incl.
    UTF-16 strings, LABEL, NUMBER, RK int/x100/double, MULRK, BOOLERR,
    FORMULA cached number/string/bool + STRING)."""
    import struct

    n_sheets = 1 if rng.random() < 0.6 else 2
    sst_strings: list[tuple[str, bool]] = []

    def sst_add(text: str, rich: bool = False) -> int:
        sst_strings.append((text, rich))
        return len(sst_strings) - 1

    sheets: list[bytes] = []
    for _ in range(n_sheets):
        ncols = rng.randint(2, 5)
        nrows = rng.randint(3, 8)
        body = bytearray()
        # header row: shared strings (one occasionally rich)
        for c in range(ncols):
            isst = sst_add(rng.choice(_WORDS), rich=(rng.random() < 0.15))
            body += _biff_rec(0x00FD, struct.pack("<HHHI", 0, c, 0, isst))
        for r in range(1, nrows):
            for c in range(ncols):
                kind = rng.random()
                base = struct.pack("<HHH", r, c, 0)
                if kind < 0.35:
                    isst = sst_add(_words(rng, rng.randint(1, 3)))
                    body += _biff_rec(
                        0x00FD, struct.pack("<HHHI", r, c, 0, isst))
                elif kind < 0.5:
                    body += _biff_rec(
                        0x0203, base + struct.pack("<d", rng.randint(1, 9999)
                                                   + rng.randint(0, 3) * 0.25))
                elif kind < 0.62:  # RK integer (sometimes x100)
                    v = rng.randint(-5000, 5000)
                    if rng.random() < 0.4:
                        rk = ((v & 0x3FFFFFFF) << 2) | 0x03  # int, /100
                    else:
                        rk = ((v & 0x3FFFFFFF) << 2) | 0x02  # int
                    body += _biff_rec(0x027E, base + struct.pack("<I", rk))
                elif kind < 0.7:  # RK double (low 34 bits zero)
                    v = rng.choice([1.5, 2.25, -3.5, 100.0, 0.75])
                    (bits,) = struct.unpack("<Q", struct.pack("<d", v))
                    rk = (bits >> 32) & 0xFFFFFFFC
                    body += _biff_rec(0x027E, base + struct.pack("<I", rk))
                elif kind < 0.78 and c + 2 < ncols:
                    n = min(rng.randint(2, 3), ncols - c)
                    payload = struct.pack("<HH", r, c)
                    for k in range(n):
                        v = rng.randint(0, 999)
                        payload += struct.pack("<HI", 0, (v << 2) | 0x02)
                    payload += struct.pack("<H", c + n - 1)
                    body += _biff_rec(0x00BD, payload)
                elif kind < 0.85:
                    if rng.random() < 0.7:
                        body += _biff_rec(0x0205, base + bytes(
                            [1 if rng.random() < 0.5 else 0, 0]))
                    else:
                        body += _biff_rec(0x0205, base + bytes([0x0F, 1]))
                elif kind < 0.93:  # FORMULA cached number
                    num = struct.pack("<d", rng.randint(1, 500) + 0.5)
                    body += _biff_rec(
                        0x0006, base + num + struct.pack("<HIH", 0, 0, 0))
                else:  # FORMULA cached string + STRING record
                    s = rng.choice(_WORDS)
                    body += _biff_rec(0x0006, base
                                      + b"\x00\x00\x00\x00\x00\x00\xff\xff"
                                      + struct.pack("<HIH", 0, 0, 0))
                    enc = s.encode("latin-1")
                    body += _biff_rec(0x0207, struct.pack("<HB", len(s), 0)
                                      + enc)
        bof = _biff_rec(0x0809, struct.pack("<HHHHII",
                                            0x0600, 0x0010, 0x0DBB,
                                            0x07CC, 0, 0))
        sheets.append(bof + bytes(body) + _biff_rec(0x000A, b""))

    # a low cap forces CONTINUE records (incl. mid-string char splits)
    # on roughly half the workbooks
    cap = rng.choice([64, 96, 8224])
    sst_frags = _xls_sst_fragments(sst_strings, cap)
    sst_recs = _biff_rec(0x00FC, sst_frags[0]) + b"".join(
        _biff_rec(0x003C, f) for f in sst_frags[1:])

    bof_g = _biff_rec(0x0809, struct.pack("<HHHHII",
                                          0x0600, 0x0005, 0x0DBB,
                                          0x07CC, 0, 0))
    eof = _biff_rec(0x000A, b"")
    # two-pass BOUNDSHEET lbPlyPos fixup
    names = [f"Sheet{k + 1}" for k in range(n_sheets)]
    bs_len = [4 + (4 + 2 + 1 + 1 + len(nm)) for nm in names]
    globals_len = (len(bof_g) + sum(bs_len) + len(sst_recs) + len(eof))
    positions, acc = [], globals_len
    for sh in sheets:
        positions.append(acc)
        acc += len(sh)
    bs_recs = b""
    for nm, pos in zip(names, positions):
        bs_recs += _biff_rec(0x0085, struct.pack("<IHB", pos, 0, len(nm))
                             + b"\x00" + nm.encode("latin-1"))
    workbook = bof_g + bs_recs + sst_recs + eof + b"".join(sheets)
    return _cfb_container([("Workbook", workbook)])


def _ppt_rec(ver_inst: int, rec_type: int, data: bytes) -> bytes:
    import struct
    return struct.pack("<HHI", ver_inst, rec_type, len(data)) + data


def _gen_ppt(rng: random.Random) -> bytes:
    """Spec-shaped minimal [MS-PPT] deck: DocumentContainer >
    SlideListWithTextContainer > per slide a SlidePersistAtom +
    TextHeaderAtom + TextCharsAtom (UTF-16) or TextBytesAtom (cp1252),
    which is exactly how linear saves store outline text."""
    import struct

    slides = []
    n_slides = rng.randint(2, 6)
    for s in range(n_slides):
        parts = [_ppt_rec(0x0000, 0x03F3,
                          struct.pack("<IIIHH", 0, 0, s + 1, 0, 0))]
        for _ in range(rng.randint(1, 3)):
            tx_type = rng.randint(0, 8)
            parts.append(_ppt_rec(0x0000, 0x0F9F,
                                  struct.pack("<I", tx_type)))
            text = _sentences(rng, rng.randint(1, 3))
            if rng.random() < 0.3:  # multi-paragraph atom: CR separator
                text += "\r" + _sentences(rng, 1)
            if rng.random() < 0.5:
                parts.append(_ppt_rec(0x0000, 0x0FA0,
                                      text.encode("utf-16-le")))
            else:
                parts.append(_ppt_rec(
                    0x0000, 0x0FA8,
                    text.encode("cp1252", "replace")))
        slides.append(b"".join(parts))
    slwt = _ppt_rec(0x000F, 0x0FF0, b"".join(slides))
    doc = _ppt_rec(0x000F, 0x03E8, slwt)
    current_user = struct.pack("<IIIIHHHH", 20, 0xE391C05F, 0, 0,
                               3, 0, 4, 0)
    return _cfb_container([("Current User", current_user),
                           ("PowerPoint Document", doc)])


def _gen_ole_other(rng: random.Random) -> bytes:
    """A valid CFB container that is neither Word nor Excel nor PowerPoint
    (Visio-style) — populates the ``unsupported_legacy`` quarantine."""
    junk = bytes(rng.randrange(256) for _ in range(rng.randint(64, 256)))
    return _cfb_container([("VisioDocument", junk)])


# ------------------------------------------------------------- the rest

def _gen_rtf(rng: random.Random) -> bytes:
    paras = []
    for _ in range(rng.randint(2, 8)):
        s = _sentences(rng, rng.randint(1, 3))
        s = s.replace("é", r"\'e9").replace("ü", r"\'fc").replace("ß", r"\'df") \
             .replace("ç", r"\'e7").replace("à", r"\'e0")
        s = s.encode("ascii", "replace").decode()  # any leftovers -> ?
        if rng.random() < 0.3:
            s += " " + "\\" + "u1055?" + "\\" + "u1088?"  # cyrillic via \uN, '?' fallback
        if rng.random() < 0.3:
            s += r" col1\tab col2"
        paras.append(s + r"\par")
    doc = (
        r"{\rtf1\ansi\ansicpg1252\deff0"
        r"{\fonttbl{\f0\fswiss Arial;}{\f1\froman Times;}}"
        r"{\colortbl;\red0\green0\blue0;\red255\green0\blue0;}"
        r"{\stylesheet{\s0 Normal;}}"
        r"{\*\generator cc_extract corpusgen;}"
        r"\f0\fs24 " + " ".join(paras) + "}"
    )
    return doc.encode("ascii")


def _ps_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _gen_ps(rng: random.Random) -> bytes:
    """Straight-line text PostScript: DSC header, moveto per line, text via
    show / ashow / widthshow (string is always the last operand)."""
    lines = []
    y = 720
    for _ in range(rng.randint(3, 12)):
        s = _ps_escape(_sentences(rng, rng.randint(1, 3)))
        style = rng.random()
        if style < 0.6:
            op = f"({s}) show"
        elif style < 0.8:
            op = f"0 0 ({s}) ashow"
        else:
            op = f"2 0 8#040 ({s}) widthshow"
        lines.append(f"72 {y} moveto {op}")
        y -= 14
    doc = (
        "%!PS-Adobe-3.0\n%%Title: synthetic\n"
        "/Times-Roman findfont 12 scalefont setfont\n"
        + "\n".join(lines) + "\nshowpage\n%%EOF\n"
    )
    return doc.encode("latin-1", "replace")


def _gen_txt(rng: random.Random) -> bytes:
    enc = rng.choice(["utf-8", "utf-8-sig", "cp1252", "latin-1"])
    text = "\n\n".join(_sentences(rng, rng.randint(2, 6)) for _ in range(rng.randint(2, 8)))
    if rng.random() < 0.4:
        # PII-shaped contact block (synthetic): exercises the leakage-scan
        # operators over extracted text (cc_pii_stats)
        dom = rng.choice(_DOMAINS)
        text += (
            f"\n\ncontact {rng.choice(_WORDS)}{rng.randrange(100)}@{dom}"
            f" or call {rng.randrange(10**9, 10**10)}"
            f" details at https://{dom}/{rng.choice(_WORDS)}"
        )
    try:
        return text.encode(enc)
    except UnicodeEncodeError:
        return text.encode("utf-8")


def _gen_xml(rng: random.Random) -> bytes:
    items = "".join(
        f"<item id='{j}'><name>{_words(rng, 2)}</name><desc>{_sentences(rng, 1)}</desc></item>"
        for j in range(rng.randint(2, 6))
    )
    return f"<?xml version='1.0' encoding='utf-8'?><catalog><title>{_words(rng, 3)}</title>{items}</catalog>".encode()


def _gen_json(rng: random.Random) -> bytes:
    import json as _json
    doc = {
        "title": _words(rng, 3),
        "tags": [rng.choice(_WORDS) for _ in range(4)],
        "body": {"sections": [{"heading": _words(rng, 2), "text": _sentences(rng, 2)}
                              for _ in range(rng.randint(1, 4))]},
        "count": rng.randint(0, 100),
    }
    return _json.dumps(doc).encode()


def _gen_eml(rng: random.Random) -> bytes:
    import quopri
    body_plain = "\n\n".join(_sentences(rng, 2) for _ in range(rng.randint(1, 4)))
    body_html = f"<html><body><p>{_sentences(rng, 3)}</p></body></html>"
    qp = quopri.encodestring(body_plain.encode("utf-8")).decode("ascii")
    boundary = f"b{rng.randrange(10**9)}"
    return (
        f"Received: from mx.example by mail.example; Wed, 1 Jan 2025 00:00:00 +0000\r\n"
        f"From: sender@{rng.choice(_DOMAINS)}\r\n"
        f"To: rcpt@{rng.choice(_DOMAINS)}\r\n"
        f"Subject: {_words(rng, 4)}\r\n"
        f"MIME-Version: 1.0\r\n"
        f'Content-Type: multipart/alternative; boundary="{boundary}"\r\n'
        f"\r\n--{boundary}\r\n"
        f"Content-Type: text/plain; charset=utf-8\r\n"
        f"Content-Transfer-Encoding: quoted-printable\r\n"
        f"\r\n{qp}\r\n"
        f"--{boundary}\r\n"
        f"Content-Type: text/html; charset=utf-8\r\n"
        f"\r\n{body_html}\r\n"
        f"--{boundary}--\r\n"
    ).encode("utf-8")


def _gen_csv(rng: random.Random) -> bytes:
    rows = ["id,name,desc,score"]
    for j in range(rng.randint(3, 12)):
        rows.append(f"{j},{_words(rng, 1)},{_words(rng, 3)},{rng.randint(0, 100)}")
    return "\n".join(rows).encode("utf-8")


def _png_gray(w: int, h: int, raster: bytes) -> bytes:
    """Valid minimal PNG: 8-bit grayscale, filter 0 scanlines, one IDAT."""
    import struct

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    scan = b"".join(b"\x00" + raster[y * w : (y + 1) * w] for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan, 6)) + chunk(b"IEND", b""))


def _bmp_gray(w: int, h: int, raster: bytes, rng: random.Random) -> bytes:
    """BMP writer (decoder pair: extractors/bmp.py): 8-bit gray-palette,
    24-bit BGR, or 32-bit BGRX, bottom-up or top-down, rows padded to 4
    bytes — independent transcription of the public DIB layout."""
    import struct

    variant = rng.choice(("pal8", "bgr24", "bgrx32"))
    top_down = rng.random() < 0.3
    bpp = {"pal8": 8, "bgr24": 24, "bgrx32": 32}[variant]
    stride = (w * (bpp // 8) + 3) & ~3
    palette = b""
    if variant == "pal8":
        palette = b"".join(bytes((v, v, v, 0)) for v in range(256))
    off_bits = 14 + 40 + len(palette)
    rows = []
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        if variant == "pal8":
            row = raster[y * w : (y + 1) * w]
        elif variant == "bgr24":
            row = b"".join(bytes((raster[y * w + x],) * 3) for x in range(w))
        else:
            row = b"".join(
                bytes((raster[y * w + x],) * 3) + b"\x00" for x in range(w))
        rows.append(row + b"\x00" * (stride - len(row)))
    pixels = b"".join(rows)
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp,
                      0, len(pixels), 2835, 2835,
                      256 if variant == "pal8" else 0, 0)
    file_hdr = b"BM" + struct.pack("<IHHI", off_bits + len(pixels), 0, 0,
                                   off_bits)
    return file_hdr + dib + palette + pixels


_PNG_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_filter_row(row: bytes, prev: bytes | None, ftype: int,
                    fstep: int) -> bytes:
    """Forward scanline filter (writer side; the decoder's reverse lives
    in extractors/png.py — independent transcriptions of spec §9)."""
    n = len(row)
    out = bytearray(n)
    for x in range(n):
        left = row[x - fstep] if x >= fstep else 0
        up = prev[x] if prev is not None else 0
        ul = prev[x - fstep] if (prev is not None and x >= fstep) else 0
        if ftype == 0:
            v = row[x]
        elif ftype == 1:
            v = row[x] - left
        elif ftype == 2:
            v = row[x] - up
        elif ftype == 3:
            v = row[x] - ((left + up) >> 1)
        else:  # Paeth
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            v = row[x] - pred
        out[x] = v & 0xFF
    return bytes(out)


def _png_scanlines(rows: list[bytes], fstep: int, rng) -> bytes:
    """Filter a sub-image's rows with a per-row filter type drawn from
    the full set — every decoder filter path gets exercised."""
    out = bytearray()
    prev = None
    for row in rows:
        ftype = rng.choice((0, 1, 2, 3, 4)) if prev is not None else rng.choice((0, 1))
        out.append(ftype)
        out += _png_filter_row(row, prev, ftype, fstep)
        prev = row
    return bytes(out)


def _png_color(w: int, h: int, raster: bytes, rng) -> bytes:
    """PNG writer covering the color-type long tail the decoder handles:
    palette (8- and 4-bit), truecolor RGB, RGBA, 16-bit gray, gray+alpha,
    optionally Adam7-interlaced, with Sub/Up/Average/Paeth filters mixed
    per scanline.  Gray value g encodes so the decoder's integer luma
    recovers exactly g (R=G=B=g; alpha 255; 16-bit g<<8|g), keeping the
    OCR round trip byte-exact — except 4-bit palette, which quantizes to
    17·(g>>4) (still far from the recognizer's binarization threshold)."""
    import struct

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    variant = rng.choice(
        ("palette8", "palette4", "rgb", "rgba", "gray16", "graya"))
    interlaced = variant in ("rgb", "rgba", "palette8") and rng.random() < 0.35

    def px(g: int) -> bytes:
        if variant == "palette8":
            return bytes((g,))
        if variant == "rgb":
            return bytes((g, g, g))
        if variant == "rgba":
            return bytes((g, g, g, 255))
        if variant == "gray16":
            return bytes((g, g))
        return bytes((g, 255))  # graya

    if variant == "palette4":
        depth, color, plte = 4, 3, b"".join(
            bytes((v * 17, v * 17, v * 17)) for v in range(16))
        bits_pp = 4
    elif variant == "palette8":
        depth, color, plte = 8, 3, b"".join(
            bytes((v, v, v)) for v in range(256))
        bits_pp = 8
    elif variant == "rgb":
        depth, color, plte, bits_pp = 8, 2, None, 24
    elif variant == "rgba":
        depth, color, plte, bits_pp = 8, 6, None, 32
    elif variant == "gray16":
        depth, color, plte, bits_pp = 16, 0, None, 16
    else:
        depth, color, plte, bits_pp = 8, 4, None, 16
    fstep = max(1, bits_pp >> 3)

    def sub_rows(x0: int, y0: int, dx: int, dy: int) -> list[bytes]:
        rows = []
        for y in range(y0, h, dy):
            if variant == "palette4":
                vals = [raster[y * w + x] >> 4 for x in range(x0, w, dx)]
                packed = bytearray()
                for i in range(0, len(vals), 2):
                    hi = vals[i] << 4
                    lo = vals[i + 1] if i + 1 < len(vals) else 0
                    packed.append(hi | lo)
                rows.append(bytes(packed))
            else:
                rows.append(b"".join(px(raster[y * w + x])
                                     for x in range(x0, w, dx)))
        return rows

    if interlaced:
        scan = bytearray()
        for (x0, y0, dx, dy) in _PNG_ADAM7:
            rows = sub_rows(x0, y0, dx, dy)
            if rows and rows[0]:
                scan += _png_scanlines(rows, fstep, rng)
        scan = bytes(scan)
    else:
        scan = _png_scanlines(sub_rows(0, 0, 1, 1), fstep, rng)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       1 if interlaced else 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(scan, 6)) + chunk(b"IEND", b"")


# Baseline-JFIF grayscale encoder (writer side of the OCR-lite JPEG loop;
# the decoder in extractors/jpeg.py is an independent implementation —
# they share only ITU-T T.81's public constants).  Near-lossless
# quantization (DC 1, AC 4) keeps DCT round-trip error far below the
# recognizer's 128 binarization threshold while still exercising the real
# codec: FDCT, zigzag, category coding, Annex K Huffman tables, stuffing.
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_JPEG_QUANT_ZZ = [1] + [4] * 63
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = bytes(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_JPEG_AC_VALS = bytes.fromhex(
    "01020300041105122131410613516107227114328191a108"
    "2342b1c11552d1f02433627282090a161718191a25262728"
    "292a3435363738393a434445464748494a53545556575859"
    "5a636465666768696a737475767778797a83848586878889"
    "8a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6"
    "b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2"
    "e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9fa"
)

_JPEG_COS = None  # built lazily: [u][x] = C(u)/2 * cos((2x+1)u*pi/16)


def _jpeg_tables():
    global _JPEG_COS
    if _JPEG_COS is None:
        import math
        _JPEG_COS = [
            [
                (math.sqrt(0.5) if u == 0 else 1.0) / 2.0
                * math.cos((2 * x + 1) * u * math.pi / 16.0)
                for x in range(8)
            ]
            for u in range(8)
        ]
    return _JPEG_COS


def _huff_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical per T.81 Annex C."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def restart(self, mnum: int) -> None:
        """Byte-align (1-pad) and emit RSTn — marker bytes are written
        raw, outside the stuffing path, per T.81 E.1.2."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (mnum % 8)])

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _jpeg_block_zz(blk, quant_zz) -> list[int]:
    """FDCT + zigzag quantize ONE 8x8 block of level-shifted floats ->
    64 quantized coefficients in zigzag order."""
    cos = _jpeg_tables()
    # separable FDCT: rows (x->u) then columns (y->v)
    tmp = [[sum(blk[y][x] * cos[u][x] for x in range(8))
            for u in range(8)] for y in range(8)]
    coef = [
        sum(tmp[y][u] * cos[v][y] for y in range(8))
        for v in range(8) for u in range(8)
    ]
    return [
        int(round(coef[_JPEG_ZIGZAG[i]] / quant_zz[i]))
        for i in range(64)
    ]


def _jpeg_encode_block(writer: "_JpegBitWriter", blk, pred: int,
                       dc_codes, ac_codes, quant_zz) -> int:
    """FDCT + zigzag quantize + category/run-size entropy code ONE 8x8
    block of level-shifted floats; returns the new DC predictor."""
    zz = _jpeg_block_zz(blk, quant_zz)
    diff = zz[0] - pred
    size = abs(diff).bit_length()
    writer.write(*dc_codes[size])
    if size:
        writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            writer.write(*ac_codes[0xF0])  # ZRL
            run -= 16
        v = zz[i]
        s = abs(v).bit_length()
        writer.write(*ac_codes[(run << 4) | s])
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        writer.write(*ac_codes[0x00])  # EOB
    return zz[0]


def _jpeg_gray(w: int, h: int, raster: bytes,
               restart_interval: int = 0) -> bytes:
    """Valid baseline JFIF: 8-bit grayscale, single component, Annex K
    Huffman tables, near-lossless custom quant table.  With
    *restart_interval* > 0 a DRI segment is emitted and every interval
    MCUs the writer byte-aligns, drops an RSTn marker (sequence number
    mod 8) and resets the DC predictor, per T.81 E.1.2/E.2.4."""
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw, bh = (w + 7) // 8, (h + 7) // 8
    writer = _JpegBitWriter()
    pred = 0
    mcu_done = 0
    rst = 0

    def px(x: int, y: int) -> int:  # edge-replicated sample, level-shifted
        return raster[min(y, h - 1) * w + min(x, w - 1)] - 128

    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu_done and mcu_done % restart_interval == 0:
                writer.restart(rst)
                rst += 1
                pred = 0
            mcu_done += 1
            blk = [[float(px(bx * 8 + x, by * 8 + y)) for x in range(8)]
                   for y in range(8)]
            pred = _jpeg_encode_block(
                writer, blk, pred, dc_codes, ac_codes, _JPEG_QUANT_ZZ)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes(_JPEG_QUANT_ZZ))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht = seg(
        0xC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS
        + b"\x10" + bytes(_JPEG_AC_BITS) + _JPEG_AC_VALS,
    )
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (b"\xff\xd8" + app0 + dqt + sof + dht + dri + sos
            + writer.flush() + b"\xff\xd9")


def _jpeg_color(w: int, h: int, raster: bytes,
                sampling: tuple[int, int] = (2, 2),
                restart_interval: int = 0) -> bytes:
    """Valid baseline color JFIF: YCbCr with luma sampling *sampling*
    ((2,2) = 4:2:0, (2,1) = 4:2:2, (1,1) = 4:4:4), interleaved single
    scan, separate luma/chroma Huffman table ids and quant tables.  Y is
    the page raster; Cb/Cr carry a content-derived tint (a real chroma
    signal, exercising subsampling + the chroma entropy path) that the
    grayscale decoder must skip over without desyncing.  Optional DRI /
    RSTn restart markers as in _jpeg_gray (all three DC predictors
    reset)."""
    sh, sv = sampling
    dc_l = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_l = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    # chroma tables: same Annex K contents under table id 1 (the decoder
    # must build them from the DHT declarations, not assume id 0)
    dc_c, ac_c = dc_l, ac_l
    chroma_quant = [1] + [8] * 63

    def y_px(x: int, y: int) -> float:
        return float(raster[min(y, h - 1) * w + min(x, w - 1)] - 128)

    def cb_px(x: int, y: int) -> float:
        # subsampled tint: ink leans blue, background stays warm
        sx, sy = min(sh * x, w - 1), min(sv * y, h - 1)
        v = raster[min(sy, h - 1) * w + min(sx, w - 1)]
        return float(((255 - v) >> 3))  # 0 (white) .. ~31 (ink)

    def cr_px(x: int, y: int) -> float:
        sx, sy = min(sh * x, w - 1), min(sv * y, h - 1)
        v = raster[min(sy, h - 1) * w + min(sx, w - 1)]
        return float(-((255 - v) >> 4))

    mcux = (w + 8 * sh - 1) // (8 * sh)
    mcuy = (h + 8 * sv - 1) // (8 * sv)
    writer = _JpegBitWriter()
    pred_y = pred_cb = pred_cr = 0
    mcu_done = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_done and mcu_done % restart_interval == 0:
                writer.restart(rst)
                rst += 1
                pred_y = pred_cb = pred_cr = 0
            mcu_done += 1
            for v in range(sv):
                for hb in range(sh):
                    blk = [[y_px((mx * sh + hb) * 8 + x, (my * sv + v) * 8 + y)
                            for x in range(8)] for y in range(8)]
                    pred_y = _jpeg_encode_block(
                        writer, blk, pred_y, dc_l, ac_l, _JPEG_QUANT_ZZ)
            blk = [[cb_px(mx * 8 + x, my * 8 + y) for x in range(8)]
                   for y in range(8)]
            pred_cb = _jpeg_encode_block(
                writer, blk, pred_cb, dc_c, ac_c, chroma_quant)
            blk = [[cr_px(mx * 8 + x, my * 8 + y) for x in range(8)]
                   for y in range(8)]
            pred_cr = _jpeg_encode_block(
                writer, blk, pred_cr, dc_c, ac_c, chroma_quant)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes(_JPEG_QUANT_ZZ)
              + b"\x01" + bytes(chroma_quant))
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, (sh << 4) | sv, 0]) + b"\x02\x11\x01" + b"\x03\x11\x01")
    dht = seg(
        0xC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS
        + b"\x10" + bytes(_JPEG_AC_BITS) + _JPEG_AC_VALS
        + b"\x01" + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS
        + b"\x11" + bytes(_JPEG_AC_BITS) + _JPEG_AC_VALS,
    )
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = seg(0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (b"\xff\xd8" + app0 + dqt + sof + dht + dri + sos
            + writer.flush() + b"\xff\xd9")



# Progressive JPEG writer (SOF2, T.81 Annex G) — independent twin of the
# progressive decoder in extractors/jpeg.py.  Scan scripts mirror the
# libjpeg defaults (6 scans gray, 10 scans color): spectral selection +
# two-level successive approximation, EOB-run accumulation in first AC
# scans, correction-bit buffering in refinement scans.  The AC scans use
# a custom flat 9-bit Huffman table because the Annex K example tables
# lack the EOBn symbols (r<<4 for r>=1) progressive coding needs.

_PROG_AC_SYMBOLS = bytes(
    [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(15)]  # EOB0..EOB14
    + [0xF0]  # ZRL
)
_PROG_AC_BITS = [0] * 16
_PROG_AC_BITS[8] = len(_PROG_AC_SYMBOLS)  # every symbol at 9 bits


def _prog_flush_eobrun(writer, ac_codes, eobrun, br_bits):
    """Emit a pending EOB run (EOBn symbol + extension bits) followed by
    any buffered correction bits, per G.1.2.2/G.1.2.3."""
    if eobrun:
        r = eobrun.bit_length() - 1
        writer.write(*ac_codes[r << 4])
        if r:
            writer.write(eobrun - (1 << r), r)
    for b in br_bits:
        writer.write(b, 1)
    br_bits.clear()
    return 0


def _prog_ac_first(writer, blocks, ss, se, al, ac_codes):
    """First AC scan of a band: run/size coding of the point-transformed
    coefficients with cross-block EOB-run accumulation."""
    eobrun = 0
    br: list[int] = []
    for zz in blocks:
        vals = [(abs(zz[k]) >> al) * (1 if zz[k] >= 0 else -1)
                for k in range(ss, se + 1)]
        last_nz = -1
        for i, v in enumerate(vals):
            if v:
                last_nz = i
        if last_nz < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _prog_flush_eobrun(writer, ac_codes, eobrun, br)
            continue
        eobrun = _prog_flush_eobrun(writer, ac_codes, eobrun, br)
        run = 0
        for i in range(last_nz + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                writer.write(*ac_codes[0xF0])
                run -= 16
            s = abs(v).bit_length()
            writer.write(*ac_codes[(run << 4) | s])
            writer.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _prog_flush_eobrun(writer, ac_codes, eobrun, br)
    _prog_flush_eobrun(writer, ac_codes, eobrun, br)


def _prog_ac_refine(writer, blocks, ss, se, al, ac_codes):
    """AC refinement scan (G.1.2.3, the libjpeg encode_mcu_AC_refine
    shape).  Two correction-bit buffers, exactly like libjpeg: *be*
    holds bits travelling with the pending EOB run (emitted after the
    EOBn symbol), *br* holds the current block's bits since the last
    emitted symbol (emitted after that symbol + sign).  A single shared
    buffer emits current-block corrections before their symbol and
    desyncs every decoder."""
    eobrun = 0
    be: list[int] = []  # bits owned by the pending EOB run
    br: list[int] = []  # bits since the last symbol in the current block
    for zz in blocks:
        absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
        eob = -1  # index of the LAST newly-nonzero coefficient
        for i, t in enumerate(absv):
            if t == 1:
                eob = i
        r = 0
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            # Fold ZRLs FIRST — for corrections too, not just new
            # nonzeros (libjpeg's loop order).  Deferring the fold past a
            # correction buffers its bit outside the 16-zero window the
            # decoder's ZRL advance covers, desyncing the stream.  Folds
            # only while another new nonzero is still coming (i <= eob);
            # otherwise the tail joins the EOB run.
            while r > 15 and i <= eob:
                eobrun = _prog_flush_eobrun(writer, ac_codes, eobrun, be)
                writer.write(*ac_codes[0xF0])
                r -= 16
                for b in br:
                    writer.write(b, 1)
                br.clear()
            if t > 1:  # history coefficient: correction bit
                br.append(t & 1)
                continue
            # newly nonzero
            eobrun = _prog_flush_eobrun(writer, ac_codes, eobrun, be)
            writer.write(*ac_codes[(r << 4) | 1])
            writer.write(1 if zz[ss + i] >= 0 else 0, 1)
            for b in br:
                writer.write(b, 1)
            br.clear()
            r = 0
        if r > 0 or br:  # block tail joins the EOB run; its bits move to be
            eobrun += 1
            be.extend(br)
            br.clear()
            if eobrun == 0x7FFF or len(be) > 900:
                eobrun = _prog_flush_eobrun(writer, ac_codes, eobrun, be)
    _prog_flush_eobrun(writer, ac_codes, eobrun, be)


def _jpeg_progressive(w: int, h: int, raster: bytes, color: bool = False,
                      sampling: tuple[int, int] = (2, 2)) -> bytes:
    """Valid progressive JFIF (SOF2): grayscale 6-scan or YCbCr 10-scan
    libjpeg-style script.  Y carries the page raster; color mode adds
    the same content-derived chroma tint as _jpeg_color."""
    chroma_quant = [1] + [8] * 63
    sh, sv = sampling if color else (1, 1)

    def y_px(x: int, y: int) -> float:
        return float(raster[min(y, h - 1) * w + min(x, w - 1)] - 128)

    def cb_px(x: int, y: int) -> float:
        sx, sy = min(sh * x, w - 1), min(sv * y, h - 1)
        return float((255 - raster[sy * w + sx]) >> 3)

    def cr_px(x: int, y: int) -> float:
        sx, sy = min(sh * x, w - 1), min(sv * y, h - 1)
        return float(-((255 - raster[sy * w + sx]) >> 4))

    if color:
        comps = [(1, sh, sv, 0, y_px, _JPEG_QUANT_ZZ),
                 (2, 1, 1, 1, cb_px, chroma_quant),
                 (3, 1, 1, 1, cr_px, chroma_quant)]
    else:
        comps = [(1, 1, 1, 0, y_px, _JPEG_QUANT_ZZ)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # quantized coefficient grids, padded to the MCU structure (the
    # interleaved DC scan covers padding blocks; AC scans cover only the
    # component's real cbw x cbh grid, per G.1.1.1.1)
    grids = []
    for _cid, hs, vs, _tq, px, quant in comps:
        grid = [[None] * (mcux * hs) for _ in range(mcuy * vs)]
        for by in range(mcuy * vs):
            for bx in range(mcux * hs):
                blk = [[px(bx * 8 + x, by * 8 + y) for x in range(8)]
                       for y in range(8)]
                grid[by][bx] = _jpeg_block_zz(blk, quant)
        grids.append(grid)

    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_PROG_AC_BITS, _PROG_AC_SYMBOLS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def real_grid(ci):
        _cid, hs, vs, _tq, _px, _q = comps[ci]
        cbw = ((w * hs + hmax - 1) // hmax + 7) // 8
        cbh = ((h * vs + vmax - 1) // vmax + 7) // 8
        return [grids[ci][by][bx] for by in range(cbh) for bx in range(cbw)]

    def sos(comp_tables: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(comp_tables)])
        for cid, td, ta in comp_tables:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    def dc_scan(ah, al) -> bytes:
        writer = _JpegBitWriter()
        preds = [0] * len(comps)
        for my in range(mcuy):
            for mx in range(mcux):
                for si, (_cid, hs, vs, _tq, _px, _q) in enumerate(comps):
                    for v in range(vs):
                        for hb in range(hs):
                            zz0 = grids[si][my * vs + v][mx * hs + hb][0]
                            if ah == 0:
                                val = zz0 >> al  # arithmetic shift per G.1.2.1
                                diff = val - preds[si]
                                preds[si] = val
                                s = abs(diff).bit_length()
                                writer.write(*dc_codes[s])
                                if s:
                                    writer.write(
                                        diff if diff >= 0 else diff + (1 << s) - 1, s)
                            else:
                                writer.write((zz0 >> al) & 1, 1)
        tables = [(c[0], 0, 0) for c in comps]
        return sos(tables, 0, 0, ah, al) + writer.flush()

    def ac_scan(ci, ss, se, ah, al) -> bytes:
        writer = _JpegBitWriter()
        blocks = real_grid(ci)
        if ah == 0:
            _prog_ac_first(writer, blocks, ss, se, al, ac_codes)
        else:
            _prog_ac_refine(writer, blocks, ss, se, al, ac_codes)
        ta = 0 if comps[ci][3] == 0 else 1
        return sos([(comps[ci][0], 0, ta)], ss, se, ah, al) + writer.flush()

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if color:
        dqt = seg(0xDB, b"\x00" + bytes(_JPEG_QUANT_ZZ)
                  + b"\x01" + bytes(chroma_quant))
        sof = seg(0xC2, struct.pack(">BHHB", 8, h, w, 3)
                  + bytes([1, (sh << 4) | sv, 0]) + b"\x02\x11\x01"
                  + b"\x03\x11\x01")
        dht = seg(0xC4,
                  b"\x00" + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS
                  + b"\x10" + bytes(_PROG_AC_BITS) + _PROG_AC_SYMBOLS
                  + b"\x11" + bytes(_PROG_AC_BITS) + _PROG_AC_SYMBOLS)
        scans = (dc_scan(0, 1)
                 + ac_scan(0, 1, 5, 0, 2)
                 + ac_scan(1, 1, 63, 0, 1)
                 + ac_scan(2, 1, 63, 0, 1)
                 + ac_scan(0, 6, 63, 0, 2)
                 + ac_scan(0, 1, 63, 2, 1)
                 + dc_scan(1, 0)
                 + ac_scan(1, 1, 63, 1, 0)
                 + ac_scan(2, 1, 63, 1, 0)
                 + ac_scan(0, 1, 63, 1, 0))
    else:
        dqt = seg(0xDB, b"\x00" + bytes(_JPEG_QUANT_ZZ))
        sof = seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
        dht = seg(0xC4,
                  b"\x00" + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS
                  + b"\x10" + bytes(_PROG_AC_BITS) + _PROG_AC_SYMBOLS)
        scans = (dc_scan(0, 1)
                 + ac_scan(0, 1, 5, 0, 2)
                 + ac_scan(0, 6, 63, 0, 2)
                 + ac_scan(0, 1, 63, 2, 1)
                 + ac_scan(0, 1, 63, 1, 0)
                 + dc_scan(1, 0))
    return b"\xff\xd8" + app0 + dqt + sof + dht + scans + b"\xff\xd9"


def _packbits(row: bytes) -> bytes:
    """PackBits encode one row (TIFF 6.0 §9): repeat runs >= 2 as
    (257-len, byte); literals in chunks of <= 128."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i
        while j < n - 1 and row[j] == row[j + 1] and j - i < 126:
            j += 1
        if j > i:
            out.append(257 - (j - i + 1))
            out.append(row[i])
            i = j + 1
            continue
        lit = i
        while i < n and i - lit < 128:
            if i < n - 2 and row[i] == row[i + 1] == row[i + 2]:
                break
            i += 1
        out.append(i - lit - 1)
        out += row[lit:i]
    return bytes(out)


def _ccitt_encode(w: int, h: int, bilevel: bytes, mode: str = "g4",
                  eol: bool = True, uncompressed: bool = False) -> bytes:
    """CCITT fax encoder — independent twin of extractors/ccitt.py
    (shares only the published T.4 run-length code tables, the same
    stance as the LZW pairs).  *bilevel* is one byte per pixel,
    1 = black.  Modes: ``g4`` (T.6: every row 2-D, EOFB trailer),
    ``g3_1d`` (T.4: EOL before each row, 1-D modified-Huffman rows, RTC
    trailer), ``g3_2d`` (T.4 2-D: EOL + tag bit per row, a 1-D anchor
    row every 4th, RTC of EOL+tag1), ``mh`` (TIFF Compression 2 CCITT
    RLE: 1-D rows, no EOLs, each row byte-aligned).  ``eol=False``
    (g3_1d/g3_2d only) emits PDF's default ``/EndOfLine false`` layout:
    rows packed back-to-back, no EOL codes, no RTC trailer — in 2-D
    mode each row starts directly with its tag bit.  ``uncompressed``
    (g4/g3_2d, round 5) codes every third 2-D row in T.4 §4.2.1.4 /
    T.6 §2.2.8 UNCOMPRESSED mode: entry extension 0000001111, literal
    pixels as zero-run+black codes, exit 0^m 0000001 T — the T4Options/
    T6Options bit-1 capability."""
    from bisect import bisect_right

    from .extractors.ccitt import _BLACK_CODES, _WHITE_CODES
    wh = {run: (ln, code) for (ln, code), run in _WHITE_CODES.items()}
    bl = {run: (ln, code) for (ln, code), run in _BLACK_CODES.items()}
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, ln: int) -> None:
        nonlocal acc, nbits
        acc = (acc << ln) | code
        nbits += ln
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    def emit_run(run: int, table) -> None:
        while run >= 2624:  # keep a terminating code reachable
            ln, code = table[2560]
            emit(code, ln)
            run -= 2560
        if run >= 64:
            m = (run // 64) * 64
            ln, code = table[m]
            emit(code, ln)
            run -= m
        ln, code = table[run]
        emit(code, ln)

    _V = {0: (1, 0b1), 1: (3, 0b011), -1: (3, 0b010), 2: (6, 0b000011),
          -2: (6, 0b000010), 3: (7, 0b0000011), -3: (7, 0b0000010)}

    def transitions(y: int) -> list[int]:
        row = bilevel[y * w:(y + 1) * w]
        t: list[int] = []
        prev = 0
        for x in range(w):
            if row[x] != prev:
                t.append(x)
                prev = row[x]
        return t

    def encode_2d(cur: list[int], ref: list[int]) -> None:
        a0 = -1
        color = 0
        i = 0
        while True:
            a1 = cur[i] if i < len(cur) else w
            j = bisect_right(ref, a0)
            if (j & 1) != color:
                j += 1
            b1 = ref[j] if j < len(ref) else w
            b2 = ref[j + 1] if j + 1 < len(ref) else w
            if b2 < a1:  # pass mode
                emit(0b0001, 4)
                a0 = b2
            elif abs(a1 - b1) <= 3:  # vertical mode
                ln, code = _V[a1 - b1]
                emit(code, ln)
                a0 = a1
                color ^= 1
                i += 1
            else:  # horizontal mode: two runs from max(a0, 0)
                a2 = cur[i + 1] if i + 1 < len(cur) else w
                emit(0b001, 3)
                start = a0 if a0 > 0 else 0
                emit_run(a1 - start, bl if color else wh)
                emit_run(a2 - a1, wh if color else bl)
                a0 = a2
                i += 2
            if a0 >= w:
                break

    def encode_uncompressed(y: int) -> None:
        # whole-row uncompressed segment: entry code, literal pixels,
        # exit with trailing whites (<=4) embedded and T=0 (white)
        row = bilevel[y * w:(y + 1) * w]
        emit(0b0000001111, 10)            # 2-D extension, type 111
        i = 0
        while i < w:
            z = 0
            while i + z < w and not row[i + z]:
                z += 1
            if i + z < w:                 # zero run terminated by black
                i += z + 1
                while z > 4:
                    emit(0b000001, 6)     # five whites, no black
                    z -= 5
                emit(1, z + 1)            # '0'*z + '1'
            else:                         # trailing whites to row end
                i += z
                while z > 4:
                    emit(0b000001, 6)
                    z -= 5
                emit(0b10, z + 8)         # exit: 0^z 0000001 T(=0)
                return
        emit(0b10, 8)                     # row ended on black: plain exit

    def encode_1d(cur: list[int]) -> None:
        # alternating runs from the transition list, leading white first
        prev = 0
        color = 0
        for t in cur + [w]:
            emit_run(t - prev, bl if color else wh)
            prev = t
            color ^= 1
            if prev >= w:
                break
        # a row ending mid-color needs no closing zero run: the loop
        # above always emits through position w

    EOL = (0b000000000001, 12)
    ref: list[int] = []
    for y in range(h):
        cur = transitions(y)
        if mode == "g4":
            if uncompressed and y % 3 == 2:
                encode_uncompressed(y)
            else:
                encode_2d(cur, ref)
        elif mode == "g3_1d":
            if eol:
                emit(*EOL)
            encode_1d(cur)
        elif mode == "mh":  # Compression 2: no EOLs, byte-aligned rows
            encode_1d(cur)
            if nbits:
                emit(0, 8 - nbits)
        else:  # g3_2d: tag bit after EOL, 1-D anchor every 4th row
            if eol:
                emit(*EOL)
            if y % 4 == 0:
                emit(1, 1)
                encode_1d(cur)
            elif uncompressed and y % 3 == 2:
                emit(0, 1)
                encode_uncompressed(y)
            else:
                emit(0, 1)
                encode_2d(cur, ref)
        ref = cur
    if mode == "g4":
        emit(*EOL)  # EOFB
        emit(*EOL)
    elif mode == "g3_1d" and eol:
        for _ in range(6):  # RTC
            emit(*EOL)
    elif mode == "g3_2d" and eol:
        for _ in range(6):  # RTC with tag bits
            emit(*EOL)
            emit(1, 1)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _g4_encode(w: int, h: int, bilevel: bytes) -> bytes:
    return _ccitt_encode(w, h, bilevel, mode="g4")


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 §13 LZW writer: Clear=256, EOI=257, MSB-first packing,
    widths 9->12 with the spec's EarlyChange — the encoder's table leads
    the decoder's by one entry, so it widens at next_code == 2^width
    where the decoder (extractors/tiff.py) widens at 2^width - 1; Clear
    is emitted when the table reaches 4094 entries, per spec."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1

    def fresh():
        return {bytes([i]): i for i in range(256)}, EOI + 1, 9

    table, next_code, width = fresh()
    emit(CLEAR, width)
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:
            emit(CLEAR, width)
            table, next_code, width = fresh()
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _hpredict_n(row: bytes, spp: int) -> bytes:
    """TIFF Predictor 2 forward, per sample channel."""
    out = bytearray(row)
    for i in range(len(out) - 1, spp - 1, -1):
        out[i] = (out[i] - out[i - spp]) & 0xFF
    return bytes(out)


def _tiff_gray(w: int, h: int, raster: bytes, big_endian: bool = False,
               white_is_zero: bool = False, packbits: bool = False,
               lzw: bool = False, predictor: int = 1,
               rgb: bool = False, g4: bool = False, g3: str | None = None,
               uncompressed: bool = False, tiled: bool = False,
               extra_pages: list[tuple[int, int, bytes]] | None = None) -> bytes:
    """Valid baseline TIFF 6.0: 8-bit grayscale or RGB (ink/bg colors
    whose BT.601 luminances land on the right side of the OCR
    threshold), uncompressed, PackBits (encoded per row, per spec) or
    LZW (per strip, optional per-channel horizontal Predictor 2), two
    strips (exercises the strip table), either byte order, either
    grayscale photometric, multi-page via the chained-IFD layout when
    *extra_pages* carries more (w, h, raster) tuples (round 4), or a
    fax-style CCITT Group 4 page (``g4``: 1-bit MinIsWhite, Compression
    4, single strip — round 4), a Group 3 page (``g3``: "1d" or "2d",
    Compression 3 with T4Options — round 4), or a tiled layout
    (``tiled``: 16-multiple tile grid under tags 322-325, edge tiles
    padded, each tile independently compressed — round 4).  Independent
    twin of extractors/tiff.py."""
    fax = g4 or g3 is not None
    if fax and tiled:
        raise ValueError("fax tiles not emitted by this writer")
    e = ">" if big_endian else "<"
    spp = 3 if rgb else 1
    TILE = 32  # tile edge (spec: multiple of 16)
    pages = [(w, h, raster)] + list(extra_pages or [])
    buf = bytearray(b"MM\x00*" if big_endian else b"II*\x00")
    ifd_ptr_pos = len(buf)  # header's first-IFD pointer, patched per page
    buf += struct.pack(e + "I", 0)
    for pw, ph, praster in pages:
        if fax:
            bilevel = bytes(1 if b < 128 else 0 for b in praster)
            mode = ("g4" if g4 else
                    {"2d": "g3_2d", "1d": "g3_1d", "mh": "mh"}[g3])
            strips = [_ccitt_encode(pw, ph, bilevel, mode,
                                    uncompressed=uncompressed)]
            rps = ph
        elif rgb:
            ink, bg = bytes([20, 30, 180]), bytes([250, 245, 200])
            px = b"".join(ink if b < 128 else bg for b in praster)
        elif white_is_zero:
            px = bytes(255 - b for b in praster)
        else:
            px = bytes(praster)
        if tiled:
            rw = pw * spp
            tiles_x = (pw + TILE - 1) // TILE
            tiles_y = (ph + TILE - 1) // TILE
            strips = []  # tile chunks, row-major tile order
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    tile = bytearray(b"\xff" * (TILE * TILE * spp))
                    cw = min(TILE, pw - tx * TILE) * spp
                    for r in range(min(TILE, ph - ty * TILE)):
                        src = (ty * TILE + r) * rw + tx * TILE * spp
                        tile[r * TILE * spp : r * TILE * spp + cw] = \
                            px[src : src + cw]
                    t = bytes(tile)
                    trw = TILE * spp
                    if predictor == 2:
                        t = b"".join(_hpredict_n(t[r * trw:(r + 1) * trw], spp)
                                     for r in range(TILE))
                    if packbits:
                        t = b"".join(_packbits(t[r * trw:(r + 1) * trw])
                                     for r in range(TILE))
                    elif lzw:
                        t = _tiff_lzw_encode(t)
                    strips.append(t)
            rps = ph
        elif not fax:
            rw = pw * spp  # row stride in bytes
            rps = (ph + 1) // 2 if ph >= 2 else max(ph, 1)
            strips = [px[i * rps * rw:(i + 1) * rps * rw]
                      for i in range((ph + rps - 1) // rps)] or [b""]
            if predictor == 2:
                strips = [
                    b"".join(_hpredict_n(s[r * rw:(r + 1) * rw], spp)
                             for r in range((len(s) + rw - 1) // rw))
                    for s in strips
                ]
            if packbits:
                strips = [
                    b"".join(_packbits(s[r * rw:(r + 1) * rw])
                             for r in range((len(s) + rw - 1) // rw))
                    for s in strips
                ]
            elif lzw:
                strips = [_tiff_lzw_encode(s) for s in strips]
        n = len(strips)
        offs = []
        o = len(buf)
        for s in strips:
            offs.append(o)
            o += len(s)
        ifd_off = o
        struct.pack_into(e + "I", buf, ifd_ptr_pos, ifd_off)
        buf += b"".join(strips)
        n_entries = ((10 if tiled else 9) + (1 if predictor == 2 else 0)
                     + (1 if g3 and g3 != "mh" else 0)
                     + (1 if g4 and uncompressed else 0))
        ext = bytearray()
        ext_base = ifd_off + 2 + n_entries * 12 + 4

        def arr_field(vals: list[int]) -> bytes:
            off = ext_base + len(ext)
            ext.extend(struct.pack(e + "I" * len(vals), *vals))
            return struct.pack(e + "I", off)

        def short3_field(vals: list[int]) -> bytes:
            off = ext_base + len(ext)
            ext.extend(struct.pack(e + "H" * len(vals), *vals))
            return struct.pack(e + "I", off)

        short = lambda v: struct.pack(e + "HH", v, 0)  # noqa: E731
        long_ = lambda v: struct.pack(e + "I", v)      # noqa: E731
        entries = []

        def add(tag: int, typ: int, cnt: int, field: bytes) -> None:
            entries.append(struct.pack(e + "HHI", tag, typ, cnt) + field)

        add(256, 3, 1, short(pw))
        add(257, 3, 1, short(ph))
        if rgb:
            add(258, 3, 3, short3_field([8, 8, 8]))
        else:
            add(258, 3, 1, short(1 if fax else 8))
        add(259, 3, 1, short(4 if g4 else (2 if g3 == "mh" else (3 if g3 else
                             (32773 if packbits else (5 if lzw else 1))))))
        add(262, 3, 1, short(0 if fax else
                             (2 if rgb else (0 if white_is_zero else 1))))
        if not tiled:
            add(273, 4, n, long_(offs[0]) if n == 1 else arr_field(offs))
        add(277, 3, 1, short(spp))
        if not tiled:
            add(278, 4, 1, long_(rps))
            add(279, 4, n,
                long_(len(strips[0])) if n == 1
                else arr_field([len(s) for s in strips]))
        if g3 and g3 != "mh":  # T4Options applies to Compression 3 only
            add(292, 4, 1, long_((1 if g3 == "2d" else 0)
                                 | (2 if uncompressed and g3 == "2d" else 0)))
        if g4 and uncompressed:  # T6Options bit 1: uncompressed allowed
            add(293, 4, 1, long_(2))
        if predictor == 2:
            add(317, 3, 1, short(2))
        if tiled:  # tags stay in ascending order per spec
            add(322, 3, 1, short(TILE))
            add(323, 3, 1, short(TILE))
            add(324, 4, n, long_(offs[0]) if n == 1 else arr_field(offs))
            add(325, 4, n,
                long_(len(strips[0])) if n == 1
                else arr_field([len(s) for s in strips]))
        buf += struct.pack(e + "H", n_entries) + b"".join(entries)
        ifd_ptr_pos = len(buf)  # next-IFD pointer: 0 unless another page follows
        buf += struct.pack(e + "I", 0)
        buf += ext
    return bytes(buf)


# GIF87a grayscale writer (independent twin of extractors/gif.py): real
# variable-width LSB-first LZW with CLEAR/EOI, dictionary growth and
# reset at 4096 — the same T.81-style closed loop as JPEG/TIFF/PNG.

def _gif_lzw_encode(mcs: int, indices: bytes) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, mcs + 1

    table, next_code, width = fresh()
    emit(clear, width)
    prev = b""
    for px in indices:
        cur = prev + bytes([px])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # standard late change: the encoder's table leads the decoder's
        # by one entry, so it widens one step after the decoder's
        # next_code == 2^width check (see extractors/gif.py).
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table, next_code, width = fresh()
        prev = bytes([px])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_gray(w: int, h: int, raster: bytes, interlaced: bool = False,
              color: bool = False, local_table: bool = False,
              extra_frames: list[tuple[int, int, bytes]] | None = None) -> bytes:
    """Valid GIF87a (or, with *extra_frames*, an ANIMATED GIF89a with the
    NETSCAPE loop extension and a graphic-control block per frame — the
    real video container the multimodal pipeline decodes): 4-entry color
    table (ink/bg; grayscale, or a real color pair whose BT.601
    luminances land on the right side of the OCR threshold when
    ``color``), global or per-image local table, real LZW, optionally
    interlaced (rows written in the 8/8/4/2 pass order)."""
    def image_block(fw: int, fh: int, fraster: bytes) -> bytes:
        idx = bytes(0 if b < 128 else 1 for b in fraster)
        if interlaced:
            rows = [idx[r * fw:(r + 1) * fw] for r in range(fh)]
            order = [r for first, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                     for r in range(first, fh, step)]
            idx = b"".join(rows[r] for r in order)
        iflags = (0x40 if interlaced else 0) | (0x80 | 0x01 if local_table else 0)
        desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, fw, fh, iflags)
        if local_table:
            desc += pal
        mcs = 2
        data = _gif_lzw_encode(mcs, idx)
        blocks = b"".join(
            bytes([min(255, len(data) - i)]) + data[i : i + 255]
            for i in range(0, len(data), 255)
        )
        return desc + bytes([mcs]) + blocks + b"\x00"

    if color:
        # dark blue ink (luma 44) on warm white bg (luma 241)
        pal = bytes([20, 30, 180, 250, 245, 200, 0, 0, 0, 0, 0, 0])
    else:
        pal = bytes([0, 0, 0, 255, 255, 255, 0, 0, 0, 0, 0, 0])
    frames = [(w, h, bytes(raster))] + list(extra_frames or [])
    sw = max(f[0] for f in frames)
    sh = max(f[1] for f in frames)
    animated = len(frames) > 1
    gflags = 0x01 if local_table else (0x80 | 0x01)
    header = (b"GIF89a" if animated else b"GIF87a") + struct.pack(
        "<HHBBB", sw, sh, gflags, 0, 0)
    body = bytearray(pal if not local_table else b"")
    if animated:
        body += (b"\x21\xff\x0bNETSCAPE2.0"
                 + b"\x03\x01" + struct.pack("<H", 0) + b"\x00")  # loop forever
    for fw, fh, fraster in frames:
        if animated:  # graphic control: 4/100 s delay, no transparency
            body += b"\x21\xf9\x04\x00" + struct.pack("<H", 4) + b"\x00\x00"
        body += image_block(fw, fh, fraster)
    return header + bytes(body) + b"\x3b"


def _gen_image(rng: random.Random) -> bytes:
    p = rng.random()
    if p < 0.7:
        # real scanned-page raster: rendered text the OCR-lite route reads
        # back, shipped as PNG, baseline-JFIF JPEG, or baseline TIFF
        # (all real codecs with independent writer/reader pairs)
        from .glyphs import render_raster
        text = "\n".join(
            _sentences(rng, rng.randint(1, 3)) for _ in range(rng.randint(1, 3))
        )
        w, h, raster = render_raster(text)
        if p < 0.25:
            if rng.random() < 0.5:  # round 4: color/paletted/interlaced
                return _png_color(w, h, bytes(raster), rng)
            return _png_gray(w, h, bytes(raster))
        if p < 0.45:
            if rng.random() < 0.25:  # progressive SOF2 (round 4)
                if rng.random() < 0.4:
                    samp = rng.choice([(2, 2), (2, 1), (1, 1)])
                    return _jpeg_progressive(w, h, bytes(raster),
                                             color=True, sampling=samp)
                return _jpeg_progressive(w, h, bytes(raster))
            # restart markers in ~30% (round 4) — common in real camera
            # and scanner output
            ri = rng.choice([1, 2, 4, 8]) if rng.random() < 0.3 else 0
            if rng.random() < 0.35:
                samp = rng.choice([(2, 2), (2, 2), (2, 1), (1, 1)])
                return _jpeg_color(w, h, bytes(raster), sampling=samp,
                                   restart_interval=ri)
            return _jpeg_gray(w, h, bytes(raster), restart_interval=ri)
        if p < 0.6:
            comp = rng.random()
            rgb = rng.random() < 0.25
            extra = None
            if rng.random() < 0.25:  # multi-page scan (round 4)
                extra = []
                for _ in range(rng.randint(1, 2)):
                    ptext = "\n".join(_sentences(rng, rng.randint(1, 2))
                                      for _ in range(rng.randint(1, 2)))
                    pw, ph, praster = render_raster(ptext)
                    extra.append((pw, ph, bytes(praster)))
            return _tiff_gray(w, h, bytes(raster),
                              big_endian=rng.random() < 0.5,
                              white_is_zero=(not rgb) and rng.random() < 0.5,
                              packbits=comp < 0.3,
                              lzw=0.3 <= comp < 0.65,
                              predictor=2 if (0.3 <= comp < 0.65
                                              and rng.random() < 0.5) else 1,
                              rgb=rgb,
                              tiled=rng.random() < 0.2,
                              extra_pages=extra)
        if p < 0.66:
            return _gif_gray(w, h, bytes(raster),
                             interlaced=rng.random() < 0.3,
                             color=rng.random() < 0.4,
                             local_table=rng.random() < 0.25)
        return _bmp_gray(w, h, bytes(raster), rng)  # round 4: DIB pair
    if p < 0.75:
        # fax-style CCITT scan — G4 and G3 (1-D and 2-D) all decode for
        # real since round 4 (the T.4/T.6 codec pair); bilevel is the
        # native fax regime, so the rendered page round-trips exactly
        from .glyphs import render_raster
        text = "\n".join(
            _sentences(rng, rng.randint(1, 3)) for _ in range(rng.randint(1, 2))
        )
        w, h, raster = render_raster(text)
        fk = rng.random()
        if fk < 0.35:
            return _tiff_gray(w, h, bytes(raster), g4=True)
        if fk < 0.45:
            # T6Options bit 1: uncompressed-mode segments (round 5)
            return _tiff_gray(w, h, bytes(raster), g4=True,
                              uncompressed=True)
        if fk < 0.6:
            return _tiff_gray(w, h, bytes(raster), g3="2d")
        if fk < 0.7:
            # T4Options bit 1: uncompressed-mode segments (round 5)
            return _tiff_gray(w, h, bytes(raster), g3="2d",
                              uncompressed=True)
        return _tiff_gray(w, h, bytes(raster),
                          g3="1d" if fk < 0.85 else "mh")
    if p < 0.78:
        # G3 with T4Options uncompressed-mode segments — a REAL page
        # since round 5 (was the last honest fax quarantine; the T.4
        # §4.2.1.4 extension now decodes end to end)
        from .glyphs import render_raster
        text = f"FAX UNCOMP {rng.randint(0, 9999):04d}"
        w, h, raster = render_raster(text)
        return _tiff_gray(w, h, bytes(raster), g3="2d", uncompressed=True)
    if p < 0.87:
        # JFIF magic over garbage: decode failure -> needs_ocr quarantine
        return b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + rng.getrandbits(256).to_bytes(32, "big") * 8
    # PNG magic over garbage: parse failure -> needs_ocr quarantine
    return b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + rng.getrandbits(256).to_bytes(32, "big") * 8


def _gen_corrupt(rng: random.Random) -> bytes:
    kind = rng.random()
    if kind < 0.33:
        return b"PK\x03\x04" + rng.getrandbits(128).to_bytes(16, "big") * 4  # truncated zip
    if kind < 0.66:
        return b"%PDF-1.4\n1 0 obj\n<< /Broken"  # truncated pdf
    return bytes([rng.randrange(256) for _ in range(rng.randint(5, 64))]) or b"\x00"


_GENERATORS = {
    "html": _gen_html, "pdf": _gen_pdf, "txt": _gen_txt, "doc": _gen_doc,
    "xls": _gen_xls, "ppt": _gen_ppt, "ole": _gen_ole_other,
    "msg": _gen_msg, "mht": _gen_mht, "zip": _gen_zip, "tar": _gen_tar,
    "ps": _gen_ps,
    "docx": _gen_docx,
    "rtf": _gen_rtf, "odt": _gen_odt, "ods": _gen_ods, "odp": _gen_odp,
    "epub": _gen_epub,
    "xlsx": _gen_xlsx, "pptx": _gen_pptx,
    "xml": _gen_xml, "json": _gen_json, "eml": _gen_eml, "csv": _gen_csv,
    "image": _gen_image, "corrupt": _gen_corrupt,
}

_EXT = {"html": "html", "pdf": "pdf", "txt": "txt", "doc": "doc", "ps": "ps",
        "xls": "xls", "ppt": "ppt", "ole": "bin", "msg": "msg",
        "mht": "mht", "zip": "zip", "tar": "tar",
        "docx": "docx",
        "rtf": "rtf", "odt": "odt", "ods": "ods", "odp": "odp",
        "epub": "epub",
        "xlsx": "xlsx", "pptx": "pptx",
        "xml": "xml", "json": "json", "eml": "eml", "csv": "csv",
        "image": "png", "corrupt": "bin"}


_TRACKING_PARAMS = ["utm_source", "utm_medium", "utm_campaign", "fbclid", "gclid"]


def _decorate_url(base: str, rng: random.Random, tracking_only: bool = False) -> str:
    """Real-world URL publishing noise over *base* (which has a lowercase
    host and no port/query/fragment): mixed-case host, explicit :443,
    tracking params interleaved with real params, fragment.
    ``textops.url_canonical_col`` inverts every decoration except real
    params, which it preserves sorted — so with *tracking_only* the
    decorated url canonicalizes back to *base* exactly (the property
    tests pin this, and the dup-row variant relies on it to make
    canonically-equal raw-distinct pairs)."""
    scheme, rest = base.split("://", 1)
    host, path = rest.split("/", 1)
    if rng.random() < 0.4:
        host = "".join(c.upper() if rng.random() < 0.5 else c for c in host)
    if rng.random() < 0.3:
        host += ":443"
    params: list[str] = []
    if not tracking_only and rng.random() < 0.5:
        for name in rng.sample(["page", "ref", "v"], rng.randint(1, 2)):
            params.append(f"{name}={rng.randint(1, 99)}")
    if tracking_only or rng.random() < 0.8:
        for name in rng.sample(_TRACKING_PARAMS, rng.randint(1, 2)):
            params.append(f"{name}={rng.choice(_WORDS)}")
    rng.shuffle(params)
    q = "&".join(params)
    frag = f"#s{rng.randint(1, 9)}" if rng.random() < 0.3 else ""
    return f"{scheme}://{host}/{path}" + (f"?{q}" if q else "") + frag


# robots.txt rule shapes the corpus emits — the RFC 9309 wildcard grammar
# restricted to the leading-"/*" form (the shape real robots files
# overwhelmingly use) plus plain path prefixes.  Matching is against the
# URL path only (query/fragment excluded; pinned spec shared with
# __spark_entry__._cc_robots_filter and oracle_data._parse_robots_rules).
_ROBOTS_PATTERNS = [
    "/*.pdf$", "/*.bin$", "/*.xlsx$", "/*.png", "/*.csv",
    "/doc00000", "/doc00001", "/doc0000",
]


def gen_robots(domain: str, seed: int = SEED) -> bytes | None:
    """Deterministic robots.txt for *domain* (None = no robots file, i.e.
    everything allowed).  Exercises the grammar a parser must survive:
    foreign-bot groups, stacked User-agent lines, mixed-case directives,
    inline comments, Crawl-delay/Sitemap noise, CRLF line ends, a
    full-block ``Disallow: /`` sometimes softened by an ``Allow`` that
    must win on RFC 9309 longest-match precedence."""
    rng = random.Random((seed << 22) ^ zlib.crc32(domain.encode("ascii")))
    if rng.random() < 0.12:
        return None
    lines = [f"# robots.txt for {domain}"]
    if rng.random() < 0.5:
        lines += ["User-agent: BadBot", "Disallow: /", ""]
    if rng.random() < 0.3:
        lines.append("User-agent: FriendlyCrawler")
    lines.append("User-agent: *")
    if rng.random() < 0.4:
        lines.append(f"Crawl-delay: {rng.randint(1, 10)}")
    dis = rng.choice(["Disallow", "disallow", "DISALLOW"])
    if rng.random() < 0.08:
        lines.append(f"{dis}: /")
        if rng.random() < 0.5:
            lines.append("Allow: /*.html$  # keep the pages themselves")
    else:
        for pat in rng.sample(_ROBOTS_PATTERNS, rng.randint(0, 3)):
            comment = "  # generated rule" if rng.random() < 0.3 else ""
            lines.append(f"{dis}: {pat}{comment}")
        if rng.random() < 0.3:
            # may duplicate a Disallow pattern: equal-length tie that
            # RFC precedence resolves toward Allow
            lines.append(f"Allow: {rng.choice(_ROBOTS_PATTERNS)}")
    if rng.random() < 0.3:
        lines.append(f"Sitemap: https://{domain}/sitemap.xml")
    eol = "\r\n" if rng.random() < 0.3 else "\n"
    return (eol.join(lines) + eol).encode("ascii")


def robots_rows(seed: int = SEED) -> list[tuple[str, str | None]]:
    """(domain, robots.txt text or None) for every corpus domain — the
    O(domains) dimension relation a politeness filter joins against."""
    out = []
    for d in _DOMAINS:
        b = gen_robots(d, seed)
        out.append((d, b.decode("ascii") if b is not None else None))
    return out


_CHANGEFREQS = ["always", "hourly", "daily", "weekly", "monthly",
                "yearly", "never"]
# sitemap <loc> values stay ascii (the protocol expects percent-encoded
# urls; the corpus's accented words would need escaping, not raw bytes)
_ASCII_WORDS = [w for w in _WORDS if w.isascii()]


def gen_sitemap(domain: str, seed: int = SEED) -> bytes | None:
    """Deterministic sitemap.xml for *domain* (sitemaps.org protocol
    0.9), existing iff the domain's robots.txt ADVERTISES one (the
    ``Sitemap:`` line gen_robots may emit) — the discovery chain a
    polite fetcher actually follows.  Own rng stream keyed off the
    domain, so adding this touches no existing corpus draw.

    Grammar quirks a parser must survive: mixed quote styles in the XML
    declaration, irregular inter-tag whitespace, optional per-entry
    lastmod/changefreq/priority, and ``&amp;``-escaped query strings in
    <loc> (the XML predefined entities — the reader must unescape)."""
    b = gen_robots(domain, seed)
    if b is None or b"Sitemap:" not in b:
        return None
    rng = random.Random((seed << 24) ^ zlib.crc32(b"sitemap:" + domain.encode("ascii")))
    q = "'" if rng.random() < 0.3 else '"'
    parts = [
        f"<?xml version={q}1.0{q} encoding={q}UTF-8{q}?>",
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for j in range(rng.randint(5, 30)):
        w1, w2 = rng.choice(_ASCII_WORDS), rng.choice(_ASCII_WORDS)
        loc = f"https://{domain}/{w1}/{w2}-{j}.html"
        if rng.random() < 0.2:
            loc += f"?page={rng.randint(1, 9)}&amp;ref={rng.choice(_ASCII_WORDS)}"
        pad = " " * rng.randint(0, 4)
        entry = [f"{pad}<url>", f"{pad} <loc>{loc}</loc>"]
        if rng.random() < 0.7:
            entry.append(
                f"{pad} <lastmod>2025-{rng.randint(1, 12):02d}-"
                f"{rng.randint(1, 28):02d}</lastmod>")
        if rng.random() < 0.5:
            entry.append(
                f"{pad} <changefreq>{rng.choice(_CHANGEFREQS)}</changefreq>")
        if rng.random() < 0.4:
            entry.append(f"{pad} <priority>0.{rng.randint(1, 9)}</priority>")
        entry.append(f"{pad}</url>")
        parts.append("\n".join(entry))
    parts.append("</urlset>")
    eol = "\n" if rng.random() < 0.7 else "\r\n"
    return (eol.join(parts) + eol).encode("ascii")


def sitemap_rows(seed: int = SEED) -> list[tuple[str, str | None]]:
    """(domain, sitemap.xml text or None) for every corpus domain."""
    out = []
    for d in _DOMAINS:
        b = gen_sitemap(d, seed)
        out.append((d, b.decode("ascii") if b is not None else None))
    return out


_RSS_DOW = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_RSS_MON = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
            "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def gen_feed(domain: str, seed: int = SEED) -> bytes | None:
    """Deterministic syndication feed for *domain* — RSS 2.0 or Atom
    1.0 (both public specs), the OTHER url-discovery artifact a crawler
    polls next to sitemaps.  Own rng stream keyed off the domain, so
    adding this touches no existing corpus draw.

    Grammar quirks a parser must survive: CDATA-wrapped titles whose
    content is LITERAL (``&`` inside CDATA must not unescape),
    entity-escaped titles and link query strings outside CDATA, RSS
    ``<link>`` element text vs Atom self-closing ``<link href=.../>``,
    ``<guid>`` attributes (isPermaLink), optional date fields (RFC 822
    pubDate vs RFC 3339 updated — kept as raw strings, see
    _cc_feed_urls), and mixed EOL."""
    rng = random.Random(
        (seed << 25) ^ zlib.crc32(b"feed:" + domain.encode("ascii")))
    if rng.random() < 0.35:
        return None
    atom = rng.random() < 0.45
    n = rng.randint(3, 12)
    entries = []
    for j in range(n):
        w1, w2 = rng.choice(_ASCII_WORDS), rng.choice(_ASCII_WORDS)
        title_words = f"{w1} &amp; {w2}" if rng.random() < 0.25 else \
            f"{w1} {w2} {rng.choice(_ASCII_WORDS)}"
        if rng.random() < 0.3:
            # CDATA: literal content, raw '&' allowed and must survive
            title = f"<![CDATA[{w1} & {w2} (raw)]]>"
        else:
            title = title_words
        link = f"https://{domain}/{w1}/post-{j}.html"
        if rng.random() < 0.25:
            link += f"?utm={rng.choice(_ASCII_WORDS)}&amp;p={rng.randint(1, 9)}"
        from datetime import date as _date
        m, d = rng.randint(1, 12), rng.randint(1, 28)
        h, mi = rng.randint(0, 23), rng.randint(0, 59)
        if atom:
            ent = [f"  <entry>", f"    <title>{title}</title>",
                   f'    <link href="{link}"/>']
            if rng.random() < 0.8:
                ent.append(f"    <updated>2025-{m:02d}-{d:02d}"
                           f"T{h:02d}:{mi:02d}:00Z</updated>")
            ent.append(f"    <id>tag:{domain},2025:/post-{j}</id>")
            ent.append("  </entry>")
        else:
            ent = ["  <item>", f"    <title>{title}</title>",
                   f"    <link>{link}</link>"]
            if rng.random() < 0.8:
                dow = _RSS_DOW[_date(2025, m, d).weekday()]
                ent.append(f"    <pubDate>{dow}, {d:02d} {_RSS_MON[m - 1]}"
                           f" 2025 {h:02d}:{mi:02d}:00 GMT</pubDate>")
            if rng.random() < 0.6:
                perma = "true" if rng.random() < 0.5 else "false"
                ent.append(f'    <guid isPermaLink="{perma}">'
                           f"https://{domain}/g/{j}</guid>")
            ent.append("  </item>")
        entries.append("\n".join(ent))
    body = "\n".join(entries)
    if atom:
        doc = ('<?xml version="1.0" encoding="UTF-8"?>\n'
               '<feed xmlns="http://www.w3.org/2005/Atom">\n'
               f"  <title>{domain} feed</title>\n"
               f'  <link href="https://{domain}/"/>\n'
               f"{body}\n</feed>")
    else:
        doc = ('<?xml version="1.0" encoding="UTF-8"?>\n'
               '<rss version="2.0">\n<channel>\n'
               f"  <title>{domain} feed</title>\n"
               f"  <link>https://{domain}/</link>\n"
               f"{body}\n</channel>\n</rss>")
    eol = "\n" if rng.random() < 0.7 else "\r\n"
    return doc.replace("\n", eol).encode("ascii")


def feed_rows(seed: int = SEED) -> list[tuple[str, str | None]]:
    """(domain, feed xml text or None) for every corpus domain."""
    out = []
    for d in _DOMAINS:
        b = gen_feed(d, seed)
        out.append((d, b.decode("ascii") if b is not None else None))
    return out


def gen_doc(i: int, seed: int = SEED) -> list[dict]:
    """Rows for document id *i* — usually one, two when it's a dup url.

    Pure function of (i, seed): safe to evaluate anywhere on the cluster.
    """
    rng = random.Random((seed << 20) ^ i)
    pick = rng.random()
    fmt = next(f for c, f in _CUM if pick < c)
    if fmt == "doc":
        # the legacy-Office family shares the OLE slot of the mix,
        # hash-split (NOT rng-drawn) so docs that stay .doc keep their
        # exact pre-split rng stream: ~5/16 doc, 4/16 xls, 3/16 ppt,
        # 2/16 msg, 2/16 unknown-OLE (the unsupported_legacy class)
        import hashlib as _hl
        h = int(_hl.md5(f"ole:{i}".encode()).hexdigest(), 16) % 16
        fmt = ("doc" if h < 6 else "xls" if h < 10
               else "ppt" if h < 13 else "msg" if h < 15 else "ole")
    elif fmt == "odt":
        # OpenDocument family shares the odt slot, same discipline
        import hashlib as _hl
        h = int(_hl.md5(f"odf:{i}".encode()).hexdigest(), 16) % 16
        fmt = "odt" if h < 8 else "ods" if h < 12 else "odp"
    elif fmt == "eml":
        # message family: rfc822 mail, MHTML saved page (sniffs as eml)
        import hashlib as _hl
        h = int(_hl.md5(f"msg:{i}".encode()).hexdigest(), 16) % 16
        fmt = "eml" if h < 10 else "mht"
    elif fmt == "txt":
        # plain-text slot donates 2/16 to zip BUNDLES and 1/16 to tar
        # bundles (same hash-split discipline: docs that stay txt keep
        # their exact pre-split rng stream)
        import hashlib as _hl
        h = int(_hl.md5(f"arc:{i}".encode()).hexdigest(), 16) % 16
        fmt = "txt" if h < 13 else "tar" if h < 14 else "zip"
    # Zipf-ish domain draw: top domain ~20% of rows (FIXTURES.md §1)
    d = rng.random()
    domain = _DOMAINS[0] if d < 0.2 else _DOMAINS[1 + int(d * 49) % 49]
    url = f"https://{domain}/doc{i:08d}.{_EXT[fmt]}"
    # ~12% of urls carry publishing noise (tracking params, case, :443,
    # fragments) — cc_url_canonical and cc_domain_stats must see through it
    decorated = rng.random() < 0.12
    if decorated:
        url = _decorate_url(url, rng)
    payload = (_gen_html(rng, domain) if fmt == "html"
               else _GENERATORS[fmt](rng))
    # ~5% of text-ish payloads are stored transfer-encoded, as real
    # CC-style stores do; the dispatcher must unwrap and re-sniff.  The
    # wrapper codec is hash-split (NOT rng-drawn — the rng stream is
    # identical to the gzip-only corpus): ~10/16 gzip, 3/16 bz2, 3/16 xz
    if fmt in ("html", "txt", "xml", "json", "csv") and rng.random() < 0.05:
        import hashlib as _hl
        hw = int(_hl.md5(f"wrap:{i}".encode()).hexdigest(), 16) % 16
        if hw < 10:
            import gzip as _gzip
            payload = _gzip.compress(payload, compresslevel=6, mtime=0)
        elif hw < 13:
            import bz2 as _bz2
            payload = _bz2.compress(payload, compresslevel=6)
        else:
            import lzma as _lzma
            payload = _lzma.compress(payload, format=_lzma.FORMAT_XZ,
                                     preset=6)
    ts = _EPOCH + timedelta(seconds=rng.randrange(365 * 24 * 3600))
    lang = rng.choices(["en", "de", "fr", "und"], weights=[80, 7, 7, 6])[0]
    stale = ""
    if rng.random() < 0.5:
        stale = _words(rng, 12)[: rng.randint(8, 60)]
    rows = [{"url": url, "warc_ts": ts, "html": payload, "text": stale, "lang": lang}]
    if rng.random() < DUP_FRACTION:
        rng2 = random.Random((seed << 21) ^ i)
        payload2 = (_gen_html(rng2, domain) if fmt == "html"
                    else _GENERATORS[fmt](rng2))
        # half the dup rows (of undecorated urls) re-publish under a
        # tracking-decorated variant: raw-DISTINCT urls that canonicalize
        # equal — the duplicate class raw-url dedup cannot see and
        # cc_url_canonical exists to surface
        url2 = url
        if not decorated and rng.random() < 0.5:
            url2 = _decorate_url(url, rng, tracking_only=True)
        rows.append({
            "url": url2,
            "warc_ts": ts + timedelta(days=rng.randint(1, 30)),
            "html": payload2, "text": stale, "lang": lang,
        })
    return rows


def gen_corpus(n_docs: int, seed: int = SEED) -> list[dict]:
    """Driver-side corpus (tests / golden generation)."""
    out: list[dict] = []
    for i in range(n_docs):
        out.extend(gen_doc(i, seed))
    return out


CORPUS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def corpus_df(spark, n_docs: int, seed: int = SEED, partitions: int | None = None):
    """Distributed corpus as a DataFrame.

    ``spark.range`` gives each task a contiguous id range; ``mapInPandas``
    turns ids into documents task-locally — no driver materialization, no
    shuffle, embarrassingly parallel exactly like the real CC fetch would
    be.  This is the input path for bench runs (SURVEY.md §5.5).
    """
    import pandas as pd

    def gen_batch(batches):
        for pdf in batches:
            rows: list[dict] = []
            for i in pdf["id"]:
                rows.extend(gen_doc(int(i), seed))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    rng_df = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen_batch, schema=CORPUS_SCHEMA)
