"""Differential image-codec tests: cc_extract's from-scratch PNG and BMP
decoders vs javax.imageio — the JDK's independent decoders (present in
this environment because Spark needs a JVM).  A writer/reader pair
sharing a quirk passes round-trip tests; it cannot pass this, because the
oracle shares no code with either side.

Covered: every real-encoder fixture in tests/fixtures/ plus a sweep of
the corpus writers' own outputs (all _png_color variants incl. Adam7
interlace + all _bmp_gray variants), compared pixel-for-pixel.
"""

from __future__ import annotations

import random
import shutil
import struct
import subprocess
from pathlib import Path

import pytest

from cc_extract.extractors.bmp import decode_bmp
from cc_extract.extractors.png import decode_png

FIXTURES = Path(__file__).parent / "fixtures"
TOOLS = Path(__file__).parent / "tools"

pytestmark = pytest.mark.skipif(
    shutil.which("javac") is None or shutil.which("java") is None,
    reason="JDK not available for the independent oracle",
)


@pytest.fixture(scope="module")
def pixel_dump(tmp_path_factory):
    d = tmp_path_factory.mktemp("pixeldump")
    subprocess.run(
        ["javac", "-d", str(d), str(TOOLS / "PixelDump.java")], check=True
    )

    def run(paths: list[str]) -> dict[str, tuple[int, int, list[list[int]]]]:
        out = subprocess.run(
            ["java", "-cp", str(d), "PixelDump", *paths],
            capture_output=True, text=True, check=True,
        ).stdout
        res = {}
        lines = iter(out.splitlines())
        for line in lines:
            assert line.startswith("FILE ")
            parts = line.split()
            if parts[-1] == "UNSUPPORTED":
                res[" ".join(parts[1:-1])] = None
                continue
            w, h = int(parts[-2]), int(parts[-1])
            path = " ".join(parts[1:-2])
            rows = []
            for _ in range(h):
                row_hex = next(lines)
                rows.append([int(row_hex[i : i + 8], 16)
                             for i in range(0, 8 * w, 8)])
            res[path] = (w, h, rows)
        return res

    return run


def _java_luma(argb: int, bt601: bool = False) -> int:
    """Same integer luma + composite-over-white as the decoder under
    test, applied to the oracle's ARGB so ONLY the decode step differs.
    PNG/BMP use (77R+150G+29B)>>8; the GIF decoder documents BT.601
    (299R+587G+114B)//1000 — each side is compared with its own."""
    a = (argb >> 24) & 0xFF
    r, g, b = (argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF
    if bt601:
        v = (299 * r + 587 * g + 114 * b) // 1000
    else:
        v = (77 * r + 150 * g + 29 * b) >> 8
    return (v * a + 255 * (255 - a) + 127) // 255


def _compare(ours: tuple, oracle: tuple, tol: int, tag: str,
             bt601: bool = False) -> None:
    w, h, luma = ours
    ow, oh, rows = oracle
    assert (w, h) == (ow, oh), tag
    worst = 0
    for y in range(h):
        for x in range(w):
            d = abs(luma[y * w + x] - _java_luma(rows[y][x], bt601))
            worst = max(worst, d)
    assert worst <= tol, f"{tag}: worst pixel delta {worst} > {tol}"


PNG_FIXTURES = [
    ("real_gray_d8.png", 0),
    ("real_palette_d2.png", 0),
    ("real_palette_d4.png", 0),
    ("real_rgba_d8.png", 0),
    # gray+alpha: imageio returns the gray channel replicated; exact
    ("real_graya_d8.png", 0),
    # Adam7-interlaced RGBA (libpng's own pngtest.png)
    ("real_rgba_interlaced.png", 0),
]


def test_png_decoder_matches_imageio_on_real_fixtures(pixel_dump):
    paths = [str(FIXTURES / name) for name, _ in PNG_FIXTURES]
    oracle = pixel_dump(paths)
    for name, tol in PNG_FIXTURES:
        p = str(FIXTURES / name)
        assert oracle[p] is not None, f"oracle could not read {name}"
        _compare(decode_png(open(p, "rb").read()), oracle[p], tol, name)


def test_bmp_decoder_matches_imageio_on_real_fixture(pixel_dump):
    p = str(FIXTURES / "real_v5_bitfields.bmp")
    oracle = pixel_dump([p])
    if oracle[p] is None:
        pytest.skip("imageio cannot read V5 bitfields BMP")
    _compare(decode_bmp(open(p, "rb").read()), oracle[p], 0,
             "real_v5_bitfields.bmp")


def test_writer_outputs_match_imageio(pixel_dump, tmp_path):
    """The corpus writers' own bytes through the INDEPENDENT decoder:
    proves the writers emit spec-valid files a third-party consumer
    reads identically — the failure mode the round-3 GIF advice item
    showed round-trip tests cannot catch."""
    from cc_extract.corpusgen import _bmp_gray, _png_color, _png_gray
    from cc_extract.glyphs import render_raster

    w, h, raster = render_raster("sphinx of black quartz judge my vow 42")
    raster = bytes(raster)
    rng = random.Random(11)
    files = {}
    for i in range(24):
        blob = _png_color(w, h, raster, rng)
        depth, color, inter = struct.unpack(">BB2xB", blob[24:29])
        files[f"png_{i}_d{depth}c{color}i{inter}.png"] = blob
    files["png_gray.png"] = _png_gray(w, h, raster)
    for i in range(8):
        files[f"bmp_{i}.bmp"] = _bmp_gray(w, h, raster, rng)
    paths = []
    for name, blob in files.items():
        p = tmp_path / name
        p.write_bytes(blob)
        paths.append(str(p))
    oracle = pixel_dump(paths)
    for p in paths:
        name = Path(p).name
        assert oracle[p] is not None, f"imageio rejected writer output {name}"
        blob = open(p, "rb").read()
        ours = decode_png(blob) if name.endswith(".png") else decode_bmp(blob)
        # 4-bit palette quantizes 17*(g>>4) on the WRITER side, so both
        # decoders see identical pixels -> still exact
        _compare(ours, oracle[p], 0, name)


def test_gif_tiff_jpeg_writers_match_imageio(pixel_dump, tmp_path):
    """Same third-party-consumer guard for the OTHER corpus writers:
    GIF (variable-width LZW, interlace, local tables), TIFF (PackBits,
    LZW+predictor, both byte orders, RGB, WhiteIsZero) and baseline JFIF
    decode in javax.imageio pixel-identically (JPEG: within the
    near-lossless quantization error) to cc_extract's own decoders."""
    from cc_extract.corpusgen import _gif_gray, _jpeg_gray, _tiff_gray
    from cc_extract.extractors.gif import decode_gif_gray
    from cc_extract.extractors.jpeg import decode_jpeg_gray
    from cc_extract.extractors.tiff import decode_tiff_pages
    from cc_extract.glyphs import render_raster

    w, h, raster = render_raster("waltz bad nymph for quick jigs vex 7")
    raster = bytes(raster)
    files = {}
    for i, kw in enumerate([
        {}, {"interlaced": True}, {"color": True},
        {"interlaced": True, "color": True, "local_table": True},
    ]):
        files[f"gif_{i}.gif"] = ("gif", _gif_gray(w, h, raster, **kw))
    for i, kw in enumerate([
        {}, {"packbits": True}, {"lzw": True, "predictor": 2},
        {"big_endian": True, "white_is_zero": True}, {"rgb": True},
    ]):
        files[f"tif_{i}.tif"] = ("tiff", _tiff_gray(w, h, raster, **kw))
    files["jpg_0.jpg"] = ("jpeg", _jpeg_gray(w, h, raster))

    paths = {}
    for name, (kind, blob) in files.items():
        p = tmp_path / name
        p.write_bytes(blob)
        paths[str(p)] = kind
    oracle = pixel_dump(list(paths))
    for p, kind in paths.items():
        name = Path(p).name
        assert oracle[p] is not None, f"imageio rejected writer output {name}"
        blob = open(p, "rb").read()
        if kind == "gif":
            ours = decode_gif_gray(blob)
        elif kind == "tiff":
            pages = list(decode_tiff_pages(blob))
            assert len(pages) == 1
            ours = pages[0]
        else:
            ours = decode_jpeg_gray(blob)
        tol = 8 if kind == "jpeg" else 0
        # gif.py and tiff.py document BT.601 //1000 luma (exact for gray
        # pixels either way, so the flag only matters for color variants)
        _compare(ours, oracle[p], tol, name, bt601=(kind in ("gif", "tiff")))
