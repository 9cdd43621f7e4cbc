"""Multimodal plumbing tests: metadata parse correctness against known
generated headers, feature batch shapes, decode-seam gating."""

from __future__ import annotations

import pytest

from cc_extract import multimodal as mm


def test_gen_media_deterministic():
    a = [mm.gen_media(i) for i in range(50)]
    b = [mm.gen_media(i) for i in range(50)]
    assert a == b
    kinds = {r["kind"] for r in a}
    assert kinds <= {"image", "audio", "video"}


def test_parse_png_dims():
    row = next(r for i in range(200) if (r := mm.gen_media(i))["kind"] == "image"
               and r["payload"].startswith(b"\x89PNG"))
    meta = mm.parse_media_meta(row["payload"])
    assert meta["container"] == "png" and meta["parse_ok"]
    assert 1 <= meta["width"] <= 4096 and 1 <= meta["height"] <= 4096


def test_parse_jpeg_dims():
    row = next(r for i in range(200) if (r := mm.gen_media(i))["kind"] == "image"
               and r["payload"].startswith(b"\xff\xd8"))
    meta = mm.parse_media_meta(row["payload"])
    assert meta["container"] == "jpeg" and meta["parse_ok"]
    assert meta["width"] >= 1 and meta["height"] >= 1


def test_parse_wav_rate():
    row = next(r for i in range(200) if (r := mm.gen_media(i))["kind"] == "audio")
    meta = mm.parse_media_meta(row["payload"])
    assert meta["container"] == "wav" and meta["parse_ok"]
    assert meta["sample_rate"] in (8000, 16000, 44100)


def test_parse_garbage_never_raises():
    assert mm.parse_media_meta(b"")["parse_ok"] is False
    assert mm.parse_media_meta(b"\xff\xd8\x00")["parse_ok"] is False
    assert mm.parse_media_meta(b"RIFFxxxx")["parse_ok"] is False


def test_decode_image_is_real():
    """Round 4: the decode seam is no longer a stub — the repo's own
    codecs decode PNG/JPEG(baseline+progressive)/TIFF(LZW/G4)/GIF image
    payloads to rasters; undecodable payloads raise OcrError (counted as
    quarantine, never hidden)."""
    from cc_extract.corpusgen import (_gif_gray, _jpeg_gray,
                                      _jpeg_progressive, _png_gray,
                                      _tiff_gray)
    from cc_extract.extractors.ocr import OcrError
    from cc_extract.glyphs import render_raster

    w, h, raster = render_raster("DECODE SEAM 42")
    encoders = [
        lambda: _png_gray(w, h, bytes(raster)),
        lambda: _jpeg_gray(w, h, bytes(raster)),
        lambda: _jpeg_progressive(w, h, bytes(raster)),
        lambda: _tiff_gray(w, h, bytes(raster), lzw=True, predictor=2),
        lambda: _tiff_gray(w, h, bytes(raster), g4=True),
        lambda: _gif_gray(w, h, bytes(raster), color=True),
    ]
    for enc in encoders:
        dw, dh, _r = mm.decode_image(enc())
        assert (dw, dh) == (w, h)
    with pytest.raises(OcrError):
        mm.decode_image(b"\x89PNG\r\n\x1a\n" + b"junk")
    with pytest.raises(OcrError):
        mm.decode_image(b"RIFF....WAVE")


def test_media_pipeline_on_spark(spark):
    df = mm.media_df(spark, 200, partitions=4)
    meta = mm.media_metadata(df).collect()
    assert len(meta) == 200
    ok = [r for r in meta if r["parse_ok"]]
    assert len(ok) > 150  # jpeg SOF is always parseable in our generator
    by_kind = {r["kind"] for r in meta}
    assert by_kind == {"image", "audio", "video"}
    # metadata fields typed correctly per container
    for r in meta:
        if r["container"] == "png" and r["parse_ok"]:
            assert r["width"] is not None and r["sample_rate"] is None
        if r["container"] == "wav" and r["parse_ok"]:
            assert r["sample_rate"] is not None and r["width"] is None

    feats = mm.media_features(df).collect()
    assert len(feats) == 200
    for r in feats[:20]:
        assert len(r["feature"]) == mm.FEATURE_DIM
        assert abs(sum(r["feature"]) - 1.0) < 1e-3  # normalized histogram

    frames = mm.frame_sample(df).collect()
    assert all(r["frame_idx"] % 10 == 0 for r in frames)
    vids = sum(1 for r in meta if r["kind"] == "video")
    assert len({r["media_id"] for r in frames}) <= vids
