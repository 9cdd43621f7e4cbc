"""Baseline-JFIF decoder (to grayscale) for the OCR-lite route (X14
stretch, round-2 verdict #9; color/interleaved support round 4).

Reference analogue: the ``ocr`` Lambda handed JPEG scans to Tesseract,
which decodes them via libjpeg [R: functions/ocr/main.py ⚠].  No imaging
library exists in this sandbox, so this is a from-scratch implementation
of the baseline sequential DCT process from the JPEG standard (ITU-T T.81):
marker segment parse -> canonical Huffman decode (DC diff categories + AC
run/size with EOB/ZRL) -> dequantize -> inverse zigzag -> float IDCT ->
level shift.  Supported:

- baseline SOF0, 8-bit precision, 1 (grayscale) or 3 (YCbCr) components;
- interleaved single scan with sampling factors in {1, 2} per axis —
  4:4:4, 4:2:2 and 4:2:0 covered.  OCR needs luminance only, so chroma
  blocks are entropy-decoded (mandatory to stay in bitstream sync) but
  skip dequantize/IDCT — the returned raster IS the Y plane;
- restart markers (DRI + RST0..7, round 4): at each restart boundary the
  bit reader realigns to the byte after the marker, DC predictors reset,
  and the marker's modulo-8 sequence number is verified;
- progressive SOF2 (round 4, T.81 Annex G): spectral-selection +
  successive-approximation scans with EOB runs and refinement
  correction bits accumulate coefficients per block; non-luma scans are
  skipped wholesale (each scan is independently delimited); validated
  against reference-encoder (libjpeg) files in tests/fixtures/;
- no arithmetic/hierarchical/lossless modes — the dispatcher turns
  every raise into the honest ``needs_ocr`` quarantine.

The corpus writer (corpusgen._jpeg_gray / _jpeg_color) is an independent
implementation of the same standard — writer and reader share ONLY the
spec constants (zigzag order; writer uses the Annex K example Huffman
tables, the decoder builds whatever tables the DHT segments declare), so
the closed loop validates both against T.81 rather than against each
other's quirks.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .ocr import OcrError

JPEG_MAGIC = b"\xff\xd8"

# zigzag index -> (row-major) position, per T.81 Figure 5
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# IDCT basis matrix: _A[u, x] = C(u)/2 * cos((2x+1)u*pi/16); orthonormal,
# so the 2-D IDCT of a coefficient block C is A.T @ C @ A (numpy matmuls —
# the per-pixel Python loops were the decoder's hot spot)
_A = np.array(
    [
        [
            (math.sqrt(0.5) if u == 0 else 1.0) / 2.0
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)
_ZZ_POS = np.array(ZIGZAG)


def _unstuff_scan(data: bytes, pos: int) -> tuple[bytes, list[tuple[int, int]], int]:
    """Entropy-coded segment with T.81 byte unstuffing applied once up
    front (0xFF 0x00 -> 0xFF; RST0..7 markers are recorded and elided;
    any other 0xFF-marker ends the scan) — per-bit stuffing checks were
    the decoder's hot spot.  Returns (unstuffed bytes, restarts, end)
    where each restart is (offset in the unstuffed stream where the next
    restart interval begins, marker number 0..7) and *end* is the file
    offset of the marker that terminated the scan."""
    out = bytearray()
    restarts: list[tuple[int, int]] = []
    n = len(data)
    i = pos
    while i < n:
        b = data[i]
        if b != 0xFF:
            # bulk-copy to the next 0xFF
            j = data.find(b"\xff", i)
            if j == -1:
                out += data[i:]
                i = n
                break
            out += data[i:j]
            i = j
            continue
        if i + 1 >= n:
            i = n
            break
        nxt = data[i + 1]
        if nxt == 0x00:
            out.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: resync point, not scan end
            restarts.append((len(out), nxt - 0xD0))
            i += 2
        else:
            break  # a real marker ends the scan
    return bytes(out), restarts, i


def _build_huffman(bits: list[int], vals: bytes):
    """Canonical decode tables per T.81 F.2.2.3 (DECODE procedure):
    (mincode, maxcode, valptr, huffval), 1-indexed by code length."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        cnt = bits[length - 1]
        if cnt:
            valptr[length] = k
            mincode[length] = code
            code += cnt
            k += cnt
            maxcode[length] = code - 1
        code <<= 1
    if k != len(vals):
        raise OcrError("jpeg: malformed DHT")
    return mincode, maxcode, valptr, vals


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map *size*-bit magnitude bits to the signed value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, bytearray]:
    """Baseline JFIF decode to grayscale: 8-bit sequential DCT, 1 or 3
    components (interleaved scan, sampling factors 1-2 per axis).  For
    color images the returned raster is the luminance (Y) plane — chroma
    blocks are entropy-decoded for bitstream sync and discarded.
    Returns (width, height, raster) row-major."""
    if not payload.startswith(JPEG_MAGIC):
        raise OcrError("not a JPEG")
    pos = 2
    n = len(payload)
    qtables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], tuple] = {}  # (class, id) -> table
    w = h = -1
    restart_interval = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, hs, vs, tq)
    scan: list[tuple[int, int, int]] = []  # per scan comp: (comp idx, td, ta)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise OcrError("jpeg: lost marker sync")
        marker = payload[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise OcrError("jpeg: truncated segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq != 0:
                    raise OcrError("jpeg: 16-bit quant tables unsupported")
                if i + 64 > len(seg):
                    raise OcrError("jpeg: short DQT")
                qtables[tq] = list(seg[i : i + 64])
                i += 64
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8 or ncomp not in (1, 3):
                raise OcrError(
                    f"jpeg: unsupported SOF0 (precision={prec} components={ncomp})"
                )
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hs, vs = seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise OcrError(f"jpeg: sampling {hs}x{vs} unsupported")
                comps.append((cid, hs, vs, seg[8 + 3 * c]))
        elif marker == 0xC2:  # progressive: re-parse in the SOF2 decoder
            return _decode_progressive_gray(payload)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise OcrError(f"jpeg: non-baseline SOF 0xff{marker:02x}")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = seg[i + 17 : i + 17 + nv]
                if len(vals) != nv:
                    raise OcrError("jpeg: short DHT")
                huff[(tc, th)] = _build_huffman(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI: restart interval in MCUs (0 = none)
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if ns != len(comps) or ns == 0:
                raise OcrError("jpeg: non-interleaved scan unsupported")
            for s_i in range(ns):
                cs = seg[1 + 2 * s_i]
                tdta = seg[2 + 2 * s_i]
                idxs = [ci for ci, c in enumerate(comps) if c[0] == cs]
                if not idxs:
                    raise OcrError("jpeg: scan references unknown component")
                scan.append((idxs[0], tdta >> 4, tdta & 0x0F))
            pos = pos + 2 + seglen
            break
        # APPn/COM/anything else: skipped
        pos = pos + 2 + seglen
    if w <= 0 or h <= 0 or not scan:
        raise OcrError("jpeg: missing SOF/DHT/SOS")

    if w * h > 1 << 24:
        raise OcrError("jpeg: raster too large")
    # luma = first scan component (JFIF: Y first); per-component decode
    # parameters + the per-MCU block schedule in T.81 interleave order
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    luma_idx = scan[0][0]
    params = []
    for ci, td, ta in scan:
        _cid, hs, vs, tq = comps[ci]
        dc = huff.get((0, td))
        ac = huff.get((1, ta))
        quant = qtables.get(tq)
        if dc is None or ac is None or quant is None:
            raise OcrError("jpeg: missing huffman/quant table")
        params.append((ci, hs, vs, dc, ac, quant))
    schedule = []  # (param idx, block row, block col, is_luma)
    for pi, (ci, hs, vs, _dc, _ac, _q) in enumerate(params):
        for v in range(vs):
            for hb in range(hs):
                schedule.append((pi, v, hb, ci == luma_idx))
    luma_hs, luma_vs = comps[luma_idx][1], comps[luma_idx][2]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # luma plane dims (luma sampling is hmax/vmax in practice; if not,
    # the plane is smaller and cropped accordingly)
    lw, lh = mcux * luma_hs * 8, mcuy * luma_vs * 8
    img = np.zeros((lh, lw), dtype=np.float64)
    if (w * comps[luma_idx][1]) // hmax > lw or (h * comps[luma_idx][2]) // vmax > lh:
        raise OcrError("jpeg: inconsistent sampling geometry")

    ecs, restarts, _scan_end = _unstuff_scan(payload, pos)
    ne = len(ecs)
    preds = [0] * len(params)
    # bit cursor: low `have` bits of `buf` are unread (local ints — the
    # per-bit method-call reader was ~60% of decode time)
    buf = 0
    have = 0
    bp = 0
    mcu_done = 0
    rst_idx = 0
    zz = np.zeros(64, dtype=np.float64)
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_done and mcu_done % restart_interval == 0:
                # T.81 E.2.4: byte-align past the RSTn marker, reset DC
                # predictions, verify the marker's modulo-8 sequence
                if rst_idx >= len(restarts):
                    raise OcrError("jpeg: missing restart marker")
                off, mnum = restarts[rst_idx]
                if mnum != rst_idx % 8:
                    raise OcrError("jpeg: restart marker out of sequence")
                rst_idx += 1
                bp = off
                buf = 0
                have = 0
                preds = [0] * len(params)
            mcu_done += 1
            for pi, v, hb, is_luma in schedule:
                _ci, _hs, _vs, dc_t, ac_t, quant = params[pi]
                dc_min, dc_max, dc_ptr, dc_vals = dc_t
                ac_min, ac_max, ac_ptr, ac_vals = ac_t
                if is_luma:
                    zz[:] = 0.0
                # --- DC: canonical-table Huffman decode, then EXTEND
                code = 0
                length = 0
                while True:
                    if have == 0:
                        if bp >= ne:
                            raise OcrError("jpeg: bit underrun")
                        buf = ecs[bp]
                        bp += 1
                        have = 8
                    have -= 1
                    code = (code << 1) | ((buf >> have) & 1)
                    length += 1
                    if length > 16:
                        raise OcrError("jpeg: invalid huffman code")
                    if code <= dc_max[length]:
                        size = dc_vals[dc_ptr[length] + code - dc_min[length]]
                        break
                if size:
                    while have < size:
                        if bp >= ne:
                            raise OcrError("jpeg: bit underrun")
                        buf = ((buf & ((1 << have) - 1)) << 8) | ecs[bp]
                        bp += 1
                        have += 8
                    have -= size
                    val = (buf >> have) & ((1 << size) - 1)
                    preds[pi] += _extend(val, size)
                if is_luma:
                    zz[0] = preds[pi] * quant[0]
                # --- ACs: run/size with EOB/ZRL
                k = 1
                while k < 64:
                    code = 0
                    length = 0
                    while True:
                        if have == 0:
                            if bp >= ne:
                                raise OcrError("jpeg: bit underrun")
                            buf = ecs[bp]
                            bp += 1
                            have = 8
                        have -= 1
                        code = (code << 1) | ((buf >> have) & 1)
                        length += 1
                        if length > 16:
                            raise OcrError("jpeg: invalid huffman code")
                        if code <= ac_max[length]:
                            rs = ac_vals[ac_ptr[length] + code - ac_min[length]]
                            break
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL: sixteen zeros
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise OcrError("jpeg: AC index overrun")
                    while have < s:
                        if bp >= ne:
                            raise OcrError("jpeg: bit underrun")
                        buf = ((buf & ((1 << have) - 1)) << 8) | ecs[bp]
                        bp += 1
                        have += 8
                    have -= s
                    val = (buf >> have) & ((1 << s) - 1)
                    if is_luma:
                        zz[k] = _extend(val, s) * quant[k]
                    k += 1
                if not is_luma:
                    continue  # chroma: sync-decoded, nothing to render
                # --- dezigzag + 2-D IDCT as two matmuls (+128 level shift)
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZZ_POS] = zz
                y0 = (my * luma_vs + v) * 8
                x0 = (mx * luma_hs + hb) * 8
                img[y0 : y0 + 8, x0 : x0 + 8] = _A.T @ coef.reshape(8, 8) @ _A
    out = np.clip(np.rint(img[:h, :w]) + 128.0, 0, 255).astype(np.uint8)
    return w, h, bytearray(out.tobytes())


# --------------------------------------------------- progressive (SOF2)

class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment with
    restart-boundary jumps (progressive scans are not the hot path —
    clarity wins over the baseline loop's inlined cursor)."""

    __slots__ = ("data", "pos", "buf", "have")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.buf = 0
        self.have = 0

    def bit(self) -> int:
        if self.have == 0:
            if self.pos >= len(self.data):
                raise OcrError("jpeg: bit underrun")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.have = 8
        self.have -= 1
        return (self.buf >> self.have) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        mincode, maxcode, valptr, vals = table
        code = 0
        length = 0
        while True:
            code = (code << 1) | self.bit()
            length += 1
            if length > 16:
                raise OcrError("jpeg: invalid huffman code")
            if code <= maxcode[length]:
                return vals[valptr[length] + code - mincode[length]]

    def jump(self, byte_off: int) -> None:
        self.pos = byte_off
        self.buf = 0
        self.have = 0


def _decode_progressive_gray(payload: bytes) -> tuple[int, int, bytearray]:
    """Progressive JPEG (SOF2, T.81 Annex G, Huffman): spectral-selection
    + successive-approximation scans accumulate DCT coefficients per
    block; luma is dequantized/IDCT'd at the end.  Supported: 8-bit, 1
    or 3 components, sampling factors 1-2 per axis, DC scans interleaved
    or not, AC scans single-component per spec, EOB runs, refinement
    correction bits, restart markers.  Scans that carry no luma are
    skipped wholesale (each scan is independently delimited — OCR needs
    the Y plane only).  Validated against reference-encoder (libjpeg)
    progressive files, not just this repo's own writer
    (tests/test_extractors.py real-fixture tests)."""
    pos = 2
    n = len(payload)
    qtables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], tuple] = {}
    w = h = -1
    restart_interval = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, hs, vs, tq)
    coef: list[list[list[list[int]]]] = []  # [comp][by][bx] -> 64 zz-order ints
    hmax = vmax = 1
    mcux = mcuy = 0
    seen_scan = False
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise OcrError("jpeg: lost marker sync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > n:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise OcrError("jpeg: truncated segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq != 0:
                    raise OcrError("jpeg: 16-bit quant tables unsupported")
                if i + 64 > len(seg):
                    raise OcrError("jpeg: short DQT")
                qtables[tq] = list(seg[i : i + 64])
                i += 64
        elif marker == 0xC4:  # DHT (tables may be redefined between scans)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = seg[i + 17 : i + 17 + nv]
                if len(vals) != nv:
                    raise OcrError("jpeg: short DHT")
                huff[(tc, th)] = _build_huffman(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xC2:  # SOF2
            if comps:
                raise OcrError("jpeg: multiple frames")
            prec, h, w, ncomp = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8 or ncomp not in (1, 3):
                raise OcrError(
                    f"jpeg: unsupported SOF2 (precision={prec} components={ncomp})"
                )
            if w * h > 1 << 24:
                raise OcrError("jpeg: raster too large")
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hs, vs = seg[7 + 3 * c] >> 4, seg[7 + 3 * c] & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise OcrError(f"jpeg: sampling {hs}x{vs} unsupported")
                comps.append((cid, hs, vs, seg[8 + 3 * c]))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            # only the luma plane (component 0 per JFIF) is rendered —
            # chroma scans are either skipped wholesale or, in interleaved
            # DC scans, bit-consumed for sync with no storage, so chroma
            # grids stay None (3x less transient memory on color files)
            coef = [
                ([[[0] * 64 for _ in range(mcux * hs)]
                  for _ in range(mcuy * vs)] if ci == 0 else None)
                for ci, (_cid, hs, vs, _tq) in enumerate(comps)
            ]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise OcrError(f"jpeg: unexpected second SOF 0xff{marker:02x}")
        elif marker == 0xDA:  # SOS
            if not comps:
                raise OcrError("jpeg: SOS before SOF2")
            ns = seg[0]
            scomps: list[tuple[int, int, int]] = []  # (comp idx, td, ta)
            for s_i in range(ns):
                cs = seg[1 + 2 * s_i]
                tdta = seg[2 + 2 * s_i]
                idxs = [ci for ci, c in enumerate(comps) if c[0] == cs]
                if not idxs:
                    raise OcrError("jpeg: scan references unknown component")
                scomps.append((idxs[0], tdta >> 4, tdta & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            ecs, restarts, end = _unstuff_scan(payload, pos + 2 + seglen)
            if any(ci == 0 for ci, _td, _ta in scomps):
                _decode_prog_scan(
                    ecs, restarts, restart_interval, comps, coef, scomps,
                    ss, se, ah, al, huff, w, h, hmax, vmax, mcux, mcuy)
                seen_scan = True
            pos = end
            continue
        pos += 2 + seglen
    if w <= 0 or h <= 0 or not seen_scan:
        raise OcrError("jpeg: missing SOF2/scan data")
    # render the luma plane (component 0 per JFIF)
    _cid, hs, vs, tq = comps[0]
    quant = qtables.get(tq)
    if quant is None:
        raise OcrError("jpeg: missing quant table")
    lw, lh = mcux * hs * 8, mcuy * vs * 8
    if (w * hs + hmax - 1) // hmax > lw or (h * vs + vmax - 1) // vmax > lh:
        raise OcrError("jpeg: inconsistent sampling geometry")
    if hs != hmax or vs != vmax:
        raise OcrError("jpeg: subsampled luma unsupported")
    img = np.zeros((lh, lw), dtype=np.float64)
    qarr = np.array(quant, dtype=np.float64)
    grid = coef[0]
    for by in range(mcuy * vs):
        for bx in range(mcux * hs):
            zz = np.array(grid[by][bx], dtype=np.float64) * qarr
            nat = np.zeros(64, dtype=np.float64)
            nat[_ZZ_POS] = zz
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _A.T @ nat.reshape(8, 8) @ _A
            )
    out = np.clip(np.rint(img[:h, :w]) + 128.0, 0, 255).astype(np.uint8)
    return w, h, bytearray(out.tobytes())


def _decode_prog_scan(ecs, restarts, restart_interval, comps, coef, scomps,
                      ss, se, ah, al, huff, w, h, hmax, vmax, mcux, mcuy):
    """One progressive scan (T.81 G.2): DC first/refine (interleaved or
    single-component), AC first/refine (single-component, EOB runs +
    correction bits).  Mutates *coef* in place."""
    br = _BitReader(ecs)
    ns = len(scomps)
    if ss == 0:
        if se != 0:
            raise OcrError("jpeg: DC scan with nonzero Se")
        dc_tables = []
        for ci, td, _ta in scomps:
            t = huff.get((0, td))
            if t is None and ah == 0:
                raise OcrError("jpeg: missing DC huffman table")
            dc_tables.append(t)
        # block visit order: interleaved MCU order, or the component's
        # own (non-padded) raster order when ns == 1
        if ns == 1:
            ci = scomps[0][0]
            _cid, hs, vs, _tq = comps[ci]
            cbw = ((w * hs + hmax - 1) // hmax + 7) // 8
            cbh = ((h * vs + vmax - 1) // vmax + 7) // 8
            units = [[(0, by, bx)] for by in range(cbh) for bx in range(cbw)]
        else:
            units = []
            for my in range(mcuy):
                for mx in range(mcux):
                    blocks = []
                    for si, (ci, _td, _ta) in enumerate(scomps):
                        _cid, hs, vs, _tq = comps[ci]
                        for v in range(vs):
                            for hb in range(hs):
                                blocks.append((si, my * vs + v, mx * hs + hb))
                    units.append(blocks)
        preds = [0] * ns
        rst_idx = 0
        for ui, blocks in enumerate(units):
            if restart_interval and ui and ui % restart_interval == 0:
                if rst_idx >= len(restarts):
                    raise OcrError("jpeg: missing restart marker")
                off, mnum = restarts[rst_idx]
                if mnum != rst_idx % 8:
                    raise OcrError("jpeg: restart marker out of sequence")
                rst_idx += 1
                br.jump(off)
                preds = [0] * ns
            for si, by, bx in blocks:
                ci = scomps[si][0]
                grid = coef[ci]
                if ah == 0:  # first DC scan
                    size = br.huff(dc_tables[si])
                    preds[si] += _extend(br.receive(size), size) if size else 0
                    if grid is not None:
                        grid[by][bx][0] = preds[si] << al
                else:  # refinement: one correction bit
                    bit = br.bit()
                    if bit and grid is not None:
                        grid[by][bx][0] |= 1 << al
        return
    # AC scan: single component per T.81 G.1.1.1.1
    if ns != 1:
        raise OcrError("jpeg: interleaved AC scan")
    if se > 63 or ss > se:
        raise OcrError("jpeg: bad spectral range")
    ci, _td, ta = scomps[0]
    if coef[ci] is None:  # non-luma AC scans never reach here
        raise OcrError("jpeg: AC scan for unstored component")
    ac = huff.get((1, ta))
    if ac is None:
        raise OcrError("jpeg: missing AC huffman table")
    _cid, hs, vs, _tq = comps[ci]
    cbw = ((w * hs + hmax - 1) // hmax + 7) // 8
    cbh = ((h * vs + vmax - 1) // vmax + 7) // 8
    eobrun = 0
    rst_idx = 0
    bi = 0
    p1, m1 = 1 << al, -1 << al
    for by in range(cbh):
        for bx in range(cbw):
            if restart_interval and bi and bi % restart_interval == 0:
                if rst_idx >= len(restarts):
                    raise OcrError("jpeg: missing restart marker")
                off, mnum = restarts[rst_idx]
                if mnum != rst_idx % 8:
                    raise OcrError("jpeg: restart marker out of sequence")
                rst_idx += 1
                br.jump(off)
                eobrun = 0
            bi += 1
            cb = coef[ci][by][bx]
            if ah == 0:  # ---- first AC scan (G.1.2.2)
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.huff(ac)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.receive(r)
                        break
                    k += r
                    if k > se:
                        raise OcrError("jpeg: AC index overrun")
                    cb[k] = _extend(br.receive(s), s) << al
                    k += 1
            else:  # ---- AC refinement (G.1.2.3)
                if eobrun:
                    for kk in range(ss, se + 1):
                        if cb[kk]:
                            if br.bit() and not (cb[kk] & p1):
                                cb[kk] += p1 if cb[kk] > 0 else m1
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = br.huff(ac)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.receive(r)
                            break
                        val = 0  # ZRL: pass 16 zero-history positions
                    else:
                        if s != 1:
                            raise OcrError("jpeg: refinement size != 1")
                        val = p1 if br.bit() else m1
                    while k <= se:
                        if cb[k]:
                            if br.bit() and not (cb[k] & p1):
                                cb[k] += p1 if cb[k] > 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        cb[k] = val
                    k += 1
                if eobrun:
                    # refine the rest of THIS block, then run covers k..
                    for kk in range(k, se + 1):
                        if cb[kk]:
                            if br.bit() and not (cb[kk] & p1):
                                cb[kk] += p1 if cb[kk] > 0 else m1
                    eobrun -= 1
