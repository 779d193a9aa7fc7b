"""Pure-stdlib baseline JPEG (ITU T.81) codec — no PIL required.

Decoder: full baseline sequential DCT — marker walk, DQT (8/16-bit
entries), DHT, SOF0, DRI/RSTn restart markers, interleaved-MCU Huffman
scan with DC prediction, zigzag dequantization, separable 2-D IDCT
(numpy 8×8 basis product), per-component upsampling (any H/V factors),
and YCbCr→RGB for 3-component images — PLUS full progressive (SOF2)
Huffman decode (r9): DC first/refinement, AC spectral-selection bands
with EOB run-length coding and successive-approximation refinement,
interleaved DC and per-component non-interleaved AC block grids
(T.81 annex G.2; `_ProgState`) — and r12 adds lossless (SOF3, T.81
Annex H): all seven H.1.2.1 predictors, DC-category + EXTEND difference
coding, modulo-2^16 reconstruction, single-component 8-bit grayscale
and (r13) fully interleaved multi-component 1×1 scans with per-
component prediction planes and Huffman tables (T.81 H.2; subsampled
lossless components, hi-precision lossless, hierarchical, and
arithmetic-coded SOFs raise a deterministic NotImplementedError).

Encoder: baseline sequential, 1-component grayscale or 3-component
YCbCr (4:4:4, or 4:2:0 via luma sampling factors 2×2), standard Annex K
Huffman tables, caller-supplied quantization (default all-ones) —
plus progressive variants (jpeg_encode_gray_progressive /
jpeg_encode_ycbcr420_progressive) emitting the standard spectral-
selection + successive-approximation scan script, used as sandbox
fixtures: both pipelines quantize identical coefficients, so the
progressive decode must equal the baseline decode PIXEL-EXACT. With
the all-ones table and block-constant input, the DC-only round trip is
EXACT — which is what makes the multimodal_jpeg_decode oracle
SQL-expressible (the same design as the PNG/WAV/Y4M decoders in
multimodal/binary.py; reference parity: the reference treats media as
opaque binary too — this engine decodes it in-process).

Everything here is row-local (one image per call inside an Arrow batch);
at 100 TB the codec rides mapInPandas exactly like the PNG path.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the zigzag sequence -> (row, col)
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU T.81 Annex K.3 typical Huffman tables (public specification text)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _idct_basis() -> np.ndarray:
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    c = np.where(u == 0, 1 / np.sqrt(2.0), 1.0)
    return (c / 2.0) * np.cos((2 * x + 1) * u * np.pi / 16.0)


_C = _idct_basis()          # C[u, x]


def _idct2(block: np.ndarray) -> np.ndarray:
    """2-D type-III (inverse) DCT of one dequantized 8×8 block."""
    return _C.T @ block @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class JpegError(ValueError):
    pass


# ----------------------------------------------------------------- decode

class _HuffTree:
    """Canonical Huffman table as a (code -> symbol) dict keyed by
    (length, code) — lookup walks bit by bit (baseline JPEG codes are
    <= 16 bits; image blocks are small, clarity over cleverness)."""

    __slots__ = ("lut",)

    def __init__(self, counts, symbols):
        self.lut = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.lut[(ln, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any non-RST marker."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise JpegError("scan data ended at marker "
                                f"0xFF{nxt:02X} mid-block")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, tree: _HuffTree) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = tree.lut.get((ln, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code in scan")

    def align_to_marker(self):
        """Skip to the next 0xFF marker byte (after a restart interval)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while d[self.pos] != 0xFF or d[self.pos + 1] == 0x00:
            self.pos += 1


class _RestartMarker(Exception):
    def __init__(self, code):
        self.code = code


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(data: bytes) -> dict:
    """Decode baseline (SOF0/1) or progressive-Huffman (SOF2) JPEG bytes
    to {width, height, channels, pixels (H×W or H×W×3 uint8)}. Truncated
    or corrupt streams raise JpegError (never a bare struct/buffer
    error), lossless/arithmetic raise NotImplementedError."""
    try:
        return _jpeg_decode(data)
    except (JpegError, NotImplementedError):
        raise
    except _RestartMarker as exc:
        # A stray 0xFFD0-D7 byte mid-block (no DRI declared, or outside the
        # restart cadence) is a corrupt stream, not a control-flow event.
        raise JpegError(
            f"unexpected restart marker 0xFFD{exc.code & 0x7:X} "
            "mid-block (corrupt stream)") from exc
    except (struct.error, ValueError, IndexError, KeyError,
            StopIteration, ZeroDivisionError) as exc:
        raise JpegError(f"corrupt or truncated JPEG: {exc!r}") from exc


def _jpeg_decode(data: bytes) -> dict:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    prog = None
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                      # EOI
            if prog is not None and prog.nscans:
                return prog.reconstruct(qt)
            raise JpegError("EOI before SOS — no image data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos)
        seg_end = pos + seg_len
        body = data[pos + 2:seg_end]
        if marker == 0xDB:                      # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq:
                    vals = np.frombuffer(body, dtype=">u2", count=64,
                                         offset=i).astype(np.float64)
                    i += 128
                else:
                    vals = np.frombuffer(body, dtype=np.uint8, count=64,
                                         offset=i).astype(np.float64)
                    i += 64
                tbl = np.zeros(64)
                tbl[_ZZ] = vals
                qt[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:                    # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                counts = list(body[i + 1:i + 17])
                n = sum(counts)
                syms = list(body[i + 17:i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTree(counts,
                                                                  syms)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):      # SOF0/1 baseline, SOF2 prog
            prec = body[0]
            if prec != 8:
                raise JpegError(f"{prec}-bit precision not supported")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                hs, vs = hv >> 4, hv & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise JpegError(
                        f"invalid sampling factors {hs}x{vs} (T.81: 1..4)")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            if w == 0 or h == 0:
                raise JpegError("zero image dimension")
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                prog = _ProgState(frame)
        elif marker == 0xC3:                    # SOF3 lossless (r12)
            prec = body[0]
            if prec != 8:
                raise JpegError(
                    f"{prec}-bit lossless precision not supported "
                    "(8-bit only; T.81 allows 2-16)")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if not 1 <= ncomp <= 4:
                raise JpegError(f"SOF3 component count {ncomp} invalid")
            if w == 0 or h == 0:
                raise JpegError("zero image dimension")
            comps = []
            for c in range(ncomp):
                cid, hv, _tq = body[6 + 3 * c:9 + 3 * c]
                if hv != 0x11:
                    # r13 boundary: interleaved lossless MCUs with
                    # subsampling need H×V sample groups per component
                    raise NotImplementedError(
                        "subsampled lossless components are a "
                        "documented boundary (1x1 only)")
                comps.append({"id": cid, "h": 1, "v": 1, "tq": 0})
            frame = {"w": w, "h": h, "lossless": True, "comps": comps,
                     "progressive": False}
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0/SOF1), progressive "
                "Huffman (SOF2), and lossless Huffman (SOF3) JPEG are "
                "supported; got SOF marker "
                f"0xFF{marker:02X} (hierarchical/arithmetic)")
        elif marker == 0xDD:                    # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                    # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            if frame.get("lossless"):
                if ns != len(frame["comps"]):
                    raise NotImplementedError(
                        "lossless scans must cover every frame "
                        "component (non-interleaved multi-scan "
                        "lossless is a documented boundary)")
                sb = 1 + 2 * ns
                predictor = body[sb]            # Ss = predictor select
                pt = body[sb + 2] & 0xF         # Al = point transform
                trees = []
                for c in range(ns):
                    cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                    if cs != frame["comps"][c]["id"]:
                        raise JpegError(
                            "lossless scan component order must match "
                            "the frame header")
                    trees.append(huff_dc[tt >> 4])
                if ns == 1:
                    return _decode_lossless_scan(
                        data, seg_end, frame, trees[0], predictor,
                        pt, restart_interval)
                return _decode_lossless_scan_mc(
                    data, seg_end, frame, trees, predictor, pt,
                    restart_interval)
            if not frame["progressive"]:
                scan = []
                for c in range(ns):
                    cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                    comp = next(x for x in frame["comps"] if x["id"] == cs)
                    scan.append((comp, huff_dc[tt >> 4], huff_ac[tt & 0xF]))
                return _decode_scan(data, seg_end, frame, scan, qt,
                                    restart_interval)
            # progressive: accumulate this scan's coefficients, keep
            # walking markers (scans until EOI)
            sb = 1 + 2 * ns
            ss, se = body[sb], body[sb + 1]
            ah, al = body[sb + 2] >> 4, body[sb + 2] & 0xF
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                ci = next(i for i, x in enumerate(frame["comps"])
                          if x["id"] == cs)
                dtree = huff_dc.get(tt >> 4) if ss == 0 else None
                atree = huff_ac.get(tt & 0xF) if se > 0 else None
                scan.append((ci, dtree, atree))
            pos = prog.decode_scan(data, seg_end, scan, ss, se, ah, al,
                                   restart_interval)
            continue
        pos = seg_end


def _decode_scan(data, pos, frame, scan, qt, restart_interval):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    for comp, _, _ in scan:
        # Upsampling replicates by vmax//v × hmax//h; a non-divisible factor
        # combination (e.g. 3x1 luma with 2x1 chroma — legal per T.81) would
        # silently truncate and misalign the planes. Fail loudly instead.
        if vmax % comp["v"] or hmax % comp["h"]:
            raise NotImplementedError(
                f"non-integral chroma subsampling ratio "
                f"({comp['h']}x{comp['v']} vs max {hmax}x{vmax}) "
                "is not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for comp, _, _ in scan:
        planes.append(np.zeros((mcuy * comp["v"] * 8, mcux * comp["h"] * 8),
                               dtype=np.float64))
    rd = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                rd.align_to_marker()
                if not (data[rd.pos] == 0xFF
                        and 0xD0 <= data[rd.pos + 1] <= 0xD7):
                    raise JpegError("expected RST marker")
                rd.pos += 2
                pred = [0] * len(scan)
            for ci, (comp, dtree, atree) in enumerate(scan):
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = _decode_block(rd, dtree, atree, pred, ci)
                        px = _idct2(blk * q) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    out = []
    for ci, (comp, _, _) in enumerate(scan):
        pl = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
        out.append(pl[:h, :w])
    return _finish_image(out, w, h)


def _finish_image(out: list, w: int, h: int) -> dict:
    """Full-resolution component planes -> decoded-image dict (shared by
    the baseline and progressive paths)."""
    if len(out) == 1:
        pixels = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
        return {"width": w, "height": h, "channels": 1, "pixels": pixels}
    if len(out) == 3:
        y, cb, cr = out
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        pixels = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
        return {"width": w, "height": h, "channels": 3, "pixels": pixels}
    raise JpegError(f"{len(out)}-component scan not supported")


# ------------------------------------------------------------ progressive

class _ProgState:
    """Progressive (SOF2) decode state — T.81 annex G.2, Huffman coding:
    per-component DCT-coefficient arrays (zigzag order) accumulated scan
    by scan, reconstructed (dequant + IDCT + upsample + color) at EOI.
    All four scan kinds are implemented: DC first / DC refinement
    (successive approximation on coefficient 0), AC first / AC refinement
    (spectral selection bands with EOB run-length coding). Interleaved
    (multi-component) scans are DC-only per the standard; AC scans are
    single-component in the component's own (non-padded) block grid.
    (r8 verdict item 5 — the most common real-corpus gap after baseline;
    fixtures come from jpeg_encode_gray_progressive below, cross-checked
    against the baseline pipeline's pixels and PIL when available.)"""

    def __init__(self, frame):
        self.frame = frame
        self.nscans = 0
        self.hmax = max(c["h"] for c in frame["comps"])
        self.vmax = max(c["v"] for c in frame["comps"])
        self.mcux = -(-frame["w"] // (8 * self.hmax))
        self.mcuy = -(-frame["h"] // (8 * self.vmax))
        self.coef = []           # per comp: (by, bx, 64) int32, zigzag
        self.bdims = []          # per comp: non-interleaved (bh, bw)
        for c in frame["comps"]:
            cw = -(-frame["w"] * c["h"] // self.hmax)
            ch = -(-frame["h"] * c["v"] // self.vmax)
            self.bdims.append((-(-ch // 8), -(-cw // 8)))
            self.coef.append(np.zeros(
                (self.mcuy * c["v"], self.mcux * c["h"], 64),
                dtype=np.int32))

    # -- scan entry -------------------------------------------------

    def decode_scan(self, data, pos, scan, ss, se, ah, al, ri) -> int:
        """Decode one SOS's entropy data; returns the offset of the next
        marker's 0xFF byte."""
        if ss > se or se > 63 or al > 13 or (ah and ah != al + 1):
            raise JpegError(f"bad progressive scan header "
                            f"Ss={ss} Se={se} Ah={ah} Al={al}")
        if ss == 0 and se != 0:
            raise JpegError("progressive scan mixes DC and AC "
                            "(Ss=0 requires Se=0)")
        if ss > 0 and len(scan) != 1:
            raise JpegError("progressive AC scan must be single-component")
        for _, dtree, atree in scan:
            if ss == 0 and ah == 0 and dtree is None:
                raise JpegError("missing DC Huffman table for scan")
            if ss > 0 and atree is None:
                raise JpegError("missing AC Huffman table for scan")
        rd = _BitReader(data, pos)
        if ss == 0 and len(scan) > 1:
            self._dc_interleaved(rd, scan, ah, al, ri)
        else:
            self._single(rd, scan[0], ss, se, ah, al, ri)
        self.nscans += 1
        # skip to the next marker (possibly EOI / next SOS / DHT)
        p = rd.pos
        while p < len(data) and (data[p] != 0xFF or data[p + 1] == 0x00):
            p += 1
        return p

    def _rst(self, rd, data_needed=True):
        rd.align_to_marker()
        d = rd.data
        if not (d[rd.pos] == 0xFF and 0xD0 <= d[rd.pos + 1] <= 0xD7):
            raise JpegError("expected RST marker in progressive scan")
        rd.pos += 2

    # -- DC scans ----------------------------------------------------

    def _dc_interleaved(self, rd, scan, ah, al, ri):
        comps = self.frame["comps"]
        pred = [0] * len(scan)
        n = 0
        for my in range(self.mcuy):
            for mx in range(self.mcux):
                if ri and n and n % ri == 0:
                    self._rst(rd)
                    pred = [0] * len(scan)
                for si, (ci, dtree, _) in enumerate(scan):
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = self.coef[ci][my * c["v"] + by,
                                                mx * c["h"] + bx]
                            self._dc_block(rd, blk, dtree, pred, si,
                                           ah, al)
                n += 1

    def _dc_block(self, rd, blk, dtree, pred, si, ah, al):
        if ah == 0:
            t = rd.huff(dtree)
            diff = _extend(rd.bits(t), t) if t else 0
            pred[si] += diff
            blk[0] = pred[si] << al
        else:                      # refinement: one bit per block
            if rd.bit():
                blk[0] |= 1 << al

    # -- single-component scans (non-interleaved grid) ---------------

    def _single(self, rd, entry, ss, se, ah, al, ri):
        ci, dtree, atree = entry
        bh, bw = self.bdims[ci]
        pred = [0]
        self.eobrun = 0
        n = 0
        for by in range(bh):
            for bx in range(bw):
                if ri and n and n % ri == 0:
                    self._rst(rd)
                    pred = [0]
                    self.eobrun = 0
                blk = self.coef[ci][by, bx]
                if ss == 0:
                    self._dc_block(rd, blk, dtree, pred, 0, ah, al)
                elif ah == 0:
                    self._ac_first(rd, blk, atree, ss, se, al)
                else:
                    self._ac_refine(rd, blk, atree, ss, se, al)
                n += 1

    def _ac_first(self, rd, blk, atree, ss, se, al):
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = rd.huff(atree)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:         # EOBn: run of (1<<r)-1+ext more blocks
                    self.eobrun = (1 << r) - 1
                    if r:
                        self.eobrun += rd.bits(r)
                    return
                k += 16            # ZRL
                continue
            k += r
            if k > se:
                raise JpegError("AC run past band end")
            blk[k] = _extend(rd.bits(s), s) << al
            k += 1

    def _ac_refine(self, rd, blk, atree, ss, se, al):
        """T.81 G.2.3 / libjpeg decode_mcu_AC_refine: correction bits for
        already-nonzero coefficients ride along every zero-run skip."""
        p1, m1 = 1 << al, -1 << al
        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = rd.huff(atree)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:
                        self.eobrun = (1 << r)
                        if r:
                            self.eobrun += rd.bits(r)
                        break
                    val = 0        # ZRL: skip 16 zero-history coeffs
                else:
                    if s != 1:
                        raise JpegError(
                            "AC refinement symbol with size != 1")
                    val = p1 if rd.bit() else m1
                while k <= se:
                    if blk[k] != 0:
                        if rd.bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if self.eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    if rd.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                k += 1
            self.eobrun -= 1

    # -- reconstruction ----------------------------------------------

    def reconstruct(self, qt) -> dict:
        frame = self.frame
        w, h = frame["w"], frame["h"]
        out = []
        for ci, c in enumerate(frame["comps"]):
            if c["tq"] not in qt:
                raise JpegError(f"missing quantization table {c['tq']}")
            q = qt[c["tq"]]
            by, bx, _ = self.coef[ci].shape
            plane = np.zeros((by * 8, bx * 8), dtype=np.float64)
            zz = self.coef[ci].astype(np.float64)
            for j in range(by):
                for i in range(bx):
                    blk = np.zeros(64)
                    blk[_ZZ] = zz[j, i]
                    plane[j * 8:j * 8 + 8, i * 8:i * 8 + 8] = \
                        _idct2(blk.reshape(8, 8) * q) + 128.0
            ry, rx = self.vmax // c["v"], self.hmax // c["h"]
            if ry > 1 or rx > 1:
                plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
            out.append(plane[:h, :w])
        return _finish_image(out, w, h)


def _decode_block(rd, dtree, atree, pred, ci) -> np.ndarray:
    zz = np.zeros(64)
    t = rd.huff(dtree)
    diff = _extend(rd.bits(t), t) if t else 0
    pred[ci] += diff
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = rd.huff(atree)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:        # ZRL: 16 zeros
                k += 16
                continue
            break              # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past block end")
        zz[k] = _extend(rd.bits(s), s)
        k += 1
    blk = np.zeros(64)
    blk[_ZZ] = zz
    return blk.reshape(8, 8)


# ----------------------------------------------------------------- encode

class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _enc_tables(counts, symbols):
    """symbol -> (code, length) from the canonical table."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


_EDC_LUM, _EAC_LUM = _enc_tables(*_DC_LUM), _enc_tables(*_AC_LUM)
_EDC_CHR, _EAC_CHR = _enc_tables(*_DC_CHR), _enc_tables(*_AC_CHR)


def _csize(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _enc_block(wtr, blk, pred, dc_tbl, ac_tbl, q):
    coef = np.rint(_fdct2(blk.astype(np.float64) - 128.0) / q).astype(int)
    zz = coef.reshape(64)[_ZZ]  # natural -> zigzag order
    diff = int(zz[0]) - pred
    t = _csize(diff)
    code, ln = dc_tbl[t]
    wtr.put(code, ln)
    if t:
        wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]
            wtr.put(code, ln)
            run -= 16
        s = _csize(v)
        code, ln = ac_tbl[(run << 4) | s]
        wtr.put(code, ln)
        wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tbl[0x00]
        wtr.put(code, ln)
    return int(zz[0])


def _dht_seg(tc, th, counts, symbols) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_seg(tq, table) -> bytes:
    zz = np.asarray(table, dtype=np.float64).reshape(64)[_ZZ]
    body = bytes([tq]) + bytes(int(v) for v in zz)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def jpeg_encode_gray(img: np.ndarray, qtable=None) -> bytes:
    """Baseline grayscale JPEG of a uint8 H×W image (H, W multiples of 8).
    Default all-ones quantization: block-constant images round-trip
    EXACTLY (DC-only blocks)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    if h % 8 or w % 8:
        raise JpegError("encoder requires 8-aligned dimensions")
    q = (np.ones((8, 8)) if qtable is None
         else np.asarray(qtable, dtype=np.float64).reshape(8, 8))
    wtr = _BitWriter()
    pred = 0
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            pred = _enc_block(wtr, img[y0:y0 + 8, x0:x0 + 8], pred,
                              _EDC_LUM, _EAC_LUM, q)
    wtr.flush()
    head = (b"\xff\xd8"
            + _dqt_seg(0, q)
            + b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
            + bytes([1, 0x11, 0])
            + _dht_seg(0, 0, *_DC_LUM) + _dht_seg(1, 0, *_AC_LUM)
            + b"\xff\xda" + struct.pack(">HB", 8, 1)
            + bytes([1, 0x00, 0, 63, 0]))
    return head + bytes(wtr.buf) + b"\xff\xd9"


def jpeg_encode_ycbcr420(y: np.ndarray, cb: np.ndarray,
                         cr: np.ndarray, qtable=None) -> bytes:
    """Baseline 3-component 4:2:0 JPEG from pre-separated planes
    (Y is H×W with H, W multiples of 16; Cb/Cr are H/2×W/2). Exercises
    the decoder's MCU interleave and chroma upsampling."""
    y = np.asarray(y, dtype=np.uint8)
    h, w = y.shape
    if h % 16 or w % 16:
        raise JpegError("4:2:0 encoder requires 16-aligned dimensions")
    q = (np.ones((8, 8)) if qtable is None
         else np.asarray(qtable, dtype=np.float64).reshape(8, 8))
    wtr = _BitWriter()
    pred = [0, 0, 0]
    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    pred[0] = _enc_block(wtr, y[y0:y0 + 8, x0:x0 + 8],
                                         pred[0], _EDC_LUM, _EAC_LUM, q)
            for ci, plane in ((1, cb), (2, cr)):
                y0, x0 = my * 8, mx * 8
                pred[ci] = _enc_block(wtr, plane[y0:y0 + 8, x0:x0 + 8],
                                      pred[ci], _EDC_CHR, _EAC_CHR, q)
    wtr.flush()
    head = (b"\xff\xd8"
            + _dqt_seg(0, q)
            + b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
            + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
            + _dht_seg(0, 0, *_DC_LUM) + _dht_seg(1, 0, *_AC_LUM)
            + _dht_seg(0, 1, *_DC_CHR) + _dht_seg(1, 1, *_AC_CHR)
            + b"\xff\xda" + struct.pack(">HB", 12, 3)
            + bytes([1, 0x00]) + bytes([2, 0x11]) + bytes([3, 0x11])
            + bytes([0, 63, 0]))
    return head + bytes(wtr.buf) + b"\xff\xd9"


# -------------------------------------------------- progressive encode

# Progressive AC scans emit EOBn symbols (0x10..0xE0) that the baseline
# Annex-K tables do not define — use a flat 256-symbol table instead
# (255 8-bit codes + one 9-bit; the all-ones code stays unused per T.81).
# Compression is mediocre, correctness-fixture bitstreams don't care.
_AC_PROG = ([0] * 7 + [255, 1] + [0] * 7, list(range(256)))
_EAC_PROG = _enc_tables(*_AC_PROG)


def _quant_zz_blocks(plane: np.ndarray, q: np.ndarray) -> list:
    """Row-major list of quantized zigzag-order coefficient arrays for an
    8-aligned uint8 plane."""
    h, w = plane.shape
    out = []
    for y0 in range(0, h, 8):
        for x0 in range(0, w, 8):
            coef = np.rint(_fdct2(
                plane[y0:y0 + 8, x0:x0 + 8].astype(np.float64) - 128.0
            ) / q).astype(int)
            out.append(coef.reshape(64)[_ZZ])
    return out


def _emit_dc_first(wtr, blocks, dc_tbl, al):
    pred = 0
    for zz in blocks:
        v = int(zz[0]) >> al            # arithmetic point transform (DC)
        diff = v - pred
        pred = v
        t = _csize(diff)
        code, ln = dc_tbl[t]
        wtr.put(code, ln)
        if t:
            wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _emit_dc_refine(wtr, blocks, al):
    for zz in blocks:
        wtr.put((int(zz[0]) >> al) & 1, 1)


class _EobRun:
    """EOB-run state for one AC scan. `pend` holds correction bits owed
    AFTER the pending EOBn symbol (libjpeg's BE buffer) — bits from the
    initiating block's tail and from fully-EOB blocks; per-symbol
    correction bits (libjpeg's BR) stay block-local in the emitters."""

    def __init__(self, wtr, ac_tbl):
        self.wtr, self.ac_tbl = wtr, ac_tbl
        self.run = 0
        self.pend: list = []

    def flush(self):
        if self.run > 0:
            r = self.run.bit_length() - 1
            code, ln = self.ac_tbl[r << 4]
            self.wtr.put(code, ln)
            if r:
                self.wtr.put(self.run - (1 << r), r)
            self.run = 0
        for b in self.pend:
            self.wtr.put(b, 1)
        self.pend = []


def _emit_ac_first(wtr, blocks, ac_tbl, ss, se, al):
    eob = _EobRun(wtr, ac_tbl)
    for zz in blocks:
        # AC point transform is sign-magnitude (T.81): abs >> Al, sign kept
        vals = [(0 if zz[k] == 0
                 else (abs(int(zz[k])) >> al) * (1 if zz[k] > 0 else -1))
                for k in range(ss, se + 1)]
        last_nz = -1
        for i, v in enumerate(vals):
            if v:
                last_nz = i
        if last_nz < 0:
            eob.run += 1
            if eob.run == 0x7FFF:
                eob.flush()
            continue
        eob.flush()
        run = 0
        for v in vals[:last_nz + 1]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tbl[0xF0]
                wtr.put(code, ln)
                run -= 16
            s = _csize(v)
            code, ln = ac_tbl[(run << 4) | s]
            wtr.put(code, ln)
            wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < len(vals) - 1:
            eob.run += 1
    eob.flush()


def _emit_ac_refine(wtr, blocks, ac_tbl, ss, se, al):
    """libjpeg encode_mcu_AC_refine: newly-nonzero coefficients emit a
    (run, 1) symbol + sign bit; previously-nonzero ones ride as buffered
    correction bits flushed after each symbol / EOB run."""
    eob = _EobRun(wtr, ac_tbl)
    for zz in blocks:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eobpos = -1
        for i, t in enumerate(absv):
            if t == 1:
                eobpos = i
        r = 0
        br: list = []                    # current block, since last symbol
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                eob.flush()
                code, ln = ac_tbl[0xF0]
                wtr.put(code, ln)
                r -= 16
                for b in br:
                    wtr.put(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            eob.flush()
            code, ln = ac_tbl[(r << 4) | 1]
            wtr.put(code, ln)
            wtr.put(1 if zz[ss + i] > 0 else 0, 1)
            for b in br:
                wtr.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eob.run += 1
            eob.pend.extend(br)
            if eob.run == 0x7FFF:
                eob.flush()
    eob.flush()


def _sos_seg(comps, ss, se, ah, al) -> bytes:
    body = bytes([len(comps)])
    for cid, tt in comps:
        body += bytes([cid, tt])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


_PROG_BANDS = ((1, 5), (6, 63))


def jpeg_encode_gray_progressive(img: np.ndarray, qtable=None,
                                 al: int = 1) -> bytes:
    """Progressive (SOF2) grayscale JPEG exercising all four scan kinds:
    DC first at Al=al, DC refinements down to 0, per-band AC first scans
    at Al=al, then per-band AC refinements — the standard spectral
    selection + successive approximation script. Decodes (here and in
    libjpeg/PIL) to the SAME pixels as jpeg_encode_gray of the same
    image, because both quantize the same coefficients."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    if h % 8 or w % 8:
        raise JpegError("encoder requires 8-aligned dimensions")
    q = (np.ones((8, 8)) if qtable is None
         else np.asarray(qtable, dtype=np.float64).reshape(8, 8))
    blocks = _quant_zz_blocks(img, q)

    out = bytearray(b"\xff\xd8" + _dqt_seg(0, q))
    out += (b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1)
            + bytes([1, 0x11, 0]))
    out += _dht_seg(0, 0, *_DC_LUM) + _dht_seg(1, 0, *_AC_PROG)

    def scan(seg, emit, *args):
        out.extend(seg)
        wtr = _BitWriter()
        emit(wtr, blocks, *args)
        wtr.flush()
        out.extend(wtr.buf)

    scan(_sos_seg([(1, 0x00)], 0, 0, 0, al), _emit_dc_first, _EDC_LUM, al)
    for a in range(al - 1, -1, -1):
        scan(_sos_seg([(1, 0x00)], 0, 0, a + 1, a), _emit_dc_refine, a)
    for ss, se in _PROG_BANDS:
        scan(_sos_seg([(1, 0x00)], ss, se, 0, al),
             _emit_ac_first, _EAC_PROG, ss, se, al)
    for ss, se in _PROG_BANDS:
        for a in range(al - 1, -1, -1):
            scan(_sos_seg([(1, 0x00)], ss, se, a + 1, a),
                 _emit_ac_refine, _EAC_PROG, ss, se, a)
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_ycbcr420_progressive(y: np.ndarray, cb: np.ndarray,
                                     cr: np.ndarray, qtable=None,
                                     al: int = 1) -> bytes:
    """Progressive 3-component 4:2:0 JPEG: one INTERLEAVED DC-first scan
    (the multi-component MCU path), DC refinements, then per-component
    AC scans over each component's own non-interleaved block grid —
    exercises the subsampled-grid bookkeeping and upsampling at
    reconstruction."""
    y = np.asarray(y, dtype=np.uint8)
    h, w = y.shape
    if h % 16 or w % 16:
        raise JpegError("4:2:0 encoder requires 16-aligned dimensions")
    q = (np.ones((8, 8)) if qtable is None
         else np.asarray(qtable, dtype=np.float64).reshape(8, 8))
    planes = [np.asarray(p, dtype=np.uint8) for p in (y, cb, cr)]
    comp_blocks = [_quant_zz_blocks(p, q) for p in planes]
    bws = [p.shape[1] // 8 for p in planes]

    # interleaved MCU order for the DC scans: per MCU, 4 luma blocks
    # (2x2) then one of each chroma
    mcu_order = []
    mcux, mcuy = w // 16, h // 16
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):
                for bx in range(2):
                    mcu_order.append((0, (my * 2 + by) * bws[0]
                                      + mx * 2 + bx))
            mcu_order.append((1, my * bws[1] + mx))
            mcu_order.append((2, my * bws[2] + mx))

    out = bytearray(b"\xff\xd8" + _dqt_seg(0, q))
    out += (b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
            + bytes([1, 0x22, 0]) + bytes([2, 0x11, 0])
            + bytes([3, 0x11, 0]))
    out += (_dht_seg(0, 0, *_DC_LUM) + _dht_seg(1, 0, *_AC_PROG)
            + _dht_seg(0, 1, *_DC_CHR) + _dht_seg(1, 1, *_AC_PROG))

    # DC first, interleaved (per-component predictors)
    out += _sos_seg([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, al)
    wtr = _BitWriter()
    pred = [0, 0, 0]
    for ci, bi in mcu_order:
        zz = comp_blocks[ci][bi]
        v = int(zz[0]) >> al
        diff = v - pred[ci]
        pred[ci] = v
        t = _csize(diff)
        tbl = _EDC_LUM if ci == 0 else _EDC_CHR
        code, ln = tbl[t]
        wtr.put(code, ln)
        if t:
            wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    wtr.flush()
    out += wtr.buf

    # DC refinements, interleaved (raw bits, no tables)
    for a in range(al - 1, -1, -1):
        out += _sos_seg([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, a + 1, a)
        wtr = _BitWriter()
        for ci, bi in mcu_order:
            wtr.put((int(comp_blocks[ci][bi][0]) >> a) & 1, 1)
        wtr.flush()
        out += wtr.buf

    # AC scans, one component at a time over its own grid
    for ci, cid in ((0, 1), (1, 2), (2, 3)):
        tbl = _EAC_PROG
        tt = 0x00 if ci == 0 else 0x01
        for ss, se in _PROG_BANDS:
            out += _sos_seg([(cid, tt)], ss, se, 0, al)
            wtr = _BitWriter()
            _emit_ac_first(wtr, comp_blocks[ci], tbl, ss, se, al)
            wtr.flush()
            out += wtr.buf
        for ss, se in _PROG_BANDS:
            for a in range(al - 1, -1, -1):
                out += _sos_seg([(cid, tt)], ss, se, a + 1, a)
                wtr = _BitWriter()
                _emit_ac_refine(wtr, comp_blocks[ci], tbl, ss, se, a)
                wtr.flush()
                out += wtr.buf
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------- lossless (r12)

def _lossless_pred(out, x: int, y: int, predictor: int,
                   default: int) -> int:
    """T.81 H.1.2.1 prediction: the first sample predicts
    2^(P-1-Pt), the rest of the first line uses Ra, the first column of
    later lines uses Rb, elsewhere the scan's selected predictor 1-7."""
    if y == 0:
        return default if x == 0 else int(out[0, x - 1])
    if x == 0:
        return int(out[y - 1, 0])
    ra = int(out[y, x - 1])
    rb = int(out[y - 1, x])
    rc = int(out[y - 1, x - 1])
    if predictor == 1:
        return ra
    if predictor == 2:
        return rb
    if predictor == 3:
        return rc
    if predictor == 4:
        return ra + rb - rc
    if predictor == 5:
        return ra + ((rb - rc) >> 1)
    if predictor == 6:
        return rb + ((ra - rc) >> 1)
    if predictor == 7:
        return (ra + rb) >> 1
    raise JpegError(f"lossless predictor {predictor} invalid "
                    "(1-7; 0 is hierarchical-only)")


def _decode_lossless_scan(data, pos, frame, dtree, predictor, pt,
                          restart_interval) -> dict:
    """SOF3 single-component scan (T.81 Annex H, Huffman coding): each
    sample is a DC-style category + EXTEND-coded difference from its
    predictor; arithmetic is modulo 2^16. The fixture writes no DRI, so
    restart markers in a lossless scan raise (a typed boundary, not a
    silent mis-decode)."""
    if restart_interval:
        raise NotImplementedError(
            "restart intervals in lossless scans are not supported")
    w, h = frame["w"], frame["h"]
    rd = _BitReader(data, pos)
    out = np.zeros((h, w), dtype=np.int32)
    default = 1 << (8 - 1 - pt)
    for y in range(h):
        for x in range(w):
            t = rd.huff(dtree)
            if t == 16:
                diff = 32768
            else:
                diff = _extend(rd.bits(t), t) if t else 0
            pred = _lossless_pred(out, x, y, predictor, default)
            out[y, x] = (pred + diff) & 0xFFFF
    pixels = (out & 0xFF).astype(np.uint8)
    return {"width": w, "height": h, "channels": 1, "pixels": pixels}


def _decode_lossless_scan_mc(data, pos, frame, trees, predictor, pt,
                             restart_interval) -> dict:
    """Interleaved multi-component SOF3 scan (r13 — the boundary the
    r12 layer documented): with every component 1×1 the MCU is one
    sample of each component in frame order (T.81 H.2), so the
    bitstream interleaves per PIXEL; each component keeps its own
    prediction plane and Huffman table. Arithmetic modulo 2^16 as in
    the single-component path."""
    if restart_interval:
        raise NotImplementedError(
            "restart intervals in lossless scans are not supported")
    w, h = frame["w"], frame["h"]
    n = len(frame["comps"])
    rd = _BitReader(data, pos)
    planes = [np.zeros((h, w), dtype=np.int32) for _ in range(n)]
    default = 1 << (8 - 1 - pt)
    for y in range(h):
        for x in range(w):
            for ci in range(n):
                t = rd.huff(trees[ci])
                if t == 16:
                    diff = 32768
                else:
                    diff = _extend(rd.bits(t), t) if t else 0
                pred = _lossless_pred(planes[ci], x, y, predictor,
                                      default)
                planes[ci][y, x] = (pred + diff) & 0xFFFF
    pixels = np.stack([(p & 0xFF).astype(np.uint8) for p in planes],
                      axis=-1)
    return {"width": w, "height": h, "channels": n, "pixels": pixels}


def jpeg_encode_rgb_lossless(img: np.ndarray, predictor: int = 1,
                             pt: int = 0) -> bytes:
    """Lossless (SOF3) three-component JPEG of a uint8 H×W×3 image,
    fully interleaved (one sample of each component per MCU — T.81 H.2
    with 1×1 sampling): component 1 codes with the Annex K DC-luminance
    table, components 2-3 with the DC-chrominance table, each on its
    own prediction plane. Decode reproduces the input exactly."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise JpegError("rgb lossless encoder expects an HxWx3 image")
    h, w, _ = img.shape
    if not 1 <= predictor <= 7:
        raise JpegError("lossless predictor must be 1-7")
    wtr = _BitWriter()
    default = 1 << (8 - 1 - pt)
    tables = (_EDC_LUM, _EDC_CHR, _EDC_CHR)
    for y in range(h):
        for x in range(w):
            for ci in range(3):
                pred = _lossless_pred(img[:, :, ci], x, y, predictor,
                                      default)
                diff = int(img[y, x, ci]) - pred
                t = _csize(diff)
                code, ln = tables[ci][t]
                wtr.put(code, ln)
                if t:
                    wtr.put(diff if diff >= 0 else diff + (1 << t) - 1,
                            t)
    wtr.flush()
    head = (b"\xff\xd8"
            + b"\xff\xc3" + struct.pack(">HBHHB", 17, 8, h, w, 3)
            + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0])
            + bytes([3, 0x11, 0])
            + _dht_seg(0, 0, *_DC_LUM) + _dht_seg(0, 1, *_DC_CHR)
            + b"\xff\xda" + struct.pack(">HB", 12, 3)
            + bytes([1, 0x00, 2, 0x10, 3, 0x10, predictor, 0, pt]))
    return head + bytes(wtr.buf) + b"\xff\xd9"


def jpeg_encode_gray_lossless(img: np.ndarray, predictor: int = 1,
                              pt: int = 0) -> bytes:
    """Lossless (SOF3) grayscale JPEG of a uint8 H×W image — no 8-block
    alignment, no quantization: the decode reproduces the input EXACTLY.
    Differences from the H.1.2.1 predictor are coded with the standard
    Annex K DC-luminance Huffman table (categories up to 11 cover the
    8-bit diff range of every predictor)."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    if not 1 <= predictor <= 7:
        raise JpegError("lossless predictor must be 1-7")
    wtr = _BitWriter()
    default = 1 << (8 - 1 - pt)
    for y in range(h):
        for x in range(w):
            pred = _lossless_pred(img, x, y, predictor, default)
            diff = int(img[y, x]) - pred
            t = _csize(diff)
            code, ln = _EDC_LUM[t]
            wtr.put(code, ln)
            if t:
                wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    wtr.flush()
    head = (b"\xff\xd8"
            + b"\xff\xc3" + struct.pack(">HBHHB", 11, 8, h, w, 1)
            + bytes([1, 0x11, 0])
            + _dht_seg(0, 0, *_DC_LUM)
            + b"\xff\xda" + struct.pack(">HB", 8, 1)
            + bytes([1, 0x00, predictor, 0, pt]))
    return head + bytes(wtr.buf) + b"\xff\xd9"
