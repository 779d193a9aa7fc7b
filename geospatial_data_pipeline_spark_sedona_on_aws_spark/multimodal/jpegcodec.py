"""Pure-stdlib baseline JPEG (ITU T.81) codec — no PIL required.

Decoder: full baseline sequential DCT — marker walk, DQT (8/16-bit
entries), DHT, SOF0, DRI/RSTn restart markers, interleaved-MCU Huffman
scan with DC prediction, zigzag dequantization, separable 2-D IDCT
(numpy 8×8 basis product), per-component upsampling (any H/V factors),
and YCbCr→RGB for 3-component images. Progressive (SOF2) and arithmetic
coding raise a deterministic NotImplementedError (documented gap — the
overwhelming majority of real-corpus JPEGs are baseline).

Encoder: baseline sequential, 1-component grayscale or 3-component
YCbCr (4:4:4, or 4:2:0 via luma sampling factors 2×2), standard Annex K
Huffman tables, caller-supplied quantization (default all-ones). With
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
    """Decode baseline JPEG bytes to
    {width, height, channels, pixels (H×W or H×W×3 uint8)}. Truncated
    or corrupt streams raise JpegError (never a bare struct/buffer
    error), progressive/arithmetic raise NotImplementedError."""
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
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                      # EOI
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
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
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported; "
                f"got SOF marker 0xFF{marker:02X} (progressive/arithmetic)")
        elif marker == 0xDD:                    # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                    # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, huff_dc[tt >> 4], huff_ac[tt & 0xF]))
            return _decode_scan(data, seg_end, frame, scan, qt,
                                restart_interval)
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
