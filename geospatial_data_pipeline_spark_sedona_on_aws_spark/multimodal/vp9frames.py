"""IVF container + VP9 uncompressed-frame-header parser — pure stdlib.

The r8 verdict's codec residual list (item 2) names VP9 alongside MP3.
Full VP9 pixel reconstruction needs a compressed-header arithmetic decoder
and the whole prediction/transform stack; the UNCOMPRESSED layer, however
— the IVF stream framing and the per-frame uncompressed header the VP9
spec (Bitstream & Decoding Process Specification, §6.1-6.2) puts in front
of every frame — is what a video-corpus pipeline filters on before ever
decoding pixels: resolution, profile, bit depth, keyframe cadence,
show-existing reuse. All of it is bit-exact parseable without a codec.

Implemented per spec:

- the IVF file header (``DKIF`` magic, fourcc, dimensions, timebase,
  frame count) and the strict 12-byte per-frame framing walk (a byte
  audit: sizes must tile the stream exactly, PTS must be monotonic);
- the VP9 uncompressed header bitstream: frame marker, 2-bit profile
  (+ profile-3 reserved bit), show-existing-frame short form (3-bit
  index), frame type / show_frame / error-resilient flags, the 24-bit
  keyframe sync code ``49 83 42``, color config (bit depth for
  profiles ≥2, color space, color range, per-profile subsampling
  bits), and the 16+16-bit frame size;
- inter-frame (non-key, non-show-existing) headers are NOT parsed —
  their layout needs reference-frame state this module deliberately
  does not model; they raise ``Vp9Error`` (a deterministic, documented
  boundary like jpegcodec's arithmetic-coding gate).

``ivf_vp9_encode`` emits deterministic spec-valid streams (keyframes +
show-existing frames, filler payload with a per-frame-constant byte law)
so the probe has a closed-form DuckDB oracle — see
``multimodal/binary.py::multimodal_vp9_probe``.

The reference pipeline is geometry-only (spark_job/process_geodata.py);
video surface is north-star LLM-pipeline breadth per BASELINE.json.
"""

from __future__ import annotations

import struct

VP9_SYNC_CODE = (0x49, 0x83, 0x42)
CS_BT_601 = 1          # the color space the fixture writes (non-RGB)


class Vp9Error(ValueError):
    """Malformed or unsupported IVF/VP9 stream."""


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i:i + 8]:
                byte = (byte << 1) | b
            byte <<= max(0, 8 - len(self.bits[i:i + 8]))
            out.append(byte)
        return bytes(out)


class _BitReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def get(self, n: int) -> int:
        v = 0
        for _ in range(n):
            i, o = divmod(self.pos, 8)
            if i >= len(self.buf):
                raise Vp9Error("uncompressed header overruns frame data")
            v = (v << 1) | ((self.buf[i] >> (7 - o)) & 1)
            self.pos += 1
        return v

    def byte_len(self) -> int:
        return (self.pos + 7) // 8


def _parse_frame_header(data: bytes) -> dict:
    """Parse one VP9 uncompressed header (spec §6.2). Returns the decoded
    fields plus the header's byte length within the frame payload."""
    r = _BitReader(data)
    if r.get(2) != 0b10:
        raise Vp9Error("bad VP9 frame marker")
    profile = r.get(1) | (r.get(1) << 1)   # low bit first, then high
    if profile == 3 and r.get(1) != 0:
        raise Vp9Error("profile-3 reserved bit set")
    if r.get(1):                           # show_existing_frame
        return {"kind": "show_existing", "profile": profile,
                "show_idx": r.get(3), "header_bytes": r.byte_len()}
    frame_type = r.get(1)                  # 0 = KEY_FRAME
    show_frame = r.get(1)
    error_resilient = r.get(1)
    if frame_type != 0:
        raise Vp9Error(
            "inter-frame uncompressed headers are not supported (needs "
            "reference-frame state); keyframe/show-existing streams only")
    if tuple(r.get(8) for _ in range(3)) != VP9_SYNC_CODE:
        raise Vp9Error("bad keyframe sync code")
    bit_depth = 8
    if profile >= 2:
        bit_depth = 12 if r.get(1) else 10
    color_space = r.get(3)
    sub_x = sub_y = 1                      # 4:2:0 implied for profile 0/2
    color_range = 0
    if color_space != 7:                   # CS_RGB
        color_range = r.get(1)
        if profile in (1, 3):
            sub_x, sub_y = r.get(1), r.get(1)
            if r.get(1):
                raise Vp9Error("color-config reserved bit set")
    elif profile in (1, 3):
        if r.get(1):
            raise Vp9Error("color-config reserved bit set")
        sub_x = sub_y = 0
    width = r.get(16) + 1
    height = r.get(16) + 1
    if r.get(1):                           # render_and_frame_size_different
        r.get(32)                          # render W/H minus 1
    return {"kind": "key", "profile": profile, "show_frame": show_frame,
            "error_resilient": error_resilient, "bit_depth": bit_depth,
            "color_space": color_space, "color_range": color_range,
            "sub_x": sub_x, "sub_y": sub_y, "width": width,
            "height": height, "header_bytes": r.byte_len()}


def ivf_vp9_probe(payload: bytes) -> dict:
    """Walk a complete IVF/VP9 stream: validate the container header,
    tile the byte stream with the 12-byte frame headers, parse every
    frame's uncompressed header, and checksum the filler bytes after
    each keyframe header (the segmentation audit — a probe that mis-
    sizes a header or a frame shifts the sum)."""
    if len(payload) < 32:
        raise Vp9Error("stream shorter than the IVF header")
    magic, ver, hdr_sz, fourcc, w, h, den, num, n_frames = struct.unpack(
        "<4sHH4sHHIII", payload[:28])
    if magic != b"DKIF":
        raise Vp9Error("bad IVF magic")
    if fourcc != b"VP90":
        raise Vp9Error(f"not a VP9 stream (fourcc {fourcc!r})")
    if ver != 0 or hdr_sz != 32:
        raise Vp9Error("unsupported IVF version/header size")
    pos = 32
    n_keys = n_show = 0
    filler_sum = 0
    first_key = None
    last_pts = -1
    seen = 0
    while pos < len(payload):
        if pos + 12 > len(payload):
            raise Vp9Error("truncated IVF frame header")
        size, pts = struct.unpack("<IQ", payload[pos:pos + 12])
        pos += 12
        if pos + size > len(payload):
            raise Vp9Error("IVF frame size overruns stream")
        if pts <= last_pts:
            raise Vp9Error("non-monotonic PTS")
        last_pts = pts
        fh = _parse_frame_header(payload[pos:pos + size])
        if fh["kind"] == "key":
            n_keys += 1
            if first_key is None:
                first_key = fh
                if (fh["width"], fh["height"]) != (w, h):
                    raise Vp9Error("IVF dims disagree with keyframe dims")
            filler_sum += sum(payload[pos + fh["header_bytes"]:pos + size])
        else:
            n_show += 1
            if fh["header_bytes"] != size:
                raise Vp9Error("show-existing frame has trailing bytes")
        pos += size
        seen += 1
    if seen != n_frames:
        raise Vp9Error("IVF frame-count field disagrees with stream")
    if first_key is None:
        raise Vp9Error("stream has no keyframe")
    return {
        "width": first_key["width"], "height": first_key["height"],
        "profile": first_key["profile"],
        "bit_depth": first_key["bit_depth"],
        "color_space": first_key["color_space"],
        "color_range": first_key["color_range"],
        "sub_x": first_key["sub_x"], "sub_y": first_key["sub_y"],
        "n_frames": seen, "n_keyframes": n_keys,
        "n_show_existing": n_show, "last_pts": last_pts,
        "timebase_den": den, "timebase_num": num,
        "duration_us": last_pts * num * 1_000_000 // den if den else 0,
        "filler_sum": filler_sum,
    }


# ------------------------------------------------------------- encoder

def _filler_byte(seed: int, frame: int) -> int:
    """Per-frame-constant filler law (≤ 250 ≠ any header magic),
    mirrored by the SQL oracle in closed form."""
    return (seed * 13 + frame * 7) % 251


def _key_frame(profile: int, width: int, height: int, bit_depth: int,
               color_range: int, sub_x: int, sub_y: int,
               filler: bytes) -> bytes:
    w = _BitWriter()
    w.put(0b10, 2)
    w.put(profile & 1, 1)
    w.put(profile >> 1, 1)
    if profile == 3:
        w.put(0, 1)
    w.put(0, 1)                            # show_existing_frame
    w.put(0, 1)                            # frame_type = KEY
    w.put(1, 1)                            # show_frame
    w.put(0, 1)                            # error_resilient
    for b in VP9_SYNC_CODE:
        w.put(b, 8)
    if profile >= 2:
        w.put(1 if bit_depth == 12 else 0, 1)
    w.put(CS_BT_601, 3)
    w.put(color_range, 1)
    if profile in (1, 3):
        w.put(sub_x, 1)
        w.put(sub_y, 1)
        w.put(0, 1)                        # reserved
    w.put(width - 1, 16)
    w.put(height - 1, 16)
    w.put(0, 1)                            # render size == frame size
    return w.tobytes() + filler


def _show_existing_frame(profile: int, idx: int) -> bytes:
    w = _BitWriter()
    w.put(0b10, 2)
    w.put(profile & 1, 1)
    w.put(profile >> 1, 1)
    if profile == 3:
        w.put(0, 1)
    w.put(1, 1)                            # show_existing_frame
    w.put(idx, 3)
    return w.tobytes()


def key_header_bytes(profile: int) -> int:
    """Byte length of the fixture keyframe header (all fields above):
    69 base bits (marker 2 + profile 2 + show-existing 1 + type/show/
    error 3 + sync 24 + color space 3 + range 1 + W/H 32 + render 1)
    + profile-3 reserved + hi-depth bit + odd-profile subsampling bits
    → 9 bytes for profiles 0-2, 10 for profile 3."""
    bits = 69 + (1 if profile == 3 else 0) + (1 if profile >= 2 else 0) \
        + (3 if profile in (1, 3) else 0)
    return (bits + 7) // 8


def ivf_vp9_encode(width: int, height: int, n_frames: int, profile: int,
                   bit_depth: int, color_range: int, sub_x: int,
                   sub_y: int, seed: int, timebase=(1000, 1)) -> bytes:
    """Deterministic IVF/VP9 fixture: frame 0 is a keyframe; frame f > 0
    is a show-existing frame when (f + seed) % 3 == 0, else another
    keyframe. Keyframe f carries 16 + (seed*5 + f*11) % 50 filler bytes
    of the per-frame-constant law; PTS = 1000·f."""
    frames = []
    for f in range(n_frames):
        if f > 0 and (f + seed) % 3 == 0:
            data = _show_existing_frame(profile, idx=f % 8)
        else:
            n_fill = 16 + (seed * 5 + f * 11) % 50
            data = _key_frame(profile, width, height, bit_depth,
                              color_range, sub_x, sub_y,
                              bytes([_filler_byte(seed, f)]) * n_fill)
        frames.append((f * 1000, data))
    out = bytearray(struct.pack(
        "<4sHH4sHHIII4x", b"DKIF", 0, 32, b"VP90", width, height,
        timebase[0], timebase[1], n_frames))
    for pts, data in frames:
        out += struct.pack("<IQ", len(data), pts) + data
    return bytes(out)
