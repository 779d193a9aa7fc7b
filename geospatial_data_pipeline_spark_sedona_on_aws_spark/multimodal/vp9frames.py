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
    return _parse_frame_header_r(_BitReader(data))


def _parse_frame_header_r(r: "_BitReader") -> dict:
    """Header parse on a caller-owned bit reader, so full-header walkers
    (r12) can continue into the tail fields with the same reader."""
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
        return _parse_inter_header(r, profile, show_frame,
                                   error_resilient)
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


def _parse_inter_header(r: "_BitReader", profile: int, show_frame: int,
                        error_resilient: int) -> dict:
    """Inter-frame uncompressed header (spec §6.2, r11 — VERDICT r10
    item 6): reset_frame_context, refresh_frame_flags, the three
    reference slots (index + sign bias), frame_size_with_refs (sizes
    inherited from the first found reference, or explicit 16+16 dims
    when no ref matches), allow_high_precision_mv, and the
    interpolation filter. The walk stops after the filter — the
    remaining uncompressed-header fields (loop filter, quantization,
    segmentation, tiles) follow in real streams; the fixture writes its
    filler right here, so header_bytes audits exactly these bits.
    r12: non-shown inter frames (show_frame == 0, intra_only == 0 — the
    alt-ref frames superframes hide) parse through the normal inter
    path after the intra_only bit; intra_only == 1 (its own sync-code +
    color-config layout) stays the documented boundary."""
    intra_only = 0
    if not show_frame:
        intra_only = r.get(1)
        if intra_only:
            raise Vp9Error("intra-only frames are not supported "
                           "(documented boundary)")
    reset_frame_context = 0
    if not error_resilient:
        reset_frame_context = r.get(2)
    refresh_frame_flags = r.get(8)
    ref_idx = []
    sign_bias = []
    for _ in range(3):
        ref_idx.append(r.get(3))
        sign_bias.append(r.get(1))
    found_slot = -1
    width = height = -1
    for i in range(3):
        if r.get(1):                       # found_ref: size from ref i
            found_slot = i
            break
    if found_slot < 0:
        width = r.get(16) + 1
        height = r.get(16) + 1
        if r.get(1):                       # render != frame size
            r.get(32)
    allow_high_precision_mv = r.get(1)
    is_filter_switchable = r.get(1)
    interp_filter = -1 if is_filter_switchable else r.get(2)
    return {"kind": "inter", "profile": profile,
            "show_frame": show_frame, "error_resilient": error_resilient,
            "reset_frame_context": reset_frame_context,
            "refresh_frame_flags": refresh_frame_flags,
            "ref_idx": ref_idx, "sign_bias": sign_bias,
            "found_slot": found_slot, "width": width, "height": height,
            "allow_high_precision_mv": allow_high_precision_mv,
            "interp_filter": interp_filter,
            "header_bytes": r.byte_len()}


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
    n_keys = n_show = n_inter = 0
    filler_sum = 0
    inter_refresh_sum = inter_ref_sum = inter_found_sum = 0
    inter_hp_mv = inter_filter_sum = 0
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
        elif fh["kind"] == "inter":
            n_inter += 1
            if n_keys == 0:
                raise Vp9Error("inter frame before any keyframe")
            # the inter-header bit audit (r11): any miscounted field
            # shifts the filler boundary and changes the stream checksum
            filler_sum += sum(payload[pos + fh["header_bytes"]:pos + size])
            inter_refresh_sum += fh["refresh_frame_flags"]
            inter_ref_sum += sum(fh["ref_idx"]) + sum(fh["sign_bias"])
            inter_found_sum += fh["found_slot"] + 1
            inter_hp_mv += fh["allow_high_precision_mv"]
            inter_filter_sum += fh["interp_filter"] + 1
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
        "n_show_existing": n_show, "n_inter": n_inter,
        "last_pts": last_pts,
        "timebase_den": den, "timebase_num": num,
        "duration_us": last_pts * num * 1_000_000 // den if den else 0,
        "filler_sum": filler_sum,
        "inter_refresh_sum": inter_refresh_sum,
        "inter_ref_sum": inter_ref_sum,
        "inter_found_sum": inter_found_sum,
        "inter_hp_mv": inter_hp_mv,
        "inter_filter_sum": inter_filter_sum,
    }


# ------------------------------------------------------------- encoder

def _filler_byte(seed: int, frame: int) -> int:
    """Per-frame-constant filler law (≤ 250 ≠ any header magic),
    mirrored by the SQL oracle in closed form."""
    return (seed * 13 + frame * 7) % 251


def _key_frame(profile: int, width: int, height: int, bit_depth: int,
               color_range: int, sub_x: int, sub_y: int,
               filler: bytes, tail_law: dict | None = None,
               seed: int = 0, f: int = 0) -> bytes:
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
    if tail_law is not None:
        _write_header_tail(w, tail_law, 0, width)
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


def _inter_frame(profile: int, width: int, height: int, seed: int,
                 f: int, filler: bytes, show: int = 1,
                 tail_law: dict | None = None) -> bytes:
    """Deterministic inter frame following the r11 field law (mirrored
    closed-form by the SQL oracle):
      error_resilient = (seed + f) % 2
      reset_frame_context = (seed + f) % 4        (only when resilient=0)
      refresh_frame_flags = (seed * 3 + f) % 256
      ref_idx[i] = (seed + f + i) % 8, sign_bias[i] = (seed + f + i) % 2
      found slot fr = (seed + f) % 4: slots fr<3 inherit that ref's
        size (fr+1 found bits); fr=3 writes explicit dims
      allow_high_precision_mv = (seed + f) % 2
      filter: switchable when f % 2 else raw (seed + f) % 3."""
    w = _BitWriter()
    w.put(0b10, 2)
    w.put(profile & 1, 1)
    w.put(profile >> 1, 1)
    if profile == 3:
        w.put(0, 1)
    w.put(0, 1)                            # show_existing_frame
    w.put(1, 1)                            # frame_type = NON_KEY
    w.put(show, 1)                         # show_frame (0 = alt-ref)
    er = (seed + f) % 2
    w.put(er, 1)                           # error_resilient
    if not show:
        w.put(0, 1)                        # intra_only = 0 (real inter;
        #                                    spec order: after resilient)
    if not er:
        w.put((seed + f) % 4, 2)           # reset_frame_context
    w.put((seed * 3 + f) % 256, 8)         # refresh_frame_flags
    for i in range(3):
        w.put((seed + f + i) % 8, 3)
        w.put((seed + f + i) % 2, 1)
    fr = (seed + f) % 4
    if fr < 3:
        for _ in range(fr):
            w.put(0, 1)
        w.put(1, 1)                        # found_ref at slot fr
    else:
        for _ in range(3):
            w.put(0, 1)
        w.put(width - 1, 16)
        w.put(height - 1, 16)
        w.put(0, 1)                        # render == frame size
    w.put((seed + f) % 2, 1)               # allow_high_precision_mv
    switchable = f % 2
    w.put(switchable, 1)
    if not switchable:
        w.put((seed + f) % 3, 2)
    if tail_law is not None:
        _write_header_tail(w, tail_law, er, width)
    return w.tobytes() + filler


def key_header_bytes(profile: int) -> int:
    """Byte length of the fixture keyframe header (all fields above):
    69 base bits (marker 2 + profile 2 + show-existing 1 + type/show/
    error 3 + sync 24 + color space 3 + range 1 + W/H 32 + render 1)
    + profile-3 reserved + hi-depth bit + odd-profile subsampling bits
    → 9 bytes for profiles 0-2, 10 for profile 3."""
    bits = 69 + (1 if profile == 3 else 0) + (1 if profile >= 2 else 0) \
        + (3 if profile in (1, 3) else 0)
    return (bits + 7) // 8


def superframe_pack(subframes: list, szbytes: int) -> bytes:
    """Annex-B superframe: the subframe bytes followed by the index —
    marker, n × szbytes little-endian sizes, marker again. Marker byte:
    0b110 | (szbytes-1) << 3 | (n_subframes - 1)."""
    n = len(subframes)
    if not 1 <= n <= 8:
        raise Vp9Error("superframe holds 1-8 subframes")
    if not 1 <= szbytes <= 4:
        raise Vp9Error("superframe size field is 1-4 bytes")
    marker = 0xC0 | ((szbytes - 1) << 3) | (n - 1)
    out = bytearray()
    for sub in subframes:
        if len(sub) >= (1 << (8 * szbytes)):
            raise Vp9Error("subframe too large for the size field")
        out += sub
    out.append(marker)
    for sub in subframes:
        out += len(sub).to_bytes(szbytes, "little")
    out.append(marker)
    return bytes(out)


def ivf_vp9_encode(width: int, height: int, n_frames: int, profile: int,
                   bit_depth: int, color_range: int, sub_x: int,
                   sub_y: int, seed: int, timebase=(1000, 1),
                   inter_frames: bool = False,
                   superframes: bool = False,
                   full_headers: bool = False,
                   compressed_headers: bool = False) -> bytes:
    """Deterministic IVF/VP9 fixture: frame 0 is a keyframe; frame f > 0
    is a show-existing frame when (f + seed) % 3 == 0, else another
    keyframe. Keyframe f carries 16 + (seed*5 + f*11) % 50 filler bytes
    of the per-frame-constant law; PTS = 1000·f. With ``inter_frames``
    (r11) the (f + seed) % 3 == 1 frames (f > 0) become INTER frames
    following the _inter_frame field law, carrying
    16 + (seed*7 + f*13) % 50 filler bytes. With ``superframes`` (r12)
    the (f + seed) % 3 == 2 packets (f > 0) become two-subframe
    SUPERFRAMES — a hidden alt-ref inter frame (show_frame = 0,
    intra_only = 0, the same field/filler laws keyed by f) followed by
    a show-existing frame, packed with an Annex-B index whose size
    field is 1 + (seed + f) % 2 bytes wide. With ``full_headers`` (r12)
    key and inter frames carry the COMPLETE uncompressed-header tail
    (frame-context flags, loop filter, quantization, segmentation gate,
    tile info, header_size — header_tail_law) before their filler.
    With ``compressed_headers`` (r13, implies full_headers) every
    KEYFRAME carries a REAL bool-coded compressed header right after
    its uncompressed header — header_size becomes the ACTUAL encoded
    byte count instead of header_tail_law's synthetic value, and the
    filler law bytes follow the compressed bytes."""
    full_headers = full_headers or compressed_headers
    frames = []
    for f in range(n_frames):
        tail = header_tail_law(seed, f, width) if full_headers else None
        if f > 0 and (f + seed) % 3 == 0:
            data = _show_existing_frame(profile, idx=f % 8)
        elif inter_frames and f > 0 and (f + seed) % 3 == 1:
            n_fill = 16 + (seed * 7 + f * 13) % 50
            data = _inter_frame(profile, width, height, seed, f,
                                bytes([_filler_byte(seed, f)]) * n_fill,
                                tail_law=tail)
        elif superframes and f > 0 and (f + seed) % 3 == 2:
            n_fill = 16 + (seed * 7 + f * 13) % 50
            hidden = _inter_frame(profile, width, height, seed, f,
                                  bytes([_filler_byte(seed, f)]) * n_fill,
                                  show=0, tail_law=tail)
            shown = _show_existing_frame(profile, idx=f % 8)
            data = superframe_pack([hidden, shown],
                                   szbytes=1 + (seed + f) % 2)
        else:
            n_fill = 16 + (seed * 5 + f * 11) % 50
            fill = bytes([_filler_byte(seed, f)]) * n_fill
            if compressed_headers:
                cb = compressed_header_encode(
                    is_lossless(tail),
                    compressed_header_law(seed, f)["tx_mode"])
                # deep_lf: these streams also write the REAL loop-filter
                # delta-update branch (r13 — the r12 parser's boundary)
                tail = dict(tail, header_size=len(cb), deep_lf=1)
                fill = cb + fill
            data = _key_frame(profile, width, height, bit_depth,
                              color_range, sub_x, sub_y, fill,
                              tail_law=tail)
        frames.append((f * 1000, data))
    out = bytearray(struct.pack(
        "<4sHH4sHHIII4x", b"DKIF", 0, 32, b"VP90", width, height,
        timebase[0], timebase[1], n_frames))
    for pts, data in frames:
        out += struct.pack("<IQ", len(data), pts) + data
    return bytes(out)


def superframe_split(chunk: bytes) -> tuple:
    """Annex-B superframe index walk on one IVF packet: returns
    (subframe byte-ranges, index_bytes). A packet whose last byte is not
    a superframe marker is a single frame ((0, len), 0). The marker
    pattern 110xxyyy can occur by chance in ordinary frame payload (the
    fixture's constant filler bytes land in [0xC0, 0xDF] for some
    seeds), so a candidate index is validated before use: the leading
    marker byte must match (the libvpx check) AND the sizes must sum to
    the packet exactly — a check STRICTER than libvpx, which only
    requires the index to fit (ADVICE r12); safe for the fixture, whose
    filler bytes >= 0xC0 can never sum under the packet length, but a
    real-world superframe with trailing slack would be read as a single
    frame here rather than split. An inconsistent candidate falls back
    to single-frame instead of raising."""
    if not chunk:
        raise Vp9Error("empty IVF packet")
    single = ((0, len(chunk)),), 0
    marker = chunk[-1]
    if (marker & 0xE0) != 0xC0:
        return single
    szbytes = ((marker >> 3) & 0b11) + 1
    n_sub = (marker & 0b111) + 1
    index_len = 2 + n_sub * szbytes
    if len(chunk) < index_len or chunk[-index_len] != marker:
        return single
    sizes = []
    pos = len(chunk) - index_len + 1
    for _ in range(n_sub):
        sizes.append(int.from_bytes(chunk[pos:pos + szbytes], "little"))
        pos += szbytes
    if sum(sizes) + index_len != len(chunk):
        return single
    spans = []
    off = 0
    for s in sizes:
        spans.append((off, off + s))
        off += s
    return tuple(spans), index_len


#: kind codes for the per-subframe rows (every column stays BIGINT)
VP9_KIND_KEY, VP9_KIND_INTER, VP9_KIND_SHOW = 0, 1, 2


def vp9_superframes(payload: bytes) -> list:
    """Superframe-granular stream walk (r11 verdict item 5): IVF packets
    are split on their trailing Annex-B index (hidden alt-ref + shown
    frames packed per packet), every SUBFRAME's uncompressed header is
    parsed, and each subframe row carries the byte audit — header bytes,
    subframe bytes, index bytes, packet bytes (= Σ subframe + index,
    enforced by superframe_split), and the filler checksum that shifts
    if any header bit or index size field is miscounted."""
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
    rows = []
    pos = 32
    f = 0
    seen_key = False
    while pos < len(payload):
        if pos + 12 > len(payload):
            raise Vp9Error("truncated IVF frame header")
        size, _pts = struct.unpack("<IQ", payload[pos:pos + 12])
        pos += 12
        if pos + size > len(payload):
            raise Vp9Error("IVF frame size overruns stream")
        chunk = payload[pos:pos + size]
        spans, index_bytes = superframe_split(chunk)
        for si, (lo, hi) in enumerate(spans):
            fh = _parse_frame_header(chunk[lo:hi])
            if fh["kind"] == "key":
                seen_key = True
                kind, show = VP9_KIND_KEY, fh["show_frame"]
            elif fh["kind"] == "inter":
                if not seen_key:
                    raise Vp9Error("inter frame before any keyframe")
                kind, show = VP9_KIND_INTER, fh["show_frame"]
            else:
                kind, show = VP9_KIND_SHOW, -1
                if fh["header_bytes"] != hi - lo:
                    raise Vp9Error(
                        "show-existing subframe has trailing bytes")
            filler = chunk[lo + fh["header_bytes"]:hi]
            rows.append({
                "packet": f, "subframe": si, "n_sub": len(spans),
                "kind": kind, "show_frame": show,
                "header_bytes": fh["header_bytes"],
                "frame_bytes": hi - lo,
                "index_bytes": index_bytes,
                "packet_bytes": size,
                "filler_sum": sum(filler),
            })
        f += 1
        pos += size
    if f != n_frames:
        raise Vp9Error("IVF frame-count field disagrees with stream")
    if not seen_key:
        raise Vp9Error("stream has no keyframe")
    return rows


# ------------------------------------------- full uncompressed header (r12)

def _tile_log2_bounds(width: int) -> tuple:
    """(min, max) log2 tile columns per spec §6.2.14: superblock columns
    from the frame width (MI units of 8, SB64 units of 8 MIs),
    min chosen so a tile is <= 4096 pixels wide (64 SBs), max so every
    tile keeps >= 4 SB64 columns."""
    mi_cols = (width + 7) >> 3
    sb64_cols = (mi_cols + 7) >> 3
    min_log2 = 0
    while (64 << min_log2) < sb64_cols:
        min_log2 += 1
    max_log2 = 0
    while (sb64_cols >> (max_log2 + 1)) >= 4:
        max_log2 += 1
    return min_log2, max(max_log2, min_log2)


def header_tail_law(seed: int, f: int, width: int) -> dict:
    """Deterministic field law for the uncompressed-header TAIL (the
    fields after the r11 stopping point), mirrored closed-form by the
    SQL oracle. Laws keep the fixture inside the implemented surface:
    loop-filter delta updates and segmentation stay 0 (their enabled
    flags still exercise both values)."""
    min_l2, max_l2 = _tile_log2_bounds(width)
    return {
        "refresh_frame_context": (seed + f) % 2,
        "frame_parallel": (seed + f + 1) % 2,
        "frame_context_idx": (seed * 3 + f) % 4,
        "lf_level": (seed * 7 + f * 5) % 64,
        "lf_sharpness": (seed + f * 3) % 8,
        "lf_delta_enabled": (seed + f) % 2,
        # deep_lf fields (r13): written only when the law dict carries
        # deep_lf = 1 (the compressed_headers fixture) — the r10-r12
        # streams keep their update = 0 byte layout untouched
        "lf_delta_update": (seed * 3 + f * 2 + 1) % 2,
        "ref_delta_flags": tuple((seed + f + i) % 3 == 0
                                 for i in range(4)),
        "ref_delta_vals": tuple(
            (-1 if (seed + f + i) % 2 else 1)
            * ((seed * 3 + f + i * 5) % 64) for i in range(4)),
        "mode_delta_flags": tuple((seed + 2 * f + i) % 2 == 0
                                  for i in range(2)),
        "mode_delta_vals": tuple(
            (-1 if (f + i) % 2 else 1)
            * ((seed + f * 3 + i * 7) % 64) for i in range(2)),
        "base_q_idx": (seed * 5 + f * 3) % 256,
        "dq_flags": tuple((seed + f + i) % 4 == 0 for i in range(3)),
        "dq_mags": tuple((seed + f + i * 7) % 16 for i in range(3)),
        "dq_signs": tuple((seed + f + i) % 2 for i in range(3)),
        "tile_cols_log2": min(min_l2 + (seed + f) % 2, max_l2),
        "tile_rows_log2": (seed + f) % 3,
        "header_size": 1 + (seed * 9 + f * 5) % 60000,
        "min_log2": min_l2,
    }


def _write_header_tail(w: "_BitWriter", law: dict, error_resilient: int,
                       width: int) -> None:
    """Spec §6.2 field order after the r11 stopping point:
    refresh_frame_context + frame_parallel (absent when resilient),
    frame_context_idx, loop_filter_params, quantization_params,
    segmentation_enabled (fixture: 0), tile_info, header_size. The
    tile-column loop writes one 1-bit per increment and a terminating
    0 only while below max_log2 (the spec's loop condition)."""
    if not error_resilient:
        w.put(law["refresh_frame_context"], 1)
        w.put(law["frame_parallel"], 1)
    w.put(law["frame_context_idx"], 2)
    w.put(law["lf_level"], 6)
    w.put(law["lf_sharpness"], 3)
    w.put(law["lf_delta_enabled"], 1)
    if law["lf_delta_enabled"]:
        if law.get("deep_lf"):
            upd = law["lf_delta_update"]
            w.put(upd, 1)
            if upd:
                for flag, val in zip(law["ref_delta_flags"],
                                     law["ref_delta_vals"]):
                    w.put(1 if flag else 0, 1)
                    if flag:               # su(6): magnitude then sign
                        w.put(abs(val), 6)
                        w.put(1 if val < 0 else 0, 1)
                for flag, val in zip(law["mode_delta_flags"],
                                     law["mode_delta_vals"]):
                    w.put(1 if flag else 0, 1)
                    if flag:
                        w.put(abs(val), 6)
                        w.put(1 if val < 0 else 0, 1)
        else:
            w.put(0, 1)                    # loop_filter_delta_update = 0
    w.put(law["base_q_idx"], 8)
    for flag, mag, sign in zip(law["dq_flags"], law["dq_mags"],
                               law["dq_signs"]):
        w.put(1 if flag else 0, 1)
        if flag:
            w.put(mag, 4)
            w.put(sign, 1)
    w.put(0, 1)                            # segmentation_enabled = 0
    min_l2, max_l2 = _tile_log2_bounds(width)
    tl2 = law["tile_cols_log2"]
    for _ in range(tl2 - min_l2):
        w.put(1, 1)                        # increment_tile_cols_log2
    if tl2 < max_l2:
        w.put(0, 1)                        # loop terminator
    w.put(1 if law["tile_rows_log2"] > 0 else 0, 1)
    if law["tile_rows_log2"] > 0:
        w.put(1 if law["tile_rows_log2"] > 1 else 0, 1)
    w.put(law["header_size"], 16)


def _parse_header_tail(r: "_BitReader", error_resilient: int,
                       width: int) -> dict:
    min_l2, max_l2 = _tile_log2_bounds(width)
    out = {"refresh_frame_context": 0, "frame_parallel": 1}
    if not error_resilient:
        out["refresh_frame_context"] = r.get(1)
        out["frame_parallel"] = r.get(1)
    out["frame_context_idx"] = r.get(2)
    out["lf_level"] = r.get(6)
    out["lf_sharpness"] = r.get(3)
    out["lf_delta_enabled"] = r.get(1)
    out["lf_delta_update"] = -1
    out["ref_update_mask"] = 0
    out["mode_update_mask"] = 0
    out["ref_deltas"] = [0, 0, 0, 0]
    out["mode_deltas"] = [0, 0]
    if out["lf_delta_enabled"]:
        upd = r.get(1)
        out["lf_delta_update"] = upd
        if upd:                            # r13: real su(6) delta parse
            for i in range(4):
                if r.get(1):
                    out["ref_update_mask"] |= 1 << i
                    mag = r.get(6)
                    out["ref_deltas"][i] = -mag if r.get(1) else mag
            for i in range(2):
                if r.get(1):
                    out["mode_update_mask"] |= 1 << i
                    mag = r.get(6)
                    out["mode_deltas"][i] = -mag if r.get(1) else mag
    out["base_q_idx"] = r.get(8)
    for i, name in enumerate(("dq_ydc", "dq_uvdc", "dq_uvac")):
        if r.get(1):
            mag = r.get(4)
            sign = r.get(1)
            out[name] = -mag if sign else mag
            out[name + "_coded"] = 1
        else:
            out[name] = 0
            out[name + "_coded"] = 0
    if r.get(1):
        raise Vp9Error("segmentation parameters are not supported "
                       "(documented boundary)")
    tl2 = min_l2
    while tl2 < max_l2:
        if r.get(1):
            tl2 += 1
        else:
            break
    out["tile_cols_log2"] = tl2
    trl = r.get(1)
    if trl:
        trl += r.get(1)
    out["tile_rows_log2"] = trl
    out["header_size"] = r.get(16)
    return out


def vp9_headers_full(payload: bytes) -> list:
    """COMPLETE uncompressed-header walk (r12 — the fields after the r11
    stopping point): per key/inter frame, parse the base header and
    continue with _parse_header_tail through frame-context flags, loop
    filter, quantization (base_q + the three delta_q), the segmentation
    gate, tile geometry, and header_size_in_bytes — everything the spec
    puts before the compressed header. One row per frame with the full
    quantizer/filter state a video-corpus pipeline filters on, plus the
    byte audit (header_bytes, filler checksum). Superframes are split
    first; tile bounds derive from the IVF-declared width (all fixture
    frames share it — size-from-ref inheritance needs reference state
    this walker does not model). The compressed header itself (bool
    decoder) remains the documented boundary."""
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
    rows = []
    pos = 32
    f = 0
    while pos < len(payload):
        if pos + 12 > len(payload):
            raise Vp9Error("truncated IVF frame header")
        size, _pts = struct.unpack("<IQ", payload[pos:pos + 12])
        pos += 12
        if pos + size > len(payload):
            raise Vp9Error("IVF frame size overruns stream")
        chunk = payload[pos:pos + size]
        spans, _idx = superframe_split(chunk)
        for si, (lo, hi) in enumerate(spans):
            r = _BitReader(chunk[lo:hi])
            fh = _parse_frame_header_r(r)
            if fh["kind"] == "show_existing":
                continue                   # no tail on the short form
            tail = _parse_header_tail(r, fh["error_resilient"], w)
            hb = r.byte_len()
            filler = chunk[lo + hb:hi]
            rows.append({
                "packet": f, "subframe": si,
                "kind": 0 if fh["kind"] == "key" else 1,
                "show_frame": fh["show_frame"],
                "error_resilient": fh["error_resilient"],
                "refresh_frame_context": tail["refresh_frame_context"],
                "frame_parallel": tail["frame_parallel"],
                "frame_context_idx": tail["frame_context_idx"],
                "lf_level": tail["lf_level"],
                "lf_sharpness": tail["lf_sharpness"],
                "lf_delta_enabled": tail["lf_delta_enabled"],
                "base_q_idx": tail["base_q_idx"],
                "dq_ydc": tail["dq_ydc"], "dq_uvdc": tail["dq_uvdc"],
                "dq_uvac": tail["dq_uvac"],
                "tile_cols_log2": tail["tile_cols_log2"],
                "tile_rows_log2": tail["tile_rows_log2"],
                "header_size": tail["header_size"],
                "header_bytes": hb,
                "filler_sum": sum(filler),
            })
        f += 1
        pos += size
    if f != n_frames:
        raise Vp9Error("IVF frame-count field disagrees with stream")
    return rows


# ------------------------------------- compressed header (bool, r13)
#
# The layer BELOW header_size_in_bytes (r12 verdict item 3): the first
# partition's bool-coded COMPRESSED header. The bool coder itself is
# RFC-exact (multimodal/vp9bool.py); the parsed field surface is the
# keyframe/intra path of the spec's compressed header — leading marker
# bool(128) == 0 (libvpx's reader-init check), tx_mode (2-bit literal
# plus one extra bit distinguishing ALLOW_32X32 from TX_MODE_SELECT;
# absent entirely for lossless frames), the TX_MODE_SELECT tx-prob
# diff-update flags (2+4+6 = 12 bool(252) reads), the per-tx-size coef
# update literals, and the three skip-prob diff-update flags. The
# fixture encoder always signals "no update" — a spec-valid encoder
# choice — so an update flag of 1 raises the documented-boundary error
# (the subexp-coded prob deltas are the next layer down). Inter-frame
# compressed headers (inter modes, interp filter, ref/mv probs) remain
# a documented boundary too.

#: tx_mode -> biggest tx size (spec tx_mode_to_biggest_tx_size)
_TX_MODE_MAX_TX = (0, 1, 2, 3, 3)
DIFF_UPDATE_PROB = 252


def compressed_header_law(seed: int, f: int) -> dict:
    """Deterministic per-keyframe compressed-header field law, mirrored
    closed-form by the SQL oracle."""
    return {"tx_mode": (seed + 3 * f) % 5}


def is_lossless(tail: dict) -> bool:
    """Spec lossless gate: base_q_idx == 0 and all three delta_q == 0."""
    dq_zero = all((not flag) or mag == 0
                  for flag, mag in zip(tail["dq_flags"], tail["dq_mags"]))
    return tail["base_q_idx"] == 0 and dq_zero


def compressed_header_bools(lossless: bool, tx_mode: int) -> int:
    """Closed-form bool count of the fixture compressed header."""
    if lossless:
        return 1 + 0 + 1 + 3            # marker + coef(4x4) + skip
    return (1 + 2 + (1 if tx_mode >= 3 else 0)
            + (12 if tx_mode == 4 else 0)
            + (_TX_MODE_MAX_TX[tx_mode] + 1) + 3)


def compressed_header_encode(lossless: bool, tx_mode: int) -> bytes:
    """Bool-encode one keyframe compressed header: marker 0, tx_mode
    (skipped when lossless — the spec forces ONLY_4X4), all-zero
    tx/coef/skip update flags."""
    from .vp9bool import BoolEncoder

    e = BoolEncoder()
    e.write_bool(128, 0)                       # marker
    if lossless:
        tx_mode = 0
    else:
        e.write_literal(min(tx_mode, 3), 2)
        if tx_mode >= 3:
            e.write_bool(128, tx_mode - 3)
    if tx_mode == 4:                           # TX_MODE_SELECT tx probs
        for _ in range(2 * 1 + 2 * 2 + 2 * 3):
            e.write_bool(DIFF_UPDATE_PROB, 0)
    for _ in range(_TX_MODE_MAX_TX[tx_mode] + 1):
        e.write_bool(128, 0)                   # coef update literal
    for _ in range(3):
        e.write_bool(DIFF_UPDATE_PROB, 0)      # skip prob updates
    return e.flush()


def compressed_header_parse(data: bytes, lossless: bool) -> dict:
    """Decode one keyframe compressed header (no-update fixture
    surface). Returns tx_mode, the per-section flag counts, bools_read,
    and the decoder's consumed byte position."""
    from .vp9bool import BoolDecoder

    d = BoolDecoder(data)
    if d.read_bool(128) != 0:
        raise Vp9Error("compressed-header marker bit is 1")
    if lossless:
        tx_mode = 0
    else:
        tx_mode = d.read_literal(2)
        if tx_mode == 3:
            tx_mode += d.read_bool(128)
    tx_flags = 0
    if tx_mode == 4:
        for _ in range(12):
            if d.read_bool(DIFF_UPDATE_PROB):
                raise Vp9Error("tx prob updates are a documented "
                               "engine boundary (no-update fixture)")
            tx_flags += 1
    coef_bits = 0
    for _ in range(_TX_MODE_MAX_TX[tx_mode] + 1):
        if d.read_bool(128):
            raise Vp9Error("coef prob updates are a documented "
                           "engine boundary (no-update fixture)")
        coef_bits += 1
    skip_flags = 0
    for _ in range(3):
        if d.read_bool(DIFF_UPDATE_PROB):
            raise Vp9Error("skip prob updates are a documented "
                           "engine boundary (no-update fixture)")
        skip_flags += 1
    return {"tx_mode": tx_mode, "tx_update_flags": tx_flags,
            "coef_update_bits": coef_bits, "skip_update_flags": skip_flags,
            "bools_read": d.bits_read, "consumed_bytes": d._pos}


def vp9_compressed_headers(payload: bytes) -> list:
    """IVF walk + uncompressed-header parse + COMPRESSED-header bool
    decode for every keyframe of a compressed_headers fixture stream:
    one row per keyframe with the lossless gate, decoded tx_mode, the
    no-update flag counts, total bools read, a decode -> re-encode ->
    byte-equality round-trip flag over the declared compressed bytes,
    and the filler checksum AFTER the compressed bytes."""
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
    rows = []
    pos = 32
    f = 0
    while pos < len(payload):
        if pos + 12 > len(payload):
            raise Vp9Error("truncated IVF frame header")
        size, _pts = struct.unpack("<IQ", payload[pos:pos + 12])
        pos += 12
        if pos + size > len(payload):
            raise Vp9Error("IVF frame size overruns stream")
        chunk = payload[pos:pos + size]
        spans, _idx = superframe_split(chunk)
        for si, (lo, hi) in enumerate(spans):
            r = _BitReader(chunk[lo:hi])
            fh = _parse_frame_header_r(r)
            if fh["kind"] != "key":
                continue
            tail = _parse_header_tail(r, fh["error_resilient"], w)
            hb = r.byte_len()
            hsz = tail["header_size"]
            if lo + hb + hsz > hi:
                raise Vp9Error("compressed header overruns the frame")
            lossless = (tail["base_q_idx"] == 0 and tail["dq_ydc"] == 0
                        and tail["dq_uvdc"] == 0 and tail["dq_uvac"] == 0)
            ch = compressed_header_parse(chunk[lo + hb:lo + hb + hsz],
                                         lossless)
            filler = chunk[lo + hb + hsz:hi]
            rows.append({
                "packet": f, "subframe": si,
                "lossless": 1 if lossless else 0,
                "lf_delta_enabled": tail["lf_delta_enabled"],
                "lf_delta_update": tail["lf_delta_update"],
                "ref_update_mask": tail["ref_update_mask"],
                "ref_delta_0": tail["ref_deltas"][0],
                "ref_delta_1": tail["ref_deltas"][1],
                "ref_delta_2": tail["ref_deltas"][2],
                "ref_delta_3": tail["ref_deltas"][3],
                "mode_update_mask": tail["mode_update_mask"],
                "mode_delta_0": tail["mode_deltas"][0],
                "mode_delta_1": tail["mode_deltas"][1],
                "tx_mode": ch["tx_mode"],
                "tx_update_flags": ch["tx_update_flags"],
                "coef_update_bits": ch["coef_update_bits"],
                "skip_update_flags": ch["skip_update_flags"],
                "bools_read": ch["bools_read"],
                # decode -> re-encode -> byte equality: the strongest
                # audit (the declared compressed bytes are exactly the
                # canonical encoding of the decoded fields); a raw
                # consumed-bytes check would false-flag the decoder's
                # legitimate renormalization lookahead past the flush
                "roundtrip_ok": 1 if compressed_header_encode(
                    lossless, ch["tx_mode"]) ==
                    chunk[lo + hb:lo + hb + hsz] else 0,
                "filler_sum": sum(filler),
            })
        f += 1
        pos += size
    if f != n_frames:
        raise Vp9Error("IVF frame-count field disagrees with stream")
    return rows
