"""IVF/VP9 container + uncompressed-frame-header parser: bit decode,
framing audit, filler checksum, and the strict corrupt-stream contract
(multimodal/vp9frames.py — r9, closing the r8 verdict's VP9 codec gap
at the header layer a video-corpus pipeline filters on)."""

import struct

import pytest

from geospatial_data_pipeline_spark_sedona_on_aws_spark.multimodal import vp9frames as V


def _enc(**kw):
    args = dict(width=320, height=240, n_frames=5, profile=0, bit_depth=8,
                color_range=1, sub_x=1, sub_y=1, seed=7)
    args.update(kw)
    return V.ivf_vp9_encode(**args)


class TestHeaderDecode:
    def test_profile0_roundtrip(self):
        r = V.ivf_vp9_probe(_enc())
        assert (r["width"], r["height"]) == (320, 240)
        assert r["profile"] == 0 and r["bit_depth"] == 8
        assert r["color_space"] == V.CS_BT_601 and r["color_range"] == 1
        # 4:2:0 implied for even profiles
        assert (r["sub_x"], r["sub_y"]) == (1, 1)
        assert r["n_frames"] == 5
        assert r["n_keyframes"] + r["n_show_existing"] == 5

    def test_profile1_subsampling_bits(self):
        r = V.ivf_vp9_probe(_enc(profile=1, sub_x=0, sub_y=1))
        assert r["profile"] == 1 and (r["sub_x"], r["sub_y"]) == (0, 1)
        assert r["bit_depth"] == 8

    @pytest.mark.parametrize("depth", [10, 12])
    def test_profile2_bit_depth(self, depth):
        r = V.ivf_vp9_probe(_enc(profile=2, bit_depth=depth))
        assert r["profile"] == 2 and r["bit_depth"] == depth

    def test_profile3_reserved_bit_and_subsampling(self):
        r = V.ivf_vp9_probe(_enc(profile=3, bit_depth=12, sub_x=1, sub_y=0))
        assert r["profile"] == 3 and r["bit_depth"] == 12
        assert (r["sub_x"], r["sub_y"]) == (1, 0)

    def test_header_byte_length_matches_parser(self):
        # key_header_bytes' closed form is what the SQL oracle's filler
        # law implicitly relies on: filler starts right after the header
        for profile in range(4):
            depth = 8 if profile < 2 else 10
            payload = _enc(profile=profile, bit_depth=depth, n_frames=1)
            # frame 0 starts right after the 32-byte IVF header + 12-byte
            # frame header; parse it directly
            size, _pts = struct.unpack("<IQ", payload[32:44])
            fh = V._parse_frame_header(payload[44:44 + size])
            assert fh["header_bytes"] == V.key_header_bytes(profile)

    def test_filler_sum_closed_form(self):
        seed, n = 9, 7
        r = V.ivf_vp9_probe(_enc(seed=seed, n_frames=n))
        expect = sum(
            (16 + (seed * 5 + f * 11) % 50) * ((seed * 13 + f * 7) % 251)
            for f in range(n) if f == 0 or (f + seed) % 3 != 0)
        assert r["filler_sum"] == expect

    def test_show_existing_cadence(self):
        seed, n = 4, 10
        r = V.ivf_vp9_probe(_enc(seed=seed, n_frames=n))
        expect_show = sum(1 for f in range(1, n) if (f + seed) % 3 == 0)
        assert r["n_show_existing"] == expect_show
        assert r["n_keyframes"] == n - expect_show

    def test_duration_from_timebase(self):
        r = V.ivf_vp9_probe(_enc(n_frames=8))
        # PTS = 1000*f, timebase 1000/1 -> us = pts * 1e6 / 1000
        assert r["duration_us"] == 7 * 1_000_000
        assert (r["timebase_den"], r["timebase_num"]) == (1000, 1)


class TestCorruptStreams:
    @pytest.mark.parametrize("mutate", [
        lambda b: b[:20],                                   # short header
        lambda b: b"XKIF" + b[4:],                          # bad magic
        lambda b: b[:8] + b"VP80" + b[12:],                 # wrong fourcc
        lambda b: b[:40],                                   # truncated frame
        lambda b: b + bytes(12),                            # extra frame hdr
    ])
    def test_raises_vp9error(self, mutate):
        with pytest.raises(V.Vp9Error):
            V.ivf_vp9_probe(mutate(_enc()))

    def test_frame_size_overrun(self):
        b = bytearray(_enc(n_frames=1))
        b[32:36] = struct.pack("<I", 10_000)                # size > stream
        with pytest.raises(V.Vp9Error):
            V.ivf_vp9_probe(bytes(b))

    def test_bad_sync_code(self):
        b = bytearray(_enc(n_frames=1))
        b[45] ^= 0xFF                                       # inside sync
        with pytest.raises(V.Vp9Error):
            V.ivf_vp9_probe(bytes(b))

    def test_frame_count_mismatch(self):
        b = bytearray(_enc(n_frames=3))
        b[24:28] = struct.pack("<I", 99)
        with pytest.raises(V.Vp9Error):
            V.ivf_vp9_probe(bytes(b))

    def test_nonmonotonic_pts(self):
        payload = _enc(n_frames=1)
        frame = payload[32:]
        # duplicate the frame with the SAME pts; fix the count field
        b = bytearray(payload) + frame
        b[24:28] = struct.pack("<I", 2)
        with pytest.raises(V.Vp9Error, match="PTS"):
            V.ivf_vp9_probe(bytes(b))

    def test_dims_disagree(self):
        b = bytearray(_enc(n_frames=1))
        b[12:14] = struct.pack("<H", 999)                   # IVF width
        with pytest.raises(V.Vp9Error, match="dims"):
            V.ivf_vp9_probe(bytes(b))

    def test_intra_only_frame_rejected(self):
        # r12 parses non-shown inter frames (intra_only = 0, the alt-ref
        # shape superframes hide); intra_only = 1 — its own sync-code +
        # color-config layout — stays the boundary
        w = V._BitWriter()
        w.put(0b10, 2); w.put(0, 1); w.put(0, 1)            # profile 0
        w.put(0, 1)                                         # not show-existing
        w.put(1, 1)                                         # INTER frame
        w.put(0, 1)                                         # show_frame = 0
        w.put(0, 1)                                         # error_resilient
        w.put(1, 1)                                         # intra_only = 1
        data = w.tobytes() + bytes(8)
        with pytest.raises(V.Vp9Error, match="intra-only"):
            V._parse_frame_header(data)

    def test_inter_frame_header_roundtrip(self):
        """r11: every inter-header field law survives encode -> parse,
        across both frame_size_with_refs branches and both filter
        modes."""
        for seed in range(40):
            p = V.ivf_vp9_encode(96, 64, 3 + seed % 5, seed % 4,
                                 8 if seed % 4 < 2 else 10, 0, 1, 1,
                                 seed=seed, inter_frames=True)
            r = V.ivf_vp9_probe(p)
            n = 3 + seed % 5
            want_inter = sum(1 for f in range(1, n)
                             if (f + seed) % 3 == 1)
            assert r["n_inter"] == want_inter
            assert r["n_keyframes"] + r["n_show_existing"] \
                + r["n_inter"] == n
        # field-level check on one decoded header
        fr = [f for f in range(1, 8) if (f + 5) % 3 == 1][0]
        p = V.ivf_vp9_encode(96, 64, 8, 0, 8, 0, 1, 1, seed=5,
                             inter_frames=True)
        pos = 32
        import struct as _s
        got = None
        k = 0
        while pos < len(p):
            size, _ = _s.unpack("<IQ", p[pos:pos + 12])
            pos += 12
            fh = V._parse_frame_header(p[pos:pos + size])
            if fh["kind"] == "inter" and k == 0:
                got = fh
                k = 1
            pos += size
        assert got is not None
        f, seed = fr, 5
        assert got["error_resilient"] == (seed + f) % 2
        assert got["refresh_frame_flags"] == (seed * 3 + f) % 256
        assert got["ref_idx"] == [(seed + f + i) % 8 for i in range(3)]
        assert got["sign_bias"] == [(seed + f + i) % 2 for i in range(3)]
        frx = (seed + f) % 4
        assert got["found_slot"] == (frx if frx < 3 else -1)
        if frx == 3:
            assert (got["width"], got["height"]) == (96, 64)

    def test_show_existing_trailing_bytes(self):
        payload = _enc(n_frames=1, seed=0)
        show = V._show_existing_frame(0, idx=2) + b"x"      # trailing byte
        b = bytearray(payload)
        b[24:28] = struct.pack("<I", 2)
        b += struct.pack("<IQ", len(show), 5000) + show
        with pytest.raises(V.Vp9Error, match="trailing"):
            V.ivf_vp9_probe(bytes(b))

    def test_no_keyframe_stream(self):
        show = V._show_existing_frame(0, idx=1)
        b = bytearray(struct.pack(
            "<4sHH4sHHIII4x", b"DKIF", 0, 32, b"VP90", 64, 64, 1000, 1, 1))
        b += struct.pack("<IQ", len(show), 0) + show
        with pytest.raises(V.Vp9Error, match="keyframe"):
            V.ivf_vp9_probe(bytes(b))


# ----------------------------------------------------- superframes (r12)

def _sfenc(seed, **kw):
    args = dict(width=320, height=240, n_frames=9, profile=seed % 4,
                bit_depth=8 if seed % 4 < 2 else 10, color_range=1,
                sub_x=1, sub_y=1, seed=seed, inter_frames=True,
                superframes=True)
    args.update(kw)
    return V.ivf_vp9_encode(**args)


def test_superframe_rows_tile_packets_exactly():
    """Per packet: subframe sizes + index bytes = packet bytes, kinds
    follow the fixture law, and the hidden alt-ref is a real inter
    frame (show_frame = 0) followed by a show-existing subframe."""
    for seed in range(8):
        rows = V.vp9_superframes(_sfenc(seed))
        by_packet = {}
        for r in rows:
            by_packet.setdefault(r["packet"], []).append(r)
        for f, rs in by_packet.items():
            assert sum(x["frame_bytes"] for x in rs) + rs[0]["index_bytes"] \
                == rs[0]["packet_bytes"]
            if f > 0 and (f + seed) % 3 == 2:      # superframe packets
                assert [x["kind"] for x in rs] == [1, 2]
                assert rs[0]["show_frame"] == 0
                assert rs[0]["n_sub"] == 2
                szbytes = 1 + (seed + f) % 2
                assert rs[0]["index_bytes"] == 2 + 2 * szbytes
            else:
                assert len(rs) == 1 and rs[0]["index_bytes"] == 0


def test_superframe_marker_in_filler_falls_back_to_single_frame():
    """A non-superframe packet whose constant filler byte lands in the
    marker range [0xC0, 0xDF] must not be misread as a superframe: the
    libvpx validation (leading marker + exact size sum) rejects it."""
    # seed 303 puts keyframe filler at a marker-range byte (the r12
    # fixture failure this fallback fixed)
    rows = V.vp9_superframes(_sfenc(303, width=64 + 303 % 640,
                                    height=64 + 303 % 360,
                                    n_frames=3 + 303 % 10))
    assert all(r["n_sub"] == 1 for r in rows if r["packet"] == 0)


def test_superframe_split_validation():
    good = V.superframe_pack([b"\x01\x02\x03", b"\x04"], szbytes=1)
    spans, idx = V.superframe_split(good)
    assert spans == ((0, 3), (3, 4)) and idx == 4
    # corrupt the LEADING marker: falls back to single frame
    bad = bytearray(good)
    bad[-4] ^= 0xFF
    spans, idx = V.superframe_split(bytes(bad))
    assert spans == ((0, len(good)),) and idx == 0
    # corrupt a size field: size sum mismatch, falls back
    bad = bytearray(good)
    bad[-3] = 200
    spans, idx = V.superframe_split(bytes(bad))
    assert spans == ((0, len(good)),) and idx == 0


def test_hidden_inter_header_roundtrip():
    """The non-shown inter frame (intra_only = 0) parses through the
    normal inter path with one extra bit in header_bytes accounting."""
    hidden = V._inter_frame(0, 320, 240, seed=6, f=2, filler=b"", show=0)
    fh = V._parse_frame_header(hidden)
    assert fh["kind"] == "inter" and fh["show_frame"] == 0
    shown = V._inter_frame(0, 320, 240, seed=6, f=2, filler=b"", show=1)
    fh2 = V._parse_frame_header(shown)
    assert fh2["show_frame"] == 1
    # same field law; the hidden variant carries exactly one more bit
    for k in ("refresh_frame_flags", "ref_idx", "sign_bias",
              "found_slot", "allow_high_precision_mv", "interp_filter"):
        assert fh[k] == fh2[k]


# --------------------------------------------- full header tail (r12)

def test_header_tail_roundtrip_matches_law():
    """Every tail field law survives encode -> parse across profiles,
    error-resilient and plain frames, all three delta_q slots, both
    tile-column configurations."""
    for seed in range(24):
        w = 64 + seed * 29 % 640
        p = V.ivf_vp9_encode(width=w, height=120, n_frames=3 + seed % 6,
                             profile=seed % 4,
                             bit_depth=8 if seed % 4 < 2 else 10,
                             color_range=0, sub_x=1, sub_y=1, seed=seed,
                             inter_frames=True, full_headers=True)
        for r in V.vp9_headers_full(p):
            law = V.header_tail_law(seed, r["packet"], w)
            assert r["frame_context_idx"] == law["frame_context_idx"]
            assert r["lf_level"] == law["lf_level"]
            assert r["base_q_idx"] == law["base_q_idx"]
            assert r["tile_cols_log2"] == law["tile_cols_log2"]
            assert r["tile_rows_log2"] == law["tile_rows_log2"]
            assert r["header_size"] == law["header_size"]
            if not r["error_resilient"]:
                assert r["refresh_frame_context"] == \
                    law["refresh_frame_context"]


def test_tile_log2_bounds_spec_points():
    """§6.2.14: min keeps tiles <= 64 SB64s, max keeps >= 4 SB64s."""
    assert V._tile_log2_bounds(64) == (0, 0)       # 1 SB64 column
    assert V._tile_log2_bounds(512) == (0, 1)      # 8 SB64 columns
    assert V._tile_log2_bounds(4096) == (0, 4)     # 64 SB64 columns
    assert V._tile_log2_bounds(8192) == (1, 5)     # 128 -> min 1


def test_header_tail_boundaries_typed():
    """Loop-filter delta updates and segmentation stay typed gates."""
    law = V.header_tail_law(3, 0, 320)
    w = V._BitWriter()
    V._write_header_tail(w, law, 0, 320)
    base = V._key_frame(0, 320, 240, 8, 0, 1, 1, b"", tail_law=law)
    # flip the segmentation_enabled bit: find it by re-encoding with a
    # crafted law is brittle; instead parse a tail whose seg bit is 1
    w2 = V._BitWriter()
    w2.put(0, 2)            # refresh_frame_context + frame_parallel
    w2.put(0, 2)            # frame_context_idx
    w2.put(0, 6); w2.put(0, 3); w2.put(0, 1)   # loop filter, no delta
    w2.put(0, 8)            # base_q
    w2.put(0, 1); w2.put(0, 1); w2.put(0, 1)   # three delta_q absent
    w2.put(1, 1)            # segmentation_enabled = 1 -> boundary
    data = w2.tobytes() + bytes(4)
    with pytest.raises(V.Vp9Error, match="segmentation"):
        V._parse_header_tail(V._BitReader(data), 0, 320)


# ---------------------------------------- compressed header (r13)

from geospatial_data_pipeline_spark_sedona_on_aws_spark.multimodal.vp9bool import (
    BoolDecoder, BoolEncoder)


def test_bool_coder_roundtrip_seeded_sweep():
    """The arbitrary-precision encoder's output decodes bit-exactly
    under the RFC 6386 decoder across 2000 random (prob, bit) sequences
    including length-1 streams (the flush edge the r13 session fixed:
    the 2-byte floor must pad on the RIGHT)."""
    import random
    rng = random.Random(20260816)
    for _ in range(2000):
        n = rng.randint(1, 120)
        seq = [(rng.randint(1, 255), rng.randint(0, 1)) for _ in range(n)]
        e = BoolEncoder()
        for p, b in seq:
            e.write_bool(p, b)
        d = BoolDecoder(e.flush())
        assert [d.read_bool(p) for p, _ in seq] == [b for _, b in seq]


def test_bool_literal_msb_first():
    e = BoolEncoder()
    e.write_literal(0b101, 3)
    e.write_literal(517, 10)
    d = BoolDecoder(e.flush())
    assert d.read_literal(3) == 0b101
    assert d.read_literal(10) == 517


def test_compressed_header_all_tx_modes_roundtrip():
    """Every tx_mode branch (0..4, plus lossless) encodes and decodes
    to itself with the exact closed-form bool count."""
    for txm in range(5):
        data = V.compressed_header_encode(False, txm)
        ch = V.compressed_header_parse(data, False)
        assert ch["tx_mode"] == txm
        assert ch["bools_read"] == V.compressed_header_bools(False, txm)
        assert V.compressed_header_encode(False, ch["tx_mode"]) == data
    data = V.compressed_header_encode(True, 3)     # lossless ignores txm
    ch = V.compressed_header_parse(data, True)
    assert ch["tx_mode"] == 0
    assert ch["bools_read"] == 5


def test_compressed_header_boundaries():
    """Marker bit 1 and any update flag 1 raise the documented-boundary
    error instead of mis-decoding."""
    e = BoolEncoder()
    e.write_bool(128, 1)                           # bad marker
    with pytest.raises(V.Vp9Error, match="marker"):
        V.compressed_header_parse(e.flush(), False)
    e = BoolEncoder()
    e.write_bool(128, 0)
    e.write_literal(0, 2)                          # tx_mode = 0
    e.write_bool(128, 1)                           # coef update = 1
    with pytest.raises(V.Vp9Error, match="coef"):
        V.compressed_header_parse(e.flush(), False)
    e = BoolEncoder()
    e.write_bool(128, 0)
    e.write_literal(0, 2)
    e.write_bool(128, 0)                           # coef update = 0
    e.write_bool(V.DIFF_UPDATE_PROB, 1)            # skip update = 1
    with pytest.raises(V.Vp9Error, match="skip"):
        V.compressed_header_parse(e.flush(), False)


def test_vp9_compressed_walker_matches_laws():
    """Stream-level walk: per keyframe the decoded fields reproduce
    compressed_header_law / the lossless gate, header_size equals the
    canonical encoding's byte count (roundtrip_ok), and the filler law
    holds AFTER the compressed bytes."""
    for d in (0, 3, 7, 13, 41):
        profile = d % 4
        payload = V.ivf_vp9_encode(
            width=64 + d % 640, height=64 + d % 360,
            n_frames=3 + d % 10, profile=profile,
            bit_depth=8 if profile < 2
            else (10 if (d // 4) % 2 == 0 else 12),
            color_range=d % 2, sub_x=(d // 2) % 2, sub_y=(d // 3) % 2,
            seed=d, compressed_headers=True)
        rows = V.vp9_compressed_headers(payload)
        assert rows
        for r in rows:
            f = r["packet"]
            tail = V.header_tail_law(d, f, 64 + d % 640)
            ll = V.is_lossless(tail)
            txm = V.compressed_header_law(d, f)["tx_mode"]
            assert r["lossless"] == int(ll)
            assert r["tx_mode"] == (0 if ll else txm)
            assert r["bools_read"] == V.compressed_header_bools(ll, txm)
            assert r["roundtrip_ok"] == 1
            assert r["filler_sum"] == \
                (16 + (d * 5 + f * 11) % 50) * V._filler_byte(d, f)


def test_lossless_gate_spec_semantics():
    """is_lossless: base_q_idx == 0 AND all effective delta_q zero —
    a set flag with magnitude 0 is still lossless (delta is 0)."""
    base = {"base_q_idx": 0, "dq_flags": (False, False, False),
            "dq_mags": (3, 5, 7)}
    assert V.is_lossless(base)
    assert V.is_lossless({**base, "dq_flags": (True, False, False),
                          "dq_mags": (0, 1, 1)})
    assert not V.is_lossless({**base, "dq_flags": (True, False, False),
                              "dq_mags": (2, 0, 0)})
    assert not V.is_lossless({**base, "base_q_idx": 1})


def test_lf_ref_delta_update_parse():
    """The loop-filter delta-update branch (r13 — the r12 parser raised
    here) round-trips su(6) ref/mode deltas: flags, magnitudes, and
    signs all reproduce header_tail_law on deep_lf streams, legacy
    update=0 streams keep parsing, and the fixture genuinely exercises
    the updated branch."""
    deep = 0
    for d in (2, 4, 7, 10, 13):
        payload = V.ivf_vp9_encode(
            width=64 + d % 640, height=64 + d % 360, n_frames=3 + d % 10,
            profile=d % 4,
            bit_depth=8 if d % 4 < 2 else 10,
            color_range=d % 2, sub_x=0, sub_y=0, seed=d,
            compressed_headers=True)
        for r in V.vp9_compressed_headers(payload):
            f = r["packet"]
            law = V.header_tail_law(d, f, 64 + d % 640)
            assert r["lf_delta_enabled"] == law["lf_delta_enabled"]
            if not r["lf_delta_enabled"]:
                assert r["lf_delta_update"] == -1
                assert r["ref_update_mask"] == 0
                continue
            assert r["lf_delta_update"] == law["lf_delta_update"]
            if r["lf_delta_update"]:
                deep += 1
                for i in range(4):
                    exp = (law["ref_delta_vals"][i]
                           if law["ref_delta_flags"][i] else 0)
                    assert r[f"ref_delta_{i}"] == exp
                    assert (r["ref_update_mask"] >> i & 1) == \
                        int(law["ref_delta_flags"][i])
                for i in range(2):
                    exp = (law["mode_delta_vals"][i]
                           if law["mode_delta_flags"][i] else 0)
                    assert r[f"mode_delta_{i}"] == exp
    assert deep > 0, "fixture never took the delta-update branch"
    # legacy (update = 0) streams still parse unchanged
    legacy = V.ivf_vp9_encode(width=320, height=180, n_frames=5,
                              profile=0, bit_depth=8, color_range=0,
                              sub_x=1, sub_y=1, seed=3,
                              inter_frames=True, full_headers=True)
    assert V.vp9_headers_full(legacy)
