"""MP3 frame-stream parser: header tables, frame-length math, CRC-16
validation, ID3 handling, and the strict corrupt-stream contract
(multimodal/mp3frames.py — r9, closing the r8 verdict's MP3 codec gap
at the frame layer)."""

import pytest

from geospatial_data_pipeline_spark_sedona_on_aws_spark.multimodal import mp3frames as M


def _enc(**kw):
    args = dict(version=10, layer=3, bitrate_idx=9, sr_idx=0, n_frames=5,
                channel_mode=0, protection=False, seed=42, id3v2_size=0)
    args.update(kw)
    return M.mp3_frames_encode(**args)


class TestHeaderTables:
    def test_mpeg1_layer3_cbr(self):
        r = M.mp3_probe(_enc())
        assert r["version"] == 10 and r["layer"] == 3
        assert r["sample_rate"] == 44100 and r["channels"] == 2
        assert r["bitrate_kbps_min"] == r["bitrate_kbps_max"] == 128
        assert r["is_cbr"] and r["n_frames"] == 5
        assert r["total_samples"] == 5 * 1152
        assert r["duration_us"] == 5 * 1152 * 1_000_000 // 44100

    def test_mpeg25_layer3_is_576_samples(self):
        r = M.mp3_probe(_enc(version=25, sr_idx=2, channel_mode=3))
        assert r["sample_rate"] == 8000 and r["channels"] == 1
        assert r["total_samples"] == 5 * 576

    def test_layer1_slot_math(self):
        # Layer I frame length is in 4-byte slots
        r = M.mp3_probe(_enc(layer=1, bitrate_idx=14, sr_idx=1))
        assert r["layer"] == 1 and r["total_samples"] == 5 * 384
        flen = M.frame_length(10, 1, 448, 48000, 0)
        assert flen % 4 == 0 and r["frame_bytes"] == 5 * flen

    def test_layer2_mpeg2(self):
        r = M.mp3_probe(_enc(version=20, layer=2, bitrate_idx=10))
        assert r["sample_rate"] == 22050
        assert r["bitrate_kbps_min"] == 96          # MPEG-2 L2 table row
        assert r["total_samples"] == 5 * 1152

    def test_every_table_row_round_trips(self):
        for version in (10, 20, 25):
            for layer in (1, 2, 3):
                for br in range(1, 15):
                    for sr in range(3):
                        r = M.mp3_probe(M.mp3_frames_encode(
                            version, layer, br, sr, 2, 1, False, seed=br))
                        vg = 1 if version == 10 else 2
                        assert r["bitrate_kbps_min"] == \
                            M.BITRATE_KBPS[(vg, layer)][br - 1]
                        assert r["sample_rate"] == \
                            M.SAMPLE_RATE_HZ[version][sr]


class TestCrc:
    def test_valid_crc_counts(self):
        r = M.mp3_probe(_enc(protection=True))
        assert r["crc_frames"] == 5 and r["crc_ok"] == 5

    def test_corrupted_crc_detected_not_fatal(self):
        b = bytearray(_enc(protection=True))
        b[4] ^= 0xFF                                # CRC hi byte, frame 0
        r = M.mp3_probe(bytes(b))
        assert r["crc_frames"] == 5 and r["crc_ok"] == 4

    def test_corrupted_side_info_detected(self):
        b = bytearray(_enc(protection=True))
        b[6] = (b[6] + 1) % 251                     # first side-info byte
        r = M.mp3_probe(bytes(b))
        assert r["crc_ok"] == 4

    def test_crc16_known_vector(self):
        # CRC-16/IBM-like with init 0xFFFF over '123456789' = 0xAEE7
        assert M.crc16_mpeg(b"123456789") == 0xAEE7


class TestId3:
    def test_id3v2_skip(self):
        r = M.mp3_probe(_enc(id3v2_size=100))
        assert r["id3v2_bytes"] == 110 and r["n_frames"] == 5

    def test_id3v1_trailer(self):
        r = M.mp3_probe(_enc() + b"TAG" + bytes(125))
        assert r["has_id3v1"] and r["n_frames"] == 5

    def test_id3v2_overrun_raises(self):
        bad = b"ID3" + bytes((4, 0, 0)) + M._syncsafe(10_000)
        with pytest.raises(M.Mp3Error):
            M.mp3_probe(bad)


class TestCorruptStreams:
    @pytest.mark.parametrize("mutate", [
        lambda b: b"\x00\x01" + b,                  # garbage before sync
        lambda b: b[:-3],                           # truncated final frame
        lambda b: b[:1] + bytes([b[1] & 0xE7 | 0x08]) + b[2:],  # rsvd ver
        lambda b: b[:1] + bytes([b[1] & 0xF9]) + b[2:],         # rsvd layer
        lambda b: b[:2] + bytes([0xF0 | (b[2] & 0x0F)]) + b[3:],  # br=15
        lambda b: b[:2] + bytes([b[2] & 0x0F]) + b[3:],         # free format
        lambda b: b[:2] + bytes([b[2] | 0x0C]) + b[3:],         # rsvd rate
        lambda b: b"",                              # empty
    ])
    def test_raises_mp3error(self, mutate):
        with pytest.raises(M.Mp3Error):
            M.mp3_probe(mutate(_enc()))

    def test_midstream_parameter_change_raises(self):
        a = _enc(n_frames=2)
        b = _enc(n_frames=2, sr_idx=1)
        with pytest.raises(M.Mp3Error, match="sample_rate"):
            M.mp3_probe(a + b)

    def test_payload_never_contains_sync(self):
        # payload law caps bytes at 250 so a body byte can't fake 0xFF
        b = _enc(seed=12345, n_frames=1)
        assert max(b[4:]) <= 250


class TestSegmentationAudit:
    def test_payload_sum_closed_form(self):
        r = M.mp3_probe(_enc(version=25, layer=3, bitrate_idx=4, sr_idx=2,
                             channel_mode=3, seed=7, n_frames=7))
        flen = M.frame_length(25, 3, 32, 8000, 0)
        exp = sum((flen - 4) * ((7 * 31 + 7 * f) % 251) for f in range(7))
        assert r["payload_sum"] == exp

    def test_crc_bytes_excluded_from_payload_sum(self):
        plain = M.mp3_probe(_enc(protection=False))
        prot = M.mp3_probe(_enc(protection=True))
        # same payload law value per frame; protected bodies are 2 shorter
        per_frame = [(42 * 31 + 7 * f) % 251 for f in range(5)]
        assert plain["payload_sum"] - prot["payload_sum"] == \
            2 * sum(per_frame)


# ------------------------------------------- r10: side-info layer

def test_side_info_roundtrip_all_shapes():
    """Encode→parse identity for every (version, mono/stereo, CRC)
    combination: the law's fields — both window-switching branches,
    MPEG-1 and LSF widths — must come back bit-exact, and the frame
    probe's CRC validation must still pass over the structured bytes."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.multimodal import mp3frames as M

    for version in (10, 20, 25):
        for mode in (0, 1, 2, 3):
            for prot in (False, True):
                seed = version + mode * 5 + (7 if prot else 0)
                p = M.mp3_frames_encode(
                    version, 3, bitrate_idx=5, sr_idx=1, n_frames=5,
                    channel_mode=mode, protection=prot, seed=seed,
                    structured_side=True)
                r = M.mp3_probe(p)
                assert r["crc_ok"] == r["crc_frames"]
                rows = M.mp3_granules(p)
                lsf = version != 10
                ch = 1 if mode == 3 else 2
                assert len(rows) == 5 * (1 if lsf else 2) * ch
                saw_wsf = False
                for row in rows:
                    law = M.granule_field_law(
                        seed, row["frame"], row["granule"],
                        row["channel"], lsf)
                    for k, v in law.items():
                        assert row[k] == v, (version, mode, k)
                    assert row["main_data_begin"] == 0
                    assert row["scfsi"] == (
                        -1 if lsf else (seed + 3 * row["channel"]) % 16)
                    saw_wsf |= row["window_switching"] == 1
                assert saw_wsf, "fixture never took the switching branch"


def test_side_info_layer_gate():
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.multimodal import mp3frames as M
    import pytest

    p = M.mp3_frames_encode(10, 2, 5, 1, 3, 0, False, 1)
    with pytest.raises(M.Mp3Error, match="Layer III structure"):
        M.mp3_granules(p)
    with pytest.raises(M.Mp3Error, match="Layer III structure"):
        M.mp3_frames_encode(10, 1, 5, 1, 3, 0, False, 1,
                            structured_side=True)


def test_side_info_reserved_block_type_raises():
    """A window-switching granule with block_type 0 is reserved — the
    parser must raise, not emit garbage fields."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.multimodal import mp3frames as M
    import pytest

    # MPEG-1 stereo: craft side info with wsf=1, block_type=0
    w = M._BitWriter()
    w.put(0, 9)               # main_data_begin
    w.put(0, 3)               # private
    w.put(0, 4)
    w.put(0, 4)               # scfsi x2
    w.put(100, 12)            # part2_3_length
    w.put(10, 9)              # big_values
    w.put(42, 8)              # global_gain
    w.put(3, 4)               # scalefac_compress
    w.put(1, 1)               # window_switching
    w.put(0, 2)               # block_type 0 -> reserved
    data = w.to_bytes(32)
    with pytest.raises(M.Mp3Error, match="reserved block_type"):
        M.side_info_parse(10, 2, data)


def test_scalefactors_roundtrip_matches_law():
    """r11 part2 layer: encode -> parse roundtrip reproduces
    scalefac_value_law for every slot, shared granule-1 long groups
    reuse granule 0's VALUE (encoded with g0's slen) and report slen 0,
    and part2_bits equals the sum of the slen column per granule."""
    for d in range(40):
        payload = M.mp3_frames_encode(
            10, 3, bitrate_idx=1 + d % 13, sr_idx=d % 3,
            n_frames=2 + d % 3, channel_mode=d % 4,
            protection=d % 2 == 0, seed=d,
            structured_side=True, structured_scalefactors=True)
        rows = M.mp3_scalefactors(payload)
        assert rows
        si = {(r["frame"], r["granule"], r["channel"]): r
              for r in M.mp3_granules(payload)}
        bits: dict = {}
        for r in rows:
            key = (r["frame"], r["granule"], r["channel"])
            bits[key] = bits.get(key, 0) + r["slen"]
            if r["shared"]:
                g0 = si[(r["frame"], 0, r["channel"])]
                s1, s2 = M.SLEN_TABLE[g0["scalefac_compress"]]
                slen0 = s1 if r["sfb"] <= 10 else s2
                assert r["slen"] == 0
                assert r["scalefac"] == M.scalefac_value_law(
                    d, r["frame"], 0, r["channel"], r["sfb"],
                    r["window"], slen0)
            else:
                assert r["scalefac"] == M.scalefac_value_law(
                    d, r["frame"], r["granule"], r["channel"], r["sfb"],
                    r["window"], r["slen"])
        for r in rows:
            key = (r["frame"], r["granule"], r["channel"])
            assert r["part2_bits"] == bits[key]


def test_scalefactors_scfsi_only_when_both_granules_long():
    """A short granule 1 (or 0) must transmit ALL its scalefactors even
    when the scfsi nibble is nonzero — the sharing rule needs both
    granules long."""
    seen_blocked = False
    for d in range(200):
        payload = M.mp3_frames_encode(
            10, 3, 3, 0, 3, d % 4, False, d,
            structured_side=True, structured_scalefactors=True)
        for r in M.mp3_scalefactors(payload):
            if r["shared"]:
                assert r["granule"] == 1 and r["window"] == -1
        si = {(r["frame"], r["granule"], r["channel"]): r
              for r in M.mp3_granules(payload)}
        for (f, g, c), gf in si.items():
            if g != 1:
                continue
            short1 = gf["window_switching"] == 1 and gf["block_type"] == 2
            if short1 and gf["scfsi"] != 0:
                seen_blocked = True
                assert not any(
                    r["shared"] for r in M.mp3_scalefactors(payload)
                    if (r["frame"], r["granule"], r["channel"])
                    == (f, 1, c))
    assert seen_blocked, "fixture never exercised the blocked-scfsi case"


def test_scalefactors_lsf_boundary():
    # r12: the encoder writes LSF part2 bits now; the MPEG-1 PARSER
    # still gates LSF streams to its mirror-image (mp3_scalefactors_lsf)
    payload = M.mp3_frames_encode(20, 3, 1, 0, 2, 3, False, 1,
                                  structured_side=True)
    with pytest.raises(M.Mp3Error, match="LSF scalefactor"):
        M.mp3_scalefactors(payload)
    with pytest.raises(M.Mp3Error, match="LSF path"):
        M.mp3_scalefactors_lsf(M.mp3_frames_encode(
            10, 3, 9, 0, 2, 0, False, 1, structured_side=True,
            structured_scalefactors=True))


# ---------------------------------------------- LSF scalefactors (r12)

def test_lsf_partition_law_closed_forms():
    """ISO 13818-3 partition arithmetic at the table boundaries."""
    assert M.lsf_scalefac_partitions(0) == ((0, 0, 0, 0), 0, 0)
    assert M.lsf_scalefac_partitions(399) == ((4, 4, 3, 3), 0, 0)
    assert M.lsf_scalefac_partitions(400) == ((0, 0, 0, 0), 1, 0)
    assert M.lsf_scalefac_partitions(499) == ((4, 4, 3, 0), 1, 0)
    assert M.lsf_scalefac_partitions(500) == ((0, 0, 0, 0), 2, 1)
    assert M.lsf_scalefac_partitions(511) == ((3, 2, 0, 0), 2, 1)


def test_lsf_nsfb_tiles_every_layout():
    """Every (table, class) row's band counts sum to the slot count of
    its layout: 21 long, 36 short, 33 mixed."""
    for tbl, rows in M.LSF_NSFB.items():
        assert sum(rows[0]) == 21, tbl
        assert sum(rows[1]) == 36, tbl
        assert sum(rows[2]) == 33, tbl


def test_lsf_scalefactors_roundtrip_matches_law():
    """Encode -> parse across MPEG-2 and 2.5, both channel modes, all
    three partition tables (seeds chosen to hit sfc < 400, 400-499,
    >= 500), values bit-equal to scalefac_value_law."""
    tables_seen = set()
    for seed in (*range(8), *range(396, 404), *range(496, 508)):
        payload = M.mp3_frames_encode(
            (20, 25)[seed % 2], 3, bitrate_idx=8 + seed % 6,
            sr_idx=seed % 3, n_frames=2 + seed % 3,
            channel_mode=seed % 4, protection=seed % 2 == 0, seed=seed,
            structured_side=True, structured_scalefactors=True)
        for r in M.mp3_scalefactors_lsf(payload):
            tables_seen.add(r["sf_table"])
            want = (M.scalefac_value_law(seed, r["frame"], 0,
                                         r["channel"], r["sfb"],
                                         r["window"], r["slen"])
                    if r["slen"] else 0)
            assert r["scalefac"] == want
            assert r["preflag"] == (1 if r["sf_table"] == 2 else 0)
    assert tables_seen == {0, 1, 2}


# --------------------------------------------------------- regions (r12)

def _regenc(seed, **kw):
    args = dict(version=10, layer=3, bitrate_idx=9, sr_idx=seed % 3,
                n_frames=2 + seed % 3, channel_mode=seed % 4,
                protection=seed % 2 == 0, seed=seed,
                structured_side=True, structured_scalefactors=True)
    args.update(kw)
    return M.mp3_frames_encode(**args)


def test_regions_partition_big_values_exactly():
    """region0 + region1 + region2 always sum to 2*big_values, every
    region is non-negative, and region2 is empty under window
    switching (the libmad default counts end region1 at 576).
    Default law per libmad (ADVICE r12): r0 = 8 only for PURE short
    blocks (block_type 2 with the mixed flag clear), else 7."""
    for seed in range(12):
        payload = _regenc(seed)
        mixed = {(g["frame"], g["granule"], g["channel"]):
                 g["mixed_block_flag"]
                 for g in M.mp3_granules(payload)}
        for r in M.mp3_regions(payload):
            assert r["region0_lines"] >= 0
            assert r["region1_lines"] >= 0
            assert r["region2_lines"] >= 0
            assert (r["region0_lines"] + r["region1_lines"]
                    + r["region2_lines"]) == r["bv_lines"] == \
                2 * r["big_values"]
            if r["block_type"] != -1:          # window switching
                assert r["region2_lines"] == 0
                assert r["table_r2"] == -1
                pure_short = (r["block_type"] == 2 and
                              mixed[(r["frame"], r["granule"],
                                     r["channel"])] != 1)
                assert r["r0_count"] == (8 if pure_short else 7)
                assert r["r1_count"] == 20 - r["r0_count"]


def test_regions_boundary_law_long_blocks():
    """For a transmitted-count granule the boundaries index the ISO
    long table for the stream's sample rate, clamped at big_values."""
    rows = M.mp3_regions(_regenc(1, sr_idx=0))   # 44100
    L = M.SFB_LONG_MPEG1[44100]
    for r in rows:
        if r["block_type"] != -1:
            continue
        b0 = L[min(r["r0_count"] + 1, 22)]
        b1 = L[min(r["r0_count"] + r["r1_count"] + 2, 22)]
        assert r["region0_lines"] == min(b0, r["bv_lines"])
        assert r["region1_lines"] == min(b1, r["bv_lines"]) - \
            min(b0, r["bv_lines"])


def test_regions_part3_budget_consistency():
    """part3 = part2_3_length - part2, and part23_ok flags exactly the
    non-negative budgets; part2 agrees with the scalefactor layer."""
    payload = _regenc(5)
    sf = M.mp3_scalefactors(payload)
    p2 = {(r["frame"], r["granule"], r["channel"]): r["part2_bits"]
          for r in sf}
    for r in M.mp3_regions(payload):
        key = (r["frame"], r["granule"], r["channel"])
        assert r["part2_bits"] == p2[key]
        assert r["part23_ok"] == (1 if r["part3_bits"] >= 0 else 0)


def test_regions_lsf_and_layer_gates():
    with pytest.raises(M.Mp3Error, match="LSF region"):
        M.mp3_regions(_regenc(3, version=20, bitrate_idx=9,
                              structured_scalefactors=False))
    with pytest.raises(M.Mp3Error, match="Layer III"):
        M.mp3_regions(M.mp3_frames_encode(
            10, 2, bitrate_idx=9, sr_idx=0, n_frames=2,
            channel_mode=0, protection=False, seed=1))


# ------------------------------------------------------ spectrum (r13)

from geospatial_data_pipeline_spark_sedona_on_aws_spark.multimodal import mp3huffman as HU


def _specenc(seed, **kw):
    args = dict(version=10, layer=3, bitrate_idx=14, sr_idx=seed % 3,
                n_frames=2 + seed % 3, channel_mode=seed % 4,
                protection=seed % 2 == 0, seed=seed,
                structured_spectrum=True)
    args.update(kw)
    return M.mp3_frames_encode(**args)


def test_huffman_books_are_prefix_codes():
    """Every engine-canonical codebook satisfies Kraft with equality and
    no codeword prefixes another; count1 table B is the spec's literal
    4-bit complement code."""
    books = [HU.pair_book(t) for t in HU.TABLE_DIMS
             if HU.TABLE_DIMS[t][0]] + [HU.count1_book(0)]
    for book in books:
        codes = sorted((ln, code) for code, ln in book.values())
        assert sum(2.0 ** -ln for ln, _ in codes) == 1.0   # full tree
        strs = sorted(format(code, f"0{ln}b") for ln, code in codes)
        for a, b in zip(strs, strs[1:]):
            assert not b.startswith(a), (a, b)
    b1 = HU.count1_book(1)
    assert b1 == {q: ((~q) & 0xF, 4) for q in range(16)}


def test_spectrum_roundtrip_matches_value_laws():
    """Decoded spectral lines reproduce the magnitude/sign laws exactly:
    big_values lines per region table (zero for the no-codebook tables
    0/4/14), count1 quadruples after them, lines contiguous, part3_ok
    everywhere (the encoder writes the TRUE part2_3_length)."""
    import collections
    for seed in range(16):
        rows = M.mp3_spectrum(_specenc(seed))
        assert rows and all(r["part3_ok"] == 1 for r in rows)
        bygc = collections.defaultdict(list)
        for r in rows:
            bygc[(r["frame"], r["granule"], r["channel"])].append(r)
        for (f, g, c), rs in bygc.items():
            assert sorted(r["line"] for r in rs) == list(range(len(rs)))
            for r in rs:
                if r["is_count1"]:
                    continue
                t = r["htable"]
                vmax = HU.table_vmax(t)
                mag = (M.spectrum_value_law(seed, f, g, c, r["line"],
                                            vmax) if vmax else 0)
                exp = 0 if mag == 0 else (
                    -mag if M.spectrum_sign_law(seed, f, r["line"])
                    else mag)
                assert r["value"] == exp
                assert r["magnitude"] == abs(exp)
            bv = [r for r in rs if not r["is_count1"]]
            c1 = [r for r in rs if r["is_count1"]]
            assert len(c1) == 4 * M.n_count1_law(seed, f, g, c, len(bv))
            for r in c1:
                j = (r["line"] - len(bv)) // 4
                k = (r["line"] - len(bv)) % 4
                mag = M.count1_bit_law(seed, f, g, c, j, k)
                exp = 0 if mag == 0 else (
                    -1 if M.count1_sign_law(seed, j, k) else 1)
                assert r["value"] == exp


def test_spectrum_exercises_escape_and_signs():
    """The fixture genuinely hits the linbits escape path (magnitudes
    above 15 in ESC-table regions) and both signs."""
    rows = [r for s in range(16) for r in M.mp3_spectrum(_specenc(s))]
    escapes = [r for r in rows if r["escape"]]
    assert escapes and all(r["magnitude"] >= 15 for r in escapes)
    assert any(r["magnitude"] > 15 for r in escapes)   # linbits read
    assert any(r["value"] < 0 for r in rows)
    assert any(r["value"] > 0 for r in rows)


def test_spectrum_part23_is_true_bit_count():
    """In spectrum mode the side info's part2_3_length equals the actual
    part2+part3 bits — unlike the part2-only fixtures' synthetic budget
    — so mp3_regions' part23_ok is 1 on every granule of the stream."""
    for seed in range(8):
        payload = _specenc(seed)
        assert all(r["part23_ok"] == 1 for r in M.mp3_regions(payload))


def test_spectrum_budget_crossing_flags_not_raises():
    """A count1 quadruple that would cross the part3 budget is discarded
    and flags part3_ok = 0 (decoders rewind to the boundary)."""
    gf = {"window_switching": 0, "block_type": -1, "mixed_block_flag": -1,
          "big_values": 0, "region0_count": 3, "region1_count": 3,
          "table_select_0": 1, "table_select_1": 1, "table_select_2": 1,
          "count1table_select": 1, "part2_3_length": 0}
    w = M._BitWriter()
    book = HU.count1_book(1)
    HU.write_symbol(w, book, 0b1111)           # 4-bit code
    for _ in range(4):
        w.put(1, 1)                            # 4 sign bits -> 8 total
    r = M._BitReader(w.to_bytes(2))
    rows, bits, ok = M._spectrum_decode_gc(r, gf, 44100, 5, 16)
    assert ok == 0 and rows == [] and bits == 5


def test_spectrum_gates():
    """LSF streams and non-Layer-III streams raise deterministically;
    the encoder refuses spectrum mode off MPEG-1 Layer III."""
    with pytest.raises(M.Mp3Error):
        M.mp3_frames_encode(20, 3, 8, 0, 1, 0, False, 1,
                            structured_spectrum=True)
    lsf = M.mp3_frames_encode(20, 3, 8, 0, 1, 0, False, 1,
                              structured_side=True)
    with pytest.raises(M.Mp3Error):
        M.mp3_spectrum(lsf)


def test_spectrum_fits_every_fixture_frame():
    """The 320 kbps fixture frames always hold the worst-case part2 +
    part3 (the SPECTRUM_BV_MOD cap exists for this) — proven by
    encoding a wide seed range without the fit guard raising."""
    for seed in range(200):
        _specenc(seed)
