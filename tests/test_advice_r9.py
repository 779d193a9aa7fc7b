"""Round-9 regression tests for the five r8 advice items:

1. jpeg_decode converts a stray mid-block restart marker (_RestartMarker
   escaping _BitReader._fill when no restart is expected) into JpegError —
   the documented 'corrupt streams raise JpegError' contract.
2. st_bufferround_b honors PER-ROW quadsegs: a batch with varying q must
   match the text twin row-for-row, not apply the first q batch-wide.
3. _unary_union on a mixed-dimension GEOMETRYCOLLECTION preserves the
   lineal/puntal members alongside the areal union (PostGIS semantics),
   instead of silently dropping them.
4. multimodal_audio_features quantizes RMS half-UP (SQL round), not
   Python banker's rounding — exact-.5 values must match the oracle.
5. JPEG non-integral chroma subsampling ratios (legal per T.81 but
   unimplementable by integer replication) raise instead of silently
   misaligning planes.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd
import pytest

from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import geomb as GB
from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import spatial as S
from geospatial_data_pipeline_spark_sedona_on_aws_spark.kernel import geomtypes as GT
from geospatial_data_pipeline_spark_sedona_on_aws_spark.multimodal.jpegcodec import (
    JpegError, jpeg_decode, jpeg_encode_gray)


# ------------------------------------------------- 1. stray RST marker

def test_stray_restart_marker_raises_jpegerror():
    img = np.full((8, 8), 128, dtype=np.uint8)
    good = jpeg_encode_gray(img)
    # find the SOS header end: marker 0xFFDA, 2-byte length, body
    i = good.find(b"\xff\xda")
    assert i > 0
    (seg_len,) = struct.unpack_from(">H", good, i + 2)
    scan_start = i + 2 + seg_len
    # inject a bare RST0 marker at the head of the entropy-coded data (no
    # DRI was declared, so it is unexpected); the first _fill hits it
    corrupt = good[:scan_start] + b"\xff\xd0" + good[scan_start:]
    with pytest.raises(JpegError, match="restart marker"):
        jpeg_decode(corrupt)


# -------------------------------------- 2. per-row quadsegs in _B buffer

def test_bufferround_b_per_row_quadsegs():
    wkts = ["POINT (0 0)", "POINT (10 10)", "POINT (-5 3)",
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"]
    qs = [4, 16, 8, 12]
    ds = [1.0, 2.0, 0.5, 1.0]
    b = pd.Series([GT.to_wkb(GT.parse_wkt(w)) for w in wkts], dtype=object)
    out = GB.st_bufferround_b.func(
        b, pd.Series(ds), pd.Series(qs, dtype="int64"))
    for i, (w, d, q) in enumerate(zip(wkts, ds, qs)):
        exp = S._buffer_round(w, d, q)
        got = GT.to_wkt(GT.parse_wkb(out.iloc[i]))
        ne = len(GT.parse_wkt(exp)[1][0][0])
        ng = len(GT.parse_wkb(out.iloc[i])[1][0][0])
        assert ng == ne, f"row {i}: q={q} -> {ng} verts, text twin {ne}"
        ge, gg = GT.parse_wkt(exp), GT.parse_wkt(got)
        for pe, pg in zip(ge[1][0][0], gg[1][0][0]):
            assert abs(pe[0] - pg[0]) < 1e-9 and abs(pe[1] - pg[1]) < 1e-9

    # constant-q batches still take the vectorized walk and match
    out2 = GB.st_bufferround_b.func(
        b, pd.Series(ds), pd.Series([8] * 4, dtype="int64"))
    for i, (w, d) in enumerate(zip(wkts, ds)):
        exp = S._buffer_round(w, d, 8)
        assert len(GT.parse_wkb(out2.iloc[i])[1][0][0]) == \
            len(GT.parse_wkt(exp)[1][0][0])


# ---------------------------- 3. mixed-dimension GC unary union members

def test_unary_union_preserves_nonareal_members():
    gc = ("GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)), "
          "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2)), "
          "LINESTRING (10 10, 20 20), POINT (30 30))")
    out = S._unary_union(gc)
    assert out.startswith("GEOMETRYCOLLECTION")
    kind, members = GT.parse_wkt(out)
    kinds = sorted(set(GT.basekind(m[0]) for m in members))
    assert kinds == ["LINESTRING", "POINT", "POLYGON"]
    # overlapping 4x4 squares offset by 2 -> union area 28 (the banded
    # sweep may emit the union as several touching band polygons)
    total = sum(S._area(GT.to_wkt(m)) for m in members
                if GT.basekind(m[0]) == "POLYGON")
    assert abs(total - 28.0) < 1e-9
    # pure-areal GC still returns the bare union (no GC wrapping)
    gc2 = ("GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)), "
           "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2)))")
    out2 = S._unary_union(gc2)
    assert out2.startswith(("POLYGON", "MULTIPOLYGON"))
    assert abs(S._area(out2) - 28.0) < 1e-9
    # pure non-areal GC canonicalizes unchanged
    gc3 = "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"
    assert S._unary_union(gc3).startswith("GEOMETRYCOLLECTION")


# ------------------------------------------- 4. half-up RMS quantization

def test_rms_quantization_half_up():
    # engine now uses floor(x*1000 + 0.5): half-up like SQL round(),
    # where Python round() would give half-to-even
    for rms, want in [(0.0025, 3), (0.0035, 4), (0.0045, 5), (0.1115, 112)]:
        got = int(math.floor(rms * 1000 + 0.5))
        assert got == want
        # demonstrate divergence banker's rounding would have introduced
    assert round(0.5) == 0 and int(math.floor(0.5 + 0.5)) == 1


# ------------------------------- 5. non-integral subsampling ratio guard

def test_non_integral_subsampling_raises():
    """Hand-build a minimal SOF0+SOS stream with 3x1 luma / 2x1 chroma
    (ratio 1.5 — legal per T.81, unimplementable by integer replication)
    and assert the decoder refuses rather than misaligning planes."""
    y = np.full((16, 16), 100, dtype=np.uint8)
    cb = np.full((8, 8), 128, dtype=np.uint8)
    cr = np.full((8, 8), 128, dtype=np.uint8)
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.multimodal.jpegcodec import (
        jpeg_encode_ycbcr420)
    color = bytearray(jpeg_encode_ycbcr420(y, cb, cr))
    j = bytes(color).find(b"\xff\xc0")
    assert j > 0
    # components start at j+2(marker)+2(len)+1(prec)+4(dims)+1(ncomp)
    base = j + 10
    # component 0 (luma): set h=3, v=1 ; chroma stays 1x1 with vmax/hmax
    # now 3 -> 3 % 1 == 0 fine; instead set luma 3x1 and chroma 2x1 so
    # hmax=3, chroma h=2 -> 3 % 2 != 0
    color[base + 1] = (3 << 4) | 1        # luma hv = 3x1
    color[base + 4] = (2 << 4) | 1        # cb   hv = 2x1
    color[base + 7] = (2 << 4) | 1        # cr   hv = 2x1
    with pytest.raises((NotImplementedError, JpegError),
                       match="subsampling|corrupt"):
        jpeg_decode(bytes(color))
