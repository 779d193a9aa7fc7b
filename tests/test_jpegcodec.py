"""Pure-stdlib baseline JPEG codec (multimodal/jpegcodec.py, r7 verdict
item 5): exact DC-only round trips, bounded-error lossy round trips,
4:2:0 interleave + chroma upsampling, restart-free Huffman streams with
byte stuffing, and the documented progressive rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geospatial_data_pipeline_spark_sedona_on_aws_spark.multimodal import jpegcodec as J


@given(seed=st.integers(0, 100_000))
@settings(max_examples=40, deadline=None)
def test_prop_block_constant_gray_round_trip_exact(seed):
    """Block-constant images are DC-only with q=1 — the lossy pipeline is
    exact (the multimodal_jpeg_decode oracle's premise)."""
    rng = np.random.default_rng(seed)
    bh, bw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
    blocks = rng.integers(0, 256, size=(bh, bw), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    d = J.jpeg_decode(J.jpeg_encode_gray(img))
    assert (d["width"], d["height"], d["channels"]) == (bw * 8, bh * 8, 1)
    assert (d["pixels"] == img).all()


@given(seed=st.integers(0, 100_000))
@settings(max_examples=20, deadline=None)
def test_prop_random_gray_q1_round_trip_tight(seed):
    """Arbitrary images with the all-ones table: the only loss is the
    FDCT coefficient rounding — decoded pixels within ±2."""
    rng = np.random.default_rng(seed)
    h = 8 * int(rng.integers(1, 5))
    w = 8 * int(rng.integers(1, 5))
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    d = J.jpeg_decode(J.jpeg_encode_gray(img))
    assert np.abs(d["pixels"].astype(int) - img.astype(int)).max() <= 2


def test_quantized_round_trip_bounded():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    qt = np.full((8, 8), 4)
    d = J.jpeg_decode(J.jpeg_encode_gray(img, qtable=qt))
    assert np.abs(d["pixels"].astype(int) - img.astype(int)).max() <= 20


def test_ycbcr420_color_round_trip_exact():
    """Block-constant 4:2:0 color: exercises the MCU interleave, the
    chroma Huffman tables, 2×2 upsampling, and YCbCr→RGB."""
    rng = np.random.default_rng(5)
    yb = rng.integers(16, 235, size=(4, 4), dtype=np.uint8)
    y = np.repeat(np.repeat(yb, 8, axis=0), 8, axis=1)      # 32×32
    cbb = rng.integers(16, 240, size=(2, 2), dtype=np.uint8)
    crb = rng.integers(16, 240, size=(2, 2), dtype=np.uint8)
    cb = np.repeat(np.repeat(cbb, 8, axis=0), 8, axis=1)    # 16×16
    cr = np.repeat(np.repeat(crb, 8, axis=0), 8, axis=1)
    d = J.jpeg_decode(J.jpeg_encode_ycbcr420(y, cb, cr))
    assert (d["width"], d["height"], d["channels"]) == (32, 32, 3)
    yf = y.astype(float)
    cbf = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1).astype(float)
    crf = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1).astype(float)
    exp = np.stack([
        np.clip(np.rint(yf + 1.402 * (crf - 128)), 0, 255),
        np.clip(np.rint(yf - 0.344136 * (cbf - 128)
                        - 0.714136 * (crf - 128)), 0, 255),
        np.clip(np.rint(yf + 1.772 * (cbf - 128)), 0, 255),
    ], axis=-1).astype(np.uint8)
    assert (d["pixels"] == exp).all()


def test_byte_stuffing_survives():
    """An image whose entropy stream contains 0xFF bytes must unstuff
    correctly — white (255) blocks produce large positive DC codes that
    hit the stuffing path with high probability across a sweep."""
    for v in range(0, 256, 17):
        img = np.full((16, 16), v, dtype=np.uint8)
        d = J.jpeg_decode(J.jpeg_encode_gray(img))
        assert (d["pixels"] == img).all(), v


def test_progressive_and_garbage_rejection():
    bad = b"\xff\xd8\xff\xc2" + struct.pack(">H", 11) + bytes(9)
    with pytest.raises(NotImplementedError, match="baseline"):
        J.jpeg_decode(bad)
    with pytest.raises(J.JpegError):
        J.jpeg_decode(b"not a jpeg at all")
    with pytest.raises(J.JpegError):
        J.jpeg_decode(b"\xff\xd8\xff\xd9")  # SOI then EOI, no scan
