"""The real PNG decode path (functions/png.py): spec-level decode checks
built independently of the encoder, round-trips through every scanline
filter, and the Spark-side multimodal kernels over actual PNG payloads."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from haskellpagerank_spark.functions import multimodal as M
from haskellpagerank_spark.functions.png import (PNG_SIG, decode_png,
                                                 encode_png, luma)


@pytest.fixture(scope="module")
def spark():
    from haskellpagerank_spark.session import get_spark
    return get_spark(cores=4, shuffle_partitions=4)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))


def _hand_built_png() -> tuple[bytes, np.ndarray]:
    """A 3x2 grayscale PNG assembled byte-by-byte FROM THE SPEC in this
    test (no encode_png involved): filter 0 on row 0, filter 2 (Up) on
    row 1, so decode must reconstruct row1 = filt1 + row0 mod 256."""
    row0 = bytes([10, 20, 250])
    filt1 = bytes([5, 7, 10])           # Up-filtered deltas
    want = np.array([[10, 20, 250],
                     [15, 27, 4]], dtype=np.uint8)  # 250+10 wraps to 4
    raw = b"\x00" + row0 + b"\x02" + filt1
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    data = (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))
    return data, want


def test_decode_hand_built_spec_png():
    data, want = _hand_built_png()
    got = decode_png(data)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_decode_split_idat_and_ancillary_chunks():
    """IDAT split across chunks + a tEXt chunk in between must decode
    identically (the stream is the concatenation of all IDAT bodies)."""
    data, want = _hand_built_png()
    # rebuild with the zlib stream split into two IDATs and a tEXt chunk
    raw = zlib.compress(b"\x00" + bytes([10, 20, 250])
                        + b"\x02" + bytes([5, 7, 10]))
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    data2 = (PNG_SIG + _chunk(b"IHDR", ihdr)
             + _chunk(b"IDAT", raw[:5])
             + _chunk(b"tEXt", b"Comment\x00hi")
             + _chunk(b"IDAT", raw[5:])
             + _chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(data2), want)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(5, 7), (4, 3, 3), (3, 4, 4), (6, 2, 2)])
def test_roundtrip_every_filter_and_colortype(filter_type, shape):
    rng = np.random.default_rng(hash((filter_type,) + shape) % 2**31)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got = decode_png(encode_png(img, filter_type=filter_type))
    np.testing.assert_array_equal(got, img)


def test_indexed_color_plte():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"\x00" + bytes(idx[0]) + b"\x00" + bytes(idx[1])
    data = (PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(data), pal[idx])


def test_corruption_and_unsupported_raise():
    data, _ = _hand_built_png()
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + data[4:])
    flipped = bytearray(data)
    flipped[40] ^= 0xFF  # inside IDAT body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(flipped))
    ihdr16 = struct.pack(">IIBBBBB", 3, 2, 16, 0, 0, 0, 0)
    data16 = (PNG_SIG + _chunk(b"IHDR", ihdr16)
              + _chunk(b"IDAT", zlib.compress(b"\x00" * 13))
              + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(data16)


def test_luma_modes():
    gray = np.array([[7]], dtype=np.uint8)
    np.testing.assert_array_equal(luma(gray), gray)
    rgb = np.array([[[255, 0, 0]]], dtype=np.uint8)
    assert luma(rgb)[0, 0] == (299 * 255) // 1000
    rgba = np.array([[[0, 255, 0, 9]]], dtype=np.uint8)
    assert luma(rgba)[0, 0] == (587 * 255) // 1000  # alpha ignored
    ga = np.array([[[123, 45]]], dtype=np.uint8)
    assert luma(ga)[0, 0] == 123


def test_resize_images_decodes_real_png(spark):
    """End-to-end VERDICT-r4 criterion: a known PNG flows through the
    Arrow resize kernel byte-exactly — decode is real, shape comes from
    IHDR (the metadata width/height columns deliberately lie)."""
    grid = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
    payload = encode_png(grid, filter_type=4)
    rows = [(1, "image", bytearray(payload), 999, 999, 0),
            (2, "image", bytearray(b"not-a-png-payload" * 4), 8, 8, 0)]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r["media_id"]: r["pixels"]
           for r in M.resize_images(media, 2, 2).collect()}
    # NN mapping picks source rows/cols floor(i*4/2) = 0, 2
    want = grid[[0, 2]][:, [0, 2]].reshape(-1).tolist()
    assert out[1] == want
    # the non-PNG row still resolves through the deterministic stub
    assert len(out[2]) == 4


def test_extract_features_png_histogram(spark):
    """PNG features are the real 16-bin luma histogram of decoded pixels,
    not the sha256 stub."""
    grid = np.zeros((8, 8), dtype=np.uint8)
    grid[:4] = 255          # half the pixels in bin 15, half in bin 0
    payload = encode_png(grid, filter_type=1)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), 8, 8, 0)], M.MEDIA_SCHEMA)
    feats = M.extract_features(media).collect()[0]["features"]
    assert feats[0] == pytest.approx(0.5)
    assert feats[15] == pytest.approx(0.5)
    assert sum(feats) == pytest.approx(1.0)


def test_truncated_crc_trailer_raises_valueerror():
    """Regression: a chunk whose body fits exactly but whose 4-byte CRC
    trailer is cut off must raise the documented ValueError, not leak a
    struct.error past callers that catch the contract exception."""
    data, _ = _hand_built_png()
    # cut the stream 2 bytes into the IEND CRC
    with pytest.raises(ValueError, match="truncated"):
        decode_png(data[:-2])
    # and mid-body (the pre-existing case) still raises too
    with pytest.raises(ValueError, match="truncated"):
        decode_png(data[:-10])


def test_corrupt_png_payload_degrades_to_stub_not_job_abort():
    """Regression: a crawl corpus always contains some truncated or
    unsupported PNGs; one bad payload must not kill the whole Spark job —
    the kernels degrade that row to the deterministic sha256 stub."""
    data, _ = _hand_built_png()
    bad = data[:-2]                       # truncated CRC
    flipped = bytearray(data); flipped[40] ^= 0xFF
    ihdr16 = struct.pack(">IIBBBBB", 3, 2, 16, 0, 0, 0, 0)
    deep = (PNG_SIG + _chunk(b"IHDR", ihdr16)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 13))
            + _chunk(b"IEND", b""))
    for payload in (bad, bytes(flipped), deep):
        feats = M._features(payload, "image")
        np.testing.assert_array_equal(
            feats, M._decode_stub(payload, "image"))
        grid = M.decode_image(payload, 4, 3)
        np.testing.assert_array_equal(
            grid, M._decode_image_stub(payload, 4, 3))
    # a healthy PNG still takes the real path (histogram sums to 1)
    healthy_feats = M._features(data, "image")
    assert abs(float(healthy_feats.sum()) - 1.0) < 1e-6
    assert len(healthy_feats) == M.FEATURE_DIM


# ---------------------------------------------------------------------------
# property: encode->decode is the identity for every supported pixel
# layout x scanline filter (hypothesis drives shapes, content, and filter)

try:
    from hypothesis import given, settings, strategies as st
    _HAVE_HYPOTHESIS = True
except ImportError:          # pragma: no cover - baked into this container
    _HAVE_HYPOTHESIS = False


@pytest.mark.skipif(not _HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**32 - 1),
       h=st.integers(1, 12), w=st.integers(1, 12),
       ch=st.sampled_from([1, 2, 3, 4]),
       filter_type=st.integers(0, 4))
def test_png_roundtrip_property(seed, h, w, ch, filter_type):
    """decode(encode(img, filter)) == img byte-exactly for every color
    layout (gray, gray+alpha, RGB, RGBA), every filter type, and arbitrary
    content including the wrap-around arithmetic near 0/255 — the modular
    (un)filter algebra must be a true inverse, not just close."""
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(img, filter_type=filter_type))
    np.testing.assert_array_equal(out, img)


@pytest.mark.skipif(not _HAVE_HYPOTHESIS, reason="hypothesis not installed")
@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**32 - 1),
       h=st.integers(1, 10), w=st.integers(1, 10),
       cut=st.integers(1, 40))
def test_png_any_truncation_raises_property(seed, h, w, cut):
    """Cutting ANY suffix off a valid PNG raises the contract ValueError
    (never a silent partial decode, never a non-contract exception type) —
    the crawl-robustness guarantee the multimodal kernels rely on."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    data = encode_png(img)
    cut = min(cut, len(data) - len(PNG_SIG) - 1)
    with pytest.raises(ValueError):
        decode_png(data[:-cut])
