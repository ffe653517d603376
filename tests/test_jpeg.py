"""Tests for the pure stdlib+NumPy baseline JPEG codec
(kapra_spark/functions/jpeg.py, ITU-T T.81) and its MJPG-in-AVI
integration (operators/multimodal.py). No Spark session needed.

JPEG is lossy, so round trips assert bounded error on smooth inputs
(gradients — the codec's intended operating regime) and structural
exactness everywhere: geometry, marker layout, restart segments, the
OpenDML implied-DHT convention, and 4:2:0 vs 4:4:4 parity.
"""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kapra_spark.functions.jpeg import (
    jpeg_decode,
    jpeg_encode,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)


def _gradient(h, w, phase=0):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        (yy * 2 + xx + phase) % 200 + 20,
        (xx * 3 + phase) % 180 + 30,
        (yy + xx * 2 + phase) % 160 + 40,
    ], axis=2)
    return img.astype(np.uint8)


def test_color_transform_inverts():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    back = ycbcr_to_rgb(rgb_to_ycbcr(img))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("quality", [75, 90, 95])
def test_smooth_roundtrip_bounded_error(subsample, quality):
    img = _gradient(41, 67)
    dec = jpeg_decode(jpeg_encode(img, quality=quality, subsample=subsample))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    # smooth gradient: mean error tight; max bounded by ringing at the
    # wrap cliffs of the synthetic gradient
    assert err.mean() < (6 if quality >= 90 else 10)


def test_grayscale_roundtrip():
    img = _gradient(33, 29)[:, :, 0]
    dec = jpeg_decode(jpeg_encode(img, quality=92))
    assert dec.shape == img.shape and dec.ndim == 2
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 8


def test_restart_interval_byte_effect_and_decode():
    img = _gradient(48, 64)
    plain = jpeg_encode(img, quality=88)
    rst = jpeg_encode(img, quality=88, restart_interval=4)
    assert b"\xFF\xDD" in rst and b"\xFF\xDD" not in plain  # DRI marker
    # RSTn markers appear in the scan
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
    assert np.array_equal(jpeg_decode(rst), jpeg_decode(plain))


def test_implied_dht_decodes_like_explicit():
    img = _gradient(40, 56)
    with_dht = jpeg_encode(img, quality=85, subsample="420")
    without = jpeg_encode(img, quality=85, subsample="420",
                          include_dht=False)
    assert b"\xFF\xC4" in with_dht and b"\xFF\xC4" not in without
    assert np.array_equal(jpeg_decode(without), jpeg_decode(with_dht))


def test_non_multiple_of_mcu_dimensions():
    # 4:2:0 MCU is 16x16 — exercise every padding remainder class
    for h, w in [(17, 31), (16, 16), (1, 1), (9, 50)]:
        img = _gradient(h, w)
        dec = jpeg_decode(jpeg_encode(img, quality=90, subsample="420"))
        assert dec.shape == img.shape


def test_rejects_bad_inputs():
    with pytest.raises(NotImplementedError):
        jpeg_decode(b"not a jpeg")
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((0, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((4, 4, 3), np.uint8), subsample="422")


def test_rejects_progressive_sof2():
    img = _gradient(16, 16)
    blob = bytearray(jpeg_encode(img, quality=80))
    idx = blob.find(b"\xFF\xC0")
    assert idx > 0
    blob[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(blob))


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40), w=st.integers(1, 40),
    quality=st.integers(50, 95),
    subsample=st.sampled_from(["444", "420"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_structural_property(h, w, quality, subsample, seed):
    """Any uint8 image (even pure noise — JPEG's worst case) must
    round-trip to the exact geometry/dtype with a valid marker stream;
    error is unbounded on noise so only structure is pinned."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    blob = jpeg_encode(img, quality=quality, subsample=subsample)
    assert blob[:2] == b"\xFF\xD8" and blob[-2:] == b"\xFF\xD9"
    dec = jpeg_decode(blob)
    assert dec.shape == img.shape and dec.dtype == np.uint8


# --- MJPG-in-AVI integration -----------------------------------------

def test_avi_mjpg_roundtrip():
    from kapra_spark.operators.multimodal import avi_decode, avi_encode

    frames = np.stack([_gradient(36, 52, phase=t * 17) for t in range(4)])
    blob = avi_encode(frames, fps=12, codec="MJPG", quality=90)
    # strf advertises the MJPG fourcc
    assert struct.pack("<I", struct.unpack("<I", b"MJPG")[0]) in blob
    back, fps = avi_decode(blob)
    assert fps == 12 and back.shape == frames.shape
    err = np.abs(back.astype(int) - frames.astype(int))
    assert err.mean() < 6
    # per the OpenDML MJPG convention the frames carry no DHT
    movi = blob[blob.find(b"movi"):]
    assert b"\xFF\xC4" not in movi


def test_avi_mjpg_much_smaller_than_dib():
    from kapra_spark.operators.multimodal import avi_encode

    frames = np.stack([_gradient(48, 64, phase=t * 9) for t in range(6)])
    dib = avi_encode(frames, fps=10)
    mjpg = avi_encode(frames, fps=10, codec="MJPG", quality=85)
    assert len(mjpg) < len(dib) / 3


def test_avi_dib_path_unchanged():
    from kapra_spark.operators.multimodal import avi_decode, avi_encode

    rng = np.random.default_rng(5)
    fr = rng.integers(0, 256, (3, 11, 13, 3), dtype=np.uint8)
    back, fps = avi_decode(avi_encode(fr, fps=7))
    assert fps == 7 and np.array_equal(back, fr)


def test_avi_unknown_codec_still_raises():
    from kapra_spark.operators.multimodal import avi_decode, avi_encode

    frames = np.stack([_gradient(16, 16)])
    blob = bytearray(avi_encode(frames, fps=5, codec="MJPG"))
    idx = blob.find(b"MJPG", blob.find(b"strf"))  # biCompression field
    blob[idx:idx + 4] = b"H264"
    with pytest.raises(NotImplementedError):
        avi_decode(bytes(blob))


# --- r6 vectorized batch decode --------------------------------------

def test_batch_decode_equals_serial():
    """jpeg_decode_batch (lockstep across restart segments) must be
    bit-identical to the serial per-frame decoder on gradients, noise,
    grayscale, mixed geometries, and no-restart fallback frames."""
    from kapra_spark.functions.jpeg import (_entropy_serial, _parse_jpeg,
                                            _reconstruct, jpeg_decode_batch)

    rng = np.random.default_rng(21)
    blobs = []
    for t in range(3):
        blobs.append(jpeg_encode(_gradient(36, 52, phase=t * 13),
                                 quality=88, subsample="420",
                                 restart_interval=1, include_dht=False))
    blobs.append(jpeg_encode(
        rng.integers(0, 256, (23, 37, 3), dtype=np.uint8),
        quality=55, subsample="420", restart_interval=2))
    blobs.append(jpeg_encode(_gradient(33, 29)[:, :, 0], quality=92,
                             restart_interval=1))
    blobs.append(jpeg_encode(_gradient(20, 20), quality=70))  # no restart
    serial = [_reconstruct(_parse_jpeg(b), _entropy_serial(_parse_jpeg(b)))
              for b in blobs]
    batch = jpeg_decode_batch(blobs)
    for a, b in zip(serial, batch):
        assert np.array_equal(a, b)


def test_avi_mjpg_frames_carry_restart_segments():
    """The engine's MJPG writer emits restart_interval=1 so batch
    decode gets one lockstep lane per MCU."""
    from kapra_spark.operators.multimodal import avi_encode

    frames = np.stack([_gradient(32, 48, phase=t) for t in range(2)])
    blob = avi_encode(frames, fps=10, codec="MJPG", quality=85)
    assert b"\xFF\xDD" in blob                     # DRI marker present
    assert any(bytes([0xFF, 0xD0 + i]) in blob for i in range(8))


def test_crafted_dc_table_raises_in_both_paths():
    """A hostile DHT whose DC value byte exceeds the legal size-category
    range must raise in BOTH the serial and the lockstep batch decoder
    (no silent uint64 shift wraparound)."""
    from kapra_spark.functions.jpeg import jpeg_decode_batch

    img = np.full((32, 32, 3), 128, dtype=np.uint8)
    blob = bytearray(jpeg_encode(img, quality=85, subsample="420",
                                 restart_interval=1))
    i = blob.find(b"\xFF\xC4")
    assert blob[i + 21] == 0          # first DC_LUMA value (category 0)
    blob[i + 21] = 200                # crafted: category 200
    with pytest.raises((ValueError, IndexError)):
        jpeg_decode(bytes(blob))
    with pytest.raises((ValueError, IndexError)):
        jpeg_decode_batch([bytes(blob), bytes(blob)])
