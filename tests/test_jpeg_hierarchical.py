"""Hierarchical JPEG (operators/jpeg_hierarchical.py — T.81 Annex J:
DHP, EXP expansion, SOF5 differential DCT, SOF7 differential
lossless). The lossless-final pyramid must round-trip bit-exactly."""

from __future__ import annotations

import numpy as np
import pytest

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.jpeg_baseline import (
    decode_baseline_jpeg,
    jpeg_dims,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.jpeg_hierarchical import (
    _expand_axis,
    decode_hierarchical_jpeg,
    encode_hierarchical_jpeg,
)


def _img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize(
    "shape",
    [(16, 16), (17, 23), (8, 8), (9, 13), (24, 24, 3), (21, 13, 3)],
)
def test_lossless_final_roundtrip_bit_exact(shape):
    img = _img(shape, seed=sum(shape))
    enc = encode_hierarchical_jpeg(img, levels=2, quant=8,
                                   final_lossless=True)
    dec = decode_baseline_jpeg(enc)  # dispatches on DHP
    want = img if img.ndim == 3 else np.stack([img] * 3, axis=2)
    assert np.array_equal(dec, want)


def test_three_level_pyramid_lossless(spark_unused=None):
    img = _img((33, 41), seed=3)
    enc = encode_hierarchical_jpeg(img, levels=3, quant=4,
                                   final_lossless=True)
    dec = decode_hierarchical_jpeg(enc)
    assert np.array_equal(dec[:, :, 0], img)


def test_lossy_final_stage_bounded_error():
    # smooth gradient: a differential DCT correction at quant=2 should
    # land within a few counts of the source
    y, x = np.mgrid[0:32, 0:32]
    img = ((y * 3 + x * 5) % 256).astype(np.uint8)
    enc = encode_hierarchical_jpeg(img, levels=2, quant=2,
                                   final_lossless=False)
    dec = decode_hierarchical_jpeg(enc)
    err = np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max()
    assert err <= 8


def test_dims_come_from_dhp_not_base_frame():
    img = _img((30, 44), seed=9)
    enc = encode_hierarchical_jpeg(img, levels=2)
    w, h, nc = jpeg_dims(enc)
    assert (w, h, nc) == (44, 30, 1)  # final dims, not the 22x15 base


def test_expand_axis_matches_spec_interpolation():
    # J.1.1.2: even outputs copy, odd outputs (Ra + Rb + 1) >> 1
    p = np.array([[10, 20, 31]], dtype=np.int64)
    out = _expand_axis(p, 1, 6)
    assert out.tolist() == [[10, 15, 20, 26, 31, 31]]
    # odd target length drops the trailing replicated sample
    assert _expand_axis(p, 1, 5).tolist() == [[10, 15, 20, 26, 31]]


def test_rgb_streams_carry_adobe_transform_flag():
    img = _img((12, 12, 3), seed=4)
    enc = encode_hierarchical_jpeg(img, levels=2)
    assert b"Adobe" in enc  # transform=0: components stored as RGB
    dec = decode_hierarchical_jpeg(enc)
    assert np.array_equal(dec, img)


def test_differential_frame_outside_hierarchy_is_loud():
    img = _img((16, 16), seed=5)
    enc = encode_hierarchical_jpeg(img, levels=2)
    # orphan the differential frame: SOI followed directly by SOF7
    i = enc.find(b"\xff\xc7")
    assert i > 0
    with pytest.raises(ValueError, match="outside a hierarchical"):
        decode_baseline_jpeg(b"\xff\xd8" + enc[i:])
    # without DHP, a baseline decoder stops after the BASE frame: it
    # returns the half-resolution pyramid level, never the final image
    stripped = bytearray(enc)
    j = stripped.find(b"\xff\xde")
    seglen = int.from_bytes(stripped[j + 2 : j + 4], "big")
    del stripped[j : j + 2 + seglen]
    base = decode_baseline_jpeg(bytes(stripped))
    assert base.shape[:2] == (8, 8)


def test_single_level_is_plain_frame_inside_hierarchy():
    img = _img((16, 16), seed=6)
    enc = encode_hierarchical_jpeg(img, levels=1, quant=1)
    dec = decode_hierarchical_jpeg(enc)
    # quant=1 DCT at level 1: near-exact (IDCT rounding only)
    err = np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max()
    assert err <= 1


# --- SOF6 differential progressive (r13) ---------------------------------


@pytest.mark.parametrize(
    "shape",
    [(16, 16), (17, 23), (41, 53), (24, 24, 3), (21, 13, 3)],
)
def test_sof6_lossless_pyramid_bit_exact(shape):
    # an SOF6 differential-progressive middle stage inside a
    # lossless-final pyramid: multi-scan spectral selection + DC
    # successive approximation must reconstruct the identical residual
    img = _img(shape, seed=sum(shape) + 70)
    enc = encode_hierarchical_jpeg(
        img, levels=3, quant=8, final_lossless=True, progressive_diff=True
    )
    assert b"\xff\xc6" in enc  # the SOF6 marker is really in there
    dec = decode_baseline_jpeg(enc)  # dispatches on DHP
    want = img if img.ndim == 3 else np.stack([img] * 3, axis=2)
    assert np.array_equal(dec, want)


def test_sof6_scan_packaging_equals_sof5_reconstruction():
    # SOF5 and SOF6 code the SAME quantized coefficients; only the scan
    # packaging differs — the decoded images must be identical
    img = _img((32, 40), seed=77)
    seq = encode_hierarchical_jpeg(
        img, levels=2, quant=6, final_lossless=False, progressive_diff=False
    )
    prog = encode_hierarchical_jpeg(
        img, levels=2, quant=6, final_lossless=False, progressive_diff=True
    )
    assert b"\xff\xc5" in seq and b"\xff\xc6" in prog
    assert np.array_equal(
        decode_hierarchical_jpeg(seq), decode_hierarchical_jpeg(prog)
    )


def test_sof6_negative_dc_successive_approximation():
    # a residual stage dominated by NEGATIVE DC values (bright base,
    # dark target) exercises the two's-complement arithmetic-shift
    # split (hi = v >> 1, low bit = v & 1) in the DC refinement scan
    img = np.full((24, 24), 30, dtype=np.uint8)
    img[::2, ::2] = 220  # downsample mean ~ bright, residuals negative
    enc = encode_hierarchical_jpeg(
        img, levels=2, quant=3, final_lossless=True, progressive_diff=True
    )
    dec = decode_hierarchical_jpeg(enc)
    assert np.array_equal(dec[:, :, 0], img)


def test_arithmetic_frame_inside_hierarchy_still_loud():
    img = _img((16, 16), seed=9)
    enc = bytearray(
        encode_hierarchical_jpeg(img, levels=3, progressive_diff=True)
    )
    i = enc.find(b"\xff\xc6")
    assert i > 0  # levels=3 + lossless final -> SOF6 middle stage
    enc[i + 1] = 0xCE  # rewrite to a differential arithmetic frame
    with pytest.raises(NotImplementedError, match="0xFFCE"):
        decode_hierarchical_jpeg(bytes(enc))


@pytest.mark.parametrize("shape", [(41, 53), (24, 24, 3), (17, 23, 3)])
def test_sof2_base_frame_lossless_pyramid(shape):
    # non-differential progressive BASE frame (SOF2) inside the
    # pyramid: the full progressive pyramid SOF2 -> SOF6 -> SOF7
    # stays bit-exact; only arithmetic coding remains excluded
    img = _img(shape, seed=sum(shape) + 200)
    enc = encode_hierarchical_jpeg(
        img, levels=3, quant=8, final_lossless=True,
        progressive_diff=True, progressive_base=True,
    )
    assert b"\xff\xc2" in enc and b"\xff\xc6" in enc and b"\xff\xc7" in enc
    dec = decode_baseline_jpeg(enc)
    want = img if img.ndim == 3 else np.stack([img] * 3, axis=2)
    assert np.array_equal(dec, want)


def test_sof2_base_packaging_equals_sof0_reconstruction():
    img = _img((32, 40), seed=88)
    seq = encode_hierarchical_jpeg(img, levels=2, quant=6,
                                   final_lossless=False)
    prog = encode_hierarchical_jpeg(img, levels=2, quant=6,
                                    final_lossless=False,
                                    progressive_base=True)
    assert np.array_equal(
        decode_hierarchical_jpeg(seq), decode_hierarchical_jpeg(prog)
    )


def test_dqt_between_scans_and_after_frame_uses_snapshot():
    # a progressive frame's quant tables are SNAPSHOTTED at each
    # component's first scan: a DQT redefinition injected mid-frame
    # (between two of its scans) must neither terminate the frame nor
    # requantize it, and one injected after the frame's last scan
    # (before the next SOF) must not retroactively requantize either
    img = _img((24, 24), seed=31)
    enc = encode_hierarchical_jpeg(
        img, levels=3, quant=8, final_lossless=True, progressive_diff=True
    )
    want = decode_hierarchical_jpeg(enc)
    rogue = bytes([0xFF, 0xDB, 0x00, 0x43, 0x00]) + bytes([99] * 64)
    sof6 = enc.find(b"\xff\xc6")
    # inject between the SOF6 frame's 2nd and 3rd SOS
    sos_positions = []
    p = sof6
    while len(sos_positions) < 3:
        p = enc.find(b"\xff\xda", p + 2)
        sos_positions.append(p)
    midframe = enc[: sos_positions[2]] + rogue + enc[sos_positions[2]:]
    assert np.array_equal(decode_hierarchical_jpeg(midframe), want)
    # inject after the frame's last scan: just before the next SOF7
    sof7 = enc.find(b"\xff\xc7")
    assert sof7 > sof6
    # the EXP (FFDF) precedes SOF7; insert before the EXP
    exp = enc.rfind(b"\xff\xdf", sof6, sof7)
    postframe = enc[:exp] + rogue + enc[exp:]
    assert np.array_equal(decode_hierarchical_jpeg(postframe), want)


def test_truncated_stream_missing_eoi_still_flushes_final_frame():
    # ADVICE r13: a stream whose final frame is progressive and whose
    # EOI marker is missing must still reconstruct that frame — the
    # pre-fix decoder only flushed on EOI/EXP/SOF, so the accumulated
    # coefficients silently dropped and it returned the PRE-frame
    # reference planes
    img = _img((32, 40), seed=123)
    enc = encode_hierarchical_jpeg(
        img, levels=2, quant=6, final_lossless=False, progressive_diff=True
    )
    want = decode_hierarchical_jpeg(enc)
    assert enc.endswith(b"\xff\xd9")
    truncated = enc[:-2]  # drop the EOI marker only; scans intact
    assert np.array_equal(decode_hierarchical_jpeg(truncated), want)
