"""Round-12: lossless JPEG (SOF3, T.81 Annex H) — bit-exact round
trips through the vendored codec for all 7 predictors, restart
intervals, point transform, grayscale + RGB; closes the r11 "What's
missing" #3 lossless slice."""

from __future__ import annotations

import numpy as np
import pytest

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.jpeg_baseline import (
    decode_baseline_jpeg,
    encode_lossless_jpeg,
    jpeg_dims,
)


def _noise(shape, seed=7):
    return np.random.RandomState(seed).randint(0, 256, size=shape).astype(
        np.uint8
    )


@pytest.mark.parametrize("predictor", list(range(1, 8)))
def test_gray_roundtrip_every_predictor(predictor):
    img = _noise((19, 27), seed=predictor)
    back = decode_baseline_jpeg(encode_lossless_jpeg(img, predictor=predictor))
    assert np.array_equal(back, np.stack([img] * 3, axis=-1))


def test_rgb_roundtrip_no_color_transform():
    img = _noise((14, 11, 3))
    back = decode_baseline_jpeg(encode_lossless_jpeg(img, predictor=4))
    assert np.array_equal(back, img)  # components stored AS-IS


def test_restart_interval_roundtrip_and_dims():
    img = _noise((24, 33))
    data = encode_lossless_jpeg(img, predictor=7, restart_interval=33)
    assert jpeg_dims(data) == (33, 24, 1)
    assert np.array_equal(
        decode_baseline_jpeg(data), np.stack([img] * 3, axis=-1)
    )


def test_point_transform_drops_low_bits_exactly():
    img = _noise((10, 10))
    back = decode_baseline_jpeg(
        encode_lossless_jpeg(img, predictor=1, point_transform=2)
    )[:, :, 0]
    assert np.array_equal(back, (img >> 2) << 2)


def test_gradient_compresses_with_neighbor_predictors():
    # a smooth ramp: predictor 7 ((a+b)>>1) codes near-zero diffs, so
    # the file must be far smaller than the raw payload
    g = np.add.outer(
        np.arange(64, dtype=np.int64), np.arange(64, dtype=np.int64)
    ).astype(np.uint8)
    data = encode_lossless_jpeg(g, predictor=7)
    assert len(data) < g.size // 2
    assert np.array_equal(decode_baseline_jpeg(data)[:, :, 0], g)


def test_worstcase_extremes_roundtrip():
    # alternating 0/255 maximizes |diff| for every predictor
    img = np.zeros((9, 9), dtype=np.uint8)
    img[::2, ::2] = 255
    img[1::2, 1::2] = 255
    for p in (1, 2, 4, 7):
        back = decode_baseline_jpeg(encode_lossless_jpeg(img, predictor=p))
        assert np.array_equal(back[:, :, 0], img), p


def test_differential_sofs_still_error_loudly():
    # r12: SOF7 decodes INSIDE a hierarchical stream (see
    # test_jpeg_hierarchical.py); orphaned outside one it is a
    # malformed-stream ValueError, and arithmetic SOFs remain the
    # NotImplementedError
    img = _noise((8, 8))
    data = bytearray(encode_lossless_jpeg(img))
    i = bytes(data).find(b"\xff\xc3")
    data[i + 1] = 0xC7  # rewrite SOF3 -> SOF7 (differential lossless)
    with pytest.raises(ValueError, match="outside a hierarchical"):
        decode_baseline_jpeg(bytes(data))
    data[i + 1] = 0xCB  # SOF11: lossless ARITHMETIC
    with pytest.raises(NotImplementedError):
        decode_baseline_jpeg(bytes(data))
