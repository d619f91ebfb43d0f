"""Progressive JPEG (SOF2, T.81 Annex G): spectral selection +
successive approximation decode, verified against the baseline codec —
both encoders quantize identically, so progressive decode must
reproduce the baseline-decoded image EXACTLY, scan plan by scan plan."""

from __future__ import annotations

import numpy as np
import pytest

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.jpeg_baseline import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
    encode_progressive_jpeg,
    jpeg_dims,
)


def _img(h=37, w=45):
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        np.stack([(yy * 3 + xx) % 256, (xx * 2) % 256, (yy * 5) % 256], axis=2)
        .astype(np.uint8)
    )


def test_progressive_equals_baseline_gray():
    g = (np.mgrid[0:24, 0:33][0] * 7 % 256).astype(np.uint8)
    want = decode_baseline_jpeg(encode_baseline_jpeg(g, quant=2))
    got = decode_baseline_jpeg(encode_progressive_jpeg(g, quant=2))
    assert (got == want).all()


def test_progressive_equals_baseline_color_444():
    img = _img()
    want = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=2))
    jp = encode_progressive_jpeg(img, quant=2)
    got = decode_baseline_jpeg(jp)
    assert (got == want).all()
    assert jpeg_dims(jp) == (45, 37, 3)


def test_progressive_equals_baseline_color_420():
    img = _img(35, 43)  # odd dims: MCU padding + chroma ceil dims
    want = decode_baseline_jpeg(
        encode_baseline_jpeg(img, quant=2, subsampling="420")
    )
    got = decode_baseline_jpeg(
        encode_progressive_jpeg(img, quant=2, subsampling="420")
    )
    assert (got == want).all()


def test_progressive_restart_markers():
    img = _img(21, 29)
    want = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=2))
    got = decode_baseline_jpeg(
        encode_progressive_jpeg(img, quant=2, restart_interval=3)
    )
    assert (got == want).all()


def test_progressive_eobrun_spanning_blocks():
    """A nearly-flat image makes most AC bands all-zero, so the encoder
    accumulates multi-block EOB runs (EOBn with n > 0) and the decoder
    must skip + correction-bit its way through them."""
    img = np.full((48, 64), 128, dtype=np.uint8)
    img[10, 10] = 140  # one lonely AC feature
    want = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=1))
    got = decode_baseline_jpeg(encode_progressive_jpeg(img, quant=1))
    assert (got == want).all()


def test_progressive_custom_scan_script():
    """A pathological but legal script: one-coefficient bands, deep
    successive approximation on the low band."""
    img = _img(16, 16)
    scans = [
        ([0, 1, 2], 0, 0, 0, 2),
        ([0, 1, 2], 0, 0, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([0], 1, 1, 0, 0),
        ([0], 2, 9, 0, 1),
        ([0], 10, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
        ([0], 2, 9, 1, 0),
    ]
    want = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=2))
    got = decode_baseline_jpeg(encode_progressive_jpeg(img, quant=2,
                                                       scans=scans))
    assert (got == want).all()


def test_progressive_random_images_property():
    rng = np.random.RandomState(3)
    for trial in range(4):
        h = int(rng.randint(8, 40))
        w = int(rng.randint(8, 40))
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        want = decode_baseline_jpeg(encode_baseline_jpeg(img, quant=4))
        got = decode_baseline_jpeg(encode_progressive_jpeg(img, quant=4))
        assert (got == want).all(), (h, w, trial)


def test_arithmetic_and_differential_still_rejected():
    # r12: SOF3 lossless AND hierarchical DHP/SOF5/SOF7 now DECODE
    # (test_jpeg_lossless.py / test_jpeg_hierarchical.py); arithmetic
    # frames remain loud NotImplementedErrors, and an orphaned
    # differential frame outside a hierarchical stream is a malformed-
    # stream ValueError
    img = _img(16, 16)
    data = bytearray(encode_baseline_jpeg(img, quant=2))
    i = bytes(data).index(b"\xff\xc0")
    for sof in (0xC9, 0xCB):  # arith sequential / arith lossless
        data[i + 1] = sof
        with pytest.raises(NotImplementedError):
            decode_baseline_jpeg(bytes(data))
    data[i + 1] = 0xC5  # differential sequential, no DHP
    with pytest.raises(ValueError, match="outside a hierarchical"):
        decode_baseline_jpeg(bytes(data))


def test_progressive_through_multimodal_path(spark):
    """The multimodal Spark stages consume progressive bytes like any
    other decodable format — the r10 'progressive files null out'
    real-world gap is closed."""
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.multimodal import (
        decode_image_features,
        dhash_images,
    )

    img = _img()
    rows = [
        (1, bytearray(encode_progressive_jpeg(img, quant=2))),
        (2, bytearray(encode_baseline_jpeg(img, quant=2))),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    feats = {r.media_id: r for r in decode_image_features(df).collect()}
    assert (feats[1].width, feats[1].height, feats[1].channels) == (45, 37, 3)
    dh = {r.media_id: (r.dh_hi, r.dh_lo) for r in dhash_images(df).collect()}
    assert dh[1][0] is not None
    # same scene, two codec paths: identical coefficients -> identical hash
    assert dh[1] == dh[2]
