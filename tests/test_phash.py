"""DCT pHash: integer-exact hashing, low-pass robustness, radius-
generalized pigeonhole blocking equals brute force."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
    hamming_near_dup_pairs_chunked,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.multimodal import (
    _phash_one,
)


def _ppm(pix: np.ndarray) -> bytes:
    h, w = pix.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + pix.astype(np.uint8).tobytes()


def _base_img(seed=7, w=128, h=128):
    rng = np.random.RandomState(seed)
    # smooth scene: low-frequency gradient + mild texture
    y, x = np.mgrid[0:h, 0:w]
    base = np.minimum(x + y, 217) + rng.randint(0, 10, (h, w))
    return np.stack([base, base + 10, base // 2], axis=2).clip(0, 255)


def _alt_img(seed=1, w=128, h=128):
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = np.minimum((w - 1 - x) * 2 + y * y // 64, 230) + rng.randint(0, 10, (h, w))
    return np.stack([base, base // 3, base], axis=2).clip(0, 255)


def _ham(a, b):
    return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")


def test_phash_survives_sparse_noise_and_brightness(spark):
    img = _base_img()
    h0 = _phash_one(_ppm(img))
    # salt noise: 20 extreme pixels of 16384 barely move the pooled
    # spectrum
    noisy = img.copy()
    idx = np.random.RandomState(0).randint(0, 128, (20, 2))
    for r, c in idx:
        noisy[r, c] = 255
    assert _ham(h0, _phash_one(_ppm(noisy))) <= 8
    # uniform brightness shift only moves the DC coefficient, which the
    # AC-median hash ignores entirely
    assert _ham(h0, _phash_one(_ppm((img + 20).clip(0, 255)))) <= 2
    # the SAME scene re-rendered with different fine noise is
    # perceptually identical -> near
    assert _ham(h0, _phash_one(_ppm(_base_img(seed=99)))) <= 8
    # a genuinely different scene is far away
    assert _ham(h0, _phash_one(_ppm(_alt_img()))) >= 14


def test_phash_rejects_undecodable_and_tiny(spark):
    assert _phash_one(b"not an image") == (None, None)
    assert _phash_one(_ppm(np.zeros((4, 4, 3)))) == (None, None)


def test_chunked_blocking_equals_brute_force(spark):
    rng = np.random.RandomState(3)
    vals = [int(v) for v in rng.randint(0, 1 << 62, 40, dtype=np.int64)]
    # plant near pairs at several radii
    vals[1] = vals[0] ^ 0b1
    vals[3] = vals[2] ^ (0xFF << 20)  # 8 bits apart
    vals[5] = vals[4] ^ (0x1FF << 9)  # 9 bits: beyond radius
    df = spark.createDataFrame(
        [Row(media_id=i, ph=v) for i, v in enumerate(vals)]
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_near_dup_pairs_chunked(
            df, max_hamming=8, max_bucket_size=None
        ).collect()
    }
    want = set()
    for i in range(40):
        for j in range(i + 1, 40):
            d = bin(vals[i] ^ vals[j]).count("1")
            if d <= 8:
                want.add((i, j, d))
    assert got == want
    assert (2, 3, 8) in got and not any(a == 4 and b == 5 for a, b, _ in got)


def test_phash_null_rows_excluded_from_blocking(spark):
    df = spark.createDataFrame(
        [Row(media_id=0, ph=5), Row(media_id=1, ph=None), Row(media_id=2, ph=5)]
    )
    got = hamming_near_dup_pairs_chunked(df, max_bucket_size=None).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(0, 2)]
