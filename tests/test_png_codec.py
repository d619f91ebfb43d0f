"""Vendored PNG codec: round-trip identity, all five scanline filters,
grayscale/RGBA handling, spec-subset rejections, and perceptual-hash
format invariance (PNG of the same pixels hashes identically to PPM)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.png_codec import (
    _chunk,
    _SIG,
    decode_png,
    encode_png,
    is_png,
    png_dims,
)


def _img(seed=3, w=20, h=14):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


def test_round_trip_identity():
    img = _img()
    data = encode_png(img)
    assert is_png(data) and png_dims(data) == (20, 14)
    out = decode_png(data)
    assert np.array_equal(out, img)


def _png_with_filters(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-build a PNG whose row y uses filter ftypes[y] — exercises
    the decoder against independently-computed filtered bytes."""
    h, w, nch = px.shape
    stride = w * nch
    flat = px.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    for y in range(h):
        cur = flat[y]
        ft = ftypes[y % len(ftypes)]
        raw.append(ft)
        for x in range(stride):
            left = int(cur[x - nch]) if x >= nch else 0
            up = int(prev[x])
            ul = int(prev[x - nch]) if x >= nch else 0
            if ft == 0:
                v = cur[x]
            elif ft == 1:
                v = cur[x] - left
            elif ft == 2:
                v = cur[x] - up
            elif ft == 3:
                v = cur[x] - ((left + up) >> 1)
            else:
                v = cur[x] - paeth(left, up, ul)
            raw.append(int(v) & 0xFF)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_all_five_filters_decode():
    img = _img(seed=9, w=11, h=10)
    data = _png_with_filters(img, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), img)


def test_grayscale_and_rgba():
    g = np.random.RandomState(1).randint(0, 256, (6, 7, 1)).astype(np.uint8)
    stride = 7
    raw = bytearray()
    for y in range(6):
        raw.append(0)
        raw.extend(g[y].tobytes())
    data = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert np.array_equal(out, np.repeat(g, 3, axis=2))
    # RGBA composites over black: alpha 255 keeps, alpha 0 zeroes
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[..., :3] = 200
    rgba[0, 0, 3], rgba[1, 1, 3] = 255, 0
    rgba[0, 1, 3], rgba[1, 0, 3] = 128, 128
    raw = bytearray()
    for y in range(2):
        raw.append(0)
        raw.extend(rgba[y].tobytes())
    data = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out[0, 0].tolist() == [200, 200, 200]
    assert out[1, 1].tolist() == [0, 0, 0]
    assert out[0, 1].tolist() == [100, 100, 100]  # 200*128//255


def test_spec_subset_rejections():
    with pytest.raises(ValueError):
        decode_png(b"not png at all")
    img = _img(w=4, h=4)
    data = bytearray(encode_png(img))
    # flip bit depth to 16 inside IHDR (offset 24 = 8 sig + 8 hdr + 8 w/h)
    data[24] = 16
    with pytest.raises(ValueError):
        decode_png(bytes(data))
    data = bytearray(encode_png(img))
    data[28] = 1  # IHDR interlace flag (sig 8 + len/type 8 + w/h 8 + 4)
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_perceptual_hashes_format_invariant():
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.multimodal import (
        _dhash_one,
        _phash_one,
    )

    img = _img(seed=5, w=32, h=24)
    ppm = f"P6\n32 24\n255\n".encode() + img.tobytes()
    png = encode_png(img)
    assert _dhash_one(ppm) == _dhash_one(png) != (None, None)
    assert _phash_one(ppm) == _phash_one(png) != (None, None)


def test_decode_image_features_reports_png_dims(spark):
    from pyspark.sql import Row

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.multimodal import (
        decode_image_features,
    )

    png = encode_png(_img(seed=2, w=33, h=21))
    df = spark.createDataFrame([Row(media_id=1, media=bytearray(png))])
    r = decode_image_features(df).collect()[0]
    assert (r.width, r.height, r.channels) == (33, 21, 3)


def test_resize_handles_png(spark):
    from pyspark.sql import Row

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.multimodal import (
        resize_images,
    )

    img = _img(seed=8, w=40, h=30)
    df = spark.createDataFrame(
        [Row(media_id=1, media=bytearray(encode_png(img))),
         Row(media_id=2, media=bytearray(b"garbage"))]
    )
    out = {r.media_id: r for r in resize_images(df, width=10, height=6).collect()}
    assert out[1].media is not None and out[1].width == 10
    # output is P6 with nearest-neighbor gathered pixels
    body = bytes(out[1].media)
    assert body.startswith(b"P6\n10 6\n255\n")
    px = np.frombuffer(body, dtype=np.uint8, count=180,
                       offset=len(b"P6\n10 6\n255\n")).reshape(6, 10, 3)
    ri = (np.arange(6) * 30) // 6
    ci = (np.arange(10) * 40) // 10
    assert np.array_equal(px, img[ri][:, ci])
    assert out[2].media is None  # undecodable routes null (Q4 philosophy)
