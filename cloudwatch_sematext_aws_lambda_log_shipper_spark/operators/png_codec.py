"""Vendored PNG codec — pure Python + numpy over the PUBLIC W3C/ISO
PNG specification (ISO/IEC 15948: chunk layout, zlib/DEFLATE datastream
via the stdlib zlib, scanline filters 0-4 incl. Paeth prediction) —
the same vendoring discipline as the Avro OCF and baseline-JPEG codecs:
no image library, file-self-describing, loud errors for out-of-scope
features.

Supported: 8-bit-per-sample, color types 0 (grayscale), 2 (RGB) and
6 (RGBA), non-interlaced. Out of scope (raise ValueError): palette
(3), gray+alpha (4), 16-bit samples, Adam7 interlace — documented
spec subsets, exactly like progressive JPEG on the JPEG side.

Decode returns HxWx3 uint8 RGB (grayscale broadcasts; RGBA composites
over black: out = rgb * a / 255, integer arithmetic — deterministic).
Encode writes color type 2, filter 0 scanlines.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def png_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from IHDR without decompressing, or None."""
    if not is_png(data) or len(data) < 24:
        return None
    if data[12:16] != b"IHDR":
        return None
    w, h = struct.unpack_from(">II", data, 16)
    return w, h


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes):
    """bytes -> HxWx3 uint8 RGB ndarray. ValueError for non-PNG bytes
    or spec features outside the supported subset."""
    import numpy as np

    if not is_png(data):
        raise ValueError("not a PNG datastream (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        elif ctype == b"PLTE":
            raise ValueError("palette PNG (color type 3) unsupported")
        pos += 12 + length  # length + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8:
        raise ValueError(f"bit depth {bit_depth} unsupported (8 only)")
    if interlace:
        raise ValueError("Adam7 interlace unsupported")
    nch = {0: 1, 2: 3, 6: 4}.get(color_type)
    if nch is None:
        raise ValueError(f"color type {color_type} unsupported")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(nch, stride):
                cur[x] = (cur[x] + cur[x - nch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - nch] if x >= nch else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - nch]) if x >= nch else 0
                ul = int(prev[x - nch]) if x >= nch else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, nch)
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 2:
        return px
    # RGBA: composite over black in exact integer arithmetic
    rgb = px[:, :, :3].astype(np.int64)
    a = px[:, :, 3:4].astype(np.int64)
    return ((rgb * a) // 255).astype(np.uint8)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def encode_png(rgb) -> bytes:
    """HxWx3 uint8 ndarray -> PNG bytes (color type 2, 8-bit, filter 0,
    one IDAT)."""
    import numpy as np

    px = np.asarray(rgb, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_png expects HxWx3 uint8")
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(px[y].tobytes())
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )
