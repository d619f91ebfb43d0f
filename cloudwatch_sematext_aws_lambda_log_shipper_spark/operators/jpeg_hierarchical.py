"""Hierarchical JPEG (ITU-T T.81 Annex J / §4.6, markers DHP + EXP,
differential frames SOF5 / SOF7).

A hierarchical stream is a pyramid: one non-differential base frame at
reduced resolution, then differential frames that code the residual
against the (optionally 2x-upsampled) reference built from the frames
before them. This module implements decode AND encode for the
sequential-DCT and lossless frame processes:

- base frame: SOF0/SOF1 (sequential DCT, Huffman) or SOF3 (lossless);
- reference expansion: EXP marker (0xDF) — 2x per axis with the
  J.1.1.2 interpolation ``(Ra + Rb + 1) >> 1`` (odd output samples),
  edge-replicated, cropped to the next frame's declared dims;
- differential frames: SOF5 (differential sequential DCT — residual
  blocks, NO level shift per A.3.1, DC prediction fixed at zero in
  differential frames per F.1.1.5.1) and SOF7 (differential lossless —
  per-sample (SSSS, magnitude-bits) diffs added to the reference
  mod 2^16, H.1.2 with the reference as the prediction);
- with a final SOF7 stage the whole pyramid is LOSSLESS:
  decode(encode_hierarchical_jpeg(img)) == img bit-for-bit (pinned in
  tests/test_jpeg_hierarchical.py).

Color convention: DCT JPEG carries YCbCr by JFIF convention, but a
lossless-final hierarchical pyramid must reproduce the input samples
exactly, so the encoder stores components AS-IS (RGB or gray) and
marks color streams with the Adobe APP14 ``transform = 0`` flag
(ITU-T T.872 §6.5.3 / Adobe TN5116) — the decoder honors it; absent
APP14, 3-component streams fall back to the YCbCr interpretation.

- PROGRESSIVE frames (r13): differential SOF6 — the residual
  coefficients arrive over MULTIPLE scans, spectral selection and
  successive approximation exactly as Annex G defines them (the AC
  scan machinery is shared with jpeg_baseline), with the one Annex-J
  difference that DC coefficients carry no cross-block prediction
  (PRED = 0 per F.1.1.5.1, same rule as SOF5) — and non-differential
  SOF2 as the pyramid's BASE frame (full G.1.2.1 DC prediction,
  +128 level shift at reconstruction). A frame's accumulated
  coefficient arrays reconstruct when the next marker-level event
  ends the frame; differential frames add to the reference,
  non-differential frames become it.

All arithmetic-coded frames (SOF9-15) stay loud NotImplementedErrors
in decode_baseline_jpeg's marker walk.

Reference comparison: the reference repo (shipper.js) has no media
path at all — this exists for the multimodal ingest brief
(multimodal_jpeg_hierarchical query).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg_baseline import (
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _block_at,
    _build_decode_table,
    _build_encode_table,
    _extend,
    _fdct2,
    _fixed_table,
    _idct2,
    _mag_bits,
)

_SEQ_SOFS = (0xC0, 0xC1)  # non-differential sequential DCT
_PROG_SOF = 0xC2  # non-differential progressive (base frame, r13)
_DIFF_SEQ_SOF = 0xC5
_DIFF_PROG_SOF = 0xC6  # differential progressive DCT (r13)
_DIFF_LOSSLESS_SOF = 0xC7
_LOSSLESS_SOF = 0xC3


def _expand_axis(plane: np.ndarray, axis: int, out_len: int) -> np.ndarray:
    """J.1.1.2 1-D 2x interpolation along ``axis``: even outputs copy
    the reference, odd outputs are (Ra + Rb + 1) >> 1 with the edge
    replicated, cropped/validated to ``out_len``."""
    p = np.moveaxis(plane, axis, 0).astype(np.int64)
    n = p.shape[0]
    nxt = p[np.minimum(np.arange(n) + 1, n - 1)]
    out = np.empty((2 * n,) + p.shape[1:], dtype=np.int64)
    out[0::2] = p
    out[1::2] = (p + nxt + 1) >> 1
    if not 2 * n - 1 <= out_len <= 2 * n:
        raise ValueError(
            f"EXP: frame axis length {out_len} not reachable from {n}"
        )
    return np.moveaxis(out[:out_len], 0, axis)


def _expand(plane: np.ndarray, eh: int, ev: int, out_h: int,
            out_w: int) -> np.ndarray:
    if ev:
        plane = _expand_axis(plane, 0, out_h)
    elif plane.shape[0] != out_h:
        raise ValueError("differential frame height mismatch")
    if eh:
        plane = _expand_axis(plane, 1, out_w)
    elif plane.shape[1] != out_w:
        raise ValueError("differential frame width mismatch")
    return plane


def _entropy_end(data: bytes, pos: int) -> int:
    """First position of a non-RST, non-stuffed marker after ``pos``."""
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] != 0x00 and not (
            0xD0 <= data[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return len(data)


def _decode_dct_frame_scan(
    data, pos, fh, fw, scan, qt, huff_dc, huff_ac, dri, differential
):
    """Sequential-DCT scan into per-component INTEGER planes. The
    differential variant skips the +128 level shift (A.3.1) and codes
    every DC with PRED = 0 (F.1.1.5.1); rounding to integer is the
    decoder's reconstruction step, clipping is deferred to the caller
    (residuals are signed)."""
    if any(c["h"] != 1 or c["v"] != 1 for c in scan):
        raise NotImplementedError(
            "hierarchical frames with subsampled components unsupported"
        )
    mcux, mcuy = -(-fw // 8), -(-fh // 8)
    planes = [
        np.zeros((mcuy * 8, mcux * 8), dtype=np.int64) for _ in scan
    ]
    preds = [0] * len(scan)
    r = _BitReader(data, pos)
    n_mcu = 0
    shift = 0.0 if differential else 128.0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                r.restart()
                preds = [0] * len(scan)
            n_mcu += 1
            for ci, c in enumerate(scan):
                q = qt[c["tq"]]
                zz = np.zeros(64, dtype=np.int64)
                t = r.huff(huff_dc[c["td"]])
                diff = _extend(r.bits(t), t)
                if differential:
                    zz[0] = diff  # PRED = 0 in differential frames
                else:
                    preds[ci] += diff
                    zz[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = r.huff(huff_ac[c["ta"]])
                    rr, ss = rs >> 4, rs & 0xF
                    if ss == 0:
                        if rr == 15:
                            k += 16
                            continue
                        break
                    k += rr
                    if k > 63:
                        raise ValueError("AC index overflow")
                    zz[k] = _extend(r.bits(ss), ss)
                    k += 1
                blk = np.zeros(64, dtype=np.float64)
                blk[ZIGZAG] = zz * q
                px = np.round(_idct2(blk.reshape(8, 8)) + shift).astype(
                    np.int64
                )
                planes[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = px
    return [p[:fh, :fw] for p in planes]


def _decode_lossless_frame_scan(
    data, pos, fh, fw, scan, huff_dc, dri, refs, differential, sel, pt
):
    """Lossless scan into integer planes. Non-differential: the H.1.2
    spatial predictor (shared _lossless_pred rule via jpeg_baseline).
    Differential: the prediction IS the reference sample (Annex J) and
    Ss is 0 by spec."""
    from .jpeg_baseline import _lossless_pred

    planes = [np.zeros((fh, fw), dtype=np.int64) for _ in scan]
    default = 1 << (8 - pt - 1)
    r = _BitReader(data, pos)
    iy = ix = 0
    n = 0
    for y in range(fh):
        for x in range(fw):
            if dri and n and n % dri == 0:
                r.restart()
                iy, ix = y, x
            n += 1
            for ci, c in enumerate(scan):
                t = r.huff(huff_dc[c["td"]])
                diff = 32768 if t == 16 else _extend(r.bits(t), t)
                if differential:
                    pred = int(refs[ci][y, x]) >> pt
                else:
                    pred = _lossless_pred(
                        planes[ci], y, x, sel, iy, ix, default
                    )
                planes[ci][y, x] = (pred + diff) & 0xFFFF
    return [pl << pt for pl in planes]


def _decode_diff_prog_scan(
    data, pos, frame, scan, ss, se, ah, al, huff_dc, huff_ac, dri
):
    """One progressive SOS (SOF6 differential or SOF2 non-differential
    base frame, r13) into the frame's accumulated coefficient arrays.
    AC scans reuse jpeg_baseline's Annex-G units verbatim (spectral
    bands and successive approximation are identical either way); DC
    scans differ in exactly one way between the two frame kinds:
    differential frames carry no cross-block prediction (F.1.1.5.1),
    so their first scan deposits extend(bits) << Al directly, while
    non-differential frames accumulate the G.1.2.1 per-component
    prediction. Refinement ORs bit Al in both. Returns the byte
    position of the next marker."""
    from .jpeg_baseline import _ac_first_unit, _ac_refine_unit

    differential = frame["differential"]
    mcux, mcuy = -(-frame["w"] // 8), -(-frame["h"] // 8)
    for c in frame["comps"]:
        if "coef" not in c:
            c["coef"] = np.zeros((mcuy, mcux, 64), dtype=np.int64)
    r = _BitReader(data, pos)
    eobrun = 0
    n = 0
    if ss == 0:
        for c in scan:
            c["pred"] = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and n and n % dri == 0:
                    r.restart()
                    for c in scan:
                        c["pred"] = 0
                n += 1
                for c in scan:
                    blk = c["coef"][my, mx]
                    if ah == 0:
                        t = r.huff(huff_dc[c["td"]])
                        d = _extend(r.bits(t), t)
                        if differential:
                            blk[0] = d << al  # PRED = 0 (F.1.1.5.1)
                        else:
                            c["pred"] += d  # G.1.2.1 prediction
                            blk[0] = c["pred"] << al
                    elif r.bits(1):
                        blk[0] |= 1 << al
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        c = scan[0]
        ac = huff_ac[c["ta"]]
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and n and n % dri == 0:
                    r.restart()
                    eobrun = 0
                n += 1
                blk = c["coef"][my, mx]
                if ah == 0:
                    eobrun = _ac_first_unit(r, blk, ss, se, al, ac, eobrun)
                else:
                    eobrun = _ac_refine_unit(r, blk, ss, se, al, ac, eobrun)
    pos = r.pos
    while pos + 1 < len(data):
        if (
            data[pos] == 0xFF
            and data[pos + 1] not in (0x00, 0xFF)
            and not (0xD0 <= data[pos + 1] <= 0xD7)
        ):
            break
        pos += 1
    return pos


def _finish_diff_prog_frame(frame, refs, qt):
    """Reconstruct a completed progressive frame: dequant + IDCT each
    accumulated block. Differential (SOF6): no level shift (A.3.1),
    residual adds to the reference, clip. Non-differential (SOF2 base
    frame, r13): +128 level shift, the planes BECOME the reference.
    Returns the new reference. Dequantization uses the per-component
    tables SNAPSHOTTED at each component's first scan (see the SOS
    handler) — later DQT redefinitions belong to later frames."""
    shift = 0.0 if frame["differential"] else 128.0
    fh, fw = frame["h"], frame["w"]
    snap = frame.get("qt_snapshot", {})
    planes = []
    for c in frame["comps"]:
        q = snap.get(c["tq"], qt[c["tq"]])
        mcuy, mcux = c["coef"].shape[:2]
        plane = np.zeros((mcuy * 8, mcux * 8), dtype=np.int64)
        for my in range(mcuy):
            for mx in range(mcux):
                blk = np.zeros(64, dtype=np.float64)
                blk[ZIGZAG] = c["coef"][my, mx] * q
                plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = np.round(
                    _idct2(blk.reshape(8, 8)) + shift
                ).astype(np.int64)
        planes.append(plane[:fh, :fw])
    if frame["differential"]:
        return [np.clip(r + p, 0, 255) for r, p in zip(refs, planes)]
    return [np.clip(p, 0, 255) for p in planes]


def decode_hierarchical_jpeg(data: bytes) -> np.ndarray:
    """Decode a hierarchical (DHP) JPEG to (h, w, 3) uint8 RGB.
    decode_baseline_jpeg delegates here on seeing the DHP marker."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    dri = 0
    final_h = final_w = 0
    n_comps = 0
    refs: list[np.ndarray] | None = None
    pending_exp: tuple[int, int] | None = None
    adobe_transform: int | None = None
    # current frame state
    frame: dict | None = None

    def _flush_progressive():
        # a SOF6 frame's coefficients accumulate across scans and only
        # reconstruct when the next marker-level event ends the frame
        nonlocal refs, frame
        if (
            frame is not None
            and frame.get("progressive")
            and "coef" in frame["comps"][0]
        ):
            refs = _finish_diff_prog_frame(frame, refs, qt)
            frame = None

    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        m = data[pos + 1]
        pos += 2
        if m == 0xFF:
            pos -= 1
            continue
        if m == 0xD9:
            _flush_progressive()
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if m == 0xDE:  # DHP: final dims + component list (B.3.2)
            final_h, final_w = struct.unpack(">HH", seg[1:5])
            n_comps = seg[5]
        elif m == 0xDF:  # EXP (B.3.3)
            _flush_progressive()
            pending_exp = (seg[0] >> 4, seg[0] & 0xF)
        elif m == 0xDB:
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec == 0:
                    qt[tid] = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    p += 64
                else:
                    qt[tid] = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
        elif m == 0xC4:
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (huff_ac if cls else huff_dc)[tid] = _build_decode_table(
                    bits, vals
                )
                p += 17 + n
        elif m == 0xDD:
            dri = struct.unpack(">H", seg[:2])[0]
        elif m == 0xEE and seg[:5] == b"Adobe":
            adobe_transform = seg[11]
        elif m in _SEQ_SOFS + (
            _LOSSLESS_SOF,
            _PROG_SOF,
            _DIFF_SEQ_SOF,
            _DIFF_PROG_SOF,
            _DIFF_LOSSLESS_SOF,
        ):
            _flush_progressive()
            fh, fw = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, sf, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": sf >> 4, "v": sf & 0xF, "tq": tq}
                )
            frame = {
                "kind": m,
                "h": fh,
                "w": fw,
                "comps": comps,
                "differential": m
                in (_DIFF_SEQ_SOF, _DIFF_PROG_SOF, _DIFF_LOSSLESS_SOF),
                "progressive": m in (_PROG_SOF, _DIFF_PROG_SOF),
                "lossless": m in (_LOSSLESS_SOF, _DIFF_LOSSLESS_SOF),
            }
            if frame["progressive"] and any(
                c["h"] != 1 or c["v"] != 1 for c in comps
            ):
                raise NotImplementedError(
                    "hierarchical frames with subsampled components"
                    " unsupported"
                )
            if frame["differential"]:
                if refs is None:
                    raise ValueError("differential frame before base frame")
                eh, ev = pending_exp if pending_exp else (0, 0)
                refs = [_expand(p, eh, ev, fh, fw) for p in refs]
                pending_exp = None
        elif m in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported frame 0xFF{m:02X} inside a hierarchical"
                " stream (arithmetic-coded frames)"
            )
        elif m == 0xDA:
            if frame is None:
                raise ValueError("SOS before any frame header")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                comp["td"], comp["ta"] = tables >> 4, tables & 0xF
                scan.append(comp)
            ss = seg[1 + 2 * ns]
            se = seg[2 + 2 * ns]
            ah = seg[3 + 2 * ns] >> 4
            pt = seg[3 + 2 * ns] & 0xF  # Al in DCT scans, Pt in lossless
            spos = pos + seglen
            if frame.get("progressive"):
                # snapshot each scanned component's quant table at ITS
                # first scan: a progressive frame reconstructs only
                # when the frame ENDS, so without the snapshot a
                # T.81-legal DQT between this frame's last scan and
                # the next SOF would retroactively requantize it,
                # while flushing on DQT instead would truncate frames
                # whose scans are interleaved with table definitions
                # (both r13 review findings — the snapshot fixes both)
                snap = frame.setdefault("qt_snapshot", {})
                for c in scan:
                    if c["tq"] not in snap:
                        snap[c["tq"]] = qt[c["tq"]].copy()
                pos = _decode_diff_prog_scan(
                    data, spos, frame, scan, ss, se, ah, pt,
                    huff_dc, huff_ac, dri,
                )
                continue
            if frame["lossless"]:
                planes = _decode_lossless_frame_scan(
                    data, spos, frame["h"], frame["w"], scan, huff_dc,
                    dri, refs, frame["differential"], ss, pt,
                )
                # lossless planes already hold the frame's sample
                # values: the spatial-predictor reconstruction
                # (non-differential) or (ref + diff) mod 2^16
                # (differential) — either way they ARE the new
                # reference
                refs = planes
            else:
                planes = _decode_dct_frame_scan(
                    data, spos, frame["h"], frame["w"], scan, qt,
                    huff_dc, huff_ac, dri, frame["differential"],
                )
                if frame["differential"]:
                    refs = [
                        np.clip(r + p, 0, 255)
                        for r, p in zip(refs, planes)
                    ]
                else:
                    refs = [np.clip(p, 0, 255) for p in planes]
            pos = _entropy_end(data, spos)
            continue
        pos += seglen

    # a stream truncated before EOI (ADVICE r13): the final progressive
    # frame's accumulated coefficients would otherwise silently drop and
    # the decoder would return the PRE-frame reference planes — flush
    # here so every fully-scanned frame reconstructs regardless of
    # whether the EOI marker survived
    _flush_progressive()

    if refs is None or not final_h:
        raise ValueError("hierarchical stream without frames")
    if refs[0].shape != (final_h, final_w):
        raise ValueError("final reference does not match DHP dimensions")
    if n_comps and len(refs) != n_comps:
        raise ValueError("component count mismatch vs DHP")
    planes = [np.clip(p, 0, 255) for p in refs]
    if len(planes) == 1:
        g = planes[0].astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    if len(planes) == 3:
        if adobe_transform == 0:
            return np.stack(planes, axis=2).astype(np.uint8)
        y = planes[0].astype(np.float64)
        cb = planes[1].astype(np.float64) - 128.0
        cr = planes[2].astype(np.float64) - 128.0
        rgb = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=2,
        )
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise NotImplementedError(f"{len(planes)}-component hierarchical JPEG")


# --- encoder --------------------------------------------------------------


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """Encoder-side 2x downsample (T.81 leaves the downsampling filter
    to the encoder, J.1.1.1 note): 2x2 mean, round half up, edges
    replicated to even dims."""
    p = plane.astype(np.int64)
    if p.shape[0] % 2:
        p = np.vstack([p, p[-1:]])
    if p.shape[1] % 2:
        p = np.hstack([p, p[:, -1:]])
    return (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2]
            + p[1::2, 1::2] + 2) >> 2


def _emit_seg(out: bytearray, marker: int, payload: bytes) -> None:
    out.extend(bytes([0xFF, marker]))
    out.extend(struct.pack(">H", len(payload) + 2))
    out.extend(payload)


def _sof_payload(fh: int, fw: int, nc: int) -> bytes:
    sof = bytes([8]) + struct.pack(">HH", fh, fw) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0])
    return sof


def _encode_dct_frame(
    out: bytearray, planes: list[np.ndarray], quant: int, differential: bool
) -> list[np.ndarray]:
    """Emit one sequential-DCT frame (SOF0 or SOF5) for 1x1-sampled
    integer planes and return the DECODER-RECONSTRUCTED planes (the
    encoder models the decoder bit-for-bit so later differential
    stages correct true error). Residual coefficients can exceed the
    example tables' ranges, so the frame carries self-describing
    fixed tables sized from the actual symbols (like the lossless
    path)."""
    fh, fw = planes[0].shape
    nc = len(planes)
    qzz = np.full(64, quant, dtype=np.int64)
    qmat = np.zeros(64, dtype=np.int64)
    qmat[ZIGZAG] = qzz
    qmat = qmat.reshape(8, 8)
    shift = 0.0 if differential else 128.0

    # pass 1: coefficients + decoder reconstruction
    mcux, mcuy = -(-fw // 8), -(-fh // 8)
    blocks: list[list[np.ndarray]] = [[] for _ in planes]
    recon = [
        np.zeros((mcuy * 8, mcux * 8), dtype=np.int64) for _ in planes
    ]
    for ci, plane in enumerate(planes):
        pf = plane.astype(np.float64)
        for my in range(mcuy):
            for mx in range(mcux):
                blk = _block_at(pf, my * 8, mx * 8)
                coef = _fdct2(blk - shift)
                zz = (
                    np.round(coef / qmat).astype(np.int64).reshape(64)[ZIGZAG]
                )
                blocks[ci].append(zz)
                deq = np.zeros(64, dtype=np.float64)
                deq[ZIGZAG] = zz * qzz
                px = np.round(_idct2(deq.reshape(8, 8)) + shift).astype(
                    np.int64
                )
                recon[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = px
    recon = [r[:fh, :fw] for r in recon]

    # self-describing tables over the symbols actually used
    dc_cats: set[int] = set()
    ac_syms: set[int] = {0x00, 0xF0}
    for ci in range(nc):
        pred = 0
        for zz in blocks[ci]:
            d = int(zz[0]) if differential else int(zz[0]) - pred
            if not differential:
                pred = int(zz[0])
            dc_cats.add(_mag_bits(d)[0])
            run = 0
            last = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    run -= 16
                t = _mag_bits(int(zz[k]))[0]
                ac_syms.add((min(run, 15) << 4) | t)
                run = 0
    dbits, dvals = _fixed_table(sorted(dc_cats))
    abits, avals = _fixed_table(sorted(ac_syms))
    enc_dc = _build_encode_table(dbits, dvals)
    enc_ac = _build_encode_table(abits, avals)

    _emit_seg(out, 0xDB, bytes([0]) + bytes(int(x) for x in qzz))
    _emit_seg(out, 0xC5 if differential else 0xC0, _sof_payload(fh, fw, nc))
    _emit_seg(out, 0xC4, bytes([0x00]) + bytes(dbits) + bytes(dvals))
    _emit_seg(out, 0xC4, bytes([0x10]) + bytes(abits) + bytes(avals))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    _emit_seg(out, 0xDA, sos)

    bw = _BitWriter()
    preds = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                zz = blocks[ci][my * mcux + mx]
                if differential:
                    d = int(zz[0])  # PRED = 0 (F.1.1.5.1)
                else:
                    d = int(zz[0]) - preds[ci]
                    preds[ci] = int(zz[0])
                t, code = _mag_bits(d)
                ln, cd = enc_dc[t]
                bw.bits(cd, ln)
                bw.bits(code, t)
                run = 0
                last = max((k for k in range(1, 64) if zz[k]), default=0)
                for k in range(1, last + 1):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, cd = enc_ac[0xF0]
                        bw.bits(cd, ln)
                        run -= 16
                    t, code = _mag_bits(int(zz[k]))
                    ln, cd = enc_ac[(run << 4) | t]
                    bw.bits(cd, ln)
                    bw.bits(code, t)
                    run = 0
                if last < 63:
                    ln, cd = enc_ac[0x00]
                    bw.bits(cd, ln)
    bw.flush()
    out.extend(bw.out)
    return recon


def _encode_diff_prog_frame(
    out: bytearray, planes: list[np.ndarray], quant: int,
    differential: bool = True,
) -> list[np.ndarray]:
    """Emit one progressive frame — SOF6 (differential, over RESIDUAL
    planes) or SOF2 (non-differential base frame, r13) — for
    1x1-sampled integer planes and return the decoder-reconstructed
    planes. The scan script exercises both Annex-G mechanisms:

      1. DC first scan, Al=1 (all components interleaved; PRED = 0 in
         differential frames, the G.1.2.1 per-component prediction
         chain over hi = v >> 1 otherwise);
      2. DC refinement scan, Ah=1 -> Al=0 (one bit per block);
      3. per component: AC first scan Ss=1..5, then Ss=6..63 (spectral
         selection), both Al=0.

    Coefficients and the decoder model are identical to
    _encode_dct_frame's — only the scan packaging differs, so the
    reconstructed planes (and therefore the lossless pyramid guarantee
    when a SOF7 frame follows) are unchanged."""
    fh, fw = planes[0].shape
    nc = len(planes)
    qzz = np.full(64, quant, dtype=np.int64)
    qmat = np.zeros(64, dtype=np.int64)
    qmat[ZIGZAG] = qzz
    qmat = qmat.reshape(8, 8)
    shift = 0.0 if differential else 128.0

    mcux, mcuy = -(-fw // 8), -(-fh // 8)
    blocks: list[list[np.ndarray]] = [[] for _ in planes]
    recon = [
        np.zeros((mcuy * 8, mcux * 8), dtype=np.int64) for _ in planes
    ]
    for ci, plane in enumerate(planes):
        pf = plane.astype(np.float64)
        for my in range(mcuy):
            for mx in range(mcux):
                blk = _block_at(pf, my * 8, mx * 8)
                coef = _fdct2(blk - shift)
                zz = (
                    np.round(coef / qmat).astype(np.int64).reshape(64)[ZIGZAG]
                )
                blocks[ci].append(zz)
                deq = np.zeros(64, dtype=np.float64)
                deq[ZIGZAG] = zz * qzz
                recon[ci][
                    my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8
                ] = np.round(_idct2(deq.reshape(8, 8)) + shift).astype(
                    np.int64
                )
    recon = [r[:fh, :fw] for r in recon]

    # self-describing tables: DC categories of the Al=1 first-scan
    # symbols (ARITHMETIC shift — the decoder reconstructs
    # (hi << 1) | low_bit in two's complement, so hi = floor(v/2) and
    # the refinement bit is v & 1, for negatives too; non-differential
    # frames code the per-component DIFFS of that hi chain), AC
    # run/size symbols per band
    dc_cats: set[int] = set()
    for bl in blocks:
        pred = 0
        for zz in bl:
            hi = int(zz[0]) >> 1
            dc_cats.add(_mag_bits(hi if differential else hi - pred)[0])
            pred = hi
    ac_syms: set[int] = {0x00, 0xF0}
    for bl in blocks:
        for zz in bl:
            for lo, hi in ((1, 5), (6, 63)):
                run = 0
                last = max(
                    (k for k in range(lo, hi + 1) if zz[k]), default=0
                )
                for k in range(lo, last + 1):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        run -= 16
                    ac_syms.add((min(run, 15) << 4) | _mag_bits(int(zz[k]))[0])
                    run = 0
    dbits, dvals = _fixed_table(sorted(dc_cats))
    abits, avals = _fixed_table(sorted(ac_syms))
    enc_dc = _build_encode_table(dbits, dvals)
    enc_ac = _build_encode_table(abits, avals)

    _emit_seg(out, 0xDB, bytes([0]) + bytes(int(x) for x in qzz))
    _emit_seg(out, _DIFF_PROG_SOF if differential else _PROG_SOF,
              _sof_payload(fh, fw, nc))
    _emit_seg(out, 0xC4, bytes([0x00]) + bytes(dbits) + bytes(dvals))
    _emit_seg(out, 0xC4, bytes([0x10]) + bytes(abits) + bytes(avals))

    def sos_header(comp_ids, ss, se, ah, al, ac_table):
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, (0x00 << 4) | ac_table])
        sos += bytes([ss, se, (ah << 4) | al])
        _emit_seg(out, 0xDA, sos)

    # scan 1: DC first, Al=1, interleaved (PRED = 0 differential,
    # G.1.2.1 prediction chain otherwise)
    sos_header(list(range(1, nc + 1)), 0, 0, 0, 1, 0)
    bw = _BitWriter()
    preds = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                v = int(blocks[ci][my * mcux + mx][0])
                hi = v >> 1  # arithmetic shift (see table note above)
                d = hi if differential else hi - preds[ci]
                preds[ci] = hi
                t, code = _mag_bits(d)
                ln, cd = enc_dc[t]
                bw.bits(cd, ln)
                bw.bits(code, t)
    bw.flush()
    out.extend(bw.out)

    # scan 2: DC refinement, Ah=1 Al=0 — the dropped low bit per block
    sos_header(list(range(1, nc + 1)), 0, 0, 1, 0, 0)
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                v = int(blocks[ci][my * mcux + mx][0])
                bw.bits(v & 1, 1)
    bw.flush()
    out.extend(bw.out)

    # scans 3+: AC spectral-selection bands per component, Al=0.
    # Per-block EOB (no EOB runs) keeps the writer simple; the decoder
    # handles both (EOB0 == eobrun 1).
    for ci in range(nc):
        for lo, hi in ((1, 5), (6, 63)):
            sos_header([ci + 1], lo, hi, 0, 0, 0)
            bw = _BitWriter()
            for zz in blocks[ci]:
                run = 0
                last = max(
                    (k for k in range(lo, hi + 1) if zz[k]), default=0
                )
                for k in range(lo, last + 1):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, cd = enc_ac[0xF0]
                        bw.bits(cd, ln)
                        run -= 16
                    t, code = _mag_bits(int(zz[k]))
                    ln, cd = enc_ac[(run << 4) | t]
                    bw.bits(cd, ln)
                    bw.bits(code, t)
                    run = 0
                if last < hi:
                    ln, cd = enc_ac[0x00]  # EOB0
                    bw.bits(cd, ln)
            bw.flush()
            out.extend(bw.out)
    return recon


def _encode_diff_lossless_frame(
    out: bytearray, targets: list[np.ndarray], refs: list[np.ndarray]
) -> None:
    """Emit one SOF7 frame: per-sample diffs (target - ref) mod 2^16,
    coded as (SSSS, magnitude-bits) with a self-describing table —
    after this frame the decoder's reference equals ``targets``
    exactly."""
    fh, fw = targets[0].shape
    nc = len(targets)
    diffs: list[np.ndarray] = []
    for t, r in zip(targets, refs):
        d = (t.astype(np.int64) - r.astype(np.int64)) % 65536
        d = np.where(d > 32768, d - 65536, d)  # symmetric remainder
        diffs.append(d)
    cats = sorted(
        {
            (16 if v == 32768 else _mag_bits(int(v))[0])
            for d in diffs
            for v in np.unique(d)
        }
    )
    bits, vals = _fixed_table(cats)
    enc = _build_encode_table(bits, vals)
    _emit_seg(out, _DIFF_LOSSLESS_SOF, _sof_payload(fh, fw, nc))
    _emit_seg(out, 0xC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 0, 0])  # Ss = 0 in differential frames
    _emit_seg(out, 0xDA, sos)
    bw = _BitWriter()
    for y in range(fh):
        for x in range(fw):
            for d in diffs:
                v = int(d[y, x])
                if v == 32768:
                    t, code = 16, 0
                else:
                    t, code = _mag_bits(v)
                ln, cd = enc[t]
                bw.bits(cd, ln)
                if t and t != 16:
                    bw.bits(code, t)
    bw.flush()
    out.extend(bw.out)


def encode_hierarchical_jpeg(
    img: np.ndarray,
    levels: int = 2,
    quant: int = 8,
    final_lossless: bool = True,
    progressive_diff: bool = False,
    progressive_base: bool = False,
) -> bytes:
    """Encode (h, w) gray / (h, w, 3) RGB uint8 as a hierarchical JPEG:
    a SOF0 base frame at 1/2^(levels-1) resolution, then per level an
    EXP marker + a differential frame (SOF5 DCT residual; the LAST one
    SOF7 lossless when ``final_lossless``, making the whole pyramid
    bit-exact). Components are stored without color transform (APP14
    transform=0 on color streams) so lossless means lossless in the
    input samples.

    ``progressive_diff`` (r13): code the differential DCT stages as
    SOF6 (differential PROGRESSIVE) frames — multi-scan spectral
    selection + DC successive approximation — instead of SOF5.
    ``progressive_base`` (r13): code the BASE frame as SOF2
    (non-differential progressive) instead of SOF0. In both cases the
    coefficients and the modeled decoder reconstruction are identical,
    only the scan packaging changes, so the final_lossless pyramid
    stays bit-exact with SOF2/SOF6 stages inside (pinned in
    tests/test_jpeg_hierarchical.py)."""
    img = np.asarray(img)
    if levels < 1:
        raise ValueError("levels must be >= 1")
    gray = img.ndim == 2
    planes = (
        [img.astype(np.int64)]
        if gray
        else [img[:, :, i].astype(np.int64) for i in range(3)]
    )
    pyramid = [planes]
    for _ in range(levels - 1):
        pyramid.append([_downsample2(p) for p in pyramid[-1]])
    pyramid.reverse()  # smallest first

    out = bytearray(b"\xff\xd8")
    if not gray:
        _emit_seg(
            out, 0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0])
        )  # version 100, flags 0, transform 0 (T.872 6.5.3)
    fh, fw = planes[0].shape
    _emit_seg(out, 0xDE, _sof_payload(fh, fw, len(planes)))  # DHP

    if progressive_base:
        refs = _encode_diff_prog_frame(
            out, pyramid[0], quant, differential=False
        )
    else:
        refs = _encode_dct_frame(out, pyramid[0], quant,
                                 differential=False)
    refs = [np.clip(r, 0, 255) for r in refs]
    for li in range(1, len(pyramid)):
        target = pyramid[li]
        th, tw = target[0].shape
        eh = 1 if tw > refs[0].shape[1] else 0
        ev = 1 if th > refs[0].shape[0] else 0
        if eh or ev:
            _emit_seg(out, 0xDF, bytes([(eh << 4) | ev]))
            refs = [_expand(r, eh, ev, th, tw) for r in refs]
        last = li == len(pyramid) - 1
        if last and final_lossless:
            _encode_diff_lossless_frame(out, target, refs)
            refs = [t.copy() for t in target]
        else:
            residual = [t - r for t, r in zip(target, refs)]
            if progressive_diff:
                rec = _encode_diff_prog_frame(out, residual, quant)
            else:
                rec = _encode_dct_frame(
                    out, residual, quant, differential=True
                )
            refs = [
                np.clip(r + d, 0, 255) for r, d in zip(refs, rec)
            ]
    out.extend(b"\xff\xd9")
    return bytes(out)
