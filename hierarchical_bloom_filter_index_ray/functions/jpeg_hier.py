"""Hierarchical JPEG (T.81 Annex J) — pyramid coding over the existing
sequential/progressive machinery.

A hierarchical stream is SOI, DHP (full-image dimensions, SOF syntax at
marker 0xDE), then a sequence of frames: the first non-differential
(SOF0/1/2/3), each later frame optionally preceded by EXP (0xDF:
``Eh``/``Ev`` reference-expansion nibbles) and coded differentially
(SOF5 = differential sequential, SOF6 = differential progressive,
SOF7 = differential lossless). Decoding keeps integer reference
component planes; a differential DCT frame's IDCT output is ADDED to
the (optionally 2x-upsampled) reference with no level shift, a
differential lossless frame's raw differences add modulo 2^16 (J.1.5,
scan ``Ss = 0`` = no prediction), and the final reference clamps to
[0, 2^P-1] (J.1). The J.1.1.2 upsampling filter is the defined
bilinear doubling ``out[2i] = in[i]``, ``out[2i+1] = (in[i] + in[i+1]
+ 1) >> 1`` with edge replication.

Everything here is structural — no data blobs — so FOREIGN hierarchical
streams decode too: each frame is sliced into a standalone sub-stream
(accumulated DQT/DHT/DRI table segments persist across frames per the
spec's table-slot semantics) and entropy-decoded by
``jpeg._decode_planes`` with the SOF marker mapped to its
non-differential twin; the +2^(P-1) level shift that decode applies is
subtracted back for differential DCT frames. Arithmetic hierarchical
(SOF13-15) remains a declared seam.

Reference parity: the reference repo has no image codecs; this closes
the last Huffman-JPEG box of SURVEY §2's multimodal column (see
``jpeg.py`` module docstring for the media-stage role).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (_decode_planes, _pad_edge, _quality_table, _quantize,
                   _QUANT_LUMA, _seg, _tile_blocks, _to_clip, ZIGZAG, _A,
                   _BitWriter, _codes, _encode_block, _DC_LUMA_BITS,
                   _DC_LUMA_VALS, _AC_LUMA_BITS, _AC_LUMA_VALS)

# frame markers: non-differential DCT/lossless, and the differential
# Huffman frames mapped to the non-differential decoder twin
_NONDIFF = {0xC0, 0xC1, 0xC2, 0xC3}
_DIFF_MAP = {0xC5: 0xC0, 0xC6: 0xC2, 0xC7: 0xC3}
# arithmetic sequential frames (marker -> differential?) decode for
# profile-tagged streams via jpeg_arith's QM coder; untagged = seam
_ARITH = {0xC9: False, 0xCD: True}
# arithmetic progressive/lossless (SOF10/11/14/15) stay declared seams
_SEAM = {0xCE, 0xCF, 0xCA, 0xCB}


def is_hierarchical(payload: bytes) -> bool:
    """Stream carries a DHP (0xFFDE) segment before any SOS."""
    i = 2
    n = len(payload)
    while i + 4 <= n and payload[i] == 0xFF:
        m = payload[i + 1]
        if m == 0xDE:
            return True
        if m == 0xDA or m == 0xD9:
            return False
        if m in (0x01,) or 0xD0 <= m <= 0xD8:
            i += 2
            continue
        i += 2 + struct.unpack(">H", payload[i + 2:i + 4])[0]
    return False


def _entropy_end(payload: bytes, start: int) -> int:
    """First marker (0xFF + non-zero, non-RST) at/after ``start``."""
    i = start
    n = len(payload)
    while i + 1 < n:
        if payload[i] == 0xFF and payload[i + 1] != 0x00:
            if not (0xD0 <= payload[i + 1] <= 0xD7):
                return i
            i += 2
            continue
        i += 1
    return n


def _entropy_end_arith(payload: bytes, start: int) -> int:
    """Arithmetic-scan analogue (7-bit stuffing instead of 0xFF00, see
    ``jpeg_arith._entropy_end``), skipping RSTn-separated segments."""
    from .jpeg_arith import _entropy_end as _aend
    i = _aend(payload, start)
    n = len(payload)
    while (i + 1 < n and payload[i] == 0xFF
           and 0xD0 <= payload[i + 1] <= 0xD7):
        i = _aend(payload, i + 2)
    return i


def _expand(plane: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """J.1.1.2 reference upsampling: double horizontally and/or
    vertically with the defined (a + b + 1) >> 1 interpolation."""
    a = plane
    if eh:
        right = np.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        out = np.empty((a.shape[0], a.shape[1] * 2), dtype=a.dtype)
        out[:, 0::2] = a
        out[:, 1::2] = (a + right + 1) >> 1
        a = out
    if ev:
        down = np.concatenate([a[1:], a[-1:]], axis=0)
        out = np.empty((a.shape[0] * 2, a.shape[1]), dtype=a.dtype)
        out[0::2] = a
        out[1::2] = (a + down + 1) >> 1
        a = out
    return a


def decode_jpeg_hier(payload: bytes) -> np.ndarray:
    """Decode a hierarchical (DHP) JPEG: (h, w) greyscale or (h, w, 3)
    RGB (JFIF transform, as ``decode_jpeg``). ValueError on malformed
    streams, NotImplementedError on the declared arithmetic seam."""
    try:
        return _decode_hier_checked(payload)
    except (IndexError, struct.error) as ex:
        raise ValueError(f"malformed hierarchical JPEG: {ex}") from ex


def _decode_hier_checked(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    n = len(payload)
    tables: list[bytes] = []       # raw DQT/DHT/DRI segments, in order
    full_h = full_w = 0
    prec = 8
    exp_next = (0, 0)
    ref: list[np.ndarray] | None = None
    stream_lossless = False
    n_frames = 0
    i = 2
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("marker expected")
        m = payload[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:
            break
        if i + 4 > n:
            raise ValueError("truncated marker segment")
        seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
        seg = payload[i + 4:i + 2 + seg_len]
        if m in (0xDB, 0xC4, 0xDD, 0xCC):
            tables.append(payload[i:i + 2 + seg_len])
        elif m == 0xDE:                                    # DHP
            if full_w:
                raise ValueError("multiple DHP segments")
            prec, full_h, full_w, _nc = struct.unpack(">BHHB", seg[:6])
            if not full_h or not full_w:
                raise ValueError("DHP zero dimensions")
        elif m == 0xDF:                                    # EXP
            exp_next = (seg[0] >> 4, seg[0] & 0xF)
            if exp_next[0] > 1 or exp_next[1] > 1:
                raise ValueError("EXP expansion nibbles must be 0/1")
        elif m in _SEAM:
            raise NotImplementedError(
                "arithmetic-coded hierarchical frame "
                f"(SOF marker 0x{m:02X}) is a declared seam")
        elif m in _NONDIFF or m in _DIFF_MAP or m in _ARITH:
            if not full_w:
                raise ValueError("frame before DHP in hierarchical "
                                 "stream")
            arith = m in _ARITH
            if arith:
                from .jpeg_arith import PROFILE_TAG
                if PROFILE_TAG not in payload:
                    raise NotImplementedError(
                        "arithmetic-coded hierarchical frame (SOF "
                        f"marker 0x{m:02X}) in a foreign stream needs "
                        "ISO Table D.3 loaded into a QmProfile")
            diff = m in _DIFF_MAP or (arith and _ARITH[m])
            # slice this frame (header through its scans) into a
            # standalone sub-stream: tables accumulated BEFORE the
            # frame replay in order (table-slot persistence); tables
            # inside the slice ride along in place AND join the
            # accumulator for later frames
            pre_tables = b"".join(tables)
            j = i
            while j < n:
                if payload[j] != 0xFF:
                    raise ValueError("marker expected in frame")
                fm = payload[j + 1]
                if 0xD0 <= fm <= 0xD7:
                    j += 2
                    continue
                if fm == 0xD9 or fm == 0xDE or fm == 0xDF \
                        or fm in _NONDIFF or fm in _DIFF_MAP \
                        or fm in _ARITH or fm in _SEAM:
                    if j > i:
                        break
                flen = struct.unpack(">H", payload[j + 2:j + 4])[0]
                if fm in (0xDB, 0xC4, 0xDD, 0xCC):
                    tables.append(payload[j:j + 2 + flen])
                j += 2 + flen
                if fm == 0xDA:
                    j = (_entropy_end_arith if arith
                         else _entropy_end)(payload, j)
            frame = bytearray(payload[i:j])
            if arith:
                from .jpeg_arith import (PROFILE_TAG,
                                         _decode_arith_planes)
                sub = (b"\xff\xd8" + _seg(0xEB, PROFILE_TAG + b"default")
                       + pre_tables + bytes(frame) + b"\xff\xd9")
                plane, fh, fw = _decode_arith_planes(
                    sub, allow_differential=True)
                planes, fprec, lossless = [plane], 8, False
            else:
                if diff:
                    frame[1] = _DIFF_MAP[m]
                sub = (b"\xff\xd8" + pre_tables + bytes(frame)
                       + b"\xff\xd9")
                planes, fh, fw, fprec, lossless = _decode_planes(
                    sub, differential=diff)
            if fprec != prec:
                raise ValueError("frame precision differs from DHP")
            shift = float(1 << (prec - 1))
            if ref is None:
                if diff:
                    raise ValueError("first hierarchical frame must "
                                     "be non-differential")
                stream_lossless = lossless
                if lossless:
                    ref = [np.asarray(p, dtype=np.int64) & 0xFFFF
                           for p in planes]
                else:
                    ref = [np.clip(np.round(p), -32768, 32767)
                           .astype(np.int64) for p in planes]
            else:
                if lossless != stream_lossless:
                    raise ValueError("mixed lossless/DCT hierarchical "
                                     "frames")
                eh, ev = exp_next
                cur = []
                for p in ref:
                    e = _expand(p, eh, ev)
                    if e.shape[0] < fh or e.shape[1] < fw:
                        raise ValueError(
                            "frame larger than (expanded) reference")
                    cur.append(e[:fh, :fw])
                if not diff:
                    raise ValueError("non-differential frame after "
                                     "the first in hierarchical scan")
                if len(planes) != len(cur):
                    raise NotImplementedError(
                        "per-frame component subset")
                if lossless:
                    # J.1.5: differences add modulo 2^16
                    ref = [(r + np.asarray(p, dtype=np.int64)) & 0xFFFF
                           for r, p in zip(cur, planes)]
                else:
                    ref = [np.clip(r + np.round(p - shift),
                                   -32768, 32767).astype(np.int64)
                           for r, p in zip(cur, planes)]
            exp_next = (0, 0)
            n_frames += 1
            i = j
            continue
        elif m == 0xDA:
            raise ValueError("scan outside any frame")
        i += 2 + seg_len
    if ref is None:
        raise ValueError("hierarchical stream with no frames")
    if ref[0].shape != (full_h, full_w):
        # final frame smaller than DHP dims: upsample to full size
        # (a zero-size plane would double 0 -> 0 forever; every frame
        # decoder validates its dims, so this is belt-and-braces)
        if min(ref[0].shape) == 0:
            raise ValueError("hierarchical frame with a zero dimension")
        while ref[0].shape[0] < full_h or ref[0].shape[1] < full_w:
            ref = [_expand(p, int(p.shape[1] < full_w),
                           int(p.shape[0] < full_h)) for p in ref]
        ref = [p[:full_h, :full_w] for p in ref]
    if len(ref) == 1:
        return _to_clip(ref[0].astype(np.float64), prec)
    if len(ref) == 3:
        y, cb, cr = (p.astype(np.float64) for p in ref)
        half = float(1 << (prec - 1))
        cb -= half
        cr -= half
        rgb = np.stack([y + 1.402 * cr,
                        y - 0.344136 * cb - 0.714136 * cr,
                        y + 1.772 * cb], axis=2)
        return _to_clip(rgb, prec)
    raise NotImplementedError(f"{len(ref)}-component hierarchical")


# ---------------------------------------------------------------------------
# encoder (greyscale pyramid: SOF0 base + SOF5 refinements)
# ---------------------------------------------------------------------------

def _downsample2(a: np.ndarray) -> np.ndarray:
    """2x2 box-mean downsample with edge padding to even dims."""
    h, w = a.shape
    p = _pad_edge(a.astype(np.float64), 2, 2)
    d = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean((1, 3))
    return np.round(d).astype(np.int64)


def _encode_frame(zz: np.ndarray) -> bytes:
    """Entropy-code quantized zigzag rows with the Annex K tables."""
    dc = _codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac = _codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bwr = _BitWriter()
    pred = 0
    for row in zz:
        pred = _encode_block(bwr, row, pred, dc, ac)
    bwr.flush()
    return bytes(bwr.buf)


def _sim_decode(zz: np.ndarray, q: np.ndarray, h: int, w: int,
                shift: float) -> np.ndarray:
    """Mirror of the decoder's dequant+IDCT+round for one frame (same
    float expression ORDER as ``_decode_planes``: + 2^(P-1) applied
    then subtracted, so the closed-loop reference is bit-identical)."""
    nbx = (w + 7) // 8
    nby = (h + 7) // 8
    nat = np.zeros((nby * nbx, 64), dtype=np.int64)
    nat[:, ZIGZAG] = zz
    blocks = (nat * q).reshape(-1, 8, 8).astype(np.float64)
    pix = np.einsum("ki,nkl,lj->nij", _A, blocks, _A) + shift
    plane = pix.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(nby * 8, nbx * 8)[:h, :w]
    return plane


def encode_jpeg_hier(img: np.ndarray, quality: int = 90, *,
                     levels: int = 3, lossless: bool = False,
                     arithmetic: bool = False) -> bytes:
    """Encode an (h, w) uint8 image as a hierarchical greyscale JPEG:
    a non-differential base frame at 1/2^(levels-1) scale followed by
    EXP + differential refinements up to full size. Closed-loop (each
    refinement codes the difference against the exact reference the
    decoder reconstructs), so decode equals the same pipeline's output
    deterministically. ``lossless=True`` emits SOF3 + SOF7 frames
    (Annex H differences, mod-2^16): decode returns ``img`` EXACTLY.
    ``arithmetic=True`` emits SOF9 + EXP/SOF13 frames QM-coded under
    the APP11-tagged profile (``jpeg_arith``); pixel output is
    identical to the Huffman pyramid at the same quality/levels (the
    quantized coefficients are the same — only the entropy layer
    differs)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("expected (h, w) uint8")
    if not 1 <= levels <= 8:
        raise ValueError("levels must be in 1..8")
    if arithmetic:
        if lossless:
            raise NotImplementedError(
                "arithmetic lossless hierarchical (SOF11/SOF15) is a "
                "declared seam")
        return _encode_hier_arith(img, quality, levels)
    if lossless:
        return _encode_hier_lossless(img, levels)
    h, w = img.shape
    pyramid = [img.astype(np.int64)]
    for _ in range(levels - 1):
        if pyramid[-1].shape[0] <= 8 and pyramid[-1].shape[1] <= 8:
            break
        pyramid.append(_downsample2(pyramid[-1]))
    pyramid.reverse()                       # smallest first
    q = _quality_table(_QUANT_LUMA, quality)
    zz_q = np.empty(64, dtype=np.uint8)
    zz_q[:] = q[ZIGZAG]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDE, struct.pack(">BHHB", 8, h, w, 1)
                + bytes([1, 0x11, 0]))                       # DHP
    out += _seg(0xDB, bytes([0x00]) + zz_q.tobytes())
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA_BITS)
                + bytes(_DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA_BITS)
                + bytes(_AC_LUMA_VALS))
    ref: np.ndarray | None = None
    for lvl in pyramid:
        lh, lw = lvl.shape
        if ref is None:
            tiles = _tile_blocks(_pad_edge(lvl.astype(np.float64),
                                           8, 8) - 128.0)
            zz = _quantize(tiles, q)
            out += _seg(0xC0, struct.pack(">BHHB", 8, lh, lw, 1)
                        + bytes([1, 0x11, 0]))
            out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            out += _encode_frame(zz)
            plane = _sim_decode(zz, q, lh, lw, 128.0)
            ref = np.clip(np.round(plane), -32768, 32767) \
                .astype(np.int64)
        else:
            eh = int(lw > ref.shape[1])
            ev = int(lh > ref.shape[0])
            up = _expand(ref, eh, ev)[:lh, :lw]
            diff = (lvl - up).astype(np.float64)
            zz = _quantize(_tile_blocks(_pad_edge(diff, 8, 8)), q)
            if eh or ev:
                out += _seg(0xDF, bytes([(eh << 4) | ev]))    # EXP
            out += _seg(0xC5, struct.pack(">BHHB", 8, lh, lw, 1)
                        + bytes([1, 0x11, 0]))
            out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            out += _encode_frame(zz)
            plane = _sim_decode(zz, q, lh, lw, 128.0)
            ref = np.clip(up + np.round(plane - 128.0),
                          -32768, 32767).astype(np.int64)
    return bytes(out + b"\xff\xd9")


def _ll_code_diffs(signed: np.ndarray) -> bytes:
    """Entropy-code a 2-D array of signed mod-2^16 differences as one
    Annex-H scan body (flat 17-category table, same as
    ``encode_jpeg_lossless``)."""
    from .jpeg import _LL_BITS, _LL_VALS
    mag = np.abs(signed)
    with np.errstate(divide="ignore"):
        cat = np.where(mag == 0, 0,
                       np.floor(np.log2(np.maximum(mag, 1))) + 1
                       ).astype(np.int64)
    cat[signed == -32768] = 16
    extra = np.where(signed < 0, signed + (1 << cat) - 1, signed)
    codes = _codes(_LL_BITS, _LL_VALS)
    bwr = _BitWriter()
    cat_f = cat.reshape(-1)
    ext_f = extra.reshape(-1)
    for i in range(cat_f.size):
        t = int(cat_f[i])
        bwr.put(*codes[t])
        if 0 < t < 16:
            bwr.put(int(ext_f[i]), t)
    bwr.flush()
    return bytes(bwr.buf)


def _encode_hier_lossless(img: np.ndarray, levels: int) -> bytes:
    """SOF3 base + EXP/SOF7 refinements; exact round trip (every
    pyramid level reconstructs exactly, so the reference IS the
    level)."""
    from .jpeg import _LL_BITS, _LL_VALS, encode_jpeg_lossless
    h, w = img.shape
    pyramid = [img.astype(np.int64)]
    for _ in range(levels - 1):
        if pyramid[-1].shape[0] <= 8 and pyramid[-1].shape[1] <= 8:
            break
        pyramid.append(_downsample2(pyramid[-1]))
    pyramid.reverse()
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDE, struct.pack(">BHHB", 8, h, w, 1)
                + bytes([1, 0x11, 0]))                       # DHP
    ref: np.ndarray | None = None
    for lvl in pyramid:
        lh, lw = lvl.shape
        if ref is None:
            # embed the standalone SOF3 frame (strip its SOI/EOI)
            out += encode_jpeg_lossless(
                lvl.astype(np.uint8), predictor=1)[2:-2]
        else:
            eh = int(lw > ref.shape[1])
            ev = int(lh > ref.shape[0])
            up = _expand(ref, eh, ev)[:lh, :lw]
            signed = (lvl - up) & 0xFFFF
            signed[signed >= 32768] -= 65536
            if eh or ev:
                out += _seg(0xDF, bytes([(eh << 4) | ev]))
            out += _seg(0xC4, bytes([0x00]) + bytes(_LL_BITS)
                        + bytes(_LL_VALS))
            out += _seg(0xC7, struct.pack(">BHHB", 8, lh, lw, 1)
                        + bytes([1, 0x11, 0]))
            # Ss = 0: no prediction (differential, J.1.5)
            out += _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
            out += _ll_code_diffs(signed)
        ref = lvl                       # lossless: exact reconstruction
    return bytes(out + b"\xff\xd9")


def _encode_hier_arith(img: np.ndarray, quality: int, levels: int, *,
                       dc_lu: tuple[int, int] = (0, 1),
                       kx: int = 5) -> bytes:
    """SOF9 base + EXP/SOF13 differential refinements, QM-coded under
    the APP11-tagged default profile. Same closed-loop pyramid as the
    Huffman path — identical quantized coefficients, so decode output
    is pixel-identical to ``encode_jpeg_hier(..., arithmetic=False)``.
    Differential frames code the DC value directly (no prediction
    chain), mirroring ``jpeg_arith._decode_arith_planes``."""
    from .jpeg_arith import (PROFILE_TAG, QmEncoder, default_profile,
                             _AC_BANK, _DC_BANK,
                             _encode_block as _qm_encode_block)
    h, w = img.shape
    pyramid = [img.astype(np.int64)]
    for _ in range(levels - 1):
        if pyramid[-1].shape[0] <= 8 and pyramid[-1].shape[1] <= 8:
            break
        pyramid.append(_downsample2(pyramid[-1]))
    pyramid.reverse()                       # smallest first
    q = _quality_table(_QUANT_LUMA, quality)
    zz_q = np.empty(64, dtype=np.uint8)
    zz_q[:] = q[ZIGZAG]
    l_, u_ = dc_lu
    lo, hi = (1 << l_) >> 1, 1 << u_
    prof = default_profile()
    out = bytearray(b"\xff\xd8")
    out += _seg(0xEB, PROFILE_TAG + b"default")            # APP11
    out += _seg(0xDE, struct.pack(">BHHB", 8, h, w, 1)
                + bytes([1, 0x11, 0]))                     # DHP
    out += _seg(0xDB, bytes([0x00]) + zz_q.tobytes())
    # DAC: DC conditioning table 0 (U<<4 | L), AC table 0 (Kx)
    out += _seg(0xCC, bytes([0x00, (u_ << 4) | l_, 0x10, kx]))
    ref: np.ndarray | None = None
    for lvl in pyramid:
        lh, lw = lvl.shape
        if ref is None:
            tiles = _tile_blocks(_pad_edge(lvl.astype(np.float64),
                                           8, 8) - 128.0)
            zz = _quantize(tiles, q)
            marker, diff_frame, up = 0xC9, False, None
        else:
            eh = int(lw > ref.shape[1])
            ev = int(lh > ref.shape[0])
            up = _expand(ref, eh, ev)[:lh, :lw]
            d = (lvl - up).astype(np.float64)
            zz = _quantize(_tile_blocks(_pad_edge(d, 8, 8)), q)
            if eh or ev:
                out += _seg(0xDF, bytes([(eh << 4) | ev]))  # EXP
            marker, diff_frame = 0xCD, True
        enc = QmEncoder(prof, _DC_BANK + _AC_BANK)
        enc._prev_diff = 0
        pred = 0
        for row in zz:
            if diff_frame:
                _qm_encode_block(enc, row, 0, 0, _DC_BANK, lo, hi, kx)
            else:
                pred = _qm_encode_block(enc, row, pred, 0, _DC_BANK,
                                        lo, hi, kx)
        out += _seg(marker, struct.pack(">BHHB", 8, lh, lw, 1)
                    + bytes([1, 0x11, 0]))
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        out += enc.flush()
        plane = _sim_decode(zz, q, lh, lw, 128.0)
        if ref is None:
            ref = np.clip(np.round(plane), -32768, 32767) \
                .astype(np.int64)
        else:
            ref = np.clip(up + np.round(plane - 128.0),
                          -32768, 32767).astype(np.int64)
    return bytes(out + b"\xff\xd9")
