"""VP9 / AV1 structural layer — uncompressed-header and OBU parsing.

VP9 and AV1 are the dominant royalty-free crawled-video codecs (WebM).
Mirroring ``h264.py``'s posture, the *structural* layer is fully
implemented: VP9 uncompressed frame headers (profile, bit depth,
chroma subsampling, frame/render dimensions, keyframe/intra-only
detection, superframe index split — VP9 Bitstream & Decoding Process
Specification §6.1-6.2 and Annex B) and AV1 OBU streams (§5.2 OBU
headers with LEB128 sizes, the full §5.5 sequence-header parse incl.
operating points, timing/decoder-model blocks and color config —
AV1 Bitstream & Decoding Process Specification). Sample decode
(arithmetic/entropy-coded tiles, prediction, loop filters) is the
declared codec seam.

Container wiring: ``webm_video_info`` dispatches on the Matroska
``CodecID`` (``V_VP9`` → per-block frame headers with superframe
split; ``V_AV01``/``V_AV1`` → OBU walk) so VP9/AV1 WebM payloads can
be filtered by resolution/bit depth and carved at keyframes inside
actor-pool ``map_batches`` stages without decoding samples.

Reference parity: the reference repo has no media layer; this extends
the engine's multimodal surface like ``h264.py`` (SURVEY.md
LLM-pipeline operators).
"""

from __future__ import annotations

import numpy as np


class _Bits:
    """MSB-first bit reader (both specs read f(n) MSB-first)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def f(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.d):
                raise ValueError("bitstream overrun")
            v = (v << 1) | ((self.d[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def uvlc(self) -> int:
        lz = 0
        while self.f(1) == 0:
            lz += 1
            if lz > 32:
                raise ValueError("uvlc overrun")
        if lz >= 32:
            return (1 << 32) - 1
        return (1 << lz) - 1 + self.f(lz)

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# ---------------------------------------------------------------------------
# VP9
# ---------------------------------------------------------------------------

_VP9_SYNC = 0x498342
_CS_RGB = 7


def split_vp9_superframe(block: bytes) -> list[bytes]:
    """Annex B superframe split: a block whose LAST byte is a
    superframe marker (0b110xxxxx) carries an index of per-frame
    sizes; returns the frames (or ``[block]`` when not a superframe)."""
    if not block:
        return [block]
    b = block[-1]
    if (b & 0xE0) != 0xC0:
        return [block]
    bytes_per = ((b >> 3) & 0x3) + 1
    count = (b & 0x7) + 1
    index_sz = 2 + count * bytes_per
    if len(block) < index_sz or block[-index_sz] != b:
        return [block]                 # marker byte collision, not an index
    idx = block[-index_sz + 1:-1]
    sizes = [int.from_bytes(idx[i * bytes_per:(i + 1) * bytes_per],
                            "little") for i in range(count)]
    if sum(sizes) > len(block) - index_sz:
        raise ValueError("superframe sizes exceed block")
    frames = []
    off = 0
    for s in sizes:
        frames.append(block[off:off + s])
        off += s
    return frames


def _vp9_color_config(br: _Bits, profile: int) -> dict:
    bit_depth = 8
    if profile >= 2:
        bit_depth = 12 if br.f(1) else 10
    color_space = br.f(3)
    sx = sy = 1
    if color_space != _CS_RGB:
        br.f(1)                                         # color_range
        if profile in (1, 3):
            sx, sy = br.f(1), br.f(1)
            br.f(1)                                     # reserved
    else:
        if profile in (1, 3):
            sx = sy = 0
            br.f(1)                                     # reserved
    return {"bit_depth": bit_depth, "color_space": color_space,
            "subsampling_x": sx, "subsampling_y": sy}


def vp9_frame_info(frame: bytes) -> dict:
    """Parse one VP9 frame's uncompressed header (§6.2). Returns
    profile, frame type, show flags, and (for key / intra-only frames)
    bit depth, subsampling and frame/render dimensions."""
    br = _Bits(frame)
    if br.f(2) != 2:
        raise ValueError("bad VP9 frame marker")
    profile = br.f(1) | (br.f(1) << 1)
    if profile == 3 and br.f(1):
        raise ValueError("bad VP9 reserved bit")
    info: dict = {"profile": profile}
    if br.f(1):                                         # show_existing
        info.update(frame_type="show_existing",
                    show_map_idx=br.f(3), keyframe=False)
        return info
    key = br.f(1) == 0
    show = br.f(1)
    err_res = br.f(1)
    info.update(show_frame=show, error_resilient=err_res)
    if key:
        if br.f(24) != _VP9_SYNC:
            raise ValueError("bad VP9 frame sync code")
        info.update(frame_type="key", keyframe=True,
                    **_vp9_color_config(br, profile))
        info["width"] = br.f(16) + 1
        info["height"] = br.f(16) + 1
        if br.f(1):                                     # render differs
            info["render_width"] = br.f(16) + 1
            info["render_height"] = br.f(16) + 1
        else:
            info["render_width"] = info["width"]
            info["render_height"] = info["height"]
        return info
    intra_only = br.f(1) if not show else 0
    if not err_res:
        br.f(2)                                         # reset_frame_ctx
    if intra_only:
        if br.f(24) != _VP9_SYNC:
            raise ValueError("bad VP9 frame sync code")
        if profile > 0:
            cc = _vp9_color_config(br, profile)
        else:
            cc = {"bit_depth": 8, "color_space": 1,
                  "subsampling_x": 1, "subsampling_y": 1}
        br.f(8)                                         # refresh flags
        info.update(frame_type="intra_only", keyframe=False, **cc)
        info["width"] = br.f(16) + 1
        info["height"] = br.f(16) + 1
        return info
    info.update(frame_type="inter", keyframe=False)
    return info


# ---------------------------------------------------------------------------
# AV1
# ---------------------------------------------------------------------------

OBU_NAMES = {1: "sequence_header", 2: "temporal_delimiter",
             3: "frame_header", 4: "tile_group", 5: "metadata",
             6: "frame", 7: "redundant_frame_header", 8: "tile_list",
             15: "padding"}


def _leb128(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for i in range(8):
        if pos + i >= len(data):
            raise ValueError("leb128 overrun")
        b = data[pos + i]
        v |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            return v, pos + i + 1
    raise ValueError("leb128 too long")


def parse_obus(payload: bytes) -> list[dict]:
    """Walk a low-overhead AV1 bitstream (§5.2): returns OBU dicts
    (type, name, header/payload offsets, sizes). OBUs without a size
    field extend to the end of the buffer (legal only for the last)."""
    obus = []
    i = 0
    n = len(payload)
    while i < n:
        hdr = payload[i]
        if hdr & 0x80:
            raise ValueError("OBU forbidden bit set")
        otype = (hdr >> 3) & 0xF
        ext = (hdr >> 2) & 1
        has_size = (hdr >> 1) & 1
        j = i + 1
        if ext:
            if j >= n:
                raise ValueError("truncated OBU extension")
            j += 1
        if has_size:
            size, j = _leb128(payload, j)
        else:
            size = n - j
        if j + size > n:
            raise ValueError("OBU size exceeds buffer")
        obus.append({"type": otype,
                     "name": OBU_NAMES.get(otype, f"reserved{otype}"),
                     "offset": i, "payload_offset": j, "size": size})
        i = j + size
    return obus


def _av1_sequence_header(data: bytes) -> dict:
    """Full §5.5.1 sequence_header_obu parse."""
    br = _Bits(data)
    profile = br.f(3)
    still = br.f(1)
    reduced = br.f(1)
    levels = []
    decoder_model = 0
    buffer_delay_bits = 0
    if reduced:
        levels.append(br.f(5))
    else:
        if br.f(1):                                     # timing info
            br.f(32)                                    # num_units
            br.f(32)                                    # time_scale
            if br.f(1):                                 # equal interval
                br.uvlc()
            decoder_model = br.f(1)
            if decoder_model:
                buffer_delay_bits = br.f(5) + 1
                br.f(32)
                br.f(5)
                br.f(5)
        idd_present = br.f(1)
        for _ in range(br.f(5) + 1):                    # operating pts
            br.f(12)                                    # idc
            lvl = br.f(5)
            levels.append(lvl)
            if lvl > 7:
                br.f(1)                                 # seq_tier
            if decoder_model and br.f(1):
                br.f(buffer_delay_bits)
                br.f(buffer_delay_bits)
                br.f(1)
            if idd_present and br.f(1):
                br.f(4)
    wbits = br.f(4) + 1
    hbits = br.f(4) + 1
    width = br.f(wbits) + 1
    height = br.f(hbits) + 1
    if not reduced and br.f(1):                         # frame ids
        br.f(4)
        br.f(3)
    br.f(3)             # use_128x128_sb, filter_intra, intra_edge
    order_hint = 0
    if not reduced:
        br.f(4)         # interintra, masked, warped, dual_filter
        order_hint = br.f(1)
        if order_hint:
            br.f(2)                                     # jnt, ref mvs
        # screen-content tools / integer-mv (§5.5.1 exact branches)
        force_sct = 2 if br.f(1) else br.f(1)
        if force_sct > 0:
            if br.f(1) == 0:                            # choose imv
                br.f(1)                                 # force imv
        if order_hint:
            br.f(3)                                     # order hint bits
    br.f(3)             # superres, cdef, restoration
    # color config
    high = br.f(1)
    if profile == 2 and high:
        bit_depth = 12 if br.f(1) else 10
    else:
        bit_depth = 10 if high else 8
    mono = 0 if profile == 1 else br.f(1)
    if br.f(1):                                         # color descr
        primaries, transfer, matrix = br.f(8), br.f(8), br.f(8)
    else:
        primaries = transfer = matrix = 2               # unspecified
    if mono:
        br.f(1)
        sx = sy = 1
    elif primaries == 1 and transfer == 13 and matrix == 0:
        sx = sy = 0
    else:
        br.f(1)                                         # color_range
        if profile == 0:
            sx = sy = 1
        elif profile == 1:
            sx = sy = 0
        else:
            if bit_depth == 12:
                sx = br.f(1)
                sy = br.f(1) if sx else 0
            else:
                sx, sy = 1, 0
        if sx and sy:
            br.f(2)                                     # chroma pos
    # separate_uv_delta_q + film_grain read but unused
    return {"profile": profile, "still_picture": bool(still),
            "reduced_header": bool(reduced), "levels": levels,
            "width": width, "height": height, "bit_depth": bit_depth,
            "mono_chrome": bool(mono), "subsampling_x": sx,
            "subsampling_y": sy}


def av1_sequence_info(payload: bytes) -> dict:
    """First sequence-header OBU of a low-overhead AV1 stream, parsed.
    Also reports OBU counts and keyframe (frame with a sequence header
    preceding) offsets."""
    obus = parse_obus(payload)
    seq = None
    counts: dict[str, int] = {}
    key_offsets = []
    seen_seq = False
    for o in obus:
        counts[o["name"]] = counts.get(o["name"], 0) + 1
        if o["type"] == 1 and seq is None:
            seq = _av1_sequence_header(
                payload[o["payload_offset"]:o["payload_offset"]
                        + o["size"]])
        if o["type"] == 1:
            seen_seq = True
        if o["type"] in (3, 6) and seen_seq:
            key_offsets.append(o["offset"])
            seen_seq = False
    if seq is None:
        raise ValueError("no AV1 sequence header OBU")
    return {**seq, "n_obus": len(obus), "obu_counts": counts,
            "frame_offsets_after_seq": key_offsets}


# ---------------------------------------------------------------------------
# container wiring (WebM)
# ---------------------------------------------------------------------------

def webm_video_info(payload: bytes) -> dict:
    """Structural info for a VP9/AV1 (or other) WebM video payload:
    track codec + per-sample frame-header stats without sample decode.
    VP9 blocks are superframe-split; the first keyframe's header
    supplies dimensions/bit depth. AV1 CodecPrivate or first block
    supplies the sequence header."""
    from .webm import extract_sample, video_track
    trk = video_track(payload)
    out: dict = {"codec": trk.codec, "n_samples": int(trk.n_samples),
                 "track_width": int(trk.width),
                 "track_height": int(trk.height)}
    codec = trk.codec.rstrip("\x00")
    if codec == "V_VP9":
        n_frames = 0
        keyframes = 0
        first_key = None
        for i in range(trk.n_samples):
            for fr in split_vp9_superframe(
                    extract_sample(payload, trk, i)):
                if not fr:
                    continue
                info = vp9_frame_info(fr)
                n_frames += 1
                if info.get("keyframe"):
                    keyframes += 1
                    if first_key is None:
                        first_key = info
        out.update(n_frames=n_frames, n_keyframes=keyframes)
        if first_key:
            out.update(width=first_key["width"],
                       height=first_key["height"],
                       bit_depth=first_key["bit_depth"],
                       profile=first_key["profile"])
        return out
    if codec in ("V_AV1", "V_AV01"):
        src = None
        priv = trk.codec_private
        if priv and len(priv) > 4:
            # av1C configuration record: 4-byte header then configOBUs
            try:
                src = av1_sequence_info(priv[4:])
            except ValueError:
                src = None
        if src is None and trk.n_samples:
            src = av1_sequence_info(extract_sample(payload, trk, 0))
        if src is None:
            raise ValueError("no AV1 sequence header found")
        out.update(width=src["width"], height=src["height"],
                   bit_depth=src["bit_depth"], profile=src["profile"],
                   levels=src["levels"])
        return out
    raise NotImplementedError(
        f"structural info for WebM codec {codec!r} (VP9/AV1 here; "
        "MJPEG/Vorbis decode fully elsewhere)")


def vp9_cut_points(payload: bytes) -> np.ndarray:
    """Sample indices of VP9 keyframes in a WebM payload (safe split
    points for sharding a stream across tasks)."""
    from .webm import extract_sample, video_track
    trk = video_track(payload)
    if trk.codec.rstrip("\x00") != "V_VP9":
        raise ValueError("not a VP9 WebM track")
    cuts = []
    for i in range(trk.n_samples):
        frames = split_vp9_superframe(extract_sample(payload, trk, i))
        if frames and frames[0] and \
                vp9_frame_info(frames[0]).get("keyframe"):
            cuts.append(i)
    return np.asarray(cuts, dtype=np.int64)
