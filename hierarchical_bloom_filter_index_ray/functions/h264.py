"""H.264/AVC structural layer — Annex B byte-stream NAL demux,
emulation-prevention removal, Exp-Golomb SPS parsing (profile, level,
chroma format, bit depth, and exact cropped dimensions), IDR keyframe
cut points, and avcC (ISO/IEC 14496-15 AVCDecoderConfigurationRecord)
parameter-set extraction with length-prefixed → Annex B conversion.

H.264 is the dominant crawled video codec. Mirrors the repo's codec
posture: the *structural* layer — stream parameters, keyframe
locations, safe split points, MP4-sample → byte-stream conversion —
is fully implemented and verified against hand-assembled bitstreams
built by an independent test-side Exp-Golomb writer; *slice/sample*
decode (CAVLC/CABAC entropy, inter prediction, deblocking) is the
declared codec seam (README media matrix).

Everything here derives from the public spec: NAL syntax and start
codes are ITU-T H.264 §7.3.1 / Annex B; ``seq_parameter_set_data``
field order is §7.3.2.1.1 with the scaling-list skip of §7.3.2.1.1.1;
the cropped-dimension formula (CropUnitX/Y by ChromaArrayType) is
§7.4.2.1.1; the avcC record layout is ISO/IEC 14496-15 §5.3.3.1.

Reference parity: the reference repo has no media layer at all; this
module extends the engine's multimodal surface (SURVEY.md LLM-pipeline
operators) so video payloads can be filtered by resolution/profile and
carved at keyframes inside actor-pool ``map_batches`` stages without
decoding samples.
"""

from __future__ import annotations

import struct

import numpy as np

# §7.3.2.1.1: profiles whose SPS carries the chroma/bit-depth block
_HIGH_PROFILES = frozenset(
    (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135))

NAL_NAMES = {1: "slice", 5: "idr", 6: "sei", 7: "sps", 8: "pps",
             9: "aud", 10: "end_seq", 11: "end_stream", 12: "filler"}


def ebsp_to_rbsp(data: bytes) -> bytes:
    """Strip emulation-prevention bytes: 00 00 03 → 00 00 (§7.4.1.1).
    Uses ``bytes.find`` so the common no-EPB case is one C scan."""
    i = data.find(b"\x00\x00\x03")
    if i < 0:
        return data
    out = bytearray()
    pos = 0
    while i >= 0:
        out += data[pos:i + 2]
        pos = i + 3                         # drop the 03
        i = data.find(b"\x00\x00\x03", pos)
    out += data[pos:]
    return bytes(out)


class _Bits:
    """MSB-first bit reader with the Exp-Golomb codes of §9.1."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0                        # bit position

    def u(self, n: int) -> int:
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("H.264 bitstream truncated")
        v = 0
        pos = self.pos
        while n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(n, avail)
            v = (v << take) | ((byte >> (avail - take))
                               & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def ue(self) -> int:
        lz = 0
        while self.u(1) == 0:
            lz += 1
            if lz > 31:
                raise ValueError("Exp-Golomb code exceeds 32 bits")
        return (1 << lz) - 1 + (self.u(lz) if lz else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)


def split_nals(payload: bytes) -> list[dict]:
    """Annex B demux: every NAL unit as ``{"offset"`` (of its start
    code, including a leading zero when the 4-byte form is used),
    ``"data_off"``, ``"size"`` (EBSP bytes, trailing start-code zeros
    excluded), ``"type"``, ``"ref_idc"}``. Raises ValueError when the
    payload contains no start code."""
    starts: list[tuple[int, int]] = []      # (start-code off, data off)
    i = payload.find(b"\x00\x00\x01")
    while i >= 0:
        sc = i - 1 if i > 0 and payload[i - 1] == 0 else i
        starts.append((sc, i + 3))
        i = payload.find(b"\x00\x00\x01", i + 3)
    if not starts:
        raise ValueError("payload contains no Annex B start code")
    out = []
    for k, (sc, do) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else len(payload)
        ebsp = payload[do:end].rstrip(b"\x00") or payload[do:end]
        if not ebsp:
            continue
        hdr = ebsp[0]
        if hdr & 0x80:
            continue                        # forbidden_zero_bit set
        out.append({"offset": sc, "data_off": do, "size": len(ebsp),
                    "type": hdr & 0x1F, "ref_idc": (hdr >> 5) & 0x3})
    if not out:
        raise ValueError("no valid NAL units after start codes")
    return out


def _skip_scaling_list(br: _Bits, size: int) -> None:
    """§7.3.2.1.1.1 — consume one scaling list (values discarded)."""
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + br.se() + 256) % 256
        last = nxt if nxt else last


def parse_sps(ebsp: bytes) -> dict:
    """Decode ``seq_parameter_set_data`` (§7.3.2.1.1) from a SPS NAL's
    EBSP payload (header byte included or not — both accepted).
    Returns profile/level/chroma/bit-depth fields plus the exact
    display ``width``/``height`` after frame cropping (§7.4.2.1.1)."""
    if ebsp and ebsp[0] & 0x1F == 7:        # NAL header present
        ebsp = ebsp[1:]
    br = _Bits(ebsp_to_rbsp(ebsp))
    profile = br.u(8)
    constraints = br.u(8)
    level = br.u(8)
    sps_id = br.ue()
    chroma, sep_planes = 1, 0
    bd_luma = bd_chroma = 8
    if profile in _HIGH_PROFILES:
        chroma = br.ue()
        if chroma > 3:
            raise ValueError("invalid chroma_format_idc")
        if chroma == 3:
            sep_planes = br.u(1)
        bd_luma = br.ue() + 8
        bd_chroma = br.ue() + 8
        br.u(1)                             # qpprime bypass
        if br.u(1):                         # seq_scaling_matrix_present
            for i in range(8 if chroma != 3 else 12):
                if br.u(1):
                    _skip_scaling_list(br, 16 if i < 6 else 64)
    log2_max_frame_num = br.ue() + 4
    poc_type = br.ue()
    if poc_type == 0:
        br.ue()                             # log2_max_pic_order_cnt_lsb
    elif poc_type == 1:
        br.u(1)
        br.se()
        br.se()
        for _ in range(br.ue()):
            br.se()
    max_ref_frames = br.ue()
    br.u(1)                                 # gaps_in_frame_num allowed
    pw_mbs = br.ue() + 1
    ph_units = br.ue() + 1
    fmof = br.u(1)                          # frame_mbs_only_flag
    if not fmof:
        br.u(1)                             # mb_adaptive_frame_field
    br.u(1)                                 # direct_8x8_inference
    width = pw_mbs * 16
    height = (2 - fmof) * ph_units * 16
    crop = (0, 0, 0, 0)
    if br.u(1):                             # frame_cropping_flag
        crop = (br.ue(), br.ue(), br.ue(), br.ue())
        chroma_array = 0 if sep_planes else chroma
        if chroma_array == 0:
            cux, cuy = 1, 2 - fmof
        else:
            sub_w = 2 if chroma_array in (1, 2) else 1
            sub_h = 2 if chroma_array == 1 else 1
            cux, cuy = sub_w, sub_h * (2 - fmof)
        width -= cux * (crop[0] + crop[1])
        height -= cuy * (crop[2] + crop[3])
    if width <= 0 or height <= 0:
        raise ValueError("SPS cropping exceeds coded size")
    return {
        "profile_idc": profile, "constraint_flags": constraints >> 2,
        "level_idc": level, "sps_id": sps_id,
        "chroma_format_idc": chroma,
        "separate_colour_plane": bool(sep_planes),
        "bit_depth_luma": bd_luma, "bit_depth_chroma": bd_chroma,
        "log2_max_frame_num": log2_max_frame_num,
        "pic_order_cnt_type": poc_type,
        "max_num_ref_frames": max_ref_frames,
        "frame_mbs_only": bool(fmof), "frame_crop": crop,
        "width": width, "height": height,
    }


def h264_info(payload: bytes) -> dict:
    """One-call Annex B stream summary: dimensions/profile/level from
    the first SPS, NAL-type census, keyframe count — the structural
    analogue of ``mp3_info`` / ``ogg_info`` for video."""
    nals = split_nals(payload)
    counts: dict[str, int] = {}
    sps = None
    for n in nals:
        name = NAL_NAMES.get(n["type"], f"nal{n['type']}")
        counts[name] = counts.get(name, 0) + 1
        if n["type"] == 7 and sps is None:
            sps = parse_sps(
                payload[n["data_off"]:n["data_off"] + n["size"]])
    if sps is None:
        raise ValueError("Annex B stream carries no SPS")
    return {
        "width": sps["width"], "height": sps["height"],
        "profile_idc": sps["profile_idc"],
        "level_idc": sps["level_idc"],
        "chroma_format_idc": sps["chroma_format_idc"],
        "bit_depth_luma": sps["bit_depth_luma"],
        "n_nals": len(nals), "n_idr": counts.get("idr", 0),
        "n_slices": counts.get("idr", 0) + counts.get("slice", 0),
        "nal_counts": counts,
    }


def cut_points(payload: bytes) -> np.ndarray:
    """Byte offsets where decode can restart: the start of each IDR
    access unit, extended backwards over the immediately preceding
    contiguous run of SPS/PPS/SEI/AUD NALs (types 7/8/6/9) so a carve
    beginning there carries its own parameter sets — the video
    analogue of ``mp3.cut_points``'s reservoir-safe frames."""
    nals = split_nals(payload)
    cuts = []
    for i, n in enumerate(nals):
        if n["type"] != 5:
            continue
        j = i
        # runs never overlap: they are bounded by the previous VCL NAL
        while j > 0 and nals[j - 1]["type"] in (6, 7, 8, 9):
            j -= 1
        cuts.append(nals[j]["offset"])
    return np.asarray(sorted(set(cuts)), dtype=np.int64)


def parse_avcc(record: bytes) -> dict:
    """ISO/IEC 14496-15 §5.3.3.1 AVCDecoderConfigurationRecord: the
    ``avcC`` box body MP4 ``avc1`` sample entries carry. Returns the
    NAL length-prefix size plus raw and parsed parameter sets."""
    if len(record) < 7 or record[0] != 1:
        raise ValueError("not an avcC record (configurationVersion)")
    nal_len = (record[4] & 0x3) + 1
    n_sps = record[5] & 0x1F
    pos = 6
    sps_list: list[bytes] = []
    for _ in range(n_sps):
        if pos + 2 > len(record):
            raise ValueError("avcC truncated in SPS table")
        ln = struct.unpack_from(">H", record, pos)[0]
        pos += 2
        if pos + ln > len(record):
            raise ValueError("avcC SPS length exceeds record")
        sps_list.append(record[pos:pos + ln])
        pos += ln
    if pos >= len(record):
        raise ValueError("avcC truncated before PPS count")
    n_pps = record[pos]
    pos += 1
    pps_list: list[bytes] = []
    for _ in range(n_pps):
        if pos + 2 > len(record):
            raise ValueError("avcC truncated in PPS table")
        ln = struct.unpack_from(">H", record, pos)[0]
        pos += 2
        if pos + ln > len(record):
            raise ValueError("avcC PPS length exceeds record")
        pps_list.append(record[pos:pos + ln])
        pos += ln
    out = {"nal_length_size": nal_len, "sps": sps_list,
           "pps": pps_list, "profile_idc": record[1],
           "level_idc": record[3]}
    if sps_list:
        out.update(parse_sps(sps_list[0]))
    return out


def avcc_sample_to_annexb(sample: bytes, nal_length_size: int,
                          prepend: list[bytes] | None = None) -> bytes:
    """Convert one length-prefixed MP4 sample to an Annex B byte
    stream, optionally prepending parameter-set NALs (from
    ``parse_avcc``) so the result is a self-contained decode unit."""
    if nal_length_size not in (1, 2, 4):
        raise ValueError("NAL length prefix must be 1, 2 or 4 bytes")
    out = bytearray()
    for nal in prepend or []:
        out += b"\x00\x00\x00\x01" + nal
    pos = 0
    while pos < len(sample):
        if pos + nal_length_size > len(sample):
            raise ValueError("sample truncated in NAL length prefix")
        ln = int.from_bytes(sample[pos:pos + nal_length_size], "big")
        pos += nal_length_size
        if ln == 0 or pos + ln > len(sample):
            raise ValueError("NAL length exceeds sample")
        out += b"\x00\x00\x00\x01" + sample[pos:pos + ln]
        pos += ln
    return bytes(out)


def mp4_h264_info(payload: bytes) -> dict:
    """Structural info for an MP4's H.264 track without sample decode:
    exact SPS dimensions/profile (from the ``avcC`` record inside the
    ``avc1``/``avc3`` sample entry, ISO/IEC 14496-15), sample and
    keyframe counts, and track duration. Raises ValueError when the
    file carries no AVC video track."""
    from .mp4 import parse_mp4, visual_config_box
    for trk in parse_mp4(payload):
        if trk.handler != "vide" or trk.codec not in ("avc1", "avc3"):
            continue
        rec = visual_config_box(trk.sample_entry, b"avcC")
        if rec is None:
            raise ValueError("AVC sample entry lacks an avcC box")
        a = parse_avcc(rec)
        return {
            "width": a.get("width", trk.width),
            "height": a.get("height", trk.height),
            "profile_idc": a["profile_idc"],
            "level_idc": a["level_idc"],
            "nal_length_size": a["nal_length_size"],
            "n_samples": trk.n_samples,
            "n_keyframes": (trk.n_samples if trk.sync_samples is None
                            else int(len(trk.sync_samples))),
            "duration_sec": (round(trk.duration / trk.timescale, 6)
                             if trk.timescale else None),
        }
    raise ValueError("no avc1/avc3 video track in mp4 payload")


def mp4_h264_sample_annexb(payload: bytes, i: int) -> bytes:
    """Extract sample ``i`` of the MP4's AVC track as a self-contained
    Annex B byte stream (parameter sets from the avcC prepended) —
    the carve primitive for H.264-in-MP4 keyframes."""
    from .mp4 import extract_sample, video_track, visual_config_box
    trk = video_track(payload)
    if trk.codec not in ("avc1", "avc3"):
        raise ValueError(f"video track codec is {trk.codec!r}, not AVC")
    rec = visual_config_box(trk.sample_entry, b"avcC")
    if rec is None:
        raise ValueError("AVC sample entry lacks an avcC box")
    a = parse_avcc(rec)
    return avcc_sample_to_annexb(
        extract_sample(payload, trk, i), a["nal_length_size"],
        prepend=a["sps"] + a["pps"])


def is_annexb(payload: bytes) -> bool:
    """True when the payload starts with an Annex B start code whose
    first NAL header is legal (forbidden bit clear)."""
    if payload[:3] == b"\x00\x00\x01":
        off = 3
    elif payload[:4] == b"\x00\x00\x00\x01":
        off = 4
    else:
        return False
    return len(payload) > off and not payload[off] & 0x80


def decode_h264(payload: bytes):
    """Slice decode (CAVLC/CABAC entropy, intra/inter prediction,
    deblocking) is the declared codec seam — same rationale as
    VP9/AV1 and the JPEG QM-coder. NAL demux, SPS parameters,
    keyframe cut points and avcC conversion above are real."""
    raise NotImplementedError(
        "H.264 slice decode is the declared codec seam; use "
        "h264_info/split_nals/cut_points/parse_avcc/"
        "avcc_sample_to_annexb for the structural layer")
