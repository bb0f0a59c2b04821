"""MPEG audio (MP3) elementary-stream demux — ISO/IEC 11172-3 and
13818-3 frame headers, ID3v1/ID3v2 tags, Xing/VBRI VBR headers.

The most common crawled audio format. Mirrors the repo's container
posture (``mp4.py`` / ``webm.py`` / ``avi.py``): the *structural* layer
— frame boundaries, stream parameters, duration, tags, reservoir-safe
cut points, frame extraction and re-mux — is fully implemented and
verified against hand-assembled fixtures built from the public header
formula. Layer III *sample* decode (Huffman + IMDCT + synthesis
filterbank, ISO 11172-3 §2.4.3) lives in the sibling ``mp3dec.py``:
the full DSP/bitstream chain is real and round-trip verified; only the
literal ISO Huffman code assignments and synthesis window (Tables
B.7/B.3) remain pluggable profile data, unverifiable in this sandbox
without external fixtures.

Everything here derives from the public spec tables: bitrate and
sample-rate indices (11172-3 §2.4.2.3), the frame-length formula
(§2.4.3.1), Layer III side-info layout (§2.4.1.7: ``main_data_begin``
is the bit-reservoir back-pointer — a frame with value 0 starts a
self-contained decode unit, which is what makes ``cut_points`` exact),
CRC-16 protection (§2.4.3.1, poly 0x8005 over header bytes 2–3 + side
info), the de-facto Xing/Info and Fraunhofer VBRI headers, and the
informal ID3v1 / ID3v2.{2,3,4} tag specs.

Reference parity: the reference repo has no media layer at all; this
module extends the engine's multimodal surface (SURVEY.md LLM-pipeline
operators) so audio payloads can be segmented / filtered / carved at
frame granularity inside actor-pool ``map_batches`` stages without
decoding samples.
"""

from __future__ import annotations

import struct

import numpy as np

# bitrate kbps by (version-class, layer, index); 0 = free-format (we
# reject: frame length unknowable without scanning), index 15 invalid
_BITRATES = {
    # MPEG-1
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
             224, 256, 320),
    # MPEG-2 / 2.5 (same table for layers 2+3)
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
             192, 224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
             128, 144, 160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
             128, 144, 160),
}

_RATES = {1: (44100, 48000, 32000), 2: (22050, 24000, 16000),
          25: (11025, 12000, 8000)}

_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


def _parse_header(b: bytes) -> dict | None:
    """Parse a 4-byte frame header; None if not a valid sync/field
    combination. Free-format (bitrate index 0) is rejected."""
    if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        return None
    ver_bits = (b[1] >> 3) & 0x3
    if ver_bits == 1:                       # reserved
        return None
    version = {0: 25, 2: 2, 3: 1}[ver_bits]
    layer = 4 - ((b[1] >> 1) & 0x3)         # 0b11->L1, 0b01->L3
    if layer == 4:                          # reserved layer bits 0b00
        return None
    protected = not (b[1] & 0x1)            # bit 0 clear => CRC present
    br_idx = (b[2] >> 4) & 0xF
    sr_idx = (b[2] >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    vclass = 1 if version == 1 else 2
    bitrate = _BITRATES[(vclass, layer)][br_idx]
    rate = _RATES[version][sr_idx]
    padding = (b[2] >> 1) & 0x1
    mode = (b[3] >> 6) & 0x3
    channels = 1 if mode == 3 else 2
    if layer == 1:
        spf = 384
        length = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == 1) else 576
        length = spf // 8 * bitrate * 1000 // rate + padding
    return {
        "version": version, "layer": layer, "protected": protected,
        "bitrate_kbps": bitrate, "sample_rate": rate, "padding": padding,
        "mode": _MODES[mode], "channels": channels,
        "samples_per_frame": spf, "frame_length": length,
    }


def _side_info_len(h: dict) -> int:
    """Layer III side-info byte count (11172-3 §2.4.1.7 / 13818-3)."""
    if h["version"] == 1:
        return 17 if h["channels"] == 1 else 32
    return 9 if h["channels"] == 1 else 17


def _main_data_begin(h: dict, frame: bytes) -> int:
    """Bit-reservoir back-pointer of a Layer III frame (first 9 bits of
    side info for MPEG-1, 8 bits for MPEG-2/2.5). 0 = the frame's main
    data starts inside the frame itself — a clean cut point."""
    off = 4 + (2 if h["protected"] else 0)
    if len(frame) < off + 2:
        return 0
    v = (frame[off] << 8) | frame[off + 1]
    return v >> 7 if h["version"] == 1 else v >> 8


def _crc16(data: bytes) -> int:
    """CRC-16 as specified for MPEG audio: poly 0x8005, init 0xFFFF."""
    c = 0xFFFF
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


def crc_ok(h: dict, frame: bytes) -> bool | None:
    """Verify a protected Layer III frame's CRC (covers header bytes
    2–3 and the side info, §2.4.3.1). None = frame carries no CRC or is
    a layer whose protected-bit span we don't model (Layer I/II protect
    the allocation bits instead)."""
    if not h["protected"] or h["layer"] != 3:
        return None
    n = _side_info_len(h)
    if len(frame) < 6 + n:
        return False
    stored = struct.unpack(">H", frame[4:6])[0]
    return _crc16(frame[2:4] + frame[6:6 + n]) == stored


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _id3v2_span(payload: bytes, pos: int = 0) -> tuple[int, int] | None:
    """(start, end) byte span of an ID3v2 tag at ``pos``, or None."""
    if payload[pos:pos + 3] != b"ID3" or len(payload) < pos + 10:
        return None
    if payload[pos + 3] == 0xFF or payload[pos + 4] == 0xFF:
        return None
    if any(x & 0x80 for x in payload[pos + 6:pos + 10]):
        return None                         # size bytes must be syncsafe
    size = _syncsafe(payload[pos + 6:pos + 10])
    end = pos + 10 + size
    if payload[pos + 5] & 0x10:             # footer present (v2.4)
        end += 10
    if end > len(payload):
        raise ValueError("ID3v2 size field exceeds payload")
    return pos, end


def _decode_text(enc: int, data: bytes) -> str:
    if enc == 0:
        return data.decode("latin-1", "replace").rstrip("\x00")
    if enc == 1:
        return data.decode("utf-16", "replace").rstrip("\x00")
    if enc == 2:
        return data.decode("utf-16-be", "replace").rstrip("\x00")
    if enc == 3:
        return data.decode("utf-8", "replace").rstrip("\x00")
    return ""


# frame ids we surface (v2.3/2.4 id -> key, v2.2 3-char id -> key)
_TEXT_FRAMES = {b"TIT2": "title", b"TPE1": "artist", b"TALB": "album",
                b"TYER": "year", b"TDRC": "year", b"TCON": "genre"}
_TEXT_FRAMES_V22 = {b"TT2": "title", b"TP1": "artist", b"TAL": "album",
                    b"TYE": "year", b"TCO": "genre"}


def parse_id3v2(payload: bytes) -> dict:
    """Parse the leading ID3v2.{2,3,4} tag's text frames into a dict
    (title/artist/album/year/genre where present). Empty dict if no
    tag. Handles the v2.3 whole-tag unsynchronisation flag."""
    span = _id3v2_span(payload)
    if span is None:
        return {}
    major = payload[3]
    flags = payload[5]
    body = payload[10:span[1] - (10 if flags & 0x10 else 0)]
    if flags & 0x80:                        # unsynchronisation: FF 00 -> FF
        body = body.replace(b"\xff\x00", b"\xff")
    tags: dict = {"id3v2_version": f"2.{major}"}
    pos = 0
    idlen, szlen = (3, 3) if major == 2 else (4, 4)
    frames = _TEXT_FRAMES_V22 if major == 2 else _TEXT_FRAMES
    while pos + idlen + szlen <= len(body):
        fid = body[pos:pos + idlen]
        if fid.strip(b"\x00") == b"":       # padding reached
            break
        raw = body[pos + idlen:pos + idlen + szlen]
        if major == 2:
            fsz = (raw[0] << 16) | (raw[1] << 8) | raw[2]
        elif major == 4:
            fsz = _syncsafe(raw)
        else:
            fsz = struct.unpack(">I", raw)[0]
        pos += idlen + szlen + (0 if major == 2 else 2)  # +flags bytes
        if fsz > len(body) - pos:
            break
        data = body[pos:pos + fsz]
        key = frames.get(fid)
        if key and fsz >= 1:
            tags[key] = _decode_text(data[0], data[1:])
        pos += fsz
    return tags


def parse_id3v1(payload: bytes) -> dict:
    """Parse the trailing 128-byte ID3v1 tag, if present."""
    if len(payload) < 128 or payload[-128:-125] != b"TAG":
        return {}
    t = payload[-128:]
    f = lambda s: s.split(b"\x00")[0].decode(  # noqa: E731
        "latin-1", "replace").strip()
    return {"title": f(t[3:33]), "artist": f(t[33:63]),
            "album": f(t[63:93]), "year": f(t[93:97]),
            "genre_id": t[127]}


_MAX_RESYNC = 1 << 16   # bytes of junk tolerated before/between frames


def parse_frames(payload: bytes) -> tuple[np.ndarray, np.ndarray, dict]:
    """Walk the elementary stream: returns ``(offsets, lengths, info)``
    int64 arrays of every frame plus a stream-info dict (parameters of
    the first frame, whether the stream is CBR, per-frame bitrates when
    VBR). Skips a leading ID3v2 tag, resyncs across bounded junk,
    stops at a trailing ID3v1/APE tag. Raises ValueError if no valid
    frame sequence exists."""
    start = 0
    span = _id3v2_span(payload)
    if span is not None:
        start = span[1]
    end = len(payload)
    if end - start >= 128 and payload[-128:-125] == b"TAG":
        end -= 128
    offs: list[int] = []
    lens: list[int] = []
    brs: list[int] = []
    first: dict | None = None
    pos = start
    junk = 0
    while pos + 4 <= end:
        h = _parse_header(payload[pos:pos + 4])
        # require the *next* position to also look like a frame header
        # (or be stream end) — a lone false sync in junk data fails this
        if h is not None and h["frame_length"] >= 4:
            nxt = pos + h["frame_length"]
            if nxt > end or (first is not None and (
                    h["version"] != first["version"]
                    or h["layer"] != first["layer"]
                    or h["sample_rate"] != first["sample_rate"])):
                h = None
            elif first is None and nxt + 4 <= end \
                    and _parse_header(payload[nxt:nxt + 4]) is None \
                    and payload[nxt:nxt + 8].rstrip(b"\x00") != b"":
                h = None                    # first frame must chain
        if h is None:
            pos += 1
            junk += 1
            if junk > _MAX_RESYNC:
                raise ValueError("no MPEG audio sync within resync bound")
            continue
        junk = 0
        if first is None:
            first = h
        offs.append(pos)
        lens.append(h["frame_length"])
        brs.append(h["bitrate_kbps"])
        pos += h["frame_length"]
    if first is None:
        raise ValueError("payload contains no MPEG audio frames")
    br = np.asarray(brs, dtype=np.int64)
    info = dict(first)
    info["cbr"] = bool((br == br[0]).all())
    info["bitrate_kbps"] = float(br.mean())
    info["id3_start"] = start
    return (np.asarray(offs, dtype=np.int64),
            np.asarray(lens, dtype=np.int64), info)


def _xing_offset(h: dict) -> int:
    """Offset of a Xing/Info header inside the first frame: after the
    (fixed-size) Layer III side info."""
    return 4 + (2 if h["protected"] else 0) + _side_info_len(h)


def parse_vbr_header(payload: bytes, off: int, h: dict) -> dict:
    """Xing/Info (LAME) or Fraunhofer VBRI metadata in the frame at
    ``off``; empty dict when absent."""
    p = off + _xing_offset(h)
    tag = payload[p:p + 4]
    if tag in (b"Xing", b"Info"):
        flags = struct.unpack(">I", payload[p + 4:p + 8])[0]
        out = {"vbr_scheme": tag.decode(), }
        q = p + 8
        if flags & 1:
            out["vbr_frames"] = struct.unpack(">I", payload[q:q + 4])[0]
            q += 4
        if flags & 2:
            out["vbr_bytes"] = struct.unpack(">I", payload[q:q + 4])[0]
        return out
    q = off + 4 + 32                        # VBRI sits 32 bytes past header
    if payload[q:q + 4] == b"VBRI":
        return {"vbr_scheme": "VBRI",
                "vbr_bytes": struct.unpack(
                    ">I", payload[q + 10:q + 14])[0],
                "vbr_frames": struct.unpack(
                    ">I", payload[q + 14:q + 18])[0]}
    return {}


def mp3_info(payload: bytes) -> dict:
    """One-call stream summary: codec parameters, frame count, duration,
    CBR/VBR, Xing/VBRI data and ID3 tags. The demux analogue of
    ``decode_wav``'s (samples, rate) for a format whose sample decode
    is the declared seam."""
    offs, lens, info = parse_frames(payload)
    n = len(offs)
    vbr = parse_vbr_header(payload, int(offs[0]), info)
    if vbr.get("vbr_frames"):
        # the Xing frame itself carries no audio
        n_audio = vbr["vbr_frames"]
    else:
        n_audio = n
    dur = n_audio * info["samples_per_frame"] / info["sample_rate"]
    tags = parse_id3v2(payload)
    tags.update({k: v for k, v in parse_id3v1(payload).items()
                 if k not in tags})
    return {
        "version": info["version"], "layer": info["layer"],
        "channels": info["channels"], "sample_rate": info["sample_rate"],
        "mode": info["mode"], "cbr": info["cbr"] and not vbr,
        "bitrate_kbps": round(info["bitrate_kbps"], 3),
        "n_frames": n, "duration_sec": round(dur, 6),
        **vbr, "tags": tags,
    }


def cut_points(payload: bytes) -> np.ndarray:
    """Frame indices where a Layer III stream can be cut without
    breaking the bit reservoir: frames whose ``main_data_begin`` is 0
    (§2.4.1.7 — their main data begins at their own side-info end, so
    decode can start there). Index 0 is always included. For Layer I/II
    every frame is self-contained, so all indices are returned."""
    offs, lens, info = parse_frames(payload)
    if info["layer"] != 3:
        return np.arange(len(offs), dtype=np.int64)
    ok = [i for i in range(len(offs))
          if _main_data_begin(
              info, payload[int(offs[i]):int(offs[i] + lens[i])]) == 0]
    if not ok or ok[0] != 0:
        ok = [0] + ok
    return np.asarray(sorted(set(ok)), dtype=np.int64)


def extract_frames(payload: bytes, start: int, count: int) -> bytes:
    """Re-mux frames [start, start+count) as a standalone stream.
    For Layer III, ``start`` should be a ``cut_points`` index or the
    leading frames may reference reservoir bytes that are no longer
    present (decoders then skip those granules — structurally the
    stream stays valid)."""
    offs, lens, _ = parse_frames(payload)
    if not 0 <= start < len(offs) or count < 1:
        raise ValueError("frame range out of bounds")
    stop = min(len(offs) - 1, start + count - 1)
    return payload[int(offs[start]):int(offs[stop] + lens[stop])]


def is_mp3(payload: bytes) -> bool:
    """True when the payload is an MPEG audio stream: a leading ID3v2
    tag, or a frame-header chain from byte 0."""
    try:
        if _id3v2_span(payload) is not None:
            return True
    except ValueError:
        return False
    h = _parse_header(payload[:4])
    if h is None:
        return False
    nxt = h["frame_length"]
    return nxt <= len(payload) and (
        nxt + 4 > len(payload)
        or _parse_header(payload[nxt:nxt + 4]) is not None)


class _SiBits:
    """MSB-first bit reader over a Layer III side-info block."""

    def __init__(self, data: bytes):
        self.v = int.from_bytes(data, "big")
        self.n = len(data) * 8
        self.pos = 0

    def u(self, k: int) -> int:
        if self.pos + k > self.n:
            raise ValueError("side info truncated")
        self.pos += k
        return (self.v >> (self.n - self.pos)) & ((1 << k) - 1)


def _granule_fields(br: _SiBits, mpeg1: bool) -> dict:
    """One granule-channel's fields (11172-3 §2.4.1.7 order; 13818-3
    LSF drops preflag and widens scalefac_compress to 9 bits)."""
    g: dict = {
        "part2_3_length": br.u(12),
        "big_values": br.u(9),
        "global_gain": br.u(8),
        "scalefac_compress": br.u(4 if mpeg1 else 9),
    }
    if g["big_values"] > 288:
        raise ValueError(f"big_values {g['big_values']} exceeds 288 "
                         "(§2.4.2.7: pairs cannot outnumber 576/2 "
                         "frequency lines)")
    wsf = br.u(1)
    g["window_switching"] = bool(wsf)
    if wsf:
        g["block_type"] = br.u(2)
        if g["block_type"] == 0:
            raise ValueError("block_type 0 is forbidden when "
                             "window_switching_flag is set (§2.4.1.7)")
        g["mixed_block_flag"] = bool(br.u(1))
        g["table_select"] = (br.u(5), br.u(5))
        g["subblock_gain"] = (br.u(3), br.u(3), br.u(3))
        # region counts are implied for switched windows (§2.4.2.7)
        g["region0_count"] = 8 if g["block_type"] == 2 \
            and not g["mixed_block_flag"] else 7
        g["region1_count"] = 36
    else:
        g["block_type"] = 0
        g["mixed_block_flag"] = False
        g["table_select"] = (br.u(5), br.u(5), br.u(5))
        g["region0_count"] = br.u(4)
        g["region1_count"] = br.u(3)
    if mpeg1:
        g["preflag"] = bool(br.u(1))
    g["scalefac_scale"] = br.u(1)
    g["count1table_select"] = br.u(1)
    return g


def parse_side_info(h: dict, frame: bytes) -> dict:
    """Full Layer III side-info decode (11172-3 §2.4.1.7 for MPEG-1:
    9-bit reservoir pointer, scfsi, 2 granules; 13818-3 LSF layout for
    MPEG-2/2.5: 8-bit pointer, 1 granule, 9-bit scalefac_compress, no
    preflag). ``h`` is the frame's parsed header; ``frame`` the full
    frame bytes. The bit budget is exact by construction: the reader
    consumes precisely the 9/17/17/32 side-info bytes. Sample decode
    (the Huffman main data these fields describe) stays the declared
    seam — but the side info alone already yields the structural audio
    analysis a crawl pipeline filters on (transient density via short
    blocks, bit-reservoir depth, per-granule bit allocation)."""
    if h["layer"] != 3:
        raise ValueError("side info is a Layer III structure")
    off = 4 + (2 if h["protected"] else 0)
    n = _side_info_len(h)
    if len(frame) < off + n:
        raise ValueError("frame shorter than its side info")
    br = _SiBits(frame[off:off + n])
    mpeg1 = h["version"] == 1
    ch = h["channels"]
    out: dict = {"main_data_begin": br.u(9 if mpeg1 else 8)}
    br.u((5 if ch == 1 else 3) if mpeg1 else (1 if ch == 1 else 2))
    if mpeg1:
        out["scfsi"] = tuple(tuple(br.u(1) for _ in range(4))
                             for _ in range(ch))
    grans = []
    for _ in range(2 if mpeg1 else 1):
        grans.append(tuple(_granule_fields(br, mpeg1)
                           for _ in range(ch)))
    out["granules"] = tuple(grans)
    assert br.pos == n * 8      # layout is exact by spec
    return out


def side_info_summary(payload: bytes) -> dict:
    """Stream-level structural audio analysis without sample decode:
    walk every Layer III frame's side info and aggregate transient
    density (short-block share), bit-reservoir depth and per-granule
    bit allocation. The filter features a crawl pipeline needs from
    audio (silence/music/speech heuristics) at demux cost."""
    offs, lens, info = parse_frames(payload)
    if info["layer"] != 3:
        raise ValueError("side info summary requires Layer III")
    n_gr = 0
    n_short = 0
    reservoir_max = 0
    part_bits = 0
    for o, ln in zip(offs.tolist(), lens.tolist()):
        si = parse_side_info(info, payload[o:o + ln])
        reservoir_max = max(reservoir_max, si["main_data_begin"])
        for gr in si["granules"]:
            for g in gr:
                n_gr += 1
                part_bits += g["part2_3_length"]
                if g["window_switching"] and g["block_type"] == 2:
                    n_short += 1
    return {
        "n_frames": len(offs), "n_granule_channels": n_gr,
        "short_block_share": round(n_short / n_gr, 6) if n_gr else 0.0,
        "reservoir_max_bytes": reservoir_max,
        "mean_part2_3_bits": round(part_bits / n_gr, 3) if n_gr else 0.0,
    }


def decode_mp3(payload: bytes):
    """Layer III sample decode lives in ``mp3dec.py``: the full chain
    (reservoir, scalefactors, Huffman regions, requantize, alias,
    hybrid IMDCT, polyphase synthesis) is implemented and round-trip
    verified against its own subset encoder. The one remaining seam is
    the literal ISO Huffman code assignments + synthesis window
    (11172-3 Tables B.7/B.3) — unverifiable here without external
    fixtures, so they are pluggable ``Mp3Profile`` data; foreign
    streams need the real tables loaded. Use
    ``mp3dec.decode_mp3_samples`` directly."""
    from .mp3dec import decode_mp3_samples
    return decode_mp3_samples(payload)
