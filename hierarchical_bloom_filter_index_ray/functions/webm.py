"""Pure-stdlib Matroska / WebM demuxer + muxer.

Closes the webm half of the media seam the same way ``functions/mp4.py``
closed the ISO-BMFF half: the container layer of Matroska is a plain
EBML element grammar (public spec, RFC 8794 + the Matroska element
registry), independent of the entropy-coded codecs inside it. This
module parses that grammar — EBML header, ``Segment`` → ``Info`` /
``Tracks`` / ``Cluster`` — and resolves every frame's absolute file
offset, size, decode timestamp and keyframe flag, including all three
Matroska lacing modes (Xiph, fixed, EBML) and unknown-size Segments /
Clusters as written by live-streaming muxers.

Frame payload decode stays codec-dependent: tracks whose ``CodecID`` is
``V_MJPEG`` (Motion-JPEG in Matroska, a real archival format) flow
straight through the repo's from-scratch JPEG codec
(``functions/jpeg.py``); VP8/VP9/AV1 frame DECODE remains the declared
seam (README media matrix) — but demux, frame sampling, keyframe seek
and per-frame byte extraction are real for any conformant file.

The muxer writes a minimal conformant single-video-track file (EBML
header + Segment with Info/Tracks and one Cluster per keyframe group of
``sync_every`` SimpleBlocks) used by the synthetic media generator and
the round-trip tests; hand-built EBML fixtures in ``tests/test_webm.py``
keep the parser honest independently of it.

Reference semantics: frame sampling mirrors the reference harness's
media loader contract (decode -> sample -> featurize); the EBML grammar
is from the public spec, not from the reference.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

# Matroska element IDs (stored form, marker bit included).
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_UID = 0x73C5
_TRACK_TYPE = 0x83
_FLAG_LACING = 0x9C
_CODEC_ID = 0x86
_VIDEO = 0xE0
_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_CODEC_PRIVATE = 0x63A2
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_REFERENCE_BLOCK = 0xFB
_MUXING_APP = 0x4D80
_WRITING_APP = 0x5741

# IDs that terminate an unknown-size Cluster: any Segment-level child.
_SEGMENT_LEVEL = frozenset({
    _CLUSTER, _INFO, _TRACKS, 0x114D9B74,       # SeekHead
    0x1C53BB6B, 0x1043A770, 0x1254C367, 0x1941A469})  # Cues/Chapters/Tags/Att


# --------------------------------------------------------- EBML parsing ----
def _read_vint(buf: bytes, pos: int, *, keep_marker: bool
               ) -> tuple[int, int]:
    """Read one EBML variable-length integer at ``pos``.

    Returns ``(value, next_pos)``. ``keep_marker=True`` reads an element
    ID (the length-marker bit stays part of the value, per RFC 8794);
    ``keep_marker=False`` reads a size/number (marker stripped). A size
    whose value bits are all ones decodes to -1 (unknown size)."""
    if pos >= len(buf):
        raise ValueError("truncated EBML varint")
    first = buf[pos]
    if first == 0:
        raise ValueError(f"invalid EBML varint lead byte 0x00 at {pos}")
    length = 8 - first.bit_length() + 1
    if pos + length > len(buf):
        raise ValueError("truncated EBML varint body")
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | buf[pos + i]
    if not keep_marker and val == (1 << (7 * length)) - 1:
        val = -1                                   # unknown size
    return val, pos + length


def _iter_elements(buf: bytes, start: int, end: int,
                   stop_ids: frozenset[int] = frozenset()):
    """Yield ``(id, payload_start, payload_end)`` for each element in
    ``buf[start:end]``. An unknown-size element extends to the next
    sibling whose ID is in ``stop_ids`` (else to ``end``) — the spec's
    rule for streamed Segments/Clusters."""
    pos = start
    while pos < end:
        eid, p = _read_vint(buf, pos, keep_marker=True)
        size, p = _read_vint(buf, p, keep_marker=False)
        if size < 0:                               # unknown size
            e = end
            if stop_ids:
                scan = p
                while scan < end:
                    nid, q = _read_vint(buf, scan, keep_marker=True)
                    if nid in stop_ids:
                        e = scan
                        break
                    nsz, q = _read_vint(buf, q, keep_marker=False)
                    scan = end if nsz < 0 else q + nsz
        else:
            e = p + size
            if e > end:
                raise ValueError(
                    f"element 0x{eid:X} at {pos} overruns enclosure "
                    f"(size={size}, end={end})")
        yield eid, p, e
        pos = e


def _find(buf: bytes, start: int, end: int, eid: int,
          stop_ids: frozenset[int] = frozenset()) -> tuple[int, int] | None:
    for i, s, e in _iter_elements(buf, start, end, stop_ids):
        if i == eid:
            return s, e
    return None


def _uint(buf: bytes, s: int, e: int) -> int:
    return int.from_bytes(buf[s:e], "big")


def _float(buf: bytes, s: int, e: int) -> float:
    if e - s == 4:
        return struct.unpack(">f", buf[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", buf[s:e])[0]
    raise ValueError(f"bad float element width {e - s}")


# ------------------------------------------------------------- demuxing ----
@dataclass
class WebmTrack:
    """One track's resolved frame map (same shape as ``Mp4Track`` so the
    frame-sampling stages are container-agnostic).

    ``sample_offsets``/``sample_sizes`` are absolute byte ranges into the
    ORIGINAL file buffer; ``sample_times`` are decode timestamps in
    ``timescale`` units (ticks/second = 1e9 / TimestampScale);
    ``sync_samples`` is a sorted int64 array of 0-based keyframe indices
    (``None`` means every frame is a keyframe)."""
    track_id: int
    handler: str                 # "vide" | "soun" | other
    codec: str                   # CodecID, e.g. "V_MJPEG"
    width: int
    height: int
    timescale: int
    duration: int
    sample_offsets: np.ndarray = field(repr=False)
    sample_sizes: np.ndarray = field(repr=False)
    sample_times: np.ndarray = field(repr=False)
    sync_samples: np.ndarray | None = field(repr=False, default=None)
    codec_private: bytes | None = field(repr=False, default=None)
    sample_rate: int = 0         # audio tracks: SamplingFrequency
    channels: int = 0            # audio tracks: Channels

    @property
    def n_samples(self) -> int:
        return int(len(self.sample_sizes))

    def is_sync(self, i: int) -> bool:
        if self.sync_samples is None:
            return True
        j = int(np.searchsorted(self.sync_samples, i))
        return j < len(self.sync_samples) and int(self.sync_samples[j]) == i

    def sync_at_or_before(self, i: int) -> int:
        """Nearest keyframe index <= i (keyframe-seek rule)."""
        if self.sync_samples is None:
            return i
        j = int(np.searchsorted(self.sync_samples, i, side="right")) - 1
        return int(self.sync_samples[max(0, j)])


def _lace_sizes(buf: bytes, pos: int, end: int, mode: int
                ) -> tuple[list[int], int]:
    """Decode a block's lacing header at ``pos``. Returns the size of
    every laced frame (the last one implied by the remaining bytes) and
    the offset where frame data begins."""
    if pos >= end:
        raise ValueError("truncated lacing header")
    n_laced = buf[pos] + 1
    pos += 1
    sizes: list[int] = []
    if mode == 2:                                  # fixed-size lacing
        total = end - pos
        if total % n_laced:
            raise ValueError("fixed lacing: data not divisible")
        return [total // n_laced] * n_laced, pos
    if mode == 1:                                  # Xiph
        for _ in range(n_laced - 1):
            s = 0
            while True:
                if pos >= end:
                    raise ValueError("truncated Xiph lacing sizes")
                b = buf[pos]
                pos += 1
                s += b
                if b != 255:
                    break
            sizes.append(s)
    else:                                          # EBML lacing
        first, pos = _read_vint(buf, pos, keep_marker=False)
        sizes.append(first)
        for _ in range(n_laced - 2):
            raw_pos = pos
            delta, pos = _read_vint(buf, pos, keep_marker=False)
            # signed vint: subtract the mid-range bias 2^(7*len-1) - 1
            length = pos - raw_pos
            sizes.append(sizes[-1] + delta - ((1 << (7 * length - 1)) - 1))
    sizes.append((end - pos) - sum(sizes))
    if any(s < 0 for s in sizes):
        raise ValueError("laced frame sizes overrun block")
    return sizes, pos


def _parse_block(buf: bytes, s: int, e: int, cluster_ts: int,
                 keyframe: bool | None, acc: dict) -> None:
    """Append a (Simple)Block's frames to the per-track accumulator.
    ``keyframe=None`` means SimpleBlock (flag bit 0x80 decides);
    a bool means Block-in-BlockGroup (ReferenceBlock absence decided)."""
    tnum, pos = _read_vint(buf, s, keep_marker=False)
    if pos + 3 > e:
        raise ValueError("truncated block header")
    rel = struct.unpack_from(">h", buf, pos)[0]
    flags = buf[pos + 2]
    pos += 3
    if keyframe is None:
        keyframe = bool(flags & 0x80)
    lacing = (flags >> 1) & 3
    rows = acc.setdefault(tnum, [])
    t = cluster_ts + rel
    if lacing == 0:
        rows.append((pos, e - pos, t, keyframe))
        return
    sizes, pos = _lace_sizes(buf, pos, e, lacing)
    for sz in sizes:
        rows.append((pos, sz, t, keyframe))
        pos += sz


def parse_webm(payload: bytes) -> list[WebmTrack]:
    """Parse a Matroska/WebM buffer into resolved tracks."""
    end = len(payload)
    head = _find(payload, 0, end, _EBML)
    if head is None:
        raise ValueError("no EBML header — not a Matroska file?")
    seg = None
    pos = head[1]
    for eid, s, e in _iter_elements(payload, pos, end,
                                    frozenset({_SEGMENT})):
        if eid == _SEGMENT:
            seg = (s, e)
            break
    if seg is None:
        raise ValueError("no Segment element")
    ss, se = seg
    timescale_ns = 1_000_000                       # spec default
    duration_ticks = 0.0
    meta: dict[int, dict] = {}
    frames: dict[int, list] = {}
    for eid, s, e in _iter_elements(payload, ss, se, _SEGMENT_LEVEL):
        if eid == _INFO:
            ts = _find(payload, s, e, _TIMESTAMP_SCALE)
            if ts is not None:
                timescale_ns = _uint(payload, *ts)
            du = _find(payload, s, e, _DURATION)
            if du is not None:
                duration_ticks = _float(payload, *du)
        elif eid == _TRACKS:
            for tid, ts_, te in _iter_elements(payload, s, e):
                if tid != _TRACK_ENTRY:
                    continue
                ent: dict = {"type": 0, "codec": "????", "w": 0, "h": 0}
                for cid, cs, ce in _iter_elements(payload, ts_, te):
                    if cid == _TRACK_NUMBER:
                        ent["num"] = _uint(payload, cs, ce)
                    elif cid == _TRACK_TYPE:
                        ent["type"] = _uint(payload, cs, ce)
                    elif cid == _CODEC_ID:
                        ent["codec"] = payload[cs:ce].decode(
                            "ascii", "replace")
                    elif cid == _VIDEO:
                        w = _find(payload, cs, ce, _PIXEL_WIDTH)
                        h = _find(payload, cs, ce, _PIXEL_HEIGHT)
                        ent["w"] = _uint(payload, *w) if w else 0
                        ent["h"] = _uint(payload, *h) if h else 0
                    elif cid == _AUDIO:
                        sf = _find(payload, cs, ce, _SAMPLING_FREQ)
                        chn = _find(payload, cs, ce, _CHANNELS)
                        ent["rate"] = (round(_float(payload, *sf))
                                       if sf else 0)
                        ent["ch"] = _uint(payload, *chn) if chn else 0
                    elif cid == _CODEC_PRIVATE:
                        ent["priv"] = payload[cs:ce]
                if "num" in ent:
                    meta[ent["num"]] = ent
        elif eid == _CLUSTER:
            cluster_ts = 0
            for cid, cs, ce in _iter_elements(payload, s, e,
                                              _SEGMENT_LEVEL):
                if cid == _CLUSTER_TS:
                    cluster_ts = _uint(payload, cs, ce)
                elif cid == _SIMPLE_BLOCK:
                    _parse_block(payload, cs, ce, cluster_ts, None, frames)
                elif cid == _BLOCK_GROUP:
                    blk = None
                    has_ref = False
                    for gid, gs, ge in _iter_elements(payload, cs, ce):
                        if gid == _BLOCK:
                            blk = (gs, ge)
                        elif gid == _REFERENCE_BLOCK:
                            has_ref = True
                    if blk is not None:
                        # keyframe iff the group carries no ReferenceBlock
                        _parse_block(payload, blk[0], blk[1], cluster_ts,
                                     not has_ref, frames)
    ticks_per_sec = max(1, round(1_000_000_000 / timescale_ns))
    handler_by_type = {1: "vide", 2: "soun", 17: "subt"}
    tracks: list[WebmTrack] = []
    for num, ent in sorted(meta.items()):
        rows = frames.get(num, [])
        offs = np.array([r[0] for r in rows], dtype=np.int64)
        sizes = np.array([r[1] for r in rows], dtype=np.int64)
        times = np.array([r[2] for r in rows], dtype=np.int64)
        sync = np.flatnonzero(
            np.array([r[3] for r in rows], dtype=bool)).astype(np.int64)
        tracks.append(WebmTrack(
            track_id=int(num),
            handler=handler_by_type.get(ent["type"], f"t{ent['type']}"),
            codec=ent["codec"], width=int(ent["w"]), height=int(ent["h"]),
            timescale=ticks_per_sec, duration=int(duration_ticks),
            sample_offsets=offs, sample_sizes=sizes, sample_times=times,
            sync_samples=None if len(sync) == len(rows) else sync,
            codec_private=ent.get("priv"),
            sample_rate=int(ent.get("rate", 0)),
            channels=int(ent.get("ch", 0))))
    return tracks


def extract_sample(payload: bytes, track: WebmTrack, i: int) -> bytes:
    """Byte range of the i-th frame (0-based) out of the file buffer."""
    off = int(track.sample_offsets[i])
    return payload[off:off + int(track.sample_sizes[i])]


def video_track(payload: bytes) -> WebmTrack:
    """First video track (the frame-sampling target)."""
    for t in parse_webm(payload):
        if t.handler == "vide":
            return t
    raise ValueError("no video track in webm payload")


def is_webm(payload: bytes) -> bool:
    """Magic check: every Matroska/WebM file starts with the EBML header
    element ID."""
    return payload[:4] == b"\x1aE\xdf\xa3"


# -------------------------------------------------------------- muxing ----
def _enc_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _enc_size(n: int) -> bytes:
    """Minimal-length EBML size (marker bit set)."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:            # all-ones is reserved
            return ((1 << (7 * length)) | n).to_bytes(length, "big")
    raise ValueError("size too large for EBML vint")


def _el(eid: int, body: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(body)) + body


def _uint_el(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def encode_webm_video(frames: list[bytes], *, codec: str = "V_MJPEG",
                      width: int, height: int, timescale: int = 30,
                      frame_duration: int = 1, sync_every: int = 1
                      ) -> bytes:
    """Mux per-frame payloads into a single-video-track WebM/Matroska.

    ``codec="V_MJPEG"`` with JPEG payloads is Motion-JPEG in Matroska —
    every frame independently decodable, so ``sync_every`` > 1 merely
    exercises the keyframe-seek path: one Cluster per ``sync_every``
    frames, keyframe flag on each cluster's first SimpleBlock only.
    ``timescale`` is ticks/second (TimestampScale = 1e9/timescale ns).
    """
    if not frames:
        raise ValueError("need at least one frame")
    sync_every = max(1, int(sync_every))
    n = len(frames)
    header = _el(_EBML, b"".join([
        _uint_el(0x4286, 1), _uint_el(0x42F7, 1),   # EBML(Read)Version
        _uint_el(0x42F2, 4), _uint_el(0x42F3, 8),   # MaxIDLength/SizeLength
        _el(_DOCTYPE, b"webm"),
        _uint_el(0x4287, 2), _uint_el(0x4285, 2)])) # DocType(Read)Version
    ts_scale = max(1, round(1_000_000_000 / timescale))
    info = _el(_INFO, b"".join([
        _uint_el(_TIMESTAMP_SCALE, ts_scale),
        _el(_DURATION, struct.pack(">d", float(n * frame_duration))),
        _el(_MUXING_APP, b"hbir"), _el(_WRITING_APP, b"hbir")]))
    tracks = _el(_TRACKS, _el(_TRACK_ENTRY, b"".join([
        _uint_el(_TRACK_NUMBER, 1), _uint_el(_TRACK_UID, 1),
        _uint_el(_FLAG_LACING, 0), _uint_el(_TRACK_TYPE, 1),
        _el(_CODEC_ID, codec.encode("ascii")),
        _el(_VIDEO, _uint_el(_PIXEL_WIDTH, width)
            + _uint_el(_PIXEL_HEIGHT, height))])))
    clusters = []
    for first in range(0, n, sync_every):
        t0 = first * frame_duration
        body = [_uint_el(_CLUSTER_TS, t0)]
        for i in range(first, min(n, first + sync_every)):
            rel = i * frame_duration - t0
            flags = 0x80 if (i == first or sync_every == 1) else 0x00
            body.append(_el(_SIMPLE_BLOCK,
                            b"\x81" + struct.pack(">h", rel)
                            + bytes([flags]) + frames[i]))
        clusters.append(_el(_CLUSTER, b"".join(body)))
    return header + _el(_SEGMENT, info + tracks + b"".join(clusters))


# ------------------------------------------------------- audio (Vorbis) ----

def audio_track(payload: bytes) -> WebmTrack:
    """First audio track."""
    for t in parse_webm(payload):
        if t.handler == "soun":
            return t
    raise ValueError("no audio track in webm payload")


def split_xiph_private(priv: bytes) -> list[bytes]:
    """CodecPrivate for Vorbis-in-Matroska: Xiph lacing of the three
    header packets — count byte (must be 2 = n-1), 255-run sizes for
    the first two, remainder is the third (Matroska codec spec)."""
    if not priv or priv[0] != 2:
        raise ValueError("CodecPrivate is not 3 Xiph-laced packets")
    sizes = []
    pos = 1
    for _ in range(2):
        n = 0
        while True:
            if pos >= len(priv):
                raise ValueError("truncated Xiph lacing")
            b = priv[pos]
            pos += 1
            n += b
            if b < 255:
                break
        sizes.append(n)
    out = []
    for n in sizes:
        if pos + n > len(priv):
            raise ValueError("Xiph lacing overruns CodecPrivate")
        out.append(priv[pos:pos + n])
        pos += n
    out.append(priv[pos:])
    return out


def _xiph_private(pkts: list[bytes]) -> bytes:
    assert len(pkts) == 3
    out = bytearray([2])
    for p in pkts[:2]:
        n = len(p)
        out += b"\xff" * (n // 255) + bytes([n % 255])
    for p in pkts:
        out += p
    return bytes(out)


def decode_webm_audio(payload: bytes) -> tuple["np.ndarray", int]:
    """Decode the first audio track (A_VORBIS) to PCM (n, channels):
    CodecPrivate carries the three Vorbis headers (Xiph lacing), each
    block frame is one Vorbis audio packet. A_OPUS remains the declared
    Opus seam."""
    trk = audio_track(payload)
    if trk.codec == "A_OPUS":
        raise NotImplementedError(
            "Opus sample decode is the declared codec seam (normative "
            "RFC 6716 codebooks); A_VORBIS decodes fully")
    if trk.codec != "A_VORBIS":
        raise ValueError(f"unsupported webm audio codec {trk.codec!r}")
    from .vorbis import decode_vorbis_packets

    if trk.codec_private is None:
        raise ValueError("A_VORBIS track without CodecPrivate headers")
    headers = split_xiph_private(trk.codec_private)
    frames = [extract_sample(payload, trk, i)
              for i in range(trk.n_samples)]
    pcm, rate = decode_vorbis_packets(headers + frames, None)
    if trk.duration and trk.timescale:
        total = round(trk.duration * rate / trk.timescale)
        if 0 < total < len(pcm):
            pcm = pcm[:total]
    return pcm, rate


def encode_webm_audio(pcm, rate: int, *, packets_per_cluster: int = 16,
                      **vorbis_kwargs) -> bytes:
    """PCM → audio-only WebM with an A_VORBIS track: subset Vorbis
    encoder + Xiph-laced CodecPrivate, one packet per SimpleBlock,
    millisecond timestamp scale."""
    import numpy as _np

    from .vorbis import encode_vorbis_packets

    pkts, total, granules = encode_vorbis_packets(pcm, rate,
                                                  **vorbis_kwargs)
    channels = 1 if _np.asarray(pcm).ndim == 1 \
        else _np.asarray(pcm).shape[1]
    header = _el(_EBML, b"".join([
        _uint_el(0x4286, 1), _uint_el(0x42F7, 1),
        _uint_el(0x42F2, 4), _uint_el(0x42F3, 8),
        _el(_DOCTYPE, b"webm"),
        _uint_el(0x4287, 2), _uint_el(0x4285, 2)]))
    ts_scale = 1_000_000                     # 1 ms ticks
    dur_ms = float(total) * 1000.0 / rate
    info = _el(_INFO, b"".join([
        _uint_el(_TIMESTAMP_SCALE, ts_scale),
        _el(_DURATION, struct.pack(">d", dur_ms)),
        _el(_MUXING_APP, b"hbir"), _el(_WRITING_APP, b"hbir")]))
    tracks = _el(_TRACKS, _el(_TRACK_ENTRY, b"".join([
        _uint_el(_TRACK_NUMBER, 1), _uint_el(_TRACK_UID, 1),
        _uint_el(_FLAG_LACING, 0), _uint_el(_TRACK_TYPE, 2),
        _el(_CODEC_ID, b"A_VORBIS"),
        _el(_CODEC_PRIVATE, _xiph_private(pkts[:3])),
        _el(_AUDIO, _el(_SAMPLING_FREQ, struct.pack(">f", float(rate)))
            + _uint_el(_CHANNELS, channels))])))
    audio = pkts[3:]
    agrans = granules[3:]
    clusters = []
    for first in range(0, len(audio), packets_per_cluster):
        chunk = audio[first:first + packets_per_cluster]
        t0 = round(agrans[first] * 1000.0 / rate)
        body = [_uint_el(_CLUSTER_TS, t0)]
        for j, frame in enumerate(chunk):
            t = round(agrans[first + j] * 1000.0 / rate)
            body.append(_el(_SIMPLE_BLOCK,
                            b"\x81" + struct.pack(">h", t - t0)
                            + b"\x80" + frame))
        clusters.append(_el(_CLUSTER, b"".join(body)))
    return header + _el(_SEGMENT, info + tracks + b"".join(clusters))
