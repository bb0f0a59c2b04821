"""Pure-stdlib AVI (RIFF) demuxer/muxer — the classic Motion-JPEG
container (OpenDML/AVI 1.0).

Spec: Microsoft AVI RIFF File Reference + OpenDML AVI extensions.
Demux walks the RIFF/LIST chunk tree: ``hdrl`` (``avih`` main header,
per-stream ``strl`` lists with ``strh`` stream headers and ``strf``
formats), the ``movi`` payload list (``NNdc``/``NNdb`` compressed /
uncompressed video chunks, ``NNwb`` audio) and the optional ``idx1``
index (AVIIF_KEYFRAME flags -> sync samples). Tracks resolve to the
same shape as ``Mp4Track``/``WebmTrack`` (absolute byte ranges +
keyframe indices) so the frame-sampling pipeline stages are
container-agnostic. Mux writes a single-video-stream AVI 1.0 with an
``idx1`` index; ``codec="MJPG"`` with JPEG payloads is Motion-JPEG.

Sample DECODE beyond MJPEG (DIB frames pass through to the BMP/raw
path) stays the declared codec seam; demux/seek/extract here is
codec-independent (README media matrix).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_AVIIF_KEYFRAME = 0x10


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


@dataclass
class AviTrack:
    """Same field shape as ``Mp4Track``/``WebmTrack`` (see
    ``webm.WebmTrack``): absolute byte ranges into the original file
    buffer, times in ``timescale`` ticks/second, ``sync_samples`` a
    sorted int64 array of keyframe indices or None (= all sync)."""
    track_id: int
    handler: str                 # "vide" | "soun" | other
    codec: str                   # strh fccHandler, e.g. "MJPG"
    width: int
    height: int
    timescale: int               # dwRate (ticks/second)
    duration: int                # n_samples * dwScale (ticks)
    sample_offsets: np.ndarray = field(repr=False)
    sample_sizes: np.ndarray = field(repr=False)
    sample_times: np.ndarray = field(repr=False)
    sync_samples: np.ndarray | None = field(repr=False, default=None)

    @property
    def n_samples(self) -> int:
        return int(len(self.sample_sizes))

    def is_sync(self, i: int) -> bool:
        if self.sync_samples is None:
            return True
        j = int(np.searchsorted(self.sync_samples, i))
        return j < len(self.sync_samples) and \
            int(self.sync_samples[j]) == i

    def sync_at_or_before(self, i: int) -> int:
        if self.sync_samples is None:
            return i
        j = int(np.searchsorted(self.sync_samples, i,
                                side="right")) - 1
        return int(self.sync_samples[max(0, j)])


def _iter_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end, list_type) over a RIFF
    chunk run; chunks are word-aligned (odd sizes padded)."""
    pos = start
    while pos + 8 <= end:
        fcc = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        body = pos + 8
        if body + size > end:
            raise ValueError(f"AVI chunk {fcc!r} overruns its parent")
        ltype = buf[body:body + 4] if fcc in (b"LIST", b"RIFF") else b""
        yield fcc, body, body + size, ltype
        pos = body + size + (size & 1)


def _find_list(buf: bytes, start: int, end: int, ltype: bytes):
    for fcc, s, e, lt in _iter_chunks(buf, start, end):
        if fcc == b"LIST" and lt == ltype:
            return s + 4, e
    return None


def parse_avi(payload: bytes) -> list[AviTrack]:
    """Resolve every stream's frame map from hdrl + movi (+ idx1)."""
    if not is_avi(payload):
        raise ValueError("not an AVI (missing RIFF/AVI signature)")
    top_end = 8 + struct.unpack("<I", payload[4:8])[0]
    top_end = min(top_end, len(payload))
    hdrl = _find_list(payload, 12, top_end, b"hdrl")
    movi = _find_list(payload, 12, top_end, b"movi")
    if hdrl is None or movi is None:
        raise ValueError("AVI missing hdrl or movi list")
    # stream headers, in stream order
    streams: list[dict] = []
    for fcc, s, e, lt in _iter_chunks(payload, *hdrl):
        if fcc != b"LIST" or lt != b"strl":
            continue
        info: dict = {}
        for f2, s2, e2, _ in _iter_chunks(payload, s + 4, e):
            if f2 == b"strh":
                (ftype, fcch, _flags, _prio, _lang, _init, scale,
                 rate) = struct.unpack("<4s4sIHHIII",
                                       payload[s2:s2 + 28])
                info["type"] = ftype.decode("latin1")
                info["codec"] = fcch.rstrip(b"\x00").decode("latin1")
                info["scale"] = max(1, scale)
                info["rate"] = max(1, rate)
            elif f2 == b"strf" and info.get("type") == "vids":
                _, w, h = struct.unpack("<Iii", payload[s2:s2 + 12])
                info["width"], info["height"] = w, abs(h)
        if info:
            streams.append(info)
    per = [{"off": [], "size": [], "sync": []} for _ in streams]
    # movi chunks: '##dc'/'##db'/'##wb' (optionally inside 'rec ' lists)
    def walk_movi(s, e):
        for fcc, cs, ce, lt in _iter_chunks(payload, s, e):
            if fcc == b"LIST" and lt == b"rec ":
                walk_movi(cs + 4, ce)
                continue
            if fcc[2:4] in (b"dc", b"db", b"wb") \
                    and fcc[:2].isdigit():
                si = int(fcc[:2])
                if si < len(per):
                    per[si]["off"].append(cs)
                    per[si]["size"].append(ce - cs)
    walk_movi(*movi)
    # idx1 keyframe flags (entries parallel the movi chunk order)
    counters = [0] * len(streams)
    have_idx = False
    for fcc, s, e, _ in _iter_chunks(payload, 12, top_end):
        if fcc != b"idx1":
            continue
        have_idx = True
        for p in range(s, e - 15, 16):
            ckid, flags = struct.unpack("<4sI", payload[p:p + 8])
            if ckid[2:4] in (b"dc", b"db", b"wb") and ckid[:2].isdigit():
                si = int(ckid[:2])
                if si < len(streams):
                    if flags & _AVIIF_KEYFRAME:
                        per[si]["sync"].append(counters[si])
                    counters[si] += 1
    tracks = []
    for si, (info, acc) in enumerate(zip(streams, per)):
        n = len(acc["off"])
        times = np.arange(n, dtype=np.int64) * info.get("scale", 1)
        sync = None
        if have_idx and info.get("type") == "vids":
            sync = np.asarray(sorted(acc["sync"]), dtype=np.int64)
            if len(sync) == n:
                sync = None                     # all frames are sync
        tracks.append(AviTrack(
            track_id=si,
            handler={"vids": "vide", "auds": "soun"}.get(
                info.get("type", ""), info.get("type", "")),
            codec=info.get("codec", ""),
            width=info.get("width", 0), height=info.get("height", 0),
            timescale=info.get("rate", 1),
            duration=n * info.get("scale", 1),
            sample_offsets=np.asarray(acc["off"], dtype=np.int64),
            sample_sizes=np.asarray(acc["size"], dtype=np.int64),
            sample_times=times, sync_samples=sync))
    if not tracks:
        raise ValueError("AVI contains no streams")
    return tracks


def video_track(payload: bytes) -> AviTrack:
    for t in parse_avi(payload):
        if t.handler == "vide" and t.n_samples:
            return t
    raise ValueError("no video stream in AVI payload")


def extract_sample(payload: bytes, track: AviTrack, i: int) -> bytes:
    off = int(track.sample_offsets[i])
    return payload[off:off + int(track.sample_sizes[i])]


def _chunk(fcc: bytes, body: bytes) -> bytes:
    return fcc + struct.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) & 1 else b"")


def encode_avi_video(frames: list[bytes], *, codec: str = "MJPG",
                     width: int, height: int, fps: int = 30,
                     sync_every: int = 1) -> bytes:
    """Mux per-frame payloads into a single-video-stream AVI 1.0 with
    an idx1 index; every ``sync_every``-th frame is flagged
    AVIIF_KEYFRAME (``sync_every=1`` -> all keyframes, the MJPEG
    truth)."""
    if not frames:
        raise ValueError("need at least one frame")
    n = len(frames)
    sync_every = max(1, int(sync_every))
    fcc4 = codec.encode("latin1")[:4].ljust(4, b"\x00")
    max_bytes = max(len(f) for f in frames)
    strh = struct.pack("<4s4sIHHIIIIIIII4i", b"vids", fcc4, 0, 0, 0, 0,
                       1, fps, 0, n, max_bytes, 0xFFFFFFFF, 0,
                       0, 0, width, height)
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       fcc4, width * height * 3, 0, 0, 0, 0)
    strl = _chunk(b"LIST", b"strl" + _chunk(b"strh", strh)
                  + _chunk(b"strf", strf))
    avih = struct.pack("<IIIIIIIIIIIIII",
                       1_000_000 // max(1, fps), 0, 0, 0x10, n, 0, 1,
                       max_bytes, width, height, 0, 0, 0, 0)
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih) + strl)
    movi = bytearray(b"movi")
    idx = bytearray()
    for i, f in enumerate(frames):
        # idx1 offsets are relative to the 'movi' fourcc position
        rel = len(movi)
        movi += _chunk(b"00dc", f)
        flags = _AVIIF_KEYFRAME if i % sync_every == 0 else 0
        idx += struct.pack("<4sIII", b"00dc", flags, rel, len(f))
    body = b"AVI " + hdrl + _chunk(b"LIST", bytes(movi)) \
        + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body
