"""Pure-stdlib ISO-BMFF (MP4) demuxer + muxer.

Closes the mp4 half of the media seam: the container layer of MP4 is a
plain box grammar (public spec ISO/IEC 14496-12), independent of the
entropy-coded video codecs inside it. This module parses that grammar —
``ftyp``/``moov``/``trak``/``stbl`` down to the sample tables
(``stsd stts stsz stsc stco/co64 stss``) — and resolves every sample's
absolute file offset, size, decode timestamp and keyframe flag. That is
exactly what the reference's frame-sampling stage needs (seek to the
k-th frame / nearest keyframe and hand the payload to a decoder).

Sample payload decode stays codec-dependent: tracks whose sample entry
is ``jpeg`` (Motion-JPEG in MP4, a real and common archival format) or
``png ``/``pgm `` flow straight through the repo's from-scratch codecs
(``functions/jpeg.py`` / ``functions/codecs.py``); H.264/H.265/VP9/AV1
sample DECODE remains the declared seam (README media matrix) — but
demux, frame sampling, keyframe seek and per-sample byte extraction are
real for any conformant file.

The muxer writes a minimal conformant single-video-track file
(``ftyp`` + ``mdat`` + trailing ``moov``) used by the synthetic media
generator and the round-trip tests; hand-built box fixtures in
``tests/test_mp4.py`` keep the parser honest independently of it.

Reference semantics: frame sampling mirrors the reference harness's
media loader contract (decode -> sample -> featurize); the box grammar
is from the public spec, not from the reference.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_FULLBOX = struct.Struct(">I")          # version(1) + flags(3)
_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")


# ------------------------------------------------------------- parsing ----
def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield ``(fourcc, payload_start, payload_end)`` for each box in
    ``buf[start:end]``. Handles 64-bit ``largesize`` (size==1) and
    to-end-of-enclosure boxes (size==0)."""
    pos = start
    while pos + 8 <= end:
        size = _U32.unpack_from(buf, pos)[0]
        fourcc = buf[pos + 4:pos + 8]
        head = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = _U64.unpack_from(buf, pos + 8)[0]
            head = 16
        elif size == 0:
            size = end - pos
        if size < head or pos + size > end:
            raise ValueError(
                f"box {fourcc!r} at {pos} overruns enclosure "
                f"(size={size}, end={end})")
        yield fourcc, pos + head, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, fourcc: bytes
          ) -> tuple[int, int] | None:
    for fc, s, e in _iter_boxes(buf, start, end):
        if fc == fourcc:
            return s, e
    return None


def _full_version(buf: bytes, pos: int) -> int:
    return buf[pos]


@dataclass
class Mp4Track:
    """One track's resolved sample map.

    ``sample_offsets``/``sample_sizes`` are absolute byte ranges into the
    ORIGINAL file buffer (int64/int64 numpy arrays, one entry per
    sample); ``sample_times`` are decode timestamps in ``timescale``
    units; ``sync_samples`` is a sorted int64 array of 0-based keyframe
    indices (``None`` means every sample is a sync sample, per spec)."""
    track_id: int
    handler: str                 # "vide" | "soun" | other fourcc
    codec: str                   # sample-entry fourcc, e.g. "jpeg"
    width: int
    height: int
    timescale: int
    duration: int
    sample_offsets: np.ndarray = field(repr=False)
    sample_sizes: np.ndarray = field(repr=False)
    sample_times: np.ndarray = field(repr=False)
    sync_samples: np.ndarray | None = field(repr=False, default=None)
    # raw first sample-entry body (after its size+fourcc): carries the
    # codec-configuration child boxes (avcC/hvcC/...) for byte-stream
    # conversion — see ``visual_config_box``
    sample_entry: bytes = field(repr=False, default=b"")

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


def _parse_stbl(buf: bytes, s: int, e: int) -> dict:
    """Parse the sample-table children into raw arrays."""
    out: dict = {}
    for fc, cs, ce in _iter_boxes(buf, s, e):
        if fc == b"stsd":
            # FullBox + entry_count, then sample entries (size + fourcc)
            n = _U32.unpack_from(buf, cs + 4)[0]
            entries = []
            pos = cs + 8
            for _ in range(n):
                if pos + 8 > ce:
                    raise ValueError("stsd entries overrun the box")
                esize = _U32.unpack_from(buf, pos)[0]
                if esize < 8:
                    raise ValueError(f"bad stsd entry size {esize}")
                efcc = buf[pos + 4:pos + 8]
                entries.append((efcc, pos + 8, pos + esize))
                pos += esize
            out["stsd"] = entries
        elif fc == b"stts":
            n = _U32.unpack_from(buf, cs + 4)[0]
            a = np.frombuffer(buf, dtype=">u4", count=2 * n,
                              offset=cs + 8).reshape(n, 2)
            out["stts"] = a.astype(np.int64)
        elif fc == b"stsz":
            uniform = _U32.unpack_from(buf, cs + 4)[0]
            count = _U32.unpack_from(buf, cs + 8)[0]
            if uniform:
                if count > len(buf):
                    # a sample is at least one byte: a count beyond the
                    # file size is a malformed header, not a table to
                    # allocate (32 GB np.full from a flipped bit)
                    raise ValueError("stsz count exceeds the file size")
                out["stsz"] = np.full(count, uniform, dtype=np.int64)
            else:
                out["stsz"] = np.frombuffer(
                    buf, dtype=">u4", count=count,
                    offset=cs + 12).astype(np.int64)
        elif fc == b"stsc":
            n = _U32.unpack_from(buf, cs + 4)[0]
            a = np.frombuffer(buf, dtype=">u4", count=3 * n,
                              offset=cs + 8).reshape(n, 3)
            out["stsc"] = a.astype(np.int64)
        elif fc == b"stco":
            n = _U32.unpack_from(buf, cs + 4)[0]
            out["stco"] = np.frombuffer(
                buf, dtype=">u4", count=n, offset=cs + 8).astype(np.int64)
        elif fc == b"co64":
            n = _U32.unpack_from(buf, cs + 4)[0]
            out["stco"] = np.frombuffer(
                buf, dtype=">u8", count=n, offset=cs + 8).astype(np.int64)
        elif fc == b"stss":
            n = _U32.unpack_from(buf, cs + 4)[0]
            # spec sample numbers are 1-based; store 0-based
            out["stss"] = np.frombuffer(
                buf, dtype=">u4", count=n,
                offset=cs + 8).astype(np.int64) - 1
    return out


def _resolve_samples(stbl: dict) -> tuple[np.ndarray, np.ndarray,
                                          np.ndarray]:
    """stsc/stco/stsz/stts -> per-sample (offset, size, decode time).

    The stsc table is run-length over chunks: each row
    ``(first_chunk, samples_per_chunk, desc_idx)`` applies from
    ``first_chunk`` (1-based) until the next row's. Vectorized expansion:
    per-chunk sample counts -> per-sample chunk ids -> offsets =
    chunk_offset[chunk] + cumulative size within the chunk."""
    sizes = stbl.get("stsz")
    chunks = stbl.get("stco")
    stsc = stbl.get("stsc")
    if sizes is None or chunks is None or stsc is None:
        raise ValueError("stbl missing stsz/stco/stsc")
    n_chunks = len(chunks)
    # per-chunk samples_per_chunk via run expansion
    spc = np.empty(n_chunks, dtype=np.int64)
    firsts = stsc[:, 0] - 1                    # 0-based first chunk
    for r in range(len(stsc)):
        lo = int(firsts[r])
        hi = int(firsts[r + 1]) if r + 1 < len(stsc) else n_chunks
        spc[lo:hi] = stsc[r, 1]
    total = int(spc.sum())
    n = len(sizes)
    if n == 0:
        # spec-legal zero-sample track (empty stsz/stsc/stco is how
        # metadata-only tracks are written) — the truncation math below
        # would index an empty array
        empty = np.empty(0, dtype=np.int64)
        return empty, sizes.astype(np.int64), empty.copy()
    if total < n:
        raise ValueError(
            f"stsc/stco cover {total} samples, stsz declares {n}")
    # per-sample chunk id, truncating the run expansion AT n BEFORE
    # materializing (a flipped bit in samples_per_chunk must not turn
    # np.repeat into a multi-GB allocation; the last chunk may also be
    # legitimately short in a truncated-but-valid file)
    cum = np.cumsum(spc)
    k = int(np.searchsorted(cum, n))
    spc_trunc = spc[:k + 1].copy()
    spc_trunc[k] = n - (int(cum[k - 1]) if k else 0)
    chunk_of = np.repeat(np.arange(k + 1), spc_trunc)
    # within-chunk cumulative byte offset of each sample
    csum = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    chunk_start_csum = np.concatenate(
        [[0], np.cumsum(spc)[:-1]]).astype(np.int64)
    # byte offset of each chunk's first sample inside the size stream
    first_sample_of_chunk = chunk_start_csum[chunk_of]
    within = csum - csum[np.minimum(first_sample_of_chunk, n - 1)]
    offsets = chunks[chunk_of] + within
    # decode times from stts runs
    stts = stbl.get("stts")
    if stts is not None and len(stts):
        counts = stts[:, 0]
        tcum = np.cumsum(counts)
        kt = int(np.searchsorted(tcum, n))
        if kt >= len(counts):
            raise ValueError("stts covers fewer samples than stsz")
        counts = counts[:kt + 1].copy()     # truncate BEFORE np.repeat
        counts[kt] = n - (int(tcum[kt - 1]) if kt else 0)
        deltas = np.repeat(stts[:kt + 1, 1], counts)
        times = np.concatenate([[0], np.cumsum(deltas)[:-1]])
    else:
        times = np.zeros(n, dtype=np.int64)
    return offsets.astype(np.int64), sizes, times.astype(np.int64)


def parse_mp4(payload: bytes) -> list[Mp4Track]:
    """Parse an ISO-BMFF buffer into resolved tracks.

    Requires a ``moov`` (progressive-download files put it first; the
    muxer below writes it last — both layouts parse)."""
    end = len(payload)
    moov = _find(payload, 0, end, b"moov")
    if moov is None:
        raise ValueError("no moov box — not an ISO-BMFF file?")
    ms, me = moov
    tracks: list[Mp4Track] = []
    for fc, ts, te in _iter_boxes(payload, ms, me):
        if fc != b"trak":
            continue
        tkhd = _find(payload, ts, te, b"tkhd")
        mdia = _find(payload, ts, te, b"mdia")
        if tkhd is None or mdia is None:
            continue
        ver = _full_version(payload, tkhd[0])
        if ver == 1:
            track_id = _U32.unpack_from(payload, tkhd[0] + 4 + 16)[0]
            fixed_at = tkhd[0] + 4 + 16 + 4 + 4 + 8 + 8 + 2 + 2 + 2 + 2 + 36
        else:
            track_id = _U32.unpack_from(payload, tkhd[0] + 4 + 8)[0]
            # vf + times(8) + id + reserved + duration(4) + reserved(8)
            # + layer/alt/volume/reserved(8) + matrix(36)
            fixed_at = tkhd[0] + 4 + 8 + 4 + 4 + 4 + 8 + 8 + 36
        width = _U32.unpack_from(payload, fixed_at)[0] >> 16
        height = _U32.unpack_from(payload, fixed_at + 4)[0] >> 16
        mdhd = _find(payload, mdia[0], mdia[1], b"mdhd")
        hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
        minf = _find(payload, mdia[0], mdia[1], b"minf")
        if mdhd is None or minf is None:
            continue
        mver = _full_version(payload, mdhd[0])
        if mver == 1:
            timescale = _U32.unpack_from(payload, mdhd[0] + 4 + 16)[0]
            duration = _U64.unpack_from(payload, mdhd[0] + 4 + 20)[0]
        else:
            timescale = _U32.unpack_from(payload, mdhd[0] + 4 + 8)[0]
            duration = _U32.unpack_from(payload, mdhd[0] + 4 + 12)[0]
        handler = (payload[hdlr[0] + 8:hdlr[0] + 12].decode(
            "ascii", "replace") if hdlr else "????")
        stbl_box = _find(payload, minf[0], minf[1], b"stbl")
        if stbl_box is None:
            continue
        stbl = _parse_stbl(payload, *stbl_box)
        entries = stbl.get("stsd") or []
        codec = (entries[0][0].decode("ascii", "replace")
                 if entries else "????")
        offsets, sizes, times = _resolve_samples(stbl)
        tracks.append(Mp4Track(
            track_id=int(track_id), handler=handler, codec=codec,
            width=int(width), height=int(height),
            timescale=int(timescale), duration=int(duration),
            sample_offsets=offsets, sample_sizes=sizes,
            sample_times=times, sync_samples=stbl.get("stss"),
            sample_entry=(bytes(payload[entries[0][1]:entries[0][2]])
                          if entries else b"")))
    return tracks


def visual_config_box(sample_entry: bytes, fourcc: bytes) -> bytes | None:
    """Body of a codec-configuration child box (``avcC``/``hvcC``/...)
    inside a visual sample entry: the fixed 78-byte VisualSampleEntry
    prefix (ISO/IEC 14496-12 §12.1.3) precedes the child boxes. None
    when absent or malformed."""
    pos, end = 78, len(sample_entry)
    while pos + 8 <= end:
        size = _U32.unpack_from(sample_entry, pos)[0]
        if size < 8 or pos + size > end:
            return None
        if sample_entry[pos + 4:pos + 8] == fourcc:
            return sample_entry[pos + 8:pos + size]
        pos += size
    return None


def extract_sample(payload: bytes, track: Mp4Track, i: int) -> bytes:
    """Byte range of the i-th sample (0-based) out of the file buffer."""
    off = int(track.sample_offsets[i])
    return payload[off:off + int(track.sample_sizes[i])]


def video_track(payload: bytes) -> Mp4Track:
    """First ``vide`` track (the frame-sampling target)."""
    for t in parse_mp4(payload):
        if t.handler == "vide":
            return t
    raise ValueError("no video track in mp4 payload")


# -------------------------------------------------------------- muxing ----
def _box(fourcc: bytes, payload: bytes) -> bytes:
    return _U32.pack(8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, _U32.pack((version << 24) | flags) + payload)


_UNITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                            0x40000000)


def encode_mp4_video(frames: list[bytes], *, codec: bytes = b"jpeg",
                     width: int, height: int, timescale: int = 30,
                     frame_duration: int = 1, sync_every: int = 1,
                     codec_config: tuple[bytes, bytes] | None = None,
                     sync_samples: list[int] | None = None) -> bytes:
    """Mux per-frame payloads into a single-video-track MP4.

    ``codec=b"jpeg"`` with JPEG payloads is Motion-JPEG in MP4 — every
    sample is independently decodable, so ``sync_every`` > 1 merely
    exercises the keyframe-seek path. Layout: ftyp, mdat, moov (trailing
    moov keeps chunk offsets computable in one pass). One chunk per
    ``sync_every`` samples so stsc/stco have real multi-chunk structure.
    ``codec_config`` appends a codec-configuration child box
    ``(fourcc, body)`` — e.g. ``(b"avcC", record)`` for ``avc1``
    length-prefixed samples — to the visual sample entry
    (``visual_config_box`` reads it back).
    """
    if not frames:
        raise ValueError("need at least one frame")
    ftyp = _box(b"ftyp", b"isom" + _U32.pack(0x200) + b"isomiso2mp41")
    n = len(frames)
    sync_every = max(1, int(sync_every))
    mdat_payload = b"".join(frames)
    mdat_start = len(ftyp)
    data_start = mdat_start + 8            # into the mdat payload
    sizes = np.fromiter((len(f) for f in frames), dtype=np.int64, count=n)
    offsets = data_start + np.concatenate([[0], np.cumsum(sizes)[:-1]])
    # chunks of sync_every samples; stco = offset of each chunk's first
    chunk_first = np.arange(0, n, sync_every)
    n_chunks = len(chunk_first)
    stco_entries = offsets[chunk_first]
    duration = n * frame_duration

    cfg = (b"" if codec_config is None
           else _box(codec_config[0], codec_config[1]))
    # VisualSampleEntry body is 78 bytes (ISO/IEC 14496-12 §12.1.3.2);
    # declare the size from the built bytes — an earlier hard-coded
    # 8+70 under-declared it, which only mattered once codec_config
    # boxes (read from offset 78 by visual_config_box) followed
    entry_body = (
        b"\x00" * 6 + struct.pack(">H", 1)            # dref index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + _U32.pack(0x480000) + _U32.pack(0x480000)   # 72 dpi
        + _U32.pack(0) + struct.pack(">H", 1)         # frame_count
        + b"\x00" * 32                                # compressorname
        + struct.pack(">Hh", 24, -1) + cfg)
    stsd_entry = _U32.pack(8 + len(entry_body)) + codec + entry_body
    stsd = _full(b"stsd", 0, 0, _U32.pack(1) + stsd_entry)
    stts = _full(b"stts", 0, 0,
                 _U32.pack(1) + _U32.pack(n) + _U32.pack(frame_duration))
    # stsc: first run covers full chunks; a shorter final chunk (n not a
    # multiple of sync_every) needs its own run
    last_count = n - int(chunk_first[-1])
    if n_chunks > 1 and last_count != sync_every:
        stsc_rows = [(1, sync_every, 1), (n_chunks, last_count, 1)]
    else:
        stsc_rows = [(1, last_count if n_chunks == 1 else sync_every, 1)]
    stsc = _full(b"stsc", 0, 0, _U32.pack(len(stsc_rows)) + b"".join(
        struct.pack(">III", *r) for r in stsc_rows))
    stsz = _full(b"stsz", 0, 0, _U32.pack(0) + _U32.pack(n)
                 + b"".join(_U32.pack(int(s)) for s in sizes))
    stco = _full(b"stco", 0, 0, _U32.pack(n_chunks) + b"".join(
        _U32.pack(int(o)) for o in stco_entries))
    if sync_samples is not None:
        # explicit 0-based keyframe indices (e.g. from an H.264
        # remux's IDR detection) override the sync_every pattern
        ss = sorted(set(int(i) for i in sync_samples))
        if not ss or ss[0] < 0 or ss[-1] >= n:
            raise ValueError("sync_samples out of range")
        stss = _full(b"stss", 0, 0, _U32.pack(len(ss)) + b"".join(
            _U32.pack(i + 1) for i in ss))
    elif sync_every == 1:
        stss = b""
    else:
        stss = _full(b"stss", 0, 0, _U32.pack(n_chunks) + b"".join(
            _U32.pack(int(i) + 1) for i in chunk_first))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    dinf = _box(b"dinf", _full(b"dref", 0, 0, _U32.pack(1)
                               + _full(b"url ", 0, 1, b"")))
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, _U32.pack(0) + b"vide" + b"\x00" * 12
                 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, _U32.pack(0) + _U32.pack(0)
                 + _U32.pack(timescale) + _U32.pack(duration)
                 + struct.pack(">HH", 0x55C4, 0))      # und language
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, _U32.pack(0) + _U32.pack(0)
                 + _U32.pack(1) + _U32.pack(0) + _U32.pack(duration)
                 + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
                 + _UNITY_MATRIX
                 + _U32.pack(width << 16) + _U32.pack(height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, _U32.pack(0) + _U32.pack(0)
                 + _U32.pack(timescale) + _U32.pack(duration)
                 + _U32.pack(0x10000) + struct.pack(">H", 0x100)
                 + b"\x00" * 10 + _UNITY_MATRIX + b"\x00" * 24
                 + _U32.pack(2))                       # next_track_id
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def is_mp4(payload: bytes) -> bool:
    """Magic check: a box header whose type is ftyp/moov/mdat/free at
    offset 0 (every ISO-BMFF file starts with some top-level box)."""
    return (len(payload) >= 12
            and payload[4:8] in (b"ftyp", b"moov", b"mdat", b"free",
                                 b"styp", b"wide"))
