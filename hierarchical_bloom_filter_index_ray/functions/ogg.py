"""Ogg container demux — RFC 3533 pages, CRC-32 validation, packet
reassembly across pages, stream identification (Opus per RFC 7845,
Vorbis I, Theora, FLAC-in-Ogg, Speex), Opus packet TOC durations
(RFC 6716 §3.1), page-granularity cut points, page carving and re-mux.

Ogg wraps the two dominant crawled open audio codecs (Opus, Vorbis).
Mirrors the repo's container posture (``mp4.py`` / ``webm.py`` /
``avi.py`` / ``mp3.py``): the *structural* layer — page boundaries,
stream parameters, duration, safe split points, packet extraction and
re-mux — is fully implemented and verified against hand-assembled
fixtures built bit-by-bit from the RFC layouts; Opus/Vorbis *sample*
decode (CELT/SILK and MDCT codebook synthesis) is the declared codec
seam alongside H.264/VP9/AV1 and MP3 Layer III (README media matrix).

Everything here derives from public specs: the 27-byte page header,
lacing-value packet segmentation and the page CRC (poly 0x04C11DB7,
init 0, no final XOR, MSB-first) are RFC 3533 §6; the Opus granule
mapping (48 kHz PCM positions, pre-skip subtraction) is RFC 7845 §4–5;
per-packet sample counts come from the Opus TOC byte (RFC 6716 §3.1:
config → frame duration, code → frame count), which lets duration be
computed two independent ways (granule positions vs per-packet TOC
sums) — the tests exploit that redundancy. Vorbis identification-
header offsets are Vorbis I §4.2.2.

Reference parity: the reference repo has no media layer at all; this
module extends the engine's multimodal surface (SURVEY.md LLM-pipeline
operators) so audio payloads can be filtered / segmented / carved at
page granularity inside actor-pool ``map_batches`` stages without
decoding samples.
"""

from __future__ import annotations

import struct

import numpy as np

_OGG_POLY = 0x04C11DB7
_MAX_RESYNC = 1 << 16   # bytes of junk tolerated before/between pages
_MAX_PAGE = 27 + 255 + 255 * 255   # RFC 3533: 65,307 bytes


def _make_crc_tables() -> list[list[int]]:
    """Slice-by-4 tables for the Ogg page CRC (MSB-first 0x04C11DB7).
    T0 is the classic one-byte table; Tk[i] advances Tk-1[i] by one
    more zero byte, the standard slicing recurrence."""
    t0 = []
    for i in range(256):
        c = i << 24
        for _ in range(8):
            c = ((c << 1) ^ _OGG_POLY) & 0xFFFFFFFF if c & 0x80000000 \
                else (c << 1) & 0xFFFFFFFF
        t0.append(c)
    tables = [t0]
    for _ in range(3):
        prev = tables[-1]
        tables.append([((v << 8) & 0xFFFFFFFF) ^ t0[v >> 24]
                       for v in prev])
    return tables


_T0, _T1, _T2, _T3 = _make_crc_tables()


def crc_ogg(data: bytes) -> int:
    """RFC 3533 page CRC: 32-bit, poly 0x04C11DB7, init 0, no final
    XOR, MSB-first (NOT the reflected zlib CRC-32). Slice-by-4."""
    c = 0
    n4 = len(data) // 4 * 4
    if n4:
        for w in np.frombuffer(data, dtype=">u4",
                               count=n4 // 4).tolist():
            x = c ^ w
            c = (_T3[x >> 24] ^ _T2[(x >> 16) & 0xFF]
                 ^ _T1[(x >> 8) & 0xFF] ^ _T0[x & 0xFF])
    for b in data[n4:]:
        c = ((c << 8) & 0xFFFFFFFF) ^ _T0[(c >> 24) ^ b]
    return c


def is_ogg(payload: bytes) -> bool:
    """True when the payload starts with a version-0 Ogg page."""
    return payload[:4] == b"OggS" and len(payload) > 4 \
        and payload[4] == 0


def parse_pages(payload: bytes, check_crc: bool = True) -> list[dict]:
    """Walk the physical stream: one dict per page with ``offset``,
    ``length``, ``flags`` (0x1 continued / 0x2 BOS / 0x4 EOS),
    ``granule`` (signed; -1 = no packet completes on this page),
    ``serial``, ``seq``, ``lacing`` (the raw segment table) and
    ``body_off`` / ``body_len``. Resyncs across bounded junk; a page
    whose CRC fails is treated as junk (decoder posture). Raises
    ValueError when no valid page exists."""
    pages: list[dict] = []
    pos, junk, end = 0, 0, len(payload)
    while pos + 27 <= end:
        if payload[pos:pos + 4] != b"OggS" or payload[pos + 4] != 0:
            pos += 1
            junk += 1
            if junk > _MAX_RESYNC:
                raise ValueError("no Ogg capture pattern within "
                                 "resync bound")
            continue
        nsegs = payload[pos + 26]
        hdr_end = pos + 27 + nsegs
        if hdr_end > end:
            break                           # truncated trailing page
        lacing = payload[pos + 27:hdr_end]
        body_len = sum(lacing)
        if hdr_end + body_len > end:
            break                           # truncated trailing page
        granule = struct.unpack_from("<q", payload, pos + 6)[0]
        serial, seq, crc = struct.unpack_from("<III", payload, pos + 14)
        if check_crc:
            page = bytearray(payload[pos:hdr_end + body_len])
            page[22:26] = b"\x00\x00\x00\x00"
            if crc_ogg(bytes(page)) != crc:
                pos += 1
                junk += 1
                if junk > _MAX_RESYNC:
                    raise ValueError("no CRC-valid Ogg page within "
                                     "resync bound")
                continue
        pages.append({
            "offset": pos, "length": 27 + nsegs + body_len,
            "flags": payload[pos + 5], "granule": granule,
            "serial": serial, "seq": seq, "lacing": lacing,
            "body_off": hdr_end, "body_len": body_len,
        })
        pos = hdr_end + body_len
        junk = 0
    if not pages:
        raise ValueError("payload contains no Ogg pages")
    return pages


def packets(payload: bytes, serial: int | None = None,
            pages: list[dict] | None = None) -> list[bytes]:
    """Reassemble the logical packets of one stream (default: the
    first page's serial). Lacing values of 255 continue a packet into
    the next segment/page; a value < 255 ends it (RFC 3533 §5). A
    fresh (non-continued) page arriving while a packet is pending
    means pages were lost — the partial is dropped, as decoders do.
    A packet still pending at stream end is likewise dropped."""
    if pages is None:
        pages = parse_pages(payload)
    if serial is None:
        serial = pages[0]["serial"]
    out: list[bytes] = []
    pending = bytearray()
    for pg in pages:
        if pg["serial"] != serial:
            continue
        if pending and not pg["flags"] & 0x1:
            pending.clear()                 # lost-page recovery
        body_off = pg["body_off"]
        off = 0
        for lac in pg["lacing"]:
            pending += payload[body_off + off:body_off + off + lac]
            off += lac
            if lac < 255:
                out.append(bytes(pending))
                pending.clear()
    return out


def _first_packet(payload: bytes, pages: list[dict],
                  serial: int) -> bytes:
    """The stream's first complete packet (the identification header
    in every Ogg codec mapping), spanning pages if needed."""
    pending = bytearray()
    for pg in pages:
        if pg["serial"] != serial:
            continue
        body_off, off = pg["body_off"], 0
        for lac in pg["lacing"]:
            pending += payload[body_off + off:body_off + off + lac]
            off += lac
            if lac < 255:
                return bytes(pending)
    return bytes(pending)


def _identify(first: bytes) -> dict:
    """Codec + parameters from a stream's first packet. Opus ident
    layout is RFC 7845 §5.1; Vorbis I §4.2.2; the Ogg-FLAC mapping
    embeds a native fLaC STREAMINFO at offset 9."""
    if first[:8] == b"OpusHead" and len(first) >= 19:
        return {
            "codec": "opus", "opus_version": first[8],
            "channels": first[9],
            "pre_skip": struct.unpack_from("<H", first, 10)[0],
            "input_sample_rate": struct.unpack_from("<I", first, 12)[0],
            "output_gain_q8": struct.unpack_from("<h", first, 16)[0],
            "mapping_family": first[18],
            # Opus granules are 48 kHz PCM positions regardless of the
            # coded bandwidth (RFC 7845 §4)
            "granule_rate": 48000,
        }
    if first[:7] == b"\x01vorbis" and len(first) >= 30 \
            and struct.unpack_from("<I", first, 7)[0] == 0:
        rate = struct.unpack_from("<I", first, 12)[0]
        b = first[28]
        return {
            "codec": "vorbis", "channels": first[11],
            "sample_rate": rate,
            "bitrate_maximum": struct.unpack_from("<i", first, 16)[0],
            "bitrate_nominal": struct.unpack_from("<i", first, 20)[0],
            "bitrate_minimum": struct.unpack_from("<i", first, 24)[0],
            "blocksize_0": 1 << (b & 0xF), "blocksize_1": 1 << (b >> 4),
            "granule_rate": rate,
        }
    if first[:7] == b"\x80theora":
        # identification header, Theora spec §6.2 (big-endian fields)
        out = {"codec": "theora"}
        if len(first) >= 42:
            fmbw, fmbh = struct.unpack_from(">HH", first, 10)
            picw = int.from_bytes(first[14:17], "big")
            pich = int.from_bytes(first[17:20], "big")
            frn, frd = struct.unpack_from(">II", first, 22)
            kfg = ((first[40] & 0x03) << 3) | (first[41] >> 5)
            pf = (first[41] >> 3) & 0x3
            out.update(width=picw or fmbw * 16,
                       height=pich or fmbh * 16,
                       frame_mb_width=fmbw, frame_mb_height=fmbh,
                       fps_num=frn, fps_den=frd,
                       kfg_shift=kfg, pixel_format=pf)
            if frn and frd:
                out["granule_rate"] = frn / frd
        return out
    if first[:5] == b"\x7fFLAC" and first[9:13] == b"fLaC":
        out = {"codec": "flac"}
        try:
            from .flac import _parse_streaminfo
            si = _parse_streaminfo(first[9:])
            out.update(channels=si["channels"],
                       sample_rate=si["sample_rate"],
                       granule_rate=si["sample_rate"])
        except (ValueError, KeyError, IndexError):
            pass
        return out
    if first[:8] == b"Speex   ":
        return {"codec": "speex"}
    return {"codec": "unknown"}


# Opus TOC: per-frame samples at 48 kHz by config number (RFC 6716
# §3.1): configs 0-11 SILK (10/20/40/60 ms per bandwidth group),
# 12-15 Hybrid (10/20 ms), 16-31 CELT (2.5/5/10/20 ms per group).
_SILK_FS = (480, 960, 1920, 2880)
_HYBRID_FS = (480, 960)
_CELT_FS = (120, 240, 480, 960)


def opus_packet_samples(packet: bytes) -> int:
    """PCM samples (at 48 kHz) an Opus packet decodes to, from its TOC
    byte alone (RFC 6716 §3.1): frame duration from the config field,
    frame count from the code field (code 3 reads the frame-count
    byte). Raises ValueError on malformed packets, including the
    spec's 120 ms ceiling (R5)."""
    if not packet:
        raise ValueError("empty Opus packet")
    toc = packet[0]
    config, code = toc >> 3, toc & 0x3
    if config < 12:
        fs = _SILK_FS[config & 0x3]
    elif config < 16:
        fs = _HYBRID_FS[config & 0x1]
    else:
        fs = _CELT_FS[config & 0x3]
    if code == 0:
        n = 1
    elif code in (1, 2):
        n = 2
    else:
        if len(packet) < 2:
            raise ValueError("code-3 Opus packet missing frame-count "
                             "byte")
        n = packet[1] & 0x3F
        if n == 0:
            raise ValueError("code-3 Opus packet with zero frames")
    total = n * fs
    if total > 5760:                        # 120 ms at 48 kHz
        raise ValueError("Opus packet exceeds the 120 ms limit")
    return total


def opus_stream_samples(payload: bytes, serial: int | None = None
                        ) -> int:
    """Total PCM samples of an Ogg-Opus stream summed packet-by-packet
    from the TOC bytes — independent of granule positions, so it
    cross-checks them (RFC 7845 §4: final granule = pre-skip + total
    samples when the stream is not end-trimmed). The two header
    packets (OpusHead, OpusTags) carry no audio."""
    pkts = packets(payload, serial=serial)
    if len(pkts) < 2 or pkts[0][:8] != b"OpusHead":
        raise ValueError("not an Ogg-Opus stream")
    return sum(opus_packet_samples(p) for p in pkts[2:])


def ogg_info(payload: bytes, check_crc: bool = True) -> dict:
    """One-call physical-stream summary: every logical stream's codec,
    parameters, page/granule extent and duration (granule mapping:
    Opus = 48 kHz positions minus pre-skip, Vorbis/FLAC = PCM sample
    positions). Top-level convenience fields mirror the first
    identified audio stream — the demux analogue of ``mp3_info``."""
    pages = parse_pages(payload, check_crc)
    order: list[int] = []
    by_serial: dict[int, dict] = {}
    for pg in pages:
        s = by_serial.get(pg["serial"])
        if s is None:
            s = by_serial[pg["serial"]] = {
                "serial": pg["serial"], "n_pages": 0,
                "last_granule": None, "bos": False, "eos": False,
            }
            order.append(pg["serial"])
        s["n_pages"] += 1
        if pg["flags"] & 0x2:
            s["bos"] = True
        if pg["flags"] & 0x4:
            s["eos"] = True
        if pg["granule"] != -1:
            s["last_granule"] = pg["granule"]
    streams = []
    for serial in order:
        s = by_serial[serial]
        ident = _identify(_first_packet(payload, pages, serial))
        s.update(ident)
        g, rate = s["last_granule"], ident.get("granule_rate")
        if g is not None and rate:
            if ident["codec"] == "opus":
                g = max(0, g - ident["pre_skip"])
            elif ident["codec"] == "theora":
                # granule = (last_keyframe << kfg_shift) + offset;
                # frame index = keyframe_no + offset (Theora §5.3.1)
                kfg = ident.get("kfg_shift", 0)
                g = (g >> kfg) + (g & ((1 << kfg) - 1))
                s["n_frames"] = g + 1
            s["duration_sec"] = round(g / rate, 6)
        streams.append(s)
    out: dict = {"n_pages": len(pages), "n_streams": len(streams),
                 "streams": streams}
    for s in streams:                       # first audio stream wins
        if s["codec"] in ("opus", "vorbis", "flac", "speex"):
            for k in ("codec", "channels", "sample_rate",
                      "duration_sec"):
                if k in s:
                    out[k] = s[k]
            break
    else:
        out["codec"] = streams[0]["codec"]
    return out


def cut_points(payload: bytes) -> np.ndarray:
    """Page indices where the stream can be cut without splitting a
    packet: pages whose continued flag (0x1) is clear start a fresh
    packet, so decode can resume there (RFC 3533 §5). Index 0 is
    always a cut point. (Codec semantics may still require the header
    packets to be re-prepended — same caveat as ``mp3.cut_points``'s
    reservoir note.)"""
    pages = parse_pages(payload)
    return np.asarray([i for i, pg in enumerate(pages)
                       if i == 0 or not pg["flags"] & 0x1],
                      dtype=np.int64)


def extract_pages(payload: bytes, start: int, count: int) -> bytes:
    """Carve pages [start, start+count) verbatim (their CRCs remain
    valid — bytes are unchanged). ``start`` should be a ``cut_points``
    index or the leading packet will be a continuation fragment, which
    ``packets`` (and real decoders) drop. Sequence numbers are NOT
    renumbered: the carve is a chain excerpt, as produced by live-
    stream joins, which demuxers accept after the first page."""
    pages = parse_pages(payload)
    if not 0 <= start < len(pages) or count < 1:
        raise ValueError("page range out of bounds")
    stop = min(len(pages) - 1, start + count - 1)
    return payload[pages[start]["offset"]:
                   pages[stop]["offset"] + pages[stop]["length"]]


def _lacing(n: int) -> list[int]:
    """Segment-table encoding of an n-byte packet: 255s then the
    remainder — an exact multiple of 255 needs a terminating 0."""
    return [255] * (n // 255) + [n % 255]


def theora_keyframe_pages(payload: bytes, *,
                          check_crc: bool = True) -> np.ndarray:
    """Byte offsets of pages in the (first) Theora stream whose
    completed granule position sits exactly ON a keyframe (granule
    offset bits == 0, Theora §5.3.1) — the structural carve points
    for Ogg-Theora video, the analogue of ``h264.cut_points`` /
    ``mp3.cut_points``. Sample (DCT/loop-filter) decode stays the
    declared seam; granule math needs none of it."""
    pages = parse_pages(payload, check_crc)
    serial = kfg = None
    for pg in pages:
        if pg["flags"] & 0x2:               # BOS: identify
            ident = _identify(_first_packet(payload, pages,
                                            pg["serial"]))
            if ident["codec"] == "theora":
                serial = pg["serial"]
                kfg = ident.get("kfg_shift", 0)
                break
    if serial is None:
        raise ValueError("no Theora stream in Ogg payload")
    mask = (1 << kfg) - 1
    cuts = [pg["offset"] for pg in pages
            if pg["serial"] == serial and pg["granule"] > 0
            and (pg["granule"] & mask) == 0]
    return np.asarray(sorted(set(cuts)), dtype=np.int64)


def mux_ogg(pkts: list[bytes], serial: int = 0,
            granules: list[int] | None = None) -> bytes:
    """Re-mux packets as a fresh single-stream physical stream: BOS on
    the first page, EOS on the last, packets split across pages with
    the continued flag when their lacing exceeds a page's 255-segment
    table, page CRCs computed per RFC 3533 §6. ``granules[i]`` is the
    granule position after packet i completes (default: the packet's
    index); pages where no packet completes carry -1."""
    if not pkts:
        raise ValueError("cannot mux zero packets")
    if granules is None:
        granules = list(range(len(pkts)))
    if len(granules) != len(pkts):
        raise ValueError("granules must align with packets")
    # flatten to (lacing value, source packet index) pairs
    flat: list[tuple[int, int]] = []
    for i, p in enumerate(pkts):
        flat += [(v, i) for v in _lacing(len(p))]
    out = bytearray()
    seq = 0
    pos = 0                                 # index into flat
    offsets = [0] * len(pkts)               # consumed bytes per packet
    continued = False
    while pos < len(flat):
        segs = flat[pos:pos + 255]
        pos += len(segs)
        body = bytearray()
        granule = -1
        for v, i in segs:
            body += pkts[i][offsets[i]:offsets[i] + v]
            offsets[i] += v
            if v < 255:
                granule = granules[i]
        flags = (0x1 if continued else 0) \
            | (0x2 if seq == 0 else 0) \
            | (0x4 if pos >= len(flat) else 0)
        hdr = bytearray(b"OggS\x00")
        hdr.append(flags)
        hdr += struct.pack("<qIII", granule, serial, seq, 0)
        hdr.append(len(segs))
        hdr += bytes(v for v, _ in segs)
        page = hdr + body
        struct.pack_into("<I", page, 22, crc_ogg(bytes(page)))
        out += page
        seq += 1
        continued = segs[-1][0] == 255
    return bytes(out)


def decode_ogg(payload: bytes) -> tuple["np.ndarray", int]:
    """Decode the first VORBIS stream of an Ogg physical stream to PCM
    (``functions/vorbis.py`` — full from-scratch Vorbis I decode; the
    stream's own setup header carries every codebook, so no external
    table is involved). Returns (samples (n, channels) float64, rate).

    Opus sample decode (SILK/CELT) remains the declared codec seam —
    unlike Vorbis its codebooks are normative blobs in RFC 6716, not
    in-stream data."""
    from .vorbis import VorbisError, decode_vorbis_packets

    pgs = parse_pages(payload)
    if not pgs:
        raise ValueError("no Ogg pages")
    # find the first Vorbis stream among the BOS serials
    serial = None
    for pg in pgs:
        if not pg["flags"] & 0x2:
            continue
        first = _first_packet(payload, pgs, pg["serial"])
        ident = _identify(first) if first else {"codec": "unknown"}
        if ident["codec"] == "vorbis":
            serial = pg["serial"]
            break
        if ident["codec"] == "opus":
            raise NotImplementedError(
                "Ogg Opus sample decode is the declared codec seam "
                "(normative RFC 6716 codebooks); the structural layer "
                "(ogg_info/packets/cut_points/extract_pages) and full "
                "Vorbis decode are implemented")
    if serial is None:
        raise VorbisError("no Vorbis stream in Ogg payload")
    pkts = packets(payload, serial=serial, pages=pgs)
    grans = [pg["granule"] for pg in pgs
             if pg["serial"] == serial and pg["granule"] >= 0]
    total = grans[-1] if grans else None
    return decode_vorbis_packets(pkts, total)


def encode_ogg_vorbis(pcm, rate: int, **kwargs) -> bytes:
    """PCM → complete Ogg-Vorbis physical stream (subset encoder +
    RFC 3533 mux with proper granule positions)."""
    from .vorbis import encode_vorbis_packets

    pkts, _total, granules = encode_vorbis_packets(pcm, rate, **kwargs)
    return mux_ogg(pkts, serial=0xBEE5, granules=granules)
