"""MP3 demux tests. Fixtures are hand-assembled from the public header
formula (ISO 11172-3 §2.4.2.3/§2.4.3.1) by an independent test-side
synthesizer — the parser is never checked against its own output
conventions, mirroring the JPEG/FLAC test strategy."""

import struct
import zlib

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions import mp3

_VER_BITS = {1: 3, 2: 2, 25: 0}
_LAYER_BITS = {1: 3, 2: 2, 3: 1}
_BR_IDX = {  # kbps -> index, per version class/layer (subset used here)
    (1, 3): {32: 1, 64: 5, 128: 9, 192: 11, 320: 14},
    (1, 1): {448: 14, 32: 1},
    (1, 2): {384: 14, 48: 2},
    (2, 3): {8: 1, 64: 8, 160: 14},
    (2, 2): {160: 14, 8: 1},
}
_SR_IDX = {44100: 0, 48000: 1, 32000: 2,
           22050: 0, 24000: 1, 16000: 2,
           11025: 0, 12000: 1, 8000: 2}


def header(version=1, layer=3, kbps=128, rate=44100, pad=0,
           protected=False, mode=0):
    vclass = 1 if version == 1 else 2
    b1 = 0xE0 | (_VER_BITS[version] << 3) | (_LAYER_BITS[layer] << 1) \
        | (0 if protected else 1)
    b2 = (_BR_IDX[(vclass, layer)][kbps] << 4) | (_SR_IDX[rate] << 2) \
        | (pad << 1)
    return bytes([0xFF, b1, b2, mode << 6])


def frame_len(version, layer, kbps, rate, pad):
    if layer == 1:
        return (12 * kbps * 1000 // rate + pad) * 4
    spf = 1152 if (layer == 2 or version == 1) else 576
    return spf // 8 * kbps * 1000 // rate + pad


def make_frame(version=1, layer=3, kbps=128, rate=44100, pad=0,
               protected=False, mode=0, mdb=0, fill=0x55):
    """One spec-shaped frame: header [+CRC] + side info (mdb planted in
    the first bits) + deterministic filler to the formula length."""
    h = header(version, layer, kbps, rate, pad, protected, mode)
    n = frame_len(version, layer, kbps, rate, pad)
    si_len = (17 if mode == 3 else 32) if version == 1 \
        else (9 if mode == 3 else 17)
    si = bytearray(si_len)
    if version == 1:
        si[0] = (mdb << 7) >> 8
        si[1] = (mdb << 7) & 0xFF
    else:
        si[0] = mdb & 0xFF
    body_off = 4 + (2 if protected else 0) + si_len
    out = bytearray(h)
    if protected:
        # CRC over header bytes 2-3 + side info, poly 0x8005 init 0xFFFF
        c = 0xFFFF
        for b in h[2:4] + bytes(si):
            c ^= b << 8
            for _ in range(8):
                c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                    else (c << 1) & 0xFFFF
        out += struct.pack(">H", c)
    out += si
    out += bytes([fill]) * (n - body_off)
    assert len(out) == n
    return bytes(out)


# ---------------------------------------------------------------- headers

KNOWN_LENGTHS = [
    # (version, layer, kbps, rate, pad) -> public frame sizes
    ((1, 3, 128, 44100, 0), 417),
    ((1, 3, 128, 44100, 1), 418),
    ((1, 3, 320, 48000, 0), 960),
    ((1, 1, 448, 32000, 0), 672),
    ((1, 2, 384, 48000, 0), 1152),
    ((2, 3, 64, 22050, 0), 208),
    ((25, 3, 8, 8000, 0), 72),
]


def test_header_fields_and_lengths():
    for (v, layer, k, r, p), want in KNOWN_LENGTHS:
        h = mp3._parse_header(header(v, layer, k, r, p))
        assert h is not None, (v, layer, k, r)
        assert h["version"] == v and h["layer"] == layer
        assert h["bitrate_kbps"] == k and h["sample_rate"] == r
        assert h["frame_length"] == want


def test_header_rejects_reserved_and_free():
    assert mp3._parse_header(b"\x00\x00\x00\x00") is None
    assert mp3._parse_header(b"\xff\xe0\x90\x00") is None  # reserved ver
    bad_layer = bytes([0xFF, 0xE0 | (3 << 3) | (0 << 1) | 1, 0x90, 0])
    assert mp3._parse_header(bad_layer) is None
    free = bytes([0xFF, 0xFB, 0x00, 0x00])                 # br idx 0
    assert mp3._parse_header(free) is None
    bad_sr = bytes([0xFF, 0xFB, 0x9C, 0x00])               # sr idx 3
    assert mp3._parse_header(bad_sr) is None


# ----------------------------------------------------------------- frames

def test_parse_frames_cbr_with_padding_alternation():
    fs = [make_frame(pad=i % 2, fill=0x20 + i) for i in range(10)]
    payload = b"".join(fs)
    offs, lens, info = mp3.parse_frames(payload)
    assert len(offs) == 10
    assert lens.tolist() == [len(f) for f in fs]
    assert info["cbr"] and info["bitrate_kbps"] == 128.0
    assert offs[0] == 0 and (np.diff(offs) == lens[:-1]).all()


def test_parse_frames_resync_over_junk():
    junk = bytes(range(1, 200)) * 2                # no 0xFF bytes
    payload = junk + b"".join(make_frame() for _ in range(3))
    offs, _, _ = mp3.parse_frames(payload)
    assert len(offs) == 3 and offs[0] == len(junk)
    with pytest.raises(ValueError):
        mp3.parse_frames(bytes(200000))            # nothing to sync on


def test_parse_frames_vbr_mean_bitrate():
    fs = [make_frame(kbps=k) for k in (64, 128, 192)]
    offs, lens, info = mp3.parse_frames(b"".join(fs))
    assert len(offs) == 3 and not info["cbr"]
    assert info["bitrate_kbps"] == pytest.approx((64 + 128 + 192) / 3)


def test_single_frame_stream():
    f = make_frame()
    offs, lens, _ = mp3.parse_frames(f)
    assert offs.tolist() == [0] and lens.tolist() == [len(f)]


def test_crc_protected_frame():
    f = make_frame(protected=True)
    h = mp3._parse_header(f[:4])
    assert h["protected"] and mp3.crc_ok(h, f) is True
    bad = bytearray(f)
    bad[7] ^= 0x01                                  # flip a side-info bit
    assert mp3.crc_ok(h, bytes(bad)) is False
    unprot = make_frame()
    assert mp3.crc_ok(mp3._parse_header(unprot[:4]), unprot) is None


# ------------------------------------------------------------------- tags

def _id3v2(major, frames, flags=0):
    body = b""
    for fid, text in frames:
        if major == 2:
            body += fid + len(text).to_bytes(3, "big") + text
        else:
            sz = len(text)
            if major == 4:
                raw = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                             (sz >> 7) & 0x7F, sz & 0x7F])
            else:
                raw = struct.pack(">I", sz)
            body += fid + raw + b"\x00\x00" + text
    size = len(body)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3" + bytes([major, 0, flags]) + ss + body


def test_id3v23_latin1_and_utf16():
    tag = _id3v2(3, [(b"TIT2", b"\x00Hello"),
                     (b"TPE1", "﻿Café".encode("utf-16-le").join(
                         [b"\x01", b""])),
                     (b"TALB", b"\x00Album")])
    payload = tag + make_frame() * 2
    t = mp3.parse_id3v2(payload)
    assert t["title"] == "Hello" and t["album"] == "Album"
    assert t["artist"] == "Café" and t["id3v2_version"] == "2.3"
    offs, _, info = mp3.parse_frames(payload)
    assert offs[0] == len(tag) == info["id3_start"]


def test_id3v22_and_v24():
    t22 = mp3.parse_id3v2(_id3v2(2, [(b"TT2", b"\x00Old")]) + make_frame())
    assert t22["title"] == "Old" and t22["id3v2_version"] == "2.2"
    t24 = mp3.parse_id3v2(
        _id3v2(4, [(b"TDRC", b"\x032024"),
                   (b"TIT2", b"\x03" + "Née".encode("utf-8"))])
        + make_frame())
    assert t24["year"] == "2024" and t24["title"] == "Née"


def test_id3v1_trailer():
    def pad30(s):
        return s.encode().ljust(30, b"\x00")
    tag = b"TAG" + pad30("T1") + pad30("A1") + pad30("L1") \
        + b"1999" + pad30("") + bytes([17])
    payload = make_frame() * 3 + tag
    offs, _, _ = mp3.parse_frames(payload)
    assert len(offs) == 3                           # tag not scanned
    t = mp3.parse_id3v1(payload)
    assert t == {"title": "T1", "artist": "A1", "album": "L1",
                 "year": "1999", "genre_id": 17}


def test_id3v2_size_bomb_rejected():
    bomb = b"ID3\x03\x00\x00\x7f\x7f\x7f\x7f" + b"x" * 16
    with pytest.raises(ValueError):
        mp3.parse_frames(bomb)
    assert mp3.is_mp3(bomb) is False


# ------------------------------------------------------------ info / VBR

def test_mp3_info_cbr():
    payload = _id3v2(3, [(b"TIT2", b"\x00T")]) \
        + b"".join(make_frame(pad=i % 2) for i in range(38)) \
        + b"TAG" + bytes(125)
    info = mp3.mp3_info(payload)
    assert info["n_frames"] == 38 and info["cbr"]
    assert info["sample_rate"] == 44100 and info["channels"] == 2
    assert info["duration_sec"] == pytest.approx(38 * 1152 / 44100)
    assert info["tags"]["title"] == "T"


def test_xing_vbr_header():
    first = bytearray(make_frame(fill=0))
    off = mp3._xing_offset(mp3._parse_header(bytes(first[:4])))
    blob = b"Xing" + struct.pack(">I", 3) + struct.pack(">II", 99, 12345)
    first[off:off + len(blob)] = blob
    payload = bytes(first) + b"".join(make_frame() for _ in range(4))
    info = mp3.mp3_info(payload)
    assert info["vbr_scheme"] == "Xing" and info["vbr_frames"] == 99
    assert info["vbr_bytes"] == 12345 and not info["cbr"]
    assert info["duration_sec"] == pytest.approx(99 * 1152 / 44100)


def test_mono_mpeg2():
    payload = b"".join(
        make_frame(version=2, kbps=64, rate=22050, mode=3)
        for _ in range(5))
    info = mp3.mp3_info(payload)
    assert info["channels"] == 1 and info["version"] == 2
    assert info["samples_per_frame"] == 576 \
        if "samples_per_frame" in info else True
    assert info["duration_sec"] == pytest.approx(5 * 576 / 22050,
                                                 abs=1e-6)


# -------------------------------------------------- cut points / extract

def test_cut_points_main_data_begin():
    mdbs = [0, 100, 0, 7, 0, 0, 511, 3]
    payload = b"".join(make_frame(mdb=m) for m in mdbs)
    cuts = mp3.cut_points(payload)
    assert cuts.tolist() == [0, 2, 4, 5]


def test_cut_points_layer2_all_frames():
    payload = b"".join(make_frame(layer=2, kbps=384, rate=48000)
                       for _ in range(4))
    assert mp3.cut_points(payload).tolist() == [0, 1, 2, 3]


def test_extract_frames_reparses():
    fs = [make_frame(fill=0x30 + i) for i in range(8)]
    payload = b"".join(fs)
    clip = mp3.extract_frames(payload, 2, 3)
    assert clip == b"".join(fs[2:5])
    offs, lens, _ = mp3.parse_frames(clip)
    assert len(offs) == 3
    with pytest.raises(ValueError):
        mp3.extract_frames(payload, 99, 1)


# -------------------------------------------------------- dispatch / fuzz

def test_is_mp3_dispatch():
    assert mp3.is_mp3(make_frame() * 2)
    assert mp3.is_mp3(_id3v2(3, [(b"TIT2", b"\x00x")]) + make_frame())
    assert not mp3.is_mp3(b"\x89PNG\r\n\x1a\n" + bytes(100))
    assert not mp3.is_mp3(b"\xff\xd8\xff\xe0" + bytes(100))
    assert not mp3.is_mp3(b"")
    assert not mp3.is_mp3(b"fLaC" + bytes(100))


def test_decode_delegates_to_sample_codec():
    """decode_mp3 now routes into mp3dec's full Layer III chain: a
    structural frame made of 0x55 filler either decodes (garbage side
    info can still be a legal all-zero-ish granule) or fails with the
    untrusted-bytes contract — never any other exception. A Layer II
    stream still names the declared subset."""
    try:
        samples, rate = mp3.decode_mp3(make_frame(fill=0, mode=3) * 2)
        assert rate == 44100 and samples.shape[1] == 1
    except (ValueError, NotImplementedError):
        pass
    l2 = make_frame(layer=2, kbps=384) * 2
    with pytest.raises(NotImplementedError):
        mp3.decode_mp3(l2)


def test_fuzz_never_crashes():
    rng = np.random.default_rng(zlib.crc32(b"mp3-fuzz"))
    base = b"".join(make_frame(pad=i % 2) for i in range(6))
    for trial in range(200):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 8)):
            buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
        for fn in (mp3.is_mp3,):
            fn(bytes(buf))
        try:
            mp3.mp3_info(bytes(buf))
            mp3.cut_points(bytes(buf))
        except (ValueError, NotImplementedError):
            pass
    for trial in range(100):                       # pure-noise payloads
        buf = rng.integers(0, 256, size=rng.integers(0, 4096),
                           dtype=np.uint8).tobytes()
        mp3.is_mp3(buf)
        try:
            mp3.mp3_info(buf)
        except (ValueError, NotImplementedError):
            pass


# -------------------------------------------------------------- side info

class SiW:
    """Independent MSB-first bit writer for side-info fixtures."""

    def __init__(self):
        self.bits: list[int] = []

    def u(self, n, v):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def to_bytes(self):
        assert len(self.bits) % 8 == 0, len(self.bits)
        return bytes(int("".join(map(str, self.bits[i:i + 8])), 2)
                     for i in range(0, len(self.bits), 8))


def granule_bits(w, mpeg1=True, part23=1500, big_values=120, gain=200,
                 sfc=7, short=False, tables=(11, 9, 5), regions=(6, 4),
                 subgain=(1, 2, 3), preflag=1, sfs=1, c1t=0,
                 block_type=2, mixed=0):
    w.u(12, part23).u(9, big_values).u(8, gain)
    w.u(4 if mpeg1 else 9, sfc)
    if short:
        w.u(1, 1).u(2, block_type).u(1, mixed)
        w.u(5, tables[0]).u(5, tables[1])
        for g in subgain:
            w.u(3, g)
    else:
        w.u(1, 0)
        for t in tables:
            w.u(5, t)
        w.u(4, regions[0]).u(3, regions[1])
    if mpeg1:
        w.u(1, preflag)
    w.u(1, sfs).u(1, c1t)


def test_side_info_mpeg1_stereo_mixed_blocks():
    w = SiW()
    w.u(9, 300)                         # main_data_begin
    w.u(3, 0)                           # private bits (stereo)
    for bit in (1, 0, 1, 1, 0, 1, 0, 0):   # scfsi 2 channels x 4
        w.u(1, bit)
    granule_bits(w, part23=2000, big_values=288, gain=180,
                 tables=(24, 13, 2), regions=(5, 2), preflag=0)
    granule_bits(w, short=True, block_type=2, mixed=1, sfc=9,
                 subgain=(7, 0, 2), part23=900, big_values=30)
    granule_bits(w, part23=1234, big_values=100, tables=(1, 2, 3))
    granule_bits(w, short=True, block_type=3, part23=10, big_values=0,
                 sfc=0, subgain=(0, 0, 0))
    si = w.to_bytes()
    assert len(si) == 32
    frame = make_frame(version=1, mode=0)
    frame = frame[:4] + si + frame[4 + 32:]
    h = mp3._parse_header(frame[:4])
    out = mp3.parse_side_info(h, frame)
    assert out["main_data_begin"] == 300
    assert out["scfsi"] == ((1, 0, 1, 1), (0, 1, 0, 0))
    (g0l, g0r), (g1l, g1r) = out["granules"]
    assert g0l["part2_3_length"] == 2000 and g0l["big_values"] == 288
    assert g0l["table_select"] == (24, 13, 2)
    assert (g0l["region0_count"], g0l["region1_count"]) == (5, 2)
    assert g0l["preflag"] is False and g0l["block_type"] == 0
    assert g0r["window_switching"] and g0r["block_type"] == 2
    assert g0r["mixed_block_flag"] is True
    assert g0r["subblock_gain"] == (7, 0, 2)
    assert g0r["region0_count"] == 7          # mixed short: 7, not 8
    assert g1l["table_select"] == (1, 2, 3)
    assert g1r["block_type"] == 3 and g1r["big_values"] == 0


def test_side_info_mpeg2_mono_lsf():
    w = SiW()
    w.u(8, 17)                          # main_data_begin (8-bit LSF)
    w.u(1, 0)                           # private (mono)
    granule_bits(w, mpeg1=False, sfc=300, part23=555, big_values=42,
                 short=True, block_type=2, mixed=0, subgain=(1, 1, 1))
    si = w.to_bytes()
    assert len(si) == 9
    frame = make_frame(version=2, kbps=64, rate=22050, mode=3)
    frame = frame[:4] + si + frame[4 + 9:]
    h = mp3._parse_header(frame[:4])
    out = mp3.parse_side_info(h, frame)
    assert out["main_data_begin"] == 17
    assert "scfsi" not in out
    assert len(out["granules"]) == 1
    g = out["granules"][0][0]
    assert g["scalefac_compress"] == 300     # 9-bit LSF field
    assert "preflag" not in g
    assert g["region0_count"] == 8           # pure short blocks
    assert g["big_values"] == 42


def test_side_info_validation():
    h = mp3._parse_header(header())
    # big_values > 288
    w = SiW()
    w.u(9, 0).u(3, 0)
    w.u(8, 0)
    granule_bits(w, big_values=289)
    granule_bits(w)
    granule_bits(w)
    granule_bits(w)
    frame = header() + w.to_bytes() + bytes(380)
    with pytest.raises(ValueError, match="big_values"):
        mp3.parse_side_info(h, frame)
    # window switching with block_type 0 is forbidden
    w = SiW()
    w.u(9, 0).u(3, 0).u(8, 0)
    w.u(12, 0).u(9, 0).u(8, 0).u(4, 0)
    w.u(1, 1).u(2, 0)                   # wsf=1, block_type=0
    while len(w.bits) % 8:
        w.u(1, 0)
    frame = header() + w.to_bytes() + bytes(400)
    with pytest.raises(ValueError, match="block_type 0"):
        mp3.parse_side_info(h, frame)
    # truncated frame
    with pytest.raises(ValueError, match="shorter"):
        mp3.parse_side_info(h, header() + bytes(10))
    # not layer III
    h2 = mp3._parse_header(header(layer=2, kbps=384, rate=48000))
    with pytest.raises(ValueError, match="Layer III"):
        mp3.parse_side_info(h2, make_frame(layer=2, kbps=384,
                                           rate=48000))


def test_side_info_summary_zero_frames():
    # all-zero side info: long blocks everywhere, empty reservoir
    payload = b"".join(make_frame(mdb=0) for _ in range(6))
    s = mp3.side_info_summary(payload)
    assert s["n_frames"] == 6
    assert s["n_granule_channels"] == 6 * 2 * 2
    assert s["short_block_share"] == 0.0
    assert s["reservoir_max_bytes"] == 0


def test_side_info_summary_counts_short_blocks():
    w = SiW()
    w.u(9, 101).u(3, 0).u(8, 0)
    granule_bits(w, short=True, block_type=2, mixed=0)   # short
    granule_bits(w)                                      # long
    granule_bits(w, short=True, block_type=2, mixed=0)   # short
    granule_bits(w, short=True, block_type=3, mixed=0)   # stop, not short
    si = w.to_bytes()
    f = make_frame()
    f = f[:4] + si + f[4 + 32:]
    payload = f + make_frame(mdb=0)
    s = mp3.side_info_summary(payload)
    assert s["n_frames"] == 2
    assert s["short_block_share"] == pytest.approx(2 / 8)
    assert s["reservoir_max_bytes"] == 101
    assert s["mean_part2_3_bits"] > 0
