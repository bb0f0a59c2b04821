"""Ogg demux tests. Fixtures are hand-assembled from the RFC 3533
page layout by an independent test-side synthesizer with a bit-by-bit
CRC — the parser is never checked against its own output conventions,
mirroring the JPEG/FLAC/MP3 test strategy. The Opus duration tests
exploit the spec's redundancy: granule positions (RFC 7845 §4) and
per-packet TOC sums (RFC 6716 §3.1) must agree."""

import struct

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions import ogg


def crc_bitwise(data: bytes) -> int:
    """Independent reference CRC: MSB-first 0x04C11DB7, init 0, no
    final XOR — one bit at a time, no tables."""
    c = 0
    for b in data:
        c ^= b << 24
        for _ in range(8):
            c = ((c << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if c & 0x80000000 \
                else (c << 1) & 0xFFFFFFFF
    return c


def page(segments, serial=7, seq=0, granule=-1, flags=0, version=0,
         bad_crc=False):
    """Build one page from a list of segment byte-strings (each must
    be < 256 bytes; packet spanning is expressed by the caller passing
    255-byte segments)."""
    body = b"".join(segments)
    hdr = bytearray(b"OggS")
    hdr.append(version)
    hdr.append(flags)
    hdr += struct.pack("<qIII", granule, serial, seq, 0)
    hdr.append(len(segments))
    hdr += bytes(len(s) for s in segments)
    pg = bytes(hdr) + body
    crc = crc_bitwise(pg)
    if bad_crc:
        crc ^= 0xDEADBEEF
    return pg[:22] + struct.pack("<I", crc) + pg[26:]


def segmentize(packet: bytes) -> list[bytes]:
    """RFC 3533 lacing for one packet: 255-byte segments then the
    remainder (possibly empty, for exact multiples of 255)."""
    segs = [packet[i:i + 255] for i in range(0, len(packet), 255)]
    if not segs or len(segs[-1]) == 255:
        segs.append(b"")
    return segs


def opus_head(channels=2, pre_skip=312, rate=48000):
    return (b"OpusHead" + bytes([1, channels])
            + struct.pack("<HIhB", pre_skip, rate, 0, 0))


def opus_tags():
    return b"OpusTags" + struct.pack("<I", 4) + b"test" \
        + struct.pack("<I", 0)


def vorbis_ident(channels=2, rate=44100):
    return (b"\x01vorbis" + struct.pack("<IBI", 0, channels, rate)
            + struct.pack("<iii", 0, 128000, 0)
            + bytes([(11 << 4) | 8]) + b"\x01")


class TestCrc:
    def test_matches_bitwise_reference(self):
        rng = np.random.default_rng(7)
        for n in (0, 1, 2, 3, 4, 5, 7, 8, 64, 255, 1000):
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            assert ogg.crc_ogg(data) == crc_bitwise(data), n

    def test_known_distinct_from_zlib(self):
        # the Ogg CRC is NOT the reflected zlib CRC-32
        import zlib
        d = b"OggS\x00\x02" + bytes(20)
        assert ogg.crc_ogg(d) != zlib.crc32(d)


class TestPages:
    def test_parse_three_pages(self):
        p = (page([b"first packet"], seq=0, flags=0x2, granule=0)
             + page([b"second", b"third"], seq=1, granule=2)
             + page([b"last"], seq=2, flags=0x4, granule=3))
        pages = ogg.parse_pages(p)
        assert [pg["seq"] for pg in pages] == [0, 1, 2]
        assert pages[0]["flags"] & 0x2 and pages[2]["flags"] & 0x4
        assert [pg["granule"] for pg in pages] == [0, 2, 3]
        assert pages[1]["lacing"] == bytes([6, 5])
        assert pages[0]["offset"] == 0
        assert pages[1]["offset"] == pages[0]["length"]

    def test_crc_rejects_corruption(self):
        good = page([b"hello"], flags=0x2, granule=0)
        bad = page([b"hello"], seq=1, granule=1, bad_crc=True)
        pages = ogg.parse_pages(good + bad + good)
        assert len(pages) == 2                # corrupt page skipped
        assert ogg.parse_pages(good + bad, check_crc=False) \
            and len(ogg.parse_pages(good + bad, check_crc=False)) == 2

    def test_resync_across_junk(self):
        p = b"\x00junk" * 10 + page([b"data"], flags=0x2, granule=0)
        assert len(ogg.parse_pages(p)) == 1

    def test_no_pages_raises(self):
        with pytest.raises(ValueError):
            ogg.parse_pages(b"not an ogg stream at all")

    def test_truncated_trailing_page_dropped(self):
        p = page([b"complete"], flags=0x2, granule=0) \
            + page([b"cut off here"], seq=1, granule=1)[:-4]
        assert len(ogg.parse_pages(p)) == 1

    def test_is_ogg(self):
        assert ogg.is_ogg(page([b"x"], flags=0x2))
        assert not ogg.is_ogg(b"RIFFxxxxWAVE")
        assert not ogg.is_ogg(b"OggS\x01rest")   # bad version


class TestPackets:
    def test_simple_packets(self):
        p = page([b"aaa", b"bb"], flags=0x2, granule=1) \
            + page([b"cccc"], seq=1, granule=2, flags=0x4)
        assert ogg.packets(p) == [b"aaa", b"bb", b"cccc"]

    def test_packet_spans_pages(self):
        big = bytes(range(256)) * 3                   # 768 bytes
        segs = segmentize(big)                        # 255,255,255,3
        p = (page(segs[:2], flags=0x2)                # ends with 255
             + page(segs[2:], seq=1, flags=0x1, granule=0)
             + page([b"tail"], seq=2, flags=0x4, granule=1))
        assert ogg.packets(p) == [big, b"tail"]

    def test_exact_multiple_of_255(self):
        pkt = b"z" * 510
        segs = segmentize(pkt)
        assert [len(s) for s in segs] == [255, 255, 0]
        p = page(segs, flags=0x2, granule=0)
        assert ogg.packets(p) == [pkt]

    def test_lost_page_drops_partial(self):
        big = b"q" * 300
        segs = segmentize(big)
        # first half of the spanning packet, then a FRESH page (the
        # continuation page was "lost")
        p = page(segs[:1], flags=0x2) \
            + page([b"fresh"], seq=5, granule=9, flags=0x4)
        assert ogg.packets(p) == [b"fresh"]

    def test_multiplexed_streams_filtered(self):
        p = (page([b"s1"], serial=1, flags=0x2, granule=0)
             + page([b"s2"], serial=2, flags=0x2, granule=0)
             + page([b"s1b"], serial=1, seq=1, granule=1, flags=0x4))
        assert ogg.packets(p, serial=1) == [b"s1", b"s1b"]
        assert ogg.packets(p, serial=2) == [b"s2"]


class TestOpus:
    # (config, code, extra bytes, expected samples)
    TOC_CASES = [
        (0, 0, b"", 480),       # SILK NB 10 ms
        (3, 0, b"", 2880),      # SILK NB 60 ms
        (11, 0, b"", 2880),     # SILK WB 60 ms
        (12, 0, b"", 480),      # Hybrid SWB 10 ms
        (15, 0, b"", 960),      # Hybrid FB 20 ms
        (16, 0, b"", 120),      # CELT NB 2.5 ms
        (19, 0, b"", 960),      # CELT NB 20 ms
        (28, 0, b"", 120),      # CELT FB 2.5 ms
        (31, 0, b"", 960),      # CELT FB 20 ms
        (19, 1, b"", 1920),     # two equal frames
        (19, 2, b"\x10", 1920),  # two different frames
        (16, 3, bytes([4]), 480),   # 4 CBR frames of 2.5 ms
    ]

    def test_toc_samples(self):
        for config, code, extra, want in self.TOC_CASES:
            pkt = bytes([(config << 3) | code]) + extra + b"\x00"
            assert ogg.opus_packet_samples(pkt) == want, (config, code)

    def test_toc_rejects(self):
        with pytest.raises(ValueError):
            ogg.opus_packet_samples(b"")
        with pytest.raises(ValueError):       # code 3, zero frames
            ogg.opus_packet_samples(bytes([(19 << 3) | 3, 0]))
        with pytest.raises(ValueError):       # 7 x 20 ms = 140 ms
            ogg.opus_packet_samples(bytes([(19 << 3) | 3, 7]))

    def _stream(self, n_audio=10, pre_skip=312, samples_each=960):
        """Hand-built Ogg-Opus: header page, tags page, one audio page
        with n_audio 20 ms CELT packets; granules per RFC 7845 §4."""
        toc = bytes([(19 << 3) | 0])          # CELT NB 20 ms, 1 frame
        audio = [toc + b"\x55" * 20 for _ in range(n_audio)]
        total = n_audio * samples_each
        return (page([opus_head(pre_skip=pre_skip)], flags=0x2)
                + page([opus_tags()], seq=1)
                + page([bytes(a) for a in audio], seq=2,
                       granule=pre_skip + total, flags=0x4)), total

    def test_info_duration_from_granule(self):
        p, total = self._stream(n_audio=25, pre_skip=312)
        info = ogg.ogg_info(p)
        assert info["codec"] == "opus"
        assert info["channels"] == 2
        s = info["streams"][0]
        assert s["pre_skip"] == 312
        assert info["duration_sec"] == pytest.approx(total / 48000)

    def test_toc_sum_crosschecks_granule(self):
        p, total = self._stream(n_audio=13)
        assert ogg.opus_stream_samples(p) == total

    def test_opus_stream_samples_rejects_non_opus(self):
        p = page([vorbis_ident()], flags=0x2, granule=0)
        with pytest.raises(ValueError):
            ogg.opus_stream_samples(p)


class TestVorbis:
    def test_ident_and_duration(self):
        p = (page([vorbis_ident(channels=1, rate=22050)], flags=0x2)
             + page([b"\x05audio"], seq=1, granule=44100, flags=0x4))
        info = ogg.ogg_info(p)
        assert info["codec"] == "vorbis"
        assert info["channels"] == 1
        assert info["sample_rate"] == 22050
        assert info["duration_sec"] == pytest.approx(2.0)
        s = info["streams"][0]
        assert s["blocksize_0"] == 256 and s["blocksize_1"] == 2048
        assert s["bitrate_nominal"] == 128000


class TestCutCarve:
    def _three_page_stream(self):
        big = b"B" * 300
        segs = segmentize(big)
        return (page([b"head"], flags=0x2, granule=0)
                + page(segs[:1], seq=1)                  # spans ->
                + page(segs[1:], seq=2, flags=0x1, granule=1)
                + page([b"tail"], seq=3, flags=0x4, granule=2))

    def test_cut_points_skip_continued(self):
        cuts = ogg.cut_points(self._three_page_stream())
        assert cuts.tolist() == [0, 1, 3]     # page 2 is continued

    def test_extract_pages_carve(self):
        p = self._three_page_stream()
        carve = ogg.extract_pages(p, 3, 5)
        assert ogg.packets(carve) == [b"tail"]
        with pytest.raises(ValueError):
            ogg.extract_pages(p, 99, 1)

    def test_multistream_info(self):
        p = (page([opus_head()], serial=1, flags=0x2)
             + page([vorbis_ident()], serial=2, flags=0x2)
             + page([opus_tags()], serial=1, seq=1)
             + page([b"\x98x"], serial=1, seq=2, granule=312 + 960,
                    flags=0x4)
             + page([b"\x05y"], serial=2, seq=1, granule=4410,
                    flags=0x4))
        info = ogg.ogg_info(p)
        assert info["n_streams"] == 2
        assert {s["codec"] for s in info["streams"]} == \
            {"opus", "vorbis"}
        assert info["codec"] == "opus"        # first audio stream


class TestMux:
    def test_roundtrip(self):
        pkts = [b"header pkt", b"x" * 700, b"", b"tail",
                b"m" * 510]                   # incl. empty + 255-mult
        p = ogg.mux_ogg(pkts, serial=42, granules=[0, 10, 10, 20, 30])
        pages = ogg.parse_pages(p)            # CRCs must all verify
        assert pages[0]["flags"] & 0x2 and pages[-1]["flags"] & 0x4
        assert all(pg["serial"] == 42 for pg in pages)
        assert ogg.packets(p) == pkts

    def test_mux_crc_matches_independent_reference(self):
        p = ogg.mux_ogg([b"abc"], serial=9)
        raw = bytearray(p)
        stored = struct.unpack_from("<I", raw, 22)[0]
        raw[22:26] = b"\x00\x00\x00\x00"
        assert crc_bitwise(bytes(raw)) == stored

    def test_mux_spanning_sets_continued(self):
        # one packet needing > 255 segments spans pages
        p = ogg.mux_ogg([b"k" * (255 * 300)])
        pages = ogg.parse_pages(p)
        assert len(pages) > 1
        assert pages[1]["flags"] & 0x1
        assert ogg.packets(p) == [b"k" * (255 * 300)]

    def test_mux_validates(self):
        with pytest.raises(ValueError):
            ogg.mux_ogg([])
        with pytest.raises(ValueError):
            ogg.mux_ogg([b"a"], granules=[1, 2])


class TestFuzz:
    def test_random_bytes_never_crash(self):
        rng = np.random.default_rng(11)
        for n in (0, 1, 26, 27, 100, 4096):
            for _ in range(20):
                data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
                try:
                    ogg.parse_pages(data)
                except ValueError:
                    pass

    def test_truncations_never_crash(self):
        p = (page([opus_head()], flags=0x2) + page([opus_tags()], seq=1)
             + page([bytes([19 << 3]) + b"x"], seq=2, granule=1272,
                    flags=0x4))
        for cut in range(0, len(p), 7):
            try:
                ogg.ogg_info(p[:cut])
            except ValueError:
                pass

    def test_decode_dispatch(self):
        # Vorbis decodes for real now (functions/vorbis.py); junk that
        # contains no decodable page stream raises ValueError, and Opus
        # remains the declared seam (pinned in test_vorbis.py)
        with pytest.raises(ValueError):
            ogg.decode_ogg(b"OggS")


def _theora_ident(w=320, h=240, frn=30, frd=1, kfg=6):
    """Hand-assembled Theora identification header (spec §6.2)."""
    import struct as st
    fmbw, fmbh = (w + 15) // 16, (h + 15) // 16
    b = bytearray(b"\x80theora")
    b += bytes([3, 2, 1])                       # VMAJ/VMIN/VREV
    b += st.pack(">HH", fmbw, fmbh)
    b += w.to_bytes(3, "big") + h.to_bytes(3, "big")
    b += bytes([0, 0])                          # PICX/PICY
    b += st.pack(">II", frn, frd)
    b += (0).to_bytes(3, "big") + (1).to_bytes(3, "big")   # PAR
    b += bytes([0])                             # colour space
    b += (0).to_bytes(3, "big")                 # NOMBR
    # QUAL=63, KFGSHIFT=kfg, PF=0, Res=0
    word = (63 << 10) | (kfg << 5)
    b += st.pack(">H", word)
    return bytes(b)


class TestTheoraStructural:
    def test_ident_and_keyframe_pages(self):
        from hierarchical_bloom_filter_index_ray.functions.ogg import (
            ogg_info, mux_ogg, theora_keyframe_pages)
        kfg = 6
        ident = _theora_ident(w=322, h=242, frn=24, frd=1, kfg=kfg)
        # frames 0..9: keyframes at 0, 4, 8 -> granule =
        # (last_kf << kfg) + offset; one page per frame (the real
        # layout for video-sized packets)
        pgs = [page([ident], serial=7, seq=0, granule=0, flags=2)]
        last_kf = 0
        for i in range(10):
            if i % 4 == 0:
                last_kf = i
            g = (last_kf << kfg) + (i - last_kf)
            pgs.append(page([bytes([i]) * 20], serial=7, seq=i + 1,
                            granule=g, flags=4 if i == 9 else 0))
        buf = b"".join(pgs)
        info = ogg_info(buf)
        s = info["streams"][0]
        assert s["codec"] == "theora"
        assert (s["width"], s["height"]) == (322, 242)
        assert s["kfg_shift"] == kfg
        assert s["fps_num"] == 24 and s["fps_den"] == 1
        # last granule = (8 << 6) + 1 -> frame index 9 -> 10 frames
        assert s["n_frames"] == 10
        assert s["duration_sec"] == pytest.approx(9 / 24)
        cuts = theora_keyframe_pages(buf)
        # pages completing granules with offset 0 AND granule > 0:
        # keyframes 4 and 8 (frame 0's granule is 0 = stream start)
        assert len(cuts) == 2
        # every cut lands on a real page boundary ("OggS")
        for c in cuts:
            assert buf[c:c + 4] == b"OggS"

    def test_no_theora_stream_raises(self):
        from hierarchical_bloom_filter_index_ray.functions.ogg import (
            mux_ogg, theora_keyframe_pages)
        buf = mux_ogg([b"\x01vorbis" + b"\x00" * 23], serial=3)
        with pytest.raises(ValueError):
            theora_keyframe_pages(buf)
