"""Vorbis I codec: primitive properties pinned against the spec's own
examples, IMDCT fast-vs-direct equality, window complementarity, full
encode→decode round trips (mono/stereo, equal and MIXED block sizes —
the §4.3.9 unequal-lap case), Ogg container integration, and a
decode-boundary fuzz pass (never crashes, only VorbisError/ValueError).
No Ray needed."""

from __future__ import annotations

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions import vorbis as V
from hierarchical_bloom_filter_index_ray.functions.ogg import (
    decode_ogg, encode_ogg_vorbis, mux_ogg, ogg_info)


def snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    n = min(len(ref), len(got))
    err = got[:n] - ref[:n]
    return 10 * np.log10(np.mean(ref[:n] ** 2)
                         / max(np.mean(err ** 2), 1e-30))


class TestPrimitives:
    def test_bit_io_round_trip(self):
        rng = np.random.default_rng(0)
        fields = [(int(rng.integers(0, 1 << n)), n)
                  for n in rng.integers(1, 32, 200)]
        bw = V.BitWriter()
        for v, n in fields:
            bw.write(v, n)
        br = V.BitReader(bw.bytes())
        assert [(br.read(n), n) for _, n in fields] == fields

    def test_ilog_spec_examples(self):
        # §9.2.1 worked examples
        assert [V.ilog(x) for x in (0, 1, 2, 3, 4, 7)] == [0, 1, 2, 2, 3, 3]

    def test_float32_round_trip(self):
        for v in (0.0, 1.0, -1.0, 0.25, 3.14159, 1e-6, -42.5, 255.9):
            got = V.float32_unpack(V.float32_pack(v))
            assert abs(got - v) <= abs(v) * 1e-6

    def test_huffman_assignment_spec_example(self):
        """§3.2.1's worked codebook: lengths [2,4,4,4,4,2,3,3] must get
        codewords 00,0100,0101,0110,0111,10,110,111 in entry order."""
        got = V.assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
        assert got == {0: (0b00, 2), 1: (0b0100, 4), 2: (0b0101, 4),
                       3: (0b0110, 4), 4: (0b0111, 4), 5: (0b10, 2),
                       6: (0b110, 3), 7: (0b111, 3)}

    def test_over_and_under_specified_trees_raise(self):
        with pytest.raises(V.VorbisError):
            V.assign_codewords([1, 1, 1])          # overspecified
        with pytest.raises(V.VorbisError):
            V.assign_codewords([2, 2, 2])          # underspecified

    def test_single_entry_codebook(self):
        assert V.assign_codewords([0, 3, 0]) == {1: (0, 1)}

    def test_inverse_db_table_spec_endpoints(self):
        # §7.2.3: table[0] = 1.0649863e-07, table[255] = 1.0
        assert V.INVERSE_DB_TABLE[255] == 1.0
        assert abs(V.INVERSE_DB_TABLE[0] - 1.0649863e-07) < 1e-13
        # geometric: constant ratio
        r = V.INVERSE_DB_TABLE[1:] / V.INVERSE_DB_TABLE[:-1]
        assert np.allclose(r, r[0])

    def test_lookup1_values(self):
        assert V.lookup1_values(9, 2) == 3
        assert V.lookup1_values(8, 2) == 2
        assert V.lookup1_values(1, 1) == 1
        assert V.lookup1_values(27, 3) == 3


class TestCodebooks:
    def test_scalar_and_vq_round_trip(self):
        bw = V.BitWriter()
        V.write_codebook(bw, 1, [6] * 64, lookup=2, minimum=-31.0,
                         delta=1.0, value_bits=6, mults=list(range(64)))
        cb = V.parse_codebook(V.BitReader(bw.bytes()))
        assert cb.vectors[0, 0] == -31.0 and cb.vectors[63, 0] == 32.0
        for entry in (0, 17, 63):
            bw2 = V.BitWriter()
            cb.write_code(bw2, entry)
            assert cb.decode_scalar(V.BitReader(bw2.bytes())) == entry

    def test_lattice_lookup_type1(self):
        # 9 entries, dims 2, lookup_values 3: entry e -> (e%3, (e//3)%3)
        bw = V.BitWriter()
        lens = [3, 3, 3, 3, 3, 3, 3, 4, 4]       # complete tree, 9 leaves
        V.write_codebook(bw, 2, lens, lookup=1, minimum=1.0, delta=2.0,
                         value_bits=2, mults=[0, 1, 2])
        cb = V.parse_codebook(V.BitReader(bw.bytes()))
        for e in range(9):
            want = [1.0 + 2.0 * (e % 3), 1.0 + 2.0 * ((e // 3) % 3)]
            assert cb.vectors[e].tolist() == want

    def test_allocation_bomb_guard(self):
        bw = V.BitWriter()
        bw.write(0x564342, 24)
        bw.write(4095, 16)                # dims
        bw.write((1 << 24) - 1, 24)       # entries: 16M
        with pytest.raises(V.VorbisError):
            V.parse_codebook(V.BitReader(bw.bytes()))


class TestTransforms:
    @pytest.mark.parametrize("n2", [32, 128, 512, 4096])
    def test_imdct_fast_equals_direct(self, n2):
        spec = np.random.default_rng(n2).standard_normal(n2)
        assert np.allclose(V.imdct(spec), V.imdct_direct(spec),
                           atol=1e-9)

    def test_window_princen_bradley(self):
        for n in (256, 1024):
            w = V.block_window(n, True, True, n)
            s = w[:n // 2] ** 2 + w[n // 2:] ** 2
            assert np.allclose(s, 1.0)

    def test_hybrid_window_shape(self):
        n, bs0 = 1024, 256
        w = V.block_window(n, False, True, bs0)
        assert np.all(w[:n // 4 - bs0 // 4] == 0)
        assert np.allclose(w[n // 4 + bs0 // 4:n // 2], 1.0)
        ls, rs = V._lap_bounds(n, False, True, bs0)
        assert (ls, rs) == (n // 4 - bs0 // 4, n // 2)

    def test_tdac_perfect_reconstruction(self):
        """MDCT→IMDCT with sine windows and 50% overlap reconstructs
        the interior exactly at scale n/4 — pins both transform
        directions and the window formula together."""
        n = 256
        rng = np.random.default_rng(3)
        x = rng.standard_normal(2 * n)
        w = V.block_window(n, True, True, n)
        recon = np.zeros(2 * n)
        for S in range(0, n + 1, n // 2):
            y = V.imdct(V.mdct_direct(x[S:S + n] * w)) * w
            recon[S:S + n] += y
        core = slice(n // 2, 3 * n // 2)
        assert np.allclose(recon[core] / (n / 4), x[core], atol=1e-9)


class TestRoundTrip:
    RATE = 8000

    def _sig(self, n, ch=1, seed=5):
        t = np.arange(n) / self.RATE
        base = (0.5 * np.sin(2 * np.pi * 440 * t)
                + 0.2 * np.sin(2 * np.pi * 1337 * t)
                + 0.05 * np.random.default_rng(seed).standard_normal(n))
        if ch == 1:
            return base
        return np.stack([base, np.roll(base, 97)], axis=1)

    def test_mono(self):
        x = self._sig(6000)
        pkts, total, _ = V.encode_vorbis_packets(x, self.RATE)
        pcm, rate = V.decode_vorbis_packets(pkts, total)
        assert rate == self.RATE and len(pcm) == 6000
        assert snr_db(x, pcm[:, 0]) > 45

    def test_stereo(self):
        x = self._sig(5000, ch=2)
        pkts, total, _ = V.encode_vorbis_packets(x, self.RATE)
        pcm, _ = V.decode_vorbis_packets(pkts, total)
        assert pcm.shape == (5000, 2)
        for c in range(2):
            assert snr_db(x[:, c], pcm[:, c]) > 45

    def test_mixed_block_sizes_lap(self):
        """Long/short transitions exercise the §4.3.9 unequal-size lap:
        reconstruction must stay clean across every seam."""
        x = self._sig(6000)
        plan = [1024, 1024, 256, 256, 256, 1024, 256, 1024, 1024,
                256, 256, 1024, 1024, 1024, 1024, 1024]
        pkts, total, _ = V.encode_vorbis_packets(x, self.RATE,
                                                 block_plan=plan)
        pcm, _ = V.decode_vorbis_packets(pkts, total)
        n = min(total, 6000)
        assert snr_db(x[:n], pcm[:n, 0]) > 45
        # no seam spikes: windowed rms error bounded everywhere
        err = pcm[:n, 0] - x[:n]
        w = 256
        rms = [float(np.sqrt(np.mean(err[i:i + w] ** 2)))
               for i in range(0, n - w, w)]
        assert max(rms) < 5 * (sum(rms) / len(rms))

    def test_silence_decodes_to_near_zero(self):
        x = np.zeros(4000)
        pkts, total, _ = V.encode_vorbis_packets(x, self.RATE)
        pcm, _ = V.decode_vorbis_packets(pkts, total)
        assert np.abs(pcm).max() < 1e-4

    def test_granule_truncation(self):
        x = self._sig(3001)                       # non-multiple length
        pkts, total, _ = V.encode_vorbis_packets(x, self.RATE)
        assert total == 3001
        pcm, _ = V.decode_vorbis_packets(pkts, total)
        assert len(pcm) == 3001


class TestOggIntegration:
    def test_container_round_trip(self):
        rate = 8000
        t = np.arange(5000) / rate
        x = np.stack([0.4 * np.sin(2 * np.pi * 523 * t),
                      0.4 * np.sin(2 * np.pi * 659 * t)], axis=1)
        ogg = encode_ogg_vorbis(x, rate)
        info = ogg_info(ogg)
        st = info["streams"][0] if "streams" in info else info
        pcm, r = decode_ogg(ogg)
        assert r == rate and pcm.shape == (5000, 2)
        for c in range(2):
            assert snr_db(x[:, c], pcm[:, c]) > 45

    def test_opus_still_declared_seam(self):
        # OpusHead ident packet in an Ogg wrapper -> NotImplementedError
        ident = (b"OpusHead" + bytes([1, 2]) + (312).to_bytes(2, "little")
                 + (48000).to_bytes(4, "little") + b"\x00\x00\x00")
        ogg = mux_ogg([ident], serial=7, granules=[0])
        with pytest.raises(NotImplementedError):
            decode_ogg(ogg)

    def test_no_vorbis_stream_raises_value_error(self):
        ogg = mux_ogg([b"garbagehdr"], serial=1, granules=[0])
        with pytest.raises(ValueError):
            decode_ogg(ogg)


class TestFuzz:
    """Decode boundary: corrupt/truncated streams must raise
    ValueError/VorbisError or decode leniently — never IndexError/
    KeyError/RecursionError/MemoryError."""

    ALLOWED = (ValueError, NotImplementedError)

    def test_corrupt_bytes(self):
        rate = 8000
        x = 0.3 * np.sin(2 * np.pi * 440 * np.arange(3000) / rate)
        pkts, total, _ = V.encode_vorbis_packets(x, rate)
        rng = np.random.default_rng(11)
        for trial in range(60):
            mut = [bytearray(p) for p in pkts]
            pi = int(rng.integers(0, len(mut)))
            if not len(mut[pi]):
                continue
            for _ in range(int(rng.integers(1, 6))):
                mut[pi][int(rng.integers(0, len(mut[pi])))] = \
                    int(rng.integers(0, 256))
            try:
                V.decode_vorbis_packets([bytes(p) for p in mut], total)
            except self.ALLOWED:
                pass

    def test_truncated_packets(self):
        rate = 8000
        x = 0.3 * np.sin(2 * np.pi * 440 * np.arange(3000) / rate)
        pkts, total, _ = V.encode_vorbis_packets(x, rate)
        for cut in (0, 1, 3, 7, 20):
            mut = list(pkts)
            mut[4] = mut[4][:cut]                # truncate an audio pkt
            pcm, _ = V.decode_vorbis_packets(mut, None)
            assert np.isfinite(pcm).all()
        for hdr in (0, 1, 2):
            mut = list(pkts)
            mut[hdr] = mut[hdr][:5]
            with pytest.raises(self.ALLOWED):
                V.decode_vorbis_packets(mut, total)

    def test_media_features_on_ogg(self):
        """The multimodal feature stage decodes Ogg-Vorbis for real."""
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import MediaFeatureExtractor

        rate = 8000
        x = 0.3 * np.sin(2 * np.pi * 440 * np.arange(4000) / rate)
        ogg = encode_ogg_vorbis(x, rate)
        mf = MediaFeatureExtractor(feature_dim=16, decoder="real")
        feats = mf._real_features(ogg)
        assert feats.shape == (16,)
        assert np.isfinite(feats).all()
        assert np.abs(feats).sum() > 0


class TestWebmVorbis:
    """Vorbis-in-Matroska: CodecPrivate Xiph lacing + one packet per
    SimpleBlock (Matroska codec mapping spec)."""

    def _webm(self, n=5000, rate=8000):
        from hierarchical_bloom_filter_index_ray.functions.webm import \
            encode_webm_audio
        t = np.arange(n) / rate
        x = 0.4 * np.sin(2 * np.pi * 523 * t)
        return x, encode_webm_audio(x, rate)

    def test_round_trip(self):
        from hierarchical_bloom_filter_index_ray.functions.webm import (
            audio_track, decode_webm_audio, is_webm)
        x, wb = self._webm()
        assert is_webm(wb)
        trk = audio_track(wb)
        assert trk.codec == "A_VORBIS" and trk.sample_rate == 8000
        assert trk.channels == 1 and trk.codec_private is not None
        pcm, rate = decode_webm_audio(wb)
        assert rate == 8000 and len(pcm) == 5000
        assert snr_db(x, pcm[:, 0]) > 45

    def test_xiph_private_round_trip(self):
        from hierarchical_bloom_filter_index_ray.functions.webm import (
            _xiph_private, split_xiph_private)
        pkts = [b"a" * 300, b"b" * 255, b"c" * 7]
        assert split_xiph_private(_xiph_private(pkts)) == pkts
        with pytest.raises(ValueError):
            split_xiph_private(b"\x05rest")

    def test_opus_track_declared_seam(self):
        from hierarchical_bloom_filter_index_ray.functions import webm as W
        x, wb = self._webm(n=2000)
        patched = wb.replace(b"A_VORBIS", b"A_OPUS\x00\x00", 1)
        # CodecID length stays 8 so the EBML sizes hold; codec string
        # now reads as A_OPUS with trailing NULs -> strip for dispatch
        trk = W.audio_track(patched)
        assert trk.codec.startswith("A_OPUS")
        with pytest.raises((NotImplementedError, ValueError)):
            W.decode_webm_audio(patched)

    def test_media_features_on_audio_webm(self):
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import MediaFeatureExtractor
        _, wb = self._webm()
        mf = MediaFeatureExtractor(feature_dim=16, decoder="real")
        feats = mf._real_features(wb)
        assert feats.shape == (16,) and np.isfinite(feats).all()
        assert np.abs(feats).sum() > 0


class TestFloor0:
    """Floor type 0 (LSP, spec §6): header parse, packet decode, curve
    synthesis, and the subset encoder's ``floor_mode="lsp"`` path."""
    RATE = 8000

    def _sig(self, n, ch=1, seed=5):
        t = np.arange(n) / self.RATE
        base = (0.5 * np.sin(2 * np.pi * 440 * t)
                + 0.2 * np.sin(2 * np.pi * 1337 * t)
                + 0.05 * np.random.default_rng(seed).standard_normal(n))
        if ch == 1:
            return base
        return np.stack([base, np.roll(base, 97)], axis=1)

    def test_mono_round_trip(self):
        x = self._sig(6000)
        pkts, total, _ = V.encode_vorbis_packets(x, self.RATE,
                                                 floor_mode="lsp")
        pcm, rate = V.decode_vorbis_packets(pkts, total)
        assert rate == self.RATE and len(pcm) == 6000
        assert snr_db(x, pcm[:, 0]) > 35

    def test_stereo_mixed_blocks_round_trip(self):
        x = self._sig(5000, ch=2)
        plan = [1024, 1024, 256, 256, 256, 1024, 256, 1024, 1024,
                1024, 1024, 1024, 1024]
        pkts, total, _ = V.encode_vorbis_packets(
            x, self.RATE, floor_mode="lsp", block_plan=plan)
        pcm, _ = V.decode_vorbis_packets(pkts, total)
        for c in range(2):
            assert snr_db(x[:total, c], pcm[:total, c]) > 30

    def test_silence_near_zero(self):
        x = np.zeros(4000)
        pkts, total, _ = V.encode_vorbis_packets(x, self.RATE,
                                                 floor_mode="lsp")
        pcm, _ = V.decode_vorbis_packets(pkts, total)
        assert np.abs(pcm).max() < 1e-3

    def test_curve_properties(self):
        fl = {"type": 0, "order": 4, "rate": 8000, "bark_map_size": 64,
              "amplitude_bits": 8, "amplitude_offset": 160,
              "book_list": [0], "_map_cache": {}}
        coeffs = np.array([0.5, 1.1, 1.9, 2.6])
        c1 = V.synthesize_floor0(fl, 60, coeffs, 512)
        c2 = V.synthesize_floor0(fl, 120, coeffs, 512)
        assert c1.shape == (512,)
        assert np.isfinite(c1).all() and (c1 > 0).all()
        assert (c2 >= c1).all()          # monotone in amplitude
        # odd order path too
        flo = dict(fl, order=3, _map_cache={})
        c3 = V.synthesize_floor0(flo, 60, coeffs[:3], 128)
        assert np.isfinite(c3).all() and (c3 > 0).all()

    def test_header_validation(self):
        def parse_hdr(order=2, rate=8000, bms=64, book=0):
            bw = V.BitWriter()
            bw.write(order, 8)
            bw.write(rate, 16)
            bw.write(bms, 16)
            bw.write(8, 6)
            bw.write(160, 8)
            bw.write(0, 4)
            bw.write(book, 8)
            br = V.BitReader(bw.bytes())
            return V._parse_floor0(br, 1)
        assert parse_hdr()["type"] == 0
        with pytest.raises(ValueError):
            parse_hdr(order=0)
        with pytest.raises(ValueError):
            parse_hdr(rate=0)
        with pytest.raises(ValueError):
            parse_hdr(bms=0)
        with pytest.raises(ValueError):
            parse_hdr(book=3)            # out of range

    def test_fuzz_lsp_stream(self):
        x = 0.3 * np.sin(2 * np.pi * 440 * np.arange(3000) / self.RATE)
        pkts, total, _ = V.encode_vorbis_packets(x, self.RATE,
                                                 floor_mode="lsp")
        rng = np.random.default_rng(23)
        for trial in range(40):
            mut = [bytearray(p) for p in pkts]
            pi = int(rng.integers(0, len(mut)))
            if not len(mut[pi]):
                continue
            for _ in range(int(rng.integers(1, 6))):
                mut[pi][int(rng.integers(0, len(mut[pi])))] = \
                    int(rng.integers(0, 256))
            try:
                pcm, _ = V.decode_vorbis_packets(
                    [bytes(p) for p in mut], total)
                assert np.isfinite(pcm).all()
            except (ValueError, NotImplementedError):
                pass

    def test_ogg_vorbis_lsp_container(self):
        from hierarchical_bloom_filter_index_ray.functions.ogg import (
            decode_ogg, encode_ogg_vorbis)
        x = self._sig(5000)
        payload = encode_ogg_vorbis(x, self.RATE, floor_mode="lsp")
        pcm, rate = decode_ogg(payload)
        assert rate == self.RATE and len(pcm) == 5000
        assert snr_db(x, pcm[:, 0]) > 35
