"""Matroska/WebM demux/mux tests.

The hand-built fixture assembles EBML elements with raw byte packing in
the test — independent of the module's muxer — covering an unknown-size
Segment and Cluster, BlockGroup + ReferenceBlock keyframe semantics,
and all three lacing modes (Xiph, EBML, fixed). The round-trip tests
then pin the muxer against the parser, and the pipeline tests pin
Motion-JPEG-in-WebM end-to-end through FrameSampler /
MediaFeatureExtractor."""

import struct

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions.webm import (
    WebmTrack, encode_webm_video, extract_sample, is_webm, parse_webm,
    video_track)


def _vid(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _vsize(n: int) -> bytes:
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            return ((1 << (7 * length)) | n).to_bytes(length, "big")
    raise AssertionError


def _el(eid: int, body: bytes) -> bytes:
    return _vid(eid) + _vsize(len(body)) + body


def _uint_el(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def _ebml_header() -> bytes:
    return _el(0x1A45DFA3, _el(0x4282, b"webm"))


def _track_entry(num: int, ttype: int, codec: bytes, w: int = 0,
                 h: int = 0) -> bytes:
    body = (_uint_el(0xD7, num) + _uint_el(0x83, ttype)
            + _el(0x86, codec))
    if ttype == 1:
        body += _el(0xE0, _uint_el(0xB0, w) + _uint_el(0xBA, h))
    return _el(0xAE, body)


def _simple_block(track: int, rel: int, flags: int, data: bytes) -> bytes:
    return _el(0xA3, bytes([0x80 | track]) + struct.pack(">h", rel)
               + bytes([flags]) + data)


class TestParser:
    def test_hand_built_file(self):
        """Unknown-size Segment + Cluster, two clusters, BlockGroup
        keyframe rule, non-default TimestampScale."""
        frames = [b"AAAA", b"BBBBB", b"CC", b"DDD"]
        info = _el(0x1549A966,
                   _uint_el(0x2AD7B1, 40_000_000)   # 25 ticks/sec
                   + _el(0x4489, struct.pack(">d", 4.0)))
        tracks = _el(0x1654AE6B, _track_entry(1, 1, b"V_MJPEG", 64, 48)
                     + _track_entry(2, 2, b"A_PCM"))
        # cluster 1: ts 0, SimpleBlock keyframe + SimpleBlock non-key
        c1 = (_uint_el(0xE7, 0)
              + _simple_block(1, 0, 0x80, frames[0])
              + _simple_block(1, 1, 0x00, frames[1]))
        # cluster 2 (UNKNOWN size): BlockGroup w/o ReferenceBlock (key)
        # then BlockGroup with one (non-key)
        bg_key = _el(0xA0, _el(0xA1, b"\x81" + struct.pack(">h", 0)
                               + b"\x00" + frames[2]))
        bg_ref = _el(0xA0, _el(0xA1, b"\x81" + struct.pack(">h", 1)
                               + b"\x00" + frames[3])
                     + _uint_el(0xFB, 1))
        c2_body = _uint_el(0xE7, 2) + bg_key + bg_ref
        c2 = _vid(0x1F43B675) + b"\xff" + c2_body     # size: unknown
        seg_body = info + tracks + _el(0x1F43B675, c1) + c2
        buf = (_ebml_header() + _vid(0x18538067) + b"\xff" + seg_body)
        assert is_webm(buf)
        tl = parse_webm(buf)
        assert len(tl) == 2
        t = tl[0]
        assert (t.track_id, t.handler, t.codec) == (1, "vide", "V_MJPEG")
        assert (t.width, t.height) == (64, 48)
        assert (t.timescale, t.duration) == (25, 4)
        assert t.n_samples == 4
        assert t.sample_sizes.tolist() == [4, 5, 2, 3]
        assert t.sample_times.tolist() == [0, 1, 2, 3]
        assert t.sync_samples.tolist() == [0, 2]
        for i, f in enumerate(frames):
            assert extract_sample(buf, t, i) == f
        assert tl[1].handler == "soun" and tl[1].n_samples == 0

    def test_sync_seek(self):
        buf = encode_webm_video([b"a1", b"b2", b"c3", b"d4", b"e5"],
                                width=4, height=4, sync_every=2)
        t = video_track(buf)
        assert t.sync_samples.tolist() == [0, 2, 4]
        assert [t.is_sync(i) for i in range(5)] == [
            True, False, True, False, True]
        assert [t.sync_at_or_before(i) for i in range(5)] == [
            0, 0, 2, 2, 4]
        t2 = WebmTrack(track_id=1, handler="vide", codec="V_MJPEG",
                       width=1, height=1, timescale=30, duration=5,
                       sample_offsets=t.sample_offsets,
                       sample_sizes=t.sample_sizes,
                       sample_times=t.sample_times, sync_samples=None)
        assert t2.is_sync(3) and t2.sync_at_or_before(3) == 3

    def test_xiph_lacing(self):
        """One SimpleBlock carrying 3 Xiph-laced frames, one of size
        >= 255 to exercise the 255-continuation rule."""
        f = [b"x" * 300, b"y" * 7, b"z" * 11]
        lace = bytes([2]) + bytes([255, 45]) + bytes([7])
        blk = _simple_block(1, 0, 0x80 | 0x02, lace + b"".join(f))
        buf = self._wrap(blk)
        t = video_track(buf)
        assert t.sample_sizes.tolist() == [300, 7, 11]
        for i in range(3):
            assert extract_sample(buf, t, i) == f[i]

    def test_ebml_lacing(self):
        """EBML lacing: first size absolute, then signed deltas."""
        f = [b"p" * 20, b"q" * 12, b"r" * 30, b"s" * 5]
        # sizes 20, 12 (delta -8 -> vint 0x3F-8+... one-byte signed:
        # value = delta + 63), 30 (delta +18 -> 18 + 63 = 81)
        lace = (bytes([3]) + _vsize(20)
                + _vsize(12 - 20 + 63) + _vsize(30 - 12 + 63))
        blk = _simple_block(1, 0, 0x80 | 0x06, lace + b"".join(f))
        buf = self._wrap(blk)
        t = video_track(buf)
        assert t.sample_sizes.tolist() == [20, 12, 30, 5]
        for i in range(4):
            assert extract_sample(buf, t, i) == f[i]

    def test_fixed_lacing(self):
        f = [b"a" * 9, b"b" * 9, b"c" * 9]
        blk = _simple_block(1, 0, 0x80 | 0x04, bytes([2]) + b"".join(f))
        buf = self._wrap(blk)
        t = video_track(buf)
        assert t.sample_sizes.tolist() == [9, 9, 9]
        assert extract_sample(buf, t, 1) == f[1]

    @staticmethod
    def _wrap(block: bytes) -> bytes:
        tracks = _el(0x1654AE6B, _track_entry(1, 1, b"V_MJPEG", 8, 8))
        cluster = _el(0x1F43B675, _uint_el(0xE7, 0) + block)
        return _ebml_header() + _el(0x18538067, tracks + cluster)

    def test_no_header_raises(self):
        with pytest.raises(ValueError, match="EBML"):
            parse_webm(b"\x00\x01\x02\x03" * 4)

    def test_overrun_element_raises(self):
        bad = _ebml_header() + _vid(0x18538067) + _vsize(100) + b"\x00" * 8
        with pytest.raises(ValueError, match="overruns"):
            parse_webm(bad)


class TestMuxRoundTrip:
    def test_multi_cluster_round_trip(self):
        rng = np.random.default_rng(5)
        frames = [rng.integers(0, 256, int(n)).astype(np.uint8).tobytes()
                  for n in rng.integers(5, 40, 11)]
        buf = encode_webm_video(frames, codec="V_MJPEG", width=16,
                                height=16, sync_every=4)
        t = video_track(buf)
        assert t.n_samples == 11
        assert (t.width, t.height) == (16, 16)
        assert t.codec == "V_MJPEG"
        assert t.sync_samples.tolist() == [0, 4, 8]
        assert t.sample_times.tolist() == list(range(11))
        for i, f in enumerate(frames):
            assert extract_sample(buf, t, i) == f

    def test_single_frame_all_sync(self):
        buf = encode_webm_video([b"solo"], width=2, height=2)
        t = video_track(buf)
        assert t.n_samples == 1 and t.sync_samples is None
        assert extract_sample(buf, t, 0) == b"solo"


class TestPipelines:
    def test_frame_sampler_real_webm(self, ray_session):
        """FrameSampler decoder='real' demuxes MJPEG-in-WebM: sampled
        payloads are bit-identical to the JPEG frames that were muxed,
        and decode through the from-scratch JPEG codec."""
        from hierarchical_bloom_filter_index_ray.functions.jpeg import (
            decode_jpeg, encode_jpeg_gray)
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import FrameSampler, synth_frame, synth_media
        out = (synth_media(4, seed=11, kind="webm", frames=10)
               .map_batches(FrameSampler, batch_format="pyarrow",
                            concurrency=1, batch_size=2,
                            fn_constructor_kwargs={
                                "n_frames": 3, "decoder": "real"})
               .to_pandas())
        assert len(out) == 12
        assert sorted(out["frame_no"].unique()) == [0, 3, 6]
        for _, row in out.iterrows():
            want = encode_jpeg_gray(synth_frame(
                row["media_id"], int(row["frame_no"]), seed=11,
                width=16, height=16), quality=92)
            assert bytes(row["payload"]) == want
            assert decode_jpeg(bytes(row["payload"])).shape == (16, 16)

    def test_frame_sampler_snap_to_sync(self, ray_session):
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import FrameSampler, synth_media
        out = (synth_media(2, seed=7, kind="webm", frames=12)
               .map_batches(FrameSampler, batch_format="pyarrow",
                            concurrency=1, batch_size=2,
                            fn_constructor_kwargs={
                                "n_frames": 5, "decoder": "real",
                                "snap_to_sync": True})
               .to_pandas())
        # synth webm muxes sync_every=4: sampled indices snap to
        # cluster-leading keyframes (multiples of 4)
        assert (out["frame_no"].to_numpy() % 4 == 0).all()

    def test_feature_extractor_webm_thumbnail(self, ray_session):
        """decoder='real' features of a webm equal the JPEG features of
        its middle keyframe."""
        from hierarchical_bloom_filter_index_ray.functions.jpeg import (
            decode_jpeg, encode_jpeg_gray)
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import extract_features, pgm_features, synth_frame, \
            synth_media
        got = (extract_features(
            synth_media(5, seed=13, kind="webm", frames=10),
            decoder="real", feature_dim=8, concurrency=1)
            .to_pandas().sort_values("media_id"))
        for mid, feats in zip(got["media_id"], got["features"]):
            # 10 frames, sync_every=4: middle sample 5 snaps to frame 4
            img = decode_jpeg(encode_jpeg_gray(synth_frame(
                mid, 4, seed=13, width=16, height=16), quality=92))
            assert np.allclose(np.asarray(feats),
                               pgm_features(img, 8), atol=1e-6)
