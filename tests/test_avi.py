"""AVI (RIFF) demux/mux tests.

A RIFF tree is hand-assembled in the test — independent of the
module's muxer — covering nested 'rec ' lists, odd-size chunk padding,
a second (audio) stream and idx1 keyframe flags; the muxer is then
pinned against the parser, and the pipeline tests pin
FrameSampler/MediaFeatureExtractor over Motion-JPEG-in-AVI.
"""

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions.avi import (
    AviTrack, encode_avi_video, extract_sample, is_avi, parse_avi,
    video_track)

import struct as st


def _ck(fcc, body):
    return fcc + st.pack("<I", len(body)) + body \
        + (b"\x00" if len(body) & 1 else b"")


def _lst(ltype, body):
    return _ck(b"LIST", ltype + body)


def _strh(ftype, fcc, scale, rate):
    return st.pack("<4s4sIHHIIIIIIII", ftype, fcc, 0, 0, 0, 0,
                   scale, rate, 0, 0, 0, 0, 0) + b"\x00" * 8


def _strf_vids(w, h):
    return st.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                   w * h * 3, 0, 0, 0, 0)


def _hand_avi(frames, *, keyframes, with_audio=False, rec_wrap=False):
    """Hand-built AVI: video stream 0 (+ optional audio stream 1 whose
    chunks interleave), idx1 flags per ``keyframes``."""
    strl_v = _lst(b"strl", _ck(b"strh", _strh(b"vids", b"MJPG", 1, 25))
                  + _ck(b"strf", _strf_vids(16, 16)))
    strls = strl_v
    n_streams = 1
    if with_audio:
        strl_a = _lst(b"strl",
                      _ck(b"strh", _strh(b"auds", b"\x01\x00\x00\x00",
                                         1, 8000))
                      + _ck(b"strf", b"\x01\x00\x01\x00"))
        strls += strl_a
        n_streams = 2
    avih = st.pack("<IIIIIIIIIIIIII", 40000, 0, 0, 0x10, len(frames),
                   0, n_streams, 0, 16, 16, 0, 0, 0, 0)
    hdrl = _lst(b"hdrl", _ck(b"avih", avih) + strls)
    movi = bytearray()              # _lst adds the 'movi' ltype itself
    idx = bytearray()
    for i, f in enumerate(frames):
        rel = 4 + len(movi)         # idx1 offsets count from 'movi'
        chunk = _ck(b"00dc", f)
        if rec_wrap:                      # some muxers nest in 'rec '
            movi += _lst(b"rec ", chunk)
        else:
            movi += chunk
        flags = 0x10 if i in keyframes else 0
        idx += st.pack("<4sIII", b"00dc", flags, rel, len(f))
        if with_audio:
            movi += _ck(b"01wb", b"\xab" * 7)   # odd size: pad byte
            idx += st.pack("<4sIII", b"01wb", 0, 0, 7)
    body = b"AVI " + hdrl + _lst(b"movi", bytes(movi)) \
        + _ck(b"idx1", bytes(idx))
    return b"RIFF" + st.pack("<I", len(body)) + body


class TestAviDemux:
    def test_hand_built_file(self):
        frames = [b"frame-%d!" % i for i in range(5)]
        buf = _hand_avi(frames, keyframes={0, 2, 4})
        assert is_avi(buf)
        t = video_track(buf)
        assert t.codec == "MJPG" and t.handler == "vide"
        assert t.width == 16 and t.height == 16 and t.timescale == 25
        assert t.n_samples == 5
        for i, f in enumerate(frames):
            assert extract_sample(buf, t, i) == f, i
        assert t.sync_samples.tolist() == [0, 2, 4]
        assert t.sync_at_or_before(3) == 2
        assert t.is_sync(2) and not t.is_sync(1)

    def test_interleaved_audio_and_odd_padding(self):
        frames = [b"v%d" % i for i in range(4)]
        buf = _hand_avi(frames, keyframes={0}, with_audio=True)
        tracks = parse_avi(buf)
        assert len(tracks) == 2
        t = video_track(buf)
        assert [extract_sample(buf, t, i) for i in range(4)] == frames
        snd = [x for x in tracks if x.handler == "soun"][0]
        assert snd.n_samples == 4
        assert extract_sample(buf, snd, 2) == b"\xab" * 7

    def test_rec_nested_movi(self):
        frames = [b"AA", b"BB", b"CC"]
        buf = _hand_avi(frames, keyframes={0}, rec_wrap=True)
        t = video_track(buf)
        assert [extract_sample(buf, t, i) for i in range(3)] == frames

    def test_malformed(self):
        with pytest.raises(ValueError):
            parse_avi(b"RIFF\x08\x00\x00\x00WAVE" + b"\x00" * 8)
        buf = bytearray(_hand_avi([b"xx"], keyframes={0}))
        # oversize an inner chunk so it overruns its parent
        i = buf.index(b"00dc")
        st.pack_into("<I", buf, i + 4, 1 << 20)
        with pytest.raises(ValueError):
            parse_avi(bytes(buf))


class TestAviMux:
    def test_round_trip_and_keyframes(self):
        rng = np.random.default_rng(40)
        frames = [bytes(rng.integers(0, 256, rng.integers(5, 40),
                                     dtype=np.uint8).tobytes())
                  for _ in range(9)]
        buf = encode_avi_video(frames, width=8, height=6, fps=30,
                               sync_every=4)
        t = video_track(buf)
        assert t.n_samples == 9 and t.width == 8 and t.height == 6
        for i, f in enumerate(frames):
            assert extract_sample(buf, t, i) == f, i
        assert t.sync_samples.tolist() == [0, 4, 8]
        # all-keyframe mux collapses sync to None (every frame sync)
        t2 = video_track(encode_avi_video(frames, width=8, height=6))
        assert t2.sync_samples is None


class TestPipelines:
    def test_frame_sampler_real_avi(self, ray_session):
        import ray
        from hierarchical_bloom_filter_index_ray.functions.jpeg import (
            decode_jpeg, encode_jpeg_gray)
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import FrameSampler
        rng = np.random.default_rng(41)
        imgs = [rng.integers(0, 256, (16, 16)).astype(np.uint8)
                for _ in range(8)]
        frames = [encode_jpeg_gray(im, quality=92) for im in imgs]
        buf = encode_avi_video(frames, width=16, height=16,
                               sync_every=4)
        out = (ray.data.from_items([{"media_id": 0, "payload": buf}])
               .map_batches(FrameSampler, batch_format="pyarrow",
                            concurrency=1,
                            fn_constructor_kwargs={
                                "n_frames": 3, "decoder": "real",
                                "snap_to_sync": True})
               .to_pandas())
        # samples 0,2,5 snap to keyframes {0,4}: unique -> [0, 4]
        assert sorted(out["frame_no"]) == [0, 4]
        for _, row in out.iterrows():
            assert bytes(row["payload"]) == frames[int(row["frame_no"])]
            assert decode_jpeg(bytes(row["payload"])).shape == (16, 16)

    def test_feature_extractor_avi_thumbnail(self, ray_session):
        import ray
        from hierarchical_bloom_filter_index_ray.functions.jpeg import (
            decode_jpeg, encode_jpeg_gray)
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import extract_features, pgm_features
        rng = np.random.default_rng(42)
        imgs = [rng.integers(0, 256, (16, 16)).astype(np.uint8)
                for _ in range(6)]
        frames = [encode_jpeg_gray(im, quality=92) for im in imgs]
        buf = encode_avi_video(frames, width=16, height=16,
                               sync_every=2)
        got = (extract_features(
                   ray.data.from_items([{"media_id": 0, "payload": buf,
                                         "media_type": "video/avi"}]),
                   decoder="real", feature_dim=8, concurrency=1)
               .to_pandas())
        # 6 samples, middle = 3, snaps to keyframe 2
        want = pgm_features(decode_jpeg(frames[2]), 8)
        assert np.allclose(np.asarray(got["features"].iloc[0]), want,
                           atol=1e-6)
