"""ISO-BMFF (MP4) demux/mux tests.

The hand-built fixture assembles boxes with raw ``struct.pack`` in the
test — independent of the module's muxer — covering multi-run stsc,
co64, non-uniform stsz, stts runs, stss, a largesize mdat and a
version-1 tkhd. The round-trip tests then pin the muxer against the
parser, and the pipeline tests pin Motion-JPEG-in-MP4 end-to-end
through FrameSampler / MediaFeatureExtractor."""

import struct

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions.mp4 import (
    Mp4Track, encode_mp4_video, extract_sample, is_mp4, parse_mp4,
    video_track)


def _b(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _fb(fourcc: bytes, version: int, payload: bytes) -> bytes:
    return _b(fourcc, struct.pack(">I", version << 24) + payload)


def _hand_built_file():
    """5 samples in 3 chunks (2/2/1), co64 offsets, stts runs, stss.

    Returns (file bytes, expected offsets, sizes, times)."""
    samples = [b"AAAA", b"BBBBB", b"CC", b"DDD", b"EEEE"]
    sizes = [len(s) for s in samples]
    ftyp = _b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mdat_payload = b"".join(samples)
    # largesize form: size field == 1, real size in the next 8 bytes
    mdat = (struct.pack(">I", 1) + b"mdat"
            + struct.pack(">Q", 16 + len(mdat_payload)) + mdat_payload)
    data_start = len(ftyp) + 16
    chunk_offs = [data_start, data_start + 9, data_start + 14]
    expected_offsets = [chunk_offs[0], chunk_offs[0] + 4,
                        chunk_offs[1], chunk_offs[1] + 2,
                        chunk_offs[2]]
    expected_times = [0, 10, 20, 30, 50]

    stsd_entry = (struct.pack(">I", 8 + 70) + b"jpeg"
                  + b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                  + struct.pack(">HH", 64, 48)
                  + b"\x00" * 14 + b"\x00" * 32
                  + struct.pack(">Hh", 24, -1))
    stsd = _fb(b"stsd", 0, struct.pack(">I", 1) + stsd_entry)
    stts = _fb(b"stts", 0, struct.pack(">IIIII", 2, 3, 10, 2, 20))
    stsc = _fb(b"stsc", 0, struct.pack(">I", 2)
               + struct.pack(">III", 1, 2, 1)
               + struct.pack(">III", 3, 1, 1))
    stsz = _fb(b"stsz", 0, struct.pack(">II", 0, 5)
               + b"".join(struct.pack(">I", s) for s in sizes))
    co64 = _fb(b"co64", 0, struct.pack(">I", 3)
               + b"".join(struct.pack(">Q", o) for o in chunk_offs))
    stss = _fb(b"stss", 0, struct.pack(">III", 2, 1, 3))
    stbl = _b(b"stbl", stsd + stts + stsc + stsz + co64 + stss)
    minf = _b(b"minf", stbl)
    hdlr = _fb(b"hdlr", 0, struct.pack(">I", 0) + b"vide"
               + b"\x00" * 12 + b"h\x00")
    mdhd = _fb(b"mdhd", 0, struct.pack(">IIII", 0, 0, 1000, 70)
               + struct.pack(">HH", 0x55C4, 0))
    mdia = _b(b"mdia", mdhd + hdlr + minf)
    # version-1 tkhd: 8-byte times, then track_id, reserved, 8-byte
    # duration, the fixed tail, 16.16 width/height
    tkhd = _fb(b"tkhd", 1, struct.pack(">QQIIQ", 0, 0, 7, 0, 70)
               + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
               + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000)
               + struct.pack(">II", 64 << 16, 48 << 16))
    trak = _b(b"trak", tkhd + mdia)
    mvhd = _fb(b"mvhd", 0, struct.pack(">IIII", 0, 0, 1000, 70)
               + struct.pack(">I", 0x10000) + struct.pack(">H", 0x100)
               + b"\x00" * 10
               + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000)
               + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _b(b"moov", mvhd + trak)
    return (ftyp + mdat + moov, samples, expected_offsets, sizes,
            expected_times)


class TestParser:
    def test_hand_built_file(self):
        buf, samples, offs, sizes, times = _hand_built_file()
        assert is_mp4(buf)
        tracks = parse_mp4(buf)
        assert len(tracks) == 1
        t = tracks[0]
        assert (t.track_id, t.handler, t.codec) == (7, "vide", "jpeg")
        assert (t.width, t.height) == (64, 48)
        assert (t.timescale, t.duration) == (1000, 70)
        assert t.n_samples == 5
        assert t.sample_offsets.tolist() == offs
        assert t.sample_sizes.tolist() == sizes
        assert t.sample_times.tolist() == times
        assert t.sync_samples.tolist() == [0, 2]
        for i in range(5):
            assert extract_sample(buf, t, i) == samples[i]

    def test_sync_sample_seek(self):
        buf, *_ = _hand_built_file()
        t = parse_mp4(buf)[0]
        assert [t.is_sync(i) for i in range(5)] == [
            True, False, True, False, False]
        assert [t.sync_at_or_before(i) for i in range(5)] == [
            0, 0, 2, 2, 2]
        # no stss => every sample is sync
        t2 = Mp4Track(track_id=1, handler="vide", codec="jpeg",
                      width=1, height=1, timescale=1, duration=5,
                      sample_offsets=t.sample_offsets,
                      sample_sizes=t.sample_sizes,
                      sample_times=t.sample_times, sync_samples=None)
        assert t2.is_sync(3) and t2.sync_at_or_before(3) == 3

    def test_uniform_stsz_and_v0_tkhd_via_muxer(self):
        # the muxer writes v0 tkhd and non-uniform stsz; build a
        # uniform-stsz variant by patching the muxed file is fragile —
        # instead verify uniform sizing through a same-size mux
        frames = [bytes([65 + i]) * 6 for i in range(4)]
        buf = encode_mp4_video(frames, codec=b"pgm ", width=3, height=2,
                               timescale=10, frame_duration=2,
                               sync_every=1)
        t = video_track(buf)
        assert t.codec == "pgm " and t.sync_samples is None
        assert t.sample_sizes.tolist() == [6, 6, 6, 6]
        assert t.sample_times.tolist() == [0, 2, 4, 6]
        assert [extract_sample(buf, t, i) for i in range(4)] == frames

    def test_no_moov_raises(self):
        with pytest.raises(ValueError, match="moov"):
            parse_mp4(_b(b"ftyp", b"isom") + _b(b"mdat", b"xx"))

    def test_overrun_box_raises(self):
        bad = struct.pack(">I", 100) + b"moov" + b"\x00" * 8
        with pytest.raises(ValueError, match="overruns"):
            parse_mp4(bad)


class TestMuxRoundTrip:
    def test_multi_chunk_round_trip(self):
        rng = np.random.default_rng(3)
        frames = [rng.integers(0, 256, int(n)).astype(np.uint8).tobytes()
                  for n in rng.integers(5, 40, 11)]
        buf = encode_mp4_video(frames, codec=b"jpeg", width=16, height=16,
                               sync_every=4)
        t = video_track(buf)
        assert t.n_samples == 11
        assert (t.width, t.height) == (16, 16)
        # chunks of 4 -> keyframes at 0,4,8
        assert t.sync_samples.tolist() == [0, 4, 8]
        for i, f in enumerate(frames):
            assert extract_sample(buf, t, i) == f

    def test_single_frame(self):
        buf = encode_mp4_video([b"solo"], codec=b"jpeg", width=2,
                               height=2)
        t = video_track(buf)
        assert t.n_samples == 1
        assert extract_sample(buf, t, 0) == b"solo"


class TestPipelines:
    def test_frame_sampler_real_mp4(self, ray_session):
        """FrameSampler decoder='real' demuxes MJPEG-in-MP4: sampled
        payloads are bit-identical to the JPEG frames that were muxed,
        and decode through the from-scratch JPEG codec."""
        from hierarchical_bloom_filter_index_ray.functions.jpeg import (
            decode_jpeg, encode_jpeg_gray)
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import FrameSampler, synth_frame, synth_media
        out = (synth_media(4, seed=11, kind="mp4", frames=10)
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
        out = (synth_media(2, seed=7, kind="mp4", frames=12)
               .map_batches(FrameSampler, batch_format="pyarrow",
                            concurrency=1, batch_size=2,
                            fn_constructor_kwargs={
                                "n_frames": 5, "decoder": "real",
                                "snap_to_sync": True})
               .to_pandas())
        # synth mp4 muxes sync_every=4: every sampled index snaps to a
        # keyframe (multiple of 4)
        assert (out["frame_no"].to_numpy() % 4 == 0).all()

    def test_feature_extractor_mp4_thumbnail(self, ray_session):
        """decoder='real' features of an mp4 equal the JPEG features of
        its middle keyframe."""
        from hierarchical_bloom_filter_index_ray.functions.jpeg import (
            decode_jpeg, encode_jpeg_gray)
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import extract_features, pgm_features, synth_frame, \
            synth_media
        got = (extract_features(
            synth_media(5, seed=13, kind="mp4", frames=10),
            decoder="real", feature_dim=8, concurrency=1)
            .to_pandas().sort_values("media_id"))
        for mid, feats in zip(got["media_id"], got["features"]):
            # 10 frames, sync_every=4: middle sample 5 snaps to frame 4
            img = decode_jpeg(encode_jpeg_gray(synth_frame(
                mid, 4, seed=13, width=16, height=16), quality=92))
            assert np.allclose(np.asarray(feats),
                               pgm_features(img, 8), atol=1e-6)
