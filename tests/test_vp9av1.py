"""VP9/AV1 structural layer (``functions/vp9av1.py``): frame-header /
OBU parsing against hand-assembled bitstreams from an independent
test-side bit writer, superframe split, WebM wiring, and the fuzz
boundary."""

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions import vp9av1 as V


class BitW:
    """Independent MSB-first writer."""

    def __init__(self):
        self.bits: list[int] = []

    def f(self, n, v):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def bytes(self) -> bytes:
        bits = list(self.bits)
        while len(bits) % 8:
            bits.append(0)
        return bytes(int("".join(map(str, bits[i:i + 8])), 2)
                     for i in range(0, len(bits), 8))


def vp9_key_frame(width, height, profile=0, bit_depth=8,
                  render=None) -> bytes:
    w = BitW()
    w.f(2, 2)                                  # frame_marker
    w.f(1, profile & 1).f(1, profile >> 1)
    if profile == 3:
        w.f(1, 0)
    w.f(1, 0)                                  # not show_existing
    w.f(1, 0)                                  # KEY
    w.f(1, 1)                                  # show_frame
    w.f(1, 0)                                  # not error resilient
    w.f(24, 0x498342)
    if profile >= 2:
        w.f(1, 1 if bit_depth == 12 else 0)
    w.f(3, 1)                                  # color_space BT601
    w.f(1, 0)                                  # color_range
    if profile in (1, 3):
        w.f(1, 0).f(1, 0).f(1, 0)              # 4:4:4 + reserved
    w.f(16, width - 1).f(16, height - 1)
    if render:
        w.f(1, 1).f(16, render[0] - 1).f(16, render[1] - 1)
    else:
        w.f(1, 0)
    return w.bytes() + b"\x00" * 8             # fake compressed tail


def vp9_inter_frame() -> bytes:
    w = BitW()
    w.f(2, 2).f(1, 0).f(1, 0)                  # marker, profile 0
    w.f(1, 0)                                  # not show_existing
    w.f(1, 1)                                  # NON-key
    w.f(1, 1)                                  # show
    w.f(1, 0)                                  # not err resilient
    return w.bytes() + b"\x00" * 6


def av1_seq_obu(width, height, profile=0, reduced=True,
                high_bitdepth=0) -> bytes:
    w = BitW()
    w.f(3, profile)
    w.f(1, 0)                                  # still_picture
    w.f(1, 1 if reduced else 0)
    if reduced:
        w.f(5, 0)                              # seq_level_idx
    else:
        w.f(1, 0)                              # no timing info
        w.f(1, 0)                              # no initial display delay
        w.f(5, 0)                              # one operating point
        w.f(12, 0).f(5, 0)                     # idc, level 0 (<=7)
    wb = max((width - 1).bit_length(), 1)
    hb = max((height - 1).bit_length(), 1)
    w.f(4, wb - 1).f(4, hb - 1)
    w.f(wb, width - 1).f(hb, height - 1)
    if not reduced:
        w.f(1, 0)                              # no frame ids
    w.f(1, 1)                                  # 128x128 sb
    w.f(1, 0).f(1, 0)                          # filter_intra, edge
    if not reduced:
        w.f(4, 0)                              # interintra..dual_filter
        w.f(1, 0)                              # no order hint
        w.f(1, 1)                              # choose sct -> SELECT
        w.f(1, 0)                              # choose imv -> explicit
        w.f(1, 0)                              # force imv 0
    w.f(3, 0)                                  # superres, cdef, rest.
    w.f(1, high_bitdepth)
    if profile != 1:
        w.f(1, 0)                              # not mono
    w.f(1, 0)                                  # no color description
    w.f(1, 0)                                  # color range
    if profile == 0:
        pass                                   # 4:2:0 implied
    w.f(2, 0)                                  # chroma sample position
    w.f(1, 0)                                  # separate_uv_delta_q
    w.f(1, 0)                                  # film grain
    body = w.bytes()
    hdr = BitW().f(1, 0).f(4, 1).f(1, 0).f(1, 1).f(1, 0).bytes()
    assert len(body) < 0x80
    return hdr + bytes([len(body)]) + body


class TestVp9:
    def test_key_frame_header(self):
        info = V.vp9_frame_info(vp9_key_frame(1920, 1080))
        assert info["keyframe"] and info["frame_type"] == "key"
        assert (info["width"], info["height"]) == (1920, 1080)
        assert info["bit_depth"] == 8 and info["profile"] == 0
        assert info["render_width"] == 1920

    def test_profile2_12bit(self):
        info = V.vp9_frame_info(
            vp9_key_frame(640, 360, profile=2, bit_depth=12))
        assert info["bit_depth"] == 12 and info["profile"] == 2

    def test_render_size(self):
        info = V.vp9_frame_info(
            vp9_key_frame(1280, 720, render=(640, 360)))
        assert info["render_width"] == 640
        assert info["render_height"] == 360

    def test_inter_frame(self):
        info = V.vp9_frame_info(vp9_inter_frame())
        assert not info["keyframe"]
        assert info["frame_type"] == "inter"

    def test_bad_marker_and_sync(self):
        with pytest.raises(ValueError):
            V.vp9_frame_info(b"\x00\x00\x00\x00")
        bad = bytearray(vp9_key_frame(64, 64))
        bad[1] ^= 0x40                         # clobber sync code area
        with pytest.raises(ValueError):
            V.vp9_frame_info(bytes(bad))

    def test_superframe_split(self):
        f1 = vp9_key_frame(64, 64)
        f2 = vp9_inter_frame()
        marker = 0xC0 | (1 << 3) | 1           # 2 frames, 2 bytes each
        idx = bytes([marker]) + len(f1).to_bytes(2, "little") \
            + len(f2).to_bytes(2, "little") + bytes([marker])
        block = f1 + f2 + idx
        parts = V.split_vp9_superframe(block)
        assert parts == [f1, f2]
        # a non-superframe block passes through untouched
        assert V.split_vp9_superframe(f1) == [f1]


class TestAv1:
    def test_sequence_header(self):
        obu = av1_seq_obu(1920, 1080)
        info = V.av1_sequence_info(obu)
        assert (info["width"], info["height"]) == (1920, 1080)
        assert info["bit_depth"] == 8 and info["profile"] == 0
        assert info["reduced_header"]

    def test_full_header_with_operating_points(self):
        obu = av1_seq_obu(3840, 2160, reduced=False, high_bitdepth=1)
        info = V.av1_sequence_info(obu)
        assert (info["width"], info["height"]) == (3840, 2160)
        assert info["bit_depth"] == 10
        assert info["levels"] == [0]

    def test_obu_walk_and_keyframes(self):
        td = bytes([0x12, 0x00])               # temporal delimiter OBU
        seq = av1_seq_obu(640, 360)
        frame = bytes([0x32, 0x03, 0x10, 0x00, 0x00])   # frame OBU
        stream = td + seq + frame + frame
        obus = V.parse_obus(stream)
        assert [o["name"] for o in obus] == [
            "temporal_delimiter", "sequence_header", "frame", "frame"]
        info = V.av1_sequence_info(stream)
        assert info["n_obus"] == 4
        # only the frame right after the sequence header is a keyframe
        assert len(info["frame_offsets_after_seq"]) == 1

    def test_malformed(self):
        with pytest.raises(ValueError):
            V.parse_obus(b"\x80\x00")          # forbidden bit
        with pytest.raises(ValueError):
            V.parse_obus(bytes([0x0A, 0xFF]))  # leb128 overrun
        with pytest.raises(ValueError):
            V.av1_sequence_info(bytes([0x12, 0x00]))    # no seq header


class TestWebmWiring:
    def _webm(self, frames, codec):
        from hierarchical_bloom_filter_index_ray.functions.webm import (
            encode_webm_video)
        return encode_webm_video(frames, codec=codec, width=64,
                                 height=64, sync_every=4)

    def test_vp9_track_info(self):
        frames = [vp9_key_frame(64, 64)] + [vp9_inter_frame()] * 3 \
            + [vp9_key_frame(64, 64)] + [vp9_inter_frame()] * 2
        wb = self._webm(frames, "V_VP9")
        info = V.webm_video_info(wb)
        assert info["codec"] == "V_VP9"
        assert info["n_frames"] == 7 and info["n_keyframes"] == 2
        assert (info["width"], info["height"]) == (64, 64)
        cuts = V.vp9_cut_points(wb)
        assert cuts.tolist() == [0, 4]

    def test_av1_track_info(self):
        seq = av1_seq_obu(128, 96)
        frame = bytes([0x32, 0x02, 0x10, 0x00])
        frames = [seq + frame, frame, frame]
        wb = self._webm(frames, "V_AV1")
        info = V.webm_video_info(wb)
        assert (info["width"], info["height"]) == (128, 96)

    def test_other_codec_raises(self):
        wb = self._webm([b"xx", b"yy"], "V_VP8")
        with pytest.raises(NotImplementedError):
            V.webm_video_info(wb)


class TestFuzz:
    def test_vp9_bitflips_never_crash(self):
        rng = np.random.default_rng(31)
        base = vp9_key_frame(320, 240, profile=2, bit_depth=10)
        for _ in range(200):
            mut = bytearray(base)
            for _ in range(int(rng.integers(1, 5))):
                mut[int(rng.integers(0, len(mut)))] = int(
                    rng.integers(0, 256))
            try:
                V.vp9_frame_info(bytes(mut))
            except ValueError:
                pass
        for cut in range(0, len(base), 3):
            try:
                V.vp9_frame_info(base[:cut])
            except ValueError:
                pass

    def test_av1_bitflips_never_crash(self):
        rng = np.random.default_rng(37)
        base = av1_seq_obu(1920, 1080, reduced=False)
        for _ in range(200):
            mut = bytearray(base)
            for _ in range(int(rng.integers(1, 5))):
                mut[int(rng.integers(0, len(mut)))] = int(
                    rng.integers(0, 256))
            try:
                V.av1_sequence_info(bytes(mut))
            except (ValueError, NotImplementedError):
                pass
