"""GIF codec and BMP codec tests.

The decoder is pinned by HAND-PACKED LZW bitstreams (codes assembled
bit-by-bit on paper, bytes written literally — no shared packer with
the module), then the module's encoder is pinned against the decoder by
exact round-trips, including dictionary-overflow, KwKwK and interlace
paths. Pipeline tests drive GIF/BMP payloads through the real
MediaFeatureExtractor / FrameSampler stages.
"""

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions.gif import (
    decode_gif, decode_gif_first, encode_gif, is_gif, parse_gif)
from hierarchical_bloom_filter_index_ray.functions.codecs import (
    decode_bmp, encode_bmp, is_bmp)

import struct as st

_PAL4 = bytes([10, 20, 30,  40, 50, 60,  70, 80, 90,  1, 2, 3])


def _gif_wrap(w, h, lzw_body, *, min_code=2, flags89=None):
    """Literal GIF89a file around a hand-packed LZW byte body."""
    out = bytearray(b"GIF89a")
    out += st.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)   # 4-colour GCT
    out += _PAL4
    if flags89 is not None:
        out += b"\x21\xf9\x04" + flags89 + b"\x00"
    out += b"\x2c" + st.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    out.append(len(lzw_body))
    out += lzw_body
    out += b"\x00\x3b"
    return bytes(out)


class TestGifDecode:
    def test_hand_packed_stream(self):
        """codes [clear=4, 1, 1, 2, 2, eoi=5]; the dictionary reaches
        entry 7 after the THIRD data code, so the stream widens 3->4
        bits there (next_code == 1<<width rule): LSB-first
        4 | 1<<3 | 1<<6 | 2<<9 | 2<<12 | 5<<16 = 0x05244C
        -> bytes 4C 24 05."""
        g = _gif_wrap(2, 2, b"\x4c\x24\x05")
        assert is_gif(g)
        frames, _ = decode_gif(g)
        pal = np.frombuffer(_PAL4, np.uint8).reshape(4, 3)
        want = pal[np.array([[1, 1], [2, 2]])]
        assert np.array_equal(frames[0], want)

    def test_hand_packed_kwkwk(self):
        """'aaaa' encodes to [clear, 0, 6, 0, eoi] — code 6 names the
        entry being defined (the KwKwK case):
        4 | 0<<3 | 6<<6 | 0<<9 | 5<<12 = 0x5184 -> bytes 84 51."""
        g = _gif_wrap(2, 2, b"\x84\x51")
        pal = np.frombuffer(_PAL4, np.uint8).reshape(4, 3)
        assert np.array_equal(decode_gif_first(g),
                              np.broadcast_to(pal[0], (2, 2, 3)))

    def test_transparency_and_delay_parsed(self):
        # GCE: transparency on, index 2, delay 7cs
        g = _gif_wrap(2, 2, b"\x4c\x54",
                      flags89=st.pack("<BHB", 1, 7, 2))
        p = parse_gif(g)
        f = p["frames"][0]
        assert f["transparent"] == 2 and f["delay_cs"] == 7
        # transparent pixels keep the canvas (bg colour = palette[0])
        frames, delays = decode_gif(g)
        pal = np.frombuffer(_PAL4, np.uint8).reshape(4, 3)
        assert delays == [7]
        assert np.array_equal(frames[0][0, 0], pal[1])
        assert np.array_equal(frames[0][1, 0], pal[0])   # bg, not idx 2

    def test_corrupt_streams_raise(self):
        with pytest.raises(ValueError):
            decode_gif(b"NOTGIF" + b"\x00" * 20)
        # truncated sub-blocks
        g = bytearray(_gif_wrap(2, 2, b"\x4c\x54"))
        with pytest.raises(ValueError):
            decode_gif(bytes(g[:-4]))


class TestGifRoundTrip:
    def test_stills_and_palettes(self):
        rng = np.random.default_rng(20)
        for ncol in (2, 16, 256):
            pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
            f = rng.integers(0, ncol, (21, 17)).astype(np.uint8)
            assert np.array_equal(decode_gif_first(encode_gif(f, pal)),
                                  pal[f]), ncol

    def test_dictionary_overflow_and_repetition(self):
        rng = np.random.default_rng(21)
        pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
        big = rng.integers(0, 256, (90, 160)).astype(np.uint8)
        assert np.array_equal(decode_gif_first(encode_gif(big, pal)),
                              pal[big])
        rep = np.tile(np.arange(8, dtype=np.uint8), (50, 40))
        pal8 = pal[:8]
        assert np.array_equal(decode_gif_first(encode_gif(rep, pal8)),
                              pal8[rep])

    def test_interlaced(self):
        rng = np.random.default_rng(22)
        pal = rng.integers(0, 256, (64, 3)).astype(np.uint8)
        # heights that hit every interlace pass edge case
        for h in (1, 2, 5, 8, 13):
            f = rng.integers(0, 64, (h, 9)).astype(np.uint8)
            g = encode_gif(f, pal, interlace=True)
            assert np.array_equal(decode_gif_first(g), pal[f]), h

    def test_animation_delays_loop(self):
        rng = np.random.default_rng(23)
        pal = rng.integers(0, 256, (32, 3)).astype(np.uint8)
        fs = [rng.integers(0, 32, (6, 8)).astype(np.uint8)
              for _ in range(4)]
        g = encode_gif(fs, pal, delays_cs=[2, 4, 6, 8], loop=3)
        frames, delays = decode_gif(g)
        assert frames.shape == (4, 6, 8, 3)
        assert delays == [2, 4, 6, 8]
        assert parse_gif(g)["loop"] == 3
        for i, f in enumerate(fs):
            assert np.array_equal(frames[i], pal[f]), i


class TestBmp:
    def test_rgb_round_trip_with_padding(self):
        rng = np.random.default_rng(24)
        for w in (3, 4, 5, 6):                 # stride padding 0..3
            img = rng.integers(0, 256, (7, w, 3)).astype(np.uint8)
            b = encode_bmp(img)
            assert is_bmp(b)
            assert np.array_equal(decode_bmp(b), img), w

    def test_grey_input(self):
        rng = np.random.default_rng(25)
        g = rng.integers(0, 256, (5, 9)).astype(np.uint8)
        out = decode_bmp(encode_bmp(g))
        assert np.array_equal(out, np.stack([g] * 3, axis=2))

    def test_palette_and_topdown(self):
        """Hand-built 8-bit palette BMP, top-down (negative height)."""
        pal = bytes(b for i in range(4) for b in (i * 3, i * 3, i * 3, 0))
        idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
        rows = np.zeros((2, 4), np.uint8)       # stride 4, no pad
        rows[:] = idx
        hdr = st.pack("<IiiHHIIiiII", 40, 4, -2, 1, 8, 0, 8,
                      0, 0, 4, 0)
        off = 14 + 40 + 16
        head = b"BM" + st.pack("<IHHI", off + 8, 0, 0, off)
        b = head + hdr + pal + rows.tobytes()
        out = decode_bmp(b)
        # greyscale palette collapses to (h, w)
        assert out.shape == (2, 4)
        assert np.array_equal(out, idx * 3)

    def test_unsupported_raise(self):
        with pytest.raises(ValueError):
            decode_bmp(b"XX" + b"\x00" * 60)
        b = bytearray(encode_bmp(np.zeros((4, 4, 3), np.uint8)))
        b[30] = 1                               # BI_RLE8
        with pytest.raises(NotImplementedError):
            decode_bmp(bytes(b))


class TestPipelines:
    def test_feature_extractor_gif_bmp(self, ray_session):
        import ray
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import extract_features, pgm_features
        rng = np.random.default_rng(30)
        pal = rng.integers(0, 256, (64, 3)).astype(np.uint8)
        idx = rng.integers(0, 64, (16, 16)).astype(np.uint8)
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        rows = [
            {"media_id": 0, "payload": encode_gif(idx, pal),
             "media_type": "image/gif", "width": 16, "height": 16},
            {"media_id": 1, "payload": encode_bmp(img),
             "media_type": "image/bmp", "width": 16, "height": 16},
        ]
        got = (extract_features(ray.data.from_items(rows),
                                decoder="real", feature_dim=10,
                                concurrency=1)
               .to_pandas().sort_values("media_id"))
        want0 = pgm_features(
            pal[idx].mean(axis=2).astype(np.uint8), 10)
        want1 = pgm_features(img.mean(axis=2).astype(np.uint8), 10)
        assert np.allclose(np.asarray(got["features"].iloc[0]), want0,
                           atol=1e-6)
        assert np.allclose(np.asarray(got["features"].iloc[1]), want1,
                           atol=1e-6)

    def test_frame_sampler_animated_gif(self, ray_session):
        import ray
        from hierarchical_bloom_filter_index_ray.functions.codecs \
            import decode_png
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import FrameSampler
        rng = np.random.default_rng(31)
        pal = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        fs = [rng.integers(0, 16, (8, 8)).astype(np.uint8)
              for _ in range(10)]
        g = encode_gif(fs, pal, delays_cs=[1] * 10)
        out = (ray.data.from_items(
                   [{"media_id": 0, "payload": g}])
               .map_batches(FrameSampler, batch_format="pyarrow",
                            concurrency=1,
                            fn_constructor_kwargs={
                                "n_frames": 4, "decoder": "real"})
               .to_pandas())
        assert sorted(out["frame_no"]) == [0, 2, 5, 7]
        for _, row in out.iterrows():
            img = decode_png(bytes(row["payload"]))
            assert np.array_equal(img, pal[fs[int(row["frame_no"])]])


class TestResizer:
    def test_resize_dispatch_all_formats(self, ray_session):
        """ImageResizer decoder='real' resizes each payload in its own
        format: PNG/BMP/TIFF pixel-exact under nearest-neighbor, GIF
        palette-index-exact across frames, JPEG re-encoded."""
        import ray
        from hierarchical_bloom_filter_index_ray.functions.codecs \
            import decode_bmp, decode_png, encode_bmp, encode_png
        from hierarchical_bloom_filter_index_ray.functions.jpeg \
            import decode_jpeg, encode_jpeg
        from hierarchical_bloom_filter_index_ray.functions.tiff \
            import decode_tiff, encode_tiff
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import ImageResizer, resize_nearest
        rng = np.random.default_rng(70)
        img = rng.integers(0, 256, (16, 12)).astype(np.uint8)
        pal = rng.integers(0, 256, (32, 3)).astype(np.uint8)
        gif_frames = [rng.integers(0, 32, (16, 12)).astype(np.uint8)
                      for _ in range(3)]
        rows = [
            {"media_id": 0, "payload": encode_png(img),
             "media_type": "image/png", "width": 12, "height": 16},
            {"media_id": 1, "payload": encode_bmp(img),
             "media_type": "image/bmp", "width": 12, "height": 16},
            {"media_id": 2,
             "payload": encode_tiff(img, compression="packbits"),
             "media_type": "image/tiff", "width": 12, "height": 16},
            {"media_id": 3,
             "payload": encode_gif(gif_frames, pal,
                                   delays_cs=[2, 4, 6]),
             "media_type": "image/gif", "width": 12, "height": 16},
            {"media_id": 4, "payload": encode_jpeg(img, quality=92),
             "media_type": "image/jpeg", "width": 12, "height": 16},
        ]
        out = (ray.data.from_items(rows)
               .map_batches(ImageResizer, batch_format="pyarrow",
                            concurrency=1,
                            fn_constructor_kwargs={
                                "width": 7, "height": 5,
                                "decoder": "real"})
               .to_pandas().sort_values("media_id"))
        assert (out["width"] == 7).all() and (out["height"] == 5).all()
        want = resize_nearest(img, 7, 5)
        got = {int(r["media_id"]): bytes(r["payload"])
               for _, r in out.iterrows()}
        assert np.array_equal(decode_png(got[0]), want)
        bmp_out = decode_bmp(got[1])
        assert np.array_equal(
            bmp_out, np.stack([want] * 3, 2) if bmp_out.ndim == 3
            else want)
        assert np.array_equal(decode_tiff(got[2]), want)
        g = parse_gif(got[3])
        assert len(g["frames"]) == 3
        for f, orig in zip(g["frames"], gif_frames):
            assert np.array_equal(f["index"],
                                  resize_nearest(orig, 7, 5))
            assert np.array_equal(f["palette"], pal)
        assert [f["delay_cs"] for f in g["frames"]] == [2, 4, 6]
        jp = decode_jpeg(got[4])
        assert jp.shape == (5, 7)

    def test_resize_preserves_transparency(self, ray_session):
        """A transparent index survives the index-plane resize and is
        re-written into the output GCEs (it was silently dropped,
        turning see-through pixels into opaque palette colour 0)."""
        import ray
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import ImageResizer, resize_nearest
        rng = np.random.default_rng(71)
        pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
        fs = [rng.integers(0, 8, (10, 10)).astype(np.uint8)
              for _ in range(3)]
        src = encode_gif(fs, pal, delays_cs=[1, 1, 1], transparent=3)
        out = (ray.data.from_items([{"media_id": 0, "payload": src,
                                     "width": 10, "height": 10}])
               .map_batches(ImageResizer, batch_format="pyarrow",
                            concurrency=1,
                            fn_constructor_kwargs={
                                "width": 5, "height": 4,
                                "decoder": "real"})
               .to_pandas())
        g = parse_gif(bytes(out["payload"][0]))
        assert [f["transparent"] for f in g["frames"]] == [3, 3, 3]
        # nearest-neighbor commutes with per-pixel compositing, so
        # composite(resize) == resize(composite) frame by frame
        want, _ = decode_gif(src)
        got_frames, _ = decode_gif(bytes(out["payload"][0]))
        for w3, g3 in zip(want, got_frames):
            assert np.array_equal(
                np.stack([resize_nearest(w3[:, :, c], 5, 4)
                          for c in range(3)], axis=2), g3)

    def test_resize_rejects_unpreservable_transparency(self):
        """Per-frame transparent indices / restore-disposal under
        transparency can't be re-encoded faithfully — loud
        NotImplementedError (caught by on_error='skip'), not silent
        corruption."""
        import pytest
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import ImageResizer
        rng = np.random.default_rng(72)
        pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
        f = rng.integers(0, 4, (6, 6)).astype(np.uint8)
        # two frames with DIFFERENT transparent indices: splice two
        # single-frame encodes (header+LSD+GCT is 13 + 3*4 bytes)
        g1 = encode_gif([f], pal, transparent=1)
        g2 = encode_gif([f], pal, transparent=2)
        spliced = g1[:-1] + g2[13 + 3 * 4:]
        rz = ImageResizer(width=3, height=3, decoder="real")
        with pytest.raises(NotImplementedError, match="per-frame"):
            rz._resize_payload(spliced)
        # transparent + restore-to-background disposal
        buf = bytearray(encode_gif([f, f], pal, delays_cs=[1, 1],
                                   transparent=1))
        i = buf.find(b"\x21\xf9\x04")
        buf[i + 3] |= 2 << 2                     # disposal = 2
        with pytest.raises(NotImplementedError, match="disposal"):
            rz._resize_payload(bytes(buf))
