"""PNG extended-feature tests: Adam7 interlace, bit depths 1/2/4/16.

Fixtures are hand-assembled (per-pass packing done in the test with
numpy packbits / big-endian views — nothing shared with the decoder's
unpack path) around the module's chunk writer.
"""

import struct
import zlib

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions.codecs import (
    _ADAM7, _PNG_SIG, _chunk, decode_png, encode_png)


def _hand_png(w, h, depth, color, raster, plte=None, interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = _PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(raster)) \
        + _chunk(b"IEND", b"")


def _rows(sub2d: np.ndarray, depth: int) -> bytes:
    """Filter-0 raster for one (sub-)image of per-pixel sample bytes
    laid out (h, w*ch); packs sub-8 depths / splits 16-bit."""
    if depth == 8:
        rows = sub2d.astype(np.uint8)
    elif depth == 16:
        rows = np.frombuffer(sub2d.astype(">u2").tobytes(),
                             np.uint8).reshape(sub2d.shape[0], -1)
    else:
        h = sub2d.shape[0]
        per = 8 // depth
        pad = (-sub2d.shape[1]) % per
        padded = np.pad(sub2d.astype(np.uint8), ((0, 0), (0, pad)))
        if depth == 1:
            rows = np.packbits(padded, axis=1)
        else:
            g = padded.reshape(h, -1, per)
            shifts = (np.arange(per)[::-1] * depth).astype(np.uint8)
            rows = (g << shifts).sum(axis=2).astype(np.uint8)
    h = rows.shape[0]
    return np.concatenate([np.zeros((h, 1), np.uint8), rows],
                          axis=1).tobytes()


class TestBitDepths:
    def test_1_2_4_bit_grey_scale_to_255(self):
        rng = np.random.default_rng(61)
        for depth in (1, 2, 4):
            maxv = (1 << depth) - 1
            img = rng.integers(0, maxv + 1, (6, 11)).astype(np.uint8)
            buf = _hand_png(11, 6, depth, 0, _rows(img, depth))
            want = (img.astype(np.uint16) * (255 // maxv)
                    ).astype(np.uint8)
            assert np.array_equal(decode_png(buf), want), depth

    def test_4_bit_palette_uses_raw_indices(self):
        rng = np.random.default_rng(62)
        idx = rng.integers(0, 16, (5, 7)).astype(np.uint8)
        plte = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        buf = _hand_png(7, 5, 4, 3, _rows(idx, 4), plte=plte)
        assert np.array_equal(decode_png(buf), plte[idx])

    def test_16_bit_grey_and_rgb(self):
        rng = np.random.default_rng(63)
        g = rng.integers(0, 65536, (4, 6)).astype(np.uint16)
        out = decode_png(_hand_png(6, 4, 16, 0, _rows(g, 16)))
        assert out.dtype == np.uint16 and np.array_equal(out, g)
        rgb = rng.integers(0, 65536, (3, 5, 3)).astype(np.uint16)
        out = decode_png(_hand_png(5, 3, 16, 2,
                                   _rows(rgb.reshape(3, 15), 16)))
        assert out.dtype == np.uint16
        assert np.array_equal(out, rgb)

    def test_illegal_combos_raise(self):
        z = np.zeros((2, 2), np.uint8)
        with pytest.raises(ValueError):
            decode_png(_hand_png(2, 2, 4, 2, _rows(z, 4)))   # 4-bit RGB
        with pytest.raises(ValueError):
            decode_png(_hand_png(2, 2, 16, 3, _rows(z, 16)))
        with pytest.raises(ValueError):
            decode_png(_hand_png(2, 2, 3, 0, _rows(z, 8)))


class TestAdam7:
    @pytest.mark.parametrize("shape,color", [
        ((7, 11), 0), ((8, 8), 0), ((1, 1), 0), ((2, 3), 0),
        ((7, 11, 3), 2), ((9, 5, 4), 6)])
    def test_interlaced_8bit(self, shape, color):
        rng = np.random.default_rng(64)
        img = rng.integers(0, 256, shape).astype(np.uint8)
        ch = 1 if img.ndim == 2 else img.shape[2]
        h, w = img.shape[:2]
        parts = []
        for xs, ys, dx, dy in _ADAM7:
            sub = img[ys::dy, xs::dx]
            if sub.size == 0:
                continue
            parts.append(_rows(sub.reshape(sub.shape[0], -1), 8))
        buf = _hand_png(w, h, 8, color, b"".join(parts), interlace=1)
        assert np.array_equal(decode_png(buf), img), shape

    def test_interlaced_1bit(self):
        rng = np.random.default_rng(65)
        bits = rng.integers(0, 2, (9, 9)).astype(np.uint8)
        parts = []
        for xs, ys, dx, dy in _ADAM7:
            sub = bits[ys::dy, xs::dx]
            if sub.size == 0:
                continue
            parts.append(_rows(sub, 1))
        buf = _hand_png(9, 9, 1, 0, b"".join(parts), interlace=1)
        assert np.array_equal(decode_png(buf), bits * 255)

    def test_interlaced_palette(self):
        rng = np.random.default_rng(66)
        idx = rng.integers(0, 256, (6, 10)).astype(np.uint8)
        plte = rng.integers(0, 256, (256, 3)).astype(np.uint8)
        parts = []
        for xs, ys, dx, dy in _ADAM7:
            sub = idx[ys::dy, xs::dx]
            if sub.size == 0:
                continue
            parts.append(_rows(sub, 8))
        buf = _hand_png(10, 6, 8, 3, b"".join(parts), plte=plte,
                        interlace=1)
        assert np.array_equal(decode_png(buf), plte[idx])

    def test_trailing_garbage_detected(self):
        rng = np.random.default_rng(67)
        img = rng.integers(0, 256, (4, 4)).astype(np.uint8)
        parts = []
        for xs, ys, dx, dy in _ADAM7:
            sub = img[ys::dy, xs::dx]
            if sub.size == 0:
                continue
            parts.append(_rows(sub, 8))
        raster = b"".join(parts) + b"\x00\x00\x00"
        with pytest.raises(ValueError):
            decode_png(_hand_png(4, 4, 8, 0, raster, interlace=1))


class TestRegression:
    def test_encoder_round_trip_unchanged(self):
        rng = np.random.default_rng(68)
        for shape in [(9, 11), (9, 11, 3), (9, 11, 4)]:
            img = rng.integers(0, 256, shape).astype(np.uint8)
            assert np.array_equal(decode_png(encode_png(img)), img)
