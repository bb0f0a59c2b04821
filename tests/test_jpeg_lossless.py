"""Lossless (SOF3) and 12-bit extended-sequential (SOF1) JPEG tests.

Strategy mirrors tests/test_jpeg_progressive.py: TEST-SIDE serializers
independent of the module's encoder (plain per-sample loops that follow
the T.81 Annex H text directly, and a 12-bit sequential writer with
16-bit DQT) pin the decoder; the module's ``encode_jpeg_lossless`` is
then pinned against the decoder by exact round-trips. The 12-bit DCT
check reconstructs the expected pixels with the test's OWN direct
cosine-sum IDCT (no shared matrix with the module).
"""

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions.jpeg import (
    ZIGZAG, decode_jpeg, decode_jpeg_gray, encode_jpeg_lossless)

import struct as st


def _hand_codes(bits, vals):
    table = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[vals[k]] = (code, ln)
            code += 1
            k += 1
        code *= 2
    return table


class _HandBits:
    def __init__(self):
        self.s = ""

    def put(self, code, ln):
        self.s += format(code, f"0{ln}b")

    def bytes_(self):
        s = self.s + "1" * (-len(self.s) % 8)
        raw = bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))
        return raw.replace(b"\xff", b"\xff\x00")


def _seg(m, body):
    return bytes([0xFF, m]) + st.pack(">H", len(body) + 2) + body


# the test's own universal category table: 17 symbols, all length 6
# (deliberately a DIFFERENT shape from the module's length-5 table)
_CAT_BITS = [0, 0, 0, 0, 0, 17] + [0] * 10
_CAT_VALS = list(range(17))
_CAT = _hand_codes(_CAT_BITS, _CAT_VALS)


def _predict(rec, y, x, sel, first, default):
    """T.81 H.1.2 prediction, written directly from the spec text."""
    if first:
        return default
    if y == 0:
        return rec[y][x - 1]
    if x == 0:
        return rec[y - 1][x]
    a, b, c = rec[y][x - 1], rec[y - 1][x], rec[y - 1][x - 1]
    return {1: a, 2: b, 3: c, 4: a + b - c, 5: a + ((b - c) >> 1),
            6: b + ((a - c) >> 1), 7: (a + b) >> 1}[sel]


def _ll_stream(planes, predictor, prec, pt=0, restart=0,
               interleaved=True):
    """Hand serializer: lossless JPEG from integer (h, w) planes.
    ``interleaved=False`` emits one scan per component instead."""
    h, w = planes[0].shape
    nc = len(planes)
    jpg = bytearray(b"\xff\xd8")
    jpg += _seg(0xC4, bytes([0x00]) + bytes(_CAT_BITS)
                + bytes(_CAT_VALS))
    sof = st.pack(">BHHB", prec, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    jpg += _seg(0xC3, sof)
    if restart:
        jpg += _seg(0xDD, st.pack(">H", restart))
    scans = ([list(range(nc))] if interleaved
             else [[ci] for ci in range(nc)])
    default = 1 << (prec - pt - 1)
    for cis in scans:
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([predictor, 0, pt])
        jpg += _seg(0xDA, sos)
        rec = [[[0] * w for _ in range(h)] for _ in range(nc)]
        bits = _HandBits()
        per = restart or h * w
        for m in range(h * w):
            if m and m % per == 0:          # restart marker boundary
                jpg += bits.bytes_()
                jpg += bytes([0xFF, 0xD0 + ((m // per - 1) & 7)])
                bits = _HandBits()
            y, x = divmod(m, w)
            for ci in cis:
                v = int(planes[ci][y, x]) >> pt
                px = _predict(rec[ci], y, x, predictor,
                              m % per == 0, default)
                rec[ci][y][x] = v
                d = (v - px) & 0xFFFF
                if d >= 32768:
                    d -= 65536
                if d == -32768:
                    bits.put(*_CAT[16])
                    continue
                s = abs(d).bit_length()
                bits.put(*_CAT[s])
                if s:
                    bits.put(d if d > 0 else d + (1 << s) - 1, s)
        jpg += bits.bytes_()
    jpg += b"\xff\xd9"
    return bytes(jpg)


class TestLosslessDecode:
    def test_hand_stream_all_predictors(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (11, 7)).astype(np.int64)
        for sel in range(1, 8):
            jpg = _ll_stream([img], sel, 8)
            got = decode_jpeg(jpg)
            assert got.dtype == np.uint8
            assert np.array_equal(got, img.astype(np.uint8)), sel

    def test_hand_stream_16bit_and_wraparound(self):
        """16-bit samples exercise mod-2^16 differences including the
        category-16 (diff exactly 32768) escape."""
        rng = np.random.default_rng(9)
        img = rng.integers(0, 65536, (6, 9)).astype(np.int64)
        img[0, 1] = (img[0, 0] + 32768) % 65536     # plant category 16
        jpg = _ll_stream([img], 1, 16)
        got = decode_jpeg(jpg)
        assert got.dtype == np.uint16
        assert np.array_equal(got, img.astype(np.uint16))

    def test_hand_stream_point_transform(self):
        rng = np.random.default_rng(2)
        img = (rng.integers(0, 256, (5, 5)) & ~7).astype(np.int64)
        jpg = _ll_stream([img], 4, 8, pt=3)
        assert np.array_equal(decode_jpeg(jpg), img.astype(np.uint8))

    def test_hand_stream_restart_intervals(self):
        """DRI/RSTn in lossless: the predictor resets to the default at
        each interval start (H.2.1.3)."""
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (8, 6)).astype(np.int64)
        jpg = _ll_stream([img], 7, 8, restart=13)
        assert np.array_equal(decode_jpeg(jpg), img.astype(np.uint8))

    def test_hand_stream_multi_component(self):
        rng = np.random.default_rng(6)
        planes = [rng.integers(0, 256, (7, 8)).astype(np.int64)
                  for _ in range(3)]
        for inter in (True, False):
            jpg = _ll_stream(planes, 5, 8, interleaved=inter)
            got = decode_jpeg(jpg)
            assert got.shape == (7, 8, 3)
            want = np.stack(planes, axis=2).astype(np.uint8)
            assert np.array_equal(got, want), inter

    def test_first_plane_helper(self):
        rng = np.random.default_rng(8)
        planes = [rng.integers(0, 4096, (4, 5)).astype(np.int64)
                  for _ in range(2)]
        got = decode_jpeg_gray(_ll_stream(planes, 2, 12))
        assert got.dtype == np.uint16
        assert np.array_equal(got, planes[0].astype(np.uint16))


class TestLosslessRoundTrip:
    def test_module_encoder_against_decoder(self):
        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, (16, 13)).astype(np.uint8)
        for sel in range(1, 8):
            assert np.array_equal(
                decode_jpeg(encode_jpeg_lossless(img, predictor=sel)),
                img), sel

    def test_module_encoder_matches_hand_stream_decode(self):
        """Module encoder and the test serializer produce streams that
        decode identically (they differ in Huffman table shape)."""
        rng = np.random.default_rng(14)
        img = rng.integers(0, 1024, (9, 9)).astype(np.uint16)
        a = decode_jpeg(encode_jpeg_lossless(img, predictor=6,
                                             precision=10))
        b = decode_jpeg(_ll_stream([img.astype(np.int64)], 6, 10))
        assert np.array_equal(a, b) and np.array_equal(a, img)

    def test_multichannel_and_point_transform(self):
        rng = np.random.default_rng(15)
        rgb = rng.integers(0, 256, (6, 7, 3)).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_lossless(rgb, predictor=4)), rgb)
        g = rng.integers(0, 256, (6, 6)).astype(np.uint8)
        got = decode_jpeg(encode_jpeg_lossless(g, point_transform=2))
        assert np.array_equal(got, g & ~3)

    def test_errors(self):
        img = np.zeros((4, 4), np.uint8)
        with pytest.raises(ValueError):
            encode_jpeg_lossless(img, predictor=0)
        with pytest.raises(ValueError):
            encode_jpeg_lossless(img, precision=1)
        with pytest.raises(ValueError):
            encode_jpeg_lossless(np.full((4, 4), 300, np.uint16),
                                 precision=8)
        # subsampled MULTI-component lossless is the declared
        # restriction (a single-component frame ignores its sampling
        # factors per T.81 A.2.2, so it must stay decodable)
        two = [np.zeros((4, 4), np.int64)] * 2
        jpg = bytearray(_ll_stream(two, 1, 8))
        i = jpg.index(b"\xff\xc3")
        assert jpg[i + 11] == 0x11          # h=v of comp 1
        jpg[i + 11] = 0x21
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(jpg))


# ---- 12-bit extended sequential (SOF1) ----------------------------

# 12-bit DC categories reach 15: all 16 at length 6; AC byte symbols as
# in the progressive tests (128 at 8 + 128 at 9 bits)
_DC12_BITS = [0, 0, 0, 0, 0, 16] + [0] * 10
_DC12_VALS = list(range(16))
_DC12 = _hand_codes(_DC12_BITS, _DC12_VALS)
_AC_BITS = [0] * 16
_AC_BITS[7] = 128
_AC_BITS[8] = 128
_AC_VALS = list(range(256))
_AC = _hand_codes(_AC_BITS, _AC_VALS)


def _seq12_grey_stream(h, w, coefs, quant):
    """12-bit SOF1 greyscale stream with a 16-bit (Pq=1) quant table,
    from natural-order quantized coefficient blocks."""
    jpg = bytearray(b"\xff\xd8")
    zq = np.empty(64, dtype=">u2")
    zq[:] = quant[ZIGZAG]
    jpg += _seg(0xDB, bytes([0x10]) + zq.tobytes())
    jpg += _seg(0xC1, st.pack(">BHHB", 12, h, w, 1)
                + bytes([1, 0x11, 0]))
    jpg += _seg(0xC4, bytes([0x00]) + bytes(_DC12_BITS)
                + bytes(_DC12_VALS))
    jpg += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    jpg += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bits = _HandBits()
    pred = 0
    for row in coefs:
        dcv = int(row[0])
        d = dcv - pred
        pred = dcv
        s = abs(d).bit_length()
        bits.put(*_DC12[s])
        if s:
            bits.put(d if d > 0 else d + (1 << s) - 1, s)
        r = 0
        for k in range(1, 64):
            v = int(row[ZIGZAG[k]])
            if v == 0:
                r += 1
                continue
            while r > 15:
                bits.put(*_AC[0xF0])
                r -= 16
            s = abs(v).bit_length()
            bits.put(*_AC[(r << 4) | s])
            bits.put(v if v > 0 else v + (1 << s) - 1, s)
            r = 0
        if r:
            bits.put(*_AC[0x00])
    jpg += bits.bytes_() + b"\xff\xd9"
    return bytes(jpg)


def _ref_idct(block):
    """Direct cosine-sum IDCT (independent of the module's matrix)."""
    out = np.zeros((8, 8))
    for yy in range(8):
        for xx in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                    cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                    s += (cu * cv * block[u, v]
                          * np.cos((2 * yy + 1) * u * np.pi / 16)
                          * np.cos((2 * xx + 1) * v * np.pi / 16))
            out[yy, xx] = s / 4.0
    return out


class TestTwelveBitSequential:
    def test_sof1_12bit_with_16bit_dqt(self):
        """8x8 single block: decode equals the test's own IDCT of the
        dequantized coefficients, level-shifted by 2048, in uint16."""
        rng = np.random.default_rng(21)
        quant = np.ones(64, np.int64)
        quant[0] = 700                      # >255 forces the Pq=1 path
        quant[1:4] = 300
        coefs = np.zeros((1, 64), np.int64)
        coefs[0, 0] = 2                     # dequantized DC 1400
        zz = np.asarray(ZIGZAG)
        coefs[0, zz[1]] = 5
        coefs[0, zz[2]] = -3
        coefs[0, zz[9]] = rng.integers(-40, 40)
        jpg = _seq12_grey_stream(8, 8, coefs, quant)
        got = decode_jpeg(jpg)
        assert got.dtype == np.uint16
        want = _ref_idct((coefs[0] * quant).reshape(8, 8)) + 2048.0
        want = np.clip(np.round(want), 0, 4095).astype(np.uint16)
        assert np.array_equal(got, want)

    def test_sof1_12bit_large_dc_categories(self):
        """Multi-block 12-bit stream with DC jumps needing categories
        up to 15 and values spanning the 0..4095 range."""
        rng = np.random.default_rng(22)
        quant = np.ones(64, np.int64)
        nb = 6
        coefs = np.zeros((nb, 64), np.int64)
        coefs[:, 0] = [0, 16000, -12000, 15000, -16000, 8]
        jpg = _seq12_grey_stream(8, 8 * nb, coefs, quant)
        got = decode_jpeg(jpg)
        assert got.dtype == np.uint16 and got.shape == (8, 48)
        for b in range(nb):
            want = np.clip(np.round(
                _ref_idct(coefs[b].reshape(8, 8)) + 2048.0),
                0, 4095).astype(np.uint16)
            assert np.array_equal(got[:, 8 * b:8 * b + 8], want), b

    def test_sof0_rejects_12bit_is_gone(self):
        """12-bit now decodes rather than raising (the old seam)."""
        quant = np.ones(64, np.int64)
        coefs = np.zeros((1, 64), np.int64)
        jpg = _seq12_grey_stream(8, 8, coefs, quant)
        assert decode_jpeg(jpg)[0, 0] == 2048
