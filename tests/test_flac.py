"""FLAC codec tests.

The module encoder emits CONSTANT/VERBATIM/FIXED/LPC subframes with
single-partition 4-bit Rice — so the remaining decoder-only paths
(the 5-bit Rice2 method, partition orders > 0, escape partitions,
wasted bits) are pinned by a TEST-SIDE frame serializer
written directly from RFC 9639 (own bit writer + own CRCs, sharing
nothing with the module). Round-trips then pin the module encoder
against the decoder across block sizes and every stereo assignment.
"""

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions.flac import (
    decode_flac, encode_flac, is_flac)


# ---- test-side serializer (independent of the module) -------------

def _crc8(data):
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data):
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


class _W:
    def __init__(self):
        self.bits = ""

    def w(self, v, n):
        if n:
            self.bits += format(v & ((1 << n) - 1), f"0{n}b")

    def bytes_(self):
        s = self.bits + "0" * (-len(self.bits) % 8)
        return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def _streaminfo(rate, nch, bps, total, blocksize):
    w = _W()
    w.w(blocksize, 16)
    w.w(blocksize, 16)
    w.w(0, 24)
    w.w(0, 24)
    w.w(rate, 20)
    w.w(nch - 1, 3)
    w.w(bps - 1, 5)
    w.w(total, 36)
    body = w.bytes_() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame(subframe_bits, blocksize, *, nch_code, bps_code, fi=0):
    """Wrap already-serialized subframe bit strings into one frame."""
    h = _W()
    h.w(0x3FFE, 14)
    h.w(0, 2)
    h.w(7, 4)                  # 16-bit blocksize-1 at header end
    h.w(0, 4)                  # rate from streaminfo
    h.w(nch_code, 4)
    h.w(bps_code, 3)
    h.w(0, 1)
    h.w(fi, 8)                 # frame number < 128
    h.w(blocksize - 1, 16)
    hb = h.bytes_()
    body = _W()
    for s in subframe_bits:
        body.bits += s
    frame = hb + bytes([_crc8(hb)]) + body.bytes_()
    return frame + _crc16(frame).to_bytes(2, "big")


def _rice(w, res, param, *, method=0, porder=0, order=0,
          blocksize=None, escape_part=None, escape_bits=8):
    """Residual section with arbitrary partitioning; ``escape_part``
    stores that partition raw with ``escape_bits`` bits."""
    pbits = 4 if method == 0 else 5
    w.w(method, 2)
    w.w(porder, 4)
    parts = 1 << porder
    k = 0
    for p in range(parts):
        n = blocksize // parts - (order if p == 0 else 0)
        if escape_part == p:
            w.w((1 << pbits) - 1, pbits)
            w.w(escape_bits, 5)
            for i in range(n):
                w.w(int(res[k + i]), escape_bits)
        else:
            w.w(param, pbits)
            for i in range(n):
                v = (int(res[k + i]) << 1) ^ (int(res[k + i]) >> 63)
                w.w(0, v >> param)
                w.w(1, 1)
                if param:
                    w.w(v & ((1 << param) - 1), param)
        k += n


def _lpc_subframe(samples, coefs, shift, prec, bps, *, wasted=0,
                  rice_kwargs=None):
    """Serialize an LPC subframe whose residuals reproduce ``samples``
    exactly under integer prediction."""
    order = len(coefs)
    x = [int(v) >> wasted for v in samples]
    res = []
    for i in range(order, len(x)):
        acc = sum(coefs[j] * x[i - 1 - j] for j in range(order))
        res.append(x[i] - (acc >> shift))
    w = _W()
    w.w(0, 1)
    w.w(32 + order - 1, 6)
    if wasted:
        w.w(1, 1)
        w.w(0, wasted - 1)     # unary wasted-1: (wasted-1) zeros...
        w.w(1, 1)
    else:
        w.w(0, 1)
    eff = bps - wasted
    for v in x[:order]:
        w.w(v, eff)
    w.w(prec - 1, 4)
    w.w(shift, 5)
    for c in coefs:
        w.w(c, prec)
    kw = dict(order=order, blocksize=len(x))
    if rice_kwargs:
        kw.update(rice_kwargs)
    _rice(w, np.asarray(res, np.int64), kw.pop("param", 4), **kw)
    return w.bits


class TestHandBuiltDecode:
    def test_lpc_subframe(self):
        """Order-2 LPC (coefs [2,-1], linear extrapolation) hand frame
        == the known samples."""
        rng = np.random.default_rng(3)
        n = 96
        t = np.arange(n)
        x = (500 * np.sin(t / 9)).astype(np.int64)
        bits = _lpc_subframe(x, [2, -1], 0, 4, 16)
        buf = _streaminfo(8000, 1, 16, n, n) + _frame(
            [bits], n, nch_code=0, bps_code=4)
        dec, rate = decode_flac(buf)
        assert rate == 8000
        assert np.array_equal(dec[:, 0], x)

    def test_lpc_with_shift_and_precision(self):
        rng = np.random.default_rng(4)
        n = 64
        x = np.cumsum(rng.integers(-50, 50, n)).astype(np.int64)
        # coefs sum ~ 1.5 at shift 1
        bits = _lpc_subframe(x, [3], 1, 6, 16)
        buf = _streaminfo(16000, 1, 16, n, n) + _frame(
            [bits], n, nch_code=0, bps_code=4)
        dec, _ = decode_flac(buf)
        assert np.array_equal(dec[:, 0], x)

    def test_rice2_partitions_and_escape(self):
        """5-bit Rice2 method, partition order 2, one escaped raw
        partition."""
        rng = np.random.default_rng(5)
        n = 128
        x = (300 * np.sin(np.arange(n) / 7)).astype(np.int64)
        bits = _lpc_subframe(
            x, [1], 0, 2, 16,
            rice_kwargs=dict(method=1, porder=2, param=6,
                             escape_part=2, escape_bits=12))
        buf = _streaminfo(8000, 1, 16, n, n) + _frame(
            [bits], n, nch_code=0, bps_code=4)
        dec, _ = decode_flac(buf)
        assert np.array_equal(dec[:, 0], x)

    def test_wasted_bits(self):
        """Samples with 3 shared trailing zero bits, coded at
        bps-3 with wasted=3."""
        rng = np.random.default_rng(6)
        n = 48
        x = (rng.integers(-800, 800, n) << 3).astype(np.int64)
        bits = _lpc_subframe(x, [1], 0, 2, 16, wasted=3)
        buf = _streaminfo(8000, 1, 16, n, n) + _frame(
            [bits], n, nch_code=0, bps_code=4)
        dec, _ = decode_flac(buf)
        assert np.array_equal(dec[:, 0], x)

    def test_corruption_detected(self):
        n = 32
        x = np.arange(n).astype(np.int64)
        bits = _lpc_subframe(x, [1], 0, 2, 16)
        buf = bytearray(_streaminfo(8000, 1, 16, n, n) + _frame(
            [bits], n, nch_code=0, bps_code=4))
        dec, _ = decode_flac(bytes(buf))
        assert np.array_equal(dec[:, 0], x)
        buf[-3] ^= 0x40                     # flip a residual bit
        with pytest.raises(ValueError):
            decode_flac(bytes(buf))         # CRC-16 must catch it
        with pytest.raises(ValueError):
            decode_flac(b"fLaC" + b"\x00" * 10)


class TestRoundTrip:
    def test_mono_and_blocksizes(self):
        rng = np.random.default_rng(7)
        t = np.arange(5000)
        x = (3000 * np.sin(t / 50)
             + rng.integers(-20, 20, 5000)).astype(np.int64)
        for bs in (192, 600, 4096):
            f = encode_flac(x, 8000, blocksize=bs)
            assert is_flac(f)
            dec, rate = decode_flac(f)
            assert rate == 8000
            assert np.array_equal(dec[:, 0], x), bs

    @pytest.mark.parametrize("mode", ["independent", "left_side",
                                      "right_side", "mid_side"])
    def test_stereo_modes(self, mode):
        rng = np.random.default_rng(8)
        t = np.arange(3000)
        st = np.stack([(2000 * np.sin(t / 30)).astype(np.int64),
                       (1500 * np.cos(t / 40)
                        + rng.integers(-9, 9, 3000)).astype(np.int64)],
                      axis=1)
        dec, rate = decode_flac(
            encode_flac(st, 44100, stereo=mode, blocksize=1024))
        assert rate == 44100
        assert np.array_equal(dec, st)

    def test_extremes_and_noise(self):
        rng = np.random.default_rng(9)
        noise = rng.integers(-32768, 32768, (2001, 2)).astype(np.int64)
        noise[0] = [-32768, 32767]
        dec, _ = decode_flac(encode_flac(noise, 48000, blocksize=500))
        assert np.array_equal(dec, noise)
        const = np.full(700, -5, np.int64)
        dec, _ = decode_flac(encode_flac(const, 8000))
        assert np.array_equal(dec[:, 0], const)

    def test_compresses_smooth_audio(self):
        t = np.arange(20000)
        x = (5000 * np.sin(t / 80)).astype(np.int64)
        f = encode_flac(x, 16000)
        assert len(f) < 0.7 * (2 * len(x))


class TestPipeline:
    def test_feature_extractor_flac_equals_wav(self, ray_session):
        """FLAC features == WAV features of the identical PCM."""
        import ray
        from hierarchical_bloom_filter_index_ray.functions.codecs \
            import encode_wav
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import extract_features
        rng = np.random.default_rng(10)
        t = np.arange(4000)
        pcm = (2500 * np.sin(t / 25)
               + rng.integers(-15, 15, 4000)).astype(np.int16)
        rows = [
            {"media_id": 0, "payload": encode_wav(pcm[:, None], 8000),
             "media_type": "audio/wav"},
            {"media_id": 1,
             "payload": encode_flac(pcm.astype(np.int64), 8000),
             "media_type": "audio/flac"},
        ]
        got = (extract_features(ray.data.from_items(rows),
                                decoder="real", feature_dim=8,
                                concurrency=1)
               .to_pandas().sort_values("media_id"))
        a = np.asarray(got["features"].iloc[0])
        b = np.asarray(got["features"].iloc[1])
        assert np.allclose(a, b, atol=1e-6)


class TestLpcEncoder:
    """Encoder-side LPC (Levinson-Durbin fit + 14-bit quantization):
    exact round trip, chosen only when it wins the exact bit-cost
    comparison against the FIXED predictor."""

    def test_tonal_round_trip_and_wins(self):
        import hierarchical_bloom_filter_index_ray.functions.flac as F
        rng = np.random.default_rng(5)
        t = np.arange(16000)
        sig = (15000 * np.sin(2 * np.pi * 311 * t / 8000)
               + rng.normal(0, 30, len(t))).astype(np.int64)
        enc = F.encode_flac(sig, 8000, blocksize=4096)
        dec, rate = F.decode_flac(enc)
        assert rate == 8000
        assert np.array_equal(dec.ravel(), sig)
        orig = F._lpc_fit
        F._lpc_fit = lambda *a, **k: None
        try:
            fixed_only = F.encode_flac(sig, 8000, blocksize=4096)
        finally:
            F._lpc_fit = orig
        assert np.array_equal(
            F.decode_flac(fixed_only)[0].ravel(), sig)
        assert len(enc) < 0.8 * len(fixed_only)

    def test_residual_mirrors_decoder(self):
        from hierarchical_bloom_filter_index_ray.functions.flac import \
            _lpc_residual
        rng = np.random.default_rng(6)
        x = rng.integers(-1000, 1000, 64).astype(np.int64)
        q = np.array([9000, -4000, 1200], dtype=np.int64)
        shift = 13
        res = _lpc_residual(x, q, shift, 3)
        # decoder-shape reconstruction
        s = list(x[:3])
        for i in range(len(x) - 3):
            acc = sum(int(q[j]) * s[-1 - j] for j in range(3))
            s.append((acc >> shift) + int(res[i]))
        assert np.array_equal(np.asarray(s), x)

    def test_stereo_modes_with_lpc(self):
        from hierarchical_bloom_filter_index_ray.functions.flac import \
            decode_flac, encode_flac
        rng = np.random.default_rng(7)
        t = np.arange(6000)
        l_ = (9000 * np.sin(2 * np.pi * 200 * t / 8000)).astype(np.int64)
        r = l_ + rng.integers(-80, 80, len(t))
        st = np.stack([l_, r], axis=1)
        for mode in ("independent", "left_side", "right_side",
                     "mid_side"):
            d, _ = decode_flac(encode_flac(st, 8000, stereo=mode,
                                           blocksize=1024))
            assert np.array_equal(d, st), mode
