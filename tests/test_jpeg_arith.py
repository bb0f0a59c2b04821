"""Arithmetic-coded sequential JPEG (SOF9, ``functions/jpeg_arith.py``).

Three layers pinned here:

1. the raw QM-family coder (T.88 MQ control flow over the slotted
   profile table): exact round trip of arbitrary decision sequences at
   arbitrary skew, incl. the fixed (non-adaptive) decision and marker
   safety (no 0xFF followed by >0x8F inside entropy data);
2. the full SOF9 stream: encode→decode is pixel-IDENTICAL to the
   Huffman baseline of ``jpeg.py`` at the same quantization (arithmetic
   coding replaces only the entropy layer, T.81 Annex D/F), with and
   without restart intervals, and dispatches through ``decode_jpeg``;
3. safety: foreign (untagged) SOF9 raises NotImplementedError — the
   declared ISO Table D.3 seam — and corrupt/truncated profile streams
   raise ValueError/NotImplementedError, never crash.
"""

import zlib

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions import jpeg_arith as ja
from hierarchical_bloom_filter_index_ray.functions.jpeg import (
    decode_jpeg, encode_jpeg_gray)


def _image(h, w, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((yy * 3 + xx * 2) % 256).astype(np.float64)
    img += rng.normal(0, 12, size=(h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


class TestQmCoder:
    def test_round_trip_random_skew(self):
        rng = np.random.default_rng(zlib.crc32(b"qm-rt"))
        prof = ja.default_profile()
        for trial in range(40):
            n = int(rng.integers(1, 3000))
            ncx = int(rng.integers(1, 8))
            p = rng.random()
            bits = (rng.random(n) < p).astype(int)
            cxs = rng.integers(0, ncx, size=n).astype(int)
            enc = ja.QmEncoder(prof, ncx)
            for d, cx in zip(bits, cxs):
                enc.encode(int(d), int(cx))
            data = enc.flush()
            dec = ja.QmDecoder(data, prof, ncx)
            out = [dec.decode(int(cx)) for cx in cxs]
            assert (np.array(out) == bits).all(), trial

    def test_round_trip_fixed_decisions_interleaved(self):
        rng = np.random.default_rng(zlib.crc32(b"qm-fx"))
        prof = ja.default_profile()
        for trial in range(10):
            n = int(rng.integers(1, 800))
            bits = rng.integers(0, 2, size=n).astype(int)
            fixed = rng.integers(0, 2, size=n).astype(bool)
            enc = ja.QmEncoder(prof, 3)
            for d, fx in zip(bits, fixed):
                if fx:
                    enc.encode_fixed(int(d))
                else:
                    enc.encode(int(d), 1)
            data = enc.flush()
            dec = ja.QmDecoder(data, prof, 3)
            out = [dec.decode_fixed() if fx else dec.decode(1)
                   for fx in fixed]
            assert (np.array(out) == bits).all(), trial

    def test_marker_safety(self):
        # all-MPS skewed stream maximizes 0xFF runs; the 7-bit stuffing
        # rule must keep every post-0xFF byte <= 0x8F
        prof = ja.default_profile()
        enc = ja.QmEncoder(prof, 1)
        for _ in range(20000):
            enc.encode(0, 0)
        data = enc.flush()
        arr = np.frombuffer(data, np.uint8)
        after_ff = arr[1:][arr[:-1] == 0xFF]
        assert ((after_ff <= 0x8F) | (after_ff == 0xFF)).all()

    def test_compresses_skewed_input(self):
        prof = ja.default_profile()
        enc = ja.QmEncoder(prof, 1)
        n = 50000
        for _ in range(n):
            enc.encode(0, 0)
        assert len(enc.flush()) < n / 40          # ~adaptive, far under 1 bpb


class TestStreamRoundTrip:
    @pytest.mark.parametrize("h,w,restart,quality", [
        (16, 16, 0, 90), (33, 47, 0, 75), (64, 64, 4, 90),
        (40, 56, 7, 50), (1, 1, 0, 90), (24, 24, 1, 90),
    ])
    def test_pixel_identical_to_huffman(self, h, w, restart, quality):
        img = _image(h, w, zlib.crc32(f"{h}x{w}".encode()))
        payload = ja.encode_jpeg_arith(img, quality=quality,
                                       restart_mcus=restart)
        out = ja.decode_jpeg_arith(payload)
        base = decode_jpeg(encode_jpeg_gray(img, quality=quality))
        assert np.array_equal(out, base)

    def test_dispatches_through_decode_jpeg(self):
        img = _image(32, 40, 7)
        payload = ja.encode_jpeg_arith(img, quality=90)
        assert ja.is_profile_arith(payload)
        out = decode_jpeg(payload)
        assert np.array_equal(out, ja.decode_jpeg_arith(payload))

    def test_usually_smaller_than_huffman(self):
        # arithmetic entropy layer should beat Huffman on typical content
        sizes = []
        for seed in range(4):
            img = _image(48, 48, seed)
            a = len(ja.encode_jpeg_arith(img, quality=85))
            hh = len(encode_jpeg_gray(img, quality=85))
            sizes.append(a / hh)
        assert np.median(sizes) < 1.0


class TestForeignAndCorrupt:
    def test_foreign_sof9_raises_notimplemented(self):
        img = _image(16, 16, 1)
        payload = bytearray(ja.encode_jpeg_arith(img))
        # strip the APP11 profile tag -> a "foreign" SOF9 stream
        i = payload.find(ja.PROFILE_TAG)
        seg_start = payload.rfind(b"\xff\xeb", 0, i)
        seg_len = int.from_bytes(payload[seg_start + 2:seg_start + 4],
                                 "big")
        del payload[seg_start:seg_start + 2 + seg_len]
        with pytest.raises(NotImplementedError):
            ja.decode_jpeg_arith(bytes(payload))
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(payload))

    def test_truncation_and_bitflips_never_crash(self):
        img = _image(32, 32, 2)
        payload = ja.encode_jpeg_arith(img, quality=85, restart_mcus=3)
        rng = np.random.default_rng(zlib.crc32(b"arith-fuzz"))
        for cut in (3, 10, len(payload) // 2, len(payload) - 2):
            try:
                ja.decode_jpeg_arith(payload[:cut])
            except (ValueError, NotImplementedError, IndexError):
                pass
        for _ in range(60):
            mut = bytearray(payload)
            for _ in range(int(rng.integers(1, 6))):
                mut[int(rng.integers(2, len(mut)))] = int(
                    rng.integers(0, 256))
            try:
                out = ja.decode_jpeg_arith(bytes(mut))
                assert out.dtype == np.uint8
            except (ValueError, NotImplementedError):
                pass
