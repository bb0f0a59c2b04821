"""TIFF codec tests.

Hand-assembled files (own IFD writer, both byte orders) pin the
decoder over the paths the module encoder never emits — big-endian,
WhiteIsZero, palette ColorMap, the horizontal-differencing predictor
and literal hand-packed LZW/PackBits strips; round-trips then pin the
encoder across compressions and strip sizes.
"""

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions.tiff import (
    decode_tiff, encode_tiff, is_tiff)

import struct as st


def _hand_tiff(bo, w, h, strips, tags_extra=(), spp=1, photo=1,
               comp=1, rps=None):
    """Independent minimal TIFF writer: header + one IFD + strip data.
    ``strips`` are ALREADY-ENCODED byte blobs."""
    rps = rps or h
    tags = {256: (4, [w]), 257: (4, [h]), 258: (3, [8] * spp),
            259: (3, [comp]), 262: (3, [photo]), 277: (3, [spp]),
            278: (4, [rps]), 279: (4, [len(s) for s in strips])}
    for tag, typ, vals in tags_extra:
        tags[tag] = (typ, vals)
    n = len(tags) + 1                       # + StripOffsets
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    # out-of-line pool
    pool = bytearray()

    def val_bytes(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(st.pack(bo + fmt, v) for v in vals)

    # place strip data after the pool — two passes
    entries = dict(tags)
    sizes = {t: len(val_bytes(*e)) for t, e in entries.items()}
    pool_len = sum(s for s in sizes.values() if s > 4)
    off_sz = 4 * len(strips)
    strip_base = data_off + pool_len + (off_sz if off_sz > 4 else 0)
    offs = []
    p = strip_base
    for s in strips:
        offs.append(p)
        p += len(s)
    entries[273] = (4, offs)
    body = st.pack(bo + "H", n)
    pos = data_off
    for tag in sorted(entries):
        typ, vals = entries[tag]
        raw = val_bytes(typ, vals)
        body += st.pack(bo + "HHI", tag, typ, len(vals))
        if len(raw) <= 4:
            body += raw.ljust(4, b"\x00")
        else:
            body += st.pack(bo + "I", pos)
            pool += raw
            pos += len(raw)
    body += st.pack(bo + "I", 0)
    hdr = (b"II*\x00" if bo == "<" else b"MM\x00*") \
        + st.pack(bo + "I", ifd_off)
    return hdr + body + bytes(pool) + b"".join(strips)


class _BitsMSB:
    def __init__(self):
        self.s = ""

    def put(self, v, n):
        self.s += format(v, f"0{n}b")

    def bytes_(self):
        s = self.s + "0" * (-len(self.s) % 8)
        return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


class TestHandBuilt:
    def test_uncompressed_both_byte_orders(self):
        rng = np.random.default_rng(50)
        img = rng.integers(0, 256, (5, 7)).astype(np.uint8)
        for bo in ("<", ">"):
            t = _hand_tiff(bo, 7, 5, [img.tobytes()])
            assert is_tiff(t)
            assert np.array_equal(decode_tiff(t), img), bo

    def test_white_is_zero_inverts(self):
        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        t = _hand_tiff("<", 4, 3, [img.tobytes()], photo=0)
        assert np.array_equal(decode_tiff(t), 255 - img)

    def test_palette_colormap(self):
        idx = np.array([[0, 1], [2, 3]], np.uint8)
        # ColorMap: 3*256 SHORTs, 16-bit (value<<8 convention)
        cmap = [0] * (3 * 256)
        rgbs = [(10, 200, 30), (40, 50, 60), (70, 80, 90), (1, 2, 3)]
        for i, (r, g, b) in enumerate(rgbs):
            cmap[i] = r << 8
            cmap[256 + i] = g << 8
            cmap[512 + i] = b << 8
        t = _hand_tiff("<", 2, 2, [idx.tobytes()], photo=3,
                       tags_extra=[(320, 3, cmap)])
        out = decode_tiff(t)
        assert out.shape == (2, 2, 3)
        assert np.array_equal(out.reshape(4, 3),
                              np.array(rgbs, np.uint8))

    def test_horizontal_predictor_grey_and_rgb(self):
        rng = np.random.default_rng(51)
        img = rng.integers(0, 256, (4, 6)).astype(np.uint8)
        diffs = np.diff(img.astype(np.int64), axis=1)
        stored = np.concatenate([img[:, :1].astype(np.int64), diffs],
                                axis=1).astype(np.uint8)
        t = _hand_tiff("<", 6, 4, [stored.tobytes()],
                       tags_extra=[(317, 3, [2])])
        assert np.array_equal(decode_tiff(t), img)
        rgb = rng.integers(0, 256, (3, 5, 3)).astype(np.uint8)
        d = np.diff(rgb.astype(np.int64), axis=1)
        stored = np.concatenate([rgb[:, :1].astype(np.int64), d],
                                axis=1).astype(np.uint8)
        t = _hand_tiff("<", 5, 3, [stored.reshape(3, 15).tobytes()],
                       spp=3, photo=2, tags_extra=[(317, 3, [2])])
        assert np.array_equal(decode_tiff(t), rgb)

    def test_hand_packed_lzw_strip(self):
        """Literal 9-bit codes [Clear=256, 65, 66, 66, EOI=257] packed
        MSB-first -> pixels 'ABB...'."""
        bits = _BitsMSB()
        for c in (256, 65, 66, 66, 257):
            bits.put(c, 9)
        t = _hand_tiff("<", 3, 1, [bits.bytes_()], comp=5)
        assert np.array_equal(decode_tiff(t),
                              np.array([[65, 66, 66]], np.uint8))

    def test_hand_packbits_strip(self):
        # 0xFE: repeat next byte 3x; 0x02: 3 literals; 0x80: noop
        strip = b"\xfe\xaa\x02abc\x80"
        t = _hand_tiff("<", 6, 1, [strip], comp=32773)
        assert np.array_equal(
            decode_tiff(t),
            np.frombuffer(b"\xaa\xaa\xaaabc", np.uint8)[None, :])

    def test_malformed(self):
        with pytest.raises(ValueError):
            decode_tiff(b"II+\x00" + b"\x00" * 30)
        img = np.zeros((2, 2), np.uint8)
        t = bytearray(_hand_tiff("<", 2, 2, [img.tobytes()]))
        with pytest.raises(ValueError):
            decode_tiff(bytes(t[:20]))          # truncated IFD
        t2 = _hand_tiff("<", 2, 2, [img.tobytes()], comp=7)
        with pytest.raises(NotImplementedError):
            decode_tiff(t2)                     # JPEG-in-TIFF


class TestRoundTrip:
    @pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
    def test_grey_rgb_strips(self, comp):
        rng = np.random.default_rng(52)
        g = rng.integers(0, 256, (33, 41)).astype(np.uint8)
        rgb = rng.integers(0, 256, (21, 17, 3)).astype(np.uint8)
        for im in (g, rgb):
            for rps in (None, 7):
                t = encode_tiff(im, compression=comp,
                                rows_per_strip=rps)
                assert np.array_equal(decode_tiff(t), im), (comp, rps)

    def test_lzw_dictionary_reset(self):
        """>3,836 dictionary entries forces the 4094 Clear/reset path
        in both encoder and decoder."""
        rng = np.random.default_rng(53)
        big = rng.integers(0, 256, (300, 300)).astype(np.uint8)
        t = encode_tiff(big, compression="lzw")
        assert np.array_equal(decode_tiff(t), big)

    def test_lzw_compresses_documents(self):
        doc = np.full((200, 200), 255, np.uint8)
        doc[40:42, 10:190] = 0
        t = encode_tiff(doc, compression="lzw")
        assert len(t) < doc.size // 10
        assert np.array_equal(decode_tiff(t), doc)


class TestPipeline:
    def test_feature_extractor_tiff(self, ray_session):
        import ray
        from hierarchical_bloom_filter_index_ray.pipelines.multimodal \
            import extract_features, pgm_features
        rng = np.random.default_rng(54)
        img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        rows = [{"media_id": 0,
                 "payload": encode_tiff(img, compression="lzw"),
                 "media_type": "image/tiff"}]
        got = extract_features(ray.data.from_items(rows),
                               decoder="real", feature_dim=10,
                               concurrency=1).to_pandas()
        want = pgm_features(img, 10)
        assert np.allclose(np.asarray(got["features"].iloc[0]), want,
                           atol=1e-6)
