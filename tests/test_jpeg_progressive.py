"""Progressive (SOF2) and multi-scan sequential JPEG decode tests.

Strategy: a TEST-SIDE progressive serializer (T.81 Annex G.1.2 encoder
semantics: point transforms, EOB-run accumulation, correction-bit
buffering) emits scan scripts from hand-chosen quantized coefficients,
and the decoded image must equal the decode of a BASELINE stream built
from the same coefficients by an equally test-side sequential
serializer. Both serializers are independent of the module's decoder
internals (only the public ZIGZAG constant is shared), so a bug on
either side breaks the equality. Universal fixed-length Huffman tables
(all 12 DC categories at 4 bits, all 256 AC symbols at 9 bits) keep the
serializers single-pass while covering EOBn and ZRL symbols that the
Annex K tables lack.
"""

import numpy as np
import pytest

from hierarchical_bloom_filter_index_ray.functions.jpeg import (
    ZIGZAG, decode_jpeg, decode_jpeg_gray)

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


# universal tables: every DC category at length 4; every AC byte symbol
# present, 128 at length 8 + 128 at length 9 (DHT counts are single
# bytes, and the reserved all-ones codes stay free at both lengths)
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_BITS = [0] * 16
_AC_BITS[7] = 128
_AC_BITS[8] = 128
_AC_VALS = list(range(256))
_DC = _hand_codes(_DC_BITS, _DC_VALS)
_AC = _hand_codes(_AC_BITS, _AC_VALS)


def _seg(m, body):
    return bytes([0xFF, m]) + st.pack(">H", len(body) + 2) + body


def _put_val(bits, v, s):
    bits.put(v if v > 0 else v + (1 << s) - 1, s)


def _pt_ac(v, al):
    """AC point transform: sign-magnitude shift (T.81 G.1.2.2)."""
    return (abs(v) >> al) * (1 if v > 0 else -1)


def _emit_seq_block(bits, row, pred):
    """Full-band sequential block (natural-order row); returns new DC
    predictor."""
    dcv = int(row[0])
    diff = dcv - pred
    s = abs(diff).bit_length()
    bits.put(*_DC[s])
    if s:
        _put_val(bits, diff, s)
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
        _put_val(bits, v, s)
        r = 0
    if r:
        bits.put(*_AC[0x00])
    return dcv


class _ProgAC:
    """Per-interval progressive AC scan emitter (first or refine) with
    cross-block EOB-run and correction-bit buffering."""

    def __init__(self, bits, ss, se, al):
        self.bits = bits
        self.ss, self.se, self.al = ss, se, al
        self.eobrun = 0
        self.pending = []

    def flush(self):
        n = self.eobrun
        if n:
            r = n.bit_length() - 1
            self.bits.put(*_AC[r << 4])
            if r:
                self.bits.put(n - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.bits.put(b, 1)
        self.pending = []

    def block_first(self, row):
        band = [(k, _pt_ac(int(row[ZIGZAG[k]]), self.al))
                for k in range(self.ss, self.se + 1)]
        if all(v == 0 for _, v in band):
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush()
            return
        self.flush()
        r = 0
        for _, v in band:
            if v == 0:
                r += 1
                continue
            while r > 15:
                self.bits.put(*_AC[0xF0])
                r -= 16
            s = abs(v).bit_length()
            self.bits.put(*_AC[(r << 4) | s])
            _put_val(self.bits, v, s)
            r = 0
        if r:
            self.eobrun += 1

    def block_refine(self, row):
        absv = {k: abs(int(row[ZIGZAG[k]])) >> self.al
                for k in range(self.ss, self.se + 1)}
        eob = -1
        for k in range(self.ss, self.se + 1):
            if absv[k] == 1:
                eob = k
        r = 0
        br = []
        for k in range(self.ss, self.se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                self.flush()
                self.bits.put(*_AC[0xF0])
                r -= 16
                for b in br:
                    self.bits.put(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            self.flush()
            self.bits.put(*_AC[(r << 4) | 1])
            self.bits.put(1 if int(row[ZIGZAG[k]]) > 0 else 0, 1)
            for b in br:
                self.bits.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.pending.extend(br)
            if self.eobrun == 0x7FFF:
                self.flush()


def _headers_grey(h, w, progressive):
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([16] * 64))
    out += _seg(0xC2 if progressive else 0xC0,
                st.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    return out


def _headers_420(h, w, progressive):
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([16] * 64))
    out += _seg(0xC2 if progressive else 0xC0,
                st.pack(">BHHB", 8, h, w, 3)
                + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    return out


def _sos(comp_sels, ss, se, ah, al):
    body = bytes([len(comp_sels)])
    for cid in comp_sels:
        body += bytes([cid, 0x00])
    return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))


def _dc_first_scan(coef_lists, al, unit_order):
    """Interleaved (or single-comp) progressive DC first scan."""
    bits = _HandBits()
    preds = dict.fromkeys({ci for ci, _ in unit_order}, 0)
    for ci, bi in unit_order:
        v = int(coef_lists[ci][bi][0]) >> al      # arithmetic shift
        diff = v - preds[ci]
        preds[ci] = v
        s = abs(diff).bit_length()
        bits.put(*_DC[s])
        if s:
            _put_val(bits, diff, s)
    return bits.bytes_()


def _dc_refine_scan(coef_lists, al, unit_order):
    bits = _HandBits()
    for ci, bi in unit_order:
        bits.put((int(coef_lists[ci][bi][0]) >> al) & 1, 1)
    return bits.bytes_()


def _ac_scan(coefs, ss, se, al, refine, blocks):
    bits = _HandBits()
    em = _ProgAC(bits, ss, se, al)
    for bi in blocks:
        (em.block_refine if refine else em.block_first)(coefs[bi])
    em.flush()
    return bits.bytes_()


def _sparse_coefs(rng, nblocks, max_abs=31, density=0.12,
                  dc_range=24):
    """Natural-order random sparse coefficient blocks; plants long runs
    (ZRL) and all-zero bands (EOB runs) by construction."""
    c = np.zeros((nblocks, 64), np.int64)
    c[:, 0] = rng.integers(-dc_range, dc_range + 1, nblocks)
    mask = rng.random((nblocks, 63)) < density
    vals = rng.integers(-max_abs, max_abs + 1, (nblocks, 63))
    zz = np.asarray(ZIGZAG)
    for b in range(nblocks):
        for j in range(63):
            if mask[b, j] and vals[b, j]:
                c[b, zz[j + 1]] = vals[b, j]
    # every few blocks entirely DC-only -> multi-block EOB runs
    c[::3, 1:] = 0
    return c


def _seq_grey_stream(h, w, coefs):
    jpg = bytearray(_headers_grey(h, w, progressive=False))
    jpg += _sos([1], 0, 63, 0, 0)
    bits = _HandBits()
    pred = 0
    for b in range(len(coefs)):
        pred = _emit_seq_block(bits, coefs[b], pred)
    jpg += bits.bytes_() + b"\xff\xd9"
    return bytes(jpg)


class TestJpegProgressive:

    def test_spectral_selection_only_grey(self):
        """20x13 greyscale, 3 scans (DC, AC 1-20, AC 21-63, Al=0
        throughout) == baseline decode of the same coefficients."""
        rng = np.random.default_rng(7)
        ux, uy = (13 + 7) // 8, (20 + 7) // 8
        coefs = _sparse_coefs(rng, ux * uy)
        order = [(0, b) for b in range(ux * uy)]
        jpg = bytearray(_headers_grey(20, 13, progressive=True))
        jpg += _sos([1], 0, 0, 0, 0) + _dc_first_scan([coefs], 0, order)
        jpg += _sos([1], 1, 20, 0, 0) + _ac_scan(
            coefs, 1, 20, 0, False, range(ux * uy))
        jpg += _sos([1], 21, 63, 0, 0) + _ac_scan(
            coefs, 21, 63, 0, False, range(ux * uy))
        jpg += b"\xff\xd9"
        want = decode_jpeg_gray(_seq_grey_stream(20, 13, coefs))
        assert np.array_equal(decode_jpeg_gray(bytes(jpg)), want)

    def test_successive_approximation_grey(self):
        """Full successive-approximation script (DC Al=1 + refine; AC
        Al=2 then two refinement passes) == baseline decode."""
        rng = np.random.default_rng(11)
        ux, uy = (17 + 7) // 8, (24 + 7) // 8
        coefs = _sparse_coefs(rng, ux * uy)
        # plant a ZRL case: long zero run then a history coefficient
        coefs[1, 1:] = 0
        coefs[1, ZIGZAG[40]] = 21             # needs ZRL at Al=2 and
        coefs[1, ZIGZAG[63]] = -9             # refinement correction
        order = [(0, b) for b in range(ux * uy)]
        jpg = bytearray(_headers_grey(24, 17, progressive=True))
        jpg += _sos([1], 0, 0, 0, 1) + _dc_first_scan([coefs], 1, order)
        jpg += _sos([1], 1, 63, 0, 2) + _ac_scan(
            coefs, 1, 63, 2, False, range(ux * uy))
        jpg += _sos([1], 1, 63, 2, 1) + _ac_scan(
            coefs, 1, 63, 1, True, range(ux * uy))
        jpg += _sos([1], 0, 0, 1, 0) + _dc_refine_scan([coefs], 0, order)
        jpg += _sos([1], 1, 63, 1, 0) + _ac_scan(
            coefs, 1, 63, 0, True, range(ux * uy))
        jpg += b"\xff\xd9"
        want = decode_jpeg_gray(_seq_grey_stream(24, 17, coefs))
        assert np.array_equal(decode_jpeg_gray(bytes(jpg)), want)

    def test_progressive_colour_420_with_padding(self):
        """24x20 4:2:0 colour: the interleaved DC scan covers the MCU
        padding blocks, the per-component AC scans cover only the used
        grids (T.81 A.2.2) — padded blocks keep zero AC. Compared to an
        interleaved baseline stream of the same coefficients (padding
        AC zeroed so both agree)."""
        rng = np.random.default_rng(13)
        h, w = 24, 20
        mcux, mcuy = (w + 15) // 16, (h + 15) // 16
        y_nbx, y_nby = mcux * 2, mcuy * 2
        c_nbx, c_nby = mcux, mcuy
        ycoef = _sparse_coefs(rng, y_nbx * y_nby)
        cbcoef = _sparse_coefs(rng, c_nbx * c_nby)
        crcoef = _sparse_coefs(rng, c_nbx * c_nby)
        # zero AC in Y padding blocks (used grid: ceil(20/8)=3 of 4
        # columns, all 3 rows of 4? used rows ceil(24/8)=3 of 4)
        y_ux, y_uy = (w + 7) // 8, (h + 7) // 8
        for r in range(y_nby):
            for x in range(y_nbx):
                if r >= y_uy or x >= y_ux:
                    ycoef[r * y_nbx + x, 1:] = 0
        coef_lists = [ycoef, cbcoef, crcoef]

        def mcu_order():
            out = []
            for mcu in range(mcux * mcuy):
                my, mx = divmod(mcu, mcux)
                for by in range(2):
                    for bx in range(2):
                        out.append((0, (my * 2 + by) * y_nbx
                                    + mx * 2 + bx))
                out.append((1, my * c_nbx + mx))
                out.append((2, my * c_nbx + mx))
            return out

        order = mcu_order()
        y_used = [r * y_nbx + x for r in range(y_uy) for x in range(y_ux)]
        jpg = bytearray(_headers_420(h, w, progressive=True))
        jpg += _sos([1, 2, 3], 0, 0, 0, 1) + _dc_first_scan(
            coef_lists, 1, order)
        jpg += _sos([1], 1, 63, 0, 1) + _ac_scan(
            ycoef, 1, 63, 1, False, y_used)
        jpg += _sos([2], 1, 63, 0, 1) + _ac_scan(
            cbcoef, 1, 63, 1, False, range(c_nbx * c_nby))
        jpg += _sos([3], 1, 63, 0, 1) + _ac_scan(
            crcoef, 1, 63, 1, False, range(c_nbx * c_nby))
        jpg += _sos([1, 2, 3], 0, 0, 1, 0) + _dc_refine_scan(
            coef_lists, 0, order)
        jpg += _sos([1], 1, 63, 1, 0) + _ac_scan(
            ycoef, 1, 63, 0, True, y_used)
        jpg += _sos([2], 1, 63, 1, 0) + _ac_scan(
            cbcoef, 1, 63, 0, True, range(c_nbx * c_nby))
        jpg += _sos([3], 1, 63, 1, 0) + _ac_scan(
            crcoef, 1, 63, 0, True, range(c_nbx * c_nby))
        jpg += b"\xff\xd9"

        base = bytearray(_headers_420(h, w, progressive=False))
        base += _sos([1, 2, 3], 0, 63, 0, 0)
        bits = _HandBits()
        preds = [0, 0, 0]
        for ci, bi in order:
            preds[ci] = _emit_seq_block(bits, coef_lists[ci][bi],
                                        preds[ci])
        base += bits.bytes_() + b"\xff\xd9"
        want = decode_jpeg(bytes(base))
        got = decode_jpeg(bytes(jpg))
        assert got.shape == want.shape == (h, w, 3)
        assert np.array_equal(got, want)

    def test_sequential_non_interleaved_multiscan(self):
        """SOF0 with three single-component scans (non-interleaved
        sequential, T.81 A.2.2) == interleaved baseline of the same
        coefficients (all padding blocks zeroed: non-interleaved scans
        never code them)."""
        rng = np.random.default_rng(17)
        h, w = 24, 20
        mcux, mcuy = (w + 15) // 16, (h + 15) // 16
        y_nbx, y_nby = mcux * 2, mcuy * 2
        c_nbx, c_nby = mcux, mcuy
        ycoef = _sparse_coefs(rng, y_nbx * y_nby)
        cbcoef = _sparse_coefs(rng, c_nbx * c_nby)
        crcoef = _sparse_coefs(rng, c_nbx * c_nby)
        y_ux, y_uy = (w + 7) // 8, (h + 7) // 8
        for r in range(y_nby):
            for x in range(y_nbx):
                if r >= y_uy or x >= y_ux:
                    ycoef[r * y_nbx + x, :] = 0
        coef_lists = [ycoef, cbcoef, crcoef]

        jpg = bytearray(_headers_420(h, w, progressive=False))
        for cid, coefs, blocks in (
                (1, ycoef, [r * y_nbx + x for r in range(y_uy)
                            for x in range(y_ux)]),
                (2, cbcoef, range(c_nbx * c_nby)),
                (3, crcoef, range(c_nbx * c_nby))):
            jpg += _sos([cid], 0, 63, 0, 0)
            bits = _HandBits()
            pred = 0
            for bi in blocks:
                pred = _emit_seq_block(bits, coefs[bi], pred)
            jpg += bits.bytes_()
        jpg += b"\xff\xd9"

        base = bytearray(_headers_420(h, w, progressive=False))
        base += _sos([1, 2, 3], 0, 63, 0, 0)
        bits = _HandBits()
        preds = [0, 0, 0]
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for by in range(2):
                for bx in range(2):
                    bi = (my * 2 + by) * y_nbx + mx * 2 + bx
                    preds[0] = _emit_seq_block(bits, ycoef[bi], preds[0])
            preds[1] = _emit_seq_block(bits, cbcoef[my * c_nbx + mx],
                                       preds[1])
            preds[2] = _emit_seq_block(bits, crcoef[my * c_nbx + mx],
                                       preds[2])
        base += bits.bytes_() + b"\xff\xd9"
        assert np.array_equal(decode_jpeg(bytes(jpg)),
                              decode_jpeg(bytes(base)))

    def test_progressive_restart_intervals(self):
        """DRI=2 in both the DC and AC scans of a 4-block greyscale
        image: the DC predictor and the EOB run must reset at RSTn."""
        rng = np.random.default_rng(23)
        coefs = _sparse_coefs(rng, 4)
        coefs[2, 1:] = 0                      # EOB run candidates on
        coefs[3, 1:] = 0                      # both sides of the RST
        jpg = bytearray(_headers_grey(16, 16, progressive=True))
        jpg += _seg(0xDD, st.pack(">H", 2))   # DRI = 2 MCUs
        jpg += _sos([1], 0, 0, 0, 0)
        jpg += _dc_first_scan([coefs[:2]], 0, [(0, 0), (0, 1)])
        jpg += b"\xff\xd0"
        jpg += _dc_first_scan([coefs[2:]], 0, [(0, 0), (0, 1)])
        jpg += _sos([1], 1, 63, 0, 0)
        jpg += _ac_scan(coefs, 1, 63, 0, False, [0, 1])
        jpg += b"\xff\xd1"
        jpg += _ac_scan(coefs, 1, 63, 0, False, [2, 3])
        jpg += b"\xff\xd9"
        want = decode_jpeg_gray(_seq_grey_stream(16, 16, coefs))
        assert np.array_equal(decode_jpeg_gray(bytes(jpg)), want)

    def test_truncated_progressive_scan_raises(self):
        """With DRI set, a scan holding 1 of the 2 required restart
        intervals is deterministically 'scan ended early' (the unit
        accounting at restart boundaries catches the truncation)."""
        rng = np.random.default_rng(29)
        coefs = _sparse_coefs(rng, 4)
        jpg = bytearray(_headers_grey(16, 16, progressive=True))
        jpg += _seg(0xDD, st.pack(">H", 2))
        jpg += _sos([1], 0, 0, 0, 0)
        jpg += _dc_first_scan([coefs[:2]], 0, [(0, 0), (0, 1)])
        jpg += b"\xff\xd9"                    # 2 of 4 blocks coded
        with pytest.raises(ValueError):
            decode_jpeg_gray(bytes(jpg))

    def test_media_features_accepts_progressive(self, ray_session):
        """The real-decoder feature stage dispatches progressive JPEG
        payloads (magic bytes are the same FFD8)."""
        import pyarrow as pa

        from hierarchical_bloom_filter_index_ray.pipelines.multimodal import \
            MediaFeatureExtractor
        rng = np.random.default_rng(31)
        coefs = _sparse_coefs(rng, 4)
        order = [(0, b) for b in range(4)]
        jpg = bytearray(_headers_grey(16, 16, progressive=True))
        jpg += _sos([1], 0, 0, 0, 0) + _dc_first_scan([coefs], 0, order)
        jpg += _sos([1], 1, 63, 0, 0) + _ac_scan(coefs, 1, 63, 0, False,
                                                 range(4))
        jpg += b"\xff\xd9"
        stage = MediaFeatureExtractor(decoder="real", feature_dim=8)
        batch = pa.table({"media_id": pa.array([0], pa.int64()),
                          "media_type": pa.array(["image"], pa.string()),
                          "payload": pa.array([bytes(jpg)],
                                              pa.binary())})
        out = stage(batch)
        feats = np.asarray(out["features"].to_pylist()[0])
        assert feats.shape == (8,) and np.isfinite(feats).all()
