"""Pure-numpy baseline-sequential GREYSCALE JPEG codec (round-3 VERDICT
stretch #9: close the last codec seam for single-component images).

Scope (deliberately restricted — the correctness baseline a production
build swaps for a SIMD library behind the same two functions):

- decode: baseline DCT (SOF0), 8-bit precision, ONE component, no
  subsampling, optional restart intervals (DRI/RSTn). Progressive
  (SOF2), arithmetic coding, 12-bit and multi-component scans raise
  ``NotImplementedError`` with the format named.
- encode: baseline greyscale with the Annex K luminance quantization
  table (libjpeg-style quality scaling) and the Annex K standard
  luminance Huffman tables.

Spec: ITU-T T.81 / ISO 10918-1. The entropy decoder follows the spec's
canonical-code algorithm (F.2.2) accelerated by a 16-bit prefix lookup
table; the bitstream itself is inherently serial, so per-symbol decode
is a Python loop — acceptable here because media decode runs inside an
actor-pool ``map_batches`` stage (one image per task-row, parallel
across the dataset), not on the driver.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan -> position in the 8x8 block
# (T.81 Figure 5), stored as the flat natural-order index.
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K Table K.1 luminance quantization (natural order via ZIGZAG no:
# the table below is already in zigzag order as printed in the spec's
# example; we store it in NATURAL order for direct use)
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

# Annex K standard luminance Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix A: coefs = A @ block @ A.T,
    block = A.T @ coefs @ A (the IDCT)."""
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    a = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    a[0, :] = np.sqrt(1.0 / 8.0)
    return a


_A = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]
                     ) -> list[tuple[int, int, int]]:
    """(code, length, value) triples per T.81 Annex C code assignment."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((code, length, vals[k]))
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], vals: list[int]
                ) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-prefix lookup: for any next-16-bits window, the symbol
    value and its code length (0 length = invalid prefix)."""
    val_lut = np.zeros(1 << 16, dtype=np.int16)
    len_lut = np.zeros(1 << 16, dtype=np.int8)
    for code, length, value in _canonical_codes(bits, vals):
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        val_lut[lo:hi] = value
        len_lut[lo:hi] = length
    return val_lut, len_lut


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map the t-bit magnitude v to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitReader:
    """MSB-first reader over ALREADY UNSTUFFED entropy-coded bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # bit position
        self.nbits = len(data) * 8

    def peek16(self) -> int:
        byte, off = divmod(self.pos, 8)
        # read 4 bytes (padded) and slice the 16-bit window
        chunk = self.data[byte:byte + 4] + b"\x00\x00\x00\x00"
        word = int.from_bytes(chunk[:4], "big")
        return (word >> (16 - off)) & 0xFFFF

    def skip(self, n: int):
        self.pos += n

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        byte, off = divmod(self.pos, 8)
        chunk = self.data[byte:byte + 5] + b"\x00\x00\x00\x00\x00"
        word = int.from_bytes(chunk[:5], "big")
        self.pos += n
        return (word >> (40 - off - n)) & ((1 << n) - 1)


def _unstuff(scan: bytes) -> list[bytes]:
    """Split the entropy-coded segment at restart markers and remove
    0xFF00 byte stuffing from each interval."""
    parts: list[bytes] = []
    cur = bytearray()
    i = 0
    n = len(scan)
    while i < n:
        b = scan[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = scan[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:      # RSTn: new interval
            parts.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                           # next marker: end of scan
            break
    parts.append(bytes(cur))
    return parts


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode a baseline-sequential single-component JPEG -> (h, w)
    uint8. Raises ``NotImplementedError`` for progressive / arithmetic /
    multi-component streams and ``ValueError`` for malformed data."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    width = height = 0
    qsel = dcsel = acsel = 0
    restart = 0
    i = 2
    n = len(payload)
    scan_data = None
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("marker expected")
        m = payload[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:                          # EOI
            break
        seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
        seg = payload[i + 4:i + 2 + seg_len]
        if m == 0xDB:                          # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                z = np.frombuffer(seg[j + 1:j + 65], dtype=np.uint8)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = z                # zigzag -> natural
                qt[tq] = tbl
                j += 65
        elif m == 0xC4:                        # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1:j + 17])
                cnt = sum(bits)
                vals = list(seg[j + 17:j + 17 + cnt])
                huff[(tc, th)] = _decode_lut(bits, vals)
                j += 17 + cnt
        elif m == 0xC0:                        # SOF0: baseline
            prec, height, width, ncomp = struct.unpack(
                ">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("12-bit precision")
            if ncomp != 1:
                raise NotImplementedError(
                    "multi-component JPEG (colour) — greyscale baseline "
                    "only")
            hv, qsel = seg[7], seg[8]
            if hv != 0x11:
                raise NotImplementedError("subsampling")
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{m:02X})")
        elif m == 0xDD:                        # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:                        # SOS
            ns = seg[0]
            if ns != 1:
                raise NotImplementedError("multi-component scan")
            dcsel, acsel = seg[2] >> 4, seg[2] & 0xF
            scan_data = payload[i + 2 + seg_len:]
            break
        i += 2 + seg_len
    if scan_data is None or not width or not height:
        raise ValueError("no scan data / frame header")
    q = qt[qsel]
    dc_val, dc_len = huff[(0, dcsel)]
    ac_val, ac_len = huff[(1, acsel)]
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    total_blocks = bw * bh
    coef = np.zeros((total_blocks, 64), dtype=np.int64)
    intervals = _unstuff(scan_data)
    blk = 0
    per_int = restart if restart else total_blocks
    for part in intervals:
        if blk >= total_blocks:
            break
        br = _BitReader(part)
        pred = 0
        for _ in range(min(per_int, total_blocks - blk)):
            w16 = br.peek16()
            t = int(dc_val[w16])
            ln = int(dc_len[w16])
            if ln == 0:
                raise ValueError("bad DC Huffman code")
            br.skip(ln)
            diff = _extend(br.read(t), t)
            pred += diff
            coef[blk, 0] = pred
            k = 1
            while k < 64:
                w16 = br.peek16()
                rs = int(ac_val[w16])
                ln = int(ac_len[w16])
                if ln == 0:
                    raise ValueError("bad AC Huffman code")
                br.skip(ln)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:                # ZRL: 16 zeros
                        k += 16
                        continue
                    break                       # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run past block end")
                coef[blk, ZIGZAG[k]] = _extend(br.read(s), s)
                k += 1
            blk += 1
    if blk != total_blocks:
        raise ValueError("scan ended early")
    # dequantize + IDCT, all blocks at once (vectorized einsum)
    blocks = (coef * q).reshape(total_blocks, 8, 8).astype(np.float64)
    pix = np.einsum("ki,nkl,lj->nij", _A, blocks, _A) + 128.0
    out = np.empty((bh * 8, bw * 8), dtype=np.uint8)
    np.clip(pix.round(), 0, 255, out=pix)
    tiles = pix.astype(np.uint8).reshape(bh, bw, 8, 8)
    out = tiles.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    return out[:height, :width]


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            b = (self.acc >> (self.nacc - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)           # byte stuffing
            self.nacc -= 8
        self.acc &= (1 << self.nacc) - 1

    def flush(self):
        if self.nacc:
            pad = 8 - self.nacc
            self.put((1 << pad) - 1, pad)       # 1-fill per spec


def _quality_table(quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of the Annex K luminance table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    t = (_QUANT_LUMA * scale + 50) // 100
    return np.clip(t, 1, 255)


def encode_jpeg_gray(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (h, w) uint8 image as baseline greyscale JPEG."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("expected (h, w) uint8")
    h, w = img.shape
    q = _quality_table(quality)
    dc_codes = {v: (c, ln) for c, ln, v in
                _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)}
    ac_codes = {v: (c, ln) for c, ln, v in
                _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)}
    bw_, bh_ = (w + 7) // 8, (h + 7) // 8
    padded = np.empty((bh_ * 8, bw_ * 8), dtype=np.float64)
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1:h, :]            # edge replicate
    padded[:, w:] = padded[:, w - 1:w]
    tiles = (padded - 128.0).reshape(bh_, 8, bw_, 8).transpose(
        0, 2, 1, 3).reshape(-1, 8, 8)
    coefs = np.einsum("ik,nkl,jl->nij", _A, tiles, _A)
    qz = np.round(coefs / q.reshape(8, 8)).astype(np.int64).reshape(-1, 64)
    zz = qz[:, ZIGZAG]                          # natural -> zigzag scan
    bwr = _BitWriter()
    pred = 0
    for row in zz:
        diff = int(row[0]) - pred
        pred = int(row[0])
        mag = abs(diff)
        t = int(mag).bit_length()
        c, ln = dc_codes[t]
        bwr.put(c, ln)
        if t:
            v = diff if diff >= 0 else diff + (1 << t) - 1
            bwr.put(v, t)
        run = 0
        nz = np.nonzero(row[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]          # ZRL
                bwr.put(c, ln)
                run -= 16
            s = abs(v).bit_length()
            c, ln = ac_codes[(run << 4) | s]
            bwr.put(c, ln)
            vv = v if v >= 0 else v + (1 << s) - 1
            bwr.put(vv, s)
            run = 0
        if last < 63:
            c, ln = ac_codes[0x00]              # EOB
            bwr.put(c, ln)
    bwr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2) + body

    zz_q = np.empty(64, dtype=np.uint8)
    zz_q[:] = q[ZIGZAG]
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + zz_q.tobytes())
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1)
               + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_LUMA_BITS)
               + bytes(_DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_LUMA_BITS)
               + bytes(_AC_LUMA_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bwr.buf
    out += b"\xff\xd9"
    return bytes(out)
