"""Pure-numpy MPEG-1 Audio Layer III sample codec (ISO/IEC 11172-3
§2.4) — the full decode chain plus a subset encoder that round-trip
verifies it.

Every *structural* stage of a Layer III decoder is implemented for
real, per spec: bit-reservoir assembly from ``main_data_begin``
back-pointers (§2.4.1.7), scalefactor decode with ``scfsi`` sharing and
all ``slen`` pairs (§2.4.2.7), big-values / count1 / rzero Huffman
regions with linbits escapes and sign bits (§2.4.2.7), the x^(4/3)
non-uniform requantizer with ``global_gain`` / ``scalefac_scale`` /
``preflag`` / ``subblock_gain`` (§2.4.3.4.7), short-block reorder,
MS joint stereo (§2.4.3.4.9.2), the eight alias-reduction butterflies
(§2.4.3.4.10.1, coefficients ci = -0.6 .. -0.0037), the 36/12-point
IMDCT hybrid filterbank with all four window types and overlap-add
(§2.4.3.4.10.2-3), frequency inversion, and the 32-band polyphase
synthesis filterbank in its spec V/U/W-FIFO form (§2.4.3.2.2, figure
A.2).

**The profile seam.** Two pieces of the spec are pure data blobs that
cannot be verified inside this sandbox (no external fixtures, no
reference decoder): the 34 Huffman code tables (Table B.7) and the
512-tap synthesis window (Table B.3). Both live in a pluggable
:class:`Mp3Profile`:

- ``default_profile()`` ships deterministic stand-ins — canonical
  Huffman codes built by an actual Huffman construction over a fixed
  weight model (the real tables' (nx, ny, linbits) *shapes* are kept,
  so escapes, signs and region logic are exercised exactly as the spec
  lays them out), and a polyphase prototype designed from first
  principles: the spectral square root of an exact Nyquist(64)
  windowed-sinc, which makes the spec filterbank structure near-perfect
  reconstruction (~94 dB, measured in tests — the ISO window achieves
  ~96 dB by the same near-PR pseudo-QMF math).
- Anyone holding the ISO tables can load them into an ``Mp3Profile``
  and decode real-world streams through the identical code path; every
  stage in between is profile-independent and pinned by the round-trip
  and property tests.

The subset encoder (:func:`encode_mp3`) produces spec-structured
MPEG-1 Layer III streams — long blocks, mono / stereo / MS-stereo,
optional bit-reservoir packing — that ``functions/mp3.py``'s demuxer
accepts, so the whole chain encode → demux → reservoir → Huffman →
requantize → hybrid → polyphase is verified end-to-end without any
external fixture.

Reference parity: the reference repo (Java bloom-filter index) has no
media layer; this module closes the MP3 half of the engine's declared
audio codec seam (README media matrix) so crawled audio payloads can be
decoded / featurized inside actor-pool ``map_batches`` stages. The
per-symbol Huffman walk is a Python loop by necessity (same documented
swap-for-SIMD boundary as ``jpeg.py`` / ``flac.py``); everything after
it is vectorized numpy.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np

from .mp3 import _parse_header, _side_info_len, parse_frames, \
    parse_id3v2, parse_side_info

# ---------------------------------------------------------------------------
# formula-derived constants (spec math, not blobs)
# ---------------------------------------------------------------------------

# alias-reduction butterfly coefficients (§2.4.3.4.10.1 Table B.9)
_CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
                -0.0142, -0.0037])
_CS = 1.0 / np.sqrt(1.0 + _CI * _CI)
_CA = _CI / np.sqrt(1.0 + _CI * _CI)

# 36-point IMDCT basis: C[i, k] = cos(pi/72 (2i+1+18)(2k+1))
_N36 = np.arange(36)
_K18 = np.arange(18)
_C36 = np.cos(np.pi / 72.0 * (2 * _N36[:, None] + 19)
              * (2 * _K18[None, :] + 1))
# 12-point IMDCT basis for short blocks: cos(pi/24 (2i+1+6)(2k+1))
_N12 = np.arange(12)
_K6 = np.arange(6)
_C12 = np.cos(np.pi / 24.0 * (2 * _N12[:, None] + 7)
              * (2 * _K6[None, :] + 1))

# window types (§2.4.3.4.10.3): 0 normal, 1 start, 2 short, 3 stop
_WIN = np.zeros((4, 36))
_WIN[0] = np.sin(np.pi / 36.0 * (_N36 + 0.5))
_WIN[1, :18] = np.sin(np.pi / 36.0 * (_N36[:18] + 0.5))
_WIN[1, 18:24] = 1.0
_WIN[1, 24:30] = np.sin(np.pi / 12.0 * (_N36[24:30] - 18 + 0.5))
_WIN[3, 6:12] = np.sin(np.pi / 12.0 * (_N36[6:12] - 6 + 0.5))
_WIN[3, 12:18] = 1.0
_WIN[3, 18:] = np.sin(np.pi / 36.0 * (_N36[18:] + 0.5))
_WIN_SHORT = np.sin(np.pi / 12.0 * (_N12 + 0.5))

# MDCT forward scaling: TDAC identity needs c_f = 4/N (measured exact
# for the sine windows; pinned by tests)
_MDCT_SCALE = 4.0 / 36.0
_MDCT12_SCALE = 4.0 / 12.0

# polyphase matrixing: synthesis N[i,k] = cos((16+i)(2k+1)pi/64)
# (§2.4.3.2.2), analysis M[i,j] = cos((2i+1)(j-16)pi/64) (§C.1.3)
_I64 = np.arange(64)
_K32 = np.arange(32)
_NMAT = np.cos((16 + _I64[:, None]) * (2 * _K32[None, :] + 1)
               * np.pi / 64.0)
_AMAT = np.cos((2 * _K32[:, None] + 1) * (_I64[None, :] - 16)
               * np.pi / 64.0)

# scalefactor bit-length pairs indexed by scalefac_compress (Table B.6)
_SLEN = ((0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
         (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))

# scfsi band groups over long scalefactor bands (§2.4.2.7)
_SCFSI_BANDS = ((0, 6), (6, 11), (11, 16), (16, 21))


def _polyphase_prototype() -> np.ndarray:
    """512-tap near-PR pseudo-QMF prototype, derived at import from
    first principles: an exact Nyquist(64) windowed-sinc (zeros at every
    64th tap by construction) whose linear-phase spectral square root is
    power-complementary across the 32 odd-stacked bands. Kaiser beta 38
    maximizes measured reconstruction SNR (~94 dB) at 512 taps — the
    formula-derived stand-in for the unverifiable ISO Table B.3 window.
    """
    nf = 1 << 16
    n = np.arange(1023)
    g = np.sinc((n - 511) / 64.0) * np.kaiser(1023, 38.0)
    g0 = np.roll(np.concatenate([g, np.zeros(nf - 1023)]), -511)
    spec = np.maximum(np.fft.rfft(g0).real, 0.0)
    h0 = np.fft.irfft(np.sqrt(spec), nf)
    h = np.concatenate([h0[-256:], h0[:256]])
    return h * (32.0 / h.sum())


_PROTO = _polyphase_prototype()
# fold signs for the spec V/U/W structure: D[n] = (-1)^floor(n/64) h[n]
# (derived from the fold identity cos((2k+1)(n+64q+16)pi/64) =
# (-1)^q cos((2k+1)(n+16)pi/64)); the 1/8 calibrates analysis->synthesis
# to unity gain (pinned by tests)
_FOLD_SIGN = (-1.0) ** (np.arange(512) // 64)
_DWIN = _FOLD_SIGN * _PROTO / 8.0          # synthesis window (Table B.3 slot)
_CWIN = _FOLD_SIGN * _PROTO                # analysis window (Table C.1 slot)

# short-block reorder permutation is built per sample rate (profile data
# dependent) — cached in the profile


# ---------------------------------------------------------------------------
# profile: the spec's data blobs, pluggable
# ---------------------------------------------------------------------------

# big-values table shapes from Table B.7: number -> (nx, ny, linbits);
# tables 4 and 14 do not exist in the spec
_BV_SHAPES = {
    0: (0, 0, 0),
    1: (2, 2, 0), 2: (3, 3, 0), 3: (3, 3, 0),
    5: (4, 4, 0), 6: (4, 4, 0),
    7: (6, 6, 0), 8: (6, 6, 0), 9: (6, 6, 0),
    10: (8, 8, 0), 11: (8, 8, 0), 12: (8, 8, 0),
    13: (16, 16, 0), 15: (16, 16, 0),
    16: (16, 16, 1), 17: (16, 16, 2), 18: (16, 16, 3), 19: (16, 16, 4),
    20: (16, 16, 6), 21: (16, 16, 8), 22: (16, 16, 10), 23: (16, 16, 13),
    24: (16, 16, 4), 25: (16, 16, 5), 26: (16, 16, 6), 27: (16, 16, 7),
    28: (16, 16, 8), 29: (16, 16, 9), 30: (16, 16, 11), 31: (16, 16, 13),
}


def _huffman_lengths(weights: list[int]) -> list[int]:
    """Code lengths from an actual Huffman construction (deterministic:
    ties broken by insertion order)."""
    if len(weights) == 1:
        return [1]
    heap = [(w, i, [i]) for i, w in enumerate(weights)]
    heapq.heapify(heap)
    depth = [0] * len(weights)
    tie = len(weights)
    while len(heap) > 1:
        w1, _, s1 = heapq.heappop(heap)
        w2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (w1 + w2, tie, s1 + s2))
        tie += 1
    return depth


def _canonical_codes(lengths: list[int]) -> list[tuple[int, int]]:
    """Canonical (nbits, code) per symbol from code lengths."""
    order = sorted(range(len(lengths)), key=lambda s: (lengths[s], s))
    codes: list[tuple[int, int]] = [(0, 0)] * len(lengths)
    code = 0
    prev = 0
    for s in order:
        ln = lengths[s]
        code <<= (ln - prev)
        codes[s] = (ln, code)
        code += 1
        prev = ln
    return codes


@dataclass(frozen=True)
class Mp3Profile:
    """The spec's pure-data blobs: Huffman code assignments (Table B.7
    slot), polyphase windows (Tables B.3 / C.1 slots), scalefactor band
    edges (Table B.8) and the preemphasis table (Table B.6). Everything
    else in the codec is formula-derived and profile-independent."""

    name: str
    # table number -> (nx, ny, linbits, {(x, y): (nbits, code)})
    big_tables: dict
    # two count1 tables: {(v, w, x, y): (nbits, code)}
    count1_tables: tuple
    sfb_long: dict          # sample rate -> int array of 23 boundaries
    sfb_short: dict         # sample rate -> int array of 14 boundaries
    pretab: np.ndarray      # 21 long-band preemphasis values
    dwin: np.ndarray        # 512-tap synthesis window (signs folded)
    cwin: np.ndarray        # 512-tap analysis window (signs folded)
    _decode_maps: dict = field(default_factory=dict, compare=False)

    def decode_map(self, table: int, count1: bool = False) -> dict:
        """{(nbits, code): symbol} for a table, built lazily."""
        key = ("c1", table) if count1 else ("bv", table)
        m = self._decode_maps.get(key)
        if m is None:
            codes = self.count1_tables[table] if count1 \
                else self.big_tables[table][3]
            m = {lc: sym for sym, lc in codes.items()}
            if len(m) != len(codes):
                raise ValueError(f"huffman table {key} is not prefix-free")
            self._decode_maps[key] = m
        return m

    def max_code_len(self, table: int, count1: bool = False) -> int:
        codes = self.count1_tables[table] if count1 \
            else self.big_tables[table][3]
        return max(ln for ln, _ in codes.values())


def _build_big_table(nx: int, ny: int, tbl: int) -> dict:
    """Deterministic canonical Huffman codes over the (x, y) pair
    alphabet; the weight model varies with the table number so distinct
    spec tables get distinct codes (as the real ones do)."""
    syms = [(x, y) for x in range(nx) for y in range(ny)]
    alpha = 2 + (tbl % 5)
    weights = [max(1, (1 << 24) // ((x + 1) * (y + 1)) ** alpha
                   // (1 + ((x + y + tbl) & 3)))
               for x, y in syms]
    codes = _canonical_codes(_huffman_lengths(weights))
    return dict(zip(syms, codes))


def _build_count1_tables() -> tuple:
    quads = [(v, w, x, y) for v in range(2) for w in range(2)
             for x in range(2) for y in range(2)]
    weights = [1 << (8 - 2 * (v + w + x + y)) for v, w, x, y in quads]
    table_a = dict(zip(quads, _canonical_codes(_huffman_lengths(weights))))
    # table B is the spec's fixed 4-bit code (complement of the quad)
    table_b = {q: (4, 15 - ((q[0] << 3) | (q[1] << 2) | (q[2] << 1) | q[3]))
               for q in quads}
    return (table_a, table_b)


# MPEG-1 scalefactor band boundaries (Table B.8 slot — profile data,
# only their invariants are asserted here: monotone, end at 576 / 192)
_SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110,
            134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106,
            128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126,
            156, 194, 240, 296, 364, 448, 550, 576],
}
_SFB_SHORT = {
    44100: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    48000: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    32000: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
}
_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2]

_DEFAULT: Mp3Profile | None = None


def default_profile() -> Mp3Profile:
    """The deterministic sandbox profile (see module docstring)."""
    global _DEFAULT
    if _DEFAULT is None:
        big = {}
        for tbl, (nx, ny, lin) in _BV_SHAPES.items():
            big[tbl] = (nx, ny, lin,
                        _build_big_table(nx, ny, tbl) if nx else {})
        sfb_l = {r: np.asarray(v, dtype=np.int64)
                 for r, v in _SFB_LONG.items()}
        sfb_s = {r: np.asarray(v, dtype=np.int64)
                 for r, v in _SFB_SHORT.items()}
        for r in sfb_l:
            assert sfb_l[r][-1] == 576 and (np.diff(sfb_l[r]) > 0).all()
            assert sfb_s[r][-1] == 192 and (np.diff(sfb_s[r]) > 0).all()
        _DEFAULT = Mp3Profile(
            name="hbi-deterministic-v1", big_tables=big,
            count1_tables=_build_count1_tables(),
            sfb_long=sfb_l, sfb_short=sfb_s,
            pretab=np.asarray(_PRETAB, dtype=np.int64),
            dwin=_DWIN, cwin=_CWIN)
    return _DEFAULT


# marker genre written by encode_mp3(tag=True); multimodal feature
# extraction only routes payloads carrying it into sample decode (a
# foreign stream's ISO Huffman codes are not the profile's)
PROFILE_TAG = "hbi-mp3dec-v1"


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------

class _BitReader:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def u1(self) -> int:
        p = self.pos
        if p >= self.n:
            raise ValueError("main data exhausted")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def u(self, k: int) -> int:
        p = self.pos
        if p + k > self.n:
            raise ValueError("main data exhausted")
        self.pos = p + k
        v = 0
        d = self.data
        while k:
            take = min(k, 8 - (p & 7))
            byte = d[p >> 3]
            v = (v << take) | ((byte >> (8 - (p & 7) - take))
                               & ((1 << take) - 1))
            p += take
            k -= take
        return v


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, val: int, k: int) -> None:
        if k and not 0 <= val < (1 << k):
            raise ValueError("value out of field range")
        self.acc = (self.acc << k) | val
        self.nacc += k
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    @property
    def bitpos(self) -> int:
        return len(self.buf) * 8 + self.nacc

    def append(self, other: "_BitWriter") -> None:
        """Append another writer's bits exactly (no byte padding)."""
        for byte in other.buf:
            self.write(byte, 8)
        if other.nacc:
            self.write(other.acc, other.nacc)

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self.nacc:
            out.append((self.acc << (8 - self.nacc)) & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# scalefactors (§2.4.2.7)
# ---------------------------------------------------------------------------

def _read_scalefacs(br: _BitReader, g: dict, scfsi: tuple | None,
                    prev: dict | None) -> dict:
    """One granule-channel's scalefactors. ``scfsi``/``prev`` apply only
    to granule 1 long blocks (share bands whose scfsi bit is set)."""
    slen1, slen2 = _SLEN[g["scalefac_compress"]]
    short = g["window_switching"] and g["block_type"] == 2
    if short:
        if g["mixed_block_flag"]:
            raise NotImplementedError(
                "mixed short/long blocks are outside the decode subset")
        sf = np.zeros((12, 3), dtype=np.int64)
        for band in range(6):
            for w in range(3):
                sf[band, w] = br.u(slen1) if slen1 else 0
        for band in range(6, 12):
            for w in range(3):
                sf[band, w] = br.u(slen2) if slen2 else 0
        return {"short": sf}
    sf = np.zeros(21, dtype=np.int64)
    for band in range(21):
        slen = slen1 if band < 11 else slen2
        grp = next(i for i, (a, b) in enumerate(_SCFSI_BANDS)
                   if a <= band < b)
        if scfsi is not None and scfsi[grp] and prev is not None \
                and "long" in prev:
            sf[band] = prev["long"][band]
        elif slen:
            sf[band] = br.u(slen)
    return {"long": sf}


def _scalefac_bits(g: dict, scfsi: tuple | None) -> int:
    """Exact part2 bit count for the fields _read_scalefacs consumes."""
    slen1, slen2 = _SLEN[g["scalefac_compress"]]
    if g["window_switching"] and g["block_type"] == 2:
        return 6 * 3 * slen1 + 6 * 3 * slen2
    bits = 0
    for band in range(21):
        grp = next(i for i, (a, b) in enumerate(_SCFSI_BANDS)
                   if a <= band < b)
        if scfsi is not None and scfsi[grp]:
            continue
        bits += slen1 if band < 11 else slen2
    return bits


# ---------------------------------------------------------------------------
# Huffman region decode / encode (§2.4.2.7)
# ---------------------------------------------------------------------------

def _region_bounds(g: dict, rate: int, profile: Mp3Profile) -> list[int]:
    """Line indices [0, b0, b1, big_end] of the three big-values
    regions. Switched windows use the implied 36-line region0."""
    big_end = 2 * g["big_values"]
    if g["window_switching"]:
        return [0, min(36, big_end), big_end, big_end]
    sfb = profile.sfb_long[rate]
    b0 = int(sfb[min(g["region0_count"] + 1, 22)])
    b1 = int(sfb[min(g["region0_count"] + g["region1_count"] + 2, 22)])
    return [0, min(b0, big_end), min(b1, big_end), big_end]


def _read_code(br: _BitReader, dec: dict, max_len: int) -> tuple:
    code = 0
    for ln in range(1, max_len + 1):
        code = (code << 1) | br.u1()
        sym = dec.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in main data")


def _read_huffman(br: _BitReader, g: dict, part2_start: int, rate: int,
                  profile: Mp3Profile) -> np.ndarray:
    """Big-values pairs, count1 quads, rzero; leaves the reader exactly
    at part2_3 end (stuffing skipped)."""
    vals = np.zeros(576, dtype=np.int64)
    bounds = _region_bounds(g, rate, profile)
    limit = part2_start + g["part2_3_length"]
    line = 0
    for region in range(3):
        tbl = g["table_select"][region] if region < len(g["table_select"]) \
            else g["table_select"][-1]
        if tbl not in profile.big_tables:
            raise ValueError(f"reserved Huffman table {tbl}")
        nx, ny, linbits, _codes = profile.big_tables[tbl]
        end = bounds[region + 1]
        if line >= end:
            continue
        if nx == 0:
            line = end          # table 0: all zero, zero bits
            continue
        dec = profile.decode_map(tbl)
        mx = profile.max_code_len(tbl)
        while line < end:
            x, y = _read_code(br, dec, mx)
            for v in (x, y):
                if v == 15 and linbits:
                    v += br.u(linbits)
                if v:
                    if br.u1():
                        v = -v
                vals[line] = v
                line += 1
    # count1: 0/±1 quads until the bit budget or the spectrum runs out
    sel = g["count1table_select"]
    dec1 = profile.decode_map(sel, count1=True)
    mx1 = profile.max_code_len(sel, count1=True)
    while br.pos < limit and line <= 572:
        mark = br.pos
        try:
            quad = _read_code(br, dec1, mx1)
            out = []
            for v in quad:
                if v and br.u1():
                    v = -v
                out.append(v)
        except ValueError:
            br.pos = mark
            break
        if br.pos > limit:      # quad straddled the boundary: roll back
            br.pos = mark
            break
        vals[line:line + 4] = out
        line += 4
    if br.pos > limit:
        raise ValueError("part2_3_length overrun")
    br.pos = limit              # skip stuffing bits
    return vals


def _pick_table(max_small: int, max_esc: int,
                profile: Mp3Profile) -> int:
    """Smallest profile table covering a region (encoder side)."""
    if max_small == 0 and max_esc == 0:
        return 0
    for tbl in (1, 2, 5, 7, 10, 13):
        nx, _, _, _ = profile.big_tables[tbl]
        if max_small < nx and max_esc == 0:
            return tbl
    for tbl in (16, 17, 18, 19, 20, 21, 22, 23):
        _, _, lin, _ = profile.big_tables[tbl]
        if max_esc <= (1 << lin) - 1:
            return tbl
    raise ValueError("spectral value too large for any Huffman table")


def _write_pair(bw: _BitWriter, x: int, y: int, tbl: int,
                profile: Mp3Profile) -> None:
    _, _, linbits, codes = profile.big_tables[tbl]
    ax, ay = abs(x), abs(y)
    cx, cy = min(ax, 15), min(ay, 15)
    ln, code = codes[(cx, cy)]
    bw.write(code, ln)
    for v, c in ((x, cx), (y, cy)):
        if c == 15 and linbits:
            bw.write(abs(v) - 15, linbits)
        if v:
            bw.write(1 if v < 0 else 0, 1)


def _write_huffman(bw: _BitWriter, vals: np.ndarray, g: dict, rate: int,
                   profile: Mp3Profile) -> None:
    bounds = _region_bounds(g, rate, profile)
    for region in range(3):
        tbl = g["table_select"][region] if region < len(g["table_select"]) \
            else g["table_select"][-1]
        for line in range(bounds[region], bounds[region + 1], 2):
            if tbl == 0:
                continue
            _write_pair(bw, int(vals[line]), int(vals[line + 1]), tbl,
                        profile)
    table = profile.count1_tables[g["count1table_select"]]
    line = bounds[3]
    while line < 576 and vals[line:].any():
        quad = vals[line:line + 4]
        ln, code = table[tuple(int(abs(v)) for v in quad)]
        bw.write(code, ln)
        for v in quad:
            if v:
                bw.write(1 if v < 0 else 0, 1)
        line += 4


# ---------------------------------------------------------------------------
# requantize + reorder (§2.4.3.4.7-8)
# ---------------------------------------------------------------------------

def _requantize(vals: np.ndarray, g: dict, sf: dict, rate: int,
                profile: Mp3Profile) -> np.ndarray:
    """Non-uniform requantizer; short blocks come back already
    reordered (subband-major, windows interleaved at stride 3)."""
    sign = np.sign(vals).astype(np.float64)
    mag = np.abs(vals).astype(np.float64) ** (4.0 / 3.0)
    a = 1.0 if g["scalefac_scale"] else 0.5
    gg = g["global_gain"]
    if g["window_switching"] and g["block_type"] == 2:
        sfb = profile.sfb_short[rate]
        widths = np.diff(sfb)
        # decoded order: per band, three window-runs of `width` lines
        exp = np.empty(576)
        perm = np.empty(576, dtype=np.int64)
        sbg = g["subblock_gain"]
        for band in range(13):
            w0 = int(sfb[band]) * 3
            width = int(widths[band])
            for w in range(3):
                s = 0 if band >= 12 else int(sf["short"][band, w])
                lo = w0 + w * width
                exp[lo:lo + width] = 0.25 * (gg - 210 - 8 * sbg[w]) - a * s
                perm[w0 + 3 * np.arange(width) + w] = lo + np.arange(width)
        xr = sign * mag * np.exp2(exp)
        return xr[perm]
    sfbl = profile.sfb_long[rate]
    band_of = np.searchsorted(sfbl, np.arange(576), side="right") - 1
    sf_ext = np.concatenate([sf["long"], [0]])
    pre_ext = np.concatenate([profile.pretab, [0]])
    pre = pre_ext[np.minimum(band_of, 21)] if g.get("preflag") else 0
    s = sf_ext[np.minimum(band_of, 21)] + pre
    exp = 0.25 * (gg - 210) - a * s
    return sign * mag * np.exp2(exp)


# ---------------------------------------------------------------------------
# alias reduction (§2.4.3.4.10.1)
# ---------------------------------------------------------------------------

_ALIAS_A = (18 * np.arange(1, 32)[:, None] - 1 - np.arange(8)[None, :])
_ALIAS_B = (18 * np.arange(1, 32)[:, None] + np.arange(8)[None, :])


def _alias_reduce(xr: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Butterflies across the 31 subband boundaries; the inverse is the
    transpose of the rotation (cs^2 + ca^2 = 1)."""
    out = xr.copy()
    a = out[_ALIAS_A]
    b = out[_ALIAS_B]
    if inverse:
        out[_ALIAS_A] = a * _CS + b * _CA
        out[_ALIAS_B] = b * _CS - a * _CA
    else:
        out[_ALIAS_A] = a * _CS - b * _CA
        out[_ALIAS_B] = b * _CS + a * _CA
    return out


# ---------------------------------------------------------------------------
# hybrid filterbank (IMDCT + overlap-add, §2.4.3.4.10.2-3)
# ---------------------------------------------------------------------------

class _HybridSynth:
    """Per-channel IMDCT + overlap-add state (32 subbands x 18)."""

    def __init__(self):
        self.prev = np.zeros((32, 18))

    def run(self, xr: np.ndarray, block_type: int) -> np.ndarray:
        """576 spectral lines -> (18, 32) subband time samples."""
        spec = xr.reshape(32, 18)
        if block_type != 2:
            y = (spec @ _C36.T) * _WIN[block_type]
        else:
            y = np.zeros((32, 36))
            for w in range(3):
                part = spec[:, w::3] @ _C12.T      # (32, 12)
                y[:, 6 + 6 * w:18 + 6 * w] += part * _WIN_SHORT
        out = y[:, :18] + self.prev
        self.prev = y[:, 18:]
        sb = out.T                                  # (18, 32)
        sb = sb.copy()
        sb[1::2, 1::2] *= -1.0                      # frequency inversion
        return sb


class _HybridAnalysis:
    """Per-channel forward MDCT with 18-sample history (encoder)."""

    def __init__(self):
        self.prev = np.zeros((32, 18))

    def run(self, sb: np.ndarray) -> np.ndarray:
        """(18, 32) subband samples -> 576 spectral lines (long)."""
        sb = sb.copy()
        sb[1::2, 1::2] *= -1.0                      # pre-compensate
        cur = sb.T                                  # (32, 18)
        frame = np.concatenate([self.prev, cur], axis=1)   # (32, 36)
        self.prev = cur
        spec = _MDCT_SCALE * ((frame * _WIN[0]) @ _C36)    # (32, 18)
        return spec.reshape(576)


# ---------------------------------------------------------------------------
# polyphase filterbank (§2.4.3.2.2 synthesis, §C.1.3 analysis)
# ---------------------------------------------------------------------------

_UFOLD = np.empty(512, dtype=np.int64)
for _j in range(8):
    _UFOLD[64 * _j:64 * _j + 32] = np.arange(128 * _j, 128 * _j + 32)
    _UFOLD[64 * _j + 32:64 * _j + 64] = np.arange(128 * _j + 96,
                                                  128 * _j + 128)


class _PolySynth:
    """Spec-structure synthesis: 1024-float V FIFO, U fold, window D,
    16-fold sum (figure A.2)."""

    def __init__(self, dwin: np.ndarray):
        self.v = np.zeros(1024)
        self.dwin = dwin

    def run(self, sb: np.ndarray) -> np.ndarray:
        """(T, 32) subband sample vectors -> (T*32,) PCM floats."""
        t_steps = sb.shape[0]
        out = np.empty(t_steps * 32)
        v = self.v
        matrixed = sb @ _NMAT.T                    # (T, 64)
        for t in range(t_steps):
            v[64:] = v[:-64]
            v[:64] = matrixed[t]
            w = v[_UFOLD] * self.dwin
            out[t * 32:(t + 1) * 32] = w.reshape(16, 32).sum(axis=0)
        self.v = v
        return out


class _PolyAnalysis:
    """Spec-structure analysis: 512-float X FIFO (newest-first), window
    C, 8-fold sum, 32x64 matrixing (§C.1.3)."""

    def __init__(self, cwin: np.ndarray):
        self.x = np.zeros(512)
        self.cwin = cwin

    def run(self, pcm: np.ndarray) -> np.ndarray:
        """(T*32,) PCM -> (T, 32) subband sample vectors."""
        if len(pcm) % 32:
            raise ValueError("PCM length must be a multiple of 32")
        t_steps = len(pcm) // 32
        out = np.empty((t_steps, 32))
        x = self.x
        for t in range(t_steps):
            x[32:] = x[:-32]
            x[:32] = pcm[t * 32:(t + 1) * 32][::-1]
            z = (x * self.cwin).reshape(8, 64).sum(axis=0)
            out[t] = _AMAT @ z
        self.x = x
        return out


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_SQRT2 = np.sqrt(2.0)


def decode_mp3_samples(payload: bytes, profile: Mp3Profile | None = None,
                       max_frames: int | None = None
                       ) -> tuple[np.ndarray, int]:
    """Decode an MPEG-1 Layer III stream to PCM.

    Returns ``(samples, rate)`` — int16 of shape (n, channels). Frames
    whose reservoir back-pointer reaches data we have not seen (a cut
    stream) decode as silence, as real decoders do. Intensity stereo
    and mixed blocks are outside the subset and raise
    NotImplementedError; structural damage raises ValueError.
    """
    if profile is None:
        profile = default_profile()
    offs, lens, info = parse_frames(payload)
    if info["version"] != 1 or info["layer"] != 3:
        raise NotImplementedError(
            "sample decode subset is MPEG-1 Layer III (demux handles "
            "MPEG-2/2.5 and Layers I-II structurally)")
    rate = info["sample_rate"]
    if rate not in profile.sfb_long:
        raise ValueError(f"no scalefactor bands for rate {rate}")
    nch = info["channels"]
    n_frames = len(offs) if max_frames is None \
        else min(len(offs), max_frames)
    hybrid = [_HybridSynth() for _ in range(nch)]
    poly = [_PolySynth(profile.dwin) for _ in range(nch)]
    pcm = np.zeros((n_frames * 1152, nch), dtype=np.float64)
    reservoir = b""
    out_pos = 0
    for fi in range(n_frames):
        frame = payload[int(offs[fi]):int(offs[fi] + lens[fi])]
        h = _parse_header(frame[:4])
        if h is None:
            raise ValueError("frame header vanished mid-decode")
        mode_ext = (frame[3] >> 4) & 0x3
        ms_stereo = h["mode"] == "joint_stereo" and bool(mode_ext & 2)
        if h["mode"] == "joint_stereo" and (mode_ext & 1):
            raise NotImplementedError(
                "intensity stereo is outside the decode subset")
        si = parse_side_info(h, frame)
        skip = 4 + (2 if h["protected"] else 0) + _side_info_len(h)
        region = frame[skip:]
        mdb = si["main_data_begin"]
        if mdb > len(reservoir):
            # cut stream: reservoir points before our first byte
            reservoir = (reservoir + region)[-511:]
            out_pos += 1152
            continue
        data = (reservoir[len(reservoir) - mdb:] if mdb else b"") + region
        br = _BitReader(data)
        sf_prev: list = [None] * nch
        try:
            for gi, gran in enumerate(si["granules"]):
                xr = np.zeros((nch, 576))
                bts = []
                for c in range(nch):
                    g = gran[c]
                    part2_start = br.pos
                    short = g["window_switching"] and g["block_type"] == 2
                    scfsi = si["scfsi"][c] \
                        if gi == 1 and not short else None
                    sf = _read_scalefacs(br, g, scfsi,
                                         sf_prev[c] if gi == 1 else None)
                    if gi == 0:
                        sf_prev[c] = sf
                    vals = _read_huffman(br, g, part2_start, rate,
                                         profile)
                    xr[c] = _requantize(vals, g, sf, rate, profile)
                    bts.append(g["block_type"] if g["window_switching"]
                               else 0)
                if ms_stereo and nch == 2:
                    mid, side = xr[0].copy(), xr[1].copy()
                    xr[0] = (mid + side) / _SQRT2
                    xr[1] = (mid - side) / _SQRT2
                for c in range(nch):
                    spec = xr[c]
                    if bts[c] != 2:
                        spec = _alias_reduce(spec)
                    sb = hybrid[c].run(spec, bts[c])
                    pcm[out_pos:out_pos + 576, c] = poly[c].run(sb)
                out_pos += 576
        except ValueError:
            raise
        reservoir = (reservoir + region)[-511:]
    out = np.clip(np.rint(pcm * 32768.0), -32768, 32767).astype(np.int16)
    return out, rate


# ---------------------------------------------------------------------------
# subset encoder
# ---------------------------------------------------------------------------

_MAX_SPECTRAL = 4000        # |is| cap the quantizer steers under


def _quantize_granule(xr: np.ndarray,
                      gg: int | None = None) -> tuple[np.ndarray, int]:
    """Quantize at a given global_gain, or at the finest gain that
    keeps |is| under the spectral cap (scalefactors all zero)."""
    peak = float(np.abs(xr).max())
    if peak == 0.0:
        return np.zeros(576, dtype=np.int64), 210
    if gg is None:
        lim = _MAX_SPECTRAL ** (4.0 / 3.0)
        gg = int(np.clip(210 + np.ceil(4.0 * np.log2(peak / lim)),
                         0, 255))
    t = xr / np.exp2(0.25 * (gg - 210))
    vals = (np.sign(t) * np.rint(np.abs(t) ** 0.75)).astype(np.int64)
    return vals, gg


def _granule_layout(vals: np.ndarray) -> tuple[int, int]:
    """(big_values, count1_end): last |v|>1 rounds the big region up to
    an even line; count1 covers remaining nonzeros in whole quads."""
    nz = np.flatnonzero(vals)
    if len(nz) == 0:
        return 0, 0
    big = np.flatnonzero(np.abs(vals) > 1)
    big_end = (int(big[-1]) + 2) & ~1 if len(big) else 0
    c1_last = int(nz[-1])
    if c1_last < big_end:
        return big_end // 2, big_end
    c1_end = big_end + ((c1_last - big_end) // 4 + 1) * 4
    if c1_end > 576:
        # the tail quad would overrun the spectrum: absorb the
        # trailing ±1s into the big-values region instead
        big_end = min(576, (c1_last + 2) & ~1)
        c1_end = big_end
    return big_end // 2, c1_end


def _encode_granule(vals: np.ndarray, gg: int, rate: int,
                    profile: Mp3Profile) -> tuple[dict, "_BitWriter"]:
    """Side-info fields + main-data bits for one long-block granule."""
    big_values, _ = _granule_layout(vals)
    g = {
        "part2_3_length": 0, "big_values": big_values,
        "global_gain": gg, "scalefac_compress": 0,
        "window_switching": False, "block_type": 0,
        "mixed_block_flag": False, "region0_count": 7,
        "region1_count": 7, "preflag": False, "scalefac_scale": 0,
        "count1table_select": 0, "table_select": (0, 0, 0),
    }
    bounds = _region_bounds(g, rate, profile)
    tabs = []
    for region in range(3):
        seg = vals[bounds[region]:bounds[region + 1]]
        mx = int(np.abs(seg).max()) if len(seg) else 0
        tabs.append(_pick_table(min(mx, 15) if mx < 15 else 15,
                                max(0, mx - 15), profile))
    g["table_select"] = tuple(tabs)
    bw = _BitWriter()
    _write_huffman(bw, vals, g, rate, profile)
    nbits = bw.bitpos
    g["part2_3_length"] = nbits
    return g, bw


def _rate_loop(spec: np.ndarray, rate: int, profile: Mp3Profile,
               max_bits: int) -> tuple[dict, "_BitWriter"]:
    """The spec's inner iteration loop (§C.1.5.4.4.2): coarsen
    global_gain until the granule fits its bit budget."""
    vals, gg = _quantize_granule(spec)
    while True:
        g, bw = _encode_granule(vals, gg, rate, profile)
        if g["part2_3_length"] <= max_bits:
            return g, bw
        if gg >= 255:
            raise ValueError(
                "granule cannot meet its bit budget even at the "
                "coarsest global_gain — raise the bitrate")
        gg = min(255, gg + 4)
        vals, gg = _quantize_granule(spec, gg)


def _side_info_bytes(granules: list, nch: int, mdb: int) -> bytes:
    """MPEG-1 side-info block (17 or 32 bytes, §2.4.1.7)."""
    bw = _BitWriter()
    bw.write(mdb, 9)
    bw.write(0, 5 if nch == 1 else 3)
    for _c in range(nch):
        bw.write(0, 4)                      # scfsi: never shared
    for gr in range(2):
        for c in range(nch):
            g = granules[gr][c]
            bw.write(g["part2_3_length"], 12)
            bw.write(g["big_values"], 9)
            bw.write(g["global_gain"], 8)
            bw.write(g["scalefac_compress"], 4)
            bw.write(0, 1)                  # window_switching_flag
            for t in g["table_select"]:
                bw.write(t, 5)
            bw.write(g["region0_count"], 4)
            bw.write(g["region1_count"], 3)
            bw.write(1 if g["preflag"] else 0, 1)
            bw.write(g["scalefac_scale"], 1)
            bw.write(g["count1table_select"], 1)
    out = bw.getvalue()
    assert len(out) == (17 if nch == 1 else 32)
    return out


_BR_TABLE = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320)
_SR_INDEX = {44100: 0, 48000: 1, 32000: 2}


def _frame_header(bitrate: int, rate: int, nch: int, ms: bool) -> bytes:
    br_idx = _BR_TABLE.index(bitrate)
    mode = 3 if nch == 1 else (1 if ms else 0)
    b2 = (br_idx << 4) | (_SR_INDEX[rate] << 2)
    b3 = (mode << 6) | ((2 << 4) if ms else 0)
    return bytes([0xFF, 0xFB, b2, b3])


def _id3_marker() -> bytes:
    """Minimal ID3v2.3 tag whose TCON (genre) carries PROFILE_TAG, so
    feature stages can tell profile streams from foreign ones."""
    text = b"\x00" + PROFILE_TAG.encode()
    frame = b"TCON" + len(text).to_bytes(4, "big") + b"\x00\x00" + text
    size = len(frame)
    ss = bytes(((size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F))
    return b"ID3\x03\x00\x00" + ss + frame


def encode_mp3(pcm: np.ndarray, rate: int, *, bitrate: int = 320,
               ms_stereo: bool = False, reservoir: bool = False,
               tag: bool = False,
               profile: Mp3Profile | None = None) -> bytes:
    """Encode int16 PCM to an MPEG-1 Layer III stream (subset: long
    blocks, zero scalefactors, mono / stereo / MS-stereo; optional
    bit-reservoir packing exercises ``main_data_begin`` for real).

    ``pcm``: (n,) or (n, channels) int16. One extra silent frame is
    appended so the decoder's filterbank latency flushes the tail.
    """
    if profile is None:
        profile = default_profile()
    if rate not in _SR_INDEX:
        raise ValueError("MPEG-1 rates are 32000/44100/48000")
    if bitrate not in _BR_TABLE or bitrate == 0:
        raise ValueError(f"bitrate must be one of {_BR_TABLE[1:]}")
    pcm = np.asarray(pcm)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    nch = pcm.shape[1]
    if nch not in (1, 2):
        raise ValueError("mono or stereo only")
    if ms_stereo and nch != 2:
        raise ValueError("MS stereo requires two channels")
    x = pcm.astype(np.float64) / 32768.0
    n_frames = (len(x) + 1151) // 1152 + 1      # +1 flush frame
    pad = n_frames * 1152 - len(x)
    x = np.concatenate([x, np.zeros((pad, nch))])

    frame_len = 144 * bitrate * 1000 // rate
    si_len = 17 if nch == 1 else 32
    cap = frame_len - 4 - si_len
    if cap <= 0:
        raise ValueError("bitrate too low for side info")

    analysis = [_PolyAnalysis(profile.cwin) for _ in range(nch)]
    hybrid = [_HybridAnalysis() for _ in range(nch)]
    frames_g: list[list] = []       # per frame: [granule][channel] fields
    frames_md: list[bytes] = []     # per frame: main-data bytes
    for fi in range(n_frames):
        gran_fields = [[], []]
        bw = _BitWriter()
        specs = np.empty((2, nch, 576))
        for gi in range(2):
            lo = fi * 1152 + gi * 576
            for c in range(nch):
                sb = analysis[c].run(x[lo:lo + 576, c])
                specs[gi, c] = hybrid[c].run(sb)
        if ms_stereo:
            mid = (specs[:, 0] + specs[:, 1]) / _SQRT2
            side = (specs[:, 0] - specs[:, 1]) / _SQRT2
            specs[:, 0], specs[:, 1] = mid, side
        budget = min(4095, cap * 8 // (2 * nch))
        for gi in range(2):
            for c in range(nch):
                spec = _alias_reduce(specs[gi, c], inverse=True)
                g, gbits = _rate_loop(spec, rate, profile, budget)
                gran_fields[gi].append(g)
                bw.append(gbits)
        frames_g.append(gran_fields)
        frames_md.append(bw.getvalue())

    # lay main data into frame capacity (§2.4.1.7 bit reservoir)
    out = bytearray()
    if tag:
        out += _id3_marker()
    header = _frame_header(bitrate, rate, nch, ms_stereo)
    if not reservoir:
        for fi in range(n_frames):
            md = frames_md[fi]
            if len(md) > cap:
                raise ValueError(
                    f"frame {fi} main data ({len(md)} B) exceeds the "
                    f"{cap} B capacity at {bitrate} kbps — raise bitrate")
            out += header + _side_info_bytes(frames_g[fi], nch, 0)
            out += md + bytes(cap - len(md))
        return bytes(out)
    # reservoir packing: main data is a contiguous stream; each frame's
    # data starts main_data_begin bytes before its own region
    stream = bytearray()
    regions: list[bytes] = []
    mdbs: list[int] = []
    written_cap = 0
    for fi in range(n_frames):
        # stuff so the back-pointer stays in its 9-bit range (§2.4.1.7:
        # unreferenced gap bytes between frames' main data are legal)
        if written_cap - len(stream) > 511:
            stream += bytes(written_cap - 511 - len(stream))
        pos = len(stream)
        mdb = written_cap - pos
        if mdb < 0:
            raise ValueError("reservoir underflow — raise bitrate")
        stream += frames_md[fi]
        written_cap += cap
        if len(stream) > written_cap:
            raise ValueError(
                f"frame {fi} overruns cumulative capacity — raise "
                "bitrate")
        mdbs.append(mdb)
    stream += bytes(written_cap - len(stream))
    for fi in range(n_frames):
        regions.append(bytes(stream[fi * cap:(fi + 1) * cap]))
    for fi in range(n_frames):
        out += header + _side_info_bytes(frames_g[fi], nch, mdbs[fi])
        out += regions[fi]
    return bytes(out)


def is_profile_mp3(payload: bytes) -> bool:
    """True when the payload is an MPEG stream carrying the profile
    marker genre — i.e. something our own encoder produced, safe to
    sample-decode with the default profile."""
    try:
        return parse_id3v2(payload).get("genre") == PROFILE_TAG
    except ValueError:
        return False


def mp3_audio_stats(payload: bytes,
                    profile: Mp3Profile | None = None) -> dict:
    """Decoded-domain summary for feature stages: peak/RMS level, DC
    offset, zero-crossing rate, duration."""
    samples, rate = decode_mp3_samples(payload, profile)
    f = samples.astype(np.float64) / 32768.0
    mono = f.mean(axis=1)
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
    return {
        "sample_rate": rate, "channels": samples.shape[1],
        "n_samples": samples.shape[0],
        "duration_sec": round(samples.shape[0] / rate, 6),
        "peak": round(float(np.abs(f).max()), 6),
        "rms": round(float(np.sqrt((f ** 2).mean())), 6),
        "dc_offset": round(float(mono.mean()), 6),
        "zero_cross_rate": round(zc, 6),
    }
