"""Pure-numpy baseline TIFF codec (TIFF 6.0) — the dominant scanned-
document format in archival corpora.

Decode: both byte orders (II/MM), chained IFD entry parsing with
inline/offset values, strip assembly, 8-bit greyscale (BlackIsZero and
WhiteIsZero), RGB/RGBA, palette-color (ColorMap), compressions none
(1), LZW (5, MSB-first with the early-change rule per TIFF 6.0 §13)
and PackBits (32773), horizontal-differencing predictor (tag 317).
Encode: 8-bit grey or RGB with compression none, PackBits or LZW, a
configurable RowsPerStrip, little-endian — exact round-trip.

Like the sibling codecs the LZW entropy layer is a per-code Python
loop; it runs inside actor-pool ``map_batches`` stages, never on the
driver.
"""

from __future__ import annotations

import struct

import numpy as np


def is_tiff(payload: bytes) -> bool:
    return payload[:4] in (b"II*\x00", b"MM\x00*")


def _packbits_decode(data: bytes, out_len: int) -> bytes:
    # PackBits emits at most 128 bytes per 2 input bytes (a repeat run):
    # reject an out_len no input of this size could produce BEFORE the
    # loop grows `out` toward a multi-GB claim from a forged IFD
    if out_len > len(data) * 64 + 128:
        raise ValueError("PackBits strip size impossible for its data")
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < out_len:
        c = data[i]
        i += 1
        if c < 128:                     # literal run of c+1
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:                   # repeat next byte 257-c times
            if i >= n:
                raise ValueError("truncated PackBits repeat")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op
    if len(out) < out_len:
        raise ValueError("PackBits strip shorter than expected")
    return bytes(out[:out_len])


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))
            out.append(row[i])
            i = j
            continue
        # literal run until the next >=3 repeat
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += row[i:j]
        i = j
    return bytes(out)


def _lzw_decode(data: bytes, out_len: int) -> bytes:
    """TIFF LZW (6.0 §13): MSB-first, 9-bit start, Clear=256, EOI=257,
    EARLY CHANGE — the code width grows when the next assigned code
    would be (1<<width)-1, one step before the GIF variant."""
    # Same impossibility pre-check as gif._lzw_decode: one dictionary
    # chain (< 4096 bytes) per coded symbol (>= 9 bits here), so output
    # is bounded by ~3641x the input — reject a forged IFD's multi-GB
    # out_len before the decode loop allocates toward it
    if out_len > len(data) * 8 * 4096 // 9 + 4096:
        raise ValueError("TIFF strip size impossible for its LZW data")
    prefix = np.full(4096, -1, dtype=np.int32)
    tail = np.zeros(4096, dtype=np.uint8)
    first = np.zeros(4096, dtype=np.uint8)
    length = np.ones(4096, dtype=np.int32)
    tail[:256] = np.arange(256)
    first[:256] = np.arange(256)
    out = bytearray()
    width = 9
    next_code = 258
    prev = -1
    acc = 0
    nacc = 0
    di = 0
    nd = len(data)
    while len(out) < out_len:
        while nacc < width:
            if di >= nd:
                raise ValueError("truncated TIFF LZW strip")
            acc = (acc << 8) | data[di]
            nacc += 8
            di += 1
        code = (acc >> (nacc - width)) & ((1 << width) - 1)
        nacc -= width
        if code == 256:                 # Clear
            next_code = 258
            width = 9
            prev = -1
            continue
        if code == 257:                 # EOI
            break
        if code < 256:
            cur = code
        elif 258 <= code < next_code:
            cur = code
        elif code == next_code and prev >= 0:
            cur = -2                    # KwKwK
        else:
            raise ValueError("corrupt TIFF LZW code")
        if prev >= 0 and next_code < 4096:
            prefix[next_code] = prev
            tail[next_code] = first[prev] if cur == -2 else first[cur]
            first[next_code] = first[prev]
            length[next_code] = length[prev] + 1
            next_code += 1
            # early change: widen when the NEXT code to assign would
            # not fit, i.e. at (1<<width)-1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        if cur == -2:
            cur = next_code - 1
        ln = int(length[cur])
        pos = len(out)
        out += b"\x00" * ln
        c = cur
        for k in range(ln - 1, -1, -1):
            out[pos + k] = int(tail[c])
            c = prefix[c]
        prev = cur
    if len(out) < out_len:
        raise ValueError("TIFF LZW strip shorter than expected")
    return bytes(out[:out_len])


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nacc = 0
    width = 9

    def put(code: int):
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8
        acc &= (1 << nacc) - 1

    table: dict[tuple[int, int], int] = {}
    next_code = 258
    put(256)                            # leading Clear per spec
    prev = -1
    for b in data:
        if prev < 0:
            prev = b
            continue
        code = table.get((prev, b))
        if code is not None:
            prev = code
            continue
        put(prev)
        table[(prev, b)] = next_code
        next_code += 1
        # the DECODER (early change) widens one code-read after it
        # registers entry (1<<w)-2, i.e. its reader is at w+1 bits once
        # its next_code hits (1<<w)-1; the encoder's next_code runs one
        # ahead of the decoder's, so the switch lands at 1<<w here
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:           # reset before the table fills
            put(256)
            table.clear()
            next_code = 258
            width = 9
        prev = b
    if prev >= 0:
        put(prev)
    put(257)                            # EOI
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}


def _read_ifd(payload: bytes, bo: str) -> dict[int, list[int]]:
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD offset")
    (count,) = struct.unpack(bo + "H", payload[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for e in range(count):
        off = ifd_off + 2 + 12 * e
        if off + 12 > len(payload):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, cnt = struct.unpack(bo + "HHI", payload[off:off + 8])
        if typ not in _TYPE_SIZE:
            continue
        size = _TYPE_SIZE[typ] * cnt
        if size <= 4:
            raw = payload[off + 8:off + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", payload[off + 8:off + 12])
            raw = payload[voff:voff + size]
            if len(raw) < size:
                raise ValueError("TIFF tag value outside the file")
        if typ in (3, 8):
            vals = list(struct.unpack(bo + "H" * cnt, raw))
        elif typ in (4, 9, 11):
            vals = list(struct.unpack(bo + "I" * cnt, raw))
        elif typ in (1, 6, 7, 2):
            vals = list(raw)
        elif typ in (5, 10):
            vals = list(struct.unpack(bo + "I" * (2 * cnt), raw))
        else:
            vals = list(raw)
        tags[tag] = vals
    return tags


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF -> uint8 array: (h, w) grey, (h, w, 3) RGB or
    (h, w, 4) RGBA (palette streams expand through their ColorMap to
    RGB)."""
    if not is_tiff(payload):
        raise ValueError("not a TIFF (missing II*/MM* signature)")
    bo = "<" if payload[:2] == b"II" else ">"
    tags = _read_ifd(payload, bo)
    def one(tag, default=None):
        vals = tags.get(tag)
        if not vals:                    # absent OR zero-count entry
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return vals[0]

    w = one(256)
    h = one(257)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts:
        raise ValueError("TIFF missing strip offsets/byte counts")
    spp = one(277, 1)
    bits = tags.get(258) or [8] * spp
    comp = one(259, 1)
    photo = one(262, 1)
    rps = one(278, h) or h
    predictor = one(317, 1)
    if any(b != 8 for b in bits):
        raise NotImplementedError(
            f"{bits}-bit TIFF (only 8 bits/sample)")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp}")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"TIFF photometric interpretation {photo}")
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    stride = w * spp
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rps, h - si * rps)
        if nrows <= 0:
            break
        raw = payload[off:off + cnt]
        if len(raw) < cnt:
            raise ValueError("TIFF strip outside the file")
        if comp == 1:
            if len(raw) < nrows * stride:
                raise ValueError("TIFF strip shorter than expected")
            strip = raw[:nrows * stride]
        elif comp == 5:
            strip = _lzw_decode(raw, nrows * stride)
        else:
            strip = _packbits_decode(raw, nrows * stride)
        rows.append(np.frombuffer(strip, np.uint8).reshape(
            nrows, stride))
    img = np.concatenate(rows)
    if img.shape[0] != h:
        raise ValueError("TIFF strips do not cover the image height")
    if predictor == 2:                  # horizontal differencing
        img = img.reshape(h, w, spp).astype(np.uint8)
        img = np.cumsum(img.astype(np.int64), axis=1).astype(
            np.uint8).reshape(h, stride)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if photo == 3:                      # palette
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("palette TIFF missing ColorMap")
        pal = (np.asarray(cmap[:3 * 256], dtype=np.uint32)
               .reshape(3, 256).T >> 8).astype(np.uint8)
        return pal[img.reshape(h, w)]
    if spp == 1:
        out = img.reshape(h, w)
        return (255 - out) if photo == 0 else out
    return img.reshape(h, w, spp)


def encode_tiff(img: np.ndarray, *, compression: str = "none",
                rows_per_strip: int | None = None) -> bytes:
    """Encode (h, w) grey or (h, w, 3) RGB uint8 as little-endian
    baseline TIFF. ``compression``: ``none``, ``packbits`` or
    ``lzw``."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        spp, photo = 1, 1
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        spp, photo = 3, 2
        h, w, _ = a.shape
    else:
        raise ValueError("expected (h, w) or (h, w, 3) uint8")
    comp_tag = {"none": 1, "packbits": 32773, "lzw": 5}.get(compression)
    if comp_tag is None:
        raise ValueError(f"unknown compression {compression!r}")
    rps = rows_per_strip or h
    flat = a.reshape(h, w * spp)
    strips = []
    for s0 in range(0, h, rps):
        chunk = flat[s0:s0 + rps].tobytes()
        if comp_tag == 32773:
            chunk = _packbits_encode(chunk)
        elif comp_tag == 5:
            chunk = _lzw_encode(chunk)
        strips.append(chunk)
    n_strips = len(strips)

    entries = []                        # (tag, type, count, value(s))

    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [8] * spp)
    entry(259, 3, [comp_tag])
    entry(262, 3, [photo])
    entry(273, 4, [0] * n_strips)       # patched below
    entry(277, 3, [spp])
    entry(278, 4, [rps])
    entry(279, 4, [len(s) for s in strips])
    entries.sort()
    # layout: header(8) + IFD + out-of-line values + strip data
    ifd_off = 8
    ifd_len = 2 + 12 * len(entries) + 4
    tail = bytearray()
    tail_base = ifd_off + ifd_len

    def pack_vals(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack("<" + fmt, v) for v in vals)

    # first pass to size out-of-line values
    offsets_entry_pos = None
    body = bytearray()
    body += struct.pack("<H", len(entries))
    for i, (tag, typ, vals) in enumerate(entries):
        raw = pack_vals(typ, vals)
        body += struct.pack("<HHI", tag, typ, len(vals))
        if tag == 273:
            offsets_entry_pos = len(body)
        if len(raw) <= 4:
            body += raw.ljust(4, b"\x00")
        else:
            body += struct.pack("<I", tail_base + len(tail))
            tail += raw
    body += struct.pack("<I", 0)        # no next IFD
    data_base = tail_base + len(tail)
    # patch strip offsets now that data_base is known
    strip_offsets = []
    pos = data_base
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    raw = pack_vals(4, strip_offsets)
    if len(raw) <= 4:
        body[offsets_entry_pos:offsets_entry_pos + 4] = \
            raw.ljust(4, b"\x00")
    else:
        # the offsets array lives in the tail: find its slot — it was
        # written with a placeholder of identical length, so rewrite
        # the entry to point at the tail position where zeros went
        (voff,) = struct.unpack(
            "<I", body[offsets_entry_pos:offsets_entry_pos + 4])
        tail[voff - tail_base:voff - tail_base + len(raw)] = raw
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd_off)
    out += body
    out += tail
    for s in strips:
        out += s
    return bytes(out)
