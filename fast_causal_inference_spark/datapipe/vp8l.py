"""WebP-lossless (VP8L) codec — pure Python, both directions.

Round-9 collapse of the WebP scope cut: unlike the lossy VP8 tier,
VP8L is fully deterministic (canonical prefix codes + integer spatial
transforms, no DSP), so an own encoder gives the in-container
round-trip validation path the FLAC/GIF/ADPCM playbook requires.

Decoder coverage (the format per Google's public "WebP Lossless
Bitstream Specification"):

* LSB-first bit reading; 14-bit dimensions header.
* Prefix codes: simple (1-2 symbol) AND full code-length-code form
  (DEFLATE-style symbols 16/17/18 repeats, ``kCodeLengthCodeOrder``,
  optional max_symbol), canonical code assignment, 5 trees per group
  (green+length+cache, red, blue, alpha, distance).
* Meta prefix groups via a recursively-decoded entropy image.
* Color cache (hash 0x1e35a7bd, 1-11 bits).
* LZ77 backward references with the 120-entry 2D distance map.
* All four transforms, inverted in reverse read order: PREDICTOR
  (14 modes, memory-contiguous TR rule on the right edge), COLOR
  (signed-delta cross-channel), SUBTRACT_GREEN, COLOR_INDEXING
  (delta-coded palette + sub-byte pixel bundling).

Encoder (validation subset): literal + distance-1 run-length LZ77,
single or per-tree simple codes, full CL-coded trees, optional
SUBTRACT_GREEN / PREDICTOR / COLOR / COLOR_INDEXING transforms —
enough to exercise every decoder inverse path by exact round trip.

Scale note: entropy decode is inherently serial per image, so this
runs per-row inside Arrow-batched ``mapInPandas`` (embarrassingly
parallel across a corpus).  The pure-Python constant factor is the
documented production seam — inject libwebp via the ``decode_fn``
hook in ``multimodal.image_stats`` and friends at cluster scale.
"""
from __future__ import annotations

import struct

import numpy as np

# order in which code-length-code lengths are stored
KCL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15]

# distance_code 1..120 -> (dx, dy) neighborhood offsets (spec table)
KDIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
assert len(KDIST_MAP) == 120


class _LsbReader:
    """LSB-first bit reader (DEFLATE convention: value fields read
    low-bit-first; prefix codes read bit-by-bit MSB-of-code-first).

    The stream is held as ONE little-endian integer so every read is a
    C shift+mask instead of a per-bit Python loop (bit k of the stream
    is bit k of the integer)."""

    def __init__(self, data: bytes):
        self.data = data
        self._ival = int.from_bytes(data, "little")
        self._nbits = 8 * len(data)
        self._at = 0          # absolute bit position

    def read_bit(self) -> int:
        at = self._at
        if at >= self._nbits:
            raise ValueError("VP8L: bitstream exhausted")
        self._at = at + 1
        return (self._ival >> at) & 1

    def read_bits(self, n: int) -> int:
        at = self._at
        if at + n > self._nbits:
            raise ValueError("VP8L: bitstream exhausted")
        self._at = at + n
        return (self._ival >> at) & ((1 << n) - 1)


# reversed low-16-bit lookup: code reversed within `length` bits is
# _REV16[code] >> (16 - length) (VP8L prefix codes are at most 15 bits)
_REV16 = [0] * 65536
for _i in range(65536):
    _v = _i
    _r = 0
    for _ in range(16):
        _r = (_r << 1) | (_v & 1)
        _v >>= 1
    _REV16[_i] = _r
del _i, _v, _r


class _LsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0          # pending bits, LSB-first (bit i = i-th)
        self.bit = 0          # number of pending bits

    def write_bits(self, value: int, n: int):
        if n <= 0:
            return
        self.cur |= (value & ((1 << n) - 1)) << self.bit
        self.bit += n
        while self.bit >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.bit -= 8

    def write_code(self, code: int, length: int):
        """Prefix-code bits go MSB of the code first."""
        if length:
            self.write_bits(_REV16[code] >> (16 - length), length)

    def getvalue(self) -> bytes:
        tail = bytes([self.cur]) if self.bit else b""
        return bytes(self.out) + tail


# ------------------------------------------------------- prefix codes

class _PrefixCode:
    """Canonical prefix decoder: dict (len, code) -> symbol; a
    zero-length single-symbol code consumes no bits."""

    def __init__(self, lengths, _pairs=None):
        self.single = None
        # _pairs: precomputed [(sym, len), ...] sorted by sym — the
        # simple-code fast path skips the full alphabet scan (most
        # codes in small images are 1-2 symbol simple codes)
        if _pairs is None:
            _pairs = [(sym, ln) for sym, ln in enumerate(lengths)
                      if ln > 0]
        nz = [(ln, sym) for sym, ln in _pairs]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = {}
            self.max_len = 0
            return
        # canonical assignment (RFC 1951 §3.2.2)
        max_len = max(ln for ln, _ in nz)
        bl_count = [0] * (max_len + 1)
        for ln, _ in nz:
            bl_count[ln] += 1
        code = 0
        next_code = [0] * (max_len + 2)
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        table = {}
        for sym, ln in _pairs:               # ascending symbol order
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
        # over-subscribed / incomplete codes are corrupt
        kraft = sum(1 / (1 << ln) for ln, _ in nz)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("VP8L: invalid (non-complete) prefix code")
        self.table = table
        self.max_len = max_len

    def read(self, rdr: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | rdr.read_bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: bad prefix code")


def _read_prefix_code(rdr: _LsbReader, alphabet_size: int) -> _PrefixCode:
    if rdr.read_bit():                      # simple code
        num_symbols = rdr.read_bit() + 1
        first_8bits = rdr.read_bit()
        sym0 = rdr.read_bits(8 if first_8bits else 1)
        if num_symbols == 2:
            sym1 = rdr.read_bits(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise ValueError("VP8L: simple-code symbol overflow")
            pairs = sorted({(sym0, 1), (sym1, 1)})
        else:
            if sym0 >= alphabet_size:
                raise ValueError("VP8L: simple-code symbol overflow")
            pairs = [(sym0, 1)]
        return _PrefixCode(None, _pairs=pairs)
    # full form: code-length codes
    num_cl = 4 + rdr.read_bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[KCL_ORDER[i]] = rdr.read_bits(3)
    cl_code = _PrefixCode(cl_lengths)
    if rdr.read_bit():                      # explicit max_symbol
        length_nbits = 2 + 2 * rdr.read_bits(3)
        max_symbol = 2 + rdr.read_bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_code.read(rdr)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + rdr.read_bits(2)
            if i + rep > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflow")
            for _ in range(rep):
                lengths[i] = prev
                i += 1
        elif s == 17:
            i += 3 + rdr.read_bits(3)
        else:                               # 18
            i += 11 + rdr.read_bits(7)
        if i > alphabet_size:
            raise ValueError("VP8L: code-length run overflow")
    return _PrefixCode(lengths)


def _lz77_value(rdr: _LsbReader, sym: int) -> int:
    """Prefix-coded LZ77 length/distance value (spec §'LZ77')."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + rdr.read_bits(extra) + 1


# --------------------------------------------------- image substreams

def _read_image_stream(rdr: _LsbReader, w: int, h: int,
                       is_level0: bool):
    """Decode a spatially-coded ARGB image (uint32 per pixel).  When
    ``is_level0`` also reads transforms, returning (argb_flat,
    transforms, coded_w) — transforms may shrink the coded width via
    pixel bundling."""
    transforms = []
    coded_w = w
    if is_level0:
        while rdr.read_bit():
            ttype = rdr.read_bits(2)
            if any(t[0] == ttype for t in transforms):
                raise ValueError("VP8L: duplicate transform")
            if ttype in (0, 1):             # predictor / color
                size_bits = rdr.read_bits(3) + 2
                bw = -(-coded_w // (1 << size_bits))
                bh = -(-h // (1 << size_bits))
                sub, _, _ = _read_image_stream(rdr, bw, bh, False)
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:                # subtract green
                transforms.append((2, None, None))
            else:                           # color indexing
                n_colors = rdr.read_bits(8) + 1
                pimg, _, _ = _read_image_stream(rdr, n_colors, 1, False)
                ch = np.stack([(pimg >> 24) & 0xFF, (pimg >> 16) & 0xFF,
                               (pimg >> 8) & 0xFF, pimg & 0xFF], axis=1)
                pal = np.cumsum(ch.astype(np.int64), axis=0) % 256
                # columns: [a, r, g, b], delta-decoded
                if n_colors <= 2:
                    wb = 3
                elif n_colors <= 4:
                    wb = 2
                elif n_colors <= 16:
                    wb = 1
                else:
                    wb = 0
                coded_w = -(-coded_w // (1 << wb))
                transforms.append((3, wb, pal.astype(np.uint8)))

    cache_bits = rdr.read_bits(4) if rdr.read_bit() else 0
    if cache_bits > 11:
        raise ValueError("VP8L: color cache too large")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and rdr.read_bit():        # entropy image
        meta_bits = rdr.read_bits(3) + 2
        mw = -(-coded_w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_img, _, _ = _read_image_stream(rdr, mw, mh, False)
        meta = (((meta_img >> 16) & 0xFF) << 8) | ((meta_img >> 8)
                                                   & 0xFF)
        meta = meta.reshape(mh, mw).astype(np.int64)
        n_groups = int(meta.max()) + 1

    groups = []
    green_size = 256 + 24 + cache_size
    for _ in range(n_groups):
        g = _read_prefix_code(rdr, green_size)
        r = _read_prefix_code(rdr, 256)
        b = _read_prefix_code(rdr, 256)
        a = _read_prefix_code(rdr, 256)
        d = _read_prefix_code(rdr, 40)
        groups.append((g, r, b, a, d))

    n = coded_w * h
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        x = pos % coded_w
        y = pos // coded_w
        if meta is not None:
            gi = int(meta[y >> meta_bits, x >> meta_bits])
            gcode, rcode, bcode, acode, dcode = groups[gi]
        else:
            gcode, rcode, bcode, acode, dcode = groups[0]
        s = gcode.read(rdr)
        if s < 256:                          # literal
            red = rcode.read(rdr)
            blue = bcode.read(rdr)
            alpha = acode.read(rdr)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF)
                      >> (32 - cache_bits)] = px
            pos += 1
        elif s < 256 + 24:                   # backward reference
            length = _lz77_value(rdr, s - 256)
            dist_code = _lz77_value(rdr, dcode.read(rdr))
            if dist_code <= 120:
                dx, dy = KDIST_MAP[dist_code - 1]
                dist = dy * coded_w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: backward reference out of range")
            for i in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache_size:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
                pos += 1
        else:                                # color-cache hit
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("VP8L: cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out, transforms, coded_w


# ----------------------------------------------------- inverse helpers

def _avg2(a, b):
    return (a.astype(np.int32) + b.astype(np.int32)) // 2


def _predict(mode: int, L, T, TL, TR):
    """One pixel's prediction, channels as 4-int arrays [a, r, g, b]."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.int32)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        pa_minus_pb = int(np.sum(np.abs(L.astype(np.int32) - TL))
                          - np.sum(np.abs(T.astype(np.int32) - TL)))
        return T if pa_minus_pb <= 0 else L
    if mode == 12:
        return np.clip(L.astype(np.int32) + T - TL, 0, 255)
    if mode == 13:
        # ClampAddSubtractHalf: libwebp computes a + (a - b) / 2 with C
        # integer division (truncation toward zero), which differs from
        # Python floor division for negative odd (ave - TL); e.g.
        # ave=10, TL=13 -> libwebp 9, floor-division would give 8.
        ave = _avg2(L, T)
        d = ave - TL.astype(np.int32)
        return np.clip(ave + np.sign(d) * (np.abs(d) // 2), 0, 255)
    raise ValueError(f"VP8L: invalid predictor mode {mode}")


def _px4(v: int) -> np.ndarray:
    return np.array([(v >> 24) & 0xFF, (v >> 16) & 0xFF,
                     (v >> 8) & 0xFF, v & 0xFF], dtype=np.int32)


def _inv_predictor(argb: np.ndarray, w: int, h: int, size_bits: int,
                   sub: np.ndarray) -> np.ndarray:
    bw = -(-w // (1 << size_bits))
    modes = ((sub >> 8) & 0xFF).reshape(-1, bw)
    if (modes == 2) .all():
        # uniform mode-2 (predict from T, the shape our encoder and
        # many screenshot-style files use) vectorizes fully: row 0 is
        # an L-prediction chain = per-channel cumsum mod 256, every
        # later row adds the reconstructed row above elementwise (the
        # x == 0 edge rule is T, which IS mode 2)
        ch = np.stack([(argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                       (argb >> 8) & 0xFF, argb & 0xFF],
                      axis=-1).reshape(h, w, 4).astype(np.int64)
        ch[0, 0, 0] = (ch[0, 0, 0] + 255) & 0xFF    # (0,0) pred a=255
        ch[0] = np.cumsum(ch[0], axis=0) % 256      # row 0: L chain
        for y in range(1, h):
            ch[y] = (ch[y] + ch[y - 1]) & 0xFF
        return ((ch[:, :, 0] << 24) | (ch[:, :, 1] << 16)
                | (ch[:, :, 2] << 8) | ch[:, :, 3]).astype(
                    np.uint32).reshape(-1)
    out = argb.copy()
    for pos in range(w * h):
        x = pos % w
        y = pos // w
        if x == 0 and y == 0:
            pred = np.array([255, 0, 0, 0], dtype=np.int32)
        elif y == 0:
            pred = _px4(int(out[pos - 1]))
        elif x == 0:
            pred = _px4(int(out[pos - w]))
        else:
            mode = int(modes[y >> size_bits, x >> size_bits])
            L = _px4(int(out[pos - 1]))
            T = _px4(int(out[pos - w]))
            TL = _px4(int(out[pos - w - 1]))
            # memory-contiguous TR rule: x == w-1 wraps to the current
            # row's leftmost (already reconstructed) pixel
            TR = _px4(int(out[pos - w + 1]))
            pred = _predict(mode, L, T, TL, TR)
        res = _px4(int(out[pos]))
        v = (res + pred) & 0xFF
        out[pos] = (int(v[0]) << 24) | (int(v[1]) << 16) \
            | (int(v[2]) << 8) | int(v[3])
    return out


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: both args as int8."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(argb: np.ndarray, w: int, h: int,
                         size_bits: int, sub: np.ndarray) -> np.ndarray:
    bw = -(-w // (1 << size_bits))
    sub = sub.reshape(-1, bw)
    out = argb.copy()
    for pos in range(w * h):
        x = pos % w
        y = pos // w
        cte = int(sub[y >> size_bits, x >> size_bits])
        g2r = cte & 0xFF
        g2b = (cte >> 8) & 0xFF
        r2b = (cte >> 16) & 0xFF
        px = int(out[pos])
        a = (px >> 24) & 0xFF
        r = (px >> 16) & 0xFF
        g = (px >> 8) & 0xFF
        b = px & 0xFF
        r = (r + _ct_delta(g2r, g)) & 0xFF
        b = (b + _ct_delta(g2b, g)) & 0xFF
        b = (b + _ct_delta(r2b, r)) & 0xFF
        out[pos] = (a << 24) | (r << 16) | (g << 8) | b
    return out


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    r = (r + g) & 0xFF
    b = (b + g) & 0xFF
    return ((a << 24) | (r << 16) | (g << 8) | b).astype(np.uint32)


def _inv_color_index(argb: np.ndarray, w: int, h: int, wb: int,
                     pal: np.ndarray) -> np.ndarray:
    """Un-bundle packed indices from the green channel and look up the
    palette.  ``pal`` is (n_colors, 4) uint8 [a, r, g, b]."""
    ppb = 1 << wb
    coded_w = -(-w // ppb)
    green = ((argb >> 8) & 0xFF).reshape(h, coded_w).astype(np.int64)
    bits = 8 >> wb
    idx = np.zeros((h, coded_w * ppb), dtype=np.int64)
    for k in range(ppb):
        idx[:, k::ppb] = (green >> (k * bits)) & ((1 << bits) - 1)
    idx = idx[:, :w]
    if (idx >= len(pal)).any():
        raise ValueError("VP8L: palette index out of range")
    px = pal[idx.reshape(-1)].astype(np.uint32)
    return ((px[:, 0] << 24) | (px[:, 1] << 16) | (px[:, 2] << 8)
            | px[:, 3]).astype(np.uint32)


# ------------------------------------------------------------- decode

def decode_vp8l(data: bytes) -> np.ndarray:
    """Decode a raw VP8L chunk payload into an (h, w, 4) uint8 RGBA
    array."""
    if not data or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    rdr = _LsbReader(data[1:])
    w = rdr.read_bits(14) + 1
    h = rdr.read_bits(14) + 1
    rdr.read_bit()                          # alpha hint
    if rdr.read_bits(3) != 0:
        raise ValueError("VP8L: unsupported version")
    argb, transforms, coded_w = _read_image_stream(rdr, w, h, True)
    for ttype, p1, p2 in reversed(transforms):
        if ttype == 0:
            argb = _inv_predictor(argb, coded_w, h, p1, p2)
        elif ttype == 1:
            argb = _inv_color_transform(argb, coded_w, h, p1, p2)
        elif ttype == 2:
            argb = _inv_subtract_green(argb)
        else:
            argb = _inv_color_index(argb, w, h, p1, p2)
            coded_w = w
    if coded_w != w:
        raise ValueError("VP8L: bundled stream without color indexing")
    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    return np.stack([r, g, b, a], axis=-1).astype(np.uint8) \
        .reshape(h, w, 4)


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a RIFF/WEBP container holding a VP8L (lossless) chunk
    into (h, w, 4) uint8 RGBA.  Lossy VP8 raises (DSP tier)."""
    if len(payload) < 20 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(payload):
        four = payload[pos:pos + 4]
        sz = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + sz]
        if four == b"VP8L":
            return decode_vp8l(body)
        if four == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 decode needs libwebp (DSP/entropy tier); "
                "VP8L lossless decodes in-container")
        pos += 8 + sz + (sz & 1)
    raise ValueError("WebP: no VP8L chunk found")


# ------------------------------------------------------------- encode

def _build_lengths(freq: np.ndarray, max_len: int = 15) -> np.ndarray:
    """Huffman code lengths from symbol frequencies, depth-limited by
    iterative frequency halving (rarely triggers at our sizes)."""
    import heapq
    freq = np.asarray(freq, dtype=np.int64)
    while True:
        nz = np.nonzero(freq)[0]
        lengths = np.zeros(len(freq), dtype=np.int64)
        if len(nz) == 0:
            return lengths
        if len(nz) == 1:
            lengths[nz[0]] = 1
            return lengths
        heap = [(int(freq[s]), int(s), (int(s),)) for s in nz]
        heapq.heapify(heap)
        depth = {int(s): 0 for s in nz}
        while len(heap) > 1:
            f1, _, s1 = heapq.heappop(heap)
            f2, _, s2 = heapq.heappop(heap)
            for s in s1 + s2:
                depth[s] += 1
            heapq.heappush(heap, (f1 + f2, min(s1 + s2), s1 + s2))
        if max(depth.values()) <= max_len:
            for s, d in depth.items():
                lengths[s] = d
            return lengths
        freq = np.maximum(freq // 2, (freq > 0).astype(np.int64))


def _canonical_codes(lengths) -> dict:
    if isinstance(lengths, np.ndarray):
        lengths = lengths.tolist()    # Python ints: the enumerations
        # below were numpy-scalar-read hot spots in the media kernel
    nz = [(int(ln), sym) for sym, ln in enumerate(lengths) if ln > 0]
    max_len = max(ln for ln, _ in nz)
    bl_count = [0] * (max_len + 1)
    for ln, _ in nz:
        bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        ln = int(ln)
        if ln > 0:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


def _write_prefix_code(wr: _LsbWriter, lengths) -> dict:
    """Serialize a prefix code (simple form when possible, else the
    full code-length-code form) and return the symbol->(code, len)
    map for subsequent payload writing."""
    if isinstance(lengths, np.ndarray):
        lengths = lengths.tolist()
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(used) <= 2 and max(used) < 256:
        wr.write_bits(1, 1)                 # simple
        wr.write_bits(len(used) - 1, 1)
        if used[0] < 2:
            wr.write_bits(0, 1)             # 1-bit first symbol
            wr.write_bits(used[0], 1)
        else:
            wr.write_bits(1, 1)
            wr.write_bits(used[0], 8)
        if len(used) == 2:
            wr.write_bits(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        return {used[0]: (0, 0)}
    wr.write_bits(0, 1)                     # full form
    # run-length encode the lengths with symbols 16/17/18
    seq = []                                # (cl_symbol, extra, nbits)
    i = 0
    n = len(lengths)
    prev_nz = 8
    while i < n:
        ln = int(lengths[i])
        if ln == 0:
            run = 1
            while i + run < n and lengths[i + run] == 0:
                run += 1
            left = run
            while left >= 11:
                take = min(left, 138)
                seq.append((18, take - 11, 7))
                left -= take
            while left >= 3:
                take = min(left, 10)
                seq.append((17, take - 3, 3))
                left -= take
            for _ in range(left):
                seq.append((0, 0, 0))
            i += run
        else:
            run = 1
            while i + run < n and lengths[i + run] == ln:
                run += 1
            seq.append((ln, 0, 0))
            left = run - 1
            if ln == prev_nz:
                left = run
                seq.pop()
            while left >= 3:
                take = min(left, 6)
                seq.append((16, take - 3, 2))
                left -= take
            for _ in range(left):
                seq.append((ln, 0, 0))
            prev_nz = ln
            i += run
    cl_freq = np.zeros(19, dtype=np.int64)
    for s, _, _ in seq:
        cl_freq[s] += 1
    cl_lengths = _build_lengths(cl_freq, max_len=7)
    if np.count_nonzero(cl_lengths) == 1:
        # a 1-symbol CL code cannot be canonical-decoded from 3-bit
        # lengths alone at the decoder (it accepts it); but keep the
        # Kraft sum complete by giving it length 1 partner 0-run
        only = int(np.nonzero(cl_lengths)[0][0])
        cl_lengths[only] = 1
        # add a dummy second symbol so the code is complete
        dummy = 0 if only != 0 else 1
        cl_lengths[dummy] = 1
        seq = seq                            # dummy never emitted
    num_cl = 19
    while num_cl > 4 and cl_lengths[KCL_ORDER[num_cl - 1]] == 0:
        num_cl -= 1
    wr.write_bits(num_cl - 4, 4)
    for i in range(num_cl):
        wr.write_bits(int(cl_lengths[KCL_ORDER[i]]), 3)
    wr.write_bits(0, 1)                     # no explicit max_symbol
    cl_codes = _canonical_codes(cl_lengths)
    for s, extra, nbits in seq:
        c, ln = cl_codes[s]
        wr.write_code(c, ln)
        if nbits:
            wr.write_bits(extra, nbits)
    return _canonical_codes(lengths)


def _lz77_code(value: int):
    """Inverse of _lz77_value: (symbol, extra, n_extra_bits)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    nbits = v.bit_length() - 2
    prefix = (v >> nbits) & 1
    sym = 2 * nbits + 2 + prefix
    offset = (2 + prefix) << nbits
    return sym, value - offset - 1, nbits


def _encode_image_stream(wr: _LsbWriter, argb: np.ndarray, w: int,
                         h: int, use_runs: bool = True,
                         is_level0: bool = False):
    """Literal + distance-1 run encoder with one prefix-code group."""
    n = w * h
    # Python ints: the per-pixel run scan below was a numpy-scalar-read
    # hot spot in the media kernel's per-doc profile
    argb = argb.reshape(-1).tolist()
    # tokens: ('lit', px) or ('run', length)
    tokens = []
    i = 0
    while i < n:
        if use_runs and i > 0 and argb[i] == argb[i - 1]:
            run = 1
            while i + run < n and argb[i + run] == argb[i]:
                run += 1
            if run >= 3:
                left = run
                while left > 0:
                    take = min(left, 4096)
                    tokens.append(("run", take))
                    left -= take
                i += run
                continue
        tokens.append(("lit", argb[i]))
        i += 1
    gf = np.zeros(256 + 24, dtype=np.int64)
    rf = np.zeros(256, dtype=np.int64)
    bf = np.zeros(256, dtype=np.int64)
    af = np.zeros(256, dtype=np.int64)
    df = np.zeros(40, dtype=np.int64)
    for kind, v in tokens:
        if kind == "lit":
            gf[(v >> 8) & 0xFF] += 1
            rf[(v >> 16) & 0xFF] += 1
            bf[v & 0xFF] += 1
            af[(v >> 24) & 0xFF] += 1
        else:
            sym, _, _ = _lz77_code(v)
            gf[256 + sym] += 1
            # distance 1 -> plane code: KDIST_MAP[1] == (1, 0) is
            # distance_code 2 -> lz77 value 2 -> symbol 1
            df[1] += 1
    if df.sum() == 0:
        df[0] = 1                           # unused but must be present
    if af.sum() == 0:
        af[255] = 1
    wr.write_bits(0, 1)                     # no color cache
    if is_level0:
        wr.write_bits(0, 1)                 # no meta prefix image
    gcodes = _write_prefix_code(wr, _build_lengths(gf))
    rcodes = _write_prefix_code(wr, _build_lengths(rf))
    bcodes = _write_prefix_code(wr, _build_lengths(bf))
    acodes = _write_prefix_code(wr, _build_lengths(af))
    dcodes = _write_prefix_code(wr, _build_lengths(df))
    for kind, v in tokens:
        if kind == "lit":
            c, ln = gcodes[(v >> 8) & 0xFF]
            wr.write_code(c, ln)
            c, ln = rcodes[(v >> 16) & 0xFF]
            wr.write_code(c, ln)
            c, ln = bcodes[v & 0xFF]
            wr.write_code(c, ln)
            c, ln = acodes[(v >> 24) & 0xFF]
            wr.write_code(c, ln)
        else:
            sym, extra, nbits = _lz77_code(v)
            c, ln = gcodes[256 + sym]
            wr.write_code(c, ln)
            if nbits:
                wr.write_bits(extra, nbits)
            c, ln = dcodes[1]               # distance_code 2 == (1,0)
            wr.write_code(c, ln)


def encode_vp8l(rgba: np.ndarray, transforms: tuple = ()) -> bytes:
    """Encode (h, w, 3|4) uint8 as a raw VP8L payload.  ``transforms``
    may contain 'subtract_green', 'predictor', 'color', 'palette'
    (palette requires <= 256 distinct colors and is mutually exclusive
    with the others here)."""
    a = np.asarray(rgba, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w = a.shape[:2]
    if a.shape[2] == 3:
        a = np.concatenate(
            [a, np.full((h, w, 1), 255, dtype=np.uint8)], axis=2)
    if w > 16384 or h > 16384:
        raise ValueError("VP8L: dimension > 16384")
    argb = (a[:, :, 3].astype(np.uint32) << 24) \
        | (a[:, :, 0].astype(np.uint32) << 16) \
        | (a[:, :, 1].astype(np.uint32) << 8) \
        | a[:, :, 2].astype(np.uint32)
    argb = argb.reshape(-1)
    wr = _LsbWriter()
    wr.write_bits(w - 1, 14)
    wr.write_bits(h - 1, 14)
    wr.write_bits(int((a[:, :, 3] != 255).any()), 1)
    wr.write_bits(0, 3)                     # version

    coded_w = w
    if "palette" in transforms:
        if len(transforms) > 1:
            raise ValueError("palette is exclusive in this encoder")
        colors, inv = np.unique(argb, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("palette transform needs <= 256 colors")
        nc = len(colors)
        wb = 3 if nc <= 2 else 2 if nc <= 4 else 1 if nc <= 16 else 0
        ppb = 1 << wb
        bits = 8 >> wb
        wr.write_bits(1, 1)                 # transform present
        wr.write_bits(3, 2)                 # color indexing
        wr.write_bits(nc - 1, 8)
        # delta-coded palette entries as an image stream
        pal = np.zeros((nc, 4), dtype=np.int64)
        pal[:, 0] = (colors >> 24) & 0xFF
        pal[:, 1] = (colors >> 16) & 0xFF
        pal[:, 2] = (colors >> 8) & 0xFF
        pal[:, 3] = colors & 0xFF
        dpal = np.diff(np.vstack([[[0, 0, 0, 0]], pal]), axis=0) % 256
        dargb = ((dpal[:, 0].astype(np.uint32) << 24)
                 | (dpal[:, 1].astype(np.uint32) << 16)
                 | (dpal[:, 2].astype(np.uint32) << 8)
                 | dpal[:, 3].astype(np.uint32))
        _encode_image_stream(wr, dargb, nc, 1, use_runs=False)
        # bundle indices into the green channel
        coded_w = -(-w // ppb)
        idx = inv.reshape(h, w).astype(np.int64)
        packed = np.zeros((h, coded_w), dtype=np.int64)
        for k in range(ppb):
            col = np.zeros((h, coded_w), dtype=np.int64)
            src = idx[:, k::ppb]
            col[:, :src.shape[1]] = src
            packed |= col << (k * bits)
        argb = ((0xFF << 24) | (packed << 8)).astype(
            np.uint32).reshape(-1)
        wr.write_bits(0, 1)                 # no more transforms
        _encode_image_stream(wr, argb, coded_w, h, is_level0=True)
        return bytes([0x2F]) + wr.getvalue()

    if "color" in transforms:
        # constant transform blocks (size_bits capped at the 3-bit
        # field max of 9), fixed deltas exercising all three
        # cross-channel terms
        size_bits = min(9, max(2, (max(w, h) - 1).bit_length()))
        bw = -(-w // (1 << size_bits))
        bh = -(-h // (1 << size_bits))
        g2r, g2b, r2b = 0x10, 0x08, 0x04
        wr.write_bits(1, 1)
        wr.write_bits(1, 2)                 # color transform
        wr.write_bits(size_bits - 2, 3)
        cte = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
        _encode_image_stream(
            wr, np.full(bw * bh, cte, dtype=np.uint32), bw, bh)
        # forward: subtract deltas (r uses g; b uses g then NEW r)
        aa = (argb >> 24) & 0xFF
        rr = (argb >> 16) & 0xFF
        gg = (argb >> 8) & 0xFF
        bb = argb & 0xFF
        # the decoder restores red BEFORE the r2b term touches blue,
        # so the forward r2b delta uses the ORIGINAL red value
        rr2 = np.array([(int(r) - _ct_delta(g2r, int(g))) & 0xFF
                        for r, g in zip(rr, gg)], dtype=np.uint32)
        bb2 = np.array(
            [(int(b) - _ct_delta(g2b, int(g))
              - _ct_delta(r2b, int(r0))) & 0xFF
             for b, g, r0 in zip(bb, gg, rr)], dtype=np.uint32)
        argb = ((aa << 24) | (rr2 << 16) | (gg << 8) | bb2).astype(
            np.uint32)

    if "subtract_green" in transforms:
        wr.write_bits(1, 1)
        wr.write_bits(2, 2)
        aa = (argb >> 24) & 0xFF
        rr = (argb >> 16) & 0xFF
        gg = (argb >> 8) & 0xFF
        bb = argb & 0xFF
        rr = (rr - gg) & 0xFF
        bb = (bb - gg) & 0xFF
        argb = ((aa << 24) | (rr << 16) | (gg << 8) | bb).astype(
            np.uint32)

    if "predictor" in transforms:
        # constant mode-2 blocks (predict from T); residuals computed
        # against the same edge rules the decoder inverts
        size_bits = min(9, max(2, (max(w, h) - 1).bit_length()))
        bw = -(-w // (1 << size_bits))
        bh = -(-h // (1 << size_bits))
        wr.write_bits(1, 1)
        wr.write_bits(0, 2)                 # predictor transform
        wr.write_bits(size_bits - 2, 3)
        mode_px = (0xFF << 24) | (2 << 8)
        _encode_image_stream(
            wr, np.full(bw * bh, mode_px, dtype=np.uint32), bw, bh)
        # vectorized mode-2 residuals (the exact inverse of the
        # uniform-mode-2 fast path in _inv_predictor): rows 1.. are
        # cur - row_above; row 0 is an L chain (adjacent diffs along x);
        # (0, 0) subtracts the 0xff000000 black predictor
        ch = np.stack([(argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                       (argb >> 8) & 0xFF, argb & 0xFF],
                      axis=-1).reshape(h, w, 4).astype(np.int64)
        res = np.empty_like(ch)
        res[1:] = (ch[1:] - ch[:-1]) & 0xFF
        res[0, 1:] = (ch[0, 1:] - ch[0, :-1]) & 0xFF
        res[0, 0] = ch[0, 0]
        res[0, 0, 0] = (ch[0, 0, 0] - 255) & 0xFF
        argb = ((res[:, :, 0] << 24) | (res[:, :, 1] << 16)
                | (res[:, :, 2] << 8) | res[:, :, 3]).astype(
                    np.uint32).reshape(-1)

    wr.write_bits(0, 1)                     # no more transforms
    _encode_image_stream(wr, argb, coded_w, h, is_level0=True)
    return bytes([0x2F]) + wr.getvalue()


def encode_webp_lossless(rgba: np.ndarray,
                         transforms: tuple = ()) -> bytes:
    """Wrap ``encode_vp8l`` output in a RIFF/WEBP container."""
    body = encode_vp8l(rgba, transforms)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
