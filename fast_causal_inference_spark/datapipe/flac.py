"""Pure-Python/numpy FLAC codec (RFC 9639 subset) — REAL lossless decode.

FLAC moves compressed audio from ``multimodal.py``'s "needs an external
codec library" tier into the "decodes for real, in-container" tier the
BMP/PPM/PNG/JPEG/WAV codecs occupy, because — unlike MP3/AAC — FLAC's
entropy layer is *mathematically defined* (Rice/Golomb codes over fixed
or LPC prediction residuals, RFC 9639 §9.2.7) rather than driven by
large normative Huffman tables that cannot be re-derived and validated
in-container.  Losslessness gives a validation story the lossy codecs
lack: encode→decode must reproduce the input EXACTLY, bit for bit, for
every signal, so property tests over random signals catch any bitstream
disagreement; the tests additionally pin a complete hand-derived golden
stream (every field worked out from the public spec) so the encoder and
decoder cannot drift together.

Decoder coverage: STREAMINFO + skipped metadata blocks, fixed-blocking
and variable-blocking frames, all blocksize/rate/sample-size header
codes, channel assignments 0-7 (independent) and left/side, right/side,
mid/side (RFC 9639 §9.1.3), subframe types CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC (orders 1-32), wasted bits, Rice and Rice2 residual
methods, multi-partition residuals, and escaped (raw fixed-width)
partitions.  CRC-8 (header), CRC-16 (frame) and the STREAMINFO MD5 are
all verified — a corrupt payload raises ``ValueError`` rather than
returning silently-wrong samples (the honesty rule in
``multimodal.py``'s module doc).

Encoder coverage (used for fixtures, the media gate, and round-trip
validation): CONSTANT auto-detect, VERBATIM, FIXED with per-channel
best-order search, optional LPC (Levinson-Durbin, quantized
coefficients), Rice/Rice2 with per-partition parameter search, escape
partitions, configurable partition order, and mono/stereo with
independent / left-side / right-side / mid-side assignments.

Scale shape: the codec is per-payload work behind Arrow-batched
``mapInPandas`` (see ``multimodal.audio_stats``) — embarrassingly
parallel, no shuffle.  The Rice decoder is vectorized: one
``np.unpackbits`` per payload plus a precomputed ones-index walk, so
the per-sample Python cost is a few pointer operations, not per-bit
loops.

Reference surface parity: the reference ships no media pipeline at all
(SURVEY.md §2.10 LLM-data mandate); this narrows the documented
compressed-audio scope cut recorded in ``multimodal.py``.
"""

from __future__ import annotations

import hashlib
import math
import struct

import numpy as np

from fast_causal_inference_spark.datapipe.mediaprobe import (
    _ogg_crc,
    _ogg_page,
)

__all__ = ["encode_flac", "decode_flac", "encode_flac_parts",
           "encode_ogg_flac", "decode_ogg_flac", "ogg_packets"]


# ---------------------------------------------------------------------------
# CRCs (RFC 9639 §9.1.8 / §9.3: CRC-8 poly 0x07, CRC-16 poly 0x8005,
# both init 0, MSB-first, no reflection)
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        r = byte << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TABLE[r ^ b]
    return r


def _crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16_TABLE[(r >> 8) ^ b]
    return r


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class BitWriter:
    """MSB-first bit accumulator (public helper: tests hand-craft streams
    with it to exercise decoder paths the encoder does not emit)."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        """``q`` zero bits then a terminating one (RFC 9639 §9.2.6)."""
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_bitarray(self, bits: np.ndarray) -> None:
        """Append a uint8 0/1 bit array (vectorized bulk path: the
        encoder assembles whole residual partitions this way instead of
        looping per sample)."""
        if self._nbits:
            acc = np.array([(self._acc >> (self._nbits - 1 - i)) & 1
                            for i in range(self._nbits)], dtype=np.uint8)
            bits = np.concatenate([acc, bits])
            self._acc = 0
            self._nbits = 0
        n_whole = len(bits) // 8 * 8
        if n_whole:
            self._buf += np.packbits(bits[:n_whole]).tobytes()
        for b in bits[n_whole:]:
            self._acc = (self._acc << 1) | int(b)
            self._nbits += 1

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        if self._nbits:
            raise ValueError("unaligned bit buffer")
        return bytes(self._buf)


class _BitReader:
    """MSB-first reader over one ``np.unpackbits`` pass.

    ``_ones`` (sorted indices of all set bits) is precomputed once so
    unary/Rice quotients are pointer walks instead of per-bit scans."""

    def __init__(self, payload: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8))
        self._ones = np.flatnonzero(self.bits)
        self.pos = 0
        self.n = len(self.bits)
        # the same stream as one big integer: scalar reads are a single
        # C shift+mask instead of a per-bit numpy iteration (bits[0] is
        # the MSB of byte 0, so big-endian int.from_bytes matches)
        self._ival = int.from_bytes(payload, "big")

    def read(self, nbits: int) -> int:
        if self.pos + nbits > self.n:
            raise ValueError("truncated FLAC bitstream")
        if nbits == 0:
            return 0
        v = (self._ival >> (self.n - self.pos - nbits)) \
            & ((1 << nbits) - 1)
        self.pos += nbits
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        i = np.searchsorted(self._ones, self.pos)
        if i >= len(self._ones):
            raise ValueError("truncated FLAC bitstream (unary)")
        t = int(self._ones[i])
        q = t - self.pos
        self.pos = t + 1
        return q

    def read_signed_array(self, count: int, width: int) -> np.ndarray:
        """Vectorized fixed-width two's-complement reads."""
        if count == 0:
            return np.zeros(0, dtype=np.int64)
        if width == 0:
            return np.zeros(count, dtype=np.int64)
        end = self.pos + count * width
        if end > self.n:
            raise ValueError("truncated FLAC bitstream")
        m = (self.bits[self.pos:end].reshape(count, width)
             .astype(np.int64))
        w = 1 << np.arange(width - 1, -1, -1, dtype=np.int64)
        vals = m @ w
        sign = 1 << (width - 1)
        vals = np.where(vals & sign, vals - (1 << width), vals)
        self.pos = end
        return vals

    def read_rice_array(self, count: int, param: int) -> np.ndarray:
        """Vectorized Rice decode: walk the precomputed ones index to
        find each code's terminator (quotient), then gather all low-bit
        fields in one matrix read."""
        if count == 0:
            return np.zeros(0, dtype=np.int64)
        # walk the ones index as a PYTHON list: the per-code loop below
        # reads one element per code (plus skips inside low-bit fields),
        # and numpy scalar __getitem__ per read was a measured hot spot
        # of the fused media kernel — the lazily-built list is cached on
        # the reader and shared by every subframe of the stream
        ones = getattr(self, "_ones_list", None)
        if ones is None:
            ones = self._ones.tolist()
            self._ones_list = ones
        from bisect import bisect_left
        ptr = bisect_left(ones, self.pos)
        pos = self.pos
        n_ones = len(ones)
        ts = [0] * count
        qs = [0] * count
        for i in range(count):
            # C binary search for the terminator instead of walking the
            # one-bits buried inside the previous code's low-bit field
            # (for param p, ~p/2 ones per code were walked one by one)
            ptr = bisect_left(ones, pos, ptr)
            if ptr >= n_ones:
                raise ValueError("truncated FLAC bitstream (rice)")
            t = ones[ptr]
            ptr += 1
            ts[i] = t
            qs[i] = t - pos
            pos = t + 1 + param
        if pos > self.n:
            raise ValueError("truncated FLAC bitstream (rice lows)")
        self.pos = int(pos)
        qs = np.asarray(qs, dtype=np.int64)
        if param:
            idx = (np.asarray(ts, dtype=np.int64)[:, None]
                   + 1 + np.arange(param, dtype=np.int64))
            w = 1 << np.arange(param - 1, -1, -1, dtype=np.int64)
            lows = self.bits[idx].astype(np.int64) @ w
        else:
            lows = np.zeros(count, dtype=np.int64)
        u = (qs << param) | lows
        return np.where(u & 1, -((u + 1) >> 1), u >> 1)   # un-zigzag


# ---------------------------------------------------------------------------
# shared framing tables
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}
_BLOCKSIZE_BY_CODE = {v: k for k, v in _BLOCKSIZE_CODES.items()}
_RATE_BY_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_BPS_BY_CODE = {v: k for k, v in _BPS_CODES.items()}

# fixed-predictor coefficients by order (RFC 9639 §9.2.4)
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
                4: [4, -6, 4, -1]}


def _utf8_code(value: int) -> bytes:
    """The UTF-8-style coded number in frame headers (RFC 9639 §9.1.5)."""
    if value < 0x80:
        return bytes([value])
    for nbytes, first_max in ((2, 11), (3, 16), (4, 21), (5, 26),
                              (6, 31), (7, 36)):
        if value < (1 << first_max):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            out = [lead | (value >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((value >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("coded number out of range")


def _read_utf8_code(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid coded number in FLAC frame header")
    value = first & (mask - 1)
    for _ in range(nbytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid coded-number continuation byte")
        value = (value << 6) | (b & 0x3F)
    return value


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _zigzag(e: np.ndarray) -> np.ndarray:
    return np.where(e >= 0, e << 1, (-e << 1) - 1)


def _unsigned_bits(vals: np.ndarray, width: int) -> np.ndarray:
    """(n,) unsigned int64 → (n, width) MSB-first 0/1 uint8 matrix."""
    shifts = np.arange(width - 1, -1, -1, dtype=np.int64)
    return ((vals[:, None] >> shifts) & 1).astype(np.uint8)


def _best_rice_param(u: np.ndarray, max_param: int) -> int:
    """Smallest total-bits parameter (exact cost over the candidates)."""
    best_p, best_cost = 0, None
    for p in range(max_param + 1):
        cost = int(np.sum(u >> p)) + len(u) * (p + 1)
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
    return best_p


def _write_residual(w: BitWriter, resid: np.ndarray, block_size: int,
                    order: int, partition_order: int, rice2: bool,
                    escape_raw: bool) -> None:
    method = 1 if rice2 else 0
    max_param = 30 if rice2 else 14
    param_bits = 5 if rice2 else 4
    escape = 31 if rice2 else 15
    w.write(method, 2)
    w.write(partition_order, 4)
    n_parts = 1 << partition_order
    if block_size % n_parts or (block_size >> partition_order) < order:
        raise ValueError("invalid partition order for block size/order")
    start = 0
    for part in range(n_parts):
        cnt = (block_size >> partition_order) - (order if part == 0 else 0)
        seg = resid[start:start + cnt]
        start += cnt
        if escape_raw:
            width = 0
            if len(seg) and (seg.max() > 0 or seg.min() < 0):
                amax = int(max(seg.max(), -seg.min() - 1))
                width = amax.bit_length() + 1
            w.write(escape, param_bits)
            w.write(width, 5)
            if width and len(seg):
                w.write_bitarray(_unsigned_bits(
                    seg.astype(np.int64) & ((1 << width) - 1),
                    width).reshape(-1))
            continue
        u = _zigzag(seg.astype(np.int64))
        p = _best_rice_param(u, max_param) if len(u) else 0
        w.write(p, param_bits)
        if len(u):
            # vectorized rice: terminator positions from the cumulative
            # code lengths, then one scatter for the low-bit fields
            q = u >> p
            ends = np.cumsum(q + 1 + p)
            bits = np.zeros(int(ends[-1]), dtype=np.uint8)
            stops = ends - (p + 1)
            bits[stops] = 1
            if p:
                posm = stops[:, None] + 1 + np.arange(p, dtype=np.int64)
                bits[posm] = _unsigned_bits(u & ((1 << p) - 1), p)
            w.write_bitarray(bits)


def _levinson(acf: np.ndarray, order: int) -> np.ndarray:
    """Levinson-Durbin LPC coefficients from autocorrelation."""
    err = acf[0]
    coefs = np.zeros(order)
    for i in range(order):
        acc = acf[i + 1] - coefs[:i] @ acf[i:0:-1]
        if err == 0:
            break
        k = acc / err
        new = coefs.copy()
        new[i] = k
        new[:i] = coefs[:i] - k * coefs[:i][::-1]
        coefs = new
        err *= (1 - k * k)
    return coefs


def _encode_subframe(w: BitWriter, x: np.ndarray, bps: int,
                     block_size: int, method: str, lpc_order: int,
                     partition_order: int, rice2: bool,
                     escape_raw: bool) -> None:
    x = x.astype(np.int64)
    if method == "constant" or (method == "auto"
                                and len(x) and np.all(x == x[0])):
        if not np.all(x == x[0]):
            raise ValueError("method='constant' on non-constant block "
                             "would be lossy")
        w.write(0, 1 + 6 + 1)                       # pad, type 0, no waste
        w.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    if method == "verbatim":
        w.write(0b0_000001_0, 8)
        if len(x):
            w.write_bitarray(_unsigned_bits(
                x & ((1 << bps) - 1), bps).reshape(-1))
        return
    if method == "lpc":
        order = min(lpc_order, len(x) - 1)
        if order < 1:
            raise ValueError("LPC needs at least 2 samples")
        xf = x.astype(np.float64)
        acf = np.array([xf[:len(xf) - k] @ xf[k:] if k < len(xf) else 0.0
                        for k in range(order + 1)])
        if acf[0] == 0:
            acf[0] = 1.0
        coefs = _levinson(acf, order)
        precision = 12
        cmax = float(np.max(np.abs(coefs))) or 1.0
        shift = min(14, max(1, precision - 1 - int(
            math.floor(math.log2(cmax))) - 1))
        q = np.clip(np.round(coefs * (1 << shift)),
                    -(1 << (precision - 1)),
                    (1 << (precision - 1)) - 1).astype(np.int64)
        pred = np.zeros(len(x), dtype=np.int64)
        for j in range(order):
            pred[order:] += q[j] * x[order - 1 - j:len(x) - 1 - j]
        resid = x[order:] - (pred[order:] >> shift)
        w.write(0, 1)
        w.write(0b100000 | (order - 1), 6)
        w.write(0, 1)
        for v in x[:order]:
            w.write(int(v) & ((1 << bps) - 1), bps)
        w.write(precision - 1, 4)
        w.write(shift, 5)
        for c in q:
            w.write(int(c) & ((1 << precision) - 1), precision)
        _write_residual(w, resid, block_size, order, partition_order,
                        rice2, escape_raw)
        return
    # fixed: best order by absolute residual sum (the classic heuristic)
    best = None
    max_order = min(4, len(x) - 1)
    for o in range(max_order + 1):
        pred = np.zeros(len(x) - o, dtype=np.int64)
        for j, c in enumerate(_FIXED_COEFS[o]):
            pred += c * x[o - 1 - j:len(x) - 1 - j]
        resid = x[o:] - pred
        cost = int(np.abs(resid).sum())
        if best is None or cost < best[0]:
            best = (cost, o, resid)
    _, order, resid = best
    w.write(0, 1)
    w.write(0b001000 | order, 6)
    w.write(0, 1)
    for v in x[:order]:
        w.write(int(v) & ((1 << bps) - 1), bps)
    _write_residual(w, resid, block_size, order, partition_order,
                    rice2, escape_raw)


def encode_flac(samples: np.ndarray, sample_rate: int = 16_000,
                bps: int = 16, block_size: int = 4096,
                stereo_mode: str = "auto", method: str = "auto",
                lpc_order: int = 8, partition_order: int = 0,
                rice2: bool = False, escape_raw: bool = False,
                variable_blocking: bool = False) -> bytes:
    """Encode int samples — shape ``(n,)`` mono or ``(n, channels)`` —
    as a valid FLAC stream (fLaC magic + STREAMINFO + frames).

    ``method``: ``auto`` (constant detect, else best fixed order),
    ``verbatim``, ``fixed``, ``lpc``, ``constant``.  ``stereo_mode``:
    ``auto``/``independent``/``left_side``/``right_side``/``mid_side``.
    ``partition_order``/``rice2``/``escape_raw``/``variable_blocking``
    exist so fixtures can exercise every decoder path with legal
    streams.  Lossless for any in-range input by construction.
    """
    streaminfo, frames = encode_flac_parts(
        samples, sample_rate, bps, block_size, stereo_mode, method,
        lpc_order, partition_order, rice2, escape_raw, variable_blocking)
    header = b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:]
    return header + streaminfo + b"".join(frames)


def encode_flac_parts(samples: np.ndarray, sample_rate: int = 16_000,
                      bps: int = 16, block_size: int = 4096,
                      stereo_mode: str = "auto", method: str = "auto",
                      lpc_order: int = 8, partition_order: int = 0,
                      rice2: bool = False, escape_raw: bool = False,
                      variable_blocking: bool = False
                      ) -> tuple[bytes, list[bytes]]:
    """The encoder's building blocks: ``(streaminfo_body, [frame, ...])``
    — what a container mapping (Ogg encapsulation below) packetizes."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if channels > 8:
        raise ValueError("FLAC supports at most 8 channels")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if n and (x.min() < lo or x.max() > hi):
        raise ValueError(f"samples exceed {bps}-bit range")
    if sample_rate <= 0 or sample_rate >= (1 << 20):
        raise ValueError("sample rate out of FLAC's 20-bit range")

    md5 = hashlib.md5()
    if bps % 8 == 0:
        width = bps // 8
        inter = x.reshape(-1)
        raw = np.zeros((len(inter), width), dtype=np.uint8)
        vals = inter.astype(np.int64) & ((1 << bps) - 1)
        for i in range(width):                       # little-endian bytes
            raw[:, i] = (vals >> (8 * i)) & 0xFF
        md5.update(raw.tobytes())

    frames = []
    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        blk = x[start:start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        mode = stereo_mode
        if channels != 2:
            mode = "independent"
        elif mode == "auto":
            mode = "mid_side"
        hdr = BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)
        hdr.write(1 if variable_blocking else 0, 1)
        bs_code = _BLOCKSIZE_CODES.get(bs)
        extra_bs = None
        if bs_code is None:
            bs_code, extra_bs = (6, bs - 1) if bs <= 256 else (7, bs - 1)
        hdr.write(bs_code, 4)
        hdr.write(0, 4)                              # rate: from STREAMINFO
        assign = {"independent": channels - 1, "left_side": 8,
                  "right_side": 9, "mid_side": 10}[mode]
        hdr.write(assign, 4)
        hdr.write(_BPS_CODES[bps], 3)
        hdr.write(0, 1)
        hdr.align()
        head = bytearray(hdr.getvalue())
        head += _utf8_code(start if variable_blocking else frame_no)
        if extra_bs is not None:
            head += (struct.pack(">B", extra_bs) if bs_code == 6
                     else struct.pack(">H", extra_bs))
        head.append(_crc8(bytes(head)))

        body = BitWriter()
        if mode == "independent":
            chans = [(blk[:, c], bps) for c in range(channels)]
        else:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            if mode == "left_side":
                chans = [(left, bps), (side, bps + 1)]
            elif mode == "right_side":
                chans = [(side, bps + 1), (right, bps)]
            else:
                chans = [((left + right) >> 1, bps), (side, bps + 1)]
        for ch, ch_bps in chans:
            _encode_subframe(body, ch, ch_bps, bs, method, lpc_order,
                             partition_order, rice2, escape_raw)
        body.align()
        frame = bytes(head) + body.getvalue()
        frames.append(frame + struct.pack(">H", _crc16(frame)))
        frame_no += 1

    frame_sizes = [len(f) for f in frames] or [0]
    info = BitWriter()
    info.write(min(block_size, n) if n else block_size, 16)
    info.write(min(block_size, n) if n else block_size, 16)
    info.write(min(frame_sizes), 24)
    info.write(max(frame_sizes), 24)
    info.write(sample_rate, 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    streaminfo = info.getvalue() + (md5.digest() if bps % 8 == 0
                                    else b"\x00" * 16)
    return streaminfo, frames


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _decode_residual(r: _BitReader, block_size: int,
                     order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    param_bits = 5 if method else 4
    escape = (1 << param_bits) - 1
    po = r.read(4)
    n_parts = 1 << po
    if block_size % n_parts or (block_size >> po) < order:
        raise ValueError("invalid FLAC residual partition order")
    out = np.empty(block_size - order, dtype=np.int64)
    at = 0
    for part in range(n_parts):
        cnt = (block_size >> po) - (order if part == 0 else 0)
        p = r.read(param_bits)
        if p == escape:
            width = r.read(5)
            out[at:at + cnt] = r.read_signed_array(cnt, width)
        else:
            out[at:at + cnt] = r.read_rice_array(cnt, p)
        at += cnt
    return out


def _integrate_fixed(warmup: np.ndarray, resid: np.ndarray,
                     order: int) -> np.ndarray:
    """Invert the order-``o`` difference: o cumulative sums seeded from
    the warmup's finite differences — vectorized, no per-sample loop."""
    if order == 0:
        return resid.copy()
    cur = resid
    for k in range(order - 1, -1, -1):
        init = sum((-1) ** j * math.comb(k, j) * int(warmup[k - j])
                   for j in range(k + 1))
        cur = np.cumsum(np.concatenate(([init], cur)))
    return cur


def _decode_subframe(r: _BitReader, block_size: int,
                     bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("FLAC subframe padding bit set")
    typ = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    ebps = bps - wasted
    if ebps <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if typ == 0:                                     # CONSTANT
        out = np.full(block_size, r.read_signed(ebps), dtype=np.int64)
    elif typ == 1:                                   # VERBATIM
        out = r.read_signed_array(block_size, ebps)
    elif 8 <= typ <= 12:                             # FIXED order 0-4
        order = typ - 8
        if order > block_size:
            raise ValueError("FLAC fixed order exceeds block size")
        warm = r.read_signed_array(order, ebps)
        resid = _decode_residual(r, block_size, order)
        # _integrate_fixed seeds each cumsum from the warmup's finite
        # differences, so its output IS the full block (warmup included)
        out = _integrate_fixed(warm, resid, order)
    elif typ >= 32:                                  # LPC order 1-32
        order = (typ & 31) + 1
        if order >= block_size + 1:
            raise ValueError("FLAC LPC order exceeds block size")
        warm = r.read_signed_array(order, ebps)
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision code 15")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = r.read_signed_array(order, precision)
        resid = _decode_residual(r, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        c = coefs[::-1]                              # oldest-first
        for i in range(order, block_size):
            out[i] = resid[i - order] + ((out[i - order:i] @ c) >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {typ}")
    if wasted:
        out = out << wasted
    return out


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream → ``(samples, sample_rate)``; samples are
    int64, shape ``(n,)`` mono or ``(n, channels)``.  CRC-8/CRC-16 and
    the STREAMINFO MD5 are verified; corrupt input raises ValueError."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(payload):                   # metadata blocks
        head = payload[pos]
        length = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + length]
        if len(body) < length:
            raise ValueError("truncated FLAC metadata block")
        if head & 0x7F == 0:
            if length != 34:
                raise ValueError("bad STREAMINFO length")
            r = _BitReader(body)
            streaminfo = {
                "min_bs": r.read(16), "max_bs": r.read(16),
                "min_fs": r.read(24), "max_fs": r.read(24),
                "rate": r.read(20), "channels": r.read(3) + 1,
                "bps": r.read(5) + 1, "total": r.read(36),
                "md5": body[18:34]}
        elif head & 0x7F == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + length
        if head & 0x80:
            break
    if streaminfo is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    if streaminfo["rate"] == 0:
        raise ValueError("corrupt FLAC: zero sample rate")

    r = _BitReader(payload[pos:])
    chunks: list[np.ndarray] = []
    decoded = 0
    total = streaminfo["total"]
    while (total == 0 or decoded < total) and r.n - r.pos >= 16:
        frame_bit_start = r.pos
        if r.pos % 8:
            raise ValueError("FLAC frame not byte-aligned")
        if r.read(14) != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        if r.read(1):
            raise ValueError("reserved bit set in FLAC frame header")
        r.read(1)                                    # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        assign = r.read(4)
        bps_code = r.read(3)
        if r.read(1):
            raise ValueError("reserved bit set in FLAC frame header")
        _read_utf8_code(r)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code 0")
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = _BLOCKSIZE_BY_CODE[bs_code]
        if rate_code == 0:
            pass
        elif rate_code in _RATE_BY_CODE:
            pass
        elif rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        else:
            raise ValueError("invalid FLAC sample rate code 15")
        bps = (streaminfo["bps"] if bps_code == 0
               else _BPS_BY_CODE.get(bps_code))
        if bps is None:
            raise ValueError(f"reserved FLAC sample size code {bps_code}")
        hdr_bytes = np.packbits(
            r.bits[frame_bit_start:r.pos]).tobytes()
        if _crc8(hdr_bytes) != r.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if assign <= 7:
            n_ch = assign + 1
            sub_bps = [bps] * n_ch
        elif assign == 8:                            # left/side
            n_ch, sub_bps = 2, [bps, bps + 1]
        elif assign == 9:                            # right/side
            n_ch, sub_bps = 2, [bps + 1, bps]
        elif assign == 10:                           # mid/side
            n_ch, sub_bps = 2, [bps, bps + 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {assign}")
        if n_ch != streaminfo["channels"]:
            raise ValueError("FLAC frame channel count mismatch")

        subs = [_decode_subframe(r, bs, b) for b in sub_bps]
        if assign == 8:
            left = subs[0]
            right = left - subs[1]
            blk = np.stack([left, right], axis=1)
        elif assign == 9:
            right = subs[1]
            blk = np.stack([subs[0] + right, right], axis=1)
        elif assign == 10:
            mid, side = subs
            left = mid + ((side >> 1) + (side & 1))
            blk = np.stack([left, left - side], axis=1)
        else:
            blk = np.stack(subs, axis=1)
        if r.pos % 8:                                # zero padding
            if r.read(8 - r.pos % 8):
                raise ValueError("nonzero FLAC frame padding")
        frame_bytes = np.packbits(
            r.bits[frame_bit_start:r.pos]).tobytes()
        if _crc16(frame_bytes) != r.read(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        chunks.append(blk)
        decoded += bs

    if total and decoded < total:
        raise ValueError("truncated FLAC stream: missing frames")
    out = (np.concatenate(chunks, axis=0) if chunks
           else np.zeros((0, streaminfo["channels"]), dtype=np.int64))
    if total:
        out = out[:total]
    bps = streaminfo["bps"]
    if bps % 8 == 0 and streaminfo["md5"] != b"\x00" * 16:
        width = bps // 8
        vals = out.reshape(-1).astype(np.int64) & ((1 << bps) - 1)
        raw = np.zeros((len(vals), width), dtype=np.uint8)
        for i in range(width):
            raw[:, i] = (vals >> (8 * i)) & 0xFF
        if hashlib.md5(raw.tobytes()).digest() != streaminfo["md5"]:
            raise ValueError("FLAC MD5 signature mismatch")
    if streaminfo["channels"] == 1:
        out = out[:, 0]
    return out, streaminfo["rate"]


# ---------------------------------------------------------------------------
# Ogg encapsulation (the FLAC-to-Ogg mapping): the container side is pure
# page framing — depacketize and hand the payload to the SAME validated
# FLAC core, so "FLAC inside Ogg" decodes for real while Ogg-Vorbis/Opus
# (lossy entropy codecs) stay behind the documented scope cut.
# ---------------------------------------------------------------------------


def ogg_packets(payload: bytes, verify_crc: bool = True):
    """Reassemble logical packets from Ogg pages (RFC 3533 lacing:
    a packet ends at the first segment shorter than 255; it continues
    onto the next page otherwise).  Yields packet bytes; corrupt framing
    or a page-CRC mismatch raises ValueError."""
    pos = 0
    buf = bytearray()
    n = len(payload)
    while pos + 27 <= n:
        if payload[pos:pos + 4] != b"OggS":
            raise ValueError("lost Ogg page sync")
        if payload[pos + 4] != 0:
            raise ValueError("unsupported Ogg stream structure version")
        header_type = payload[pos + 5]
        nsegs = payload[pos + 26]
        seg_table = payload[pos + 27:pos + 27 + nsegs]
        if len(seg_table) < nsegs:
            raise ValueError("truncated Ogg segment table")
        body_start = pos + 27 + nsegs
        body_len = sum(seg_table)
        if body_start + body_len > n:
            raise ValueError("truncated Ogg page body")
        if verify_crc:
            page = payload[pos:body_start + body_len]
            zeroed = page[:22] + b"\x00\x00\x00\x00" + page[26:]
            if _ogg_crc(zeroed) != int.from_bytes(page[22:26], "little"):
                raise ValueError("Ogg page CRC mismatch")
        if not (header_type & 0x01) and buf:
            # a fresh (non-continuation) page while a packet is open:
            # the stream lost the packet's tail
            raise ValueError("Ogg packet truncated across pages")
        at = body_start
        for seg in seg_table:
            buf += payload[at:at + seg]
            at += seg
            if seg < 255:
                yield bytes(buf)
                buf.clear()
        pos = body_start + body_len
    if pos != n:
        raise ValueError("trailing garbage after the last Ogg page")
    if buf:
        raise ValueError("Ogg stream ends mid-packet")


def encode_ogg_flac(samples: np.ndarray, sample_rate: int = 16_000,
                    serial: int = 1, **flac_kwargs) -> bytes:
    """Encode samples as a FLAC-in-Ogg stream (the standard mapping:
    BOS packet = 0x7F'FLAC' + version + header count + fLaC +
    STREAMINFO; one Vorbis-comment header packet; one audio frame per
    packet; granule = cumulative PCM samples; EOS on the final page).
    Real page CRCs throughout."""
    streaminfo, frames = encode_flac_parts(samples, sample_rate,
                                           **flac_kwargs)
    x = np.asarray(samples)
    n = x.shape[0]
    block_size = int(flac_kwargs.get("block_size", 4096))
    first = (b"\x7fFLAC\x01\x00" + (1).to_bytes(2, "big")
             + b"fLaC" + bytes([0x00]) + (34).to_bytes(3, "big")
             + streaminfo)
    vendor = b"fcis-spark"
    vc_body = (struct.pack("<I", len(vendor)) + vendor
               + struct.pack("<I", 0))
    vc_block = bytes([0x84]) + len(vc_body).to_bytes(3, "big") + vc_body
    pages = [_ogg_page(serial, 0, 0, 0x02, first),
             _ogg_page(serial, 1, 0, 0x00, vc_block)]
    granule = 0
    for i, frame in enumerate(frames):
        granule += min(block_size, n - i * block_size)
        last = i == len(frames) - 1
        pages.append(_ogg_page(serial, 2 + i, granule,
                               0x04 if last else 0x00, frame))
    if not frames:                        # empty stream: EOS page, no audio
        pages.append(_ogg_page(serial, 2, 0, 0x04, b""))
    return b"".join(pages)


def decode_ogg_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC-in-Ogg stream: depacketize the pages, rebuild the
    native FLAC stream (fLaC + STREAMINFO + frames), and decode with the
    fully-verified native core (CRC-8/16 + MD5 still apply)."""
    packets = list(ogg_packets(payload))
    if not packets or packets[0][:5] != b"\x7fFLAC":
        raise ValueError("not an Ogg-FLAC stream")
    p0 = packets[0]
    if len(p0) < 9 + 4 + 4 + 34 or p0[9:13] != b"fLaC":
        raise ValueError("corrupt Ogg-FLAC mapping header")
    header_count = int.from_bytes(p0[7:9], "big")
    streaminfo_body = p0[17:17 + 34]
    if p0[13] & 0x7F != 0:
        raise ValueError("Ogg-FLAC first packet must carry STREAMINFO")
    rest = packets[1:]
    if header_count:
        audio = rest[header_count:]
    else:
        # header_count 0 = "unknown": headers are metadata blocks
        # (first byte < 0x80 or the 0x8x last-flag forms — never the
        # 0xFF frame sync); audio starts at the first sync byte
        at = 0
        while at < len(rest) and (not rest[at] or rest[at][0] != 0xFF):
            at += 1
        audio = rest[at:]
    rebuilt = (b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
               + streaminfo_body + b"".join(audio))
    return decode_flac(rebuilt)
