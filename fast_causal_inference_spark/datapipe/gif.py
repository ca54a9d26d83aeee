"""Pure-Python GIF codec (GIF87a/89a, real LZW) — in-container decode.

GIF clears the same validation bar as FLAC (``datapipe/flac.py``): its
compression layer is *algorithmically defined* (variable-width LZW,
GIF89a specification appendix F) rather than driven by normative
entropy tables, and it is lossless over palette indices — so
encode→decode round-trip equality over arbitrary images is a complete
in-container validation, and the tests additionally pin a hand-derived
golden stream (every LZW code worked out longhand from the spec).

Decoder coverage: GIF87a and GIF89a headers, global and local color
tables, interlaced (4-pass) and sequential images, extension-block
skipping (GCE/comment/application), sub-block reassembly, variable
code width with dictionary growth to 4096 and deferred-clear handling,
and explicit clear/EOI codes.  The FIRST image of an animation is
decoded (frame sampling of animations is the video pipeline's job).
Corrupt streams raise ``ValueError`` — never silently-wrong pixels.

Encoder coverage (fixtures + round-trip validation): palette built from
the image (≤256 distinct colors — raise otherwise, quantization is an
external concern), real LZW compression with code-width growth and
mid-stream clear-code resets at table overflow, optional interlace.

Scale shape: per-payload work behind Arrow-batched ``mapInPandas``
(``multimodal.image_stats``/``image_features``) — embarrassingly
parallel, no shuffle.  LZW decode is a per-code Python loop over
driver-bounded images (the probe filters size first at corpus scale).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_gif", "decode_gif"]

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    return [y for start, step in _INTERLACE_PASSES
            for y in range(start, h, step)]


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    emit(clear, code_size)
    it = iter(int(v) for v in indices)
    try:
        cur = next(it)
    except StopIteration:
        emit(end, code_size)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)
    for k in it:
        key = (cur, k)
        if key in table:
            cur = table[key]
            continue
        emit(cur, code_size)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:                       # table full: reset (decoder mirrors)
            emit(clear, code_size)
            table.clear()
            code_size = min_code_size + 1
            next_code = end + 1
        cur = k
    emit(cur, code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int,
                n_pixels: int) -> np.ndarray:
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"invalid GIF LZW code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    code_size = min_code_size + 1
    next_code = end + 1
    out = bytearray()
    prev: int | None = None
    acc = 0
    nbits = 0
    at = 0
    n = len(data)
    while len(out) < n_pixels:
        while nbits < code_size:
            if at >= n:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[at] << nbits
            at += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = dict(base)
            code_size = min_code_size + 1
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("GIF LZW stream starts with unknown code")
        elif code in table:
            entry = table[code]
        elif code == next_code:     # the KwKwK case
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = table[prev] + entry[:1]
            next_code += 1
            # canonical GIF rule: width grows when the table REACHES the
            # current code limit — the decoder lags the encoder by one
            # entry, so the encoder's matching rule is 2^size + 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code
    if len(out) < n_pixels:
        raise ValueError("GIF image data ends before the raster is full")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a single-image GIF89a.

    The palette is the image's distinct colors (≤256 — more raises;
    quantize externally).  Real LZW with code-width growth; losslessly
    round-trips any encodable image by construction."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_gif expects (h, w, 3) uint8")
    h, w, _ = a.shape
    if h == 0 or w == 0:
        raise ValueError("encode_gif needs a non-empty image")
    flat = a.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"image has {len(palette)} distinct colors > 256; GIF needs "
            "a palettized image — quantize first")
    # GCT size: 2^(k+1) entries, smallest that fits
    k = 0
    while (2 << k) < len(palette):
        k += 1
    n_entries = 2 << k
    gct = np.zeros((n_entries, 3), dtype=np.uint8)
    gct[:len(palette)] = palette
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        idx = idx[_interlace_order(h)]
    min_code = max(2, k + 1)
    data = _lzw_encode(idx.reshape(-1), min_code)
    blocks = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    packed_lsd = 0x80 | (k << 4) | k           # GCT flag, color res, size
    packed_img = 0x40 if interlace else 0x00
    return (b"GIF89a" + struct.pack("<HHBBB", w, h, packed_lsd, 0, 0)
            + gct.tobytes()
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, packed_img)
            + bytes([min_code]) + bytes(blocks) + b"\x3b")


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first image of a GIF into an (h, w, 3) uint8 RGB array
    (composed onto the logical screen at its left/top offset; off-canvas
    pixels are the background color)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, bg, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    if sw == 0 or sh == 0:
        raise ValueError("GIF with an empty logical screen")
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:                              # trailer before image
            raise ValueError("GIF contains no image data")
        if b == 0x21:                              # extension: skip blocks
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            pos += 1                               # label
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension")
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, flags = struct.unpack("<HHHHB",
                                               payload[pos:pos + 9])
        pos += 9
        ct = gct
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            if pos + n * 3 > len(payload):
                raise ValueError("truncated GIF local color table")
            ct = np.frombuffer(payload, np.uint8, n * 3,
                               pos).reshape(-1, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image has no color table")
        if w == 0 or h == 0:
            raise ValueError("GIF image with zero dimensions")
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF data sub-blocks")
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            data += payload[pos:pos + sz]
            pos += sz
        idx = _lzw_decode(bytes(data), min_code, w * h).reshape(h, w)
        if flags & 0x40:                           # de-interlace
            order = _interlace_order(h)
            full = np.empty_like(idx)
            full[order] = idx
            idx = full
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index outside the color table")
        img = ct[idx]
        if (left, top, w, h) == (0, 0, sw, sh):
            return img.copy()
        out = np.zeros((sh, sw, 3), dtype=np.uint8)
        if gct is not None and bg < len(gct):
            out[:, :] = gct[bg]
        y1 = min(top + h, sh)
        x1 = min(left + w, sw)
        out[top:y1, left:x1] = img[:y1 - top, :x1 - left]
        return out
    raise ValueError("GIF stream ended without a trailer or image")


# ---------------------------------------------------------------------------
# TIFF-variant LZW (compression 5) — the same algorithm with MSB-first
# bit packing and the TIFF 6.0 "early change" width rule (the code
# width grows one code EARLIER than GIF: at table size 511/1023/2047).
# Kept here beside the GIF core so the two variants stay in one place.
# Ref behavior: TIFF 6.0 §13; reference repo has no TIFF path (decode
# happens engine-side there) — this is a from-scratch implementation.
# ---------------------------------------------------------------------------

_TIFF_CLEAR = 256
_TIFF_EOI = 257


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF LZW encoder: 8-bit symbols, ClearCode 256 / EOI 257,
    MSB-first packing, early-change width bumps, table cleared at
    entry 4094 (so no 12-bit code ever needs early-change to 13)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int):
        nonlocal acc, nbits
        acc = (acc << size) | code
        nbits += size
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    code_size = 9
    table: dict[tuple[int, int], int] = {}
    next_code = _TIFF_EOI + 1
    emit(_TIFF_CLEAR, code_size)
    it = iter(data)
    try:
        cur = next(it)
    except StopIteration:
        emit(_TIFF_EOI, code_size)
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)
    for k in it:
        key = (cur, k)
        if key in table:
            cur = table[key]
            continue
        emit(cur, code_size)
        table[key] = next_code
        next_code += 1
        # early change: the encoder bumps when the NEXT code to add
        # reaches 2^size (GIF waits one more); clear at 4094
        if next_code == 4094:
            emit(_TIFF_CLEAR, code_size)
            table.clear()
            code_size = 9
            next_code = _TIFF_EOI + 1
        elif next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        cur = k
    emit(cur, code_size)
    emit(_TIFF_EOI, code_size)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode_tiff(data: bytes, n_bytes: int) -> bytes:
    """TIFF LZW decoder, mirror of :func:`_lzw_encode_tiff` — the
    decoder lags the encoder by one table entry, so its early-change
    threshold is 2^size - 1 (511/1023/2047)."""
    base = {i: bytes([i]) for i in range(256)}
    table = dict(base)
    code_size = 9
    next_code = _TIFF_EOI + 1
    out = bytearray()
    prev: int | None = None
    acc = 0
    nbits = 0
    at = 0
    n = len(data)
    while len(out) < n_bytes:
        while nbits < code_size:
            if at >= n:
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[at]
            at += 1
            nbits += 8
        code = (acc >> (nbits - code_size)) & ((1 << code_size) - 1)
        nbits -= code_size
        acc &= (1 << nbits) - 1
        if code == _TIFF_CLEAR:
            table = dict(base)
            code_size = 9
            next_code = _TIFF_EOI + 1
            prev = None
            continue
        if code == _TIFF_EOI:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError(
                    "TIFF LZW stream starts with unknown code")
        elif code in table:
            entry = table[code]
        elif code == next_code:              # the KwKwK case
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError("corrupt TIFF LZW code")
        out += entry
        if prev is not None and next_code < 4094:
            table[next_code] = table[prev] + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) - 1 and code_size < 12:
                code_size += 1
        prev = code
    if len(out) < n_bytes:
        raise ValueError("TIFF LZW data ends before the strip is full")
    return bytes(out[:n_bytes])
