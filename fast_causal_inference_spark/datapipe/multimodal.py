"""Multimodal (image/audio/video) column plumbing.

Modality payloads are opaque ``binary`` columns plus a typed metadata struct;
all heavy per-item work (decode, resize, feature-extract, frame-sample) runs
as Arrow-batched ``mapInPandas`` so executors stream fixed-size batches
instead of materializing whole partitions.

Decode support is two-tier:

* **Self-contained formats decode for real, in pure Python/numpy** — BMP
  (24-bit BITMAPINFOHEADER), PPM (binary P6), PNG (stdlib ``zlib``
  inflate + scanline unfilter, all five filters, all five color types,
  every legal bit depth 1/2/4/8/16, Adam7 interlace), GIF (own
  variable-width LZW, ``datapipe/gif.py``), baseline AND progressive
  JPEG (own Huffman + IDCT
  implementation in ``datapipe/jpeg.py``, 4:4:4/4:2:0/grayscale, DRI
  restarts), PCM WAV (stdlib ``wave``), and **FLAC** (own Rice/LPC
  decoder in ``datapipe/flac.py`` with CRC-8/16 + MD5 verification —
  FLAC's entropy layer is mathematically defined rather than
  table-driven, and losslessness makes round-trip equality a complete
  validation, so it clears the bar lossy codecs cannot).  Image/audio
  stats, resize, embeddings, and MFCC-style features below run on
  actual pixel/sample arrays for these formats.  Round 9 adds **IMA
  and Microsoft ADPCM** (WAV format codes 0x11/0x02 — deterministic
  integer state machines in ``datapipe/adpcm.py``, validated by
  hand-computed step-table fixtures, byte-pinned goldens and exact
  encoder-reconstruction equality), so telephony/game-audio WAVs
  decode for real too.  Round 11 extends G.711 µ-law/A-law companding
  to the AIFC framing (compression types ``ulaw``/``alaw`` and the
  QuickTime uppercase variants) — the same ITU expansion tables the
  WAV format-6/7 and AU encoding-1/27 paths already validate.
* **Lossy DSP/entropy-coded audio/video (MP3/MP4-AAC/Ogg-Vorbis/Opus
  and video codecs) is explicitly OUT OF SCOPE for in-container
  decode** — a deliberate round-6 decision, not an implicit promise:
  these formats need codec libraries (PIL/cv2/ffmpeg) this container
  does not ship, and a hand-written entropy decoder (e.g. MP3
  Layer-III Huffman tables) cannot be validated here without reference
  vectors, so shipping one would risk silently-wrong samples.  Every decode-path function
  therefore defaults to ``strict=True``: an unsupported codec payload
  raises ``NotImplementedError`` naming the missing library.  Passing
  ``strict=False`` is an explicit opt-in to a deterministic
  content-seeded fake (for exercising the Spark-side plumbing — schema,
  partitioning, batch shape — end-to-end); fallback rows are marked
  ``decoded = false`` wherever features are emitted, so a downstream
  pipeline can filter honestly.  On a real cluster, plug a codec
  library into the same ``mapInPandas`` bodies.

**Native-codec injection seam (round 9):** every featurize stage
(``image_stats`` / ``image_features`` / ``image_resize`` /
``audio_stats`` / ``audio_features``) accepts ``decode_fn`` — a
callable with the same signature as ``decode_image`` /
``decode_audio`` that replaces the pure-Python decoders inside the
``mapInPandas`` body.  The in-container implementations are the
validated REFERENCE tier; at production scale inject
libjpeg-turbo/libwebp/ffmpeg wrappers through this hook (~10-100x
per-byte headroom) without forking the pipeline — schema,
partitioning, batching and error contracts stay identical.

For compressed formats the pipeline-relevant METADATA (duration,
bitrate, sample rate, track layout, image dimensions) needs no decode
at all: ``datapipe/mediaprobe.py`` parses MP3 framing (frame sync,
Xing), ISO-BMFF boxes, WAV chunks and image headers for real — that is
the operation a 100 TB corpus runs on every object, with decode
reserved for the filtered survivors.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fast_causal_inference_spark.datapipe.adpcm import (
    decode_adpcm_wav_data,
    decode_ima4_packets,
    encode_ima4_packets,
)
from fast_causal_inference_spark.datapipe.flac import (
    decode_flac,
    decode_ogg_flac,
    encode_flac,
    ogg_packets,
)
from fast_causal_inference_spark.datapipe.gif import (
    _lzw_decode_tiff,
    _lzw_encode_tiff,
    decode_gif,
    encode_gif,
)
from fast_causal_inference_spark.datapipe.jpeg import decode_jpeg, encode_jpeg
from fast_causal_inference_spark.datapipe.mediaprobe import (
    _AU_ENCODINGS,
    _f80_to_float,
    _float_to_f80,
)
from fast_causal_inference_spark.datapipe.vp8l import (
    decode_webp,
    encode_webp_lossless,
)
from fast_causal_inference_spark.serialization import ensure_udf_serializable

# every exception a corrupt/truncated payload can raise out of the pure-
# Python codecs: struct/ValueError from header parsing, zlib.error from a
# bad IDAT, KeyError from a JPEG scan referencing a missing DQT/DHT table,
# IndexError from truncated entropy data, EOFError/wave.Error from WAV.
# NotImplementedError stays first-class: it means "format needs an external
# library", which strict mode reports differently from corrupt data.
import zlib as _zlib

DECODE_ERRORS = (NotImplementedError, ValueError, struct.error, KeyError,
                 IndexError, EOFError, OverflowError, _zlib.error,
                 wave.Error)


# ---------------------------------------------------------------------------
# pure-Python codecs for uncompressed formats
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp expects (h, w, 3) uint8")
    h, w, _ = a.shape
    row_size = (3 * w + 3) & ~3                      # rows pad to 4 bytes
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_size - 3 * w)
    for y in range(h - 1, -1, -1):                   # bottom-up
        rows.append(a[y, :, ::-1].tobytes() + pad)   # BGR
    return header + info + b"".join(rows)


def encode_bmp8(idx: np.ndarray, palette: np.ndarray,
                rle: bool = False) -> bytes:
    """Encode an (h, w) uint8 index raster + (n, 3) RGB palette as an
    8-bit BMP — uncompressed (BI_RGB) or run-length (BI_RLE8: per-row
    encoded runs + end-of-line, final end-of-bitmap)."""
    a = np.asarray(idx, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = a.shape
    nc = len(pal)
    pal_bytes = b"".join(bytes([int(b), int(g), int(r), 0])
                         for r, g, b in pal)
    if rle:
        body = bytearray()
        for y in range(h - 1, -1, -1):               # bottom-up
            row = a[y]
            x = 0
            while x < w:
                run = 1
                while x + run < w and run < 255 and row[x + run] == row[x]:
                    run += 1
                body += bytes([run, int(row[x])])
                x += run
            body += b"\x00\x00"                      # end of line
        body += b"\x00\x01"                          # end of bitmap
        comp, data = 1, bytes(body)
    else:
        row_size = (w + 3) & ~3
        pad = b"\x00" * (row_size - w)
        comp = 0
        data = b"".join(a[y].tobytes() + pad
                        for y in range(h - 1, -1, -1))
    off = 54 + len(pal_bytes)
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, comp, len(data),
                       2835, 2835, nc, 0)
    return header + info + pal_bytes + data


def _bmp_rle8_decode(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8 -> (h, w) bottom-up index raster (row 0 = bottom)."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n:
        c, v = data[i], data[i + 1]
        i += 2
        if c:                                        # encoded run
            end = min(x + c, w)
            if y < h:
                out[y, x:end] = v
            x = end
        elif v == 0:                                 # end of line
            x, y = 0, y + 1
        elif v == 1:                                 # end of bitmap
            break
        elif v == 2:                                 # delta jump
            if i + 1 >= n:
                raise ValueError("BMP: truncated RLE8 delta")
            x += data[i]
            y += data[i + 1]
            i += 2
        else:                                        # absolute mode
            if i + v > n:
                raise ValueError("BMP: truncated RLE8 absolute run")
            end = min(x + v, w)
            if y < h:
                out[y, x:end] = np.frombuffer(data, np.uint8, end - x, i)
            x += v
            i += v + (v & 1)                         # word-aligned
    return out


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a BMP into an (h, w, 3) uint8 RGB array — 24/32-bit
    uncompressed or 8-bit palette (uncompressed and BI_RLE8)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    flip = h > 0
    h = abs(h)
    if bpp in (24, 32) and compression == 0:
        ch = bpp // 8
        row_size = (ch * w + 3) & ~3
        out = np.empty((h, w, 3), dtype=np.uint8)
        for i in range(h):
            row = np.frombuffer(payload, dtype=np.uint8,
                                count=ch * w, offset=offset + i * row_size)
            y = h - 1 - i if flip else i
            out[y] = row.reshape(w, ch)[:, 2::-1]    # BGR(A) -> RGB
        return out
    if bpp == 8 and compression in (0, 1):
        clr_used = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_at = 14 + hdr_size
        pal = np.frombuffer(payload, np.uint8, clr_used * 4,
                            pal_at).reshape(-1, 4)[:, 2::-1]  # BGRx->RGB
        if compression == 1:                         # BI_RLE8
            idx_bu = _bmp_rle8_decode(payload[offset:], w, h)
            idx = idx_bu[::-1] if flip else idx_bu
        else:
            row_size = (w + 3) & ~3
            idx = np.empty((h, w), dtype=np.uint8)
            for i in range(h):
                y = h - 1 - i if flip else i
                idx[y] = np.frombuffer(payload, np.uint8, w,
                                       offset + i * row_size)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("BMP: palette index out of range")
        return np.ascontiguousarray(pal[idx])
    raise NotImplementedError(
        f"BMP bpp={bpp} compression={compression} not supported "
        "(24/32-bit BI_RGB and 8-bit BI_RGB/BI_RLE8 decode in-container)")


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a binary PPM (P6)."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) into an (h, w, 3) uint8 RGB array."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: magic, whitespace-separated width/height/maxval (comments #..)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                          # single ws after maxval
    w, h, maxval = fields
    if maxval == 255:
        return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3,
                             offset=pos).reshape(h, w, 3).copy()
    if not 0 < maxval < 65536:
        raise ValueError(f"PPM: invalid maxval {maxval}")
    # spec: maxval < 256 -> 1 byte/sample, else 2 bytes MSB-first;
    # rescale to 8-bit with round-half-up (round(v*255/maxval))
    if maxval < 256:
        v = np.frombuffer(payload, np.uint8, h * w * 3, pos)
    else:
        v = np.frombuffer(payload, ">u2", h * w * 3, pos)
    v = ((v.astype(np.uint32) * 255 + maxval // 2) // maxval)
    return v.astype(np.uint8).reshape(h, w, 3).copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def encode_png(arr: np.ndarray, bit_depth: int = 8,
               interlace: bool = False) -> bytes:
    """Encode an (h, w, 3) RGB array as a truecolor PNG (filter 0
    scanlines, one zlib IDAT).  ``bit_depth``: 8 (uint8 input) or 16
    (uint16 input, big-endian samples per the spec).  ``interlace``
    writes the seven Adam7 passes (fixture path for the decoder's
    interlace support)."""
    import zlib

    if bit_depth not in (8, 16):
        raise ValueError("bit_depth must be 8 or 16")
    dt = np.uint8 if bit_depth == 8 else np.uint16
    a = np.asarray(arr, dtype=dt)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_png expects (h, w, 3)")
    h, w, _ = a.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    def rows(img: np.ndarray) -> bytes:
        if bit_depth == 16:
            img = img.astype(">u2")
        return b"".join(b"\x00" + img[y].tobytes()
                        for y in range(img.shape[0]))

    if interlace:
        raw = b"".join(
            rows(a[y0::dy, x0::dx]) for x0, y0, dx, dy in _ADAM7
            if a[y0::dy, x0::dx].size)
    else:
        raw = rows(a)
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, 2, 0, 0,
                       1 if interlace else 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the five PNG scanline filters → (h, stride) uint8.

    Up (2) and Sub (1) vectorize (Sub is a per-channel cumsum mod 256);
    Average/Paeth fall back to a per-byte loop — correct first, and codec
    work is per-row Arrow-batched anyway."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int64)
        pos += stride
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:                                  # Up
            cur = line + prev
        elif ft == 1:                                  # Sub = cumsum per lane
            lanes = line.reshape(-1, bpp)
            cur = np.cumsum(lanes, axis=0).reshape(-1)
        elif ft in (3, 4):                             # Average / Paeth
            cur = np.empty(stride, np.int64)
            for x in range(stride):
                a = int(cur[x - bpp]) & 0xFF if x >= bpp else 0
                b = int(prev[x])
                if ft == 3:
                    cur[x] = line[x] + ((a + b) >> 1)
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = line[x] + pr
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = (cur & 0xFF).astype(np.uint8)
    return out


def _png_subimage(raw: bytes, pos: int, w: int, h: int, channels: int,
                  depth: int) -> tuple[np.ndarray, int]:
    """Unfilter + unpack one (sub-)image of ``w × h`` pixels starting at
    byte ``pos`` of the decompressed stream → ((h, w, channels) uint16,
    next pos).  Filters operate on BYTES with bpp = the byte width of
    one pixel (minimum 1 for sub-byte depths), per the spec."""
    bits_pp = channels * depth
    stride = (w * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)
    need = h * (stride + 1)
    if pos + need > len(raw):
        raise ValueError("PNG IDAT size mismatch")
    rows = _png_unfilter(raw[pos:pos + need], h, stride, bpp)
    pos += need
    if depth == 8:
        px = rows[:, :w * channels].astype(np.uint16)
    elif depth == 16:
        px = ((rows[:, 0::2].astype(np.uint16) << 8)
              | rows[:, 1::2])[:, :w * channels]
    else:                                              # 1 / 2 / 4
        bits = np.unpackbits(rows, axis=1)
        vals = np.zeros((h, bits.shape[1] // depth), dtype=np.uint16)
        for k in range(depth):
            vals = (vals << 1) | bits[:, k::depth]
        px = vals[:, :w * channels]
    return px.reshape(h, w, channels), pos


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG into an (h, w, 3) uint8 RGB array — pure stdlib
    ``zlib`` + numpy, no PIL.

    Supports every legal bit depth (1/2/4/8/16 — 16-bit samples map to
    8 via the high byte) in all five color types (gray, RGB, palette,
    gray+alpha, RGBA — alpha is dropped, palette mapped through PLTE),
    all five scanline filters, and Adam7 interlace (seven independently
    filtered passes reassembled onto the pixel grid).
    """
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    ihdr = None
    plte = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length                             # skip CRC
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
             4: (8, 16), 6: (8, 16)}
    if ctype not in legal:
        raise ValueError(f"invalid PNG color type {ctype}")
    if depth not in legal[ctype]:
        raise ValueError(f"invalid PNG depth {depth} for color type "
                         f"{ctype}")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if w == 0 or h == 0:
        raise ValueError("PNG with zero dimensions")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(bytes(idat))
    if interlace:
        px = np.zeros((h, w, channels), dtype=np.uint16)
        at = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub, at = _png_subimage(raw, at, pw, ph, channels, depth)
            px[y0::dy, x0::dx] = sub
    else:
        px, at = _png_subimage(raw, 0, w, h, channels, depth)
    if at != len(raw):
        raise ValueError("PNG IDAT size mismatch")
    if ctype == 3:                                     # palette indices
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[idx]
    if depth == 16:
        px8 = (px >> 8).astype(np.uint8)
    elif depth == 8:
        px8 = px.astype(np.uint8)
    else:                                              # gray 1/2/4
        px8 = (px * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if ctype == 2:
        return px8.copy()
    if ctype == 6:
        return px8[:, :, :3].copy()
    if ctype == 0:
        return np.repeat(px8, 3, axis=2)
    return np.repeat(px8[:, :, :1], 3, axis=2)         # gray + alpha


def _packbits_decode(data: bytes, expect: int) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expect:
        c = data[i]
        i += 1
        if c < 128:                        # literal run of c+1 bytes
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:                      # repeat next byte 257-c times
            if i >= n:
                raise ValueError("TIFF: truncated PackBits run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op per spec
    if len(out) < expect:
        raise ValueError("TIFF: PackBits output short of strip size")
    return bytes(out[:expect])


def _packbits_encode(data: bytes) -> bytes:
    """PackBits encoder (repeat runs >= 3 bytes, literals otherwise)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def encode_tiff(arr: np.ndarray, packbits: bool = False,
                lzw: bool = False, predictor: bool = False,
                planar: bool = False, deflate: bool = False,
                tile: tuple[int, int] | None = None) -> bytes:
    """Encode (h, w, 3) RGB (or (h, w) grayscale) as a little-endian
    TIFF — uncompressed, PackBits, LZW (compression 5), or Adobe
    Deflate (compression 8, stdlib zlib), optionally with
    horizontal-differencing predictor 2; ``planar=True`` writes
    PlanarConfiguration 2 (one strip/tile set per sample plane).

    Round 11: a ``uint16`` input writes BitsPerSample 16 (predictor
    differencing mod 65536), and ``tile=(tile_length, tile_width)``
    writes the TILED layout (tags 322/323/324/325, edge tiles
    zero-padded to full tile size, predictor per tile row — each tile
    compresses as an independent image, per the TIFF 6.0 spec)."""
    a = np.asarray(arr)
    if a.dtype == np.uint16:
        bits = 16
    else:
        a = a.astype(np.uint8)
        bits = 8
    mask = (1 << bits) - 1
    gray = a.ndim == 2
    h, w = a.shape[:2]
    spp = 1 if gray else 3
    planar = planar and spp > 1
    if lzw:
        comp, compress = 5, _lzw_encode_tiff
    elif deflate:
        import zlib

        comp, compress = 8, zlib.compress
    elif packbits:
        comp, compress = 32773, _packbits_encode
    else:
        comp, compress = 1, bytes
    a3 = a.reshape(h, w, spp)
    planes = [a3[:, :, c:c + 1] for c in range(spp)] if planar else [a3]
    strip_spp = 1 if planar else spp
    if tile:
        tl, tw = int(tile[0]), int(tile[1])
        if tl <= 0 or tw <= 0:
            raise ValueError("tile dims must be positive")
        chunks = []
        for p in planes:
            for ty in range(0, h, tl):
                for tx in range(0, w, tw):
                    t = np.zeros((tl, tw, strip_spp), a.dtype)
                    sub = p[ty:ty + tl, tx:tx + tw, :]
                    t[:sub.shape[0], :sub.shape[1], :] = sub
                    chunks.append(t)
    else:
        chunks = planes
    if predictor:
        diffed = []
        for c in chunks:
            d = c.astype(np.int64)
            d[:, 1:, :] = (d[:, 1:, :] - d[:, :-1, :]) & mask
            diffed.append(d.astype(a.dtype))
        chunks = diffed
    dt = "<u2" if bits == 16 else np.uint8
    strips = [compress(np.ascontiguousarray(c).astype(dt).tobytes())
              for c in chunks]
    # IFD after the 8-byte header; strip/tile data after the IFD
    tags = [
        (256, 3, 1, w), (257, 3, 1, h),
        (259, 3, 1, comp),
        (262, 3, 1, 1 if gray else 2),     # BlackIsZero / RGB
        (277, 3, 1, spp),
    ]
    if tile:
        tags += [(322, 3, 1, tw), (323, 3, 1, tl)]
        off_tag, cnt_tag = 324, 325
    else:
        tags.append((278, 3, 1, h))        # rows per strip
        off_tag, cnt_tag = 273, 279
    if predictor:
        tags.append((317, 3, 1, 2))
    if planar:
        tags.append((284, 3, 1, 2))
    # out-of-line value areas: BitsPerSample (RGB), strip/tile offset /
    # byte-count arrays
    n_tags = len(tags) + 3                 # + BitsPerSample + offs/cnts
    ifd_at = 8
    ifd_size = 2 + 12 * n_tags + 4
    extra_at = ifd_at + ifd_size
    extra = b""
    if gray:
        tags.append((258, 3, 1, bits))
    else:
        tags.append((258, 3, 3, extra_at))
        extra = struct.pack("<HHH", bits, bits, bits) + b"\x00" * 2
    ns = len(strips)
    counts = [len(s) for s in strips]
    if ns == 1:
        data_at = extra_at + len(extra)
        tags.append((off_tag, 4, 1, data_at))
        tags.append((cnt_tag, 4, 1, counts[0]))
    else:
        # two LONG arrays out-of-line, then the chunk data
        arr_at = extra_at + len(extra)
        data_at = arr_at + 8 * ns
        offs = []
        at = data_at
        for c in counts:
            offs.append(at)
            at += c
        tags.append((off_tag, 4, ns, arr_at))
        tags.append((cnt_tag, 4, ns, arr_at + 4 * ns))
        extra += struct.pack(f"<{ns}I", *offs)
        extra += struct.pack(f"<{ns}I", *counts)
    tags.sort()
    out = struct.pack("<2sHI", b"II", 42, ifd_at)
    out += struct.pack("<H", n_tags)
    for tag, typ, cnt, val in tags:
        out += struct.pack("<HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += struct.pack("<I", 0)            # no next IFD
    return out + extra + b"".join(strips)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode a baseline TIFF (both byte orders; uncompressed,
    PackBits, LZW, or Adobe/legacy Deflate with optional
    horizontal-differencing predictor 2; 8- or 16-bit grayscale / RGB,
    8-bit palette; chunky or planar; multi-strip OR tiled — round 11)
    into an (h, w, 3) uint8 RGB array (16-bit samples reduce via >>8,
    the PNG-16 convention).  JPEG-in-TIFF and other compressions raise
    ``NotImplementedError``."""
    if payload[:4] == b"II\x2a\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00\x2a":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_at,) = struct.unpack_from(f"{bo}I", payload, 4)
    if ifd_at + 2 > len(payload):
        raise ValueError("TIFF: IFD offset out of range")
    (n_tags,) = struct.unpack_from(f"{bo}H", payload, ifd_at)
    tags: dict[int, tuple[int, int, int, int]] = {}
    for i in range(n_tags):
        at = ifd_at + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(f"{bo}HHI", payload, at)
        (val,) = struct.unpack_from(f"{bo}I", payload, at + 8)
        tags[tag] = (typ, cnt, val, at + 8)   # inline-value offset

    def values(tag, default=None):
        if tag not in tags:
            return default
        typ, cnt, val, inline_at = tags[tag]
        width = {1: 1, 3: 2, 4: 4}.get(typ)
        if width is None:
            raise NotImplementedError(f"TIFF tag type {typ}")
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        at = inline_at if cnt * width <= 4 else val
        return list(struct.unpack_from(f"{bo}{cnt}{fmt}", payload, at))

    def one(tag, default=None):
        v = values(tag)
        return v[0] if v else default

    w = one(256)
    h = one(257)
    if not w or not h:
        raise ValueError("TIFF: missing dimensions")
    comp = one(259, 1)
    photo = one(262, 1)
    spp = one(277, 1)
    bps = values(258, [8])
    bits = bps[0]
    if bits not in (8, 16) or any(b != bits for b in bps):
        raise NotImplementedError(
            "only uniform 8- or 16-bit TIFF samples supported")
    if comp not in (1, 5, 8, 32946, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} needs a codec library "
            "(uncompressed, LZW, Deflate and PackBits decode "
            "in-container)")
    pred = one(317, 1)
    if pred not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {pred} not supported (1 and 2 are)")
    planar = one(284, 1)
    if planar not in (1, 2):
        raise ValueError(f"TIFF: invalid PlanarConfiguration {planar}")
    # PlanarConfiguration 2: one set of strips/tiles PER SAMPLE PLANE,
    # each holding 1 sample/pixel; reassembled by plane transpose
    strip_spp = 1 if (planar == 2 and spp > 1) else spp
    bpb = bits // 8
    mask = (1 << bits) - 1
    dt = np.uint8 if bits == 8 else np.dtype(f"{bo}u2")

    def _expand(chunk: bytes, expect_bytes: int) -> bytes:
        if comp == 32773:
            return _packbits_decode(chunk, expect_bytes)
        if comp == 5:
            return _lzw_decode_tiff(chunk, expect_bytes)
        if comp in (8, 32946):               # Adobe / legacy Deflate
            import zlib

            d = zlib.decompress(chunk)
            if len(d) < expect_bytes:
                raise ValueError("TIFF: deflate strip short of rows")
            return d[:expect_bytes]
        if len(chunk) < expect_bytes:
            raise ValueError("TIFF: strip short of row data")
        return chunk[:expect_bytes]

    tw = one(322)
    if tw:                                 # TILED layout (round 11)
        tl = one(323)
        offsets = values(324)
        counts = values(325)
        if not tl or not offsets or not counts \
                or len(offsets) != len(counts):
            raise ValueError("TIFF: missing tile layout")
        ta, td = -(-w // tw), -(-h // tl)
        nplanes = spp if strip_spp == 1 and spp > 1 else 1
        if len(offsets) != ta * td * nplanes:
            raise ValueError("TIFF: tile count mismatch")
        out16 = np.zeros((h, w, spp), np.int64)
        idx = 0
        for p in range(nplanes):
            for ty in range(td):
                for tx in range(ta):
                    off, cnt = offsets[idx], counts[idx]
                    idx += 1
                    buf = _expand(payload[off:off + cnt],
                                  tl * tw * strip_spp * bpb)
                    t = np.frombuffer(buf, dt).reshape(tl, tw,
                                                       strip_spp)
                    if pred == 2:
                        # predictor restarts at every tile's left edge
                        # (tiles compress as independent images)
                        t = np.cumsum(t.astype(np.int64), axis=1) & mask
                    ys, xs = ty * tl, tx * tw
                    sub = t[:min(tl, h - ys), :min(tw, w - xs), :]
                    if nplanes > 1:
                        out16[ys:ys + sub.shape[0],
                              xs:xs + sub.shape[1], p] = sub[:, :, 0]
                    else:
                        out16[ys:ys + sub.shape[0],
                              xs:xs + sub.shape[1], :] = sub
        a = out16.reshape(-1)
    else:
        offsets = values(273)
        counts = values(279)
        rps = one(278, h)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing strip layout")
        rows_done = 0
        raw = bytearray()
        for off, cnt in zip(offsets, counts):
            rows = min(rps, h - rows_done)
            raw += _expand(payload[off:off + cnt],
                           rows * w * strip_spp * bpb)
            rows_done += rows
            if rows_done >= h:
                rows_done = 0              # next plane (planar == 2)
        a = np.frombuffer(bytes(raw), dt, h * w * spp).astype(np.int64)
        if planar == 2 and spp > 1:
            a = np.ascontiguousarray(
                a.reshape(spp, h, w).transpose(1, 2, 0)).reshape(-1)
        if pred == 2:
            # undo horizontal differencing: per-channel cumsum along x
            # (strips hold whole rows, so whole-image cumsum is exact)
            d = a.reshape(h, w, spp)
            a = (np.cumsum(d, axis=1) & mask).reshape(-1)
    if bits == 16:
        a = a >> 8                         # same reduction as PNG-16
    a = a.astype(np.uint8)
    if spp == 3:
        rgb = a.reshape(h, w, 3)
        if photo != 2:
            raise ValueError("TIFF: 3-sample image must be RGB")
        return rgb.copy()
    g = a.reshape(h, w)
    if photo == 3:                         # palette
        cmap = values(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("TIFF: palette image missing ColorMap")
        cm = np.asarray(cmap[:3 * 256], np.uint32).reshape(3, 256)
        cm8 = (cm >> 8).astype(np.uint8)   # 16-bit entries -> 8-bit
        return np.stack([cm8[0][g], cm8[1][g], cm8[2][g]], axis=-1)
    if photo == 0:                         # white is zero
        g = 255 - g
    return np.repeat(g[:, :, None], 3, axis=2)


def decode_image(payload: bytes) -> np.ndarray:
    """Decode BMP, PPM, PNG, GIF, JPEG (baseline AND progressive),
    **lossless WebP (VP8L)**, or **baseline TIFF (uncompressed /
    PackBits, both byte orders — round 9)** payloads for real (pure
    Python/numpy codecs — GIF via the own-LZW decoder in
    ``datapipe/gif.py``, JPEG via ``datapipe/jpeg.py``, VP8L via
    ``datapipe/vp8l.py``); raise for formats that need external
    libraries (lossy VP8/...).  Always returns (h, w, 3) uint8 RGB;
    WebP alpha composites over black like the PNG path."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        return decode_tiff(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        rgba = decode_webp(payload)
        rgb = rgba[:, :, :3].astype(np.uint16)
        alpha = rgba[:, :, 3:].astype(np.uint16)
        return ((rgb * alpha + 127) // 255).astype(np.uint8)
    raise NotImplementedError(
        "only BMP/PPM/PNG/GIF/JPEG/VP8L-WebP decode in-container; "
        "other formats need PIL/cv2")


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode an int16 mono sample array as a PCM WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def _mulaw_table() -> np.ndarray:
    """ITU-T G.711 µ-law code → linear int16 expansion (exact closed
    form: x = sign · ((2·mantissa + 33) << exponent − 33·4 ... rendered
    as the classic (m << 3 | 0x84) << e − 0x84 formula over the
    bit-inverted code)."""
    codes = np.arange(256, dtype=np.int64) ^ 0xFF   # codes transmit inverted
    sign = np.where(codes & 0x80, -1, 1)
    exp = (codes >> 4) & 0x07
    mant = codes & 0x0F
    mag = (((mant << 3) | 0x84) << exp) - 0x84
    return (sign * mag).astype(np.int16)


def _alaw_table() -> np.ndarray:
    """ITU-T G.711 A-law code → linear int16 (the classic Sun
    ``alaw2linear``: even bits inverted, and — unlike µ-law — a SET
    sign bit means POSITIVE; segment-0/1 magnitudes are already at the
    16-bit scale, max ±32256)."""
    codes = np.arange(256, dtype=np.int64) ^ 0x55   # even bits inverted
    sign = np.where(codes & 0x80, 1, -1)
    exp = (codes >> 4) & 0x07
    mant = codes & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 0x8,
                   ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return (sign * mag).astype(np.int16)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV into (int16 mono samples, sample_rate).

    Covers the full common WAV surface by parsing the chunks directly
    (stdlib ``wave`` rejects float and extensible headers): PCM at
    8 (unsigned), 16, 24 and 32 bits, IEEE float32/float64, G.711
    µ-law and A-law (format codes 7/6 — the companding expansion is an
    exact closed-form table from the ITU-T G.711 spec, so telephony
    WAVs decode for real), and WAVE_FORMAT_EXTENSIBLE wrappers of all
    of them.  Samples normalize to the int16 scale (8-bit shifts up,
    24/32-bit take the high 16 bits, floats scale by 32767 with
    clipping) so downstream stats/MFCC see one dynamic range.

    Adaptive codecs decode for real too (round 9): IMA ADPCM (format
    code 0x11) and Microsoft ADPCM (0x02) run the pure-numpy
    block-vectorized state machines in ``datapipe/adpcm.py`` and trim
    to the ``fact`` chunk sample count.  Remaining unsupported codes
    raise ``NotImplementedError``.
    """
    if payload[:4] != b"RIFF":
        raise NotImplementedError(
            "only PCM WAV decode in-container; mp3/ogg need codec libraries")
    if len(payload) < 12 or payload[8:12] != b"WAVE":
        raise ValueError("corrupt WAV: missing WAVE form type")
    pos = 12
    fmt = None
    fmt_body = b""
    data = None
    fact_samples = None
    fmt_extensible = False
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt " and sz >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
            # WAVE_FORMAT_EXTENSIBLE: the real format is the first two
            # bytes of the 16-byte SubFormat GUID in the extension
            if fmt[0] == 0xFFFE and sz >= 40:
                fmt = (struct.unpack("<H", body[24:26])[0],) + fmt[1:]
                fmt_extensible = True
        elif cid == b"data":
            data = body
        elif cid == b"fact" and sz >= 4:
            fact_samples = struct.unpack("<I", body[:4])[0]
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("corrupt WAV: missing fmt or data chunk")
    code, ch, rate, _, block_align, bits = fmt
    if rate <= 0:
        # a corrupt rate-0 header would divide the mel filterbank by
        # zero downstream and emit garbage MFCCs marked decoded=True
        raise ValueError(f"corrupt WAV: non-positive sample rate {rate}")
    if ch <= 0:
        raise ValueError(f"corrupt WAV: non-positive channel count {ch}")
    if code == 1:                                  # integer PCM
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.int64)
        elif bits == 8:                            # unsigned by spec
            x = ((np.frombuffer(data, dtype=np.uint8).astype(np.int64)
                  - 128) << 8)
        elif bits == 24:
            b = np.frombuffer(data, dtype=np.uint8)
            b = b[:len(b) // 3 * 3].reshape(-1, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v & 0x800000, v - (1 << 24), v)
            x = v >> 8
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.int64) >> 16
        else:
            raise NotImplementedError(
                f"{bits}-bit PCM WAV not supported (8/16/24/32 are)")
    elif code == 3:                                # IEEE float
        if bits == 32:
            f = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            f = np.frombuffer(data, dtype="<f8")
        else:
            raise ValueError(f"invalid float WAV bit width {bits}")
        x = np.clip(np.nan_to_num(f) * 32767.0, -32768,
                    32767).astype(np.int64)
    elif code in (6, 7):                           # G.711 A-law / µ-law
        table = _alaw_table() if code == 6 else _mulaw_table()
        x = table[np.frombuffer(data, dtype=np.uint8)].astype(np.int64)
    elif code in (0x02, 0x11):                     # MS / IMA ADPCM
        if block_align <= 0:
            raise ValueError("corrupt ADPCM WAV: zero block align")
        x = decode_adpcm_wav_data(code, data, fmt_body, ch,
                                  block_align, fact_samples,
                                  extensible=fmt_extensible)
        x = x.astype(np.int64).reshape(-1)         # already interleaved
    else:
        raise NotImplementedError(
            f"WAV format code {code} needs a codec library "
            "(only PCM and IEEE float decode in-container)")
    x = x[:len(x) // ch * ch]
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x.astype(np.int16), rate


def encode_aiff(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Serialize int16 mono samples as an AIFF (FORM/AIFF, big-endian
    PCM, 80-bit extended-float sample rate)."""
    x = np.asarray(samples, dtype=">i2")
    comm = struct.pack(">hLh", 1, len(x), 16) + _float_to_f80(
        float(sample_rate))
    ssnd = struct.pack(">LL", 0, 0) + x.tobytes()
    body = b"AIFF" \
        + b"COMM" + struct.pack(">L", len(comm)) + comm \
        + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
    return b"FORM" + struct.pack(">L", len(body)) + body


def encode_aifc_ima4(samples: np.ndarray,
                     sample_rate: int = 16_000) -> bytes:
    """Serialize int16 mono samples as an AIFC container with Apple
    'ima4' compression (FORM/AIFC + FVER + COMM[ima4] + SSND of
    34-byte packets)."""
    x = np.asarray(samples, dtype=np.int16).reshape(-1)
    data, _ = encode_ima4_packets(x)
    name = b"\x07IMA 4:1"                     # pstring, already even
    comm = struct.pack(">hLh", 1, len(x), 16) \
        + _float_to_f80(float(sample_rate)) + b"ima4" + name
    fver = struct.pack(">L", 0xA2805140)      # AIFC version 1
    ssnd = struct.pack(">LL", 0, 0) + data
    body = b"AIFC" \
        + b"FVER" + struct.pack(">L", len(fver)) + fver \
        + b"COMM" + struct.pack(">L", len(comm)) + comm \
        + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd \
        + (b"\x00" if len(ssnd) % 2 else b"")
    return b"FORM" + struct.pack(">L", len(body)) + body


def _g711_nearest_codes(x: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Quantize int16 samples to G.711 codes by inverting the expansion
    table (nearest level by magnitude) — the compressor half both the
    AU and AIFC G.711 encoders share; samples already AT a table level
    round-trip exactly."""
    t = table.astype(np.int64)
    order = np.argsort(t)
    idx = np.searchsorted(t[order], np.asarray(x, np.int64))
    idx = np.clip(idx, 0, 255)
    lo = np.clip(idx - 1, 0, 255)
    pick = np.where(
        np.abs(t[order[lo]] - x) <= np.abs(t[order[idx]] - x), lo, idx)
    return order[pick].astype(np.uint8)


def encode_aifc_g711(samples: np.ndarray, sample_rate: int = 8_000,
                     law: str = "ulaw") -> bytes:
    """Serialize int16 mono samples as an AIFC container with G.711
    'ulaw' or 'alaw' compression (FORM/AIFC + FVER + COMM[ulaw|alaw] +
    SSND of one companded byte per sample).  Same ITU-T tables as the
    WAV format-6/7 and AU encoding-1/27 paths — AIFC only frames the
    codec differently (AIFF-C spec compression types; QuickTime writes
    the uppercase variants, which decode_aiff also accepts)."""
    if law not in ("ulaw", "alaw"):
        raise ValueError("law must be 'ulaw' or 'alaw'")
    x = np.asarray(samples, dtype=np.int16).reshape(-1)
    table = _mulaw_table() if law == "ulaw" else _alaw_table()
    data = _g711_nearest_codes(x, table).tobytes()
    name = b"\x09" + (b"ITU u-law" if law == "ulaw" else b"ITU A-law")
    # pstring: count 9 + 9 chars = 10 bytes, already even — no pad
    comm = struct.pack(">hLh", 1, len(x), 16) \
        + _float_to_f80(float(sample_rate)) + law.encode("ascii") + name
    fver = struct.pack(">L", 0xA2805140)      # AIFC version 1
    ssnd = struct.pack(">LL", 0, 0) + data
    body = b"AIFC" \
        + b"FVER" + struct.pack(">L", len(fver)) + fver \
        + b"COMM" + struct.pack(">L", len(comm)) + comm \
        + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd \
        + (b"\x00" if len(ssnd) % 2 else b"")
    return b"FORM" + struct.pack(">L", len(body)) + body


def decode_aiff(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode AIFF/AIFC — big-endian PCM 8/16/24/32, little-endian
    'sowt', Apple 'ima4' ADPCM, or G.711 'ulaw'/'alaw' ('ULAW'/'ALAW')
    — into (int16 mono samples, rate).  Remaining compressed AIFC
    codecs raise."""
    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF payload")
    is_aifc = payload[8:12] == b"AIFC"
    pos = 12
    comm = data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = struct.unpack(">L", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND" and len(body) >= 8:
            off = struct.unpack(">L", body[:4])[0]
            data = body[8 + off:]
        pos += 8 + sz + (sz & 1)
    if comm is None or data is None:
        raise ValueError("corrupt AIFF: missing COMM or SSND")
    ch, _n, bits = struct.unpack(">hLh", comm[:8])
    rate = int(round(_f80_to_float(comm[8:18])))
    if rate <= 0 or ch <= 0:
        raise ValueError("corrupt AIFF: bad rate/channels")
    if is_aifc and len(comm) >= 22:
        ctype = comm[18:22]
        if ctype == b"ima4":
            # Apple QuickTime IMA — 34-byte packets, same IMA state
            # machine as WAV DVI4 (adpcm.decode_ima4_packets)
            x = decode_ima4_packets(data, ch).astype(np.int64)
            x = x[:_n] if _n else x
            if ch > 1:
                x = x.mean(axis=1)
            return x.reshape(-1).astype(np.int16), rate
        if ctype in (b"ulaw", b"ULAW", b"alaw", b"ALAW"):
            # G.711 companded bytes — one per sample per channel
            table = _mulaw_table() if ctype in (b"ulaw", b"ULAW") \
                else _alaw_table()
            x = table[np.frombuffer(data, np.uint8)].astype(np.int64)
            x = x[:len(x) // ch * ch]
            if _n:
                x = x[:_n * ch]
            if ch > 1:
                x = x.reshape(-1, ch).mean(axis=1)
            return x.astype(np.int16), rate
        if ctype not in (b"NONE", b"sowt"):
            raise NotImplementedError(
                f"AIFC compression {ctype!r} needs a codec library")
        little = ctype == b"sowt"
    else:
        little = False
    bo = "<" if little else ">"
    if bits == 16:
        x = np.frombuffer(data, dtype=f"{bo}i2").astype(np.int64)
    elif bits == 8:                       # AIFF 8-bit is SIGNED
        x = np.frombuffer(data, dtype=np.int8).astype(np.int64) << 8
    elif bits == 24:
        b3 = np.frombuffer(data, dtype=np.uint8)
        b3 = b3[:len(b3) // 3 * 3].reshape(-1, 3).astype(np.int64)
        if little:
            v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
        else:
            v = b3[:, 2] | (b3[:, 1] << 8) | (b3[:, 0] << 16)
        x = np.where(v & 0x800000, v - (1 << 24), v) >> 8
    elif bits == 32:
        x = np.frombuffer(data, dtype=f"{bo}i4").astype(np.int64) >> 16
    else:
        raise NotImplementedError(f"{bits}-bit AIFF not supported")
    x = x[:len(x) // ch * ch]
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x.astype(np.int16), rate


def encode_au(samples: np.ndarray, sample_rate: int = 16_000,
              encoding: int = 3) -> bytes:
    """Serialize int16 mono samples as a Sun/NeXT AU file (big-endian;
    encoding 3 = linear PCM-16, 1 = G.711 mu-law, 27 = G.711 A-law via
    the same companding tables ``decode_wav`` uses)."""
    x = np.asarray(samples, dtype=np.int16)
    if encoding == 3:
        data = x.astype(">i2").tobytes()
    elif encoding in (1, 27):
        table = _mulaw_table() if encoding == 1 else _alaw_table()
        data = _g711_nearest_codes(x, table).tobytes()
    else:
        raise NotImplementedError("encode_au supports encodings 1, 3, 27")
    hdr = struct.pack(">4sLLLLL", b".snd", 24, len(data), encoding,
                      sample_rate, 1)
    return hdr + data


def decode_au(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a Sun/NeXT AU payload (mu-law/A-law/PCM 8-32/float)."""
    if payload[:4] != b".snd" or len(payload) < 24:
        raise ValueError("not an AU payload")
    off, size, enc, rate, ch = struct.unpack(">LLLLL", payload[4:24])
    if rate <= 0 or ch <= 0:
        raise ValueError("corrupt AU: bad rate/channels")
    data = payload[off:off + size if size != 0xFFFFFFFF else None]
    if enc == 1:
        x = _mulaw_table()[np.frombuffer(data, np.uint8)].astype(np.int64)
    elif enc == 27:
        x = _alaw_table()[np.frombuffer(data, np.uint8)].astype(np.int64)
    elif enc == 2:
        x = np.frombuffer(data, np.int8).astype(np.int64) << 8
    elif enc == 3:
        x = np.frombuffer(data, dtype=">i2").astype(np.int64)
    elif enc == 4:
        b3 = np.frombuffer(data, dtype=np.uint8)
        b3 = b3[:len(b3) // 3 * 3].reshape(-1, 3).astype(np.int64)
        v = b3[:, 2] | (b3[:, 1] << 8) | (b3[:, 0] << 16)
        x = np.where(v & 0x800000, v - (1 << 24), v) >> 8
    elif enc == 5:
        x = np.frombuffer(data, dtype=">i4").astype(np.int64) >> 16
    elif enc == 6:
        f = np.frombuffer(data, dtype=">f4").astype(np.float64)
        x = np.clip(np.nan_to_num(f) * 32767.0, -32768,
                    32767).astype(np.int64)
    elif enc == 7:
        f = np.frombuffer(data, dtype=">f8")
        x = np.clip(np.nan_to_num(f) * 32767.0, -32768,
                    32767).astype(np.int64)
    else:
        raise NotImplementedError(
            f"AU encoding {enc} "
            f"({_AU_ENCODINGS.get(enc, 'unknown')}) not supported")
    x = x[:len(x) // ch * ch]
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x.astype(np.int16), rate


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV, FLAC, Ogg-FLAC, **AIFF/AIFC or Sun AU**
    payload into (mono int samples, sample_rate).  FLAC decode is REAL and in-container (pure
    numpy, Rice/LPC/fixed prediction with CRC+MD5 verification —
    ``datapipe/flac.py``); Ogg-FLAC depacketizes the Ogg pages
    (CRC-checked) and feeds the same core.  Multi-channel payloads are
    mono-mixed the same way ``decode_wav`` mixes stereo WAV.
    MP3/Ogg-Vorbis/Opus/AAC still need external codec libraries and
    raise ``NotImplementedError`` (module docstring scope note)."""
    x = rate = None
    if payload[:4] == b"fLaC":
        x, rate = decode_flac(payload)
    elif payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
        return decode_aiff(payload)          # round 9: big-endian PCM
    elif payload[:4] == b".snd":
        return decode_au(payload)            # round 9: Sun/NeXT AU
    elif payload[:4] == b"OggS":
        # identify the first packet's codec before committing: Ogg is a
        # container — only the FLAC mapping decodes in-container
        first = next(iter(ogg_packets(payload)), b"")
        if first[:5] != b"\x7fFLAC":
            raise NotImplementedError(
                "only Ogg-FLAC decodes in-container; Ogg-Vorbis/Opus "
                "need codec libraries")
        x, rate = decode_ogg_flac(payload)
    if x is not None:
        if x.ndim > 1:
            x = x.mean(axis=1).astype(np.int64)
        return x, rate
    return decode_wav(payload)


MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),     # image | audio | video
    T.StructField("format", T.StringType()),         # jpeg | wav | mp4 | ...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
])


def attach_media_metadata(df: DataFrame, payload_col: str,
                          media_type: str, fmt: str) -> DataFrame:
    """Attach a typed metadata struct for an opaque binary payload column."""
    meta = F.struct(
        F.lit(media_type).alias("media_type"), F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"))
    return df.withColumn(f"{payload_col}_meta", meta)


def _fake_image_features(payload: bytes, n_features: int) -> np.ndarray:
    """Deterministic stand-in for codec-format embeddings (content-seeded)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n_features).astype(np.float32)


def _pool_embedding(img: np.ndarray, n_features: int) -> np.ndarray:
    """Real image embedding: grayscale mean-pool to a fixed grid, scaled to
    [0, 1] (the classic perceptual-hash feature map).  Always returns
    EXACTLY ``n_features`` values (the ceil-sqrt grid is truncated) so
    real-decode rows and codec-fallback rows share one vector width."""
    g = np.asarray(img, dtype=np.float64).mean(axis=2)
    side = max(int(math.ceil(n_features ** 0.5)), 1)
    h, w = g.shape
    ys = np.arange(side + 1) * h // side
    xs = np.arange(side + 1) * w // side
    out = np.empty(side * side, dtype=np.float32)
    for i in range(side):
        y0 = min(int(ys[i]), h - 1)
        y1 = max(int(ys[i + 1]), y0 + 1)
        for j in range(side):
            x0 = min(int(xs[j]), w - 1)
            x1 = max(int(xs[j + 1]), x0 + 1)
            out[i * side + j] = g[y0:y1, x0:x1].mean() / 255.0
    return out[:n_features]


def image_features(df: DataFrame, payload_col: str = "payload",
                   decode_fn=None,
                   n_features: int = 64, batch_size_hint: int = 256,
                   strict: bool = True) -> DataFrame:
    """Decode + feature-extract an image column → ``features array<float>``.

    BMP/PPM payloads decode for real (grayscale mean-pool embedding over
    actual pixels); codec formats raise under ``strict`` or fall back to a
    content-seeded fake (module docstring).
    """
    ensure_udf_serializable()
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("features",
                                               T.ArrayType(T.FloatType())),
                                 T.StructField("decoded", T.BooleanType())])
    cols = [f.name for f in df.schema.fields]

    _decode = decode_fn if decode_fn is not None else decode_image

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, dec = [], []
            for p in pdf[payload_col]:
                payload = bytes(p) if p is not None else b""
                try:
                    feats.append(
                        _pool_embedding(_decode(payload),
                                        n_features).tolist())
                    dec.append(True)
                except DECODE_ERRORS as e:
                    if strict:
                        # only UNSUPPORTED-codec errors get the PIL/cv2
                        # message; corrupt BMP/PPM payloads re-raise as-is
                        # (same contract as image_stats)
                        if isinstance(e, NotImplementedError):
                            raise NotImplementedError(
                                "non-BMP/PPM/PNG image decode requires "
                                "PIL/cv2 — not present in this "
                                "container") from e
                        raise
                    feats.append(_fake_image_features(
                        payload, n_features).tolist())
                    dec.append(False)
            pdf = pdf.copy()
            pdf["features"] = feats
            pdf["decoded"] = dec
            yield pdf[cols + ["features", "decoded"]]

    return df.mapInPandas(extract, out_schema)


def image_stats(df: DataFrame, payload_col: str = "payload",
                strict: bool = True, decode_fn=None) -> DataFrame:
    """Real decode statistics per image: ``width``, ``height``,
    ``mean_pixel`` (BMP/PPM in pure numpy; codec formats raise)."""
    ensure_udf_serializable()
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("width", T.IntegerType()),
                                 T.StructField("height", T.IntegerType()),
                                 T.StructField("mean_pixel", T.DoubleType())])
    cols = [f.name for f in df.schema.fields]

    _decode = decode_fn if decode_fn is not None else decode_image

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, ms = [], [], []
            for p in pdf[payload_col]:
                payload = bytes(p) if p is not None else b""
                try:
                    img = _decode(payload)
                    hs.append(int(img.shape[0]))
                    ws.append(int(img.shape[1]))
                    ms.append(float(img.astype(np.float64).mean()))
                except DECODE_ERRORS:
                    if strict:
                        raise
                    ws.append(None)
                    hs.append(None)
                    ms.append(None)
            pdf = pdf.copy()
            pdf["width"], pdf["height"], pdf["mean_pixel"] = ws, hs, ms
            yield pdf[cols + ["width", "height", "mean_pixel"]]

    return df.mapInPandas(stats, out_schema)


def image_resize(df: DataFrame, payload_col: str = "payload",
                 decode_fn=None,
                 width: int = 224, height: int = 224,
                 strict: bool = True) -> DataFrame:
    """Resize an image column — REAL nearest-neighbor resample for BMP/PPM
    payloads (re-encoded as BMP); codec formats raise under ``strict`` or
    fall back to a content-hash stub."""
    ensure_udf_serializable()
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("resized", T.BinaryType())])
    cols = [f.name for f in df.schema.fields]

    _decode = decode_fn if decode_fn is not None else decode_image

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[payload_col]:
                payload = bytes(p) if p is not None else b""
                try:
                    img = _decode(payload)
                    h, w = img.shape[:2]
                    yi = (np.arange(height) * h // height).clip(0, h - 1)
                    xi = (np.arange(width) * w // width).clip(0, w - 1)
                    out.append(encode_bmp(img[yi][:, xi]))
                except DECODE_ERRORS as e:
                    if strict:
                        if isinstance(e, NotImplementedError):
                            raise NotImplementedError(
                                "non-BMP/PPM image resize requires "
                                "PIL/cv2") from e
                        raise
                    out.append(hashlib.sha256(
                        payload + f"{width}x{height}".encode()).digest())
            pdf = pdf.copy()
            pdf["resized"] = out
            yield pdf[cols + ["resized"]]

    return df.mapInPandas(resize, out_schema)


def video_frame_sample(df: DataFrame, payload_col: str = "payload",
                       every_ms: int = 1000, max_frames: int = 8,
                       strict: bool = True) -> DataFrame:
    """Explode a video column into sampled frames (frame_idx, frame bytes).

    STUB decode; the row-multiplying plumbing (one output row per frame,
    preserving all input columns) is real.
    """
    ensure_udf_serializable()
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("frame_idx", T.IntegerType()),
                                 T.StructField("frame", T.BinaryType())])
    cols = [f.name for f in df.schema.fields]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError("video decode requires ffmpeg")
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r[payload_col]) if r[payload_col] is not None else b""
                n = (int.from_bytes(hashlib.sha256(payload).digest()[:2], "big")
                     % max_frames) + 1
                for i in range(n):
                    row = {c: r[c] for c in cols}
                    row["frame_idx"] = i
                    row["frame"] = hashlib.sha256(
                        payload + i.to_bytes(4, "big")).digest()
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols + ["frame_idx", "frame"])

    return df.mapInPandas(sample, out_schema)


def synthesize_media_column(df: DataFrame, from_col: str,
                            payload_col: str = "payload") -> DataFrame:
    """Create a deterministic binary payload from an existing column — lets
    the multimodal pipeline be exercised on the text testdata."""
    return df.withColumn(
        payload_col, F.sha2(F.col(from_col).cast("string"), 256).cast("binary"))


def image_payload_for_text(text, fmt: str = "bmp") -> bytes:
    """The hash → (w, h, color) → encoded-payload derivation shared by
    :func:`synthesize_image_column` and the media gate: w = hex[0:4]%16+1,
    h = hex[4:8]%16+1, color = hex[8:10] of sha256(text); JPEG encodes at
    quality=100 so constant-color payloads roundtrip bit-exactly; GIF is
    lossless (LZW over palette indices) so the oracle holds exactly."""
    if fmt not in ("bmp", "png", "jpeg", "gif"):
        raise ValueError("fmt must be 'bmp', 'png', 'jpeg' or 'gif'")
    hx = hashlib.sha256(str(text).encode()).hexdigest()
    w = int(hx[0:4], 16) % 16 + 1
    h = int(hx[4:8], 16) % 16 + 1
    c = int(hx[8:10], 16)
    enc = {"bmp": encode_bmp, "png": encode_png, "gif": encode_gif,
           "jpeg": lambda a: encode_jpeg(a, quality=100)}[fmt]
    return enc(np.full((h, w, 3), c, np.uint8))


def synthesize_image_column(df: DataFrame, from_col: str,
                            payload_col: str = "payload",
                            fmt: str = "bmp") -> DataFrame:
    """Synthesize a REAL image payload per row (``fmt``: ``bmp``, ``png``,
    ``jpeg`` or ``gif``), with dimensions and a constant fill color
    derived from sha256 hex substrings of ``from_col`` — the same
    derivation an external SQL oracle can compute:
    w = hex[0:4] % 16 + 1, h = hex[4:8] % 16 + 1, color = hex[8:10].
    JPEG payloads use quality=100, where constant-color images roundtrip
    bit-exactly (DC-only blocks, unit quantizer) so the oracle still
    holds; GIF is lossless outright."""
    if fmt not in ("bmp", "png", "jpeg", "gif"):
        raise ValueError("fmt must be 'bmp', 'png', 'jpeg' or 'gif'")
    ensure_udf_serializable()
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField(payload_col, T.BinaryType())])
    cols = [f.name for f in df.schema.fields]

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [image_payload_for_text(v, fmt)
                        for v in pdf[from_col]]
            pdf = pdf.copy()
            pdf[payload_col] = payloads
            yield pdf[cols + [payload_col]]

    return df.mapInPandas(synth, out_schema)


def synthesize_audio_column(df: DataFrame, from_col: str,
                            payload_col: str = "payload",
                            sample_rate: int = 16_000,
                            fmt: str = "wav") -> DataFrame:
    """Synthesize a REAL audio payload per row (``fmt``: ``wav`` or
    ``flac``): constant-amplitude signal with length and amplitude
    derived from sha256 hex substrings of ``from_col``
    (n = hex[10:14] % 2000 + 100, amp = hex[14:18] % 30000) — so
    rms == amp is recomputable by an external SQL oracle.  FLAC is
    lossless, so the identical oracle holds through the compressed
    encode→decode round trip."""
    if fmt not in ("wav", "flac"):
        raise ValueError("fmt must be 'wav' or 'flac'")
    ensure_udf_serializable()
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField(payload_col, T.BinaryType())])
    cols = [f.name for f in df.schema.fields]

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for v in pdf[from_col]:
                hx = hashlib.sha256(str(v).encode()).hexdigest()
                n = int(hx[10:14], 16) % 2000 + 100
                amp = int(hx[14:18], 16) % 30000
                sig = np.full(n, amp, dtype=np.int16)
                payloads.append(
                    encode_wav(sig, sample_rate) if fmt == "wav"
                    else encode_flac(sig, sample_rate))
            pdf = pdf.copy()
            pdf[payload_col] = payloads
            yield pdf[cols + [payload_col]]

    return df.mapInPandas(synth, out_schema)


def audio_stats(df: DataFrame, payload_col: str = "payload",
                decode_fn=None,
                strict: bool = True) -> DataFrame:
    """Real decode statistics per audio payload: ``n_samples``,
    ``sample_rate``, ``rms`` (PCM WAV via the stdlib wave module, FLAC
    via the pure-numpy codec in ``datapipe/flac.py``)."""
    ensure_udf_serializable()
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("n_samples", T.LongType()),
                                 T.StructField("sample_rate", T.IntegerType()),
                                 T.StructField("rms", T.DoubleType())])
    cols = [f.name for f in df.schema.fields]

    _decode = decode_fn if decode_fn is not None else decode_audio

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, rates, rms = [], [], []
            for p in pdf[payload_col]:
                payload = bytes(p) if p is not None else b""
                try:
                    x, rate = _decode(payload)
                    ns.append(len(x))
                    rates.append(rate)
                    rms.append(float(np.sqrt(np.mean(
                        x.astype(np.float64) ** 2))) if len(x) else 0.0)
                except DECODE_ERRORS:
                    if strict:
                        raise
                    ns.append(None)
                    rates.append(None)
                    rms.append(None)
            pdf = pdf.copy()
            pdf["n_samples"], pdf["sample_rate"], pdf["rms"] = ns, rates, rms
            yield pdf[cols + ["n_samples", "sample_rate", "rms"]]

    return df.mapInPandas(stats, out_schema)


def _mel_filterbank(n_filters: int, n_fft: int, rate: int) -> np.ndarray:
    """Triangular mel filterbank (standard public construction)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=float) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=float) / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(rate / 2.0), n_filters + 2)
    bins = np.floor((n_fft + 1) * mel_to_hz(mels) / rate).astype(int)
    fb = np.zeros((n_filters, n_fft // 2 + 1))
    for i in range(n_filters):
        lo, mid, hi = bins[i], bins[i + 1], bins[i + 2]
        for k in range(lo, mid):
            if mid > lo:
                fb[i, k] = (k - lo) / (mid - lo)
        for k in range(mid, hi):
            if hi > mid:
                fb[i, k] = (hi - k) / (hi - mid)
    return fb


def _mfcc(x: np.ndarray, rate: int, n_mfcc: int, n_fft: int = 512,
          n_filters: int = 26) -> np.ndarray:
    """MFCC over the whole clip (mean across frames): frame → |rfft|² →
    mel filterbank → log → DCT-II.  Pure numpy (no scipy in container)."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    hop = n_fft // 2
    n_frames = 1 + (len(x) - n_fft) // hop
    window = np.hanning(n_fft)
    frames = np.stack([x[i * hop:i * hop + n_fft] * window
                       for i in range(n_frames)])
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2 / n_fft
    fb = _mel_filterbank(n_filters, n_fft, rate)
    energies = np.log(power @ fb.T + 1e-10)          # (frames, n_filters)
    # DCT-II matrix (orthonormal), first n_mfcc rows
    k = np.arange(n_filters)
    dct = np.cos(np.pi * np.outer(np.arange(n_mfcc), 2 * k + 1)
                 / (2 * n_filters))
    return (energies.mean(axis=0) @ dct.T).astype(np.float32)


def audio_features(df: DataFrame, payload_col: str = "payload",
                   decode_fn=None,
                   n_mfcc: int = 13, strict: bool = True) -> DataFrame:
    """Decode + MFCC feature-extract an audio column
    → ``audio_features array<float>``.  PCM WAV and FLAC payloads run a
    REAL numpy MFCC (framed rfft → mel filterbank → log → DCT-II) over
    the actual decoded samples; other codec formats raise under
    ``strict`` or fall back to a content-seeded fake."""
    ensure_udf_serializable()
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("audio_features",
                                               T.ArrayType(T.FloatType())),
                                 T.StructField("decoded", T.BooleanType())])
    cols = [f.name for f in df.schema.fields]

    _decode = decode_fn if decode_fn is not None else decode_audio

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, dec = [], []
            for p in pdf[payload_col]:
                payload = bytes(p) if p is not None else b""
                try:
                    x, rate = _decode(payload)
                    feats.append(_mfcc(x, rate, n_mfcc).tolist())
                    dec.append(True)
                except DECODE_ERRORS as e:
                    if strict:
                        if isinstance(e, NotImplementedError):
                            raise NotImplementedError(
                                "non-WAV/FLAC audio decode requires "
                                "codec libraries not present in this "
                                "container") from e
                        raise
                    feats.append(
                        _fake_image_features(payload, n_mfcc).tolist())
                    dec.append(False)
            pdf = pdf.copy()
            pdf["audio_features"] = feats
            pdf["decoded"] = dec
            yield pdf[cols + ["audio_features", "decoded"]]

    return df.mapInPandas(extract, out_schema)
