"""Baseline TIFF codec (round 9): own-encoder round trips
(uncompressed + PackBits), hand-built fixtures for the decode-only
paths (big-endian MM, multi-strip, palette, white-is-zero), PackBits
spec vectors, corruption contracts, dispatch via decode_image."""
import struct

import numpy as np
import pytest

from fast_causal_inference_spark.datapipe.multimodal import (
    _packbits_decode,
    _packbits_encode,
    decode_image,
    decode_tiff,
    encode_tiff,
)

RNG = np.random.default_rng(11)


def test_roundtrip_rgb_gray_both_compressions():
    for shape in [(9, 13, 3), (16, 16, 3), (5, 7), (1, 1, 3)]:
        img = RNG.integers(0, 256, shape, dtype=np.uint8)
        ref = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, 2)
        for pb in (False, True):
            out = decode_image(encode_tiff(img, packbits=pb))
            assert np.array_equal(out, ref), (shape, pb)


def test_packbits_spec_vector():
    """The canonical Apple PackBits example from the TIFF 6 spec."""
    src = bytes([0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA,
                 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA,
                 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA])
    packed = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
                    0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    assert _packbits_decode(packed, len(src)) == src
    # own encoder round-trips (byte-stream may differ, data must not)
    assert _packbits_decode(_packbits_encode(src), len(src)) == src


def test_packbits_random_roundtrip():
    for _ in range(20):
        n = int(RNG.integers(1, 700))
        data = bytes(RNG.integers(0, 4, n, dtype=np.uint8) * 80)
        assert _packbits_decode(_packbits_encode(data), n) == data


def _ifd(bo, entries, extra=b"", data=b""):
    """Hand-assemble a single-IFD TIFF."""
    n = len(entries)
    ifd_at = 8
    extra_at = ifd_at + 2 + 12 * n + 4
    out = struct.pack(f"{bo}2sHI", b"II" if bo == "<" else b"MM", 42,
                      ifd_at)
    out += struct.pack(f"{bo}H", n)
    for tag, typ, cnt, val in entries:
        out += struct.pack(f"{bo}HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            if bo == "<":
                out += struct.pack("<HH", val, 0)
            else:
                out += struct.pack(">HH", val, 0)
        else:
            out += struct.pack(f"{bo}I", val)
    out += struct.pack(f"{bo}I", 0)
    assert len(out) == extra_at
    return out + extra + data


def test_big_endian_and_multistrip():
    """MM byte order with two strips of 2 rows each."""
    img = RNG.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    strip0 = img[:2].tobytes()
    strip1 = img[2:].tobytes()
    bo = ">"
    n_entries = 9
    extra_at = 8 + 2 + 12 * n_entries + 4
    bps_at = extra_at
    off_at = bps_at + 6
    cnt_at = off_at + 8
    data_at = cnt_at + 8
    extra = struct.pack(">HHH", 8, 8, 8)
    extra += struct.pack(">II", data_at, data_at + len(strip0))
    extra += struct.pack(">II", len(strip0), len(strip1))
    entries = sorted([
        (256, 3, 1, 5), (257, 3, 1, 4), (258, 3, 3, bps_at),
        (259, 3, 1, 1), (262, 3, 1, 2), (273, 4, 2, off_at),
        (277, 3, 1, 3), (278, 3, 1, 2), (279, 4, 2, cnt_at),
    ])
    p = _ifd(bo, entries, extra, strip0 + strip1)
    assert np.array_equal(decode_tiff(p), img)


def test_palette_and_white_is_zero():
    # palette: 2x3 of indices into a 256-entry 16-bit colormap
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    cmap = np.zeros((3, 256), dtype=np.uint16)
    cmap[0, :3] = [0xFF00, 0x1200, 0x0000]
    cmap[1, :3] = [0x0000, 0x3400, 0xFF00]
    cmap[2, :3] = [0x8000, 0x5600, 0x0100]
    n_entries = 10
    extra_at = 8 + 2 + 12 * n_entries + 4
    cmap_at = extra_at
    data_at = cmap_at + 3 * 256 * 2
    entries = sorted([
        (256, 3, 1, 3), (257, 3, 1, 2), (258, 3, 1, 8),
        (259, 3, 1, 1), (262, 3, 1, 3), (273, 4, 1, data_at),
        (277, 3, 1, 1), (278, 3, 1, 2), (279, 4, 1, 6),
        (320, 3, 3 * 256, cmap_at),
    ])
    p = _ifd("<", entries, cmap.astype("<u2").tobytes(), idx.tobytes())
    out = decode_tiff(p)
    assert list(out[0, 0]) == [0xFF, 0x00, 0x80]
    assert list(out[0, 1]) == [0x12, 0x34, 0x56]
    assert list(out[0, 2]) == [0x00, 0xFF, 0x01]
    # white-is-zero grayscale inverts
    g = np.array([[0, 255]], dtype=np.uint8)
    entries = sorted([
        (256, 3, 1, 2), (257, 3, 1, 1), (258, 3, 1, 8),
        (259, 3, 1, 1), (262, 3, 1, 0), (273, 4, 1,
                                         8 + 2 + 12 * 9 + 4),
        (277, 3, 1, 1), (278, 3, 1, 1), (279, 4, 1, 2),
    ])
    p = _ifd("<", entries, b"", g.tobytes())
    out = decode_tiff(p)
    assert list(out[0, 0]) == [255, 255, 255]
    assert list(out[0, 1]) == [0, 0, 0]


def test_unsupported_and_corrupt_raise():
    img = RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    p = bytearray(encode_tiff(img))
    # JPEG-in-TIFF compression code 7 -> NotImplementedError (LZW
    # decodes for real since round 10)
    i = p.find(struct.pack("<HH", 259, 3))
    p2 = bytes(p[:i + 8]) + struct.pack("<HH", 7, 0) + bytes(p[i + 12:])
    with pytest.raises(NotImplementedError, match="compression 7"):
        decode_tiff(p2)
    # compression 5 with a non-LZW payload is corrupt, not silent
    p5 = bytes(p[:i + 8]) + struct.pack("<HH", 5, 0) + bytes(p[i + 12:])
    with pytest.raises(ValueError):
        decode_tiff(p5)
    with pytest.raises(ValueError):
        decode_tiff(b"II\x2a\x00\xff\xff\xff\xff")    # bad IFD offset
    with pytest.raises(ValueError):
        decode_tiff(b"PNG not tiff")
    # truncated strip
    with pytest.raises(ValueError, match="strip"):
        decode_tiff(bytes(p)[:-10])


def test_probe_reports_tiff_dims():
    from fast_causal_inference_spark.datapipe.mediaprobe import (
        probe_payload,
    )

    img = RNG.integers(0, 256, (21, 34, 3), dtype=np.uint8)
    r = probe_payload(encode_tiff(img))
    assert r["container"] == "tiff"
    assert (r["width"], r["height"]) == (34, 21)


# ------------------------------------------------- round 10 additions
# LZW (compression 5) with the TIFF early-change rule, predictor 2
# (horizontal differencing), and PlanarConfiguration 2.

def test_lzw_roundtrip_rgb_gray_predictor():
    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, (21, 17, 3), dtype=np.uint8),
            rng.integers(0, 4, (33, 40), dtype=np.uint8) * 80,
            (np.add.outer(np.arange(64), np.arange(90)) % 256
             ).astype(np.uint8)]
    for img in imgs:
        for pred in (False, True):
            p = encode_tiff(img, lzw=True, predictor=pred)
            out = decode_image(p)
            exp = img if img.ndim == 3 else np.repeat(
                img[:, :, None], 3, 2)
            assert np.array_equal(out, exp), (img.shape, pred)
    # smooth gradients + predictor must actually compress
    grad = (np.add.outer(np.arange(100), np.arange(120)) % 256
            ).astype(np.uint8)
    assert len(encode_tiff(grad, lzw=True, predictor=True)) \
        < grad.size // 2


def test_lzw_early_change_boundary_fixture():
    """Hand-packed MSB-first stream crossing the 9->10-bit boundary at
    table size 511 (the TIFF early-change rule).  A GIF-style late
    decoder (bump at 512) would misread the 255th literal."""
    from fast_causal_inference_spark.datapipe.gif import (
        _lzw_decode_tiff,
    )

    vals = [(i * 3) % 256 for i in range(255)]
    acc, nbits, out = 0, 0, bytearray()

    def put(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    put(256, 9)                              # clear
    for v in vals[:254]:                     # 9-bit literals; after the
        put(v, 9)                            # 254th, next_code == 511
    put(vals[254], 10)                       # -> 10-bit reads
    put(257, 10)                             # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    assert list(_lzw_decode_tiff(bytes(out), 255)) == vals


def test_planar_configuration_rgb():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (14, 9, 3), dtype=np.uint8)
    for kw in ({}, {"packbits": True}, {"lzw": True},
               {"lzw": True, "predictor": True}):
        p = encode_tiff(img, planar=True, **kw)
        assert np.array_equal(decode_image(p), img), kw
    # the planar flag really is in the container (tag 284 == 2)
    p = encode_tiff(img, planar=True)
    assert b"\x1c\x01" in p                  # tag 284 little-endian


def test_unsupported_predictor_raises():
    img = np.zeros((4, 4), dtype=np.uint8)
    p = bytearray(encode_tiff(img, lzw=True, predictor=True))
    # patch predictor tag value 2 -> 3 (floating point)
    at = p.find(struct.pack("<HH", 317, 3))
    assert at > 0
    struct.pack_into("<H", p, at + 8, 3)
    with pytest.raises(NotImplementedError, match="predictor 3"):
        decode_image(bytes(p))


def test_deflate_compression_roundtrip():
    """Compression 8 (Adobe Deflate, stdlib zlib) — round trips with
    and without predictor/planar; the legacy code 32946 decodes too;
    a truncated deflate strip raises rather than returning short
    rows."""
    import zlib

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (19, 13, 3), dtype=np.uint8)
    for kw in ({}, {"predictor": True},
               {"planar": True, "predictor": True}):
        p = encode_tiff(img, deflate=True, **kw)
        assert np.array_equal(decode_image(p), img), kw
    # legacy code 32946: patch the compression tag
    p = bytearray(encode_tiff(img, deflate=True))
    at = p.find(struct.pack("<HH", 259, 3))
    struct.pack_into("<H", p, at + 8, 32946)
    assert np.array_equal(decode_tiff(bytes(p)), img)
    # gradient + predictor must out-compress plain deflate
    grad = (np.add.outer(np.arange(100), np.arange(120)) % 256
            ).astype(np.uint8)
    assert len(encode_tiff(grad, deflate=True, predictor=True)) < \
        len(encode_tiff(grad, deflate=True))
    # a deflate strip inflating to fewer bytes than the rows need
    # raises loudly instead of returning a short raster
    good = bytearray(encode_tiff(np.zeros((8, 8), np.uint8),
                                 deflate=True))
    short = zlib.compress(b"\x00" * 10)       # 10 < 8*8 bytes
    at = good.find(struct.pack("<HH", 279, 4))
    old_len = struct.unpack_from("<I", good, at + 8)[0]
    struct.pack_into("<I", good, at + 8, len(short))
    bad = bytes(good[:-old_len]) + short
    with pytest.raises(ValueError, match="deflate strip short"):
        decode_tiff(bad)


# ----------------------------------------------- round 11: 16-bit + tiles

def test_16bit_roundtrip_matrix():
    """uint16 input writes BitsPerSample 16; values that are v8*257
    reduce back exactly (>>8, the PNG-16 convention) across the
    compression x predictor x planar matrix."""
    rng = np.random.default_rng(41)
    v8 = rng.integers(0, 256, (11, 7, 3), dtype=np.uint16)
    img16 = (v8 * 257).astype(np.uint16)
    for kw in ({}, {"lzw": True}, {"deflate": True}, {"packbits": True},
               {"lzw": True, "predictor": True},
               {"deflate": True, "predictor": True, "planar": True},
               {"predictor": True, "planar": True}):
        got = decode_tiff(encode_tiff(img16, **kw))
        assert got.dtype == np.uint8
        assert np.array_equal(got, v8.astype(np.uint8)), kw
    # grayscale 16-bit
    g16 = (rng.integers(0, 256, (5, 9), dtype=np.uint16) * 257)
    got = decode_tiff(encode_tiff(g16.astype(np.uint16), lzw=True,
                                  predictor=True))
    assert np.array_equal(got[:, :, 0], (g16 >> 8).astype(np.uint8))
    # arbitrary 16-bit values reduce by >> 8
    raw16 = rng.integers(0, 65536, (6, 6, 3), dtype=np.uint16)
    got = decode_tiff(encode_tiff(raw16, deflate=True, predictor=True))
    assert np.array_equal(got, (raw16 >> 8).astype(np.uint8))


def test_tiled_layout_roundtrip_matrix():
    """TileWidth/TileLength layout: edge tiles pad and crop correctly,
    predictor restarts at each tile's left edge, planar writes one tile
    set per plane — across compressions and both bit depths."""
    rng = np.random.default_rng(43)
    img = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    for tile in ((16, 16), (8, 8), (21, 13), (5, 7)):
        for kw in ({}, {"lzw": True, "predictor": True},
                   {"deflate": True, "planar": True},
                   {"packbits": True, "predictor": True,
                    "planar": True}):
            got = decode_tiff(encode_tiff(img, tile=tile, **kw))
            assert np.array_equal(got, img), (tile, kw)
    # tiled grayscale + tiled 16-bit
    g = rng.integers(0, 256, (10, 17), dtype=np.uint8)
    assert np.array_equal(
        decode_tiff(encode_tiff(g, tile=(4, 16), lzw=True,
                                predictor=True))[:, :, 0], g)
    img16 = (rng.integers(0, 256, (9, 9, 3), dtype=np.uint16) * 257)
    got = decode_tiff(encode_tiff(img16.astype(np.uint16), tile=(8, 8),
                                  deflate=True, predictor=True))
    assert np.array_equal(got, (img16 >> 8).astype(np.uint8))


def test_tiled_corrupt_raises():
    img = np.zeros((8, 8, 3), np.uint8)
    p = bytearray(encode_tiff(img, tile=(8, 8)))
    # drop the TileLength tag value -> missing tile layout
    at = p.find(struct.pack("<HH", 323, 3))
    assert at > 0
    struct.pack_into("<HH", p, at, 60000, 3)   # rename the tag away
    with pytest.raises(ValueError, match="tile"):
        decode_tiff(bytes(p))


def test_mixed_bit_depth_raises():
    img = np.zeros((4, 4, 3), np.uint8)
    p = bytearray(encode_tiff(img))
    # BitsPerSample is out-of-line for RGB: forge (8, 16, 8)
    at = p.find(struct.pack("<HHI", 258, 3, 3))
    (off,) = struct.unpack_from("<I", p, at + 8)
    struct.pack_into("<HHH", p, off, 8, 16, 8)
    with pytest.raises(NotImplementedError, match="uniform"):
        decode_tiff(bytes(p))
