"""GIF codec tests: hand-derived golden stream (every LZW code worked
out from the GIF89a spec appendix F), lossless round-trips including
dictionary overflow and interlace, corruption honesty, and the public
image pipeline on GIF payloads."""

import numpy as np
import pytest

from fast_causal_inference_spark.datapipe.gif import decode_gif, encode_gif


def _golden_stream() -> tuple[bytes, np.ndarray]:
    """1×3 image, 2-color palette, indices [0, 1, 0].

    LZW (min code size 2, clear=4, end=5, width 3): emit clear(4);
    (0,1) new -> emit 0, add #6; (1,0) new -> emit 1, add #7; flush 0;
    emit end(5).  Codes 4,0,1,0,5 pack LSB-first into 0x44 0x50."""
    img = np.array([[[10, 20, 30], [200, 100, 50], [10, 20, 30]]],
                   dtype=np.uint8)
    payload = (
        b"GIF89a"
        + b"\x03\x00\x01\x00"          # logical screen 3 x 1
        + b"\x80\x00\x00"              # GCT flag, 2-entry table, bg 0
        + bytes([10, 20, 30, 200, 100, 50])
        + b"\x2c" + b"\x00\x00\x00\x00\x03\x00\x01\x00\x00"
        + b"\x02"                      # LZW min code size
        + b"\x02\x44\x50"              # one 2-byte data sub-block
        + b"\x00"                      # sub-block terminator
        + b"\x3b")                     # trailer
    return payload, img


def test_golden_decode():
    payload, img = _golden_stream()
    assert np.array_equal(decode_gif(payload), img)


def test_golden_encode_matches_hand_derivation():
    payload, img = _golden_stream()
    assert encode_gif(img) == payload


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("shape,ncol", [((1, 1), 1), ((16, 16), 4),
                                        ((64, 64), 256), ((100, 37), 17),
                                        ((7, 200), 3)])
def test_roundtrip(shape, ncol, interlace):
    rng = np.random.default_rng(ncol * 1000 + shape[0])
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncol, shape)]
    assert np.array_equal(decode_gif(encode_gif(img, interlace)), img)


def test_roundtrip_dictionary_overflow():
    """>4096 dictionary entries force mid-stream clear codes."""
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 256, (300, 300))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_roundtrip_long_runs():
    """Constant images ramp the dictionary through the KwKwK case."""
    img = np.full((50, 80, 3), 123, np.uint8)
    payload = encode_gif(img)
    assert len(payload) < 500              # LZW actually compresses runs
    assert np.array_equal(decode_gif(payload), img)


def test_gif87a_and_local_color_table():
    """Decoder accepts GIF87a and a local color table overriding none."""
    payload, img = _golden_stream()
    p87 = b"GIF87a" + payload[6:]
    assert np.array_equal(decode_gif(p87), img)
    # move the palette into a LOCAL color table (no GCT)
    body = bytearray(payload)
    gct = bytes(body[13:19])
    no_gct = (b"GIF89a" + b"\x03\x00\x01\x00" + b"\x00\x00\x00"
              + b"\x2c" + b"\x00\x00\x00\x00\x03\x00\x01\x00"
              + b"\x80" + gct            # LCT flag, 2 entries
              + payload[29:])            # min code size + data + trailer
    assert np.array_equal(decode_gif(no_gct), img)


def test_extension_blocks_are_skipped():
    payload, img = _golden_stream()
    # splice a Graphic Control Extension before the image descriptor
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    at = payload.index(b"\x2c")
    spliced = payload[:at] + gce + payload[at:]
    assert np.array_equal(decode_gif(spliced), img)


def test_offset_image_composes_onto_screen():
    payload, img = _golden_stream()
    # image placed at left=1 on a 4-wide screen; bg color = entry 0
    moved = bytearray(payload)
    moved[6:8] = b"\x04\x00"              # screen width 4
    at = payload.index(b"\x2c")
    moved[at + 1:at + 3] = b"\x01\x00"    # left = 1
    out = decode_gif(bytes(moved))
    assert out.shape == (1, 4, 3)
    assert out[0, 0].tolist() == [10, 20, 30]          # background
    assert np.array_equal(out[0, 1:4], img[0])


def test_corruption_raises():
    payload, _ = _golden_stream()
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + payload[6:])
    with pytest.raises(ValueError):
        decode_gif(payload[:15])           # truncated
    broken = bytearray(payload)
    broken[-4] ^= 0xFF                     # corrupt LZW data byte
    with pytest.raises(ValueError):
        decode_gif(bytes(broken))
    with pytest.raises(ValueError):        # trailer with no image
        decode_gif(b"GIF89a" + b"\x01\x00\x01\x00\x00\x00\x00" + b"\x3b")


def test_encoder_input_validation():
    rng = np.random.default_rng(1)
    with pytest.raises(ValueError, match="distinct colors"):
        encode_gif(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_gif(np.zeros((0, 4, 3), np.uint8))


def test_image_pipeline_on_gif(spark):
    """image_stats runs the REAL GIF decode via the public pipeline and
    the hash-derived oracle values hold (lossless palette round-trip)."""
    from fast_causal_inference_spark.datapipe.multimodal import (
        image_stats,
        synthesize_image_column,
    )

    d = spark.createDataFrame([(i, f"doc number {i}") for i in range(15)],
                              "doc_id int, text string")
    bmp = image_stats(synthesize_image_column(d, "text")).toPandas()
    gif = image_stats(
        synthesize_image_column(d, "text", fmt="gif")).toPandas()
    for c in ("width", "height", "mean_pixel"):
        assert gif.sort_values("doc_id")[c].tolist() == \
            bmp.sort_values("doc_id")[c].tolist()


# -- PNG depth/interlace extensions (same round, same validation style) -----


def test_png_16bit_and_adam7_roundtrip():
    import numpy as np

    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(0)
    v8 = rng.integers(0, 256, (15, 9, 3), dtype=np.uint16)
    # 16-bit samples v*257 have high byte == v, so the 16->8 map is exact
    assert np.array_equal(decode_png(encode_png(v8 * 257, bit_depth=16)),
                          v8.astype(np.uint8))
    for sh in [(1, 1), (2, 3), (7, 5), (16, 16), (13, 29)]:
        img = rng.integers(0, 256, (*sh, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_png(encode_png(img, interlace=True)), img), sh
        assert np.array_equal(
            decode_png(encode_png(img.astype(np.uint16) * 257,
                                  bit_depth=16, interlace=True)), img), sh


def test_png_sub_byte_depths_hand_crafted():
    """Gray depth-4/1 and palette depth-2 streams assembled longhand
    from the spec (bit packing MSB-first within each scanline byte)."""
    import struct
    import zlib

    import numpy as np

    from fast_causal_inference_spark.datapipe.multimodal import (
        _PNG_SIG,
        decode_png,
    )

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    vals = np.array([[0, 7, 15], [3, 8, 12]], dtype=np.uint8)
    rows = b""
    for r in vals:
        rows += b"\x00" + bytes([(r[0] << 4) | r[1], r[2] << 4])
    p = (_PNG_SIG
         + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 4, 0, 0, 0, 0))
         + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(p),
                          np.repeat((vals * 17)[:, :, None], 3, axis=2))

    plte = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 40, 40, 40])
    row = b"\x00" + bytes([0b00011011, 0b01000000])
    p = (_PNG_SIG
         + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 1, 2, 3, 0, 0, 0))
         + chunk(b"PLTE", plte)
         + chunk(b"IDAT", zlib.compress(row)) + chunk(b"IEND", b""))
    exp = np.array([[[10, 0, 0], [0, 20, 0], [0, 0, 30],
                     [40, 40, 40], [0, 20, 0]]], dtype=np.uint8)
    assert np.array_equal(decode_png(p), exp)

    row = b"\x00" + bytes([0b10110000])
    p = (_PNG_SIG
         + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 1, 1, 0, 0, 0, 0))
         + chunk(b"IDAT", zlib.compress(row)) + chunk(b"IEND", b""))
    assert decode_png(p)[0, :, 0].tolist() == [255, 0, 255, 255]


def test_png_invalid_combinations_raise():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from fast_causal_inference_spark.datapipe.multimodal import (
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    # depth 4 is illegal for truecolor
    p = (_PNG_SIG
         + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 4, 2, 0, 0, 0))
         + chunk(b"IDAT", zlib.compress(b"\x00\x00")) + chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="depth"):
        decode_png(p)
    with _pytest.raises(ValueError):
        encode_png(np.zeros((2, 2, 3), np.uint8), bit_depth=12)


def test_decoder_fuzz_error_contract():
    """Corrupt payloads raise cleanly: the round-8 codecs (FLAC,
    Ogg-FLAC, GIF) raise ONLY ValueError/NotImplementedError; PNG/WAV
    may additionally surface zlib/struct errors, all members of the
    documented DECODE_ERRORS contract the pipeline catches.  Nothing
    hangs, segfaults, or escapes with an arbitrary exception type."""
    import random
    import struct

    from fast_causal_inference_spark.datapipe.flac import (
        decode_flac,
        decode_ogg_flac,
        encode_flac,
        encode_ogg_flac,
    )
    from fast_causal_inference_spark.datapipe.multimodal import (
        DECODE_ERRORS,
        decode_png,
        decode_wav,
        encode_png,
    )

    rng = np.random.default_rng(0)
    random.seed(0)
    flac = encode_flac(rng.integers(-5000, 5000, 400), 16000)
    ogg = encode_ogg_flac(rng.integers(-500, 500, 300), 16000)
    gif = encode_gif((rng.integers(0, 4, (20, 20))[..., None]
                      .repeat(3, 2) * 60).astype(np.uint8))
    png = encode_png(rng.integers(0, 256, (12, 9, 3), dtype=np.uint8))
    d16 = rng.integers(-1000, 1000, 64).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    ch = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
          + b"data" + struct.pack("<I", len(d16)) + d16)
    wav = b"RIFF" + struct.pack("<I", 4 + len(ch)) + b"WAVE" + ch

    strict = (ValueError, NotImplementedError)
    for name, valid, fn, allowed in [
            ("flac", flac, decode_flac, strict),
            ("ogg", ogg, decode_ogg_flac, strict),
            ("gif", gif, decode_gif, strict),
            ("png", png, decode_png, DECODE_ERRORS),
            ("wav", wav, decode_wav, DECODE_ERRORS)]:
        for cut in range(0, len(valid), max(1, len(valid) // 60)):
            try:
                fn(valid[:cut])
            except allowed:
                pass
        for _ in range(150):
            p = random.randrange(len(valid))
            m = bytearray(valid)
            m[p] ^= random.randrange(1, 256)
            try:
                fn(bytes(m))
            except allowed:
                pass
        for _ in range(60):
            junk = bytes(rng.integers(0, 256, random.randrange(0, 300),
                                      dtype=np.uint8))
            try:
                fn(valid[:4] + junk)
            except allowed:
                pass
