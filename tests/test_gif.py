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
