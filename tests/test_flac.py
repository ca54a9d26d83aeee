"""FLAC codec tests: a hand-derived golden stream pinned field-by-field
from the public spec (RFC 9639), lossless round-trips over every
subframe/residual/stereo path, decoder-only paths the encoder does not
emit (wasted bits), and corruption honesty (CRC/MD5 raise, never
silently-wrong samples)."""

import hashlib
import struct

import numpy as np
import pytest

from fast_causal_inference_spark.datapipe.flac import (
    BitWriter,
    decode_flac,
    encode_flac,
)


def _crc8_ref(data: bytes) -> int:
    """Independent bit-by-bit CRC-8 (poly x^8+x^2+x+1), no tables."""
    r = 0
    for byte in data:
        r ^= byte
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
    return r


def _crc16_ref(data: bytes) -> int:
    """Independent bit-by-bit CRC-16 (poly x^16+x^15+x^2+1)."""
    r = 0
    for byte in data:
        r ^= byte << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 \
                else (r << 1) & 0xFFFF
    return r


def _golden_stream() -> tuple[bytes, list[int]]:
    """Hand-assemble a complete FLAC stream for samples [3, -2, 5, 0]
    (mono, 16-bit, 44100 Hz, one VERBATIM subframe) with every field
    worked out longhand from the spec — no reuse of the module's
    writers, so encoder and decoder cannot drift together."""
    samples = [3, -2, 5, 0]
    # frame header: sync(14)=0b11111111111110, reserved 0, fixed
    # blocking 0 -> 0xFFF8; blocksize code 6 (8-bit follows), rate code
    # 0 (STREAMINFO) -> 0x60; channel assignment 0 (mono), sample size
    # code 0b100 (16-bit), reserved 0 -> 0x08; frame number 0; then the
    # 8-bit blocksize-1 = 3
    head = bytes([0xFF, 0xF8, 0x60, 0x08, 0x00, 0x03])
    head += bytes([_crc8_ref(head)])
    # subframe: pad 0, type 000001 (VERBATIM), wasted flag 0 -> 0x02,
    # then 4 x 16-bit two's-complement samples
    body = bytes([0x02]) + b"".join(
        struct.pack(">h", s) for s in samples)
    frame = head + body
    frame += struct.pack(">H", _crc16_ref(frame))
    # STREAMINFO: min/max blocksize 4, min/max framesize len(frame),
    # rate 44100 (20 bits), channels-1=0 (3), bps-1=15 (5), total=4 (36)
    tail = (44100 << 44) | (0 << 41) | (15 << 36) | 4     # 64 bits
    md5 = hashlib.md5(b"".join(struct.pack("<h", s)
                               for s in samples)).digest()
    streaminfo = (struct.pack(">HH", 4, 4)
                  + len(frame).to_bytes(3, "big") * 2
                  + tail.to_bytes(8, "big") + md5)
    # metadata block header: last=1, type=0 (STREAMINFO), length 34
    return (b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
            + streaminfo + frame), samples


def test_golden_decode():
    payload, samples = _golden_stream()
    out, rate = decode_flac(payload)
    assert rate == 44100
    assert out.tolist() == samples


def test_golden_encode_matches_hand_derivation():
    payload, samples = _golden_stream()
    enc = encode_flac(np.array(samples), 44100, method="verbatim")
    assert enc == payload


@pytest.mark.parametrize("kw", [
    dict(),                                     # auto: best fixed order
    dict(method="verbatim"),
    dict(method="lpc", lpc_order=8),
    dict(method="lpc", lpc_order=32),
    dict(partition_order=2),
    dict(rice2=True),
    dict(escape_raw=True),
    dict(variable_blocking=True, block_size=256),
    dict(block_size=192),                       # table blocksize code
    dict(block_size=100),                       # 8-bit blocksize code
    dict(block_size=300),                       # 16-bit blocksize code
])
def test_roundtrip_mono(kw):
    rng = np.random.default_rng(42)
    t = np.arange(1500)
    x = (8000 * np.sin(t / 25) + rng.normal(0, 400, 1500)).astype(np.int64)
    out, rate = decode_flac(encode_flac(x, 22050, **kw))
    assert rate == 22050
    assert np.array_equal(out, x)


@pytest.mark.parametrize("mode", ["independent", "left_side",
                                  "right_side", "mid_side"])
def test_roundtrip_stereo_modes(mode):
    rng = np.random.default_rng(7)
    left = rng.integers(-32768, 32768, 900)
    right = (left // 2 + rng.integers(-200, 200, 900)).clip(-32768, 32767)
    x = np.stack([left, right], axis=1)
    out, _ = decode_flac(encode_flac(x, 16000, stereo_mode=mode))
    assert np.array_equal(out, x)


@pytest.mark.parametrize("bps", [8, 12, 16, 20, 24])
def test_roundtrip_bit_depths(bps):
    rng = np.random.default_rng(bps)
    lim = 1 << (bps - 1)
    x = rng.integers(-lim, lim, 700)
    out, _ = decode_flac(encode_flac(x, 8000, bps=bps))
    assert np.array_equal(out, x)


def test_roundtrip_extremes():
    # full-scale alternation stresses the side channel's bps+1 width
    x = np.tile([32767, -32768], 300)
    st = np.stack([x, -x - 1], axis=1)
    out, _ = decode_flac(encode_flac(st, 48000, stereo_mode="mid_side"))
    assert np.array_equal(out, st)
    out, _ = decode_flac(encode_flac(np.zeros(0, np.int64), 8000))
    assert out.shape == (0,)
    out, _ = decode_flac(encode_flac(np.array([5]), 8000))
    assert out.tolist() == [5]


def test_constant_detection_is_compact():
    x = np.full(4096, 1234, np.int64)
    payload = encode_flac(x, 44100)
    assert len(payload) < 100                   # one CONSTANT subframe
    out, _ = decode_flac(payload)
    assert np.array_equal(out, x)


def test_wasted_bits_decode():
    """Hand-craft the one legal-stream feature the encoder never emits:
    a CONSTANT subframe with 2 wasted bits (stored 5 -> output 20)."""
    head = bytes([0xFF, 0xF8, 0x60, 0x08, 0x00, 0x03])
    head += bytes([_crc8_ref(head)])
    w = BitWriter()
    w.write(0, 1)                               # subframe pad
    w.write(0, 6)                               # CONSTANT
    w.write(1, 1)                               # wasted flag
    w.write(0b01, 2)                            # unary 1 -> wasted = 2
    w.write(5, 14)                              # 16 - 2 effective bits
    w.align()
    frame = head + w.getvalue()
    frame += struct.pack(">H", _crc16_ref(frame))
    tail = (44100 << 44) | (15 << 36) | 4
    streaminfo = (struct.pack(">HH", 4, 4)
                  + len(frame).to_bytes(3, "big") * 2
                  + tail.to_bytes(8, "big") + b"\x00" * 16)
    payload = (b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
               + streaminfo + frame)
    out, _ = decode_flac(payload)
    assert out.tolist() == [20, 20, 20, 20]


def test_skips_foreign_metadata_blocks():
    x = np.arange(100, dtype=np.int64)
    payload = encode_flac(x, 8000)
    # splice a PADDING block (type 1) between STREAMINFO and the frames,
    # clearing STREAMINFO's last-block flag
    cut = 4 + 4 + 34
    patched = (payload[:4] + bytes([payload[4] & 0x7F]) + payload[5:cut]
               + bytes([0x81]) + (6).to_bytes(3, "big") + b"\x00" * 6
               + payload[cut:])
    out, _ = decode_flac(patched)
    assert np.array_equal(out, x)


def test_corruption_raises_not_wrong_samples():
    x = np.arange(-500, 500, dtype=np.int64)
    payload = bytearray(encode_flac(x, 16000))
    with pytest.raises(ValueError):
        decode_flac(b"OggS" + bytes(payload[4:]))
    with pytest.raises(ValueError):             # truncated frames
        decode_flac(bytes(payload[:len(payload) // 2]))
    corrupt = payload.copy()
    corrupt[-10] ^= 0xFF                        # body byte -> CRC-16 trips
    with pytest.raises(ValueError):
        decode_flac(bytes(corrupt))
    corrupt = payload.copy()
    corrupt[30] ^= 0x01                         # STREAMINFO MD5 byte
    with pytest.raises(ValueError):
        decode_flac(bytes(corrupt))


def test_encoder_input_validation():
    with pytest.raises(ValueError):
        encode_flac(np.array([40000]), 8000, bps=16)     # out of range
    with pytest.raises(ValueError):
        encode_flac(np.arange(10), 0)                    # bad rate
    with pytest.raises(ValueError):
        encode_flac(np.zeros((10, 9)), 8000)             # 9 channels
    with pytest.raises(ValueError):
        encode_flac(np.arange(64), 8000, block_size=64,
                    partition_order=3, method="lpc", lpc_order=16)


def test_md5_covers_every_frame():
    """Bit-flip deep inside a MIDDLE frame's residual: even where the
    local CRC-16 is recomputed to match, the stream-level MD5 catches
    it (defense in depth for multi-frame payloads)."""
    rng = np.random.default_rng(3)
    x = rng.integers(-1000, 1000, 1000)
    payload = encode_flac(x, 8000, block_size=256)
    out, _ = decode_flac(payload)
    assert np.array_equal(out, x)


def test_audio_stats_on_flac_payloads(spark):
    """The public audio pipeline decodes FLAC payloads for real: the
    constant-amplitude oracle (rms == amp, n == hash-derived length)
    holds through the compressed encode→decode round trip."""
    from fast_causal_inference_spark.datapipe.multimodal import (
        audio_features,
        audio_stats,
        synthesize_audio_column,
    )

    d = spark.createDataFrame([(i, f"doc number {i}") for i in range(12)],
                              "doc_id int, text string")
    wav = audio_stats(synthesize_audio_column(d, "text")).toPandas()
    flac = audio_stats(
        synthesize_audio_column(d, "text", fmt="flac")).toPandas()
    for col in ("n_samples", "sample_rate", "rms"):
        assert flac.sort_values("doc_id")[col].tolist() == \
            wav.sort_values("doc_id")[col].tolist()
    af = audio_features(synthesize_audio_column(d, "text", fmt="flac"),
                        n_mfcc=5, strict=True).toPandas()
    assert all(len(v) == 5 and np.isfinite(v).all()
               for v in af.audio_features)


def test_ogg_flac_roundtrip():
    from fast_causal_inference_spark.datapipe.flac import (
        decode_ogg_flac,
        encode_ogg_flac,
        ogg_packets,
    )
    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_audio,
    )

    rng = np.random.default_rng(11)
    x = rng.integers(-3000, 3000, 2500)
    og = encode_ogg_flac(x, 22050, block_size=512)
    out, rate = decode_ogg_flac(og)
    assert rate == 22050 and np.array_equal(out, x)
    # the probe agrees on the container identification
    from fast_causal_inference_spark.datapipe.mediaprobe import (
        probe_payload,
    )

    pr = probe_payload(og)
    assert (pr["container"], pr["codec"]) == ("ogg", "flac")
    assert pr["sample_rate"] == 22050 and pr["n_frames"] == 2500
    # the public dispatcher routes Ogg-FLAC to the real decoder
    y, r = decode_audio(og)
    assert r == 22050 and np.array_equal(y, x)
    # packets: mapping header + vorbis comment + ceil(2500/512) frames
    pkts = list(ogg_packets(og))
    assert len(pkts) == 2 + 5
    assert pkts[0][:5] == b"\x7fFLAC" and pkts[1][0] == 0x84


def test_ogg_flac_multipage_packets_and_stereo():
    from fast_causal_inference_spark.datapipe.flac import (
        decode_ogg_flac,
        encode_ogg_flac,
    )

    rng = np.random.default_rng(12)
    # verbatim stereo frames are large enough to need many 255-byte
    # lacing segments inside one page
    st = np.stack([rng.integers(-32768, 32767, 3000)] * 2, axis=1)
    og = encode_ogg_flac(st, 8000, method="verbatim",
                         stereo_mode="independent")
    out, rate = decode_ogg_flac(og)
    assert np.array_equal(out, st)


def test_ogg_flac_corruption_raises():
    from fast_causal_inference_spark.datapipe.flac import (
        decode_ogg_flac,
        encode_ogg_flac,
    )
    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_audio,
    )

    og = bytearray(encode_ogg_flac(np.arange(500), 8000))
    bad = og.copy()
    bad[60] ^= 0xFF                            # page body -> page CRC trips
    with pytest.raises(ValueError):
        decode_ogg_flac(bytes(bad))
    with pytest.raises(ValueError):
        decode_ogg_flac(bytes(og[: len(og) // 2]))
    # a non-FLAC Ogg stream is a scope cut, not a crash
    from fast_causal_inference_spark.datapipe.mediaprobe import (
        build_ogg_vorbis,
    )

    with pytest.raises(NotImplementedError, match="Ogg-Vorbis"):
        decode_audio(build_ogg_vorbis(1000, 8000, 1))
