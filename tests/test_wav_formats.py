"""decode_wav across the full common WAV surface: PCM 8/16/24/32,
IEEE float32/64, WAVE_FORMAT_EXTENSIBLE wrappers, stereo mixing, and
compressed-format honesty — fixtures hand-assembled from the RIFF spec
(stdlib wave cannot write most of these, which is the point)."""

import struct

import numpy as np
import pytest

from fast_causal_inference_spark.datapipe.multimodal import (
    decode_wav,
    encode_wav,
)


def _wav(code: int, ch: int, rate: int, bits: int, data: bytes,
         extensible: bool = False) -> bytes:
    if extensible:
        # cbSize=22, validBits, channel mask, then the 16-byte SubFormat
        # GUID whose first two little-endian bytes are the format code
        fmt = struct.pack("<HHIIHH", 0xFFFE, ch, rate,
                          rate * ch * bits // 8, ch * bits // 8, bits) \
            + struct.pack("<HHI", 22, bits, 0x3) \
            + struct.pack("<H", code) + b"\x00" * 14
    else:
        fmt = struct.pack("<HHIIHH", code, ch, rate,
                          rate * ch * bits // 8, ch * bits // 8, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + (b"\x00" if len(fmt) % 2 else b"")
              + b"data" + struct.pack("<I", len(data)) + data
              + (b"\x00" if len(data) % 2 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_pcm16_matches_stdlib_roundtrip():
    x = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    y, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000 and np.array_equal(y, x)
    # the same samples through the hand-assembled container
    y2, _ = decode_wav(_wav(1, 1, 8000, 16, x.astype("<i2").tobytes()))
    assert np.array_equal(y2, x)


def test_pcm8_unsigned():
    raw = bytes([0, 128, 255, 192])
    y, _ = decode_wav(_wav(1, 1, 16000, 8, raw))
    assert y.tolist() == [-32768, 0, 32512, 16384]


def test_pcm24_and_pcm32():
    vals = [0, 1 << 16, -(1 << 16), (1 << 23) - 1, -(1 << 23)]
    raw = b"".join(int(v).to_bytes(3, "little", signed=True)
                   for v in vals)
    y, _ = decode_wav(_wav(1, 1, 44100, 24, raw))
    assert y.tolist() == [v >> 8 for v in vals]
    vals32 = np.array([0, 1 << 24, -(1 << 24), (1 << 31) - 1],
                      dtype="<i4")
    y, _ = decode_wav(_wav(1, 1, 44100, 32, vals32.tobytes()))
    assert y.tolist() == [0, 256, -256, 32767]


def test_float32_and_float64():
    f = np.array([0.0, 0.5, -0.5, 1.0, -1.0, 2.0], dtype="<f4")
    y, _ = decode_wav(_wav(3, 1, 22050, 32, f.tobytes()))
    assert y.tolist() == [0, 16383, -16383, 32767, -32767, 32767]
    f64 = np.array([0.25, -0.25], dtype="<f8")
    y, _ = decode_wav(_wav(3, 1, 22050, 64, f64.tobytes()))
    assert y.tolist() == [8191, -8191]


def test_extensible_wrapper_and_stereo_mix():
    f = np.array([0.5, 0.5, -1.0, 1.0], dtype="<f4")  # L R L R
    y, rate = decode_wav(_wav(3, 2, 48000, 32, f.tobytes(),
                              extensible=True))
    assert rate == 48000
    assert y.tolist() == [16383, 0]                   # per-frame mean


def test_unsupported_codecs_raise():
    # format codes 0x02/0x11 (MS/IMA ADPCM) decode for real since
    # round 9 — MP3-in-WAV (0x55) is the remaining lossy-tier raise
    with pytest.raises(NotImplementedError, match="format code 85"):
        decode_wav(_wav(0x55, 1, 8000, 4, b"\x00\x00"))
    with pytest.raises(NotImplementedError, match="PCM WAV"):
        decode_wav(_wav(1, 1, 8000, 12, b"\x00\x00"))
    with pytest.raises(ValueError):
        decode_wav(_wav(1, 1, 0, 16, b"\x00\x00"))    # zero rate
    with pytest.raises(ValueError):
        decode_wav(_wav(1, 0, 8000, 16, b"\x00\x00"))  # zero channels
    with pytest.raises(ValueError):                   # missing data chunk
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")


def test_g711_mulaw_alaw_decode():
    """G.711 expansion tables match the independent stdlib audioop
    reference exactly (all 256 codes, both laws); spot values pinned
    from the spec in case audioop is absent (removed in Python 3.13)."""
    from fast_causal_inference_spark.datapipe.multimodal import (
        _alaw_table,
        _mulaw_table,
    )

    mu, al = _mulaw_table(), _alaw_table()
    # spec-pinned spots: mu-law 0x00 -> -32124, 0xFF -> 0; A-law
    # 0x55 -> -8 (min negative step), 0xD5 -> 8 (min positive step),
    # 0xAA -> 32256 (max positive), 0x2A -> -32256 (max negative)
    assert mu[0x00] == -32124 and mu[0xFF] == 0 and mu[0x7F] == 0
    assert al[0x55] == -8 and al[0xD5] == 8
    assert al[0xAA] == 32256 and al[0x2A] == -32256
    try:
        import audioop
    except ImportError:
        audioop = None
    if audioop is not None:
        codes = bytes(range(256))
        assert np.array_equal(
            mu, np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2"))
        assert np.array_equal(
            al, np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2"))
    # through the WAV container (format codes 7 and 6, 8-bit samples)
    payload = bytes([0x00, 0xFF, 0x80, 0x7F])
    y, rate = decode_wav(_wav(7, 1, 8000, 8, payload))
    assert rate == 8000 and y.tolist() == [-32124, 0, 32124, 0]
    y, _ = decode_wav(_wav(6, 1, 8000, 8, bytes([0x55, 0xAA, 0xD5, 0x2A])))
    assert y.tolist() == [-8, 32256, 8, -32256]
