"""AIFF and Sun/NeXT AU audio formats (round 9): own-encoder round
trips, hand-built spec fixtures (80-bit extended-float rates, AIFC
byte orders, all AU encodings), corruption contracts, and dispatch
through the public ``decode_audio``."""
import struct

import numpy as np
import pytest

from fast_causal_inference_spark.datapipe.multimodal import (
    _alaw_table,
    _f80_to_float,
    _float_to_f80,
    _mulaw_table,
    decode_aiff,
    decode_au,
    decode_audio,
    encode_aiff,
    encode_au,
)


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    return (4000 * np.sin(np.arange(n) / 7)
            + rng.normal(0, 100, n)).astype(np.int16)


# --------------------------------------------------------------- f80

@pytest.mark.parametrize("v", [8000.0, 11025.0, 16000.0, 22050.0,
                               44100.0, 48000.0, 96000.0, 1.0, 0.0])
def test_extended_float_roundtrip(v):
    assert _f80_to_float(_float_to_f80(v)) == v


def test_extended_float_known_bytes():
    """44100 Hz as the canonical AIFF bytes 400E AC44 0000 0000 0000."""
    b = bytes.fromhex("400eac44000000000000")
    assert _f80_to_float(b) == 44100.0
    assert _float_to_f80(44100.0) == b


# -------------------------------------------------------------- AIFF

def test_aiff_roundtrip_and_dispatch():
    x = _sig(1234)
    p = encode_aiff(x, 22_050)
    y, rate = decode_audio(p)
    assert rate == 22_050
    assert np.array_equal(y, x)


def test_aiff_8_24_32_bit_and_stereo():
    # hand-build: 8-bit signed, 24-bit, 32-bit big-endian bodies
    def comm(ch, n, bits, rate=8000.0):
        return struct.pack(">hLh", ch, n, bits) + _float_to_f80(rate)

    def form(comm_body, data):
        ssnd = struct.pack(">LL", 0, 0) + data
        body = b"AIFF" + b"COMM" + struct.pack(">L", len(comm_body)) \
            + comm_body + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
        return b"FORM" + struct.pack(">L", len(body)) + body

    x8, _ = decode_aiff(form(comm(1, 2, 8), bytes([0x7F, 0x80])))
    assert list(x8) == [127 << 8, -128 << 8]
    v = 0x123456
    d24 = bytes([0x12, 0x34, 0x56, 0xED, 0xCB, 0xAA])
    x24, _ = decode_aiff(form(comm(1, 2, 24), d24))
    assert x24[0] == v >> 8
    assert x24[1] == ((0xEDCBAA - (1 << 24)) >> 8)
    d32 = struct.pack(">ii", 0x7FFF0000, -0x10000)
    x32, _ = decode_aiff(form(comm(1, 2, 32), d32))
    assert list(x32) == [0x7FFF, -1]
    # stereo mono-mix
    st = struct.pack(">hhhh", 100, 300, -100, -300)
    xs, _ = decode_aiff(form(comm(2, 2, 16), st))
    assert list(xs) == [200, -200]


def test_aifc_sowt_little_endian_and_compressed_raise():
    comm = struct.pack(">hLh", 1, 2, 16) + _float_to_f80(8000.0) \
        + b"sowt" + b"\x00\x00"
    ssnd = struct.pack(">LL", 0, 0) + struct.pack("<hh", 1000, -1000)
    body = b"AIFC" + b"COMM" + struct.pack(">L", len(comm)) + comm \
        + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd
    p = b"FORM" + struct.pack(">L", len(body)) + body
    x, rate = decode_aiff(p)
    assert list(x) == [1000, -1000] and rate == 8000
    bad = p.replace(b"sowt", b"ima4")
    with pytest.raises(NotImplementedError, match="ima4"):
        decode_aiff(bad)


def test_aiff_corruption_contract():
    with pytest.raises(ValueError):
        decode_aiff(b"FORMxxxxAIFF")            # missing chunks
    p = encode_aiff(_sig(10), 8000)
    # non-finite extended-float rate
    i = p.find(b"COMM") + 8 + 8
    broken = p[:i] + b"\x7f\xff" + p[i + 2:]
    with pytest.raises(ValueError, match="non-finite"):
        decode_aiff(broken)


# ---------------------------------------------------------------- AU

def test_au_pcm16_roundtrip_and_dispatch():
    x = _sig(900, 3)
    p = encode_au(x, 16_000, encoding=3)
    y, rate = decode_audio(p)
    assert rate == 16_000
    assert np.array_equal(y, x)


def test_au_mulaw_roundtrip_tables():
    """encode_au(mu-law) quantizes through the inverse of the SAME
    expansion table decode uses — round trip lands on the nearest
    representable mu-law level (max |err| bounded by the largest
    segment step)."""
    x = _sig(2000, 5)
    p = encode_au(x, 8_000, encoding=1)
    y, rate = decode_au(p)
    assert rate == 8_000
    table = _mulaw_table().astype(np.int64)
    # every output value is a real mu-law level, near its input
    levels = set(int(t) for t in table)
    assert all(int(v) in levels for v in y)
    assert np.abs(y.astype(np.int64) - x).max() <= 1024


def test_au_all_decode_encodings():
    def au(enc, data, ch=1):
        return struct.pack(">4sLLLLL", b".snd", 24, len(data), enc,
                           8000, ch) + data

    x, _ = decode_au(au(2, struct.pack(">bb", 127, -128)))
    assert list(x) == [127 << 8, -128 << 8]
    x, _ = decode_au(au(4, bytes([0x12, 0x34, 0x56])))
    assert x[0] == 0x123456 >> 8
    x, _ = decode_au(au(5, struct.pack(">i", -0x20000)))
    assert x[0] == -2
    x, _ = decode_au(au(6, struct.pack(">ff", 0.5, -1.0)))
    assert list(x) == [16383, -32767]
    x, _ = decode_au(au(7, struct.pack(">dd", 0.25, 1.0)))
    assert list(x) == [8191, 32767]
    al = _alaw_table()
    x, _ = decode_au(au(27, bytes([0x55, 0xD5])))
    assert x[0] == al[0x55] and x[1] == al[0xD5]
    # stereo mono-mix
    x, _ = decode_au(au(3, struct.pack(">hhhh", 10, 30, -10, -30),
                        ch=2))
    assert list(x) == [20, -20]
    with pytest.raises(NotImplementedError, match="encoding 23"):
        decode_au(au(23, b"\x00\x00"))
    with pytest.raises(ValueError):
        decode_au(b".sndshort")


def test_probe_aiff_and_au():
    from fast_causal_inference_spark.datapipe.mediaprobe import (
        probe_payload,
    )

    r = probe_payload(encode_aiff(_sig(4410), 44_100))
    assert (r["container"], r["channels"]) == ("aiff", 1)
    assert r["sample_rate"] == 44_100 and r["n_frames"] == 4410
    assert abs(r["duration_sec"] - 0.1) < 1e-9
    r2 = probe_payload(encode_au(_sig(1600), 8_000, encoding=1))
    assert (r2["container"], r2["codec"]) == ("au", "mulaw")
    assert r2["n_frames"] == 1600
    assert abs(r2["duration_sec"] - 0.2) < 1e-9
