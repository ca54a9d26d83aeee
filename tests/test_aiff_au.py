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
    # 'ima4' decodes for real since round 10; ALAC stays a named raise
    bad = p.replace(b"sowt", b"alac")
    with pytest.raises(NotImplementedError, match="alac"):
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


# ------------------------------------------------- round 10: AIFC ima4

def test_aifc_ima4_roundtrip_and_exact_constants():
    """'ima4' leaves the named-raise list: own-encoder round trip
    equals the encoder's internal reconstruction bit-for-bit, and
    constants at multiples of 128 (step index 0) decode EXACTLY."""
    from fast_causal_inference_spark.datapipe.adpcm import (
        decode_ima4_packets,
        encode_ima4_packets,
    )
    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_audio,
        encode_aifc_ima4,
    )

    rng = np.random.default_rng(4)
    for sig in (rng.integers(-8000, 8000, 700).astype(np.int16),
                (np.sin(np.arange(500) / 9) * 12000).astype(np.int16),
                np.array([77], np.int16)):
        data, recon = encode_ima4_packets(sig)
        assert len(data) % 34 == 0
        dec = decode_ima4_packets(data, 1)[:, 0][:len(sig)]
        assert np.array_equal(dec, recon[:len(sig)])
        # full container path
        y, rate = decode_audio(encode_aifc_ima4(sig, 22050))
        assert rate == 22050
        assert np.array_equal(y[:len(sig)], recon[:len(sig)])
    const = np.full(320, -40 * 128, np.int16)
    y, _ = decode_audio(encode_aifc_ima4(const, 8000))
    assert np.array_equal(y[:320], const)     # exact oracle class


def test_aifc_ima4_packet_header_fixture():
    """Hand-built single packet: header 0x0400 (predictor 1024, step
    index 0), all-zero nibbles -> 64 samples of 1024 (step 7 >> 3 = 0
    drift) — pins the 9/7-bit header split and nibble order."""
    from fast_causal_inference_spark.datapipe.adpcm import (
        decode_ima4_packets,
    )

    pkt = bytes([0x04, 0x00]) + b"\x00" * 32
    out = decode_ima4_packets(pkt, 1)[:, 0]
    assert out.tolist() == [1024] * 64
    # low nibble decodes FIRST: nibble 4 (=+step) then nibble 8+4
    # wait-free check: one byte 0x04 -> first sample moves +7? build
    # header predictor 0, index 0, first byte 0x84: low nib 4 ->
    # +step(7); high nib 8 -> -((7)>>3)=0 after index bump to 2 (step 9
    # -> diff 9>>3=1, sign bit -> -1)
    pkt2 = bytes([0x00, 0x00, 0x84]) + b"\x00" * 31
    out2 = decode_ima4_packets(pkt2, 1)[:, 0]
    assert out2[0] == 7                       # low nibble first, +step
    assert out2[1] == out2[0] - 1             # high nibble 8: -((9)>>3)
    # unknown AIFC codec still raises by name
    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_aiff,
        encode_aifc_ima4,
    )

    p = bytearray(encode_aifc_ima4(np.zeros(10, np.int16)))
    at = p.find(b"ima4")
    p[at:at + 4] = b"alac"
    with pytest.raises(NotImplementedError, match="alac"):
        decode_aiff(bytes(p))


def test_aifc_ima4_stereo_interleave():
    """Stereo packets alternate per channel inside each 64-frame
    group; decode_aiff mixes to mono."""
    from fast_causal_inference_spark.datapipe.adpcm import (
        decode_ima4_packets,
    )

    # ch0 constant 1024 (hdr 0x0400), ch1 constant -1024 (hdr 0xFC00)
    pkt0 = bytes([0x04, 0x00]) + b"\x00" * 32
    pkt1 = bytes([0xFC, 0x00]) + b"\x00" * 32
    out = decode_ima4_packets(pkt0 + pkt1, 2)
    assert out.shape == (64, 2)
    assert set(out[:, 0].tolist()) == {1024}
    assert set(out[:, 1].tolist()) == {-1024}


def test_ima4_batch_matches_sequential_quality_and_exact_constants():
    """encode_ima4_batch re-seeds every packet from its own first
    sample so ALL packets vectorize on one axis; quality matches the
    sequential encoder (same greedy nibble rule) and the constant
    oracle class stays exact."""
    from fast_causal_inference_spark.datapipe.adpcm import (
        decode_ima4_batch,
        decode_ima4_packets,
        encode_ima4_batch,
        encode_ima4_packets,
    )

    rng = np.random.default_rng(1)
    sigs = [np.full(200, -40 * 128, np.int16),
            np.full(77, 128 * 100, np.int16),
            (np.sin(np.arange(300) / 15) * 9000).astype(np.int16),
            rng.integers(-5000, 5000, 130).astype(np.int16)]
    decs = decode_ima4_batch(encode_ima4_batch(sigs),
                             [len(s) for s in sigs])
    assert np.array_equal(decs[0], sigs[0])   # exact constant class
    assert np.array_equal(decs[1], sigs[1])
    for d, s in zip(decs, sigs):
        assert len(d) == len(s)
        # batch quality is within 1.2x of the sequential encoder's
        data, _ = encode_ima4_packets(s)
        seq = decode_ima4_packets(data, 1)[:, 0][:len(s)]
        eb = np.abs(d.astype(float) - s.astype(float)).mean()
        es = np.abs(seq.astype(float) - s.astype(float)).mean()
        assert eb <= max(es, 1.0) * 1.2, (eb, es)
    # batch payloads are decodable one-by-one (packet independence)
    one = encode_ima4_batch([sigs[2]])[0]
    assert len(one) % 34 == 0
    assert np.array_equal(
        decode_ima4_packets(one, 1)[:len(sigs[2]), 0], decs[2])


# ------------------------------------------------------- AIFC G.711

def test_aifc_g711_exact_levels_roundtrip():
    """Constants at a G.711 expansion-table level survive AIFC
    compress -> expand exactly, for both laws and both letter cases."""
    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_audio,
        encode_aifc_g711,
    )

    for law, table in (("ulaw", _mulaw_table()), ("alaw", _alaw_table())):
        for code in (0, 1, 77, 130, 200, 255):
            lvl = int(table[code])
            y, rate = decode_audio(
                encode_aifc_g711(np.full(97, lvl, np.int16), 8000, law))
            assert rate == 8000 and len(y) == 97
            assert np.all(y == lvl), (law, code)
    # QuickTime writes the uppercase compression type
    p = encode_aifc_g711(np.full(9, int(_mulaw_table()[42]), np.int16),
                         8000, "ulaw")
    i = p.find(b"ulaw")
    y, _ = decode_aiff(p[:i] + b"ULAW" + p[i + 4:])
    assert np.all(y == int(_mulaw_table()[42]))


def test_aifc_g711_lossy_nearest_level():
    """Arbitrary int16 input maps every sample to a REAL G.711 level
    within the worst-case top-segment step (mu-law 1024, A-law 1024)."""
    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_aiff,
        encode_aifc_g711,
    )

    rng = np.random.default_rng(5)
    x = rng.integers(-32000, 32000, 800).astype(np.int16)
    for law, table in (("ulaw", _mulaw_table()), ("alaw", _alaw_table())):
        y, _ = decode_aiff(encode_aifc_g711(x, 8000, law))
        levels = set(int(t) for t in table)
        assert all(int(v) in levels for v in y)
        assert np.abs(y.astype(np.int64) - x).max() <= 1024


def test_au_alaw_encoding_27():
    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_au,
        encode_au,
    )

    al = _alaw_table()
    lvl = int(al[100])
    y, rate = decode_au(encode_au(np.full(33, lvl, np.int16), 8000,
                                  encoding=27))
    assert rate == 8000 and np.all(y == lvl)


def test_aifc_g711_stereo_monomix():
    """Two-channel G.711 AIFC decodes with a channel mean, trimmed to
    numSampleFrames."""
    from fast_causal_inference_spark.datapipe.multimodal import (
        _g711_nearest_codes,
        decode_aiff,
    )
    import struct

    table = _mulaw_table()
    l_lvl, r_lvl = int(table[60]), int(table[200])
    inter = np.empty(20, np.int16)
    inter[0::2], inter[1::2] = l_lvl, r_lvl
    codes = _g711_nearest_codes(inter, table).tobytes()
    from fast_causal_inference_spark.datapipe.multimodal import _float_to_f80
    name = b"\x09ITU u-law"
    comm = struct.pack(">hLh", 2, 10, 16) + _float_to_f80(8000.0) \
        + b"ulaw" + name
    ssnd = struct.pack(">LL", 0, 0) + codes
    body = (b"AIFC"
            + b"COMM" + struct.pack(">L", len(comm)) + comm
            + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd)
    y, rate = decode_aiff(b"FORM" + struct.pack(">L", len(body)) + body)
    assert rate == 8000 and len(y) == 10
    assert np.all(y == np.int16((l_lvl + r_lvl) / 2))
