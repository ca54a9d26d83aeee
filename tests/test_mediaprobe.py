"""Container-metadata probe tests: every builder field must be recovered
by the parser, corrupt payloads must degrade to 'unknown' rows (never
executor errors), and the Spark pass must be a single narrow map."""

import struct

import numpy as np
import pandas as pd
import pytest

from fast_causal_inference_spark.datapipe.mediaprobe import (
    build_mp3,
    build_mp4,
    media_probe,
    probe_payload,
)


def test_mp3_cbr_duration_exact():
    b = build_mp3(n_frames=40, bitrate_index=9, rate_index=0)  # 128k/44100
    r = probe_payload(b)
    assert r["container"] == "mp3" and r["codec"] == "mpeg1_l3"
    assert r["bit_rate"] == 128_000 and r["sample_rate"] == 44100
    assert r["channels"] == 2 and r["vbr"] is False
    assert r["n_frames"] == 40
    assert r["duration_sec"] == pytest.approx(40 * 1152 / 44100)


def test_mp3_id3_skip_and_xing():
    b = build_mp3(n_frames=25, bitrate_index=5, rate_index=1,  # 64k/48000
                  xing=True, id3_size=300)
    r = probe_payload(b)
    assert r["container"] == "mp3"
    assert r["sample_rate"] == 48000 and r["bit_rate"] == 64_000
    assert r["vbr"] is True and r["n_frames"] == 25
    assert r["duration_sec"] == pytest.approx(25 * 1152 / 48000)


def test_mp3_mono_xing_offset():
    # mono side info is 17 bytes, not 32 — wrong offset would miss Xing
    b = build_mp3(n_frames=12, bitrate_index=9, rate_index=2, mono=True,
                  xing=True)
    r = probe_payload(b)
    assert r["channels"] == 1 and r["sample_rate"] == 32000
    assert r["vbr"] is True and r["n_frames"] == 12


def test_mp3_resync_through_junk_prefix():
    b = b"\x00junkjunk\xff\xee" + build_mp3(n_frames=8, seed=3)
    r = probe_payload(b)
    assert r["container"] == "mp3" and r["n_frames"] == 8


def test_mp4_duration_brand_tracks():
    b = build_mp4(duration_sec=12.5, timescale=600, n_video=1, n_audio=2,
                  brand=b"mp42")
    r = probe_payload(b)
    assert r["container"] == "mp4" and r["codec"] == "mp42"
    assert r["duration_sec"] == pytest.approx(12.5)
    assert r["n_video_tracks"] == 1 and r["n_audio_tracks"] == 2


def test_mp4_version1_mvhd():
    # hand-build a v1 mvhd (64-bit times) inside moov
    mvhd = struct.pack(">I", 8 + 4 + 16 + 4 + 8) + b"mvhd" \
        + b"\x01\x00\x00\x00" + b"\x00" * 16 \
        + struct.pack(">I", 90_000) + struct.pack(">Q", 90_000 * 7)
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4
    r = probe_payload(ftyp + moov)
    assert r["container"] == "mp4"
    assert r["duration_sec"] == pytest.approx(7.0)


def test_wav_and_image_headers():
    from fast_causal_inference_spark.datapipe.multimodal import (
        encode_bmp,
        encode_png,
        encode_wav,
    )

    wav = encode_wav(np.zeros(16_000, dtype=np.int16), sample_rate=16_000)
    r = probe_payload(wav)
    assert r["container"] == "wav" and r["sample_rate"] == 16_000
    assert r["duration_sec"] == pytest.approx(1.0)

    img = np.zeros((7, 9, 3), dtype=np.uint8)
    assert probe_payload(encode_bmp(img)) \
        == probe_payload(encode_bmp(img))  # deterministic
    rb = probe_payload(encode_bmp(img))
    assert (rb["container"], rb["width"], rb["height"]) == ("bmp", 9, 7)
    rp = probe_payload(encode_png(img))
    assert (rp["container"], rp["width"], rp["height"]) == ("png", 9, 7)


def test_jpeg_sof_dimensions():
    from fast_causal_inference_spark.datapipe.multimodal import encode_jpeg

    img = np.full((24, 17, 3), 128, dtype=np.uint8)
    r = probe_payload(encode_jpeg(img))
    assert (r["container"], r["width"], r["height"]) == ("jpeg", 17, 24)
    assert r["codec"] == "baseline"


def test_corrupt_payloads_degrade_cleanly():
    for b in (None, b"", b"\xff\xfb", b"RIFFxxxxWAVE",
              b"\x00\x00\x00\x08ftyp",          # truncated ftyp
              build_mp3(3)[:40],                 # truncated frame
              bytes(range(256)) * 4):
        r = probe_payload(b)
        assert r["container"] in ("unknown", "mp3", "mp4", "wav")


def test_media_probe_spark_pass(spark):
    rows = [(1, build_mp3(10, xing=True)), (2, build_mp4(3.0)),
            (3, b"garbage"), (4, None)]
    df = spark.createDataFrame(rows, "id int, payload binary")
    probed = media_probe(df, "payload").select("id", "probe.*")
    pdf = probed.orderBy("id").toPandas()
    assert list(pdf["container"]) == ["mp3", "mp4", "unknown", "unknown"]
    assert pdf["n_frames"][0] == 10
    assert pdf["duration_sec"][1] == pytest.approx(3.0)
    # narrow map: no exchange in the probe plan itself (the orderBy
    # above is the test's own sort, kept off this assertion)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_probe_never_raises_fuzz():
    """probe_payload over adversarial bytes: arbitrary junk, truncations
    of valid streams at every boundary, and bit-flipped headers must
    yield a row, never an exception (probe stages cannot kill a scan)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    mp3 = build_mp3(4, xing=True, id3_size=32)
    mp4 = build_mp4(5.0)

    @settings(max_examples=300, deadline=None)
    @given(st.binary(min_size=0, max_size=600))
    def _fuzz(b):
        r = probe_payload(b)
        assert isinstance(r, dict) and "container" in r

    _fuzz()

    for valid in (mp3, mp4):
        for cut in range(0, min(len(valid), 120)):
            assert "container" in probe_payload(valid[:cut])
        # single-bit corruption across the header region
        for pos in range(0, 48):
            mut = bytearray(valid)
            mut[pos] ^= 0x40
            assert "container" in probe_payload(bytes(mut))


def test_probe_flac_streaminfo():
    import numpy as np

    from fast_causal_inference_spark.datapipe.flac import encode_flac

    r = probe_payload(encode_flac(np.arange(-500, 500), 22050))
    assert r["container"] == "flac" and r["codec"] == "flac"
    assert r["sample_rate"] == 22050 and r["channels"] == 1
    assert r["n_frames"] == 1000
    assert abs(r["duration_sec"] - 1000 / 22050) < 1e-9
    st = probe_payload(encode_flac(
        np.stack([np.arange(300)] * 2, axis=1), 8000))
    assert st["channels"] == 2 and st["n_frames"] == 300


def test_probe_ogg_vorbis_and_opus():
    import struct

    from fast_causal_inference_spark.datapipe.mediaprobe import (
        _ogg_page,
        build_ogg_vorbis,
    )

    r = probe_payload(build_ogg_vorbis(441_000, 44_100, 2, 192_000))
    assert (r["container"], r["codec"]) == ("ogg", "vorbis")
    assert r["sample_rate"] == 44_100 and r["channels"] == 2
    assert r["bit_rate"] == 192_000 and r["duration_sec"] == 10.0
    assert r["n_frames"] == 441_000
    # OpusHead: granule clock is 48 kHz; duration subtracts pre-skip
    opus = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
            + struct.pack("<I", 48_000) + b"\x00\x00\x00")
    og = _ogg_page(9, 0, 0, 0x02, opus) + _ogg_page(9, 1, 96_312, 0x04,
                                                    b"xx")
    r = probe_payload(og)
    assert (r["codec"], r["channels"], r["duration_sec"]) == ("opus", 2,
                                                              2.0)


def test_probe_webp_variants():
    from fast_causal_inference_spark.datapipe.mediaprobe import (
        build_webp,
    )

    r = probe_payload(build_webp(640, 480))
    assert (r["container"], r["codec"], r["width"], r["height"]) == \
        ("webp", "vp8", 640, 480)
    r = probe_payload(build_webp(33, 77, lossless=True))
    assert (r["codec"], r["width"], r["height"]) == ("vp8l", 33, 77)
    # VP8X canvas dims (hand-assembled: flags + 24-bit w-1/h-1)
    import struct as _s
    payload = b"\x00" * 4 + (639).to_bytes(3, "little") \
        + (479).to_bytes(3, "little")
    chunk = b"VP8X" + _s.pack("<I", len(payload)) + payload
    b = b"RIFF" + _s.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    r = probe_payload(b)
    assert (r["codec"], r["width"], r["height"]) == ("vp8x", 640, 480)


def test_probe_new_formats_fuzz_safe():
    import numpy as np

    from fast_causal_inference_spark.datapipe.flac import encode_flac
    from fast_causal_inference_spark.datapipe.mediaprobe import (
        build_ogg_vorbis,
        build_webp,
    )

    for valid in (encode_flac(np.arange(100), 8000),
                  build_ogg_vorbis(1000, 8000, 1),
                  build_webp(4, 4), build_webp(4, 4, lossless=True)):
        for cut in range(0, min(len(valid), 120)):
            assert "container" in probe_payload(valid[:cut])
        for pos in range(0, min(len(valid), 48)):
            mut = bytearray(valid)
            mut[pos] ^= 0x40
            assert "container" in probe_payload(bytes(mut))


def test_probe_ogg_no_false_sync_on_body_capture_pattern():
    """An 'OggS\\x00' byte run INSIDE a page body (entropy bytes) must
    not be mistaken for the final page header — duration comes from the
    structurally last valid page walked via the segment tables."""
    import struct

    from fast_causal_inference_spark.datapipe.mediaprobe import (
        _ogg_page,
        probe_payload,
    )

    opus = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 0)
            + struct.pack("<I", 48_000) + b"\x00\x00\x00")
    # body of the last page embeds a fake capture pattern followed by
    # version 0 and a bogus huge granule at the rfind offset
    evil_body = (b"\x01" * 5 + b"OggS\x00\x00"
                 + struct.pack("<q", 48_000 * 9999) + b"\x02" * 20)
    og = (_ogg_page(9, 0, 0, 0x02, opus)
          + _ogg_page(9, 1, 96_000, 0x04, evil_body))
    r = probe_payload(og)
    assert r["codec"] == "opus"
    # granule 96_000 at 48 kHz -> 2.0 s, NOT 9999 s from the fake sync
    assert r["duration_sec"] == 2.0


def test_probe_ogg_truncated_last_page_uses_prior_granule():
    """A stream cut inside the final page body falls back to the last
    STRUCTURALLY COMPLETE page's granule instead of reading garbage."""
    import struct

    from fast_causal_inference_spark.datapipe.mediaprobe import (
        _ogg_page,
        probe_payload,
    )

    opus = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 0)
            + struct.pack("<I", 48_000) + b"\x00\x00\x00")
    full = _ogg_page(9, 0, 0, 0x02, opus) \
        + _ogg_page(9, 1, 48_000, 0x00, b"a" * 40) \
        + _ogg_page(9, 2, 96_000, 0x04, b"b" * 40)
    cut = full[:len(full) - 20]                # truncate final body
    r = probe_payload(cut)
    assert r["codec"] == "opus"
    assert r["duration_sec"] == 1.0            # granule 48_000 page


def test_probe_wav_adpcm_and_g711_codecs():
    """The WAV probe names the codec from the format code (including
    through the EXTENSIBLE wrapper) and derives ADPCM duration from
    samples-per-block / the fact chunk, not the PCM block math."""
    import numpy as np

    from fast_causal_inference_spark.datapipe.adpcm import (
        encode_wav_ima,
        encode_wav_ms,
    )
    from fast_causal_inference_spark.datapipe.mediaprobe import (
        probe_payload,
    )

    x = (200 * np.sin(np.arange(3200) / 9)).astype(np.int16)
    r = probe_payload(encode_wav_ima(x, 16_000))
    assert r["codec"] == "ima_adpcm"
    assert r["n_frames"] == 3200
    assert abs(r["duration_sec"] - 0.2) < 1e-9
    r2 = probe_payload(encode_wav_ms(x, 8_000))
    assert r2["codec"] == "ms_adpcm"
    assert r2["n_frames"] == 3200
    assert abs(r2["duration_sec"] - 0.4) < 1e-9
