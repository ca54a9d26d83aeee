"""Container-level media metadata probes — no decode, no codec tables.

The operations a large media corpus actually needs FIRST at 100 TB are
not decodes: they are cheap per-object probes — "what is this, how long
is it, what resolution, what bitrate" — to drive filtering, routing and
cost estimation before any expensive decode stage.  Container framing
is pure public arithmetic (ISO/IEC 11172-3 header layout, ISO base
media file format box structure, PNG/JPEG/BMP/WAV header fields), so
unlike entropy decode (see ``multimodal.py``'s scope note) it can be
implemented and validated fully in-container.

Probes implemented:

* **MPEG-1 Layer III (MP3)**: ID3v2 skip (syncsafe size), frame sync,
  header fields (bitrate index, sample rate, channel mode, padding),
  frame length ``⌊144000·kbps/rate⌋ + pad``, Xing/Info VBR header
  (frame count → exact duration), CBR duration estimate from the first
  frame's rate, frame-sync validation on the next frame boundary.
  MPEG-2/2.5 and Layer I/II framing is recognized (version/layer bits)
  but reported as ``codec`` only — their bitrate tables are not
  replicated here, and a wrong table would silently mis-report
  duration, so the fields stay NULL (same honesty rule as decode).
* **MP4 / ISO-BMFF**: box walk (size+fourcc, 64-bit largesize),
  ``ftyp`` major brand, ``mvhd`` timescale+duration (version 0 and 1),
  ``hdlr`` handler types per track → ``n_video_tracks`` /
  ``n_audio_tracks``.
* **WAV**: fmt chunk (channels, sample rate, bits), data size →
  duration.
* **FLAC**: STREAMINFO (sample rate, channels, bits, total samples →
  exact duration; average bitrate from the stream length).  Full
  decode lives in ``datapipe/flac.py`` — the probe reads the header
  only.
* **Ogg**: page framing (capture pattern, segment table), codec
  identification from the first packet (Vorbis identification header →
  channels / rate / nominal bitrate; OpusHead → channels / pre-skip;
  Ogg-FLAC; Theora), exact duration from the final page's granule
  position (Vorbis/FLAC: PCM samples; Opus: 48 kHz ticks minus
  pre-skip).
* **WebP**: RIFF framing — VP8 (start code + 14-bit dims), VP8L
  (5-byte signature + 14-bit packed dims), VP8X (24-bit canvas dims).
* **PNG / JPEG / BMP / PPM / GIF**: width × height from the header
  (JPEG: first SOF0/1/2 marker), no pixel work.

One Arrow-batched ``mapInPandas`` pass over the payload column; output
is a fixed nullable struct, so a corrupt or foreign payload yields a
row with ``container='unknown'`` (or the container plus NULL fields)
instead of an executor error — probe stages must never kill a 100 TB
scan.  Reference surface parity: the reference ships no media pipeline
at all; this extends the training-data-pipeline mandate
(SURVEY.md §2.10 LLM-data ops) the same way the codecs in
``multimodal.py`` do.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fast_causal_inference_spark.serialization import ensure_udf_serializable

__all__ = ["media_probe", "probe_payload", "build_mp3", "build_mp4",
           "build_ogg_vorbis", "build_webp"]

import math

_AU_ENCODINGS = {1: "mulaw", 2: "pcm8", 3: "pcm16", 4: "pcm24",
                 5: "pcm32", 6: "float32", 7: "float64", 27: "alaw"}


def _f80_to_float(b: bytes) -> float:
    """IEEE 754 80-bit extended float (AIFF COMM sample rate): 1 sign,
    15 exponent (bias 16383), 64-bit mantissa with EXPLICIT integer
    bit."""
    if len(b) < 10:
        raise ValueError("corrupt AIFF: short extended float")
    se = struct.unpack(">H", b[:2])[0]
    mant = struct.unpack(">Q", b[2:10])[0]
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("corrupt AIFF: non-finite sample rate")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _float_to_f80(v: float) -> bytes:
    if v == 0:
        return b"\x00" * 10
    sign = 0x8000 if v < 0 else 0
    v = abs(v)
    exp = math.floor(math.log2(v))
    mant = int(v / 2.0 ** (exp - 63))
    if mant >= 1 << 64:                  # log2 edge rounding
        mant >>= 1
        exp += 1
    return struct.pack(">HQ", sign | (exp + 16383), mant)



# MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = "free format"
# (bitstream-defined frame size — reported as NULL), 15 = invalid.
_MP3_BITRATE_V1_L3 = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                      192, 224, 256, 320)
_MP3_RATE_V1 = (44100, 48000, 32000, None)
_MP3_VERSION = {0b11: "mpeg1", 0b10: "mpeg2", 0b00: "mpeg2.5"}
_MP3_LAYER = {0b01: 3, 0b10: 2, 0b11: 1}


def _syncsafe(b: bytes) -> int:
    """ID3v2 28-bit syncsafe integer (7 bits per byte)."""
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _mp3_header(b: bytes, pos: int) -> dict | None:
    """Parse the 4-byte frame header at ``pos``; None if not a sync."""
    if pos + 4 > len(b):
        return None
    h = struct.unpack(">I", b[pos:pos + 4])[0]
    if (h >> 21) & 0x7FF != 0x7FF:            # 11 sync bits
        return None
    ver_bits = (h >> 19) & 0b11
    layer_bits = (h >> 17) & 0b11
    if ver_bits == 0b01 or layer_bits == 0b00:
        return None                            # reserved values
    out = {"version": _MP3_VERSION[ver_bits],
           "layer": _MP3_LAYER[layer_bits],
           "crc": not bool((h >> 16) & 1),
           "bitrate_index": (h >> 12) & 0xF,
           "rate_index": (h >> 10) & 0b11,
           "padding": (h >> 9) & 1,
           "channel_mode": ("stereo", "joint_stereo", "dual_channel",
                            "mono")[(h >> 6) & 0b11]}
    if out["bitrate_index"] == 0xF or out["rate_index"] == 0b11:
        return None
    # full framing arithmetic only for MPEG-1 Layer III (see module doc)
    if out["version"] == "mpeg1" and out["layer"] == 3:
        kbps = _MP3_BITRATE_V1_L3[out["bitrate_index"]]
        rate = _MP3_RATE_V1[out["rate_index"]]
        out["bit_rate"] = kbps * 1000 if kbps else None
        out["sample_rate"] = rate
        out["frame_bytes"] = (144_000 * kbps // rate + out["padding"]
                              if kbps else None)
        out["samples_per_frame"] = 1152
    return out


def _probe_mp3(b: bytes) -> dict | None:
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        pos = 10 + _syncsafe(b[6:10])          # skip the ID3v2 tag
    # resync: scan forward a bounded window for a valid header whose
    # projected next frame also syncs (cuts false positives on 0xFF
    # bytes in junk prefixes)
    # bound len(b) - 3 so the LAST offset where a 4-byte header fits
    # (len(b) - 4) is still tried — range's exclusive end skipped it
    for off in range(pos, min(pos + 4096, max(len(b) - 3, 0))):
        hdr = _mp3_header(b, off)
        if hdr is None:
            continue
        fb = hdr.get("frame_bytes")
        if fb and off + fb + 4 <= len(b) and _mp3_header(b, off + fb) \
                is None:
            continue                           # next boundary not a sync
        pos = off
        break
    else:
        return None
    out = {"container": "mp3", "codec": f"{hdr['version']}_l{hdr['layer']}",
           "bit_rate": hdr.get("bit_rate"),
           "sample_rate": hdr.get("sample_rate"),
           "channels": 1 if hdr["channel_mode"] == "mono" else 2,
           "vbr": False, "n_frames": None, "duration_sec": None}
    if hdr.get("frame_bytes") is None:
        return out                             # recognized, not measured
    # Xing/Info VBR header sits after the side info of frame 1:
    # MPEG-1 side info is 32 bytes stereo-family / 17 bytes mono
    side = 17 if hdr["channel_mode"] == "mono" else 32
    xing_at = pos + 4 + (2 if hdr["crc"] else 0) + side
    tag = b[xing_at:xing_at + 4]
    spf, rate = hdr["samples_per_frame"], hdr["sample_rate"]
    if tag in (b"Xing", b"Info") and len(b) >= xing_at + 12:
        flags = struct.unpack(">I", b[xing_at + 4:xing_at + 8])[0]
        if flags & 0x1:                        # frame count present
            n = struct.unpack(">I", b[xing_at + 8:xing_at + 12])[0]
            out["vbr"] = tag == b"Xing"
            out["n_frames"] = n
            out["duration_sec"] = n * spf / rate
            return out
    # CBR path: count whole frames from the stream length
    n = max((len(b) - pos) // hdr["frame_bytes"], 0)
    out["n_frames"] = n
    out["duration_sec"] = n * spf / rate
    return out


def _walk_boxes(b: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for ISO-BMFF boxes."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", b[pos:pos + 4])[0]
        typ = b[pos + 4:pos + 8]
        head = 8
        if size == 1:                          # 64-bit largesize
            if pos + 16 > end:
                return
            size = struct.unpack(">Q", b[pos + 8:pos + 16])[0]
            head = 16
        elif size == 0:                        # box extends to EOF
            size = end - pos
        if size < head or pos + size > end:
            return                             # corrupt — stop cleanly
        yield typ, pos + head, pos + size
        pos += size


def _probe_mp4(b: bytes) -> dict | None:
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    out = {"container": "mp4", "codec": None, "duration_sec": None,
           "n_video_tracks": 0, "n_audio_tracks": 0}
    out["codec"] = b[8:12].decode("latin-1").strip()   # major brand
    for typ, s, e in _walk_boxes(b, 0, len(b)):
        if typ != b"moov":
            continue
        for t2, s2, e2 in _walk_boxes(b, s, e):
            if t2 == b"mvhd" and e2 - s2 >= 20:
                ver = b[s2]
                if ver == 1:
                    if e2 - s2 < 32:       # truncated v1: report the
                        continue           # container, leave fields NULL
                    ts = struct.unpack(">I", b[s2 + 20:s2 + 24])[0]
                    dur = struct.unpack(">Q", b[s2 + 24:s2 + 32])[0]
                else:
                    ts = struct.unpack(">I", b[s2 + 12:s2 + 16])[0]
                    dur = struct.unpack(">I", b[s2 + 16:s2 + 20])[0]
                if ts:
                    out["duration_sec"] = dur / ts
            elif t2 == b"trak":
                for t3, s3, e3 in _walk_boxes(b, s2, e2):
                    if t3 != b"mdia":
                        continue
                    for t4, s4, e4 in _walk_boxes(b, s3, e3):
                        if t4 == b"hdlr" and e4 - s4 >= 12:
                            handler = b[s4 + 8:s4 + 12]
                            if handler == b"vide":
                                out["n_video_tracks"] += 1
                            elif handler == b"soun":
                                out["n_audio_tracks"] += 1
    return out


_WAV_CODECS = {1: "pcm", 3: "pcm_float", 6: "g711_alaw", 7: "g711_mulaw",
               0x02: "ms_adpcm", 0x11: "ima_adpcm", 0x55: "mp3"}


def _probe_wav(b: bytes) -> dict | None:
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    out = {"container": "wav", "codec": "pcm"}
    pos = 12
    fmt = data_len = fact = None
    fmt_body = b""
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        sz = struct.unpack("<I", b[pos + 4:pos + 8])[0]
        if cid == b"fmt " and sz >= 16:
            fmt = struct.unpack("<HHIIHH", b[pos + 8:pos + 24])
            fmt_body = b[pos + 8:pos + 8 + sz]
        elif cid == b"data":
            data_len = sz
        elif cid == b"fact" and sz >= 4:
            fact = struct.unpack("<I", b[pos + 8:pos + 12])[0]
        pos += 8 + sz + (sz & 1)
    if fmt is None:
        return out
    code, channels, rate, _, block, bits = fmt
    if code == 0xFFFE and len(fmt_body) >= 26:   # EXTENSIBLE wrapper
        code = struct.unpack("<H", fmt_body[24:26])[0]
    out["codec"] = _WAV_CODECS.get(code, f"wav_0x{code:02x}")
    out.update({"channels": channels, "sample_rate": rate,
                "bit_rate": rate * channels * bits})
    if code in (0x02, 0x11):
        # ADPCM frames per block come from the fmt extension (or the
        # layout-derived count); the fact chunk is the exact total
        spb = struct.unpack("<H", fmt_body[18:20])[0] \
            if len(fmt_body) >= 20 else 0
        if not spb and block and channels:
            spb = ((block - (4 if code == 0x11 else 7) * channels) * 2
                   // channels + (1 if code == 0x11 else 2))
        n = fact
        if n is None and data_len and block and spb:
            n = (data_len // block) * spb
        if n is not None and rate:
            out["n_frames"] = n
            out["duration_sec"] = n / rate
        out["bit_rate"] = int(rate * block * 8 / spb) if spb else None
        return out
    if data_len is not None and block:
        out["duration_sec"] = (data_len // block) / rate
        out["n_frames"] = data_len // block
    return out


def _probe_aiff(b: bytes) -> dict | None:
    """AIFF/AIFC COMM header fields — no decode (round 9)."""
    if len(b) < 12 or b[:4] != b"FORM" or b[8:12] not in (b"AIFF",
                                                          b"AIFC"):
        return None
    out = {"container": "aiff", "codec": "pcm_be"}
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        sz = struct.unpack(">L", b[pos + 4:pos + 8])[0]
        if cid == b"COMM" and sz >= 18:
            ch, n, bits = struct.unpack(">hLh", b[pos + 8:pos + 16])
            rate = int(round(_f80_to_float(b[pos + 16:pos + 26])))
            out.update({"channels": ch, "sample_rate": rate,
                        "n_frames": n,
                        "bit_rate": rate * ch * bits})
            if sz >= 22:
                out["codec"] = b[pos + 26:pos + 30].decode(
                    "ascii", "replace").strip().lower() or "pcm_be"
            if rate:
                out["duration_sec"] = n / rate
            return out
        pos += 8 + sz + (sz & 1)
    return out


def _probe_au(b: bytes) -> dict | None:
    """Sun/NeXT AU header fields — no decode (round 9)."""
    if len(b) < 24 or b[:4] != b".snd":
        return None
    off, size, enc, rate, ch = struct.unpack(">LLLLL", b[4:24])
    out = {"container": "au",
           "codec": _AU_ENCODINGS.get(enc, f"au_{enc}"),
           "channels": ch, "sample_rate": rate}
    widths = {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 6: 4, 7: 8, 27: 1}
    w = widths.get(enc)
    if w and rate and ch and size not in (0, 0xFFFFFFFF):
        n = size // (w * ch)
        out["n_frames"] = n
        out["duration_sec"] = n / rate
        out["bit_rate"] = rate * ch * w * 8
    return out


def _probe_flac(b: bytes) -> dict | None:
    """STREAMINFO header fields (RFC 9639 §8.2) — no decode."""
    if b[:4] != b"fLaC" or len(b) < 8 + 34 or b[4] & 0x7F != 0:
        return None
    s = 8                                      # STREAMINFO body offset
    rate = (b[s + 10] << 12) | (b[s + 11] << 4) | (b[s + 12] >> 4)
    channels = ((b[s + 12] >> 1) & 0x7) + 1
    total = ((b[s + 13] & 0x0F) << 32) | struct.unpack(
        ">I", b[s + 14:s + 18])[0]
    out = {"container": "flac", "codec": "flac", "channels": channels,
           "sample_rate": rate or None, "vbr": True,
           "n_frames": total or None}
    if rate and total:
        out["duration_sec"] = total / rate
        out["bit_rate"] = int(8 * len(b) * rate / total)
    return out


def _probe_ogg(b: bytes) -> dict | None:
    """Ogg page framing + first-packet codec identification."""
    if b[:4] != b"OggS" or len(b) < 28 or b[4] != 0:
        return None
    nsegs = b[26]
    pkt = b[27 + nsegs:27 + nsegs + 64]
    out = {"container": "ogg", "codec": None}
    rate = None
    pre_skip = 0
    if pkt[:7] == b"\x01vorbis" and len(pkt) >= 28:
        out["codec"] = "vorbis"
        out["channels"] = pkt[11]
        rate = struct.unpack("<I", pkt[12:16])[0]
        out["sample_rate"] = rate or None
        nominal = struct.unpack("<i", pkt[20:24])[0]
        if nominal > 0:
            out["bit_rate"] = nominal
        out["vbr"] = nominal <= 0 or struct.unpack(
            "<i", pkt[16:20])[0] != nominal
    elif pkt[:8] == b"OpusHead" and len(pkt) >= 12:
        out["codec"] = "opus"
        out["channels"] = pkt[9]
        pre_skip = struct.unpack("<H", pkt[10:12])[0]
        rate = 48_000                          # granule clock, always
        out["sample_rate"] = rate
    elif pkt[:5] == b"\x7fFLAC":
        out["codec"] = "flac"
        fl = pkt.find(b"fLaC")
        if fl >= 0 and len(pkt) >= fl + 21:
            s2 = fl + 8
            rate = ((pkt[s2 + 10] << 12) | (pkt[s2 + 11] << 4)
                    | (pkt[s2 + 12] >> 4))
            out["sample_rate"] = rate or None
            out["channels"] = ((pkt[s2 + 12] >> 1) & 0x7) + 1
    elif pkt[:7] == b"\x80theora":
        out["codec"] = "theora"
        out["n_video_tracks"] = 1
    # duration: granule position of the FINAL page (single-stream
    # files; multiplexed streams would need per-serial tracking).
    # Walk pages forward via the segment tables — rfind(b"OggS") can
    # false-sync on the capture pattern inside a page BODY (entropy
    # bytes) and read granule from arbitrary packet data.
    granule = None
    pos = 0
    while pos + 27 <= len(b):
        if b[pos:pos + 4] != b"OggS" or b[pos + 4] != 0:
            break                              # lost sync / truncated
        ns = b[pos + 26]
        if pos + 27 + ns > len(b):
            break                              # truncated segment table
        body = sum(b[pos + 27:pos + 27 + ns])
        nxt = pos + 27 + ns + body
        if nxt > len(b):
            break                              # truncated page body
        g = struct.unpack("<q", b[pos + 6:pos + 14])[0]
        if g >= 0:
            granule = g                        # -1 = no packet finishes
        pos = nxt
    if rate and granule is not None and granule > 0:
        out["duration_sec"] = max(granule - pre_skip, 0) / rate
        if out["codec"] != "opus":
            out["n_frames"] = granule
    return out


def _probe_webp(b: bytes) -> dict | None:
    """RIFF/WEBP chunk framing: VP8 / VP8L / VP8X dimensions."""
    if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    four = b[12:16]
    out = {"container": "webp"}
    if four == b"VP8 " and len(b) >= 30:
        if b[23:26] != b"\x9d\x01\x2a":        # lossy start code
            return out
        out["codec"] = "vp8"
        out["width"] = struct.unpack("<H", b[26:28])[0] & 0x3FFF
        out["height"] = struct.unpack("<H", b[28:30])[0] & 0x3FFF
    elif four == b"VP8L" and len(b) >= 25:
        if b[20] != 0x2F:                      # lossless signature
            return out
        v = struct.unpack("<I", b[21:25])[0]
        out["codec"] = "vp8l"
        out["width"] = (v & 0x3FFF) + 1
        out["height"] = ((v >> 14) & 0x3FFF) + 1
    elif four == b"VP8X" and len(b) >= 30:
        out["codec"] = "vp8x"
        out["width"] = int.from_bytes(b[24:27], "little") + 1
        out["height"] = int.from_bytes(b[27:30], "little") + 1
    return out


def _probe_image(b: bytes) -> dict | None:
    """Width/height from the header only (no pixel work)."""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return {"container": "png", "width": w, "height": h}
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return {"container": "bmp", "width": w, "height": abs(h)}
    if b[:2] == b"P6":
        try:
            # comment-aware (a '#' runs to end of line — legal per the
            # spec and handled by decode_ppm; the naive split returned
            # NULL dims for payloads the pipeline decodes fine)
            toks = [t for ln in b[2:400].split(b"\n")
                    for t in ln.split(b"#", 1)[0].split()]
            return {"container": "ppm", "width": int(toks[0]),
                    "height": int(toks[1])}
        except (ValueError, IndexError):
            return {"container": "ppm"}
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return {"container": "gif", "width": w, "height": h}
    if b[:4] in (b"II\x2a\x00", b"MM\x00\x2a") and len(b) >= 8:
        bo = "<" if b[:2] == b"II" else ">"    # TIFF IFD walk (round 9)
        out = {"container": "tiff"}
        (ifd_at,) = struct.unpack_from(f"{bo}I", b, 4)
        if ifd_at + 2 <= len(b):
            (n,) = struct.unpack_from(f"{bo}H", b, ifd_at)
            for i in range(min(n, 64)):
                at = ifd_at + 2 + 12 * i
                if at + 12 > len(b):
                    break
                tag, typ = struct.unpack_from(f"{bo}HH", b, at)
                if tag in (256, 257) and typ in (3, 4):
                    v = struct.unpack_from(
                        f"{bo}H" if typ == 3 else f"{bo}I", b,
                        at + 8)[0]
                    out["width" if tag == 256 else "height"] = v
        return out
    if b[:2] == b"\xff\xd8":                   # JPEG: scan for SOF
        pos = 2
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                return {"container": "jpeg"}
            marker = b[pos + 1]
            if marker == 0xFF:                 # fill byte before marker
                pos += 1
                continue
            # every SOFn carries dimensions at the same offsets (C0-CF
            # minus the non-frame C4/C8/CC: DHT/JPG/DAC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8,
                                                         0xCC):
                if pos + 9 <= len(b):
                    h, w = struct.unpack(">HH", b[pos + 5:pos + 9])
                    return {"container": "jpeg", "width": w, "height": h,
                            "codec": "progressive" if marker == 0xC2
                            else "baseline"}
                return {"container": "jpeg"}
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seg = struct.unpack(">H", b[pos + 2:pos + 4])[0]
            pos += 2 + seg
        return {"container": "jpeg"}
    return None


_PROBE_FIELDS = (("container", "string"), ("codec", "string"),
                 ("duration_sec", "double"), ("bit_rate", "long"),
                 ("sample_rate", "long"), ("channels", "int"),
                 ("n_frames", "long"), ("vbr", "boolean"),
                 ("width", "int"), ("height", "int"),
                 ("n_video_tracks", "int"), ("n_audio_tracks", "int"))

PROBE_SCHEMA = T.StructType([
    T.StructField(n, {"string": T.StringType(), "double": T.DoubleType(),
                      "long": T.LongType(), "int": T.IntegerType(),
                      "boolean": T.BooleanType()}[t])
    for n, t in _PROBE_FIELDS])


_INT_LIMITS = {"int": (1 << 31) - 1, "long": (1 << 63) - 1}
_FIELD_TYPES = dict(_PROBE_FIELDS)


def _clamp_ints(out: dict) -> dict:
    """NULL out header-derived ints that overflow their schema type —
    corrupt headers (e.g. a PNG claiming width 2^32-1, a PPM with a
    100-digit dimension) would otherwise wrap under Arrow's unsafe cast
    or raise DURING serialization, where probe_payload's try/except
    can no longer protect the scan."""
    for n, t in _FIELD_TYPES.items():
        lim = _INT_LIMITS.get(t)
        v = out.get(n)
        if lim is not None and v is not None                 and not (0 <= int(v) <= lim):
            out[n] = None
    return out


def probe_payload(b: bytes | None) -> dict:
    """Probe one payload; always returns the full field dict."""
    out = dict.fromkeys(n for n, _ in _PROBE_FIELDS)
    out["container"] = "unknown"
    if not b or len(b) < 4:
        return out
    try:
        for fn in (_probe_image, _probe_webp, _probe_wav, _probe_flac,
                   _probe_aiff, _probe_au, _probe_ogg, _probe_mp4,
                   _probe_mp3):
            r = fn(b)
            if r is not None:
                out.update(r)
                return _clamp_ints(out)
    except (struct.error, ValueError, IndexError, OverflowError):
        pass                                   # corrupt → unknown row
    return out


def media_probe(df: DataFrame, payload_col: str = "payload",
                out_col: str = "probe") -> DataFrame:
    """Append a ``probe`` struct column (see ``PROBE_SCHEMA``) per row.

    One Arrow-batched pass; corrupt payloads yield ``container =
    'unknown'`` rows, never executor errors.  Narrow map — no shuffle,
    scales with the scan.
    """
    ensure_udf_serializable()

    @F.pandas_udf(PROBE_SCHEMA)
    def _probe(s: pd.Series) -> pd.DataFrame:
        rows = [probe_payload(v) for v in s]
        return pd.DataFrame(rows, columns=[n for n, _ in _PROBE_FIELDS])

    return df.withColumn(out_col, _probe(F.col(payload_col)))


# ---------------------------------------------------------------------------
# deterministic builders (tests + gate fixtures): write valid streams by
# the same public layout rules, with caller-chosen field values
# ---------------------------------------------------------------------------


def build_mp3(n_frames: int, bitrate_index: int = 9, rate_index: int = 0,
              mono: bool = False, xing: bool = False,
              id3_size: int = 0, seed: int = 0) -> bytes:
    """Serialize a valid MPEG-1 Layer III CBR stream (header-accurate
    frames, deterministic junk payload)."""
    kbps = _MP3_BITRATE_V1_L3[bitrate_index]
    rate = _MP3_RATE_V1[rate_index]
    rng = np.random.default_rng(seed)
    chunks = []
    if id3_size:
        body = bytes(rng.integers(0, 128, id3_size, dtype=np.uint8))
        chunks.append(b"ID3\x03\x00\x00"
                      + bytes([(id3_size >> 21) & 0x7F,
                               (id3_size >> 14) & 0x7F,
                               (id3_size >> 7) & 0x7F, id3_size & 0x7F])
                      + body)
    mode_bits = 0b11 if mono else 0b00
    for i in range(n_frames):
        pad = 0
        h = (0x7FF << 21) | (0b11 << 19) | (0b01 << 17) | (1 << 16) \
            | (bitrate_index << 12) | (rate_index << 10) | (pad << 9) \
            | (mode_bits << 6)
        frame_bytes = 144_000 * kbps // rate + pad
        draw = rng.integers(0, 255, frame_bytes - 4, dtype=np.uint8)
        # keep payload sync-free so the resync scan can't misfire
        # (vectorized mask — the old per-byte Python loop was a measured
        # hot spot of the fused media kernel; 0xFF -> 0xFE as before)
        draw[draw == 0xFF] = 0xFE
        body = bytearray(draw.tobytes())
        if i == 0 and xing:
            side = 17 if mono else 32
            at = side                          # relative to body start
            body[at:at + 4] = b"Xing"
            body[at + 4:at + 8] = struct.pack(">I", 0x1)
            body[at + 8:at + 12] = struct.pack(">I", n_frames)
        chunks.append(struct.pack(">I", h) + bytes(body))
    return b"".join(chunks)


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _ogg_crc_table() -> list[int]:
    table = []
    for byte in range(256):
        r = byte << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
        table.append(r)
    return table


_OGG_CRC_TABLE = _ogg_crc_table()


def _ogg_crc(data: bytes) -> int:
    """Ogg page CRC-32: poly 0x04C11DB7, init 0, no reflection.
    Table-driven byte-at-a-time (identical to the textbook bit-loop;
    the per-bit form was a measured hot spot of the media kernel)."""
    r = 0
    table = _OGG_CRC_TABLE
    for byte in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ table[(r >> 24) ^ byte]
    return r


def _ogg_page(serial: int, seq: int, granule: int, header_type: int,
              packet: bytes) -> bytes:
    """Serialize one Ogg page holding one packet (≤255·255 bytes)."""
    segs = [255] * (len(packet) // 255) + [len(packet) % 255]
    head = (b"OggS\x00" + bytes([header_type])
            + struct.pack("<q", granule) + struct.pack("<I", serial)
            + struct.pack("<I", seq) + b"\x00\x00\x00\x00"
            + bytes([len(segs)]) + bytes(segs))
    page = head + packet
    crc = _ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def build_ogg_vorbis(n_samples: int, sample_rate: int = 44_100,
                     channels: int = 2, bitrate_nominal: int = 128_000,
                     serial: int = 1, seed: int = 0) -> bytes:
    """Serialize a minimal valid Ogg-Vorbis skeleton: page 0 carries the
    identification header (version 0, channels, rate, bitrates,
    blocksizes, framing bit), the final EOS page carries the granule
    position = total PCM samples.  Page CRCs are real."""
    ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
             + struct.pack("<I", sample_rate)
             + struct.pack("<iii", 0, bitrate_nominal, 0)
             + bytes([0xB8])                   # blocksizes 256/2048
             + b"\x01")                        # framing bit
    rng = np.random.default_rng(seed)
    body = bytes(rng.integers(0, 255, 64, dtype=np.uint8))
    return (_ogg_page(serial, 0, 0, 0x02, ident)           # BOS
            + _ogg_page(serial, 1, n_samples, 0x04, body))  # EOS


def build_webp(width: int, height: int, lossless: bool = False,
               seed: int = 0) -> bytes:
    """Serialize a WebP header (VP8 lossy or VP8L lossless) with valid
    dimension fields and deterministic junk entropy data."""
    rng = np.random.default_rng(seed)
    junk = bytes(rng.integers(0, 255, 24, dtype=np.uint8))
    if lossless:
        if not (1 <= width <= 0x4000 and 1 <= height <= 0x4000):
            raise ValueError("VP8L dims must be in [1, 16384]")
        v = (width - 1) | ((height - 1) << 14)
        payload = bytes([0x2F]) + struct.pack("<I", v) + junk
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    else:
        if not (0 <= width < 0x4000 and 0 <= height < 0x4000):
            raise ValueError("VP8 dims must fit 14 bits")
        payload = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
                   + struct.pack("<HH", width, height) + junk)
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(chunk) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def build_mp4(duration_sec: float, timescale: int = 1000,
              n_video: int = 1, n_audio: int = 1,
              brand: bytes = b"isom") -> bytes:
    """Serialize a minimal valid ISO-BMFF skeleton (ftyp + moov)."""
    mvhd = _box(b"mvhd", b"\x00" + b"\x00" * 11
                + struct.pack(">II", timescale,
                              int(round(duration_sec * timescale)))
                + b"\x00" * 80)
    traks = []
    for handler in [b"vide"] * n_video + [b"soun"] * n_audio:
        hdlr = _box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 13)
        traks.append(_box(b"trak", _box(b"mdia", hdlr)))
    moov = _box(b"moov", mvhd + b"".join(traks))
    return _box(b"ftyp", brand + struct.pack(">I", 0) + brand) + moov
