"""IMA (DVI4) and Microsoft ADPCM WAV codecs — pure numpy, both
directions, vectorized across blocks.

Round-9 collapse of the adaptive-codec scope cut
(``multimodal.decode_wav`` previously raised ``NotImplementedError``
for WAV format codes 0x11 / 0x02).  Both codecs are fully
deterministic integer state machines — unlike the MP3/Vorbis DSP tier
there is an in-container validation path: a spec-table decoder plus an
own encoder give byte-pinned goldens, hand-computed step-table
fixtures, and exact encoder-reconstruction equality (the encoder
simulates the decoder, so ``decode(encode(x))`` equals the encoder's
internal reconstruction bit-for-bit).

Scale note: blocks are independent, so the decoders vectorize across
the block axis in numpy and loop only over the ≤505 samples inside a
block — the same shape as ``flac.py``'s residual reconstruction.  At
cluster scale this runs inside Arrow-batched ``mapInPandas`` with
embarrassing parallelism across rows.

Reference parity note: Tencent fast-causal-inference has no media
surface at all (builder-brief mandate for training-data pipelines);
the bit layouts follow the public IMA ADPCM spec (Intel/DVI, as in
RFC 3551 §4.5.1 state machine) and the Microsoft WAVE ADPCM
documentation (MSADPCM coefficient/adaptation tables).
"""
from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- IMA

IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767], dtype=np.int64)

IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_step(pred, index, nib):
    """One IMA decode step, vectorized over an array of parallel block
    states.  Returns (new_pred, new_index)."""
    step = IMA_STEP_TABLE[index]
    diff = (step >> 3) \
        + np.where(nib & 4, step, 0) \
        + np.where(nib & 2, step >> 1, 0) \
        + np.where(nib & 1, step >> 2, 0)
    pred = np.clip(pred + np.where(nib & 8, -diff, diff), -32768, 32767)
    index = np.clip(index + IMA_INDEX_TABLE[nib & 7], 0, 88)
    return pred, index


def decode_ima_blocks(data: bytes, block_align: int, channels: int,
                      samples_per_block: int) -> np.ndarray:
    """Decode IMA-ADPCM block data into an (n_samples, channels) int16
    array.  Block layout: per channel a 4-byte header (int16 predictor
    = first output sample, uint8 step index, reserved), then 4-byte
    data words round-robin across channels, 8 low-nibble-first samples
    per word."""
    if block_align < 4 * channels:
        raise ValueError("IMA block_align smaller than headers")
    nb = len(data) // block_align
    if nb == 0:
        return np.zeros((0, channels), dtype=np.int16)
    blk = np.frombuffer(data, np.uint8,
                        nb * block_align).reshape(nb, block_align)
    hdr = blk[:, :4 * channels].reshape(nb, channels, 4).astype(np.int64)
    pred = hdr[:, :, 0] | (hdr[:, :, 1] << 8)
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)
    index = np.clip(hdr[:, :, 2], 0, 88)
    body = blk[:, 4 * channels:]
    nwords = body.shape[1] // (4 * channels)
    words = body[:, :nwords * 4 * channels].astype(np.int64).reshape(
        nb, nwords, channels, 4)
    # each byte: low nibble is the EARLIER sample
    nib = np.stack([words & 0x0F, words >> 4],
                   axis=-1).reshape(nb, nwords, channels, 8)
    nib = nib.transpose(0, 2, 1, 3).reshape(nb, channels, nwords * 8)
    n_out = min(samples_per_block, nwords * 8 + 1)
    out = np.empty((nb, channels, n_out), dtype=np.int64)
    out[:, :, 0] = pred
    for s in range(n_out - 1):
        pred, index = _ima_step(pred, index, nib[:, :, s])
        out[:, :, s + 1] = pred
    return out.transpose(0, 2, 1).reshape(-1, channels).astype(np.int16)


def encode_ima_blocks(x: np.ndarray, block_align: int
                      ) -> tuple[bytes, np.ndarray]:
    """Encode an (n, channels) int16 array as IMA-ADPCM block data.
    Returns (block bytes, the encoder's internal reconstruction) — the
    reconstruction equals ``decode_ima_blocks`` output bit-for-bit,
    which the tests pin (lossy codec, exact decoder mirror)."""
    x = np.asarray(x, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    spb = (block_align - 4 * ch) * 2 // ch + 1
    nblocks = -(-n // spb)
    pad = nblocks * spb - n
    if pad:
        x = np.vstack([x, np.repeat(x[-1:], pad, axis=0)])
    xs = x.reshape(nblocks, spb, ch).transpose(0, 2, 1)  # (nb, ch, spb)
    pred = xs[:, :, 0].copy()
    # initial step index: best match of the first delta's magnitude
    first_diff = np.abs(xs[:, :, 1] - xs[:, :, 0]) if spb > 1 else \
        np.zeros_like(pred)
    index = np.searchsorted(IMA_STEP_TABLE, first_diff).clip(0, 88)
    recon = np.empty_like(xs)
    recon[:, :, 0] = pred
    nibs = np.empty((nblocks, ch, spb - 1), dtype=np.int64)
    for s in range(spb - 1):
        step = IMA_STEP_TABLE[index]
        delta = xs[:, :, s + 1] - pred
        sign = (delta < 0).astype(np.int64) * 8
        mag = np.abs(delta)
        b4 = (mag >= step).astype(np.int64)
        mag = mag - b4 * step
        b2 = (mag >= (step >> 1)).astype(np.int64)
        mag = mag - b2 * (step >> 1)
        b1 = (mag >= (step >> 2)).astype(np.int64)
        nib = sign | (b4 << 2) | (b2 << 1) | b1
        pred, index = _ima_step(pred, index, nib)
        nibs[:, :, s] = nib
        recon[:, :, s + 1] = pred
    # serialize: headers then 4-byte words round-robin across channels
    hdr = np.zeros((nblocks, ch, 4), dtype=np.uint8)
    p0 = xs[:, :, 0] & 0xFFFF
    hdr[:, :, 0] = p0 & 0xFF
    hdr[:, :, 1] = p0 >> 8
    hdr[:, :, 2] = np.searchsorted(
        IMA_STEP_TABLE, first_diff).clip(0, 88).astype(np.uint8)
    nwords = (block_align - 4 * ch) // (4 * ch)
    want = nwords * 8
    nib_pad = np.zeros((nblocks, ch, want), dtype=np.int64)
    nib_pad[:, :, :min(spb - 1, want)] = nibs[:, :, :want]
    w = nib_pad.reshape(nblocks, ch, nwords, 8)
    lo = w[..., 0::2]
    hi = w[..., 1::2]
    by = (lo | (hi << 4)).astype(np.uint8)            # (nb, ch, nw, 4)
    by = by.transpose(0, 2, 1, 3).reshape(nblocks, -1)
    blocks = np.concatenate([hdr.reshape(nblocks, -1), by], axis=1)
    recon_flat = recon.transpose(0, 2, 1).reshape(-1, ch)[:n]
    return blocks.tobytes(), recon_flat.astype(np.int16)


# ----------------------------------------------------------------- MS

MS_COEFS = np.array([
    [256, 0], [512, -256], [0, 0], [192, 64], [240, 0], [460, -208],
    [392, -232]], dtype=np.int64)

MS_ADAPT = np.array([
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230], dtype=np.int64)


def _ms_step(s1, s2, delta, c1, c2, nib_u):
    """One MSADPCM decode step over parallel block states.  ``nib_u``
    is the unsigned nibble 0..15.  Returns (sample, new_delta)."""
    nib_s = np.where(nib_u >= 8, nib_u - 16, nib_u)
    pred = (s1 * c1 + s2 * c2) >> 8
    samp = np.clip(pred + nib_s * delta, -32768, 32767)
    delta = np.maximum((MS_ADAPT[nib_u] * delta) >> 8, 16)
    return samp, delta


def decode_ms_blocks(data: bytes, block_align: int, channels: int,
                     samples_per_block: int,
                     coefs: np.ndarray | None = None) -> np.ndarray:
    """Decode MSADPCM block data into (n_samples, channels) int16.
    Block layout: uint8 predictor per channel, int16 idelta per
    channel, int16 sample1 per channel, int16 sample2 per channel,
    then nibbles high-first, round-robin across channels."""
    if coefs is None:
        coefs = MS_COEFS
    hdr_bytes = 7 * channels
    if block_align < hdr_bytes + (1 if channels == 1 else 0):
        raise ValueError("MSADPCM block_align smaller than headers")
    nb = len(data) // block_align
    if nb == 0:
        return np.zeros((0, channels), dtype=np.int16)
    blk = np.frombuffer(data, np.uint8,
                        nb * block_align).reshape(nb, block_align)
    bpred = blk[:, :channels].astype(np.int64)
    if (bpred >= len(coefs)).any():
        raise ValueError("MSADPCM predictor index out of range")

    def _i16(off):
        lo = blk[:, off:off + 2 * channels:2].astype(np.int64)
        hi = blk[:, off + 1:off + 2 * channels:2].astype(np.int64)
        v = lo | (hi << 8)
        return np.where(v >= 0x8000, v - 0x10000, v)

    delta = _i16(channels)
    s1 = _i16(3 * channels)
    s2 = _i16(5 * channels)
    c1 = coefs[bpred, 0]
    c2 = coefs[bpred, 1]
    body = blk[:, hdr_bytes:].astype(np.int64)
    nib = np.stack([body >> 4, body & 0x0F],
                   axis=-1).reshape(nb, -1)          # high nibble first
    # clamp the header-declared count to what the block can physically
    # hold: a corrupt/malicious wSamplesPerBlock=65535 with a tiny
    # block_align must not force an allocation thousands of times the
    # payload size (mirrors the n_out = min(...) guard in
    # decode_ima_blocks)
    max_spb = (block_align - hdr_bytes) * 2 // channels + 2
    samples_per_block = max(2, min(samples_per_block, max_spb))
    n_nib_per_ch = (samples_per_block - 2)
    out = np.empty((nb, samples_per_block, channels), dtype=np.int64)
    out[:, 0, :] = s2                                 # s2 is the OLDER
    out[:, 1, :] = s1
    avail = nib.shape[1] // channels
    steps = min(n_nib_per_ch, avail)
    for s in range(steps):
        chunk = nib[:, s * channels:(s + 1) * channels]
        samp, delta = _ms_step(s1, s2, delta, c1, c2, chunk)
        s2, s1 = s1, samp
        out[:, s + 2, :] = samp
    return out[:, :steps + 2, :].reshape(-1, channels).astype(np.int16)


def encode_ms_blocks(x: np.ndarray, block_align: int,
                     real_counts: np.ndarray | None = None
                     ) -> tuple[bytes, np.ndarray]:
    """Encode (n, channels) int16 as MSADPCM blocks.  Per block, all 7
    standard predictors are evaluated (vectorized across blocks) and
    the minimum-total-|error| one wins — predictor 1 (512, -256) makes
    arithmetic ramps round-trip EXACTLY (pred = 2·s1 − s2), which the
    oracle rows exploit.  Returns (bytes, internal reconstruction)."""
    x = np.asarray(x, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    spb = (block_align - 7 * ch) * 2 // ch + 2
    nblocks = -(-n // spb)
    pad = nblocks * spb - n
    if pad:
        x = np.vstack([x, np.repeat(x[-1:], pad, axis=0)])
    xs = x.reshape(nblocks, spb, ch)                  # (nb, spb, ch)
    # real (un-padded) samples per block: by default only the LAST
    # block is partial; the batched API passes explicit counts because
    # each batched signal's final block sits mid-array.  Predictor
    # selection must ignore padding — otherwise a predictor that is
    # exact on the real samples but drifts on the repeated-constant
    # tail loses to one that is merely close on both.
    if real_counts is not None:
        real = np.asarray(real_counts, dtype=np.int64)
        if len(real) != nblocks:
            raise ValueError("real_counts length != block count")
    else:
        real = np.minimum(np.maximum(n - np.arange(nblocks) * spb, 0),
                          spb)
    best_err = None
    for pidx in range(len(MS_COEFS)):
        c1 = np.full((nblocks, ch), MS_COEFS[pidx, 0])
        c2 = np.full((nblocks, ch), MS_COEFS[pidx, 1])
        s2 = xs[:, 0, :].copy()
        s1 = xs[:, 1, :].copy()
        # initial delta: scaled third-sample residual, floor 16
        if spb > 2:
            r0 = np.abs(xs[:, 2, :] - ((s1 * c1 + s2 * c2) >> 8))
        else:
            r0 = np.zeros_like(s1)
        delta = np.maximum(r0 >> 2, 16)
        idelta0 = delta.copy()
        nibs = np.empty((nblocks, spb - 2, ch), dtype=np.int64)
        recon = np.empty_like(xs)
        recon[:, 0, :] = s2
        recon[:, 1, :] = s1
        err = np.zeros(nblocks, dtype=np.int64)
        for s in range(spb - 2):
            pred = (s1 * c1 + s2 * c2) >> 8
            want = xs[:, s + 2, :]
            nib_s = np.clip(
                np.floor_divide(want - pred + (delta >> 1)
                                * np.sign(want - pred), delta),
                -8, 7)
            nib_u = (nib_s & 0x0F)
            samp, delta = _ms_step(s1, s2, delta, c1, c2, nib_u)
            err += np.abs(samp - want).sum(axis=1) * (s + 2 < real)
            s2, s1 = s1, samp
            nibs[:, s, :] = nib_u
            recon[:, s + 2, :] = samp
        cand = (nibs, recon, idelta0)
        if best_err is None:
            best_err = err.copy()
            chosen = np.zeros(nblocks, dtype=np.int64)
            all_c = {pidx: cand}
        else:
            better = err < best_err
            best_err = np.where(better, err, best_err)
            chosen = np.where(better, pidx, chosen)
            all_c[pidx] = cand
        if best_err.max() == 0:
            # every block already encodes its real samples exactly —
            # later predictors cannot beat 0 (strict < keeps the
            # earlier winner on ties), so the search is over.  The
            # common constant/ramp cases stop after 1-2 of 7 passes.
            break
    # assemble per-block using each block's winning predictor
    nib_sel = np.empty((nblocks, spb - 2, ch), dtype=np.int64)
    recon_sel = np.empty((nblocks, spb, ch), dtype=np.int64)
    idelta_sel = np.empty((nblocks, ch), dtype=np.int64)
    for pidx, (nibs, recon, id0) in all_c.items():
        m = chosen == pidx
        nib_sel[m] = nibs[m]
        recon_sel[m] = recon[m]
        idelta_sel[m] = id0[m]
    out = bytearray()
    body_len = block_align - 7 * ch
    for b in range(nblocks):
        blkb = bytearray()
        blkb += bytes(int(chosen[b]) for _ in range(ch))
        for c in range(ch):
            blkb += struct.pack("<h", int(idelta_sel[b, c]))
        for c in range(ch):
            blkb += struct.pack("<h", int(xs[b, 1, c]))
        for c in range(ch):
            blkb += struct.pack("<h", int(xs[b, 0, c]))
        flat = nib_sel[b].reshape(-1)                 # sample-major, ch rr
        if len(flat) % 2:
            flat = np.concatenate([flat, [0]])
        by = ((flat[0::2] << 4) | flat[1::2]).astype(np.uint8).tobytes()
        blkb += by.ljust(body_len, b"\x00")[:body_len]
        out += blkb
    recon_flat = recon_sel.reshape(-1, ch)[:n]
    return bytes(out), recon_flat.astype(np.int16)


# ------------------------------------------------------- WAV wrappers

def encode_wav_ima(samples: np.ndarray, sample_rate: int = 16_000,
                   block_align: int = 256) -> bytes:
    """Serialize int16 samples ((n,) mono or (n, ch)) as an IMA-ADPCM
    WAV (format code 0x11) with fmt extension + fact chunk."""
    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    spb = (block_align - 4 * ch) * 2 // ch + 1
    data, _ = encode_ima_blocks(x, block_align)
    avg_bps = sample_rate * block_align // spb
    fmt = struct.pack("<HHIIHHHH", 0x11, ch, sample_rate, avg_bps,
                      block_align, 4, 2, spb)
    return _riff_wrap(fmt, n, data)


def encode_wav_ms(samples: np.ndarray, sample_rate: int = 16_000,
                  block_align: int = 256) -> bytes:
    """Serialize int16 samples as a Microsoft-ADPCM WAV (format code
    0x02) with the standard 7-coefficient table in the fmt extension."""
    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    spb = (block_align - 7 * ch) * 2 // ch + 2
    data, _ = encode_ms_blocks(x, block_align)
    avg_bps = sample_rate * block_align // spb
    ext = struct.pack("<HH", spb, len(MS_COEFS))
    for c1, c2 in MS_COEFS:
        ext += struct.pack("<hh", int(c1), int(c2))
    fmt = struct.pack("<HHIIHHH", 0x02, ch, sample_rate, avg_bps,
                      block_align, 4, len(ext)) + ext
    return _riff_wrap(fmt, n, data)


def _riff_wrap(fmt_body: bytes, n_samples: int, data: bytes) -> bytes:
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if len(fmt_body) % 2:
        chunks += b"\x00"
    chunks += b"fact" + struct.pack("<II", 4, n_samples)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_adpcm_wav_data(code: int, data: bytes, fmt_body: bytes,
                          channels: int, block_align: int,
                          n_samples: int | None,
                          extensible: bool = False) -> np.ndarray:
    """Dispatch parsed WAV chunks (from ``decode_wav``) to the right
    block decoder; trims to the ``fact`` sample count when present.

    ``extensible`` marks a WAVE_FORMAT_EXTENSIBLE fmt chunk whose
    SubFormat GUID was unwrapped to ``code``: there the Samples union
    at bytes 18-19 is still wSamplesPerBlock, but bytes 20+ are
    dwChannelMask + the GUID — NOT an inline MSADPCM coefficient
    table — so the coef parse must be skipped (standard MS_COEFS
    apply) rather than reading channel-mask bytes as coefficients."""
    if code == 0x11:
        spb = (block_align - 4 * channels) * 2 // channels + 1
        if len(fmt_body) >= 20:
            spb = struct.unpack("<H", fmt_body[18:20])[0] or spb
        out = decode_ima_blocks(data, block_align, channels, spb)
    elif code == 0x02:
        spb = (block_align - 7 * channels) * 2 // channels + 2
        coefs = None
        if len(fmt_body) >= 20:
            spb = struct.unpack("<H", fmt_body[18:20])[0] or spb
        if not extensible and len(fmt_body) >= 22:
            ncoef = struct.unpack("<H", fmt_body[20:22])[0]
            if ncoef and len(fmt_body) >= 22 + 4 * ncoef:
                coefs = np.array(
                    [struct.unpack("<hh", fmt_body[22 + 4 * i:
                                                   26 + 4 * i])
                     for i in range(ncoef)], dtype=np.int64)
        out = decode_ms_blocks(data, block_align, channels, spb, coefs)
    else:                                             # pragma: no cover
        raise ValueError(f"not an ADPCM format code: {code}")
    if n_samples is not None:
        out = out[:n_samples]
    return out


# ------------------------------------------------------- batched APIs

def _pad_blocks(signals, spb: int):
    """Pad each mono signal to a whole number of blocks (repeating the
    final sample, as the single-signal encoders do) and stack them into
    one contiguous sample array.  Returns (stacked (N, 1) int64 array,
    per-signal block counts, per-signal true lengths)."""
    xs, counts, lens = [], [], []
    for s in signals:
        s = np.asarray(s, dtype=np.int64).reshape(-1)
        n = len(s)
        nb = max(1, -(-n // spb))
        pad = nb * spb - n
        if pad:
            tail = s[-1] if n else 0
            s = np.concatenate([s, np.full(pad, tail, dtype=np.int64)])
        xs.append(s)
        counts.append(nb)
        lens.append(n)
    return np.concatenate(xs)[:, None], counts, lens


def encode_ima_batch(signals, block_align: int = 256) -> list[bytes]:
    """Encode MANY mono int16 signals in ONE vectorized pass.

    The per-sample state loop costs one set of numpy dispatches per
    in-block sample REGARDLESS of how many blocks ride the batch axis —
    so batching a whole Arrow batch of documents through one call
    amortizes the Python overhead ~|batch|× versus per-document encode
    (the 100 TB pattern: per-row state machines batch across rows).
    Returns per-signal ADPCM block bytes; bit-identical to per-signal
    ``encode_ima_blocks`` (blocks are independent by construction)."""
    spb = (block_align - 4) * 2 + 1
    big, counts, _ = _pad_blocks(signals, spb)
    data, _ = encode_ima_blocks(big, block_align)
    out = []
    pos = 0
    for nb in counts:
        out.append(data[pos:pos + nb * block_align])
        pos += nb * block_align
    return out


def decode_ima_batch(datas, block_align: int,
                     lengths) -> list[np.ndarray]:
    """Decode many mono IMA block payloads in one vectorized pass,
    trimming each to its true sample count."""
    spb = (block_align - 4) * 2 + 1
    counts = [len(d) // block_align for d in datas]
    big = decode_ima_blocks(b"".join(datas), block_align, 1, spb)
    out = []
    pos = 0
    for nb, n in zip(counts, lengths):
        out.append(big[pos:pos + nb * spb, 0][:n])
        pos += nb * spb
    return out


def encode_ms_batch(signals, block_align: int = 256) -> list[bytes]:
    """Batched mono MSADPCM encode — see :func:`encode_ima_batch`."""
    spb = (block_align - 7) * 2 + 2
    big, counts, lens = _pad_blocks(signals, spb)
    real = np.concatenate([
        np.minimum(np.maximum(n - np.arange(nb) * spb, 0), spb)
        for nb, n in zip(counts, lens)])
    data, _ = encode_ms_blocks(big, block_align, real_counts=real)
    out = []
    pos = 0
    for nb in counts:
        out.append(data[pos:pos + nb * block_align])
        pos += nb * block_align
    return out


def decode_ms_batch(datas, block_align: int,
                    lengths) -> list[np.ndarray]:
    """Batched mono MSADPCM decode — see :func:`decode_ima_batch`."""
    spb = (block_align - 7) * 2 + 2
    counts = [len(d) // block_align for d in datas]
    big = decode_ms_blocks(b"".join(datas), block_align, 1, spb)
    out = []
    pos = 0
    for nb, n in zip(counts, lengths):
        out.append(big[pos:pos + nb * spb, 0][:n])
        pos += nb * spb
    return out


# --------------------------------------------------------------- IMA4
# Apple QuickTime 'ima4' (AIFC / MOV): 34-byte packets per channel,
# each = a 2-byte big-endian header (top 9 bits: initial predictor
# high bits, low 7 bits: step index) + 32 nibble bytes = 64 samples,
# low nibble first.  The sample expansion is the SAME IMA state
# machine as WAV DVI4 (`_ima_step`); only the packet framing and the
# quantized header predictor differ.  Public layout (Apple QT docs /
# the widely-documented ima4 packet format).

IMA4_PACKET = 34
IMA4_SAMPLES = 64


def decode_ima4_packets(data: bytes, channels: int = 1) -> np.ndarray:
    """Decode Apple 'ima4' packets into (n_samples, channels) int16.
    Packets alternate per channel within each 64-sample frame group.
    Vectorized across ALL packets (each packet header re-seeds the
    state, so packets are independent like WAV IMA blocks)."""
    if channels <= 0:
        raise ValueError("ima4: bad channel count")
    groups = len(data) // (IMA4_PACKET * channels)
    if groups == 0:
        return np.zeros((0, channels), dtype=np.int16)
    npk = groups * channels
    blk = np.frombuffer(data, np.uint8,
                        npk * IMA4_PACKET).reshape(npk, IMA4_PACKET)
    hdr = (blk[:, 0].astype(np.int64) << 8) | blk[:, 1]
    index = np.clip(hdr & 0x7F, 0, 88)
    pred = hdr & 0xFF80                      # top 9 bits, then sign
    pred = np.where(pred >= 0x8000, pred - 0x10000, pred)
    body = blk[:, 2:].astype(np.int64)
    nib = np.stack([body & 0x0F, body >> 4],    # low nibble first
                   axis=-1).reshape(npk, IMA4_SAMPLES)
    out = np.empty((npk, IMA4_SAMPLES), dtype=np.int64)
    for s in range(IMA4_SAMPLES):
        pred, index = _ima_step(pred, index, nib[:, s])
        out[:, s] = pred
    return (out.reshape(groups, channels, IMA4_SAMPLES)
               .transpose(0, 2, 1).reshape(-1, channels)
               .astype(np.int16))


def encode_ima4_packets(x: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode mono int16 samples as 'ima4' packets.  State runs across
    packets; at each packet boundary the predictor is quantized to the
    9 header bits exactly as the decoder will re-seed it, so
    ``decode_ima4_packets`` reproduces the returned reconstruction
    bit-for-bit.  Constants at multiples of 128 (step index 0) encode
    EXACTLY — the closed-form oracle class."""
    x = np.asarray(x, dtype=np.int64).reshape(-1)
    n = len(x)
    groups = max(1, -(-n // IMA4_SAMPLES))
    pad = groups * IMA4_SAMPLES - n
    if pad:
        tail = x[-1] if n else 0
        x = np.concatenate([x, np.full(pad, tail, dtype=np.int64)])
    xs = x.reshape(groups, IMA4_SAMPLES)
    out = bytearray()
    recon = np.empty_like(xs)
    pred = int(xs[0, 0])
    # initial step index: best match of the first delta's magnitude
    first_diff = abs(int(xs[0, 1]) - pred) if n > 1 else 0
    index = int(np.searchsorted(IMA_STEP_TABLE, first_diff).clip(0, 88))
    p = np.array([pred])
    ix = np.array([index])
    for g in range(groups):
        # header: predictor's top 9 bits + the step index; the decoder
        # re-seeds from exactly these, so quantize our state the same
        hp = int(p[0]) & 0xFFFF & 0xFF80
        hdr = hp | int(ix[0])
        out += bytes([hdr >> 8, hdr & 0xFF])
        p = np.array([hp - 0x10000 if hp >= 0x8000 else hp])
        nibs = np.empty(IMA4_SAMPLES, dtype=np.int64)
        for s in range(IMA4_SAMPLES):
            step = IMA_STEP_TABLE[ix]
            delta = xs[g, s] - p
            sign = (delta < 0).astype(np.int64) * 8
            mag = np.abs(delta)
            b4 = (mag >= step).astype(np.int64)
            mag = mag - b4 * step
            b2 = (mag >= (step >> 1)).astype(np.int64)
            mag = mag - b2 * (step >> 1)
            b1 = (mag >= (step >> 2)).astype(np.int64)
            nib = sign | (b4 << 2) | (b2 << 1) | b1
            p, ix = _ima_step(p, ix, nib)
            nibs[s] = nib[0]
            recon[g, s] = p[0]
        lo = nibs[0::2]
        hi = nibs[1::2]
        out += (lo | (hi << 4)).astype(np.uint8).tobytes()
    return bytes(out), recon.reshape(-1)[:n].astype(np.int16)


def encode_ima4_batch(signals) -> list[bytes]:
    """Encode MANY mono int16 signals as 'ima4' packets in ONE
    vectorized pass.  Each 34-byte packet is re-seeded from its own
    first sample (an encoder-side header choice the decoder replays
    identically), which makes packets independent — so ALL packets of
    ALL signals ride the numpy vector axis and the 64-step inner loop
    runs once per batch, not once per packet (the
    :func:`encode_ima_batch` 100 TB pattern).  Constants at multiples
    of 128 still encode EXACTLY (header quantization is lossless for
    them and nibble 0 holds at step index 0)."""
    big, counts, lens = _pad_blocks(signals, IMA4_SAMPLES)
    xs = big.reshape(-1, IMA4_SAMPLES)            # (P, 64): every packet
    P = xs.shape[0]
    pred = xs[:, 0] - (xs[:, 0] & 0x7F)           # top 9 header bits
    index = np.searchsorted(
        IMA_STEP_TABLE, np.abs(xs[:, 1] - pred)).clip(0, 88) \
        if IMA4_SAMPLES > 1 else np.zeros(P, dtype=np.int64)
    hdr16 = ((pred & 0xFFFF) | index).astype(np.int64)
    nibs = np.empty((P, IMA4_SAMPLES), dtype=np.int64)
    for s in range(IMA4_SAMPLES):
        step = IMA_STEP_TABLE[index]
        delta = xs[:, s] - pred
        sign = (delta < 0).astype(np.int64) * 8
        mag = np.abs(delta)
        b4 = (mag >= step).astype(np.int64)
        mag = mag - b4 * step
        b2 = (mag >= (step >> 1)).astype(np.int64)
        mag = mag - b2 * (step >> 1)
        b1 = (mag >= (step >> 2)).astype(np.int64)
        nib = sign | (b4 << 2) | (b2 << 1) | b1
        pred, index = _ima_step(pred, index, nib)
        nibs[:, s] = nib
    pkt = np.empty((P, IMA4_PACKET), dtype=np.uint8)
    pkt[:, 0] = hdr16 >> 8
    pkt[:, 1] = hdr16 & 0xFF
    pkt[:, 2:] = (nibs[:, 0::2] | (nibs[:, 1::2] << 4)).astype(np.uint8)
    flat = pkt.reshape(-1)
    out = []
    pos = 0
    for nb in counts:
        out.append(flat[pos:pos + nb * IMA4_PACKET].tobytes())
        pos += nb * IMA4_PACKET
    return out


def decode_ima4_batch(datas, lengths) -> list[np.ndarray]:
    """Decode many mono 'ima4' packet payloads in one vectorized pass,
    trimming each to its true sample count."""
    counts = [len(d) // IMA4_PACKET for d in datas]
    big = decode_ima4_packets(b"".join(datas), 1)
    out = []
    pos = 0
    for nb, n in zip(counts, lengths):
        out.append(big[pos:pos + nb * IMA4_SAMPLES, 0][:n])
        pos += nb * IMA4_SAMPLES
    return out
