"""Multimodal corpus pipeline demo — probe, route, decode, featurize.

The 100 TB pattern: a cheap header PROBE over every object first
(container/codec/duration/dims — no decode), then route payloads so the
expensive decode stage runs only on the formats it can handle, then
real in-container decode stats and features for the self-contained
formats (BMP/PPM/PNG/GIF/JPEG/VP8L-WebP images; WAV incl. IMA/MS
ADPCM and G.711, FLAC, Ogg-FLAC audio).  Round 9 also adds the
``decode_fn`` injection seam demoed in step 5 — the hook where a
production cluster plugs libjpeg-turbo/libwebp/ffmpeg into the same
pipeline.

Run: python examples/media_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np                                               # noqa: E402
from pyspark.sql import functions as F                           # noqa: E402

import fast_causal_inference_spark as fcis                       # noqa: E402
from fast_causal_inference_spark.datapipe.flac import (          # noqa: E402
    encode_flac,
    encode_ogg_flac,
)
from fast_causal_inference_spark.datapipe.gif import encode_gif  # noqa: E402
from fast_causal_inference_spark.datapipe.mediaprobe import (    # noqa: E402
    build_mp3,
    build_mp4,
    build_webp,
)
from fast_causal_inference_spark.datapipe.adpcm import (         # noqa: E402
    encode_wav_ima,
)
from fast_causal_inference_spark.datapipe.multimodal import (    # noqa: E402
    encode_wav,
)
from fast_causal_inference_spark.datapipe.vp8l import (          # noqa: E402
    encode_webp_lossless,
)
from fast_causal_inference_spark.serialization import (          # noqa: E402
    ensure_udf_serializable,
)


def _payload(i: int) -> bytes:
    """A deterministic mixed-media corpus: every builder is a REAL
    encoder/serializer from the package."""
    rng = np.random.default_rng(i)
    kind = i % 8
    if kind == 0:
        img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) // 32 * 32
        return encode_gif(img)
    if kind == 1:
        return encode_wav(rng.integers(-2000, 2000, 500).astype(np.int16),
                          16000)
    if kind == 2:
        return encode_flac(rng.integers(-2000, 2000, 400), 22050)
    if kind == 3:
        return encode_ogg_flac(rng.integers(-500, 500, 300), 16000)
    if kind == 4:
        return build_mp3(8, xing=True, seed=i)       # probe-only format
    if kind == 5:
        # IMA-ADPCM telephony WAV — decodes for real since round 9
        return encode_wav_ima(
            rng.integers(-2000, 2000, 600).astype(np.int16), 8000)
    if kind == 6:
        # VP8L lossless WebP — real pixels since round 9
        img = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
        return encode_webp_lossless(img, ("subtract_green",))
    return build_webp(64 + i % 100, 48, lossless=i % 2 == 0)


def main():
    spark = fcis.get_session("fcis-media-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_udf_serializable()

    mk = F.pandas_udf(lambda s: s.map(lambda i: _payload(int(i))),
                      "binary")
    corpus = fcis.readSparkDf(
        spark.range(60).select(
            F.col("id").alias("doc_id"),
            mk(F.col("id")).alias("payload")))

    print("== 1. probe every object (header parse, no decode) ==")
    probed = corpus.media_probe()
    probed.groupBy("probe.container", "probe.codec") \
          .count().orderBy("container").show()

    print("== 2. route: audio formats the package decodes for real ==")
    audio = probed.filter(
        "probe.container IN ('wav', 'flac') OR probe.codec = 'flac'") \
        .drop("probe")
    stats = audio.audio_stats()
    stats.agg(F.count("*").alias("n_decoded"),
              F.avg("rms").alias("avg_rms"),
              F.min("sample_rate").alias("min_rate")).show()

    print("== 3. image decode stats + pooled features ==")
    # GIFs and real VP8L WebPs (the header-only build_webp probes have
    # no bitstream, so route on payload size)
    images = probed.filter(
        "probe.container = 'gif' OR (probe.codec = 'vp8l' "
        "AND length(payload) > 40)").drop("probe")
    images.image_stats().select("doc_id", "width", "height",
                                "mean_pixel").show(5)
    feats = images.image_features(n_features=16)
    print("feature vectors:",
          feats.selectExpr("size(features) AS d").distinct().collect())

    print("== 4. MFCC features for the decoded audio ==")
    af = audio.audio_features(n_mfcc=8)
    print("mfcc width:",
          af.selectExpr("size(audio_features) AS d").distinct().collect())

    print("== 5. native-codec injection seam ==")
    # swap the pure-Python reference decoders for a custom decode_fn
    # (in production: a libjpeg-turbo/libwebp/ffmpeg wrapper) — same
    # schema, batching and error contract
    def fake_native_decode(payload):
        return np.full((2, 2, 3), min(len(payload), 255), dtype=np.uint8)

    injected = images.image_stats(decode_fn=fake_native_decode)
    injected.select("doc_id", "width", "height").show(3)

    spark.stop()


if __name__ == "__main__":
    main()
