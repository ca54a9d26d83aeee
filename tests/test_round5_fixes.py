"""Round-5 ADVICE/VERDICT fixes.

1. CUPAC/DML default fold hash uses only pre-treatment columns.
2. bpe_encode splits on ASCII whitespace, matching train_bpe's Java \\s+.
3. ROI _aggregate guards reserved internal column names.
4. get_num_smd raises a descriptive error when an arm is missing.
5. xexpt_ttest_2samp infers treatment values without an extra scan and
   matches the explicit-values path.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_cupac_folds_ignore_outcome(spark):
    """Fold assignment must not change when Y or the index changes —
    otherwise fold membership depends on post-treatment data."""
    from fast_causal_inference_spark.operators.ttest import cupac_ttest_2samp

    rng = np.random.default_rng(7)
    n = 2000
    pdf = pd.DataFrame({
        "x1": rng.normal(0, 1, n), "x2": rng.normal(0, 1, n),
        "t": rng.integers(0, 2, n),
    })
    pdf["y"] = 1.0 + 2.0 * pdf.x1 + 0.1 * pdf.t + rng.normal(0, 0.5, n)
    df1 = spark.createDataFrame(pdf)
    # same features, shifted outcome: identical folds => the control-arm
    # predictor coefficients fit on y+10 are the y-fit + 10 on the
    # intercept, so the CUPED stderr is IDENTICAL (covariate shifted by a
    # constant). If folds depended on y, the fold partition would change
    # and the stderrs would drift.
    df2 = df1.withColumn("y", F.col("y") + F.lit(10.0))
    r1 = cupac_ttest_2samp(df1, "y", "t", ["x1", "x2"]).toPandas()
    r2 = cupac_ttest_2samp(df2, "y", "t", ["x1", "x2"]).toPandas()
    assert float(r1.stderr.iloc[0]) == pytest.approx(
        float(r2.stderr.iloc[0]), rel=1e-12)
    assert float(r1.estimate.iloc[0]) == pytest.approx(
        float(r2.estimate.iloc[0]), abs=1e-9)


def test_dml_folds_ignore_outcome(spark):
    from fast_causal_inference_spark.operators.dml import linear_dml

    rng = np.random.default_rng(11)
    n = 3000
    pdf = pd.DataFrame({"x": rng.normal(0, 1, n)})
    pdf["t"] = pdf.x * 0.5 + rng.normal(0, 1, n)
    pdf["y"] = pdf.x + 1.5 * pdf.t + rng.normal(0, 1, n)
    df = spark.createDataFrame(pdf)
    a = linear_dml(df, "y", "t", ["x"], cv=3)
    b = linear_dml(df.withColumn("y", F.col("y") * 2), "y", "t", ["x"], cv=3)
    # doubling y doubles theta EXACTLY only if the folds are unchanged
    assert b.ate == pytest.approx(2.0 * a.ate, rel=1e-10)


def test_bpe_encode_unicode_whitespace_parity(spark):
    """NBSP must NOT split words at encode time (train_bpe's \\s+ is
    ASCII-only, so 'a\\u00a0b' is ONE training word)."""
    from fast_causal_inference_spark.datapipe.tokenizer import (
        bpe_encode,
        train_bpe,
    )

    rows = [("a b c",)] * 30 + [("plain text here",)] * 5
    df = spark.createDataFrame(rows, "text string")
    model = train_bpe(df, text_col="text", vocab_size=40)
    out = bpe_encode(df, model, "text").select("bpe_tokens").collect()
    toks = ["".join(r[0]) for r in out]
    # the NBSP survives inside the reconstructed word stream (ASCII split
    # removes only ASCII whitespace)
    assert any("a b" in t for t in toks)


def test_roi_reserved_column_guards(spark):
    from fast_causal_inference_spark.uplift.roi import estimate_metrics

    pdf = pd.DataFrame({
        "t": np.tile([0, 1], 100),
        "tgt": np.arange(200, dtype=float),
        "ben": np.arange(200, dtype=float) * 0.5,
        "cost": np.ones(200),
        "bootstrap": np.zeros(200),     # bystander with a reserved name
        "count": np.ones(200),          # bystander matching an output alias
    })
    df = spark.createDataFrame(pdf)
    # bystander reserved columns are dropped, not fatal
    out = estimate_metrics(df, "ate", target_colname="tgt",
                           treatment_colname="t", treatment_value=1,
                           control_value=0, bootstrap=True, n_bootstraps=5)
    assert "ate" in out.columns and len(out) >= 1
    # a ROLE column with a reserved name is an explicit error
    with pytest.raises(ValueError, match="reserved"):
        estimate_metrics(df.withColumnRenamed("tgt", "__w"), "ate",
                         target_colname="__w", treatment_colname="t",
                         treatment_value=1, control_value=0)


def test_get_num_smd_missing_arm(spark):
    from fast_causal_inference_spark.utility import get_num_smd

    df = spark.createDataFrame(
        pd.DataFrame({"t": np.ones(50), "x": np.arange(50.0)}))
    with pytest.raises(ValueError, match="no rows for arm"):
        get_num_smd(df, "t", ["x"])
    ok = spark.createDataFrame(
        pd.DataFrame({"t": np.tile([0.0, 1.0], 25), "x": np.arange(50.0)}))
    res = get_num_smd(ok, "t", ["x"])
    assert res.shape == (1, 2)


@pytest.fixture(scope="module")
def xexpt_df(spark):
    rng = np.random.default_rng(3)
    n = 4000
    pdf = pd.DataFrame({
        "uid": np.arange(n),
        "g": rng.integers(0, 2, n),
        "num": rng.normal(10, 2, n),
        "den": np.ones(n),
    })
    return spark.createDataFrame(pdf).cache()


def test_xexpt_inferred_values_match_explicit(spark, xexpt_df):
    from fast_causal_inference_spark.operators.xexpt import xexpt_ttest_2samp

    for mt in ("avg", "sum"):
        auto = xexpt_ttest_2samp(xexpt_df, "num", "den", "g", "uid",
                                 metric_type=mt)
        expl = xexpt_ttest_2samp(xexpt_df, "num", "den", "g", "uid",
                                 metric_type=mt, treatment_values=(0, 1))
        for c in ("mean0", "mean1", "diff", "t_stat", "p_value"):
            a, e = float(auto[c].iloc[0]), float(expl[c].iloc[0])
            assert a == pytest.approx(e, rel=1e-9, abs=1e-12), (mt, c)


def test_xexpt_avg_single_scan(spark, xexpt_df):
    """Arm inference must NOT cost an extra pass: exactly one
    collect-backed scan for the ungrouped avg path."""
    from fast_causal_inference_spark.operators.xexpt import xexpt_ttest_2samp

    cls = type(xexpt_df)
    calls = []
    orig = cls.collect

    def counting(self):
        calls.append(1)
        return orig(self)

    try:
        cls.collect = counting
        xexpt_ttest_2samp(xexpt_df, "num", "den", "g", "uid",
                          metric_type="avg")
    finally:
        cls.collect = orig
    assert len(calls) == 1, f"expected 1 scan, saw {len(calls)}"


# ---------------------------------------------------------------------------
# PNG decode (stdlib zlib)
# ---------------------------------------------------------------------------


def _png_with_filters(arr, filter_types):
    """Encode (h,w,3) uint8 with a CHOSEN filter type per scanline — drives
    decode_png through Sub/Up/Average/Paeth, which encode_png (filter 0)
    never emits."""
    import struct
    import zlib

    a = np.asarray(arr, dtype=np.uint8).astype(np.int32)
    h, w, _ = a.shape
    bpp = 3
    raw = bytearray()
    prev = np.zeros((w, 3), np.int32)
    for y in range(h):
        line = a[y]
        ft = filter_types[y % len(filter_types)]
        flat = line.reshape(-1)
        pflat = prev.reshape(-1)
        left = np.concatenate([np.zeros(bpp, np.int32), flat[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int32), pflat[:-bpp]])
        if ft == 0:
            enc = flat
        elif ft == 1:
            enc = flat - left
        elif ft == 2:
            enc = flat - pflat
        elif ft == 3:
            enc = flat - ((left + pflat) >> 1)
        else:
            p = left + pflat - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - pflat),
                          np.abs(p - upleft))
            pr = np.where((pa <= pb) & (pa <= pc), left,
                          np.where(pb <= pc, pflat, upleft))
            enc = flat - pr
        raw.append(ft)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = line

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_roundtrip_filter0():
    from fast_causal_inference_spark.datapipe.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (13, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@pytest.mark.parametrize("fts", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_all_scanline_filters(fts):
    from fast_causal_inference_spark.datapipe.multimodal import decode_png

    rng = np.random.default_rng(sum(fts) + 17)
    img = rng.integers(0, 256, (11, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(_png_with_filters(img, fts)), img)


def test_png_color_types():
    """Gray (0), RGBA (6), gray+alpha (4), palette (3) all land as RGB."""
    import struct
    import zlib

    from fast_causal_inference_spark.datapipe.multimodal import decode_png

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    def build(w, h, ctype, raw, plte=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    # gray 2x2: values 10,20 / 30,40
    g = build(2, 2, 0, b"\x00\x0a\x14\x00\x1e\x28")
    got = decode_png(g)
    assert got[0, 0].tolist() == [10, 10, 10]
    assert got[1, 1].tolist() == [40, 40, 40]
    # RGBA 1x1: (1,2,3,alpha 9) -> alpha dropped
    ra = build(1, 1, 6, b"\x00\x01\x02\x03\x09")
    assert decode_png(ra)[0, 0].tolist() == [1, 2, 3]
    # gray+alpha 1x1
    ga = build(1, 1, 4, b"\x00\x07\xff")
    assert decode_png(ga)[0, 0].tolist() == [7, 7, 7]
    # palette 1x2 -> entries 1 then 0
    pl = build(2, 1, 3, b"\x00\x01\x00",
               plte=bytes([5, 6, 7, 8, 9, 10]))
    assert decode_png(pl)[0, 0].tolist() == [8, 9, 10]
    assert decode_png(pl)[0, 1].tolist() == [5, 6, 7]


def test_png_unsupported_variants_raise():
    """Round-8 widened decode_png to every legal depth + Adam7 (see
    tests/test_gif.py): 16-bit and interlaced streams now DECODE; what
    must still raise is anything outside the spec's legal combinations
    and corrupt streams (honesty rule unchanged)."""
    import struct
    import zlib

    from fast_causal_inference_spark.datapipe.multimodal import decode_png

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    # 16-bit truecolor 1x1 now decodes for real
    raw = zlib.compress(b"\x00" + b"\xAB\xCD" * 3)
    deep = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2,
                                             0, 0, 0))
            + chunk(b"IDAT", raw) + chunk(b"IEND", b""))
    assert decode_png(deep).tolist() == [[[0xAB, 0xAB, 0xAB]]]
    # illegal depth/color-type combination still raises
    bad = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 4, 2, 0, 0, 0))
    with pytest.raises(ValueError, match="depth"):
        decode_png(bad)
    # reserved interlace method still raises
    inter = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 7))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(inter)


def test_image_pipeline_png_end_to_end(spark):
    """synthesize png -> image_stats + image_features through Spark, with
    the decoded flag true for real decodes and false for codec fallbacks."""
    from fast_causal_inference_spark.datapipe.multimodal import (
        image_features,
        image_stats,
        synthesize_image_column,
    )

    d = spark.createDataFrame([(i, f"doc {i}") for i in range(20)],
                              "doc_id int, text string")
    png = synthesize_image_column(d, "text", fmt="png")
    stats = image_stats(png).toPandas()
    import hashlib as hl
    for _, r in stats.iterrows():
        hx = hl.sha256(f"doc {int(r.doc_id)}".encode()).hexdigest()
        assert int(r.width) == int(hx[0:4], 16) % 16 + 1
        assert int(r.height) == int(hx[4:8], 16) % 16 + 1
        assert float(r.mean_pixel) == float(int(hx[8:10], 16))
    feats = image_features(png, n_features=16).toPandas()
    assert feats.decoded.all()
    # a non-decodable payload under strict=False is flagged decoded=False
    bad = spark.createDataFrame([(1, bytearray(b"\xff\xd8\xff\xe0JFIF"))],
                                "doc_id int, payload binary")
    fb = image_features(bad, n_features=16, strict=False).toPandas()
    assert not fb.decoded.any()


# ---------------------------------------------------------------------------
# JPEG codec (own Huffman + IDCT, datapipe/jpeg.py)
# ---------------------------------------------------------------------------


def _natural_image(h=29, w=37):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([
        (127 + 80 * np.sin(x / 5) + 40 * np.cos(y / 7)).clip(0, 255),
        (127 + 60 * np.cos(x / 4)).clip(0, 255),
        (127 + 50 * np.sin((x + y) / 6)).clip(0, 255)], axis=2) \
        .astype(np.uint8)


def test_jpeg_roundtrip_quality_monotone():
    from fast_causal_inference_spark.datapipe.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = _natural_image()
    errs = []
    for q in (50, 75, 90, 99):
        out = decode_jpeg(encode_jpeg(img, q))
        assert out.shape == img.shape
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    # error decreases with quality and is small at the top end
    assert errs[0] > errs[-1]
    assert errs[-1] < 1.0
    assert errs[0] < 10.0


def test_jpeg_constant_exact_at_q100():
    from fast_causal_inference_spark.datapipe.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    for c in (0, 17, 128, 200, 255):
        for (h, w) in ((1, 1), (3, 5), (16, 9)):
            img = np.full((h, w, 3), c, np.uint8)
            assert np.array_equal(decode_jpeg(encode_jpeg(img, 100)), img), \
                (c, h, w)


def test_jpeg_420_and_restart_markers():
    from fast_causal_inference_spark.datapipe.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = _natural_image()
    for sub in ("444", "420"):
        for dri in (0, 2, 3):
            out = decode_jpeg(encode_jpeg(img, 90, subsampling=sub,
                                          restart_interval=dri))
            err = np.abs(out.astype(int) - img.astype(int)).mean()
            assert out.shape == img.shape
            assert err < (6.0 if sub == "420" else 3.0), (sub, dri, err)


def test_jpeg_grayscale_and_errors():
    from fast_causal_inference_spark.datapipe.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    g = np.tile(np.linspace(0, 255, 17).astype(np.uint8), (9, 1))
    out = decode_jpeg(encode_jpeg(g, 95))
    assert out.shape == (9, 17, 3)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 3
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"BM123456")
    # SOF2 is SUPPORTED since round 8 (tests/test_jpeg_progressive.py);
    # a baseline stream merely RELABELED as SOF2 is malformed progressive
    # (its single scan claims the DC band with Se=63) and must raise a
    # clean ValueError, while genuinely unsupported SOFs (arithmetic
    # SOF9) still raise NotImplementedError
    prog = bytearray(encode_jpeg(g, 95))
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="Se = 0"):
        decode_jpeg(bytes(prog))
    prog[idx + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(prog))


def test_jpeg_spark_pipeline(spark):
    """synthesize jpeg -> image_stats through Spark matches the hash
    derivation (the media_features gate oracle for image_jpeg)."""
    import hashlib as hl

    from fast_causal_inference_spark.datapipe.multimodal import (
        image_stats,
        synthesize_image_column,
    )

    d = spark.createDataFrame([(i, f"jdoc {i}") for i in range(12)],
                              "doc_id int, text string")
    stats = image_stats(synthesize_image_column(d, "text", fmt="jpeg")) \
        .toPandas()
    for _, r in stats.iterrows():
        hx = hl.sha256(f"jdoc {int(r.doc_id)}".encode()).hexdigest()
        assert int(r.width) == int(hx[0:4], 16) % 16 + 1
        assert int(r.height) == int(hx[4:8], 16) % 16 + 1
        assert float(r.mean_pixel) == float(int(hx[8:10], 16))


# ---------------------------------------------------------------------------
# quantile treatment effects
# ---------------------------------------------------------------------------


def test_qte_matches_numpy(spark):
    from fast_causal_inference_spark.operators.quantile_test import (
        quantile_treatment_effect,
    )

    rng = np.random.default_rng(13)
    n = 6000
    t = np.tile([0, 1], n // 2)
    # treatment shifts the distribution more in the upper tail
    y = rng.normal(10, 2, n) + t * (1.0 + rng.gamma(2.0, 1.0, n) * 0.5)
    pdf = pd.DataFrame({"t": t, "y": y, "uid": np.arange(n)})
    df = spark.createDataFrame(pdf)
    out = quantile_treatment_effect(df, "y", "t", (0.1, 0.5, 0.9))
    for _, r in out.iterrows():
        q0 = np.quantile(pdf[pdf.t == 0].y, r["quantile"])
        q1 = np.quantile(pdf[pdf.t == 1].y, r["quantile"])
        assert r.q0 == pytest.approx(q0, rel=1e-9)
        assert r.q1 == pytest.approx(q1, rel=1e-9)
        assert r.qte == pytest.approx(q1 - q0, rel=1e-9)
    # bootstrap SEs: CI covers the point estimate and the true upper-tail
    # effect is larger than the median effect
    bs = quantile_treatment_effect(df, "y", "t", (0.5, 0.9),
                                   n_bootstrap=200, uin="uid")
    assert (bs.lower < bs.qte).all() and (bs.qte < bs.upper).all()
    assert (bs.stderr > 0).all()
    assert bs.qte.iloc[1] > bs.qte.iloc[0]
    # missing arm is a descriptive error
    with pytest.raises(ValueError, match="both arms"):
        quantile_treatment_effect(df.where("t = 1"), "y", "t")


# ---------------------------------------------------------------------------
# review-pass regressions (round 5 second half)
# ---------------------------------------------------------------------------


def test_corrupt_png_jpeg_fall_back_not_crash(spark):
    """strict=False must absorb zlib.error / KeyError / IndexError from
    corrupt codec payloads, not crash the job."""
    import struct
    import zlib

    from fast_causal_inference_spark.datapipe.multimodal import (
        encode_png,
        image_features,
    )
    from fast_causal_inference_spark.datapipe.jpeg import encode_jpeg

    good_png = bytearray(encode_png(np.full((4, 4, 3), 9, np.uint8)))
    idat = good_png.find(b"IDAT")
    good_png[idat + 8] ^= 0xFF              # corrupt the deflate stream
    jpg = bytearray(encode_jpeg(np.full((4, 4, 3), 9, np.uint8)))
    jpg = jpg[:40]                           # truncated mid-header
    rows = [(1, bytes(good_png)), (2, bytes(jpg)),
            (3, b"\x89PNG\r\n\x1a\n" + b"\x00" * 10)]
    df = spark.createDataFrame(rows, "doc_id int, payload binary")
    out = image_features(df, n_features=8, strict=False).toPandas()
    assert len(out) == 3
    assert not out.decoded.any()
    # and strict=True reports them as data errors (raises, any type)
    with pytest.raises(Exception):
        image_features(df, n_features=8, strict=True).collect()


def test_dml_grouped_null_segment_key(spark):
    """NULL group values must get their own segment (null-safe join), not
    silently vanish."""
    from fast_causal_inference_spark.operators.dml import (
        linear_dml,
        linear_dml_grouped,
    )

    rng = np.random.default_rng(31)
    n = 4000
    pdf = pd.DataFrame({"x": rng.normal(0, 1, n)})
    pdf["t"] = pdf.x * 0.5 + rng.normal(0, 1, n)
    pdf["y"] = pdf.x + 2.0 * pdf.t + rng.normal(0, 1, n)
    pdf["seg"] = np.where(np.arange(n) % 3 == 0, None, "a")
    df = spark.createDataFrame(pdf)
    out = linear_dml_grouped(df, "y", "t", ["x"], ["seg"], cv=2)
    assert len(out) == 2
    got_null = out[out.seg.isna()].iloc[0]
    ref = linear_dml(df.where(F.col("seg").isNull()), "y", "t", ["x"],
                     cv=2)
    assert got_null.theta == pytest.approx(ref.ate, rel=1e-9)


def test_dml_grouped_null_treatment_rows_excluded(spark):
    """Rows with NULL T (but non-null Y/x) must not skew n/moments."""
    from fast_causal_inference_spark.operators.dml import (
        linear_dml,
        linear_dml_grouped,
    )

    rng = np.random.default_rng(37)
    n = 3000
    pdf = pd.DataFrame({"x": rng.normal(0, 1, n)})
    pdf["t"] = pdf.x * 0.5 + rng.normal(0, 1, n)
    pdf["y"] = pdf.x + 2.0 * pdf.t + rng.normal(0, 1, n)
    pdf["seg"] = "s"
    pdf.loc[: n // 10, "t"] = np.nan
    df = spark.createDataFrame(pdf)
    out = linear_dml_grouped(df, "y", "t", ["x"], ["seg"], cv=2)
    ref = linear_dml(df, "y", "t", ["x"], cv=2)
    got = out.iloc[0]
    assert got.theta == pytest.approx(ref.ate, rel=1e-6)
    assert got.stderr == pytest.approx(float(ref.stderr[0]), rel=1e-4)


def test_tlearner_string_coded_arms(spark):
    from fast_causal_inference_spark.uplift.metalearners import TLearner

    rng = np.random.default_rng(41)
    n = 1000
    pdf = pd.DataFrame({"x": rng.normal(0, 1, n),
                        "arm": np.tile(["0", "1"], n // 2)})
    pdf["y"] = pdf.x + (pdf.arm == "1") * 2.0 + rng.normal(0, 0.5, n)
    tl = TLearner(["x"], "y", "arm").fit(spark.createDataFrame(pdf))
    ite = float(np.mean([r["ite"] for r in
                         tl.predict(spark.createDataFrame(pdf))
                         .select("ite").collect()]))
    assert ite == pytest.approx(2.0, abs=0.2)


def test_dml_degenerate_binary_control_raises(spark):
    """A binary control whose hash folds align with its values must raise
    a descriptive error, not silently fit rank-deficient nuisances."""
    from fast_causal_inference_spark.operators.dml import linear_dml

    rng = np.random.default_rng(43)
    n = 2000
    pdf = pd.DataFrame({"x": np.tile([0.0, 1.0], n // 2)})
    pdf["t"] = pdf.x * 0.5 + rng.normal(0, 1, n)
    pdf["y"] = pdf.x + pdf.t + rng.normal(0, 1, n)
    with pytest.raises(ValueError,
                       match="fold|rank-deficient|populated"):
        linear_dml(spark.createDataFrame(pdf), "y", "t", ["x"], cv=3)


def test_qte_sketch_path(spark):
    """exact=False uses the bounded-state GK sketch and lands within its
    relative-error band of the exact quantiles."""
    from fast_causal_inference_spark.operators.quantile_test import (
        quantile_treatment_effect,
    )

    rng = np.random.default_rng(51)
    n = 20000
    pdf = pd.DataFrame({"t": np.tile([0, 1], n // 2),
                        "y": rng.normal(100, 15, n)})
    pdf["y"] += pdf.t * 5
    df = spark.createDataFrame(pdf)
    ex = quantile_treatment_effect(df, "y", "t", (0.5, 0.9))
    ap = quantile_treatment_effect(df, "y", "t", (0.5, 0.9), exact=False,
                                   relative_error=1e-3)
    for c in ("q0", "q1"):
        assert np.allclose(ap[c], ex[c], rtol=0.01)


def test_cluster_ttest_matches_numpy_delta(spark):
    """Clustered SE from cluster totals vs a numpy delta-method oracle;
    row-level ttest understates the SE under within-cluster correlation."""
    from fast_causal_inference_spark.operators.ttest import (
        cluster_ttest_2samp,
        ttest_2samp,
    )

    rng = np.random.default_rng(61)
    C, m = 120, 50
    cl = np.repeat(np.arange(C), m)
    arm = cl % 2
    cluster_effect = rng.normal(0, 2.0, C)[cl]    # strong ICC
    y = 10 + arm * 0.5 + cluster_effect + rng.normal(0, 1, C * m)
    pdf = pd.DataFrame({"cl": cl, "arm": arm, "y": y})
    df = spark.createDataFrame(pdf)
    out = cluster_ttest_2samp(df, "avg(y)", "arm", "cl").toPandas()
    row = out.iloc[0]

    # numpy oracle: per-arm cluster totals, delta method on avg(S)/avg(m)
    def arm_stats(a):
        g = pdf[pdf.arm == a].groupby("cl").y.agg(["sum", "count"])
        S, M = g["sum"].to_numpy(), g["count"].to_numpy().astype(float)
        n = len(g)
        r = S.mean() / M.mean()
        cov = np.cov(np.vstack([S, M]), ddof=1)
        var = (cov[0, 0] - 2 * r * cov[0, 1] + r * r * cov[1, 1]) \
            / (M.mean() ** 2) / n
        return n, r, var

    n0, r0, v0 = arm_stats(0)
    n1, r1, v1 = arm_stats(1)
    assert float(row.n0) == n0 and float(row.n1) == n1
    assert float(row.estimate) == pytest.approx(r1 - r0, rel=1e-9)
    assert float(row.stderr) == pytest.approx(np.sqrt(v0 + v1), rel=1e-9)
    # the clustered SE must exceed the (invalid) row-level SE here
    naive = ttest_2samp(df, "avg(y)", "arm").toPandas().iloc[0]
    assert float(row.stderr) > 2.0 * float(naive.stderr)


def test_cluster_ttest_ratio_metric(spark):
    from fast_causal_inference_spark.operators.ttest import (
        cluster_ttest_2samp,
    )

    rng = np.random.default_rng(67)
    C, m = 80, 30
    cl = np.repeat(np.arange(C), m)
    pdf = pd.DataFrame({
        "cl": cl, "arm": cl % 2,
        "num": rng.gamma(2, 5, C * m), "den": rng.uniform(1, 3, C * m),
    })
    df = spark.createDataFrame(pdf)
    out = cluster_ttest_2samp(df, "avg(num)/avg(den)", "arm", "cl") \
        .toPandas().iloc[0]
    # point estimate identity: formula of overall sums per arm
    for a, col in ((0, "mean0"), (1, "mean1")):
        sub = pdf[pdf.arm == a]
        assert float(out[col]) == pytest.approx(
            sub.num.sum() / sub.den.sum(), rel=1e-9)
    assert np.isfinite(out.stderr) and out.stderr > 0


def test_winsorized_ttest(spark):
    """Capping kills the whale-driven variance; matches a numpy oracle
    with exact pooled quantile clipping."""
    from fast_causal_inference_spark.operators.ttest import (
        ttest_2samp,
        winsorized_ttest_2samp,
    )

    rng = np.random.default_rng(97)
    n = 4000
    arm = np.tile([0, 1], n // 2)
    y = rng.normal(10, 1, n) + arm * 0.3
    y[rng.choice(n, 20, replace=False)] += rng.exponential(500.0, 20)
    pdf = pd.DataFrame({"arm": arm, "y": y})
    df = spark.createDataFrame(pdf)
    w = winsorized_ttest_2samp(df, "y", "arm", 0.01, 0.99,
                               relative_error=1e-6).toPandas().iloc[0]
    plain = ttest_2samp(df, "avg(y)", "arm").toPandas().iloc[0]
    assert float(w.stderr) < 0.5 * float(plain.stderr)
    lo, hi = np.quantile(y, [0.01, 0.99])
    yc = np.clip(y, lo, hi)
    m0, m1 = yc[arm == 0].mean(), yc[arm == 1].mean()
    # approxQuantile returns an exact order statistic near the rank while
    # numpy interpolates (type 7) — bounds differ by at most one gap
    # between adjacent order stats, which moves the capped means a hair
    assert float(w.estimate) == pytest.approx(m1 - m0, rel=1e-3)


def test_cluster_ttest_null_metric_and_sugar(spark):
    """NULL metric rows must not deflate cluster means, and every formula
    sugar the parser accepts must work."""
    from fast_causal_inference_spark.operators.ttest import (
        cluster_ttest_2samp,
        ttest_2samp,
    )

    rng = np.random.default_rng(101)
    n = 2000
    cl = np.repeat(np.arange(40), 50)
    pdf = pd.DataFrame({"cl": cl, "arm": cl % 2,
                        "y": rng.normal(5, 1, n)})
    pdf.loc[rng.choice(n, 500, replace=False), "y"] = np.nan
    df = spark.createDataFrame(pdf)
    out = cluster_ttest_2samp(df, "avg(y)", "arm", "cl").toPandas().iloc[0]
    naive = ttest_2samp(df, "avg(y)", "arm").toPandas().iloc[0]
    # point estimates agree (clustering changes the SE, not the means)
    assert float(out.mean0) == pytest.approx(float(naive.mean0), rel=1e-9)
    assert float(out.mean1) == pytest.approx(float(naive.mean1), rel=1e-9)
    # bare-identifier and mean() sugar both resolve
    for sugar in ("y", "mean(y)", "avg(y)/1"):
        s = cluster_ttest_2samp(df, sugar, "arm", "cl").toPandas().iloc[0]
        assert float(s.estimate) == pytest.approx(float(out.estimate),
                                                  rel=1e-9), sugar


def test_winsorize_preserves_nulls(spark):
    from fast_causal_inference_spark.functions.features import winsorize

    pdf = pd.DataFrame({"y": [1.0, 2.0, None, 1000.0, 3.0]})
    out = winsorize(spark.createDataFrame(pdf), "y", 0.1, 0.9).toPandas()
    assert out.y.isna().sum() == 1


def test_stratified_logrank_null_stratum_counts(spark):
    from fast_causal_inference_spark.operators.survival import (
        stratified_logrank_test,
    )

    rng = np.random.default_rng(103)
    n = 600
    pdf = pd.DataFrame({
        "t": rng.integers(1, 8, n).astype(float),
        "e": (rng.uniform(0, 1, n) < 0.8).astype(float),
        "arm": rng.integers(0, 2, n),
        "s": np.where(np.arange(n) % 4 == 0, None, "a"),
    })
    res = stratified_logrank_test(spark.createDataFrame(pdf), "t", "e",
                                  "arm", ["s"]).iloc[0]
    assert res.n_strata == 2          # NULL is its own stratum
    assert float(res.observed1) == float(
        pdf[(pdf.arm == 1) & (pdf.e == 1)].shape[0])


def test_equivalence_tost(spark):
    """TOST vs a numpy oracle; truly-equivalent arms pass, shifted arms
    fail; non-inferiority one-sided behavior."""
    from fast_causal_inference_spark import stats_distributions as dist
    from fast_causal_inference_spark.operators.ttest import (
        equivalence_ttest_2samp,
        ttest_2samp,
    )

    rng = np.random.default_rng(109)
    n = 20000
    arm = np.tile([0, 1], n // 2)
    y_eq = rng.normal(10, 1, n) + arm * 0.01        # within margin 0.1
    y_ne = rng.normal(10, 1, n) + arm * 0.5         # outside margin
    for y, expect in ((y_eq, True), (y_ne, False)):
        df = spark.createDataFrame(pd.DataFrame({"arm": arm, "y": y}))
        out = equivalence_ttest_2samp(df, "avg(y)", "arm", margin=0.1) \
            .toPandas().iloc[0]
        assert bool(out.equivalent) is expect
        base = ttest_2samp(df, "avg(y)", "arm").toPandas().iloc[0]
        est, se = float(base.estimate), float(base.stderr)
        zl, zu = (est + 0.1) / se, (est - 0.1) / se
        p = max(float(dist.norm_sf(zl)), float(dist.norm_sf(-zu)))
        assert float(out.p_equiv) == pytest.approx(p, rel=1e-9)
        assert float(out.z_lower) == pytest.approx(zl, rel=1e-9)
    # non-inferiority: a positive effect is trivially non-inferior
    df = spark.createDataFrame(pd.DataFrame({"arm": arm, "y": y_ne}))
    ni = equivalence_ttest_2samp(df, "avg(y)", "arm", margin=0.1,
                                 alternative="noninferiority") \
        .toPandas().iloc[0]
    assert bool(ni.noninferior)
