"""Round-6 regression tests: the five driver ADVICE items plus the
VERDICT #6 TOST CI-level documentation contract."""

import numpy as np
import pandas as pd
import pytest


def test_cluster_ttest_mixed_cluster_raises(spark):
    """A cluster whose rows appear in BOTH arms must raise at execution
    time instead of silently splitting into one cell per arm (which
    understates the clustered SE)."""
    from fast_causal_inference_spark.operators.ttest import (
        cluster_ttest_2samp,
    )

    rng = np.random.default_rng(7)
    n = 400
    cl = np.repeat(np.arange(20), 20)
    arm = cl % 2
    arm[5] = 1 - arm[5]                   # one row defects to the other arm
    pdf = pd.DataFrame({"cl": cl, "arm": arm,
                        "y": rng.normal(0, 1, n)})
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="both treatment arms"):
        cluster_ttest_2samp(df, "avg(y)", "arm", "cl").collect()


def test_cluster_ttest_other_arm_rows_ignored(spark):
    """Rows from a third arm (outside treatment_values) neither raise
    the mixed-cluster guard nor enter the two-arm totals."""
    from fast_causal_inference_spark.operators.ttest import (
        cluster_ttest_2samp,
    )

    rng = np.random.default_rng(11)
    n = 1000
    cl = np.repeat(np.arange(20), 50)
    pdf = pd.DataFrame({"cl": cl, "arm": cl % 2,
                        "y": rng.normal(5, 1, n)})
    base = cluster_ttest_2samp(
        spark.createDataFrame(pdf), "avg(y)", "arm", "cl").toPandas().iloc[0]
    # append a third arm sharing cluster ids — must be invisible
    extra = pd.DataFrame({"cl": np.arange(20), "arm": 2,
                          "y": rng.normal(100, 1, 20)})
    both = spark.createDataFrame(pd.concat([pdf, extra]))
    out = cluster_ttest_2samp(both, "avg(y)", "arm", "cl").toPandas().iloc[0]
    for c in ("estimate", "stderr", "n0", "n1"):
        assert float(out[c]) == pytest.approx(float(base[c]), rel=1e-12), c


def test_qte_all_null_arm_clear_error(spark):
    """An arm whose metric is entirely NULL must raise a descriptive
    ValueError, not an opaque TypeError on list(None)."""
    from fast_causal_inference_spark.operators.quantile_test import (
        quantile_treatment_effect,
    )

    pdf = pd.DataFrame({
        "t": [0] * 10 + [1] * 10,
        "y": [float(i) for i in range(10)] + [None] * 10,
    })
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="no non-NULL"):
        quantile_treatment_effect(df, "y", "t")


def test_tost_alpha_validation(spark):
    from fast_causal_inference_spark.operators.ttest import (
        equivalence_ttest_2samp,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"arm": [0, 1] * 50, "y": np.arange(100.0)}))
    for bad in (0.5, 0.7, 0.0, -0.1):
        with pytest.raises(ValueError, match="alpha"):
            equivalence_ttest_2samp(df, "avg(y)", "arm", margin=0.1,
                                    alpha=bad)


def test_tost_base_ci_is_1_minus_2alpha(spark):
    """VERDICT #6: the inherited lower/upper columns are the (1-2a) CI
    by TOST convention — pin that contract."""
    from fast_causal_inference_spark import stats_distributions as dist
    from fast_causal_inference_spark.operators.ttest import (
        equivalence_ttest_2samp,
    )

    rng = np.random.default_rng(13)
    n = 5000
    arm = np.tile([0, 1], n // 2)
    df = spark.createDataFrame(
        pd.DataFrame({"arm": arm, "y": rng.normal(10, 1, n)}))
    alpha = 0.05
    out = equivalence_ttest_2samp(df, "avg(y)", "arm", margin=0.1,
                                  alpha=alpha).toPandas().iloc[0]
    est, se = float(out.estimate), float(out.stderr)
    # 90% CI at alpha=0.05 (normal approx at this n; ttest uses t-quantile
    # with large df, so allow tiny slack)
    # normal-vs-t quantile slack is ~0.3% here; the level distinction the
    # test pins (1.645 vs 1.960) is 19%, so 0.5% stays discriminating
    z = float(dist.norm_ppf(1 - alpha))
    assert float(out.lower) == pytest.approx(est - z * se, rel=5e-3)
    assert float(out.upper) == pytest.approx(est + z * se, rel=5e-3)


def test_winsorized_caps_ignore_off_arm_rows(spark):
    """The pooled cap sketch must only see the two analyzed arms: a
    third arm of huge values must not shift the caps."""
    from fast_causal_inference_spark.operators.ttest import (
        winsorized_ttest_2samp,
    )

    rng = np.random.default_rng(17)
    n = 2000
    arm = np.tile([0, 1], n // 2)
    y = rng.normal(10, 1, n) + arm * 0.3
    pdf = pd.DataFrame({"arm": arm, "y": y})
    base = winsorized_ttest_2samp(
        spark.createDataFrame(pdf), "y", "arm", 0.05, 0.95,
        relative_error=1e-6).toPandas().iloc[0]
    whales = pd.DataFrame({"arm": 2, "y": rng.exponential(1e6, 500)})
    both = spark.createDataFrame(pd.concat([pdf, whales]))
    out = winsorized_ttest_2samp(both, "y", "arm", 0.05, 0.95,
                                 relative_error=1e-6).toPandas().iloc[0]
    assert float(out.estimate) == pytest.approx(float(base.estimate),
                                                rel=1e-12)
    assert float(out.stderr) == pytest.approx(float(base.stderr), rel=1e-12)


def test_dml_nuisance_df_resid_uses_complete_cases(spark, monkeypatch):
    """ADVICE: _dml_residuals must pass the complete-case n (the
    Gramian's) to _fit_from_row, matching ols()'s unweighted contract."""
    import fast_causal_inference_spark.operators.dml as dml_mod
    from fast_causal_inference_spark.operators import ols as ols_mod

    captured = []
    real = ols_mod._fit_from_row

    def spy(row, feats, y, bias, n_rows, w):
        captured.append(float(n_rows))
        return real(row, feats, y, bias, n_rows, w)

    monkeypatch.setattr(ols_mod, "_fit_from_row", spy)
    rng = np.random.default_rng(19)
    n = 600
    x = rng.normal(0, 1, n)
    t = (x + rng.normal(0, 1, n) > 0).astype(float)
    y = 2 * t + x + rng.normal(0, 1, n)
    pdf = pd.DataFrame({"x": x, "t": t, "y": y})
    pdf.loc[rng.choice(n, 60, replace=False), "y"] = np.nan  # NULL outcomes
    df = spark.createDataFrame(pdf)
    dml_mod.linear_dml(df, "y", "t", ["x"], cv=2, fold_expr="crc32(string(x))")
    n_complete = float(pdf.y.notna().sum())            # 540 of 600
    # calls 0..3 are the nuisance fits: (y, t) per fold, each passed that
    # complement's COMPLETE-CASE count, so y-model counts across the two
    # folds sum to the total complete cases (raw counts would sum to 600)
    assert len(captured) >= 4, captured
    assert captured[0] == captured[1] and captured[2] == captured[3]
    assert captured[0] + captured[2] == pytest.approx(n_complete)


def test_codec_scope_cut_strict_by_default(spark):
    """Round-6 scope cut: compressed A/V payloads RAISE by default in
    every decode-path function — faking now requires an explicit
    strict=False opt-in (VERDICT r5 item 4)."""
    import pandas as pd

    from fast_causal_inference_spark.datapipe.multimodal import (
        audio_features,
        image_features,
        image_resize,
        video_frame_sample,
    )

    # an MP3-looking payload (ID3 tag) and an MP4-looking one (ftyp box)
    mp3 = b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\xff\xfb\x90\x00" * 8
    mp4 = b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00isomiso2"
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [mp3, mp4]}))
    for fn in (lambda: audio_features(df),
               lambda: image_features(df),
               lambda: image_resize(df),
               lambda: video_frame_sample(df)):
        with pytest.raises(Exception, match="NotImplementedError|requires"):
            fn().collect()
    # explicit opt-in still exercises the plumbing, flagged honestly
    out = audio_features(df, strict=False).toPandas()
    assert not out.decoded.any()


def test_lsh_max_bucket_size_guard(spark):
    """Degenerate duplicate balls: with max_bucket_size set, over-full
    buckets are skipped WITH a warning; default semantics unchanged."""
    import warnings as w

    from fast_causal_inference_spark.datapipe.similarity import (
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(41)
    base = rng.standard_normal((30, 8)).astype("float32")
    rows = [(i, [float(x) for x in base[i % 30]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = embedding_near_dup_pairs(df, threshold=0.999, dim=8,
                                     n_planes=6).count()
    assert exact == 300 // 30 * (300 // 30 - 1) // 2 * 30  # 45 per ball
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        capped = embedding_near_dup_pairs(df, threshold=0.999, dim=8,
                                          n_planes=6, max_bucket_size=5)
        n_capped = capped.count()
    assert any("skipping" in str(c.message) for c in caught)
    assert n_capped < exact


def test_erf_erfc_pure_column_ulp_accuracy(spark):
    """erf/erfc are now pure Column expressions (Cody rational
    approximations) — validate <= 4 ulp vs math.erf/math.erfc over a
    dense grid spanning all branches, plus exact special values."""
    import math

    from pyspark.sql import functions as F

    from fast_causal_inference_spark.functions import erf, erfc

    xs = list(np.concatenate([
        np.linspace(-8, 8, 2001),
        np.linspace(-0.47, 0.47, 301),      # small branch + crossover
        np.linspace(3.9, 4.1, 101),         # mid/tail crossover
        [0.0, -0.0, 0.46875, -0.46875, 4.0, -4.0, 6.0, -6.0,
         27.9, 28.1, 1e-300, -1e-300],
    ]))
    pdf = pd.DataFrame({"x": xs})
    out = (spark.createDataFrame(pdf)
           .select("x", erf(F.col("x")).alias("e"),
                   erfc(F.col("x")).alias("ec"))
           .toPandas())
    for _, r in out.iterrows():
        ref_e, ref_ec = math.erf(r.x), math.erfc(r.x)
        for got, ref in ((r.e, ref_e), (r.ec, ref_ec)):
            ulp = math.ulp(ref) if ref != 0 else 5e-324
            assert abs(got - ref) <= 4 * max(ulp, 5e-324), \
                f"x={r.x}: got {got}, ref {ref}"

    # non-finite handling: NaN propagates, +-inf clamp exactly
    spec = (spark.createDataFrame(
        pd.DataFrame({"x": [float("nan"), float("inf"), float("-inf")]}))
        .select(erf(F.col("x")).alias("e"), erfc(F.col("x")).alias("ec"))
        .toPandas())
    assert math.isnan(spec.e[0]) and math.isnan(spec.ec[0])
    assert spec.e[1] == 1.0 and spec.ec[1] == 0.0
    assert spec.e[2] == -1.0 and spec.ec[2] == 2.0
