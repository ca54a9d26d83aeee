"""Regression tests for the round-8 second review pass (utility /
distributions / quality / streaming state poison)."""

import math
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_get_num_smd_single_row_arm_is_nan_not_typeerror(spark):
    from fast_causal_inference_spark.utility import get_num_smd

    df = spark.createDataFrame(
        [(1, 5.0), (0, 1.0), (0, 2.0)], "t int, x double")
    out = get_num_smd(df, "t", ["x"])          # arm 1 has one row: var NULL
    assert math.isnan(out.smd.iloc[0])

    allnull = spark.createDataFrame(
        [(1, None), (1, None), (0, None), (0, None)], "t int, x double")
    out = get_num_smd(allnull, "t", ["x"])
    assert math.isnan(out.smd.iloc[0])


def test_hist_data_explicit_lo_above_data_raises(spark):
    from fast_causal_inference_spark.utility import hist_data

    df = spark.range(10).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError, match="hi .* < lo"):
        hist_data(df, "x", bins=4, lo=100.0)   # auto hi = 9 < explicit lo


def test_box_stats_all_null_column(spark):
    from fast_causal_inference_spark.utility import box_stats

    df = spark.createDataFrame(
        [(1.0, None), (2.0, None)], "a double, b double")
    out = box_stats(df, ["a", "b"]).set_index("column")
    assert out.loc["a", "median"] == pytest.approx(1.5, abs=0.5)
    assert math.isnan(out.loc["b", "median"])


def test_feature_process_empty_frame(spark):
    from fast_causal_inference_spark.utility import feature_process

    df = spark.createDataFrame([], "y double, x double, s string")
    out = feature_process(df, "y")
    assert out.count() == 0                    # no None-arithmetic crash


def test_f_sf_propagates_nan():
    from fast_causal_inference_spark.stats_distributions import f_sf

    assert np.isnan(f_sf(float("nan"), 3.0, 10.0))
    assert f_sf(0.0, 3.0, 10.0) == 1.0
    vals = f_sf(np.array([1.0, float("nan"), 2.0]), 3.0, 10.0)
    assert np.isfinite(vals[0]) and np.isnan(vals[1]) and np.isfinite(vals[2])


def test_train_quality_classifier_empty_corpus_raises(spark):
    from fast_causal_inference_spark.datapipe.quality import (
        train_quality_classifier,
    )

    df = spark.createDataFrame([(1, ""), (0, "   ")], "label int, text string")
    with pytest.raises(ValueError, match="no non-empty tokens"):
        train_quality_classifier(df, "label")


@pytest.fixture(scope="module")
def nan_stream_dir(spark):
    """Events with a NaN value row per arm mixed in (NaN, not NULL)."""
    d = tempfile.mkdtemp(prefix="fcis_nanstream_")
    pdf = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=40, freq="min"),
        "treatment": [0, 1] * 20,
        "value": [float(i) for i in range(40)],
    })
    pdf.loc[4, "value"] = float("nan")
    pdf.loc[5, "value"] = float("nan")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(d)
    return d


def _read_stream(spark, d):
    schema = spark.read.parquet(d).schema
    return spark.readStream.schema(schema).parquet(d)


def test_msprt_state_survives_nan_rows(spark, nan_stream_dir):
    """One NaN y must not poison the CUMULATIVE mSPRT state: NaN rows are
    dropped like NULL, the rest of the stream keeps producing finite
    estimates."""
    from fast_causal_inference_spark.streaming.ops import (
        run_to_memory,
        streaming_sequential_ttest,
    )

    s = _read_stream(spark, nan_stream_dir)
    out = streaming_sequential_ttest(s, "value", "treatment", "ts", tau=0.5)
    run_to_memory(out, "nan_seq", output_mode="append")
    final = spark.table("nan_seq").toPandas().iloc[-1]
    assert final.n0 + final.n1 == 38           # the two NaN rows dropped
    assert np.isfinite(final.estimate) and np.isfinite(final.stderr)
    pdf = spark.read.parquet(nan_stream_dir).toPandas().dropna()
    y0 = pdf.loc[pdf.treatment == 0, "value"]
    y1 = pdf.loc[pdf.treatment == 1, "value"]
    assert final.estimate == pytest.approx(y1.mean() - y0.mean(), rel=1e-9)


def test_cusum_state_survives_nan_rows(spark, nan_stream_dir):
    from fast_causal_inference_spark.operators.changepoint import (
        cusum_detect,
    )
    from fast_causal_inference_spark.streaming.ops import (
        run_to_memory,
        streaming_cusum,
    )

    s = _read_stream(spark, nan_stream_dir)
    out = streaming_cusum(s, "value", "ts", target=20.0, sd=10.0)
    run_to_memory(out, "nan_cusum", output_mode="append")
    final = spark.table("nan_cusum").toPandas().iloc[-1]
    assert final.n == 38
    assert np.isfinite(final.cusum_pos) and np.isfinite(final.cusum_neg)
    # batch twin on the NaN-dropped data agrees on the final statistics
    batch_src = spark.read.parquet(nan_stream_dir).where(~F.isnan("value"))
    b = (cusum_detect(batch_src, "value", order_by="ts",
                      target=20.0, sd=10.0)
         .orderBy("ts").toPandas().iloc[-1])
    assert final.cusum_pos == pytest.approx(b.cusum_pos, rel=1e-9)
    assert final.cusum_neg == pytest.approx(b.cusum_neg, rel=1e-9)


def test_winsorize_trim_all_null_column(spark):
    from fast_causal_inference_spark.functions.features import (
        trim_outliers,
        winsorize,
    )

    df = spark.createDataFrame(
        [(1.0, None), (2.0, None), (3.0, None)], "a double, b double")
    out = winsorize(df, ["a", "b"], 0.1, 0.9).toPandas()
    assert out.b.isna().all() and len(out) == 3
    out = trim_outliers(df, ["a", "b"], 0.0, 1.0)
    assert out.count() == 3                    # null column trims nothing


def test_sql_macro_expression_key_never_clobbers_existing_column(spark):
    """A frame already carrying group_0 must not have it overwritten by
    a materialized expression GROUP BY key."""
    from fast_causal_inference_spark.plans.sql_macros import sql

    spark.createDataFrame(
        [(1, 10.0, 99), (1, 20.0, 99), (2, 30.0, 99), (2, 44.0, 99)],
        "seg int, y double, group_0 int",
    ).createOrReplaceTempView("clobber_t")
    out = sql(spark, "SELECT avg_metric('avg(y)') FROM clobber_t "
                     "GROUP BY seg % 2")
    pdf = out.toPandas() if hasattr(out, "toPandas") else out
    assert len(pdf) == 2                      # two seg%2 groups, intact


def test_proportion_ztest_rejects_non_binary_success(spark):
    from fast_causal_inference_spark.operators.proportion import (
        proportion_ztest,
        proportion_ztest_1samp,
    )

    df = spark.createDataFrame(
        [(0, 2.0), (0, 1.0), (1, 0.0), (1, 1.0)], "t int, s double")
    with pytest.raises(ValueError, match="outside"):
        proportion_ztest(df, "s", "t")
    with pytest.raises(ValueError, match="outside"):
        proportion_ztest_1samp(df, "s", 0.5)
    ok = spark.createDataFrame(
        [(0, 1.0), (0, 0.0), (1, 1.0), (1, 1.0)], "t int, s double")
    out = proportion_ztest(ok, "s", "t")
    assert out.iloc[0]["proportion1"] == 1.0
