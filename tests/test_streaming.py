"""Structured Streaming ops: file-source → availableNow → memory sink, then
results compared against the batch computation on the same data."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.streaming.ops import (
    run_to_memory,
    streaming_metric,
    streaming_srm,
    streaming_ttest_2samp,
)


@pytest.fixture(scope="module")
def stream_dir(spark):
    """events written as parquet with proper timestamps for streaming reads."""
    from fast_causal_inference_spark.sources.tables import load_table

    d = tempfile.mkdtemp(prefix="fcis_stream_")
    ev = load_table(spark, "/root/testdata/sf0.001", "events") \
        .withColumn("treatment", (F.col("user_id") % 2).cast("int"))
    ev.write.mode("overwrite").parquet(d)
    return d


def _read_stream(spark, d):
    schema = spark.read.parquet(d).schema
    return spark.readStream.schema(schema).parquet(d)


def test_streaming_ttest_matches_batch(spark, stream_dir):
    s = _read_stream(spark, stream_dir)
    out = streaming_ttest_2samp(s, "avg(value)", "treatment", "ts",
                                window_duration="6 hours")
    run_to_memory(out, "tt_stream")
    got = spark.table("tt_stream").orderBy("window").toPandas()
    assert len(got) >= 2                     # the day splits into windows

    # batch equivalent on the same windows
    from fast_causal_inference_spark.operators.ttest import ttest_2samp

    batch_src = spark.read.parquet(stream_dir) \
        .withColumn("window", F.window("ts", "6 hours"))
    batch = ttest_2samp(batch_src, "avg(value)", "treatment",
                        group_cols=["window"]).orderBy("window").toPandas()
    assert len(batch) == len(got)
    for c in ("n0", "n1", "estimate", "stderr", "t_stat"):
        assert got[c].to_numpy() == pytest.approx(
            batch[c].to_numpy(), rel=1e-9, nan_ok=True), c
    assert got.p_value.to_numpy() == pytest.approx(
        batch.p_value.to_numpy(), rel=1e-6, nan_ok=True)


def test_streaming_metric(spark, stream_dir):
    s = _read_stream(spark, stream_dir)
    out = streaming_metric(s, "avg(value)/avg(1 + event_id % 7)", "ts",
                           window_duration="12 hours")
    run_to_memory(out, "metric_stream")
    got = spark.table("metric_stream").toPandas()
    assert len(got) >= 1
    assert (got.stderr > 0).all()
    assert got.n.sum() == 1000


def test_streaming_srm(spark, stream_dir):
    s = _read_stream(spark, stream_dir)
    out = streaming_srm(s, "treatment", "ts", window_duration="24 hours")
    run_to_memory(out, "srm_stream")
    got = spark.table("srm_stream").toPandas()
    assert got.n0.sum() + got.n1.sum() == 1000
    assert (got.chisquare >= 0).all()


def test_streaming_sequential_ttest_state(spark, stream_dir):
    import numpy as np

    from fast_causal_inference_spark.streaming.ops import (
        streaming_sequential_ttest,
    )

    s = _read_stream(spark, stream_dir)
    out = streaming_sequential_ttest(s, "value", "treatment", "ts", tau=0.5)
    run_to_memory(out, "seq_stream", output_mode="append")
    got = spark.table("seq_stream").toPandas()
    assert len(got) >= 1
    final = got.iloc[-1]

    # cumulative state must equal the batch moments over ALL data
    pdf = spark.read.parquet(stream_dir).toPandas()
    y0 = pdf.loc[pdf.treatment == 0, "value"]
    y1 = pdf.loc[pdf.treatment == 1, "value"]
    assert final.n0 == len(y0) and final.n1 == len(y1)
    assert final.estimate == pytest.approx(y1.mean() - y0.mean(), rel=1e-9)
    V = y0.var(ddof=1) / len(y0) + y1.var(ddof=1) / len(y1)
    assert final.stderr == pytest.approx(np.sqrt(V), rel=1e-9)
    # mSPRT invariants
    assert 0.0 < final.always_valid_p <= 1.0
    lam = np.sqrt(V / (V + 0.25)) * np.exp(
        final.estimate ** 2 * 0.25 / (2 * V * (V + 0.25)))
    assert final.lambda_ == pytest.approx(lam, rel=1e-9)
