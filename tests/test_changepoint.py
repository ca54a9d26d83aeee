"""CUSUM / EWMA charts vs naive sequential recursions, batch + streaming."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.changepoint import (
    cusum_alarms,
    cusum_detect,
    ewma_detect,
)


def _naive_cusum(z, k):
    cp = cn = 0.0
    pos, neg = [], []
    for v in z:
        cp = max(0.0, cp + v - k)
        cn = max(0.0, cn - v - k)
        pos.append(cp)
        neg.append(cn)
    return np.array(pos), np.array(neg)


@pytest.fixture(scope="module")
def drift_pdf():
    rng = np.random.default_rng(9)
    rows = []
    for g in range(3):
        n = 400
        x = rng.normal(10.0, 2.0, n)
        if g == 1:
            x[250:] += 3.0                    # step shift → CUSUM alarm
        if g == 2:
            x += np.linspace(0, 2.5, n)       # slow drift → EWMA alarm
        for t, v in enumerate(x):
            rows.append({"series": g, "t": t, "v": float(v)})
    return pd.DataFrame(rows)


def test_cusum_matches_naive_recursion(spark, drift_pdf):
    sdf = spark.createDataFrame(drift_pdf).repartition(8)
    out = (cusum_detect(sdf, "v", "t", "series", target=10.0, sd=2.0,
                        k=0.5, h=5.0)
           .orderBy("series", "t").toPandas())
    for g, sub in drift_pdf.groupby("series"):
        z = (sub.sort_values("t").v.to_numpy() - 10.0) / 2.0
        pos, neg = _naive_cusum(z, 0.5)
        got = out[out.series == g].sort_values("t")
        assert got.cusum_pos.to_numpy() == pytest.approx(pos, abs=1e-9)
        assert got.cusum_neg.to_numpy() == pytest.approx(neg, abs=1e-9)
        assert (got.alarm.to_numpy() == ((pos > 5) | (neg > 5))).all()
    # the shifted series alarms persistently after the shift (its
    # positive chart stays pinned above h; random excursions elsewhere
    # are legitimate chart behavior, not asserted away)
    s1 = out[(out.series == 1) & (out.t >= 270)]
    assert (s1.cusum_pos > 5).mean() > 0.9
    assert out[(out.series == 1) & (out.t < 250)].cusum_pos.max() < 5


def test_cusum_alarms_summary_and_estimated_params(spark, drift_pdf):
    sdf = spark.createDataFrame(drift_pdf)
    summ = (cusum_alarms(sdf, "v", "t", "series", target=10.0, sd=2.0)
            .orderBy("series").toPandas())
    assert list(summ.n_points) == [400, 400, 400]
    # the step series alarms hard; its first crossing is after the shift
    assert summ.loc[1, "n_alarms"] > 50 > summ.loc[0, "n_alarms"]
    assert summ.loc[1, "first_alarm_t"] > 250
    assert summ.loc[1, "max_cusum_pos"] > summ.loc[0, "max_cusum_pos"]
    # estimated (Phase-I) params still expose the step series
    est = (cusum_alarms(sdf, "v", "t", "series", h=8.0)
           .orderBy("series").toPandas())
    assert est.loc[1, "n_alarms"] > 0
    with pytest.raises(ValueError, match="sd"):
        cusum_detect(sdf, "v", "t", "series", target=1.0, sd=0.0)
    with pytest.raises(ValueError, match="h > 0"):
        cusum_detect(sdf, "v", "t", "series", h=0.0)


def test_ewma_matches_pandas_and_catches_drift(spark, drift_pdf):
    sdf = spark.createDataFrame(drift_pdf).repartition(8)
    out = (ewma_detect(sdf, "v", "t", "series", target=10.0, sd=2.0,
                       lam=0.2, L=3.0)
           .orderBy("series", "t").toPandas())
    for g, sub in drift_pdf.groupby("series"):
        z = pd.Series((sub.sort_values("t").v.to_numpy() - 10.0) / 2.0)
        # E0 = 0 (the in-control start), so E1 = lam*z1 — matching the
        # UCL variance ramp rather than pandas' raw E1 = z1
        e = np.empty(len(z))
        prev = 0.0
        for i, zi in enumerate(z.to_numpy()):
            prev = 0.2 * zi + 0.8 * prev
            e[i] = prev
        t = np.arange(1, len(z) + 1)
        ucl = 3.0 * np.sqrt(0.2 / 1.8 * (1 - 0.8 ** (2 * t)))
        got = out[out.series == g].sort_values("t")
        assert got.ewma.to_numpy() == pytest.approx(e, abs=1e-9)
        assert got.ucl.to_numpy() == pytest.approx(ucl, abs=1e-9)
    # the drift series alarms persistently by the end; the stable one
    # only has isolated excursions
    tail2 = out[(out.series == 2) & (out.t >= 360)]
    tail0 = out[(out.series == 0) & (out.t >= 360)]
    assert tail2.alarm.mean() > 0.5 > tail0.alarm.mean() + 0.4
    assert out[(out.series == 0) & out.alarm].shape[0] < 20
    with pytest.raises(ValueError, match="lam"):
        ewma_detect(sdf, "v", "t", "series", lam=0.0)


def test_streaming_cusum_matches_batch(spark, tmp_path):
    from fast_causal_inference_spark.sources.tables import load_table
    from fast_causal_inference_spark.streaming.ops import (
        run_to_memory,
        streaming_cusum,
    )

    d = str(tmp_path / "cusum_stream")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema
    s = spark.readStream.schema(schema).parquet(d)
    out = streaming_cusum(s, "value", "ts", target=0.0, sd=50.0,
                          group_col=None, k=0.25, h=3.0)
    run_to_memory(out, "cusum_stream", output_mode="append")
    got = spark.table("cusum_stream").toPandas()
    assert len(got) >= 1
    final = got.iloc[-1]

    pdf = (spark.read.parquet(d).select("ts", "value").toPandas()
           .sort_values("ts"))
    z = (pdf.value.to_numpy(dtype=float)) / 50.0
    pos, neg = _naive_cusum(z, 0.25)
    assert final.n == len(z)
    assert final.cusum_pos == pytest.approx(pos[-1], abs=1e-9)
    assert final.cusum_neg == pytest.approx(neg[-1], abs=1e-9)
    al = (pos > 3.0) | (neg > 3.0)
    assert final.n_alarms == al.sum()
    if al.any():
        assert final.first_alarm_n == float(al.argmax() + 1)
    else:
        assert pd.isna(final.first_alarm_n)
