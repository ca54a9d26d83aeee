"""Hypothesis property suites for the streaming tier (round 10,
verdict item 7): the dedup/codec property pattern applied to
``streaming/ops.py`` — mSPRT alpha-spending monotonicity and
batch-split invariance, CUSUM cross-micro-batch state folding vs an
offline scalar recompute, EWMA vs the textbook recursion, and
session_window gap semantics vs an offline splitter — all driving the
REAL ``applyInPandasWithState`` / ``session_window`` paths on
hypothesis-generated event streams."""

import math
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fast_causal_inference_spark.streaming.ops import (
    run_to_memory,
    sessionize,
    streaming_cusum,
    streaming_sequential_ttest,
)

_SETTINGS = dict(max_examples=5, deadline=None,
                 suppress_health_check=[
                     HealthCheck.function_scoped_fixture,
                     HealthCheck.too_slow])


def _write_files(spark, pdf, n_files):
    """Write pdf as n_files parquet files with ts-ordered file split so
    maxFilesPerTrigger=1 replays the stream in event-time order."""
    d = tempfile.mkdtemp(prefix="fcis_prop_")
    rows = len(pdf)
    per = -(-rows // n_files)
    for i in range(n_files):
        chunk = pdf.iloc[i * per:(i + 1) * per]
        if len(chunk):
            spark.createDataFrame(chunk).coalesce(1) \
                .write.parquet(f"{d}/f{i:03d}")
    return d


def _stream(spark, d, one_file_per_batch):
    schema = spark.read.parquet(f"{d}/*").schema
    r = spark.readStream.schema(schema)
    if one_file_per_batch:
        r = r.option("maxFilesPerTrigger", 1)
    return r.parquet(f"{d}/*")


_counter = [0]


def _name(prefix):
    _counter[0] += 1
    return f"{prefix}_{_counter[0]}"


@given(data=st.data())
@settings(**_SETTINGS)
def test_msprt_alpha_spending_monotone_and_split_dominance(
        spark, data):
    """The always-valid p is a running min(1, 1/max Λ): (a) it is
    NON-INCREASING across micro-batch emissions (alpha already spent
    never un-spends); (b) the cumulative moments are batch-split
    INVARIANT, so the final estimate/stderr/lambda agree between a
    1-batch and an N-batch replay of the same stream; (c) more peeks
    can only spend more: p_final(N batches) <= p_final(1 batch)."""
    n = data.draw(st.integers(24, 60))
    shift = data.draw(st.floats(0.0, 3.0))
    seed = data.draw(st.integers(0, 10_000))
    rng = np.random.default_rng(seed)
    arm = rng.integers(0, 2, n)
    # at least 2 per arm for the variance to exist
    arm[:4] = [0, 0, 1, 1]
    y = rng.normal(0, 1, n) + shift * arm
    pdf = pd.DataFrame({
        "ts": pd.date_range("2026-01-01", periods=n, freq="1min"),
        "treatment": arm.astype(int), "value": y})
    d = _write_files(spark, pdf, 4)
    try:
        emissions = {}
        for label, one_per in (("multi", True), ("single", False)):
            name = _name(f"msprt_{label}")
            out = streaming_sequential_ttest(
                _stream(spark, d, one_per), "value", "treatment",
                "ts", tau=0.7)
            run_to_memory(out, name, output_mode="append")
            emissions[label] = spark.table(name).toPandas()
        multi, single = emissions["multi"], emissions["single"]
        assert len(single) == 1
        assert len(multi) >= 2
        p = multi["always_valid_p"].to_numpy()
        assert (np.diff(p) <= 1e-12).all(), p        # (a) monotone
        for c in ("n0", "n1", "estimate", "stderr", "lambda_"):
            a, b = multi.iloc[-1][c], single.iloc[0][c]
            assert (a == pytest.approx(b, rel=1e-9, abs=1e-12)
                    or (math.isnan(a) and math.isnan(b))), c  # (b)
        assert multi.iloc[-1]["always_valid_p"] \
            <= single.iloc[0]["always_valid_p"] + 1e-12       # (c)
        # offline recompute of the final moments
        y0, y1 = y[arm == 0], y[arm == 1]
        assert multi.iloc[-1]["n0"] == len(y0)
        assert multi.iloc[-1]["estimate"] == pytest.approx(
            y1.mean() - y0.mean(), rel=1e-9)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _cusum_offline(z, k, h):
    """Scalar-loop textbook CUSUM — the independent oracle."""
    cp = cn = 0.0
    n_al = 0
    first = float("nan")
    for i, zi in enumerate(z):
        cp = max(0.0, cp + zi - k)
        cn = max(0.0, cn - zi - k)
        if cp > h or cn > h:
            n_al += 1
            if math.isnan(first):
                first = i + 1.0
    return cp, cn, n_al, first


@given(data=st.data())
@settings(**_SETTINGS)
def test_streaming_cusum_matches_offline_scalar_loop(spark, data):
    """The vectorized prefix-sum fold inside the REAL
    applyInPandasWithState path must equal the textbook one-step
    recursion, including across micro-batch state carries."""
    n = data.draw(st.integers(20, 80))
    cut = data.draw(st.integers(5, 15))
    drift = data.draw(st.floats(-4.0, 4.0))
    seed = data.draw(st.integers(0, 10_000))
    rng = np.random.default_rng(seed)
    z = rng.normal(0, 1, n)
    z[cut:] += drift
    pdf = pd.DataFrame({
        "ts": pd.date_range("2026-01-01", periods=n, freq="1s"),
        "x": z * 2.0 + 10.0})                 # target 10, sd 2
    d = _write_files(spark, pdf, 3)
    try:
        name = _name("cusum")
        out = streaming_cusum(_stream(spark, d, True), "x", "ts",
                              target=10.0, sd=2.0, k=0.5, h=4.0)
        run_to_memory(out, name, output_mode="append")
        got = spark.table(name).toPandas().iloc[-1]
        cp, cn, n_al, first = _cusum_offline(z, 0.5, 4.0)
        assert got["n"] == n                  # state carried, not reset
        assert got["cusum_pos"] == pytest.approx(cp, abs=1e-9)
        assert got["cusum_neg"] == pytest.approx(cn, abs=1e-9)
        assert got["n_alarms"] == n_al
        assert (got["first_alarm_n"] == pytest.approx(first)
                or (math.isnan(got["first_alarm_n"])
                    and math.isnan(first)))
    finally:
        shutil.rmtree(d, ignore_errors=True)


@given(data=st.data())
@settings(**_SETTINGS)
def test_ewma_detect_matches_textbook_recursion(spark, data):
    """Batch EWMA chart vs the scalar E_t = lam*z_t + (1-lam)*E_{t-1}
    recursion with the variance-ramped UCL; alarms shrink when L
    grows."""
    from fast_causal_inference_spark.operators.changepoint import (
        ewma_detect,
    )

    n = data.draw(st.integers(10, 60))
    lam = data.draw(st.floats(0.05, 0.9))
    drift = data.draw(st.floats(-3.0, 3.0))
    seed = data.draw(st.integers(0, 10_000))
    rng = np.random.default_rng(seed)
    z = rng.normal(0, 1, n)
    z[n // 2:] += drift
    pdf = pd.DataFrame({"i": np.arange(n), "x": z})
    df = spark.createDataFrame(pdf)
    got = (ewma_detect(df, "x", "i", target=0.0, sd=1.0, lam=lam,
                       L=2.5).orderBy("i").toPandas())
    e = 0.0
    for t in range(n):
        e = lam * z[t] + (1 - lam) * e
        ucl = 2.5 * math.sqrt(lam / (2 - lam)
                              * (1 - (1 - lam) ** (2 * (t + 1))))
        assert got["ewma"].iloc[t] == pytest.approx(e, abs=1e-9)
        assert got["ucl"].iloc[t] == pytest.approx(ucl, abs=1e-9)
        assert bool(got["alarm"].iloc[t]) == (abs(e) > ucl)
    wide = ewma_detect(df, "x", "i", target=0.0, sd=1.0, lam=lam,
                       L=6.0).toPandas()
    assert wide["alarm"].sum() <= got["alarm"].sum()


def _sessions_offline(offsets_sec, gap_sec):
    """Offline gap splitter: session count + events per session.
    Spark's session_window end is INCLUSIVE at the boundary — an event
    exactly gap seconds after the previous one still merges (verified
    empirically: deltas [10,10] with gap 10s -> ONE session), so the
    split condition is strictly-greater."""
    counts = []
    cur = 1
    for a, b in zip(offsets_sec, offsets_sec[1:]):
        if b - a > gap_sec:
            counts.append(cur)
            cur = 1
        else:
            cur += 1
    counts.append(cur)
    return counts


@given(data=st.data())
@settings(**_SETTINGS)
def test_sessionize_gap_semantics_and_order_invariance(spark, data):
    """Native session_window vs an offline gap splitter on arbitrary
    inter-event deltas; the result is invariant to input row order;
    a gap above the max delta collapses to one session per user."""
    n = data.draw(st.integers(3, 40))
    deltas = data.draw(st.lists(st.integers(1, 900),
                                min_size=n - 1, max_size=n - 1))
    gap_sec = data.draw(st.integers(2, 1000))
    offs = np.concatenate([[0], np.cumsum(deltas)]).astype(int)
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(offs, unit="s")
    pdf = pd.DataFrame({"user": ["u"] * n, "ts": ts,
                        "v": np.arange(n, dtype=float)})
    df = spark.createDataFrame(pdf)
    got = (sessionize(df, "user", "ts", gap=f"{gap_sec} seconds",
                      value_col="v")
           .orderBy("session_start").toPandas())
    want = _sessions_offline(list(offs), gap_sec)
    assert got["n_events"].tolist() == want
    assert got["n_events"].sum() == n
    # shuffled input rows -> identical sessions
    got2 = (sessionize(spark.createDataFrame(
        pdf.sample(frac=1.0, random_state=7)), "user", "ts",
        gap=f"{gap_sec} seconds", value_col="v")
        .orderBy("session_start").toPandas())
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  got2.reset_index(drop=True))
    # gap wider than every delta -> a single session holding all rows
    wide = sessionize(df, "user", "ts",
                      gap=f"{int(max(deltas)) + 1} seconds").toPandas()
    assert len(wide) == 1 and wide["n_events"].iloc[0] == n


def _ewma_offline(z, lam, L):
    """Scalar textbook EWMA recursion — the independent oracle."""
    a = 1.0 - lam
    e = 0.0
    n_al = 0
    first = float("nan")
    for i, zi in enumerate(z):
        e = lam * zi + a * e
        ucl = L * math.sqrt(lam / (2 - lam) * (1 - a ** (2 * (i + 1))))
        if abs(e) > ucl:
            n_al += 1
            if math.isnan(first):
                first = i + 1.0
    return e, n_al, first


@given(data=st.data())
@settings(**_SETTINGS)
def test_streaming_ewma_matches_offline_scalar_loop(spark, data):
    """streaming_ewma's chunked closed-form fold inside the REAL
    applyInPandasWithState path equals the textbook one-step recursion
    with the global-index variance-ramped UCL, including across
    micro-batch state carries and for extreme lambda."""
    from fast_causal_inference_spark.streaming.ops import streaming_ewma

    n = data.draw(st.integers(15, 70))
    cut = data.draw(st.integers(4, 12))
    drift = data.draw(st.floats(-3.0, 3.0))
    lam = data.draw(st.sampled_from([0.05, 0.2, 0.6, 0.95, 1.0]))
    seed = data.draw(st.integers(0, 10_000))
    rng = np.random.default_rng(seed)
    z = rng.normal(0, 1, n)
    z[cut:] += drift
    pdf = pd.DataFrame({
        "ts": pd.date_range("2026-01-01", periods=n, freq="1s"),
        "x": z * 3.0 - 7.0})                  # target -7, sd 3
    d = _write_files(spark, pdf, 3)
    try:
        name = _name("ewma")
        out = streaming_ewma(_stream(spark, d, True), "x", "ts",
                             target=-7.0, sd=3.0, lam=lam, L=2.8)
        run_to_memory(out, name, output_mode="append")
        got = spark.table(name).toPandas().iloc[-1]
        e, n_al, first = _ewma_offline(z, lam, 2.8)
        assert got["n"] == n
        assert got["ewma"] == pytest.approx(e, abs=1e-9)
        assert got["n_alarms"] == n_al
        assert (got["first_alarm_n"] == pytest.approx(first)
                or (math.isnan(got["first_alarm_n"])
                    and math.isnan(first)))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_charts_gate_matches_batch_detect(spark):
    """The streaming_charts oracle gate's final emissions equal the
    BATCH cusum_detect/ewma_detect charts run over the same thinned,
    event_id-ordered events slice (the round-11 verdict ask: stream
    emissions == batch chart on the same ordered data)."""
    import __spark_entry__ as entry
    from fast_causal_inference_spark.operators.changepoint import (
        cusum_detect,
        ewma_detect,
    )

    sf = "/root/testdata/sf0.001"
    got = entry.queries()["streaming_charts"](spark, sf).toPandas()
    ev = (entry._load(spark, sf, "events")
          .where(F.col("event_id") % 5 == 0))

    cu = cusum_detect(ev, "value", "event_id", group_by="event_type",
                      target=50.0, sd=50.0, k=0.5, h=5.0).toPandas()
    ew = ewma_detect(ev, "value", "event_id", group_by="event_type",
                     target=50.0, sd=50.0, lam=0.2, L=3.0).toPandas()
    for g, sub in got[got["chart"] == "cusum"].groupby("g"):
        want = cu[cu["event_type"] == g].sort_values("event_id")
        vals = dict(zip(sub["feature"], sub["value"]))
        assert vals["n"] == len(want)
        assert vals["cusum_pos"] == pytest.approx(
            float(want["cusum_pos"].iloc[-1]), abs=1e-6)
        assert vals["cusum_neg"] == pytest.approx(
            float(want["cusum_neg"].iloc[-1]), abs=1e-6)
        assert vals["n_alarms"] == float(want["alarm"].sum())
        alarms = np.flatnonzero(want["alarm"].to_numpy())
        first = float(alarms[0] + 1) if len(alarms) else -1.0
        assert vals["first_alarm_n"] == first
    for g, sub in got[got["chart"] == "ewma"].groupby("g"):
        want = ew[ew["event_type"] == g].sort_values("event_id")
        vals = dict(zip(sub["feature"], sub["value"]))
        assert vals["n"] == len(want)
        assert vals["ewma"] == pytest.approx(
            float(want["ewma"].iloc[-1]), abs=1e-6)
        assert vals["ucl"] == pytest.approx(
            float(want["ucl"].iloc[-1]), abs=1e-6)
        assert vals["n_alarms"] == float(want["alarm"].sum())
