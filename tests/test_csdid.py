"""Callaway-Sant'Anna vs a direct numpy oracle (cells, aggregations, IF SEs)."""

import math

import numpy as np
import pandas as pd
import pytest


def _staggered_panel(seed=31, U=30, T=10, noise=0.6, het=True):
    """Units 0-14 adopt at 4 + u%3 (groups 4,5,6), 15-29 never.  With
    ``het`` the effect path is GROUP-heterogeneous (larger for early
    adopters) — the regime where pooled TWFE is contaminated and CS is
    the recommended estimator."""
    rng = np.random.default_rng(seed)
    ue = rng.normal(0, 2, U)
    te = rng.normal(0, 1, T)
    rows = []
    for u in range(U):
        a = 4 + u % 3 if u < 15 else None
        for t in range(T):
            eff = 0.0
            if a is not None and t >= a:
                base = 1.0 + (0.5 * (6 - a) if het else 0.0)
                eff = base + 0.3 * (t - a)
            rows.append((u, t, a, ue[u] + te[t] + eff
                         + rng.normal(0, noise)))
    return pd.DataFrame(rows, columns=["u", "t", "a", "y"])


def _np_cs(pdf, control="never_treated", base_period="universal"):
    """Direct numpy implementation of the unconditional CS estimator."""
    cells = pdf.groupby(["u", "t"], as_index=False).y.mean()
    piv = cells.pivot(index="u", columns="t", values="y")
    amap = pdf.groupby("u").a.first()
    times = sorted(pdf.t.unique())
    prev = {t: times[i - 1] for i, t in enumerate(times) if i > 0}
    groups = sorted(int(g) for g in pdf.a.dropna().unique())
    cellrecs = []   # (g, t, b, att, welch_se, m1, m0, n1, n0, d_by_unit)
    for g in groups:
        if g - 1 not in times:
            continue
        for t in times:
            if base_period == "universal":
                b = g - 1
            else:
                b = g - 1 if t >= g else prev.get(t)
                if b is None:
                    continue
            if t == b:
                continue
            d = piv[t] - piv[b]
            treat = amap == g
            if control == "never_treated":
                ctrl = amap.isna()
            else:
                # not-yet-treated at max(t, b), and never the g group
                # itself (for t < g-1 group-g units satisfy a > max(t,b))
                ctrl = (amap.isna() | (amap > max(t, b))) & ~treat
            d1 = d[treat.reindex(d.index, fill_value=False)].dropna()
            d0 = d[ctrl.reindex(d.index, fill_value=False)].dropna()
            n1, n0 = len(d1), len(d0)
            if n1 < 2 or n0 < 2:
                continue
            m1, m0 = d1.mean(), d0.mean()
            att = m1 - m0
            se = math.sqrt(d1.var(ddof=1) / n1 + d0.var(ddof=1) / n0)
            cellrecs.append((g, t, b, att, se, m1, m0, n1, n0,
                             {"t": d1, "c": d0}))
    return cellrecs


def _np_agg(cellrecs):
    """Aggregations + influence-function variances from the cell records."""
    targets = {}
    for i, (g, t, b, att, se, m1, m0, n1, n0, dd) in enumerate(cellrecs):
        e = t - g
        targets.setdefault(f"evt_{e}", {})[i] = n1
        if e >= 0:
            targets.setdefault(f"grp_{g}", {})[i] = 1.0
            targets.setdefault("overall", {})[i] = n1
    out = {}
    for name, ws in targets.items():
        tot = sum(ws.values())
        ws = {i: w / tot for i, w in ws.items()}
        est = sum(w * cellrecs[i][3] for i, w in ws.items())
        psi = {}
        for i, w in ws.items():
            g, t, b, att, se, m1, m0, n1, n0, dd = cellrecs[i]
            for u, d in dd["t"].items():
                psi[u] = psi.get(u, 0.0) + w * (d - m1) / n1
            for u, d in dd["c"].items():
                psi[u] = psi.get(u, 0.0) - w * (d - m0) / n0
        out[name] = (est, math.sqrt(sum(p * p for p in psi.values())))
    return out


@pytest.mark.parametrize("control,base", [
    ("never_treated", "universal"),
    ("not_yet_treated", "universal"),
    ("never_treated", "varying"),
])
def test_cells_match_numpy(spark, control, base):
    from fast_causal_inference_spark.operators.csdid import (
        callaway_santanna,
    )

    pdf = _staggered_panel()
    sdf = spark.createDataFrame(pdf.assign(
        a=pdf.a.astype("float"))).repartition(7)
    res = callaway_santanna(sdf, "y", "u", "t", "a", control=control,
                            base_period=base)
    want = _np_cs(pdf, control, base)
    assert len(res.att_gt) == len(want)
    got = {(r.group, r.time): r for r in res.att_gt.itertuples()}
    for (g, t, b, att, se, m1, m0, n1, n0, _) in want:
        r = got[(g, t)]
        assert r.base == b
        assert r.att == pytest.approx(att, abs=1e-9)
        assert r.stderr == pytest.approx(se, abs=1e-9)
        assert (r.n_treated, r.n_control) == (n1, n0)


def test_aggregations_and_if_se(spark):
    from fast_causal_inference_spark.operators.csdid import (
        callaway_santanna,
    )

    pdf = _staggered_panel()
    sdf = spark.createDataFrame(pdf.assign(a=pdf.a.astype("float")))
    res = callaway_santanna(sdf, "y", "u", "t", "a")
    want = _np_agg(_np_cs(pdf))
    assert res.overall["att"] == pytest.approx(want["overall"][0], abs=1e-9)
    assert res.overall["stderr"] == pytest.approx(want["overall"][1],
                                                  abs=1e-9)
    for r in res.event_study.itertuples():
        e, s = want[f"evt_{r.rel_period}"]
        assert r.estimate == pytest.approx(e, abs=1e-9)
        assert r.stderr == pytest.approx(s, abs=1e-9)
    for r in res.group.itertuples():
        e, s = want[f"grp_{r.group}"]
        assert r.estimate == pytest.approx(e, abs=1e-9)
        assert r.stderr == pytest.approx(s, abs=1e-9)


def test_recovers_heterogeneous_truth(spark):
    """On a low-noise heterogeneous panel the group aggregations land on
    each group's own average post effect — the property pooled TWFE
    loses."""
    from fast_causal_inference_spark.operators.csdid import (
        callaway_santanna,
    )

    pdf = _staggered_panel(seed=7, U=60, T=10, noise=0.05)
    sdf = spark.createDataFrame(pdf.assign(a=pdf.a.astype("float")))
    res = callaway_santanna(sdf, "y", "u", "t", "a")
    for r in res.group.itertuples():
        g = r.group
        post = range(g, 10)
        truth = np.mean([1.0 + 0.5 * (6 - g) + 0.3 * (t - g)
                         for t in post])
        assert r.estimate == pytest.approx(truth, abs=0.1)
    # pre-period placebo path ~ 0
    pre = res.event_study[res.event_study.rel_period < 0]
    assert pre.estimate.abs().max() < 0.1


def test_raw_rows_collapse_to_cells(spark):
    """Multiple raw rows per (unit, period) average into one cell first."""
    from fast_causal_inference_spark.operators.csdid import (
        callaway_santanna,
    )

    pdf = _staggered_panel(seed=3)
    dup = pd.concat([pdf.assign(y=pdf.y + 0.5), pdf.assign(y=pdf.y - 0.5)])
    a = callaway_santanna(
        spark.createDataFrame(dup.assign(a=dup.a.astype("float"))),
        "y", "u", "t", "a")
    b = callaway_santanna(
        spark.createDataFrame(pdf.assign(a=pdf.a.astype("float"))),
        "y", "u", "t", "a")
    pd.testing.assert_frame_equal(a.att_gt, b.att_gt, atol=1e-9, rtol=0)


def test_errors(spark):
    from fast_causal_inference_spark.operators.csdid import (
        callaway_santanna,
    )

    pdf = _staggered_panel()
    sdf = spark.createDataFrame(pdf.assign(a=pdf.a.astype("float")))
    with pytest.raises(ValueError, match="control must"):
        callaway_santanna(sdf, "y", "u", "t", "a", control="nope")
    # adoption varying within a unit
    bad = sdf.withColumn("a", (sdf.t % 3).cast("double"))
    with pytest.raises(ValueError, match="not constant within"):
        callaway_santanna(bad, "y", "u", "t", "a")
    # every group lacks a base period
    import pyspark.sql.functions as F
    nob = sdf.withColumn("a", F.when(sdf.a.isNotNull(), F.lit(0.0)))
    with pytest.raises(ValueError, match="no estimable"):
        callaway_santanna(nob, "y", "u", "t", "a")


def test_skips_group_without_base_warns(spark):
    from fast_causal_inference_spark.operators.csdid import (
        callaway_santanna,
    )
    import pyspark.sql.functions as F

    pdf = _staggered_panel()
    sdf = spark.createDataFrame(pdf.assign(a=pdf.a.astype("float")))
    # group 4 -> 0 (no period -1 exists); groups 5,6 keep their bases
    mixed = sdf.withColumn(
        "a", F.when(sdf.a == 4, F.lit(0.0)).otherwise(sdf.a))
    with pytest.warns(UserWarning, match=r"groups \[0\]"):
        res = callaway_santanna(mixed, "y", "u", "t", "a")
    assert res.skipped_groups == [0]
    assert set(res.att_gt.group.unique()) == {5, 6}
