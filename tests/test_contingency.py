"""Chi-square independence + Fisher exact vs hand-computed oracles
(values cross-checked against R chisq.test / fisher.test conventions)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fast_causal_inference_spark.operators.contingency import (
    chi_square_independence,
    fisher_exact_2x2,
)


def _df_from_table(spark, tab):
    rows = []
    for i, row in enumerate(tab):
        for j, n in enumerate(row):
            rows += [{"x": f"x{i}", "y": f"y{j}"}] * n
    return spark.createDataFrame(pd.DataFrame(rows)).repartition(4)


def test_chi2_matches_hand_formula(spark):
    tab = [[30, 10], [15, 25]]
    d = _df_from_table(spark, tab)
    out = chi_square_independence(d, "x", "y")
    arr = np.array(tab, dtype=float)
    n = arr.sum()
    exp = np.outer(arr.sum(1), arr.sum(0)) / n
    chi2 = (((arr - exp) ** 2) / exp).sum()
    assert out.chi2[0] == pytest.approx(chi2)
    assert out.df[0] == 1.0
    assert 0 < out.p_value[0] < 1e-3          # strong association
    # 2×2 shortcut: n(ad-bc)² / (r1 r2 c1 c2) = 80·600²/2 520 000
    assert out.chi2[0] == pytest.approx(80 * 600**2 / 2_520_000)


def test_chi2_yates_correction(spark):
    tab = [[8, 2], [1, 5]]
    d = _df_from_table(spark, tab)
    plain = chi_square_independence(d, "x", "y")
    corr = chi_square_independence(d, "x", "y", correction=True)
    assert corr.chi2[0] < plain.chi2[0]


def test_chi2_independent_data_high_p(spark):
    rng = np.random.default_rng(0)
    pdf = pd.DataFrame({"x": rng.choice(["a", "b", "c"], 3000),
                        "y": rng.choice(["u", "v"], 3000)})
    d = spark.createDataFrame(pdf)
    out = chi_square_independence(d, "x", "y")
    assert out.p_value[0] > 0.01
    assert out.cramers_v[0] < 0.1


def test_fisher_exact_matches_exact_hypergeometric(spark):
    from math import comb

    tab = [[8, 2], [1, 5]]
    a, b = tab[0]
    c, dd = tab[1]
    r1, r2, c1 = a + b, c + dd, a + c
    n = r1 + r2
    denom = comb(n, c1)
    lo, hi = max(0, c1 - r2), min(r1, c1)
    pmf = {aa: comb(r1, aa) * comb(r2, c1 - aa) / denom
           for aa in range(lo, hi + 1)}
    p_two = sum(p for p in pmf.values() if p <= pmf[a] * (1 + 1e-9))
    p_greater = sum(p for aa, p in pmf.items() if aa >= a)

    d = _df_from_table(spark, tab)
    out = fisher_exact_2x2(d, "x", "y")
    assert out.odds_ratio[0] == pytest.approx(20.0)
    assert out.p_value[0] == pytest.approx(p_two, rel=1e-9)
    # cross-check the scipy-published value for this classic table
    assert out.p_value[0] == pytest.approx(0.034965, abs=1e-5)
    g = fisher_exact_2x2(d, "x", "y", alternative="greater")
    assert g.p_value[0] == pytest.approx(p_greater, rel=1e-9)


def test_fisher_requires_2x2(spark):
    tab = [[5, 5, 5], [5, 5, 5]]
    d = _df_from_table(spark, tab)
    with pytest.raises(ValueError, match="2×2"):
        fisher_exact_2x2(d, "x", "y")


def test_cmh_matches_hand_classic(spark):
    """R's mantelhaen.test admissions-style fixture: two strata with
    reversed marginal association (Simpson's paradox guard)."""
    strata = {
        "s1": [[10, 20], [30, 40]],
        "s2": [[40, 30], [20, 10]],
    }
    rows = []
    for s, tab in strata.items():
        for i, row in enumerate(tab):
            for j, n in enumerate(row):
                rows += [{"s": s, "x": f"x{i}", "y": f"y{j}"}] * n
    d = spark.createDataFrame(pd.DataFrame(rows)).repartition(4)
    from fast_causal_inference_spark.operators.contingency import cmh_test

    out = cmh_test(d, "x", "y", "s")
    # hand CMH with continuity correction
    num = den = orn = ord_ = 0.0
    for tab in strata.values():
        (a, b), (c, dd) = tab
        t = a + b + c + dd
        num += a - (a + b) * (a + c) / t
        den += ((a + b) * (c + dd) * (a + c) * (b + dd)) / (t * t * (t - 1))
        orn += a * dd / t
        ord_ += b * c / t
    stat = (abs(num) - 0.5) ** 2 / den
    assert out.statistic[0] == pytest.approx(stat, rel=1e-12)
    assert out.mh_odds_ratio[0] == pytest.approx(orn / ord_, rel=1e-12)
    assert out.n_strata[0] == 2


def test_cmh_validates_binary(spark):
    rows = [{"s": "a", "x": f"x{i}", "y": f"y{j}"}
            for i in range(3) for j in range(2)]
    d = spark.createDataFrame(pd.DataFrame(rows))
    from fast_causal_inference_spark.operators.contingency import cmh_test

    with pytest.raises(ValueError, match="binary"):
        cmh_test(d, "x", "y", "s")
