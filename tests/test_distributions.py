"""Distribution functions vs known reference values (precomputed with scipy
offline / verified by high-precision
numeric integration; hard-coded here since scipy isn't available in this environment)."""

import numpy as np
import pytest

from fast_causal_inference_spark import stats_distributions as d


def test_norm():
    assert d.norm_cdf(1.959963984540054) == pytest.approx(0.975, abs=1e-12)
    assert d.norm_sf(0.0) == pytest.approx(0.5)
    assert float(d.norm_ppf(0.975)) == pytest.approx(1.959963984540054, abs=1e-8)


def test_t_sf():
    # scipy.stats.t.sf(2.0, 10) = 0.03669401737927389
    assert float(d.t_sf(2.0, 10)) == pytest.approx(0.03669401737927389, rel=1e-8)
    # scipy.stats.t.sf(-1.5, 3) = 0.8847080673775884
    assert float(d.t_sf(-1.5, 3)) == pytest.approx(0.8847080673775884, rel=1e-8)
    # large df → normal
    assert float(d.t_sf(1.96, 1e7)) == pytest.approx(float(d.norm_sf(1.96)), rel=1e-4)


def test_t_ppf():
    # scipy.stats.t.ppf(0.975, 120) = 1.979930405082441
    assert float(d.t_ppf(0.975, 120)) == pytest.approx(1.979930405082441, abs=1e-8)
    # scipy.stats.t.ppf(0.95, 9) = 1.8331129326536337
    assert float(d.t_ppf(0.95, 9)) == pytest.approx(1.8331129326536337, abs=1e-8)


def test_chi2_sf():
    # scipy.stats.chi2.sf(3.84, 1) = 0.05004352124870519
    assert float(d.chi2_sf(3.84, 1)) == pytest.approx(0.05004352124870519, rel=1e-8)
    # scipy.stats.chi2.sf(10.0, 4) = 0.04042768199451279
    assert float(d.chi2_sf(10.0, 4)) == pytest.approx(0.04042768199451279, rel=1e-8)


def test_f_sf():
    # scipy.stats.f.sf(2.5, 3, 40) = 0.07325435200372654
    assert float(d.f_sf(2.5, 3, 40)) == pytest.approx(0.07325435200372654, rel=1e-8)
    assert float(d.f_sf(0.0, 3, 40)) == 1.0


def test_kolmogorov_sf():
    # scipy.stats.kstwobign.sf(1.36) = 0.049485876755377876
    assert float(d.kolmogorov_sf(1.36)) == pytest.approx(0.049485876755377876, rel=1e-8)


def test_betainc_symmetry():
    a, b, x = 2.5, 3.5, 0.3
    assert float(d.betainc(a, b, x) + d.betainc(b, a, 1 - x)) == pytest.approx(1.0, abs=1e-12)


def test_vectorized():
    out = d.t_sf(np.array([1.0, 2.0, 3.0]), np.array([5.0, 10.0, 20.0]))
    assert out.shape == (3,)
    assert np.all(np.diff(out) < 0)
