"""Hand-rolled statistics vs published table values (SURVEY.md §7.3 item 6)."""

import math

import pytest

from jsonschema_infer_spark.functions.stats import (
    chi2_homogeneity,
    chi2_sf,
    gamma_q,
    kolmogorov_sf,
    ks_two_sample_p,
)


def test_chi2_sf_table_values():
    # classic critical values: P(X >= x) for chi-square
    assert chi2_sf(3.841, 1) == pytest.approx(0.05, abs=2e-4)
    assert chi2_sf(5.991, 2) == pytest.approx(0.05, abs=2e-4)
    assert chi2_sf(11.345, 3) == pytest.approx(0.01, abs=2e-4)
    assert chi2_sf(15.086, 5) == pytest.approx(0.01, abs=2e-4)
    assert chi2_sf(0.0, 4) == 1.0
    # exponential special case: k=2 -> sf(x) = exp(-x/2)
    for x in (0.5, 2.0, 10.0, 40.0):
        assert chi2_sf(x, 2) == pytest.approx(math.exp(-x / 2), rel=1e-10)


def test_gamma_q_monotone_and_bounds():
    prev = 1.0
    for x in [0.0, 0.5, 1.0, 2.0, 5.0, 10.0, 50.0]:
        q = gamma_q(2.5, x)
        assert 0.0 <= q <= prev <= 1.0
        prev = q


def test_kolmogorov_table_values():
    # Q_KS at the classic alpha thresholds
    assert kolmogorov_sf(1.358) == pytest.approx(0.05, abs=2e-3)
    assert kolmogorov_sf(1.224) == pytest.approx(0.10, abs=2e-3)
    assert kolmogorov_sf(1.628) == pytest.approx(0.01, abs=2e-3)
    assert kolmogorov_sf(0.0) == 1.0
    assert kolmogorov_sf(10.0) < 1e-80


def test_chi2_homogeneity_hand_computed():
    # 3-bucket toy (FIXTURES.md §C): a=[10,20,30], b=[30,20,10]
    # pooled p = 1/3 each; E = 20 per cell; stat = 2*(5+0+5) = 20; dof = 2
    r = chi2_homogeneity({"x": 10, "y": 20, "z": 30}, {"x": 30, "y": 20, "z": 10})
    assert r["statistic"] == pytest.approx(20.0)
    assert r["dof"] == 2
    assert r["p_value"] == pytest.approx(math.exp(-10.0), rel=1e-9)


def test_chi2_homogeneity_identical_distributions():
    r = chi2_homogeneity({"a": 500, "b": 300}, {"a": 500, "b": 300})
    assert r["statistic"] == pytest.approx(0.0)
    assert r["p_value"] == pytest.approx(1.0)


def test_chi2_category_only_on_one_side():
    r = chi2_homogeneity({"a": 50, "b": 50}, {"a": 100})
    assert r["dof"] == 1
    assert 0 < r["p_value"] < 1


def test_ks_two_sample_p_behaviour():
    # bigger D or bigger n -> smaller p
    assert ks_two_sample_p(0.5, 100, 100) < ks_two_sample_p(0.1, 100, 100)
    assert ks_two_sample_p(0.1, 10000, 10000) < ks_two_sample_p(0.1, 100, 100)
    # known ballpark: D=0.2, n1=n2=100 -> lambda ~ 1.43 -> p ~ 0.033
    assert ks_two_sample_p(0.2, 100, 100) == pytest.approx(0.033, abs=0.01)
    assert ks_two_sample_p(0.0, 50, 50) == 1.0
