"""Unit tests for the pure-numpy local GLM kernel (no Spark)."""

import numpy as np
import pytest

from photon_ml_spark.ml.local_glm import fit_local_glm

RNG = np.random.default_rng(7)


def _synth(family, n=400, d=4):
    X = RNG.normal(size=(n, d))
    if family == "poisson":
        beta = np.array([0.5, -0.6, 0.3, 0.0])  # keep rates moderate
    else:
        beta = np.array([1.0, -2.0, 0.5, 0.0])
    margin = X @ beta + 0.3
    if family == "binomial":
        y = (RNG.uniform(size=n) < 1 / (1 + np.exp(-margin))).astype(float)
    elif family == "poisson":
        y = RNG.poisson(np.exp(margin)).astype(float)
    else:
        y = margin + RNG.normal(scale=0.1, size=n)
    return X, y, beta


@pytest.mark.parametrize("family", ["binomial", "gaussian", "poisson"])
def test_recovers_coefficients(family):
    X, y, beta = _synth(family)
    res = fit_local_glm(X, y, family=family, l2=0.0)
    assert res["converged"]
    assert np.allclose(res["coefficients"], beta, atol=0.35)
    assert abs(res["intercept"] - 0.3) < 0.35


def test_gaussian_matches_closed_form():
    X, y, _ = _synth("gaussian")
    n, d = X.shape
    res = fit_local_glm(X, y, family="gaussian", l2=0.0)
    Z = np.hstack([X, np.ones((n, 1))])
    exact = np.linalg.solve(Z.T @ Z, Z.T @ y)
    assert np.allclose(res["coefficients"], exact[:d], atol=1e-6)
    assert abs(res["intercept"] - exact[-1]) < 1e-6


def test_l2_shrinks_not_intercept():
    X, y, _ = _synth("binomial")
    r0 = fit_local_glm(X, y, family="binomial", l2=0.0)
    r1 = fit_local_glm(X, y, family="binomial", l2=100.0)
    assert np.linalg.norm(r1["coefficients"]) < np.linalg.norm(r0["coefficients"])
    # intercept is unpenalized: stays near the base-rate logit
    base = np.log(y.mean() / (1 - y.mean()))
    assert abs(r1["intercept"] - base) < 0.5


def test_offset_and_weight():
    X, y, _ = _synth("gaussian")
    off = np.full(len(y), 2.0)
    res = fit_local_glm(X, y + 2.0, offset=off, family="gaussian")
    res0 = fit_local_glm(X, y, family="gaussian")
    assert np.allclose(res["coefficients"], res0["coefficients"], atol=1e-6)
    assert abs(res["intercept"] - res0["intercept"]) < 1e-6

    # zero-weight rows are invisible
    w = np.ones(len(y))
    w[: len(y) // 2] = 0.0
    ra = fit_local_glm(X[len(y) // 2:], y[len(y) // 2:], family="gaussian")
    rb = fit_local_glm(X, y, weight=w, family="gaussian")
    assert np.allclose(ra["coefficients"], rb["coefficients"], atol=1e-8)


def test_warm_start_fewer_iters():
    X, y, _ = _synth("binomial")
    r0 = fit_local_glm(X, y, family="binomial")
    x0 = np.concatenate([r0["coefficients"], [r0["intercept"]]])
    r1 = fit_local_glm(X, y, family="binomial", x0=x0)
    assert r1["n_iter"] <= 2


def test_gaussian_prior_pulls_to_mean():
    X, y, _ = _synth("binomial")
    mu = np.zeros(5)
    mu[0] = 5.0
    strong = np.full(5, 1e6)
    res = fit_local_glm(X, y, family="binomial",
                        prior_mean=mu, prior_precision=strong)
    assert abs(res["coefficients"][0] - 5.0) < 1e-2
    assert abs(res["intercept"] - 0.0) < 1e-2


def test_variance_full_vs_simple():
    X, y, _ = _synth("binomial")
    rs = fit_local_glm(X, y, family="binomial", compute_variance="simple")
    rf = fit_local_glm(X, y, family="binomial", compute_variance="full")
    assert rs["variances"].shape == (4,)
    assert rf["variances"].shape == (4,)
    assert np.all(rs["variances"] > 0) and np.all(rf["variances"] > 0)
    # full (inverse-Hessian diag) >= simple (1/diag) by Cauchy-Schwarz
    assert np.all(rf["variances"] >= rs["variances"] - 1e-12)


def test_box_constraints_respected_and_inactive_matches():
    """LBFGSB-analog box constraints: active bounds clamp coefficients
    at the box; wide bounds reproduce the unconstrained fit."""
    import numpy as np

    from photon_ml_spark.ml.local_glm import fit_local_glm

    rng = np.random.default_rng(11)
    X = rng.normal(size=(400, 3))
    beta_true = np.array([2.0, -1.5, 0.5])
    y = (X @ beta_true + rng.normal(scale=0.1, size=400) > 0).astype(float)

    free = fit_local_glm(X, y, family="binomial", l2=0.1)
    wide = fit_local_glm(
        X, y, family="binomial", l2=0.1,
        lower_bounds=np.full(3, -100.0), upper_bounds=np.full(3, 100.0),
    )
    assert np.allclose(free["coefficients"], wide["coefficients"], atol=1e-6)

    boxed = fit_local_glm(
        X, y, family="binomial", l2=0.1,
        lower_bounds=np.array([-0.5, -0.5, -0.5]),
        upper_bounds=np.array([0.5, 0.5, 0.5]),
    )
    c = boxed["coefficients"]
    assert np.all(c >= -0.5 - 1e-12) and np.all(c <= 0.5 + 1e-12)
    # the strong positive/negative coefficients must sit AT the bounds
    assert abs(c[0] - 0.5) < 1e-6 and abs(c[1] + 0.5) < 1e-6
    # boxed solution is optimal within the box: nudging a clamped
    # coordinate inward only worsens the objective — proxy: the free
    # solution's sign structure is preserved
    assert boxed["converged"]
