"""Distributed penalized fixed-effect solver (OWLQN / prior / box)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from photon_ml_spark.ml import glm
from photon_ml_spark.ml.distributed_solver import solve_penalized, solve_tron
from photon_ml_spark.ml.local_glm import fit_local_glm
from photon_ml_spark.sources import datasets


@pytest.fixture(scope="module")
def uni(spark, sf_dir):
    """Univariate frame: x = quantity, y = quantity + partkey%7 (small
    residual keeps the quadratic objective well-scaled)."""
    return (
        datasets.load_table(spark, sf_dir, "lineitem")
        .select(
            F.array(F.lit(0).cast("long")).alias("features_indices"),
            F.array(F.col("l_quantity").cast("double")).alias("features_values"),
            (F.col("l_quantity") + F.col("l_partkey") % 7)
            .cast("double").alias("response"),
        )
        .cache()
    )


def _np_data(df):
    rows = df.collect()
    X = np.array([[r.features_values[0]] for r in rows])
    y = np.array([r.response for r in rows])
    return X, y


def _suff(X, y):
    n = len(y)
    sx, sy = X[:, 0].sum(), y.sum()
    sxx, sxy = (X[:, 0] ** 2).sum(), (X[:, 0] * y).sum()
    return n, sx, sy, sxx, sxy


def test_l2_matches_local_solver(uni):
    res = solve_penalized(
        uni, dim=1, family="gaussian", weight_col=None, offset_col=None,
        reg_param=10.0, tol=1e-10,
    )
    X, y = _np_data(uni)
    loc = fit_local_glm(X, y, family="gaussian", l2=10.0, tol=1e-12)
    assert np.allclose(res["coefficients"], loc["coefficients"], atol=1e-7)
    assert res["intercept"] == pytest.approx(loc["intercept"], abs=1e-7)


def test_binomial_l2_matches_local_solver(uni):
    b = uni.withColumn("response", (F.col("response") > 30).cast("double"))
    res = solve_penalized(
        b, dim=1, family="binomial", weight_col=None, offset_col=None,
        reg_param=2.0, tol=1e-9,
    )
    X, y = _np_data(b)
    loc = fit_local_glm(X, y, family="binomial", l2=2.0, tol=1e-12)
    assert np.allclose(res["coefficients"], loc["coefficients"], atol=1e-6)
    assert res["intercept"] == pytest.approx(loc["intercept"], abs=1e-6)


def test_tron_matches_local_solver_gaussian(uni):
    res = solve_tron(
        uni, dim=1, family="gaussian", weight_col=None, offset_col=None,
        reg_param=10.0, tol=1e-10,
    )
    X, y = _np_data(uni)
    loc = fit_local_glm(X, y, family="gaussian", l2=10.0, tol=1e-12)
    assert res["converged"]
    assert np.allclose(res["coefficients"], loc["coefficients"], atol=1e-7)
    assert res["intercept"] == pytest.approx(loc["intercept"], abs=1e-7)


def test_tron_matches_local_solver_binomial_with_prior(uni):
    """A2 Hessian·vector CG path: binomial + Gaussian prior, checked
    against the local Newton solver on the same data."""
    b = uni.withColumn("response", (F.col("response") > 30).cast("double"))
    prior_mean = np.array([0.02, -0.5])
    prior_prec = np.array([50.0, 10.0])
    res = solve_tron(
        b, dim=1, family="binomial", weight_col=None, offset_col=None,
        reg_param=1.0, prior_mean=prior_mean, prior_precision=prior_prec,
        tol=1e-9,
    )
    X, y = _np_data(b)
    loc = fit_local_glm(
        X, y, family="binomial", l2=1.0, prior_mean=prior_mean,
        prior_precision=prior_prec, tol=1e-12,
    )
    assert res["converged"]
    assert np.allclose(res["coefficients"], loc["coefficients"], atol=1e-6)
    assert res["intercept"] == pytest.approx(loc["intercept"], abs=1e-6)
    # quadratic convergence: far fewer outer rounds than first-order
    assert res["n_iter"] <= 15


def test_tron_via_fit_fixed_effect_and_validation(uni):
    model = glm.fit_fixed_effect(
        uni, dim=1, family="gaussian", weight_col=None, offset_col=None,
        reg_param=10.0, solver="tron",
    )
    res = solve_penalized(
        uni, dim=1, family="gaussian", weight_col=None, offset_col=None,
        reg_param=10.0, tol=1e-10,
    )
    assert model.meta["optimizer"] == "tron"
    assert np.allclose(model.coefficients, res["coefficients"], atol=1e-6)
    with pytest.raises(ValueError, match="smooth"):
        glm.fit_fixed_effect(
            uni, dim=1, family="gaussian", solver="tron",
            elastic_net_param=0.5, reg_param=1.0,
        )


def test_lasso_univariate_closed_form(uni):
    lam, alpha = 40000.0, 0.5
    l1, l2 = lam * alpha, lam * (1 - alpha)
    res = solve_penalized(
        uni, dim=1, family="gaussian", weight_col=None, offset_col=None,
        reg_param=lam, elastic_net_param=alpha, tol=1e-10, max_iter=200,
    )
    X, y = _np_data(uni)
    n, sx, sy, sxx, sxy = _suff(X, y)
    sxy_c, sxx_c = sxy - sx * sy / n, sxx - sx * sx / n
    beta = np.sign(sxy_c) * max(abs(sxy_c) - l1, 0.0) / (sxx_c + l2)
    b0 = (sy - beta * sx) / n
    assert res["coefficients"][0] == pytest.approx(beta, abs=1e-6)
    assert res["intercept"] == pytest.approx(b0, abs=1e-5)


def test_l1_kills_coefficients_not_intercept(uni):
    """OWLQN.scala:39: L1 applies to features only — with crushing L1
    the coefficient hits exactly 0 and the intercept is the mean."""
    res = solve_penalized(
        uni, dim=1, family="gaussian", weight_col=None, offset_col=None,
        reg_param=1e12, elastic_net_param=1.0, tol=1e-8,
    )
    X, y = _np_data(uni)
    assert res["coefficients"][0] == 0.0
    assert res["intercept"] == pytest.approx(y.mean(), rel=1e-6)


def test_fixed_effect_prior_closed_form(uni):
    """PriorDistribution.scala:23-120 on the fixed coordinate: posterior
    of a univariate gaussian fit with prior on (coef, intercept)."""
    pc, pi, muc, mui = 1000.0, 10.0, 1.0, 0.0
    res = solve_penalized(
        uni, dim=1, family="gaussian", weight_col=None, offset_col=None,
        prior_mean=np.array([muc, mui]), prior_precision=np.array([pc, pi]),
        tol=1e-10, max_iter=200,
    )
    X, y = _np_data(uni)
    n, sx, sy, sxx, sxy = _suff(X, y)
    A = np.array([[sxx + pc, sx], [sx, n + pi]])
    b = np.array([sxy + pc * muc, sy + pi * mui])
    beta, b0 = np.linalg.solve(A, b)
    assert res["coefficients"][0] == pytest.approx(beta, abs=1e-7)
    assert res["intercept"] == pytest.approx(b0, abs=1e-6)


def test_box_constrained_fixed_effect(uni):
    """LBFGSB.scala:39 capability: binding upper bound clips the
    coefficient; the free intercept re-solves given the clipped coef."""
    X, y = _np_data(uni)
    n, sx, sy, sxx, sxy = _suff(X, y)
    beta_unc = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    hi = 0.5 * beta_unc  # guaranteed to bind
    res = solve_penalized(
        uni, dim=1, family="gaussian", weight_col=None, offset_col=None,
        lower_bounds=np.array([-1e9]), upper_bounds=np.array([hi]),
        tol=1e-10, max_iter=200,
    )
    assert res["coefficients"][0] == pytest.approx(hi, abs=1e-9)
    assert res["intercept"] == pytest.approx((sy - hi * sx) / n, abs=1e-6)


def test_l1_and_box_mutually_exclusive(uni):
    with pytest.raises(ValueError, match="mutually exclusive"):
        solve_penalized(
            uni, dim=1, weight_col=None, offset_col=None,
            reg_param=1.0, elastic_net_param=0.5,
            lower_bounds=np.array([0.0]),
        )


def test_smoothed_hinge_distributed_matches_local(uni):
    b = uni.withColumn("response", (F.col("response") > 30).cast("double"))
    res = solve_penalized(
        b, dim=1, family="smoothed_hinge", weight_col=None, offset_col=None,
        reg_param=5.0, tol=1e-9, max_iter=200,
    )
    X, y = _np_data(b)
    loc = fit_local_glm(X, y, family="smoothed_hinge", l2=5.0, tol=1e-12)
    assert np.allclose(res["coefficients"], loc["coefficients"], atol=1e-5)
    assert res["intercept"] == pytest.approx(loc["intercept"], abs=1e-5)


def test_fit_fixed_effect_routes_and_validates(uni):
    with pytest.raises(ValueError, match="not supported"):
        glm.fit_fixed_effect(uni, dim=1, family="tweedie")
    m = glm.fit_fixed_effect(
        uni, dim=1, family="gaussian", weight_col=None, offset_col=None,
        reg_param=100.0, elastic_net_param=0.5,
    )
    assert m.meta["optimizer"] == "owlqn"
    assert m.meta["converged"]


def test_offset_plus_l1(uni):
    """The combination GLR can't express: offset-bearing elastic net.
    Against the local solver on the same data."""
    o = uni.withColumn("offset", (F.col("response") / 2).cast("double"))
    res = solve_penalized(
        o, dim=1, family="gaussian", weight_col=None, offset_col="offset",
        reg_param=1000.0, elastic_net_param=1.0, tol=1e-10, max_iter=200,
    )
    X, y = _np_data(o)
    off = y / 2
    # local solver has no L1 — closed form instead (centered, offset folded)
    r = y - off
    n, sx, sr = len(y), X[:, 0].sum(), r.sum()
    sxx, sxr = (X[:, 0] ** 2).sum(), (X[:, 0] * r).sum()
    sxr_c, sxx_c = sxr - sx * sr / n, sxx - sx * sx / n
    beta = np.sign(sxr_c) * max(abs(sxr_c) - 1000.0, 0.0) / sxx_c
    b0 = (sr - beta * sx) / n
    assert res["coefficients"][0] == pytest.approx(beta, abs=1e-6)
    assert res["intercept"] == pytest.approx(b0, abs=1e-5)


def test_x0_warm_start_accelerates_and_matches(uni):
    """M7 warm start through fit_fixed_effect(x0=...): starting from
    the converged model, the refit converges (almost) immediately to
    the same optimum; a FixedEffectGLM is accepted directly and a
    wrong-shaped vector is rejected."""
    cold = glm.fit_fixed_effect(
        uni, dim=1, family="gaussian", reg_param=1.0,
        weight_col=None, offset_col=None, solver="tron",
    )
    warm = glm.fit_fixed_effect(
        uni, dim=1, family="gaussian", reg_param=1.0,
        weight_col=None, offset_col=None, solver="tron", x0=cold,
    )
    assert warm.coefficients[0] == pytest.approx(cold.coefficients[0], rel=1e-6)
    assert warm.intercept == pytest.approx(cold.intercept, rel=1e-6)
    assert warm.meta["iterations"] <= cold.meta["iterations"]
    assert warm.meta["iterations"] <= 2  # already at the optimum

    import numpy as np

    vec = np.append(cold.coefficients, cold.intercept)
    warm2 = glm.fit_fixed_effect(
        uni, dim=1, family="gaussian", reg_param=1.0,
        weight_col=None, offset_col=None, solver="tron", x0=vec,
    )
    assert warm2.coefficients[0] == pytest.approx(cold.coefficients[0], rel=1e-6)

    with pytest.raises(ValueError, match="shape"):
        glm.fit_fixed_effect(
            uni, dim=1, family="gaussian", solver="tron",
            weight_col=None, offset_col=None, x0=np.zeros(5),
        )


def test_glr_lbfgs_routing_boundary(spark, monkeypatch):
    """The wide-fit auto-route (VERDICT r11 Next #8): fit_fixed_effect
    runs spark.ml GLR (IRLS) up to exactly GLR_MAX_FEATURES and the
    distributed LBFGS solver one feature past it — pinned at a
    monkeypatched boundary so the test stays cheap — and the two
    engines agree on the same well-conditioned problem."""
    import random

    rng = random.Random(7)
    rows = []
    for _ in range(400):
        x = [rng.uniform(-1, 1) for _ in range(3)]
        y = 1.0 * x[0] + 2.0 * x[1] - 1.0 * x[2] + 0.5
        rows.append(([0, 1, 2], x, y + rng.gauss(0, 0.01)))
    df = spark.createDataFrame(
        rows,
        "features_indices array<long>, features_values array<double>, "
        "response double",
    )
    monkeypatch.setattr(glm, "GLR_MAX_FEATURES", 3)
    at_boundary = glm.fit_fixed_effect(
        df, dim=3, family="gaussian", reg_param=0.0,
        weight_col=None, offset_col=None,
    )
    # GLR path: summary-derived meta, no "optimizer" tag
    assert at_boundary.meta.get("optimizer") is None
    assert "deviance" in at_boundary.meta

    monkeypatch.setattr(glm, "GLR_MAX_FEATURES", 2)
    past_boundary = glm.fit_fixed_effect(
        df, dim=3, family="gaussian", reg_param=0.0,
        weight_col=None, offset_col=None,
    )
    assert past_boundary.meta["optimizer"] == "lbfgs"
    assert np.allclose(
        at_boundary.coefficients, past_boundary.coefficients, atol=1e-4
    )
    assert past_boundary.intercept == pytest.approx(
        at_boundary.intercept, abs=1e-4
    )
