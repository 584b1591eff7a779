"""M11 hyperparameter search + M13 smoothed-hinge solver (unit-level,
no Spark needed — driver-side loops around a cheap evaluate)."""

import numpy as np

from photon_ml_spark.ml.hypersearch import (
    gp_search,
    grid_search,
    halton,
    quasi_random_search,
    slice_sample,
    sobol,
)
from photon_ml_spark.ml.local_glm import fit_local_glm


def _quadratic(p):
    # minimum at (reg=0.3, alpha=0.7)
    return (p["reg"] - 0.3) ** 2 + (p["alpha"] - 0.7) ** 2


def test_grid_search_exhaustive_and_best():
    out = grid_search(
        _quadratic,
        {"reg": [0.0, 0.25, 0.5, 1.0], "alpha": [0.0, 0.5, 0.75, 1.0]},
    )
    assert len(out["history"]) == 16
    assert out["best_params"] == {"reg": 0.25, "alpha": 0.75}


def test_halton_low_discrepancy_and_deterministic():
    a = halton(256, 2)
    b = halton(256, 2)
    assert np.array_equal(a, b)
    assert a.min() >= 0.0 and a.max() < 1.0
    # space-filling: every quadrant hit
    qx, qy = (a[:, 0] < 0.5), (a[:, 1] < 0.5)
    counts = [
        np.sum(qx & qy), np.sum(qx & ~qy), np.sum(~qx & qy), np.sum(~qx & ~qy)
    ]
    assert min(counts) > 40  # ~64 each if uniform


def test_sobol_known_prefix_and_stratification():
    # canonical dim-2 Sobol head (after the zero point)
    pts = sobol(7, 2)
    expected = [
        (0.0, 0.0), (0.5, 0.5), (0.75, 0.25), (0.25, 0.75),
        (0.375, 0.375), (0.875, 0.875), (0.625, 0.125),
    ]
    assert np.allclose(pts, expected)
    # power-of-two prefixes are perfectly stratified: 64 points put
    # exactly 16 in each quadrant (a property Halton lacks)
    a = sobol(64, 2, skip=1)
    qx, qy = (a[:, 0] < 0.5), (a[:, 1] < 0.5)
    counts = sorted(
        [int(np.sum(qx & qy)), int(np.sum(qx & ~qy)),
         int(np.sum(~qx & qy)), int(np.sum(~qx & ~qy))]
    )
    assert counts == [16, 16, 16, 16]
    # determinism + range + higher dims
    assert np.array_equal(sobol(100, 6, skip=3), sobol(100, 6, skip=3))
    b = sobol(256, 6)
    assert b.min() >= 0.0 and b.max() < 1.0
    assert abs(b.mean() - 0.5) < 0.02


def test_slice_sample_recovers_gaussian():
    draws = slice_sample(
        lambda x: -0.5 * float(((x[0] - 2.0) / 1.5) ** 2),
        np.array([0.0]),
        n_samples=400,
        widths=np.array([2.0]),
        seed=11,
        burn_in=20,
    )
    assert abs(draws.mean() - 2.0) < 0.2
    assert abs(draws.std() - 1.5) < 0.3


def test_gp_search_slice_sampled_kernels():
    out = gp_search(
        _quadratic,
        {"reg": (0.0, 1.0, "linear"), "alpha": (0.0, 1.0, "linear")},
        n_init=6, n_iter=8, kernel_sampling="slice", n_kernel_samples=4,
    )
    assert out["best_value"] < 0.02


def test_quasi_random_search_log_scale_bounds():
    seen = []

    def ev(p):
        seen.append(p["lam"])
        return _quadratic({"reg": p["lam"], "alpha": 0.7})

    out = quasi_random_search(ev, {"lam": (1e-3, 1e2, "log")}, n=64)
    assert all(1e-3 <= v <= 1e2 for v in seen)
    # log coverage: values span several decades
    assert min(seen) < 1e-2 and max(seen) > 1e1
    assert abs(out["best_params"]["lam"] - 0.3) < 0.15


def test_gp_search_converges_near_optimum():
    out = gp_search(
        _quadratic,
        {"reg": (0.0, 1.0, "linear"), "alpha": (0.0, 1.0, "linear")},
        n_init=6, n_iter=12,
    )
    assert out["best_value"] < 0.02  # within ~0.14 of the optimum
    # GP must beat the same budget of pure quasi-random points' head
    qr = quasi_random_search(
        _quadratic,
        {"reg": (0.0, 1.0, "linear"), "alpha": (0.0, 1.0, "linear")},
        n=6,
    )
    assert out["best_value"] <= qr["best_value"]


def test_gp_search_maximize_direction():
    out = gp_search(
        lambda p: -_quadratic(p),
        {"reg": (0.0, 1.0, "linear"), "alpha": (0.0, 1.0, "linear")},
        n_init=6, n_iter=8, maximize=True,
    )
    assert out["best_value"] > -0.05


# ------------------------------------------------------------- smoothed hinge


def _separable_data(n=200, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)
    return X, y


def test_smoothed_hinge_separates():
    X, y = _separable_data()
    res = fit_local_glm(X, y, family="smoothed_hinge", l2=1e-3)
    margin = X @ res["coefficients"] + res["intercept"]
    acc = np.mean((margin > 0) == (y == 1))
    assert acc >= 0.97


def test_smoothed_hinge_gradient_matches_finite_difference():
    from photon_ml_spark.ml.local_glm import _loss_derivs, _neg_log_likelihood

    rng = np.random.default_rng(0)
    m = rng.normal(size=50)
    y = (rng.random(50) > 0.5).astype(float)
    w = np.ones(50)
    dl, _ = _loss_derivs(m, y, "smoothed_hinge")
    eps = 1e-6
    for i in [0, 7, 23, 49]:
        mp, mm = m.copy(), m.copy()
        mp[i] += eps
        mm[i] -= eps
        num = (
            _neg_log_likelihood(mp, y, w, "smoothed_hinge")
            - _neg_log_likelihood(mm, y, w, "smoothed_hinge")
        ) / (2 * eps)
        assert abs(num - dl[i]) < 1e-5


def test_smoothed_hinge_weights_shift_boundary():
    X, y = _separable_data()
    w_pos = np.where(y == 1, 10.0, 1.0)
    res_u = fit_local_glm(X, y, family="smoothed_hinge", l2=0.1)
    res_w = fit_local_glm(X, y, weight=w_pos, family="smoothed_hinge", l2=0.1)
    # up-weighting positives pushes the intercept up (more area classified +)
    assert res_w["intercept"] > res_u["intercept"]


def test_ridge_grid_inplan_matches_driver_closed_form(spark):
    """The two physical strategies for the M11 grid — the all-in-plan
    cross-join evaluation (`ridge_grid_eval_1d`, for when collecting
    moments is undesirable) and the collected-moments driver arithmetic
    (`ridge_moments_1d` + `ridge_closed_form`, what the m11 gate row
    uses) — must agree bit-for-bit on integer-valued data."""
    from photon_ml_spark.ml.hypersearch import (
        ridge_closed_form,
        ridge_grid_eval_1d,
        ridge_moments_1d,
    )

    df = spark.range(4000).selectExpr(
        "CAST(id % 37 AS DOUBLE) AS x",
        "CAST((id * 7) % 23 AS DOUBLE) AS y",
        "CAST(id % 2 AS INT) AS fold",
    )
    lams = [0.01, 1.0, 50.0, 1000.0]
    inplan = {
        r.lam: (r.beta, r.alpha, r.val_mse)
        for r in ridge_grid_eval_1d(df, "x", "y", "fold", lams).collect()
    }
    m = ridge_moments_1d(df, "x", "y", "fold")
    for lam in lams:
        assert inplan[lam] == ridge_closed_form(m, lam)


def test_gp_ridge_search_shares_moments_and_finds_grid_best(spark):
    from photon_ml_spark.ml.hypersearch import (
        gp_ridge_search_1d,
        ridge_closed_form,
        ridge_moments_1d,
    )

    df = spark.range(4000).selectExpr(
        "CAST(id % 37 AS DOUBLE) AS x",
        "CAST((id * 7) % 23 + CAST(id % 37 AS DOUBLE) AS DOUBLE) AS y",
        "CAST(id % 2 AS INT) AS fold",
    )
    m = ridge_moments_1d(df, "x", "y", "fold")
    res = gp_ridge_search_1d(
        df, "x", "y", "fold", moments=m, kernel_sampling="slice"
    )
    dense_best = min(
        ridge_closed_form(m, 10.0 ** e)[2]
        for e in [x / 2.0 for x in range(-4, 9)]
    )
    assert res["best_value"] <= dense_best * 1.001
    assert res["best_params"]["lam"] > 0
    # deterministic: a second run reproduces the same history exactly
    res2 = gp_ridge_search_1d(
        df, "x", "y", "fold", moments=m, kernel_sampling="slice"
    )
    assert res["history"] == res2["history"]
