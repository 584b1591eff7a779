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


# ------------------------------------------- RBF kernel / confidence bound


def test_rbf_kernel_closed_form():
    from photon_ml_spark.ml.hypersearch import _rbf

    X = np.array([[0.0, 0.0], [1.0, 0.0]])
    Y = np.array([[0.0, 0.0], [0.0, 2.0]])
    K = _rbf(X, Y, np.array([1.0, 1.0]))
    # K(x,x') = exp(-r^2/2): r^2 = 0, 4, 1, 5
    expect = np.exp(-0.5 * np.array([[0.0, 4.0], [1.0, 5.0]]))
    assert np.allclose(K, expect)
    # anisotropic length scale divides per-dimension
    K2 = _rbf(X, Y, np.array([2.0, 1.0]))
    assert np.isclose(K2[1, 0], np.exp(-0.5 * 0.25))


def test_gp_search_rbf_and_confidence_bound_find_optimum():
    from photon_ml_spark.ml.hypersearch import gp_search

    def f(p):
        return (p["x"] - 0.3) ** 2

    for kernel, acq in [("rbf", "ei"), ("matern52", "cb"), ("rbf", "cb")]:
        res = gp_search(
            f, {"x": (0.0, 1.0, "linear")}, n_init=4, n_iter=10,
            kernel=kernel, acquisition=acq,
        )
        assert abs(res["best_params"]["x"] - 0.3) < 0.1, (kernel, acq)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown kernel"):
        gp_search(f, {"x": (0.0, 1.0, "linear")}, kernel="cubic")
    with _pytest.raises(ValueError, match="unknown acquisition"):
        gp_search(f, {"x": (0.0, 1.0, "linear")}, acquisition="ucb2")


def test_confidence_bound_is_mean_minus_kappa_sigma():
    """With ONE observed point and an exploration factor κ, the CB
    acquisition must equal -(μ - κσ) — checked against the closed-form
    GP posterior at a known candidate (ConfidenceBound.scala PBO eq. 3,
    lower bound minimized)."""
    from photon_ml_spark.ml.hypersearch import gp_search

    calls = []

    def f(p):
        calls.append(dict(p))
        return 1.0

    # n_init=1, n_iter=1: a single posterior round over the candidate
    # pool; with constant y the standardized target is 0, so μ=0
    # everywhere and CB picks the MAX-σ candidate (pure exploration),
    # i.e. the candidate farthest from the observed point.
    res = gp_search(
        f, {"x": (0.0, 1.0, "linear")}, n_init=1, n_iter=1,
        acquisition="cb", exploration_factor=2.0, n_candidates=256,
    )
    x_obs = calls[0]["x"]
    x_pick = calls[1]["x"]
    # farthest-from-observation in [0,1] is one of the ends
    assert abs(x_pick - x_obs) > 0.4
    assert len(res["history"]) == 2


# --------------------------------------------- prior JSON / range shrinking


_PRIOR = """
{"records": [
  {"alpha": "0.5", "beta": 1.0, "evaluationValue": "0.90"},
  {"alpha": "0.9", "beta": 4.0, "evaluationValue": 0.30},
  {"alpha": 0.1, "evaluationValue": 0.10}
]}
"""


def test_prior_from_json_defaults_and_order():
    from photon_ml_spark.ml.hypersearch import prior_from_json

    pairs = prior_from_json(_PRIOR, {"beta": 2.0}, ["beta", "alpha"])
    assert len(pairs) == 3
    # names order respected: beta first
    assert np.allclose(pairs[0][0], [1.0, 0.5]) and pairs[0][1] == 0.9
    # record 3 missing beta -> prior_default
    assert np.allclose(pairs[2][0], [2.0, 0.1]) and pairs[2][1] == 0.1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing parameter"):
        prior_from_json(_PRIOR, None, ["beta", "alpha"])
    with _pytest.raises(ValueError, match="records"):
        prior_from_json('{"nope": 1}', None, ["alpha"])
    with _pytest.raises(ValueError, match="evaluationValue"):
        prior_from_json('{"records": [{"alpha": 1}]}', None, ["alpha"])


def test_unit_forward_backward_roundtrip():
    from photon_ml_spark.ml.hypersearch import _unit_backward, _unit_forward

    bounds = [(1e-4, 1e2, "log"), (2.0, 10.0, "linear"), (1.0, 8.0, "discrete")]
    raw = np.array([1e-1, 6.0, 3.0])
    u = _unit_forward(raw, bounds)
    assert np.all((u >= 0) & (u <= 1))
    back = _unit_backward(u, bounds)
    assert np.allclose(back, raw)
    # discrete: 8 values over [1,8] -> value v sits at (v-1)/8
    assert np.isclose(u[2], 2.0 / 8.0)


def test_shrink_search_range_box_semantics():
    """The shrunk box is centered (in unit space) on the best prior
    observation's neighborhood, has width ≤ 2·radius per dimension,
    and never exceeds the original bounds (ShrinkSearchRange.scala:
    28-90 min/max clamp)."""
    from photon_ml_spark.ml.hypersearch import shrink_search_range

    bounds = {"alpha": (0.0, 1.0, "linear"), "beta": (1.0, 16.0, "log")}
    # best (maximize) prior is alpha=0.5, beta=1.0 (eval 0.9)
    prior = (
        '{"records": ['
        '{"alpha": 0.5, "beta": 1.0, "evaluationValue": 0.9},'
        '{"alpha": 0.95, "beta": 14.0, "evaluationValue": 0.1}]}'
    )
    shrunk = shrink_search_range(bounds, prior, radius=0.2, seed=3)
    assert set(shrunk) == {"alpha", "beta"}
    for nm in shrunk:
        lo0, hi0, kind0 = bounds[nm]
        lo, hi, kind = shrunk[nm]
        assert kind == kind0
        assert lo0 <= lo < hi <= hi0
    # the box hugs the good prior region, excluding the bad corner
    assert shrunk["alpha"][1] < 0.95
    assert shrunk["beta"][1] < 14.0
    # alpha width ≤ 2*radius in linear space
    assert shrunk["alpha"][1] - shrunk["alpha"][0] <= 0.4 + 1e-9
    # beta is log-scaled: width bounded in ln space
    assert (np.log(shrunk["beta"][1]) - np.log(shrunk["beta"][0])) <= (
        0.4 * (np.log(16.0) - np.log(1.0)) + 1e-9
    )


def test_shrink_search_range_discrete_floor_ceil():
    """Discrete bounds come back ON integers (discretizeCandidate:
    floor(u·n)/n before backward scaling)."""
    from photon_ml_spark.ml.hypersearch import shrink_search_range

    bounds = {"k": (1.0, 8.0, "discrete")}
    prior = (
        '{"records": ['
        '{"k": 4, "evaluationValue": 1.0},'
        '{"k": 8, "evaluationValue": 0.0}]}'
    )
    shrunk = shrink_search_range(bounds, prior, radius=0.25, seed=1)
    lo, hi, kind = shrunk["k"]
    assert kind == "discrete"
    assert lo == int(lo) and hi == int(hi)
    assert 1.0 <= lo <= hi <= 8.0
    # radius 0.25 over 8 cells = ±2 values around the best cell
    assert hi - lo <= 4.0


def test_make_tuner_gp_options_and_prior_shrink(tmp_path):
    import json

    from photon_ml_spark.ml.hypersearch import GPTuner, make_tuner

    prior = {
        "records": [
            {"x": 0.4, "evaluationValue": 1.0},
            {"x": 0.95, "evaluationValue": 0.0},
        ]
    }
    p = tmp_path / "prior.json"
    p.write_text(json.dumps(prior))
    t = make_tuner(
        {
            "kind": "gp",
            "bounds": {"x": [0.0, 1.0, "linear"]},
            "kernel": "rbf",
            "acquisition": "cb",
            "exploration_factor": 1.5,
            "prior": {"records_path": str(p), "radius": 0.2, "seed": 2},
        }
    )
    assert isinstance(t, GPTuner)
    assert t.kernel == "rbf" and t.acquisition == "cb"
    assert t.exploration_factor == 1.5
    lo, hi, kind = t.bounds["x"]
    assert 0.0 <= lo < hi <= 1.0 and (hi - lo) <= 0.4 + 1e-9
    assert hi < 0.95  # bad prior corner excluded
    # the shrunk tuner still finds the optimum inside the box
    res = t.search(lambda prm: (prm["x"] - 0.4) ** 2, n=6)
    assert abs(res["best_params"]["x"] - 0.4) < 0.15

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown prior keys"):
        make_tuner(
            {"kind": "gp", "bounds": {"x": [0, 1, "linear"]},
             "prior": {"records_json": "{}", "radios": 0.1}}
        )
    with _pytest.raises(ValueError, match="exactly one"):
        make_tuner(
            {"kind": "gp", "bounds": {"x": [0, 1, "linear"]},
             "prior": {"radius": 0.1}}
        )


def test_quasi_random_discrete_kind_snaps_to_integers():
    from photon_ml_spark.ml.hypersearch import quasi_random_search

    seen = []

    def f(p):
        seen.append(p["k"])
        return 0.0

    quasi_random_search(f, {"k": (1.0, 5.0, "discrete")}, n=40)
    assert all(v == int(v) and 1 <= v <= 5 for v in seen)
    assert len(set(seen)) == 5  # every cell reached


def test_config_from_json_reference_format():
    """configFromJson parity: the reference's config JSON (LOG min/max
    in log10 space, INT → discrete, SQRT → sqrt kind) translates to a
    make_tuner spec; the reference's shipped default config parses."""
    import json

    from photon_ml_spark.ml.hypersearch import (
        GAME_CONFIG_DEFAULT,
        GAME_PRIOR_DEFAULT,
        config_from_json,
        make_tuner,
    )

    spec = config_from_json(GAME_CONFIG_DEFAULT)
    assert spec["kind"] == "gp"
    assert set(spec["bounds"]) == set(GAME_PRIOR_DEFAULT)
    lo, hi, kind = spec["bounds"]["global_regularizer"]
    assert kind == "log"
    assert np.isclose(lo, 1e-3) and np.isclose(hi, 1e3)

    custom = {
        "tuning_mode": "RANDOM",
        "variables": {
            "lam": {"type": "FLOAT", "transform": "LOG", "min": -2, "max": 2},
            "depth": {"type": "INT", "min": 1, "max": 8},
            "frac": {"type": "FLOAT", "transform": "SQRT",
                     "min": 0.1, "max": 0.9},
            "plain": {"type": "FLOAT", "min": 0.0, "max": 5.0},
        },
    }
    spec2 = config_from_json(json.dumps(custom))
    assert spec2["kind"] == "sobol"
    assert spec2["bounds"]["depth"] == [1.0, 8.0, "discrete"]
    assert spec2["bounds"]["plain"] == [0.0, 5.0, "linear"]
    flo, fhi, fkind = spec2["bounds"]["frac"]
    assert fkind == "sqrt"
    assert np.isclose(flo, 0.01) and np.isclose(fhi, 0.81)

    # make_tuner accepts the reference format DIRECTLY
    t = make_tuner(custom)
    from photon_ml_spark.ml.hypersearch import QuasiRandomTuner

    assert isinstance(t, QuasiRandomTuner)
    assert t.bounds["depth"] == (1.0, 8.0, "discrete")

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown transform"):
        config_from_json(json.dumps({
            "tuning_mode": "RANDOM",
            "variables": {"x": {"type": "FLOAT", "transform": "EXP",
                                "min": 0, "max": 1}},
        }))
    with _pytest.raises(ValueError, match="no tuning"):
        config_from_json(json.dumps({
            "tuning_mode": "NONE",
            "variables": {"x": {"type": "FLOAT", "min": 0, "max": 1}},
        }))


def test_sqrt_kind_roundtrip_and_sampling():
    from photon_ml_spark.ml.hypersearch import (
        _scale,
        _unit_backward,
        _unit_forward,
        quasi_random_search,
    )

    bounds = [(0.01, 0.81, "sqrt")]
    u = _unit_forward(np.array([0.25]), bounds)
    # sqrt space: (0.5 - 0.1) / (0.9 - 0.1) = 0.5
    assert np.isclose(u[0], 0.5)
    assert np.isclose(_unit_backward(u, bounds)[0], 0.25)
    pts = _scale(np.linspace(0, 1, 11).reshape(-1, 1), bounds)
    assert pts.min() >= 0.01 - 1e-12 and pts.max() <= 0.81 + 1e-12
    # uniform in sqrt space: midpoint maps to 0.25, not 0.41
    assert np.isclose(pts[5, 0], 0.25)

    seen = []
    quasi_random_search(
        lambda p: seen.append(p["f"]) or 0.0,
        {"f": (0.01, 0.81, "sqrt")}, n=16,
    )
    assert all(0.01 - 1e-12 <= v <= 0.81 + 1e-12 for v in seen)


def test_int_with_transform_snaps_to_transformed_integer_grid():
    """The reference computes discreteParams for EVERY INT variable
    regardless of transform (HyperparameterSerialization.scala:122),
    so an INT+LOG variable samples only powers of ten and an INT+SQRT
    variable only squares of integers — never values between grid
    points."""
    import json

    from photon_ml_spark.ml.hypersearch import (
        _scale,
        _unit_backward,
        _unit_forward,
        config_from_json,
        quasi_random_search,
        shrink_search_range,
    )

    spec = config_from_json(json.dumps({
        "tuning_mode": "BAYESIAN",
        "variables": {
            "lam": {"type": "INT", "transform": "LOG", "min": -4, "max": 2},
            "d": {"type": "INT", "transform": "SQRT", "min": 1, "max": 4},
        },
    }))
    llo, lhi, lkind = spec["bounds"]["lam"]
    assert lkind == "log-discrete"
    assert np.isclose(llo, 1e-4) and np.isclose(lhi, 1e2)
    assert spec["bounds"]["d"] == [1.0, 16.0, "sqrt-discrete"]

    bl = [tuple(spec["bounds"]["lam"]), tuple(spec["bounds"]["d"])]
    rng = np.random.RandomState(7)
    pts = _scale(rng.rand(512, 2), bl)
    lam_grid = sorted(set(np.round(np.log10(pts[:, 0]), 9)))
    assert lam_grid == [-4.0, -3.0, -2.0, -1.0, 0.0, 1.0, 2.0]
    d_grid = sorted(set(np.round(np.sqrt(pts[:, 1]), 9)))
    assert d_grid == [1.0, 2.0, 3.0, 4.0]

    # round trip through the unit cube is exact on grid points
    for lam, d in [(1e-4, 1.0), (1e-1, 9.0), (1e2, 16.0)]:
        u = _unit_forward(np.array([lam, d]), bl)
        assert np.allclose(_unit_backward(u, bl), [lam, d])

    # a full search only ever evaluates grid values
    seen = []
    quasi_random_search(
        lambda p: seen.append((p["lam"], p["d"])) or 0.0,
        {"lam": tuple(spec["bounds"]["lam"]),
         "d": tuple(spec["bounds"]["d"])},
        n=32,
    )
    for lam, d in seen:
        assert np.isclose(np.log10(lam), round(np.log10(lam)))
        assert np.isclose(np.sqrt(d), round(np.sqrt(d)))

    # shrink_search_range discretizes the new box on the same grid
    prior = json.dumps({"records": [
        {"lam": 1e-2, "d": 4.0, "evaluationValue": 0.9},
        {"lam": 1e0, "d": 9.0, "evaluationValue": 0.4},
        {"lam": 1e1, "d": 16.0, "evaluationValue": 0.1},
    ]})
    shrunk = dict(shrink_search_range(
        {"lam": tuple(spec["bounds"]["lam"]),
         "d": tuple(spec["bounds"]["d"])},
        prior,
    ))
    (slo, shi, skind) = shrunk["lam"]
    assert skind == "log-discrete"
    assert 1e-4 - 1e-12 <= slo <= shi <= 1e2 + 1e-10
