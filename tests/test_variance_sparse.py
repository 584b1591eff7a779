"""Numeric checks for the sparse-pair Hessian/variance helpers
(ml/variance.py round-7 additions) against driver-side numpy
closed forms on a small dense-equivalent problem."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from photon_ml_spark.ml.variance import (
    simple_variance,
    sparse_full_hessian_variance,
    sparse_hessian_diagonal,
)

DIM = 4  # 3 feature slots + intercept slot at index 3


def _frame(spark, rng):
    rows = []
    for i in range(60):
        idx = sorted(rng.choice(3, size=rng.integers(1, 4), replace=False))
        vals = np.round(rng.normal(size=len(idx)), 3)
        rows.append(
            (
                i,
                [int(j) for j in idx],
                [float(v) for v in vals],
                round(float(rng.normal()), 3),
                round(float(rng.uniform(0.5, 2.0)), 3),
            )
        )
    return rows, spark.createDataFrame(
        rows,
        "uid long, features_indices array<long>, features_values "
        "array<double>, score double, weight double",
    )


def _dense(rows):
    X = np.zeros((len(rows), DIM))
    for r, (_, idx, vals, _, _) in enumerate(rows):
        for j, v in zip(idx, vals):
            X[r, j] = v
        X[r, DIM - 1] = 1.0  # intercept slot
    margins = np.array([r[3] for r in rows])
    w = np.array([r[4] for r in rows])
    return X, margins, w


@pytest.mark.parametrize("family", ["gaussian", "binomial", "poisson"])
def test_sparse_hessian_diag_matches_numpy(spark, family):
    rng = np.random.default_rng(7)
    rows, df = _frame(spark, rng)
    X, m, w = _dense(rows)
    if family == "binomial":
        mu = 1.0 / (1.0 + np.exp(-m))
        dmu = mu * (1 - mu)
    elif family == "poisson":
        dmu = np.exp(m)
    else:
        dmu = np.ones_like(m)
    wd = w * dmu
    expect = (wd[:, None] * X * X).sum(0)
    l2 = 0.75
    got_rows = sparse_hessian_diagonal(
        df, family=family, l2=l2, dim=DIM
    ).collect()
    got = {int(r.feature_index): float(r.hessian_diag) for r in got_rows}
    # every slot must be present — a dropped feature row would
    # otherwise skip its assertion silently
    assert set(got) == set(range(DIM))
    for j in range(DIM - 1):
        # feature slots carry the l2 term
        assert got[j] == pytest.approx(expect[j] + l2, rel=1e-9)
    # intercept slot: Σ w·μ′, NO l2 (solvers leave it unpenalized)
    assert got[DIM - 1] == pytest.approx(expect[DIM - 1], rel=1e-9)
    # SIMPLE variance = 1/H
    sv = {
        int(r.feature_index): float(r.variance)
        for r in simple_variance(
            sparse_hessian_diagonal(df, family=family, l2=l2, dim=DIM)
        ).collect()
    }
    assert sv[DIM - 1] == pytest.approx(1.0 / expect[DIM - 1], rel=1e-9)


def test_sparse_full_hessian_variance_matches_numpy(spark):
    rng = np.random.default_rng(11)
    rows, df = _frame(spark, rng)
    X, m, w = _dense(rows)
    mu = 1.0 / (1.0 + np.exp(-m))
    wd = w * mu * (1 - mu)
    H = X.T @ (X * wd[:, None])
    l2 = 0.5
    reg = l2 * np.eye(DIM)
    reg[DIM - 1, DIM - 1] = 0.0  # intercept unpenalized
    expect = np.diag(np.linalg.inv(H + reg))
    got = dict(
        sparse_full_hessian_variance(df, DIM, family="binomial", l2=l2)
    )
    for j in range(DIM):
        assert got[j] == pytest.approx(expect[j], rel=1e-6), j
    with pytest.raises(ValueError, match="max_dim"):
        sparse_full_hessian_variance(df, 5000, family="binomial")
