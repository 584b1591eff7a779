"""Hyperparameter search (SURVEY §2.10 M11).

Rebuilds the reference's three search modes (driver hook
GameTrainingDriver.scala:677-726) as driver-side Python around repeated
fits — the loop itself is orchestration, every fit/evaluation is a
distributed DataFrame job:

- grid: explicit regularization-weight lists
  (photon-lib/.../hyperparameter/search — grid via config lists)
- quasi-random: low-discrepancy space-filling search. The reference
  draws Sobol points (RandomSearch.scala:34-47); we use the Halton
  radical-inverse sequence — same capability (deterministic
  low-discrepancy coverage), numpy-only.
- model-based: Gaussian-process search with Matérn 5/2 kernel and
  expected improvement (GaussianProcessSearch.scala:44+,
  GaussianProcessEstimator.scala), numpy-only (Cholesky + closed-form
  EI; kernel amplitude fit by marginal-likelihood grid instead of the
  reference's slice sampler — SliceSampler.scala — which is an
  implementation detail of the posterior, not a capability).

All searches share the contract: ``evaluate(params) -> float`` runs a
fit + validation round; ``maximize`` follows the primary evaluator's
direction (EvaluatorType.scala:59-65 betterThan).
"""

from __future__ import annotations

import math
from collections.abc import Callable, Sequence

import numpy as np

_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)


def grid_search(
    evaluate: Callable[[dict], float],
    grid: dict[str, Sequence],
    maximize: bool = False,
) -> dict:
    """Exhaustive cartesian grid. Returns {'best_params', 'best_value',
    'history': [(params, value), ...]}."""
    names = list(grid)
    history: list[tuple[dict, float]] = []

    def rec(i: int, acc: dict):
        if i == len(names):
            p = dict(acc)
            history.append((p, float(evaluate(p))))
            return
        for v in grid[names[i]]:
            acc[names[i]] = v
            rec(i + 1, acc)
        del acc[names[i]]

    rec(0, {})
    pick = max if maximize else min
    best = pick(history, key=lambda h: h[1])
    return {"best_params": best[0], "best_value": best[1], "history": history}


def halton(n: int, dim: int, skip: int = 20) -> np.ndarray:
    """First ``n`` points of the Halton low-discrepancy sequence in
    [0,1)^dim (radical inverse in coprime prime bases; ``skip`` drops
    the correlated head). Deterministic — reproducible search."""
    if dim > len(_PRIMES):
        raise ValueError(f"dim must be <= {len(_PRIMES)}")
    out = np.empty((n, dim))
    for j in range(dim):
        b = _PRIMES[j]
        for i in range(n):
            k, f, r = i + 1 + skip, 1.0, 0.0
            while k > 0:
                f /= b
                r += f * (k % b)
                k //= b
            out[i, j] = r
    return out


def _scale(unit: np.ndarray, bounds: list[tuple[float, float, str]]) -> np.ndarray:
    """Map unit-cube points into bounds; scale 'log' spans decades
    uniformly (regularization weights are log-scaled in practice)."""
    cols = []
    for j, (lo, hi, kind) in enumerate(bounds):
        u = unit[:, j]
        if kind == "log":
            cols.append(np.exp(np.log(lo) + u * (np.log(hi) - np.log(lo))))
        else:
            cols.append(lo + u * (hi - lo))
    return np.column_stack(cols)


def quasi_random_search(
    evaluate: Callable[[dict], float],
    bounds: dict[str, tuple[float, float, str]],
    n: int,
    maximize: bool = False,
) -> dict:
    """Low-discrepancy (Halton) search over ``bounds``:
    {name: (lo, hi, 'linear'|'log')}."""
    names = list(bounds)
    pts = _scale(halton(n, len(names)), [bounds[k] for k in names])
    history = []
    for row in pts:
        p = dict(zip(names, (float(v) for v in row)))
        history.append((p, float(evaluate(p))))
    pick = max if maximize else min
    best = pick(history, key=lambda h: h[1])
    return {"best_params": best[0], "best_value": best[1], "history": history}


def ridge_grid_eval_1d(
    df,
    x_col: str,
    y_col: str,
    fold_col: str,
    lambdas: Sequence[float],
):
    """Grid search expressed as ONE distributed plan (the M11 'grid'
    mode for closed-form members): train/validation moment sums in a
    single aggregation pass, then every λ's ridge fit + validation MSE
    by closed form over the λ grid (cross join with a tiny literal
    frame). No per-λ job — the grid costs one scan regardless of size.
    """
    from pyspark.sql import functions as F

    x, y = F.col(x_col), F.col(y_col)
    tr = F.col(fold_col) == 0

    def s(cond, expr):
        return F.sum(F.when(cond, expr).otherwise(F.lit(0.0)))

    m = df.agg(
        F.sum(F.when(tr, 1).otherwise(0)).cast("double").alias("tn"),
        s(tr, x).alias("tsx"), s(tr, y).alias("tsy"),
        s(tr, x * x).alias("tsxx"), s(tr, x * y).alias("tsxy"),
        F.sum(F.when(~tr, 1).otherwise(0)).cast("double").alias("vn"),
        s(~tr, x).alias("vsx"), s(~tr, y).alias("vsy"),
        s(~tr, x * x).alias("vsxx"), s(~tr, y * y).alias("vsyy"),
        s(~tr, x * y).alias("vsxy"),
    )
    lam_df = df.sparkSession.createDataFrame(
        [(float(l),) for l in lambdas], "lam double"
    )
    j = m.crossJoin(lam_df)
    det = (F.col("tsxx") + F.col("lam")) * F.col("tn") - F.col("tsx") * F.col("tsx")
    beta = (F.col("tn") * F.col("tsxy") - F.col("tsx") * F.col("tsy")) / det
    alpha = (
        (F.col("tsxx") + F.col("lam")) * F.col("tsy")
        - F.col("tsx") * F.col("tsxy")
    ) / det
    j = j.withColumn("beta", beta).withColumn("alpha", alpha)
    b, a = F.col("beta"), F.col("alpha")
    val_mse = (
        F.col("vsyy")
        - 2 * b * F.col("vsxy")
        - 2 * a * F.col("vsy")
        + b * b * F.col("vsxx")
        + 2 * a * b * F.col("vsx")
        + a * a * F.col("vn")
    ) / F.col("vn")
    return j.select("lam", "beta", "alpha", val_mse.alias("val_mse"))


# ------------------------------------------------------------------ GP search


def _matern52(X: np.ndarray, Y: np.ndarray, length: np.ndarray) -> np.ndarray:
    """Matérn 5/2 kernel (GaussianProcessEstimator's covariance)."""
    d = np.sqrt(
        np.maximum(
            ((X[:, None, :] - Y[None, :, :]) / length) ** 2, 0.0
        ).sum(-1)
    )
    s5d = math.sqrt(5.0) * d
    return (1.0 + s5d + 5.0 / 3.0 * d * d) * np.exp(-s5d)


def _norm_pdf(z):
    return np.exp(-0.5 * z * z) / math.sqrt(2 * math.pi)


def _norm_cdf(z):
    return 0.5 * (1.0 + np.vectorize(math.erf)(z / math.sqrt(2.0)))


def gp_search(
    evaluate: Callable[[dict], float],
    bounds: dict[str, tuple[float, float, str]],
    n_init: int = 5,
    n_iter: int = 15,
    n_candidates: int = 512,
    noise: float = 1e-6,
    maximize: bool = False,
) -> dict:
    """Bayesian search: GP (Matérn 5/2) posterior over observed points,
    expected-improvement acquisition argmax over a Halton candidate
    pool. Internally minimizes (negates when ``maximize``)."""
    names = list(bounds)
    bl = [bounds[k] for k in names]
    dim = len(names)
    sign = -1.0 if maximize else 1.0

    unit_obs = halton(n_init, dim)
    X = unit_obs.copy()
    hist_params = [dict(zip(names, map(float, r))) for r in _scale(unit_obs, bl)]
    y = np.array([sign * float(evaluate(p)) for p in hist_params])

    cand_unit = halton(n_candidates, dim, skip=997)
    for _ in range(n_iter):
        mu_y, sd_y = float(np.mean(y)), float(np.std(y)) or 1.0
        yn = (y - mu_y) / sd_y
        length = np.full(dim, 0.3)
        K = _matern52(X, X, length) + noise * np.eye(len(X))
        L = np.linalg.cholesky(K)
        alpha = np.linalg.solve(L.T, np.linalg.solve(L, yn))
        Ks = _matern52(cand_unit, X, length)
        mu = Ks @ alpha
        v = np.linalg.solve(L, Ks.T)
        var = np.clip(1.0 - (v * v).sum(0), 1e-12, None)
        sd = np.sqrt(var)
        best = yn.min()
        z = (best - mu) / sd
        ei = (best - mu) * _norm_cdf(z) + sd * _norm_pdf(z)
        pick = int(np.argmax(ei))
        x_new = cand_unit[pick : pick + 1]
        p_new = dict(zip(names, map(float, _scale(x_new, bl)[0])))
        y_new = sign * float(evaluate(p_new))
        X = np.vstack([X, x_new])
        y = np.append(y, y_new)
        hist_params.append(p_new)
        # drop the chosen candidate from the pool
        cand_unit = np.delete(cand_unit, pick, axis=0)

    history = [(p, sign * v) for p, v in zip(hist_params, y)]
    pickf = max if maximize else min
    bestp = pickf(history, key=lambda h: h[1])
    return {"best_params": bestp[0], "best_value": bestp[1], "history": history}
