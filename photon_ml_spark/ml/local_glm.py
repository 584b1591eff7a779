"""Pure-numpy local GLM solver — the per-entity kernel for random
effects (SURVEY §2.10 M2) and the variance/prior math (M9/M10).

Rebuilds the single-node optimization path (photon-api/.../
SingleNodeOptimizationProblem.scala + SingleNodeGLMLossFunction.scala)
as damped Newton-Raphson (=IRLS for GLMs) with:

- offset + per-row weight (LabeledPoint margin semantics,
  LabeledPoint.scala:62)
- L2 regularization, not applied to the intercept (M4)
- optional Gaussian prior: penalty Σ (β−μ)²/(2σ²) — incremental
  training (M9, PriorDistribution.scala:23-120)
- warm start x0 (M7)
- coefficient variances: SIMPLE = 1/diag(H), FULL = diag(H⁻¹)
  (M10, VarianceComputationType.scala:20-25)

No scipy in the runtime; Newton with step-halving is robust for the
small, capped per-entity problems this kernel targets (the T2 cap
bounds rows; feature dims per entity are modest by design).
"""

from __future__ import annotations

import numpy as np

_FAMILIES = ("binomial", "gaussian", "poisson", "smoothed_hinge")


def _mean_and_dmu(margin: np.ndarray, family: str):
    """Returns (mu, dmu/dmargin) for the canonical link."""
    if family == "binomial":
        mu = 1.0 / (1.0 + np.exp(-np.clip(margin, -35, 35)))
        return mu, mu * (1.0 - mu)
    if family == "poisson":
        mu = np.exp(np.clip(margin, -35, 35))
        return mu, mu
    # gaussian / identity
    return margin, np.ones_like(margin)


def _loss_derivs(margin: np.ndarray, y: np.ndarray, family: str):
    """Per-row (dl/dmargin, d2l/dmargin2). GLM canonical links give
    (mu − y, dmu); the smoothed hinge (M13, photon-api/.../function/svm/
    SmoothedHingeLossFunction semantics, Rennie's quadratic smoothing)
    works on z = (2y−1)·m: z≥1 → 0; z≤0 → slope −1; else slope −(1−z),
    curvature 1 on the quadratic band only."""
    if family == "smoothed_hinge":
        s = 2.0 * y - 1.0
        z = s * margin
        dl = -s * np.clip(1.0 - z, 0.0, 1.0)
        d2l = ((z > 0.0) & (z < 1.0)).astype(np.float64)
        return dl, d2l
    mu, dmu = _mean_and_dmu(margin, family)
    return mu - y, dmu


def _neg_log_likelihood(margin, y, w, family):
    if family == "binomial":
        # log(1+e^m) - y*m, stable
        return float(np.sum(w * (np.maximum(margin, 0) + np.log1p(np.exp(-np.abs(margin))) - y * margin)))
    if family == "poisson":
        return float(np.sum(w * (np.exp(np.clip(margin, -35, 35)) - y * margin)))
    if family == "smoothed_hinge":
        z = (2.0 * y - 1.0) * margin
        loss = np.where(z >= 1.0, 0.0, np.where(z <= 0.0, 0.5 - z, 0.5 * (1.0 - z) ** 2))
        return float(np.sum(w * loss))
    return float(0.5 * np.sum(w * (margin - y) ** 2))


def fit_local_glm(
    X: np.ndarray,
    y: np.ndarray,
    weight: np.ndarray | None = None,
    offset: np.ndarray | None = None,
    family: str = "binomial",
    l2: float = 0.0,
    fit_intercept: bool = True,
    prior_mean: np.ndarray | None = None,
    prior_precision: np.ndarray | None = None,
    x0: np.ndarray | None = None,
    max_iter: int = 50,
    tol: float = 1e-8,
    compute_variance: str | None = None,  # None | 'simple' | 'full'
    lower_bounds: np.ndarray | None = None,
    upper_bounds: np.ndarray | None = None,
):
    """Damped-Newton GLM fit. Returns dict with keys:
    coefficients (len d), intercept, n_iter, converged, variances?.

    ``prior_mean``/``prior_precision`` cover the coefficient block
    (and intercept appended last when fit_intercept): the Gaussian
    prior adds prec*(β−μ) to the gradient and diag(prec) to the
    Hessian (PriorDistribution.scala:59-96 l2RegWeight analog).

    ``lower_bounds``/``upper_bounds`` (per coefficient, intercept
    unbounded) enable box-constrained fits — the reference's LBFGSB
    mode (photon-lib/.../optimization/LBFGSB.scala:39; legacy driver
    box constraints). Implemented as projected damped Newton: each
    candidate step is clipped into the box before the line-search
    accept test, converging when the projected gradient vanishes.
    """
    if family not in _FAMILIES:
        raise ValueError(f"family must be one of {_FAMILIES}")
    n, d = X.shape
    w = np.ones(n) if weight is None else np.asarray(weight, dtype=np.float64)
    o = np.zeros(n) if offset is None else np.asarray(offset, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)

    p = d + 1 if fit_intercept else d
    Z = np.hstack([X, np.ones((n, 1))]) if fit_intercept else X
    beta = np.zeros(p) if x0 is None else np.asarray(x0, dtype=np.float64).copy()

    if lower_bounds is not None or upper_bounds is not None:
        lo = np.full(p, -np.inf)
        hi = np.full(p, np.inf)
        if lower_bounds is not None:
            lo[:d] = np.asarray(lower_bounds, dtype=np.float64)
        if upper_bounds is not None:
            hi[:d] = np.asarray(upper_bounds, dtype=np.float64)
        box = (lo, hi)
        beta = np.clip(beta, lo, hi)
    else:
        box = None

    # L2 applies to feature coefficients only (never the intercept).
    l2_diag = np.full(p, l2)
    if fit_intercept:
        l2_diag[-1] = 0.0
    if prior_precision is not None:
        prior_prec = np.asarray(prior_precision, dtype=np.float64)
        prior_mu = (
            np.zeros(p) if prior_mean is None else np.asarray(prior_mean, dtype=np.float64)
        )
    else:
        prior_prec = None
        prior_mu = None

    def objective(b):
        margin = Z @ b + o
        val = _neg_log_likelihood(margin, y, w, family)
        val += 0.5 * float(np.sum(l2_diag * b * b))
        if prior_prec is not None:
            val += 0.5 * float(np.sum(prior_prec * (b - prior_mu) ** 2))
        return val

    obj = objective(beta)
    converged = False
    it = 0
    H = None
    for it in range(1, max_iter + 1):
        margin = Z @ beta + o
        dl, d2l = _loss_derivs(margin, y, family)
        grad = Z.T @ (w * dl) + l2_diag * beta
        if prior_prec is not None:
            grad += prior_prec * (beta - prior_mu)
        H = Z.T @ (Z * (w * d2l)[:, None])
        H[np.diag_indices_from(H)] += l2_diag
        if prior_prec is not None:
            H[np.diag_indices_from(H)] += prior_prec
        if box is not None:
            # projected-gradient optimality: stationary when moving along
            # -grad and re-projecting stays put
            pg = beta - np.clip(beta - grad, box[0], box[1])
            gnorm = float(np.max(np.abs(pg)))
        else:
            gnorm = float(np.max(np.abs(grad)))
        if gnorm < tol:
            converged = True
            break
        try:
            step = np.linalg.solve(H, grad)
        except np.linalg.LinAlgError:
            step = np.linalg.lstsq(H, grad, rcond=None)[0]
        # step-halving line search on the penalized objective
        t = 1.0
        for _ in range(25):
            cand = beta - t * step
            if box is not None:
                cand = np.clip(cand, box[0], box[1])
            cobj = objective(cand)
            if np.isfinite(cobj) and cobj <= obj + 1e-12:
                beta, obj = cand, cobj
                break
            t *= 0.5
        else:
            converged = True  # no descent possible: at numerical optimum
            break

    out = {
        "coefficients": beta[:d] if fit_intercept else beta,
        "intercept": float(beta[-1]) if fit_intercept else 0.0,
        "n_iter": it,
        "converged": converged,
    }
    if compute_variance and H is not None:
        if compute_variance == "simple":
            var = 1.0 / np.clip(np.diag(H), 1e-12, None)
        elif compute_variance == "full":
            try:
                var = np.diag(np.linalg.inv(H))
            except np.linalg.LinAlgError:
                var = 1.0 / np.clip(np.diag(H), 1e-12, None)
        else:
            raise ValueError("compute_variance must be None|'simple'|'full'")
        out["variances"] = var[:d] if fit_intercept else var
        out["intercept_variance"] = float(var[-1]) if fit_intercept else 0.0
    return out
