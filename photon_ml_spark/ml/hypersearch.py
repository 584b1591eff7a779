"""Hyperparameter search (SURVEY §2.10 M11).

Rebuilds the reference's three search modes (driver hook
GameTrainingDriver.scala:677-726) as driver-side Python around repeated
fits — the loop itself is orchestration, every fit/evaluation is a
distributed DataFrame job:

- grid: explicit regularization-weight lists
  (photon-lib/.../hyperparameter/search — grid via config lists)
- quasi-random: low-discrepancy space-filling search. Sobol points
  (Gray-code construction over Joe–Kuo direction numbers — the
  reference's generator, RandomSearch.scala:34-47) by default; the
  Halton radical-inverse sequence as the alternative.
- model-based: Gaussian-process search with Matérn 5/2 kernel and
  expected improvement (GaussianProcessSearch.scala:44+,
  GaussianProcessEstimator.scala), numpy-only (Cholesky + closed-form
  EI). Kernel hyperparameters (length scale, amplitude) are either
  fixed or slice-sampled from the log marginal likelihood with EI
  averaged over the posterior draws — the reference's SliceSampler
  (SliceSampler.scala, Neal 2003 stepping-out + shrinkage).

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


# Joe–Kuo "new-joe-kuo-6" direction-number table head: one row per
# dimension ≥ 2 as (degree s, polynomial a, initial m values). The
# first dimension is the van der Corput sequence (all m = 1).
_SOBOL_JK = [
    (1, 0, [1]),
    (2, 1, [1, 3]),
    (3, 1, [1, 3, 1]),
    (3, 2, [1, 1, 1]),
    (4, 1, [1, 1, 3, 3]),
    (4, 4, [1, 3, 5, 13]),
    (5, 2, [1, 1, 5, 5, 17]),
    (5, 4, [1, 1, 5, 5, 5]),
    (5, 7, [1, 1, 7, 11, 19]),
]
_SOBOL_BITS = 32


def sobol(n: int, dim: int, skip: int = 0) -> np.ndarray:
    """First ``n`` points (after ``skip``) of the Sobol sequence in
    [0,1)^dim — Gray-code construction (Antonov–Saleev) over Joe–Kuo
    direction numbers, the same generator family the reference uses
    (RandomSearch.scala:34-47). Deterministic."""
    if dim > len(_SOBOL_JK) + 1:
        raise ValueError(f"dim must be <= {len(_SOBOL_JK) + 1}")
    # direction numbers V[j][k], scaled to the top bits of a 32-bit word
    V = np.zeros((dim, _SOBOL_BITS), dtype=np.uint64)
    for k in range(_SOBOL_BITS):
        V[0, k] = 1 << (_SOBOL_BITS - 1 - k)
    for j in range(1, dim):
        s, a, m = _SOBOL_JK[j - 1]
        v = [np.uint64(m[k] << (_SOBOL_BITS - 1 - k)) for k in range(s)]
        for k in range(s, _SOBOL_BITS):
            vk = v[k - s] ^ (v[k - s] >> np.uint64(s))
            for i in range(1, s):
                if (a >> (s - 1 - i)) & 1:
                    vk ^= v[k - i]
            v.append(vk)
        V[j] = v
    out = np.empty((n, dim))
    x = np.zeros(dim, dtype=np.uint64)
    scale = float(1 << _SOBOL_BITS)
    idx = 0
    for i in range(skip + n):
        if i > 0:
            # Gray-code flip bit: lowest zero bit of i-1
            c = 0
            g = i - 1
            while g & 1:
                g >>= 1
                c += 1
            x ^= V[:, c]
        if i >= skip:
            out[idx] = x / scale
            idx += 1
    return out


def _transformed_span(lo: float, hi: float, kind: str) -> tuple[float, float]:
    """(a, b) = the bounds in the variable's TRANSFORMED space — log10
    for the log kinds (VectorRescaling.LOG_TRANSFORM), square root for
    the sqrt kinds; identity otherwise."""
    if kind.startswith("log"):
        return math.log10(lo), math.log10(hi)
    if kind.startswith("sqrt"):
        return math.sqrt(lo), math.sqrt(hi)
    return lo, hi


def _discrete_n(lo: float, hi: float, kind: str) -> float:
    """Number of discrete cells for a discrete kind — the reference's
    ``(max - min).toInt + 1`` (HyperparameterSerialization.scala:122)
    computed on the CONFIG-space (= transformed-space) bounds, with an
    epsilon so an integer span that wobbled through a raw→transformed
    round trip still truncates to itself."""
    a, b = _transformed_span(lo, hi, kind)
    return float(int((b - a) + 1e-9) + 1)


def _scale(unit: np.ndarray, bounds: list[tuple[float, float, str]]) -> np.ndarray:
    """Map unit-cube points into bounds; scale 'log' spans decades
    uniformly (regularization weights are log-scaled in practice);
    'discrete' integer ranges give each of the hi-lo+1 values an
    equal-width unit cell (VectorRescaling's +1 adjustment) and snap
    to integers. 'log-discrete' / 'sqrt-discrete' (reference: an INT
    variable WITH a transform — discreteParams is computed for every
    INT regardless of transform) snap on the integer grid of the
    TRANSFORMED space: floor(u·n)/n in unit space, scaleBackward lands
    on a transformed integer, transformBackward maps it to the raw
    value (so log-discrete candidates are powers of ten)."""
    cols = []
    for j, (lo, hi, kind) in enumerate(bounds):
        u = unit[:, j]
        if kind == "log":
            cols.append(np.exp(np.log(lo) + u * (np.log(hi) - np.log(lo))))
        elif kind == "sqrt":
            r = np.sqrt(lo) + u * (np.sqrt(hi) - np.sqrt(lo))
            cols.append(r * r)
        elif kind == "discrete":
            cols.append(np.minimum(lo + np.floor(u * (hi - lo + 1.0)), hi))
        elif kind in ("log-discrete", "sqrt-discrete"):
            a, b = _transformed_span(lo, hi, kind)
            n = _discrete_n(lo, hi, kind)
            t = np.minimum(a + np.floor(u * n) / n * (b - a + 1.0), b)
            cols.append(10.0 ** t if kind == "log-discrete" else t * t)
        else:
            cols.append(lo + u * (hi - lo))
    return np.column_stack(cols)


def quasi_random_search(
    evaluate: Callable[[dict], float],
    bounds: dict[str, tuple[float, float, str]],
    n: int,
    maximize: bool = False,
    sequence: str = "sobol",
) -> dict:
    """Low-discrepancy search over ``bounds``:
    {name: (lo, hi, 'linear'|'log')}. ``sequence``: 'sobol' (the
    reference's generator; point 0 is skipped — it is the all-zeros
    corner) or 'halton'."""
    names = list(bounds)
    if sequence == "sobol":
        unit = sobol(n, len(names), skip=1)
    elif sequence == "halton":
        unit = halton(n, len(names))
    else:
        raise ValueError(f"unknown sequence {sequence!r}")
    pts = _scale(unit, [bounds[k] for k in names])
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


def _rbf(X: np.ndarray, Y: np.ndarray, length: np.ndarray) -> np.ndarray:
    """RBF (squared-exponential) kernel — K = exp(-r²/2) over
    length-scaled Euclidean distance r (reference kernels/RBF.scala:
    fromPairwiseDistances = exp(dists * -0.5) over squared pairwise
    distances)."""
    d2 = (((X[:, None, :] - Y[None, :, :]) / length) ** 2).sum(-1)
    return np.exp(-0.5 * d2)


_KERNELS = {"matern52": _matern52, "rbf": _rbf}


def _norm_pdf(z):
    return np.exp(-0.5 * z * z) / math.sqrt(2 * math.pi)


def _norm_cdf(z):
    return 0.5 * (1.0 + np.vectorize(math.erf)(z / math.sqrt(2.0)))


def slice_sample(
    log_density: Callable[[np.ndarray], float],
    x0: np.ndarray,
    n_samples: int,
    widths: np.ndarray,
    seed: int = 0,
    burn_in: int = 4,
    max_steps: int = 16,
) -> np.ndarray:
    """Coordinate-wise slice sampling (Neal 2003: stepping-out then
    shrinkage), the reference's kernel-posterior sampler
    (SliceSampler.scala). Deterministic via seeded generator. Returns
    (n_samples, dim) draws after ``burn_in`` discarded sweeps."""
    rng = np.random.default_rng(seed)
    x = np.asarray(x0, dtype=np.float64).copy()
    ll = float(log_density(x))
    out = []
    for it in range(burn_in + n_samples):
        for j in range(len(x)):
            log_y = ll + math.log(rng.uniform(1e-300, 1.0))
            w = widths[j]
            lo = x[j] - w * rng.uniform()
            hi = lo + w
            xc = x.copy()
            for _ in range(max_steps):
                xc[j] = lo
                if float(log_density(xc)) <= log_y:
                    break
                lo -= w
            for _ in range(max_steps):
                xc[j] = hi
                if float(log_density(xc)) <= log_y:
                    break
                hi += w
            while True:
                xj = rng.uniform(lo, hi)
                xc[j] = xj
                llc = float(log_density(xc))
                if llc > log_y:
                    x[j] = xj
                    ll = llc
                    break
                if xj < x[j]:
                    lo = xj
                else:
                    hi = xj
        if it >= burn_in:
            out.append(x.copy())
    return np.array(out)


def _gp_log_marginal(
    X: np.ndarray, yn: np.ndarray, length: float, amp: float, noise: float,
    kernel: str = "matern52",
) -> float:
    """log p(y | X, θ) for the GP (standardized targets)."""
    n = len(X)
    kfn = _KERNELS[kernel]
    K = amp * kfn(X, X, np.full(X.shape[1], length)) + noise * np.eye(n)
    try:
        L = np.linalg.cholesky(K)
    except np.linalg.LinAlgError:
        return -1e18
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, yn))
    return float(
        -0.5 * yn @ alpha
        - np.log(np.diag(L)).sum()
        - 0.5 * n * math.log(2 * math.pi)
    )


def gp_search(
    evaluate: Callable[[dict], float],
    bounds: dict[str, tuple[float, float, str]],
    n_init: int = 5,
    n_iter: int = 15,
    n_candidates: int = 512,
    noise: float = 1e-6,
    maximize: bool = False,
    kernel_sampling: str = "fixed",
    n_kernel_samples: int = 8,
    kernel: str = "matern52",
    acquisition: str = "ei",
    exploration_factor: float = 2.0,
) -> dict:
    """Bayesian search: GP posterior over observed points, acquisition
    argmax over a Halton candidate pool. Internally minimizes (negates
    when ``maximize``).

    ``kernel``: 'matern52' (the reference's default,
    estimators/kernels/Matern52.scala) or 'rbf' (kernels/RBF.scala).
    ``acquisition``: 'ei' (expected improvement,
    criteria/ExpectedImprovement.scala) or 'cb' (lower confidence bound
    μ - κ·σ minimized, criteria/ConfidenceBound.scala PBO eq. 3, κ =
    ``exploration_factor``).

    ``kernel_sampling='slice'`` marginalizes the kernel hyperparameters
    (log length scale, log amplitude) over their marginal-likelihood
    posterior via slice sampling and averages the acquisition across
    the draws — GaussianProcessSearch + SliceSampler parity; ``'fixed'``
    keeps the fast single-kernel path."""
    if kernel not in _KERNELS:
        raise ValueError(f"unknown kernel {kernel!r} (matern52|rbf)")
    if acquisition not in ("ei", "cb"):
        raise ValueError(f"unknown acquisition {acquisition!r} (ei|cb)")
    names = list(bounds)
    bl = [bounds[k] for k in names]
    dim = len(names)
    sign = -1.0 if maximize else 1.0
    kfn = _KERNELS[kernel]

    unit_obs = halton(n_init, dim)
    X = unit_obs.copy()
    hist_params = [dict(zip(names, map(float, r))) for r in _scale(unit_obs, bl)]
    y = np.array([sign * float(evaluate(p)) for p in hist_params])

    def _ei_for_kernel(yn, length_scalar, amp):
        """Acquisition scores over the candidate pool, higher = pick.
        EI is maximized directly; the confidence bound μ - κσ is a
        MINIMIZED transformation (ConfidenceBound.isMaxOpt = false), so
        its negation is returned."""
        length = np.full(dim, length_scalar)
        K = amp * kfn(X, X, length) + noise * np.eye(len(X))
        L = np.linalg.cholesky(K)
        alpha = np.linalg.solve(L.T, np.linalg.solve(L, yn))
        Ks = amp * kfn(cand_unit, X, length)
        mu = Ks @ alpha
        v = np.linalg.solve(L, Ks.T)
        var = np.clip(amp - (v * v).sum(0), 1e-12, None)
        sd = np.sqrt(var)
        if acquisition == "cb":
            return -(mu - exploration_factor * sd)
        best = yn.min()
        z = (best - mu) / sd
        return (best - mu) * _norm_cdf(z) + sd * _norm_pdf(z)

    cand_unit = halton(n_candidates, dim, skip=997)
    for it in range(n_iter):
        mu_y, sd_y = float(np.mean(y)), float(np.std(y)) or 1.0
        yn = (y - mu_y) / sd_y
        if kernel_sampling == "slice":
            # θ = (log length, log amp) ~ p(θ | data) via slice sampling
            def lml(theta):
                ln_l, ln_a = theta
                if not (-3.5 <= ln_l <= 1.5 and -4.0 <= ln_a <= 3.0):
                    return -1e18  # log-uniform prior support
                return _gp_log_marginal(
                    X, yn, math.exp(ln_l), math.exp(ln_a), noise,
                    kernel=kernel,
                )

            draws = slice_sample(
                lml,
                np.array([math.log(0.3), 0.0]),
                n_kernel_samples,
                widths=np.array([1.0, 1.0]),
                seed=it,
            )
            ei = np.mean(
                [
                    _ei_for_kernel(yn, math.exp(t[0]), math.exp(t[1]))
                    for t in draws
                ],
                axis=0,
            )
        else:
            ei = _ei_for_kernel(yn, 0.3, 1.0)
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


def ridge_moments_1d(df, x_col: str, y_col: str, fold_col: str):
    """ONE aggregation pass over (x, y, fold): the train/validation
    moment sums that are sufficient statistics for every closed-form
    1-feature ridge fit + validation MSE. With integer-valued x/y the
    sums are exact, so everything derived from them is bit-stable
    across engines and evaluation orders."""
    from pyspark.sql import functions as F

    x, y = F.col(x_col), F.col(y_col)
    tr = F.col(fold_col) == 0

    def s(cond, expr):
        return F.sum(F.when(cond, expr).otherwise(F.lit(0.0)))

    return df.agg(
        F.sum(F.when(tr, 1).otherwise(0)).cast("double").alias("tn"),
        s(tr, x).alias("tsx"), s(tr, y).alias("tsy"),
        s(tr, x * x).alias("tsxx"), s(tr, x * y).alias("tsxy"),
        F.sum(F.when(~tr, 1).otherwise(0)).cast("double").alias("vn"),
        s(~tr, x).alias("vsx"), s(~tr, y).alias("vsy"),
        s(~tr, x * x).alias("vsxx"), s(~tr, y * y).alias("vsyy"),
        s(~tr, x * y).alias("vsxy"),
    ).first()


def ridge_closed_form(m, lam: float) -> tuple[float, float, float]:
    """(beta, alpha, val_mse) at λ from a moments row — the same
    operation ORDER as the in-plan/SQL formulas, so IEEE doubles match
    the distributed evaluation bit-for-bit."""
    det = (m.tsxx + lam) * m.tn - m.tsx * m.tsx
    beta = (m.tn * m.tsxy - m.tsx * m.tsy) / det
    alpha = ((m.tsxx + lam) * m.tsy - m.tsx * m.tsxy) / det
    val_mse = (
        m.vsyy
        - 2 * beta * m.vsxy
        - 2 * alpha * m.vsy
        + beta * beta * m.vsxx
        + 2 * alpha * beta * m.vsx
        + alpha * alpha * m.vn
    ) / m.vn
    return beta, alpha, val_mse


def gp_ridge_search_1d(
    df,
    x_col: str,
    y_col: str,
    fold_col: str,
    log10_bounds: tuple[float, float] = (-2.0, 4.0),
    n_init: int = 5,
    n_iter: int = 15,
    kernel_sampling: str = "slice",
    moments=None,
) -> dict:
    """GP-EI search over the 1-feature ridge λ surface — the model-based
    M11 mode wired to a REAL distributed objective: the train/validation
    moment sums are aggregated in ONE Spark pass (``ridge_moments_1d``,
    or pass a precomputed ``moments`` row to share the scan with other
    consumers), then every GP evaluation is driver-local arithmetic on
    them — 20+ evaluations cost at most one scan total, not one job
    each. Deterministic: Halton init/candidates, per-iteration-seeded
    slice sampler.

    Returns gp_search's result dict with λ (not log λ) in params."""
    m = moments if moments is not None else ridge_moments_1d(
        df, x_col, y_col, fold_col
    )
    res = gp_search(
        lambda p: ridge_closed_form(m, 10.0 ** p["log_lam"])[2],
        {"log_lam": (log10_bounds[0], log10_bounds[1], "linear")},
        n_init=n_init,
        n_iter=n_iter,
        kernel_sampling=kernel_sampling,
    )
    res["best_params"] = {"lam": 10.0 ** res["best_params"]["log_lam"]}
    return res


# ----------------------------------------- prior observations / range shrink


def prior_from_json(
    prior_json: str,
    prior_default: dict[str, object] | None,
    names: list[str],
) -> list[tuple[np.ndarray, float]]:
    """Parse prior tuning observations — HyperparameterSerialization.
    priorFromJson parity (photon-lib/.../HyperparameterSerialization.
    scala:42-73): ``{"records": [{<param>: <value>, ...,
    "evaluationValue": <v>}, ...]}`` → [(vector in ``names`` order,
    evaluation)]. A record missing a parameter falls back to
    ``prior_default``; missing from both raises (the reference's
    ``priorDefault(paramName)`` NoSuchElement). Values may be JSON
    numbers or numeric strings (the reference stores strings)."""
    import json

    data = json.loads(prior_json)
    if not isinstance(data, dict) or not isinstance(data.get("records"), list):
        raise ValueError(
            "prior JSON must be an object with a 'records' list"
        )
    prior_default = prior_default or {}
    out = []
    for i, rec in enumerate(data["records"]):
        if "evaluationValue" not in rec:
            raise ValueError(f"prior record {i} missing 'evaluationValue'")
        vec = []
        for nm in names:
            if nm in rec:
                v = rec[nm]
            elif nm in prior_default:
                v = prior_default[nm]
            else:
                raise ValueError(
                    f"prior record {i} missing parameter {nm!r} and no "
                    "prior_default entry for it"
                )
            vec.append(float(v))
        out.append((np.array(vec), float(rec["evaluationValue"])))
    return out


def _unit_forward(
    vec: np.ndarray, bounds: list[tuple[float, float, str]]
) -> np.ndarray:
    """Raw parameter vector → unit cube (VectorRescaling.transformForward
    + scaleForward). 'log' spans decades uniformly (ln-space, matching
    ``_scale``); 'discrete' integer ranges divide by (hi - lo + 1) so
    each of the hi-lo+1 values owns an equal-width unit cell."""
    out = np.empty(len(bounds))
    for j, (lo, hi, kind) in enumerate(bounds):
        x = vec[j]
        if kind == "log":
            out[j] = (math.log(x) - math.log(lo)) / (
                math.log(hi) - math.log(lo)
            )
        elif kind == "sqrt":
            out[j] = (math.sqrt(x) - math.sqrt(lo)) / (
                math.sqrt(hi) - math.sqrt(lo)
            )
        elif kind == "discrete":
            out[j] = (x - lo) / (hi - lo + 1.0)
        elif kind in ("log-discrete", "sqrt-discrete"):
            a, b = _transformed_span(lo, hi, kind)
            t = math.log10(x) if kind == "log-discrete" else math.sqrt(x)
            out[j] = (t - a) / (b - a + 1.0)
        else:
            out[j] = (x - lo) / (hi - lo)
    return out


def _unit_backward(
    u: np.ndarray, bounds: list[tuple[float, float, str]]
) -> np.ndarray:
    """Unit cube → raw parameters (VectorRescaling.scaleBackward +
    transformBackward); inverse of ``_unit_forward``."""
    out = np.empty(len(bounds))
    for j, (lo, hi, kind) in enumerate(bounds):
        x = u[j]
        if kind == "log":
            out[j] = math.exp(math.log(lo) + x * (math.log(hi) - math.log(lo)))
        elif kind == "sqrt":
            r = math.sqrt(lo) + x * (math.sqrt(hi) - math.sqrt(lo))
            out[j] = r * r
        elif kind == "discrete":
            out[j] = x * (hi - lo + 1.0) + lo
        elif kind in ("log-discrete", "sqrt-discrete"):
            a, b = _transformed_span(lo, hi, kind)
            t = x * (b - a + 1.0) + a
            out[j] = 10.0 ** t if kind == "log-discrete" else t * t
        else:
            out[j] = x * (hi - lo) + lo
    return out


def shrink_search_range(
    bounds: dict[str, tuple[float, float, str]],
    prior_json: str,
    prior_default: dict[str, object] | None = None,
    radius: float = 0.25,
    candidate_pool_size: int = 1000,
    seed: int = 0,
    maximize: bool = True,
    noise: float = 1e-6,
) -> dict[str, tuple[float, float, str]]:
    """Shrink the tuning search box around the best prior observation —
    ShrinkSearchRange.getBounds parity (photon-client/.../
    ShrinkSearchRange.scala:28-90), the production retraining loop's
    warm-started tuner: fit a Matérn-5/2 GP to the prior (unit-rescaled)
    observations, predict over a Sobol candidate pool, take the
    best-predicted candidate, and return the ``±radius`` box around it
    (radius in unit space) mapped back to raw parameter ranges and
    clipped to the original bounds.

    Discrete parameters (kind ``'discrete'``: integer lo..hi) are
    snapped per the reference's discretizeCandidate — ``floor(u·n)/n``
    with n = hi-lo+1 values — BEFORE backward scaling, so the returned
    discrete bounds land on integers. ``maximize`` follows the
    reference (selectBestCandidate takes the LARGEST predicted mean);
    pass False when the evaluation metric is a loss."""
    names = list(bounds)
    bl = [bounds[k] for k in names]
    dim = len(names)
    priors = prior_from_json(prior_json, prior_default, names)
    X = np.array([_unit_forward(v, bl) for v, _ in priors])
    y = np.array([ev for _, ev in priors])

    # GP posterior mean over a Sobol candidate pool (fixed kernel —
    # same defaults as gp_search's fast path)
    mu_y, sd_y = float(np.mean(y)), float(np.std(y)) or 1.0
    yn = (y - mu_y) / sd_y
    length = np.full(dim, 0.3)
    K = _matern52(X, X, length) + noise * np.eye(len(X))
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, yn))
    cand = sobol(candidate_pool_size, dim, skip=1 + (int(seed) % 4096))
    mu = _matern52(cand, X, length) @ alpha
    best = cand[int(np.argmax(mu if maximize else -mu))]

    def _discretize(u: np.ndarray) -> np.ndarray:
        out = u.copy()
        for j, (lo, hi, kind) in enumerate(bl):
            if kind == "discrete" or kind.endswith("-discrete"):
                n_vals = _discrete_n(lo, hi, kind)
                out[j] = math.floor(u[j] * n_vals) / n_vals
        return out

    upper = _unit_backward(_discretize(best + radius), bl)
    lower = _unit_backward(_discretize(best - radius), bl)
    shrunk = {}
    for j, nm in enumerate(names):
        lo, hi, kind = bl[j]
        shrunk[nm] = (
            float(max(lower[j], lo)), float(min(upper[j], hi)), kind,
        )
    return shrunk


# ------------------------------------------------------- pluggable tuner seam


class HyperparameterTuner:
    """Pluggable-tuner indirection — reference photon-api
    hyperparameter/tuner/HyperparameterTuner.scala:26-47 (one-method
    trait), HyperparameterTunerFactory.scala (name → tuner dispatch),
    DummyTuner.scala (the no-op default). The training driver talks to
    THIS interface only; grid, quasi-random, and GP-EI searchers plug
    in behind it, and a user can inject a custom tuner into
    ``cli.train`` (the ``tuner`` argument) to drive model selection.

    Contract: ``search(evaluate, n, maximize)`` explores the tuner's
    space, calling ``evaluate(params: dict) -> float`` (one distributed
    fit + validation per call), and returns ``{'best_params',
    'best_value', 'history': [(params, value), ...]}`` — the shared
    result shape of every concrete searcher above."""

    def search(
        self, evaluate: Callable[[dict], float], n: int,
        maximize: bool = False,
    ) -> dict:
        raise NotImplementedError


class GridTuner(HyperparameterTuner):
    """Exhaustive grid behind the tuner seam (``n`` is ignored — the
    grid defines the budget)."""

    def __init__(self, grid: dict[str, Sequence]):
        self.grid = grid

    def search(self, evaluate, n: int = 0, maximize: bool = False) -> dict:
        return grid_search(evaluate, self.grid, maximize=maximize)


class QuasiRandomTuner(HyperparameterTuner):
    """Sobol/Halton low-discrepancy search behind the tuner seam
    (RandomSearch.scala parity)."""

    def __init__(
        self, bounds: dict[str, tuple[float, float, str]],
        sequence: str = "sobol",
    ):
        self.bounds = bounds
        self.sequence = sequence

    def search(self, evaluate, n: int, maximize: bool = False) -> dict:
        return quasi_random_search(
            evaluate, self.bounds, n, maximize=maximize,
            sequence=self.sequence,
        )


class GPTuner(HyperparameterTuner):
    """GP Bayesian search behind the tuner seam
    (GaussianProcessSearch.scala parity); ``n`` is the acquisition-
    iteration budget on top of ``n_init`` space-filling seeds.
    ``kernel``: matern52|rbf; ``acquisition``: ei|cb (confidence bound,
    κ = ``exploration_factor``)."""

    def __init__(
        self, bounds: dict[str, tuple[float, float, str]],
        n_init: int = 5, kernel_sampling: str = "fixed",
        kernel: str = "matern52", acquisition: str = "ei",
        exploration_factor: float = 2.0,
    ):
        self.bounds = bounds
        self.n_init = n_init
        self.kernel_sampling = kernel_sampling
        self.kernel = kernel
        self.acquisition = acquisition
        self.exploration_factor = exploration_factor

    def search(self, evaluate, n: int, maximize: bool = False) -> dict:
        return gp_search(
            evaluate, self.bounds, n_init=self.n_init, n_iter=n,
            maximize=maximize, kernel_sampling=self.kernel_sampling,
            kernel=self.kernel, acquisition=self.acquisition,
            exploration_factor=self.exploration_factor,
        )


_PRIOR_KEYS = {"records_json", "records_path", "default", "radius",
               "candidate_pool_size", "seed", "maximize"}


def _apply_prior_shrink(bounds: dict, prior: dict) -> dict:
    """Resolve a tuner spec's ``prior`` block into shrunk bounds —
    the ShrinkSearchRange warm-start. ``records_json`` (inline string)
    or ``records_path`` (file) carries the prior-observation JSON;
    ``default``/``radius``/``candidate_pool_size``/``seed``/``maximize``
    pass through to ``shrink_search_range``. Unknown keys raise (same
    fail-fast contract as the CLI config validators)."""
    unknown = set(prior) - _PRIOR_KEYS
    if unknown:
        raise ValueError(
            f"unknown prior keys {sorted(unknown)} (allowed: "
            f"{sorted(_PRIOR_KEYS)})"
        )
    if ("records_json" in prior) == ("records_path" in prior):
        raise ValueError(
            "prior needs exactly one of records_json | records_path"
        )
    if "records_path" in prior:
        with open(prior["records_path"], encoding="utf-8") as fh:
            prior_json = fh.read()
    else:
        prior_json = prior["records_json"]
    return shrink_search_range(
        bounds,
        prior_json,
        prior_default=prior.get("default"),
        radius=float(prior.get("radius", 0.25)),
        candidate_pool_size=int(prior.get("candidate_pool_size", 1000)),
        seed=int(prior.get("seed", 0)),
        maximize=bool(prior.get("maximize", True)),
    )


#: GameHyperparameterDefaults parity (photon-client/.../hyperparameter/
#: GameHyperparameterDefaults.scala): the reference's default prior
#: fallbacks and tuning config for GAME training. The config's LOG
#: variables carry min/max in log10 space (-3..3 == raw 1e-3..1e3).
GAME_PRIOR_DEFAULT = {
    "global_regularizer": "0.0",
    "member_regularizer": "0.0",
    "item_regularizer": "0.0",
}

GAME_CONFIG_DEFAULT = """
{ "tuning_mode" : "BAYESIAN",
  "variables" : {
    "global_regularizer" : {
      "type" : "FLOAT", "transform" : "LOG", "min" : -3, "max" : 3
    },
    "member_regularizer" : {
      "type" : "FLOAT", "transform" : "LOG", "min" : -3, "max" : 3
    },
    "item_regularizer" : {
      "type" : "FLOAT", "transform" : "LOG", "min" : -3, "max" : 3
    }
  }
}
"""


def config_from_json(json_config: str) -> dict:
    """Translate the reference's hyperparameter tuning config JSON —
    HyperparameterSerialization.configFromJson parity (photon-lib/.../
    HyperparameterSerialization.scala:82-135) — into a ``make_tuner``
    spec, so a reference user's existing config file drives this
    engine's tuner unchanged.

    Reference semantics preserved exactly:

    - ``tuning_mode``: BAYESIAN → gp spec, RANDOM → sobol spec, any
      other value is NONE → raises (no tuning requested; callers
      should omit the tuner instead)
    - a variable's ``min``/``max`` are in TRANSFORMED space when a
      ``transform`` is present (VectorRescaling.transformForward:
      LOG = log10, SQRT = square root) — translated here to RAW-space
      bounds with the matching sampling kind ('log' / 'sqrt'), which
      sample uniformly in the transformed space;
    - ``type: INT`` → the 'discrete' kind: max-min+1 integer values,
      each owning an equal-width unit cell (the reference's +1 range
      adjustment), snapped to integers; an INT variable WITH a
      transform becomes 'log-discrete' / 'sqrt-discrete' — the
      reference builds discreteParams for every INT regardless of
      transform, so candidates snap to the integer grid of the
      transformed space (e.g. powers of ten for INT+LOG);
    - an unknown ``transform`` raises, matching the reference.
    """
    import json

    cfg = json.loads(json_config)
    if not isinstance(cfg, dict):
        raise ValueError("hyperparameter config JSON must be an object")
    mode = str(cfg.get("tuning_mode", "")).upper()
    variables = cfg.get("variables")
    if not isinstance(variables, dict) or not variables:
        raise ValueError("hyperparameter config needs a 'variables' map")
    bounds = {}
    for name, var in variables.items():
        if not isinstance(var, dict):
            raise ValueError(f"variable {name!r} must be a map")
        vtype = str(var.get("type", "FLOAT")).upper()
        lo, hi = float(var["min"]), float(var["max"])
        transform = var.get("transform")
        if transform is not None:
            t = str(transform).upper()
            if t == "LOG":
                lo, hi, kind = 10.0 ** lo, 10.0 ** hi, "log"
            elif t == "SQRT":
                lo, hi, kind = lo * lo, hi * hi, "sqrt"
            else:
                raise ValueError(f"unknown transform {transform!r} (LOG|SQRT)")
            if vtype == "INT":
                # the reference computes discreteParams for EVERY INT
                # variable regardless of transform
                # (HyperparameterSerialization.scala:122) — candidates
                # snap to the integer grid of the TRANSFORMED space
                kind += "-discrete"
        elif vtype == "INT":
            kind = "discrete"
        else:
            kind = "linear"
        bounds[name] = [lo, hi, kind]
    if mode == "BAYESIAN":
        return {"kind": "gp", "bounds": bounds}
    if mode == "RANDOM":
        return {"kind": "sobol", "bounds": bounds}
    raise ValueError(
        f"tuning_mode {cfg.get('tuning_mode')!r} requests no tuning "
        "(NONE) - omit the tuner config instead"
    )


def make_tuner(spec: dict) -> HyperparameterTuner:
    """HyperparameterTunerFactory parity: build a tuner from a JSON-able
    spec — ``{"kind": "grid", "grid": {...}}``, ``{"kind": "sobol"|
    "halton", "bounds": {name: [lo, hi, "linear"|"log"|"discrete"]}}``,
    or ``{"kind": "gp", "bounds": ..., "n_init": 5, "kernel_sampling":
    "fixed"|"slice", "kernel": "matern52"|"rbf", "acquisition":
    "ei"|"cb", "exploration_factor": 2.0}``. Bounds-based specs accept
    an optional ``"prior"`` block (see ``_apply_prior_shrink``) that
    warm-starts the search by shrinking the box around the best prior
    observation — the reference's production retraining flow
    (ShrinkSearchRange + priorFromJson). A spec carrying
    ``tuning_mode`` is treated as the reference's OWN config-JSON shape
    and translated via ``config_from_json`` first (an optional
    ``prior`` block carries over), so an existing reference config file
    can be dropped into ``cfg["tuner"]`` unchanged. Unknown kinds raise
    (the factory's TUNER_NAME match)."""
    if "tuning_mode" in spec:
        # the reference's own config JSON shape (configFromJson) —
        # translate, carrying over an optional prior block
        import json as _json

        translated = config_from_json(_json.dumps(spec))
        if spec.get("prior"):
            translated["prior"] = spec["prior"]
        spec = translated
    kind = spec.get("kind", "grid").lower()
    allowed = {
        "grid": {"kind", "grid"},
        "sobol": {"kind", "bounds", "prior"},
        "halton": {"kind", "bounds", "prior"},
        "random": {"kind", "bounds", "prior"},
        "gp": {"kind", "bounds", "prior", "n_init", "kernel_sampling",
               "kernel", "acquisition", "exploration_factor"},
    }
    if kind in allowed:
        unknown = set(spec) - allowed[kind]
        if unknown:
            raise ValueError(
                f"unknown tuner spec keys {sorted(unknown)} for kind "
                f"{kind!r} (allowed: {sorted(allowed[kind])})"
            )
    if kind == "grid":
        return GridTuner(spec["grid"])
    if kind in ("sobol", "halton", "random", "gp"):
        bounds = {k: tuple(v) for k, v in spec["bounds"].items()}
        if spec.get("prior"):
            bounds = _apply_prior_shrink(bounds, spec["prior"])
        if kind == "gp":
            return GPTuner(
                bounds,
                n_init=int(spec.get("n_init", 5)),
                kernel_sampling=spec.get("kernel_sampling", "fixed"),
                kernel=spec.get("kernel", "matern52"),
                acquisition=spec.get("acquisition", "ei"),
                exploration_factor=float(
                    spec.get("exploration_factor", 2.0)
                ),
            )
        return QuasiRandomTuner(
            bounds, sequence="halton" if kind == "halton" else "sobol"
        )
    raise ValueError(f"unknown tuner kind {kind!r} (grid|sobol|halton|gp)")
