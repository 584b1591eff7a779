"""Coefficient-variance aggregates (SURVEY §2.4 A3, §2.10 M10).

Rebuilds the Hessian-diagonal aggregation
(photon-lib/.../function/glm/HessianDiagonalAggregator.scala, driven by
DistributedOptimizationProblem.scala:86-96) as a plain DataFrame
aggregation: for the logistic family,

    H_jj = SUM_i w_i * mu_i * (1 - mu_i) * x_ij^2        (+ l2)

and VarianceComputationType.SIMPLE is 1 / H_jj. The FULL variant
(diag of the Cholesky-inverse Hessian) needs the full d×d matrix —
aggregate SUM(w·dmu·x_j·x_k) pairs and invert driver-side with numpy
(small d), or per-entity inside the local solver
(ml/local_glm.py compute_variance='full').

``quantize_scale`` rounds each summand to an integer grid before
summation, making the aggregate order-independent (bit-identical
across engines) at the cost of ~1/scale absolute precision — the
oracle-comparability convention (see queries.py docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from photon_ml_spark.functions.links import sigmoid


def _dmu(margin: Column, family: str) -> Column:
    if family in ("binomial", "logistic"):
        mu = sigmoid(margin)
        return mu * (F.lit(1.0) - mu)
    if family == "poisson":
        return F.exp(margin)
    if family in ("gaussian", "linear"):
        return F.lit(1.0)
    raise ValueError(f"unknown family: {family}")


def hessian_diagonal(
    df: DataFrame,
    feature_cols: list[str],
    margin_col: str = "score",
    weight_col: str | None = None,
    family: str = "binomial",
    l2: float = 0.0,
    quantize_scale: float | None = None,
) -> DataFrame:
    """Per-feature Hessian diagonal → (feature, hessian_diag).

    One aggregation pass over the unpivoted features; stays entirely
    JVM-side (map-side partial aggregation, same shape the reference
    gets from treeAggregate).
    """
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    d = _dmu(F.col(margin_col), family)
    stacked = df.select(
        (w * d).alias("__wd"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        F.col(c).cast("double").alias("x"),
                    )
                    for c in feature_cols
                ]
            )
        ).alias("__f"),
    ).select("__f.feature", (F.col("__wd") * F.col("__f.x") * F.col("__f.x")).alias("__h"))
    if quantize_scale:
        summand = F.round(F.col("__h") * quantize_scale, 0)
        total = F.sum(summand) / quantize_scale
    else:
        total = F.sum(F.col("__h"))
    return stacked.groupBy("feature").agg(
        (total + F.lit(l2)).alias("hessian_diag")
    )


def simple_variance(hessian_diag_table: DataFrame) -> DataFrame:
    """VarianceComputationType.SIMPLE: var_j = 1 / H_jj
    (DistributedOptimizationProblem.scala:86-96)."""
    return hessian_diag_table.withColumn(
        "variance", F.lit(1.0) / F.col("hessian_diag")
    )


def sparse_hessian_diagonal(
    df: DataFrame,
    indices_col: str = "features_indices",
    values_col: str = "features_values",
    margin_col: str = "score",
    weight_col: str | None = "weight",
    family: str = "binomial",
    l2: float = 0.0,
    dim: int | None = None,
) -> DataFrame:
    """Hessian diagonal over the engine's sparse-pair layout →
    (feature_index, hessian_diag); the intercept slot (H = Σ w·μ′)
    lands at ``feature_index = dim - 1`` when ``dim`` is given (the
    dictionary's intercept convention) or -1 otherwise. Zeros
    contribute nothing to off-intercept entries, so the exploded
    nonzeros are exact. One aggregation pass, JVM-side.

    ``l2`` is added to FEATURE slots only — the solvers leave the
    intercept unpenalized (distributed_solver's trailing-zero l2
    vector), so the intercept's true curvature carries no l2 term and
    adding one would understate its variance."""
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    d = _dmu(F.col(margin_col), family)
    base = df.select((w * d).alias("__wd"), indices_col, values_col)
    pairs = base.select(
        "__wd",
        F.explode(F.arrays_zip(F.col(indices_col), F.col(values_col))).alias(
            "__p"
        ),
    ).select(
        F.col(f"__p.{indices_col}").alias("feature_index"),
        (
            F.col("__wd")
            * F.col(f"__p.{values_col}")
            * F.col(f"__p.{values_col}")
        ).alias("__h"),
    )
    feats = pairs.groupBy("feature_index").agg(
        (F.sum("__h") + F.lit(float(l2))).alias("hessian_diag")
    )
    icol = F.lit(int(dim - 1 if dim is not None else -1)).cast("long")
    intercept = base.agg(
        F.sum("__wd").alias("hessian_diag")
    ).select(icol.alias("feature_index"), "hessian_diag")
    return feats.unionByName(intercept)


def sparse_full_hessian_variance(
    df: DataFrame,
    dim: int,
    indices_col: str = "features_indices",
    values_col: str = "features_values",
    margin_col: str = "score",
    weight_col: str | None = "weight",
    family: str = "binomial",
    l2: float = 0.0,
    max_dim: int = 2000,
) -> "list[tuple[int, float]]":
    """VarianceComputationType.FULL — diag of the INVERSE of the full
    Hessian (DistributedOptimizationProblem.scala: the expensive exact
    path; SIMPLE is 1/H_jj). The intercept occupies slot ``dim - 1``
    (the dictionary's intercept index) with implicit x = 1.

    H's entries are accumulated JVM-side from within-row pair products
    (two explodes over the sparse pairs — O(nnz² per row), cheap for
    the short vectors this path is meant for), collected as sparse
    (i, j, h) triples, inverted driver-side. Like the reference, FULL
    is only sensible at modest dims: dim > ``max_dim`` raises (use
    'simple').

    Returns [(feature_index, variance)] driver-side — O(dim), the same
    footprint as the model vector.
    """
    import numpy as np

    if dim > max_dim:
        raise ValueError(
            f"variance_computation=full inverts a {dim}x{dim} Hessian — "
            f"beyond max_dim={max_dim}; use 'simple' (1/H_jj) at this "
            "width, as the reference does"
        )
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    d = _dmu(F.col(margin_col), family)
    icol = F.lit(int(dim - 1)).cast("long")
    base = df.select(
        (w * d).alias("__wd"),
        F.arrays_zip(F.col(indices_col), F.col(values_col)).alias("__ps"),
    )
    a = base.select(
        "__wd", "__ps", F.explode("__ps").alias("__a")
    ).select(
        "__wd",
        "__ps",
        F.col(f"__a.{indices_col}").alias("i"),
        F.col(f"__a.{values_col}").cast("double").alias("xi"),
    )
    ff = a.select(
        "__wd", "i", "xi", F.explode("__ps").alias("__b")
    ).select(
        "i",
        F.col(f"__b.{indices_col}").alias("j"),
        (F.col("__wd") * F.col("xi") * F.col(f"__b.{values_col}")).alias(
            "__h"
        ),
    )
    fi = a.select(
        "i", icol.alias("j"), (F.col("__wd") * F.col("xi")).alias("__h")
    )
    if_ = fi.select(F.col("j").alias("i"), F.col("i").alias("j"), "__h")
    corner = base.agg(F.sum("__wd").alias("__h")).select(
        icol.alias("i"), icol.alias("j"), "__h"
    )
    entries = (
        ff.unionByName(fi).unionByName(if_).unionByName(corner)
        .groupBy("i", "j")
        .agg(F.sum("__h").alias("h"))
        .collect()
    )
    H = np.zeros((dim, dim))
    for r in entries:
        H[int(r.i), int(r.j)] += float(r.h)
    # l2 on FEATURE slots only — the solvers never penalize the
    # intercept (slot dim-1), so its curvature carries no l2 term
    reg = float(l2) * np.eye(dim)
    reg[dim - 1, dim - 1] = 0.0
    H += reg
    # pinv: an unobserved dictionary slot (zero row/col at l2=0) makes
    # H singular; the pseudo-inverse reports 0 variance there instead
    # of failing the whole job
    var = np.diag(np.linalg.pinv(H))
    return [(j, float(var[j])) for j in range(dim)]
