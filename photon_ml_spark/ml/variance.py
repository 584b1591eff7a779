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
