"""Fixed-effect GLM solve (SURVEY §2.10 M1/M4/M6) on spark.ml.

The reference hand-rolls distributed LBFGS/OWLQN/TRON over
treeAggregate gradient rounds (photon-api/.../optimization/
DistributedOptimizationProblem.scala:112-157, photon-lib/.../
optimization/Optimizer.scala:162-244). Spark-first, the same
capability — weighted, offset-bearing GLM with L2 — is
``GeneralizedLinearRegression`` (IRLS, internally treeAggregate-based),
so the solve stays entirely JVM-side. The optimizer menu (LBFGS vs
TRON etc.) is an implementation detail, not a capability; families and
offset/weight semantics are the contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame, SparkSession, functions as F

_GLR_FAMILY = {"binomial": "binomial", "logistic": "binomial",
               "gaussian": "gaussian", "linear": "gaussian",
               "poisson": "poisson"}


def densify(
    df: DataFrame,
    indices_col: str,
    values_col: str,
    dim: int,
    out_col: str = "features_vec",
) -> DataFrame:
    """(indices, values) sparse pairs → ml.linalg dense vector column.

    JVM-only path: map_from_arrays + sequence-transform + array_to_vector
    (no Python UDF). Null feature arrays become all-zero vectors.
    GLR materializes dense coefficient vectors anyway, so dense input
    costs nothing extra at fit time; at scoring time we keep the sparse
    pairs (ml/scoring.py) and never densify.
    """
    m = F.map_from_arrays(
        F.coalesce(F.col(indices_col), F.array()),
        F.coalesce(F.col(values_col), F.array()),
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(m, i.cast("long")), F.lit(0.0)),
    )
    return df.withColumn(out_col, array_to_vector(dense))


@dataclass
class FixedEffectGLM:
    """A single fixed-effect GLM (FixedEffectModel.scala:33): dense
    coefficients + intercept, broadcast to executors at score time."""

    family: str
    coefficients: np.ndarray
    intercept: float
    dim: int
    reg_param: float = 0.0
    meta: dict = field(default_factory=dict)

    def as_table(self, spark: SparkSession) -> DataFrame:
        """Model as DataFrame(feature_index long, coefficient double) —
        the scalable representation (join-able, never driver-bound)."""
        rows = [(int(i), float(c)) for i, c in enumerate(self.coefficients)]
        return spark.createDataFrame(rows, "feature_index long, coefficient double")


def fit_fixed_effect(
    df: DataFrame,
    dim: int,
    family: str = "binomial",
    indices_col: str = "features_indices",
    values_col: str = "features_values",
    label_col: str = "response",
    weight_col: str | None = "weight",
    offset_col: str | None = "offset",
    reg_param: float = 0.0,
    max_iter: int = 25,
    tol: float = 1e-6,
) -> FixedEffectGLM:
    """Fit one distributed GLM (M1) with offset (M6), weight, L2 (M4).

    Known hazard (SURVEY §7): spark.ml LogisticRegression has no
    offsetCol, so offset-bearing logistic fits go through GLR binomial
    (IRLS). Elastic-net + offset together needs the custom local solver
    (ml/random_effects.py applies it per entity).
    """
    from pyspark.ml.regression import GeneralizedLinearRegression

    # project to the fit's columns and cache: IRLS re-reads the input
    # every iteration, and re-running the densify transform (and
    # everything upstream) per iteration dominates fit time otherwise
    fit_cols = [label_col] + [c for c in (weight_col, offset_col) if c]
    vec_df = (
        densify(df, indices_col, values_col, dim)
        .select(*fit_cols, "features_vec")
        .persist()
    )
    glr = GeneralizedLinearRegression(
        family=_GLR_FAMILY[family],
        featuresCol="features_vec",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
        tol=tol,
        fitIntercept=True,
    )
    if weight_col:
        glr.setWeightCol(weight_col)
    if offset_col:
        glr.setOffsetCol(offset_col)
    model = glr.fit(vec_df)
    vec_df.unpersist()
    # training diagnostics (the legacy driver's model log, A12 inputs:
    # Evaluation.scala / Driver.computeAndLogModelMetrics)
    s = model.summary
    meta = {"iterations": s.numIterations}
    for attr in ("deviance", "nullDeviance", "aic", "dispersion"):
        try:
            meta[attr] = float(getattr(s, attr))
        except Exception:
            pass
    return FixedEffectGLM(
        family=family,
        coefficients=np.asarray(model.coefficients.toArray(), dtype=np.float64),
        intercept=float(model.intercept),
        dim=dim,
        reg_param=reg_param,
        meta=meta,
    )
