"""Link / mean functions and margins (SURVEY §2.7 F5).

Mirrors the pointwise loss-function kernels (LogisticLossFunction.scala:
47-84, SquaredLossFunction.scala:32-56, PoissonLossFunction.scala:31-54,
SmoothedHingeLossFunction.scala:34; margin = features·coef + offset,
LabeledPoint.scala:62) as pure Catalyst column expressions — JVM-side,
codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def sigmoid(margin: Column) -> Column:
    """Numerically-stable logistic mean: 1 / (1 + e^-m)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))


def log1p_exp(x: Column) -> Column:
    """log(1 + e^x) computed stably: max(x,0) + log1p(e^-|x|)."""
    return F.greatest(x, F.lit(0.0)) + F.log1p(F.exp(-F.abs(x)))


def logistic_loss(margin: Column, label: Column) -> Column:
    """l(m, y) = log(1 + e^m) - y*m  (LogisticLossFunction.scala:62-68)."""
    return log1p_exp(margin) - label * margin


def squared_loss(margin: Column, label: Column) -> Column:
    """l(m, y) = (m - y)^2 / 2  (SquaredLossFunction.scala:41)."""
    return (margin - label) * (margin - label) / 2

def poisson_loss(margin: Column, label: Column) -> Column:
    """l(m, y) = e^m - y*m  (PoissonLossFunction.scala:43)."""
    return F.exp(margin) - label * margin


def smoothed_hinge_loss(margin: Column, label: Column) -> Column:
    """Rennie's smoothed hinge on z = (2y-1)*m
    (SmoothedHingeLossFunction.scala:34-60):
    z >= 1 → 0; z <= 0 → 1/2 - z; else (1-z)^2 / 2.
    """
    z = (label * 2 - 1) * margin
    return (
        F.when(z >= 1.0, 0.0)
        .when(z <= 0.0, 0.5 - z)
        .otherwise((1 - z) * (1 - z) / 2)
    )


def mean_for_family(margin: Column, family: str) -> Column:
    """Model mean per GLM family (GeneralizedLinearModel subclasses).
    The smoothed-hinge SVM has no mean function — its prediction is the
    raw margin (sign gives the class), matching
    SmoothedHingeLossLinearSVMModel."""
    if family in ("binomial", "logistic"):
        return sigmoid(margin)
    if family == "poisson":
        return F.exp(margin)
    if family in ("gaussian", "linear", "smoothed_hinge"):
        return margin
    raise ValueError(f"unknown family: {family}")
