"""Data validation (SURVEY §2.2 P4, §2.7 F7).

Rebuilds photon-client/.../data/DataValidators.scala:32-417: row-level
predicates (finite label/offset/features, task-specific label domains,
positive weights) evaluated as ONE aggregation pass — the reference's
DataFrame path ANDs per-row checks and fails the job on any violation.

All checks are Catalyst expressions; a 100 TB validation is a single
scan with partial aggregation, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def is_finite(c: Column) -> Column:
    """Finite = not NaN, not ±Inf, not NULL (DataValidators.scala:70-86)."""
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) != float("inf"))


def validation_report(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Count violations per named predicate in one pass.

    ``checks`` maps output column → Column that is TRUE when the row is
    INVALID. Appends ``n_rows``. Single-row DataFrame.
    """
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in checks.items()
    ]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return df.agg(*aggs)


def standard_training_checks(
    label_col: str = "response",
    weight_col: str = "weight",
    offset_col: str = "offset",
    task: str = "logistic",
    features_col: str | None = "features_values",
) -> dict[str, Column]:
    """The reference's per-task validation suite
    (DataValidators.scala:88-195): finite label/offset, weight > 0,
    binary label for logistic, non-negative label for Poisson, and a
    finite FEATURE VECTOR (``validateFeatures``, DataValidators.scala:
    88-99) — a row is invalid if ANY element of ``features_col`` is
    NaN/±Inf/NULL (higher-order ``exists`` over the values array, one
    JVM expression, no explode). Pass ``features_col=None`` for
    feature-less relations."""
    label = F.col(label_col)
    checks = {
        "n_nonfinite_label": ~is_finite(label),
        "n_nonfinite_offset": ~is_finite(F.col(offset_col)),
        "n_nonpositive_weight": ~(F.col(weight_col) > 0),
    }
    if features_col is not None:
        # a NULL array is as invalid as a NULL element (exists() over a
        # NULL array yields NULL, which when() would count as valid)
        checks["n_nonfinite_features"] = F.col(features_col).isNull() | F.exists(
            F.col(features_col), lambda v: ~is_finite(v)
        )
    if task in ("logistic", "binomial", "smoothed_hinge"):
        checks["n_nonbinary_label"] = ~label.isin(0.0, 1.0)
    elif task == "poisson":
        checks["n_negative_label"] = label < 0
    return checks


def standard_scoring_checks(
    weight_col: str = "weight",
    offset_col: str = "offset",
    features_col: str | None = "features_values",
) -> dict[str, Column]:
    """The reference's label-free base validator set — scoring inputs
    carry no response (dataFrameBaseValidators, DataValidators.scala:
    47-52: finite features, finite offset, positive weight). Used by
    the scoring driver's data_validation modes
    (sanityCheckDataFrameForScoring with no task type,
    DataValidators.scala:369-399)."""
    checks = {
        "n_nonfinite_offset": ~is_finite(F.col(offset_col)),
        "n_nonpositive_weight": ~(F.col(weight_col) > 0),
    }
    if features_col is not None:
        checks["n_nonfinite_features"] = F.col(features_col).isNull() | F.exists(
            F.col(features_col), lambda v: ~is_finite(v)
        )
    return checks


def validate_or_raise(
    df: DataFrame,
    checks: dict[str, Column],
    mode: str = "full",
    sample_fraction: float = 0.10,
    seed: int = 42,
) -> None:
    """Fail-fast equivalent of sanityCheckDataFrameForTraining
    (DataValidators.scala:320-417) with the reference's three
    validation modes (DataValidationType, applied at
    DataValidators.scala:250-259):

    - ``'full'``: one aggregation pass over every row.
    - ``'sample'``: the same checks over a seeded 10% sample — the
      cheap smoke mode for petabyte inputs (the reference samples
      unseeded; we seed so retries validate the same rows).
    - ``'disabled'``: no scan at all.
    """
    if mode == "disabled":
        return
    if mode == "sample":
        df = df.sample(withReplacement=False, fraction=sample_fraction, seed=seed)
    elif mode != "full":
        raise ValueError(f"mode must be full|sample|disabled, got {mode!r}")
    row = validation_report(df, checks).first()
    bad = {k: v for k, v in row.asDict().items() if k != "n_rows" and v}
    if bad:
        raise ValueError(f"data validation failed: {bad} of {row.n_rows} rows")
