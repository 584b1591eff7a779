"""P4 validator suite unit tests (DataValidators.scala:88-195 parity):
the standard checks must flag nonfinite labels/offsets, nonpositive
weights, nonbinary logistic labels, and — new in round 4 — any
NaN/Inf/NULL element inside the feature VECTOR itself."""

import pytest
from pyspark.sql import functions as F

from photon_ml_spark.operators.validation import (
    standard_training_checks,
    validate_or_raise,
    validation_report,
)

NAN, INF = float("nan"), float("inf")


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        # (response, offset, weight, features_values)        expected hits
        (1.0, 0.0, 1.0, [1.0, 2.0]),                       # clean
        (0.0, 0.0, 1.0, [1.0, NAN]),                       # nonfinite feature
        (1.0, 0.0, 1.0, [INF, 0.0]),                       # nonfinite feature
        (0.0, 0.0, 1.0, [None, 0.0]),                      # nonfinite feature
        (NAN, 0.0, 1.0, [1.0, 1.0]),                       # nonfinite+nonbinary label
        (1.0, INF, 1.0, [1.0, 1.0]),                       # nonfinite offset
        (2.0, 0.0, 1.0, [1.0, 1.0]),                       # nonbinary label
        (1.0, 0.0, 0.0, [1.0, 1.0]),                       # nonpositive weight
        (0.0, 0.0, -1.0, [1.0, 1.0]),                      # nonpositive weight
        (1.0, 0.0, 1.0, None),                             # whole-NULL vector
    ]
    return spark.createDataFrame(
        rows,
        "response double, offset double, weight double, "
        "features_values array<double>",
    )


def test_standard_checks_counts(frame):
    row = validation_report(frame, standard_training_checks()).first()
    assert row.n_rows == 10
    assert row.n_nonfinite_label == 1
    assert row.n_nonfinite_offset == 1
    assert row.n_nonpositive_weight == 2
    assert row.n_nonbinary_label == 2  # NaN label counts as nonbinary too
    # NaN element, Inf element, NULL element, whole-NULL array
    assert row.n_nonfinite_features == 4


def test_poisson_task_and_featureless_variant(spark):
    df = spark.createDataFrame(
        [(-1.0, 0.0, 1.0), (2.0, 0.0, 1.0)],
        "response double, offset double, weight double",
    )
    checks = standard_training_checks(task="poisson", features_col=None)
    assert "n_nonfinite_features" not in checks
    row = validation_report(df, checks).first()
    assert row.n_negative_label == 1


def test_validate_or_raise_names_the_failed_check(frame):
    with pytest.raises(ValueError, match="n_nonfinite_features"):
        validate_or_raise(frame, standard_training_checks())
    clean = frame.filter(
        F.col("response").isin(0.0, 1.0)
        & (F.col("weight") > 0)
        & (F.col("offset") == 0.0)
        & ~F.exists("features_values", lambda v: v.isNull() | F.isnan(v) | (F.abs(v) == INF))
    )
    validate_or_raise(clean, standard_training_checks())  # no raise


def test_validation_modes(frame):
    """DataValidationType parity: disabled never scans, sample checks
    a seeded 10% subset (may or may not hit violations — here the
    violation density is high enough that it reliably does at 50%),
    full always raises on this frame."""
    checks = standard_training_checks()
    validate_or_raise(frame, checks, mode="disabled")  # no raise, no scan
    with pytest.raises(ValueError, match="data validation failed"):
        validate_or_raise(frame, checks, mode="full")
    with pytest.raises(ValueError, match="data validation failed"):
        # 6 of 10 rows are invalid; fraction=0.99 makes a miss
        # practically impossible while still exercising the sample path
        validate_or_raise(frame, checks, mode="sample", sample_fraction=0.99)
    with pytest.raises(ValueError, match="mode"):
        validate_or_raise(frame, checks, mode="half")
