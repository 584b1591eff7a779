"""Constraint-map parsing parity with GLMSuite.createConstraintFeatureMap
(GLMSuite.scala:207-287): wildcard rules, overlap detection, bound
validation, and dictionary resolution."""

import math

import pytest

from photon_ml_spark.datamodel import FEATURE_KEY_SEP as S, INTERCEPT_KEY
from photon_ml_spark.ml.constraints import parse_constraint_map

DICT = [
    (f"age{S}18-25", 0),
    (f"age{S}26-40", 1),
    (f"geo{S}us", 2),
    (f"geo{S}de", 3),
    (INTERCEPT_KEY, 4),
]
DIM = 5


def test_exact_and_term_wildcard():
    lo, hi = parse_constraint_map(
        [
            {"name": "age", "term": "*", "lowerBound": -1.0, "upperBound": 1.0},
            {"name": "geo", "term": "us", "upperBound": 0.5},
        ],
        DICT, DIM,
    )
    assert list(lo[:2]) == [-1.0, -1.0] and list(hi[:2]) == [1.0, 1.0]
    assert lo[2] == -math.inf and hi[2] == 0.5
    assert lo[3] == -math.inf and hi[3] == math.inf  # geo:de untouched
    assert hi[4] == math.inf  # intercept untouched


def test_all_wildcard_excludes_intercept_and_must_be_alone():
    lo, hi = parse_constraint_map(
        [{"name": "*", "term": "*", "lowerBound": 0.0}], DICT, DIM
    )
    assert all(lo[i] == 0.0 for i in range(4))
    assert lo[4] == -math.inf  # INTERCEPT_KEY skipped
    with pytest.raises(ValueError, match="only constraint"):
        parse_constraint_map(
            [
                {"name": "geo", "term": "us", "upperBound": 1.0},
                {"name": "*", "term": "*", "lowerBound": 0.0},
            ],
            DICT, DIM,
        )
    # constraints AFTER the all-wildcard collide per-feature instead
    with pytest.raises(ValueError, match="conflicting"):
        parse_constraint_map(
            [
                {"name": "*", "term": "*", "lowerBound": 0.0},
                {"name": "geo", "term": "us", "upperBound": 1.0},
            ],
            DICT, DIM,
        )


def test_validation_rules():
    with pytest.raises(ValueError, match="wildcard name requires"):
        parse_constraint_map(
            [{"name": "*", "term": "us", "lowerBound": 0.0}], DICT, DIM
        )
    with pytest.raises(ValueError, match="empty constraint"):
        parse_constraint_map([{"name": "geo", "term": "us"}], DICT, DIM)
    with pytest.raises(ValueError, match="lower bound"):
        parse_constraint_map(
            [{"name": "geo", "term": "us", "lowerBound": 2.0, "upperBound": 1.0}],
            DICT, DIM,
        )
    with pytest.raises(ValueError, match="name and term"):
        parse_constraint_map([{"name": "geo", "lowerBound": 0.0}], DICT, DIM)
    # overlap between term-wildcard and exact
    with pytest.raises(ValueError, match="conflicting"):
        parse_constraint_map(
            [
                {"name": "age", "term": "*", "lowerBound": 0.0},
                {"name": "age", "term": "18-25", "upperBound": 1.0},
            ],
            DICT, DIM,
        )


def test_unknown_keys_skip_and_empty_returns_none():
    assert parse_constraint_map([], DICT, DIM) is None
    # matching nothing -> None (reference: map stays empty -> None)
    assert (
        parse_constraint_map(
            [{"name": "nope", "term": "x", "lowerBound": 0.0}], DICT, DIM
        )
        is None
    )


def test_constrained_fit_end_to_end(spark):
    """The parsed bounds feed the LBFGSB path: a positive response on a
    positive feature wants coef > 0; cap it at 0.25 and the solver must
    land ON the bound."""
    from photon_ml_spark.ml import glm

    dictionary = spark.createDataFrame(
        [(f"f{S}x", 0)], "feature_key string, feature_index long"
    )
    lo, hi = parse_constraint_map(
        [{"name": "f", "term": "x", "lowerBound": -10.0, "upperBound": 0.25}],
        dictionary, 1,
    )
    df = spark.range(500).selectExpr(
        "id AS uid",
        "array(CAST(0 AS LONG)) AS features_indices",
        "array(CAST(1.0 + id % 5 AS DOUBLE)) AS features_values",
        "CAST(2.0 * (1.0 + id % 5) AS DOUBLE) AS response",
        "CAST(0.0 AS DOUBLE) AS offset", "CAST(1.0 AS DOUBLE) AS weight",
    )
    m = glm.fit_fixed_effect(
        df, dim=1, family="gaussian", reg_param=0.0,
        lower_bounds=lo, upper_bounds=hi, tol=1e-9,
    )
    assert m.meta["optimizer"] == "lbfgsb"
    assert abs(m.coefficients[0] - 0.25) < 1e-6


def test_spark_dictionary_resolution_without_full_collect(spark, monkeypatch):
    """The DataFrame path must broadcast-join the constraint keys
    against the dictionary, NEVER collect the full key->index map: with
    a dictionary far larger than the constraint set, total rows pulled
    to the driver stay O(matched), and bounds equal the iterable path's."""
    import numpy as np
    from pyspark.sql import DataFrame

    big = [(f"age{S}{i}", i) for i in range(5000)]
    big += [(f"geo{S}us", 5000), (f"geo{S}de", 5001), (INTERCEPT_KEY, 5002)]
    dim = len(big)
    ddf = spark.createDataFrame(big, "feature_key string, feature_index long")

    collected = []
    orig = DataFrame.collect

    def probe(self):
        rows = orig(self)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", probe)
    cons = [
        {"name": "geo", "term": "*", "lowerBound": -2.0, "upperBound": 2.0},
        {"name": "age", "term": "7", "upperBound": 0.5},
    ]
    lo, hi = parse_constraint_map(cons, ddf, dim)
    monkeypatch.undo()
    assert sum(collected) <= 10, f"driver pulled {sum(collected)} rows"
    lo2, hi2 = parse_constraint_map(cons, big, dim)
    assert np.array_equal(lo, lo2) and np.array_equal(hi, hi2)
    # overlap detection still fires through the join path
    import pytest as _pt
    with _pt.raises(ValueError, match="conflicting"):
        parse_constraint_map(
            [
                {"name": "geo", "term": "*", "lowerBound": 0.0},
                {"name": "geo", "term": "us", "upperBound": 1.0},
            ],
            ddf, dim,
        )


def test_spark_all_wildcard_collects_indices_only(spark):
    """All-feature wildcard on a DataFrame dictionary binds every
    non-intercept index (indices-only driver traffic)."""
    import math as _m

    ddf = spark.createDataFrame(
        DICT, "feature_key string, feature_index long"
    )
    lo, hi = parse_constraint_map(
        [{"name": "*", "term": "*", "lowerBound": 0.0}], ddf, DIM
    )
    assert all(lo[i] == 0.0 for i in range(4))
    assert lo[4] == -_m.inf  # INTERCEPT_KEY skipped
