"""Source/scoring odds and ends: LibSVM scan (S6), score subtraction
(J11 '-'), daily path resolution edge cases (S7/F4)."""

import numpy as np
from pyspark.sql import functions as F

from photon_ml_spark.ml.scoring import add_scores
from photon_ml_spark.sources.datasets import daily_paths, read_libsvm


def test_read_libsvm(spark, tmp_path):
    p = tmp_path / "data.libsvm"
    p.write_text("1 1:0.5 3:1.25\n0 2:2.0\n1 1:-1.0 2:0.25 3:3.0\n")
    df = read_libsvm(spark, str(p), num_features=3)
    rows = df.orderBy(F.desc("label")).collect()
    assert [r.label for r in rows] == [1.0, 1.0, 0.0]
    dense = [r.features.toArray().tolist() for r in rows]
    assert [0.5, 0.0, 1.25] in dense and [0.0, 2.0, 0.0] in dense


def test_add_scores_subtract_sign(spark):
    a = spark.createDataFrame([(1, 5.0), (2, 3.0)], "uid long, score double")
    b = spark.createDataFrame([(2, 1.0), (3, 4.0)], "uid long, score double")
    out = {
        r.uid: r.score
        for r in add_scores(a, b, sign=-1).collect()
    }
    # full outer: missing side counts 0 (DataScores.scala '-')
    assert out == {1: 5.0, 2: 2.0, 3: -4.0}


def test_daily_paths_single_day_and_span(spark):
    one = daily_paths(spark, "2024-02-29", "2024-02-29").collect()
    assert [r.path for r in one] == ["daily/2024/02/29"]
    span = daily_paths(spark, "1999-12-30", "2000-01-02").collect()
    assert [r.path for r in span] == [
        "daily/1999/12/30", "daily/1999/12/31",
        "daily/2000/01/01", "daily/2000/01/02",
    ]
