"""Phase-0 slice: read → featurize → fit GLM (offset+weight) → score → AUC.

Covers SURVEY §7 Phase 0: S2/S3 featurization, M1/M4/M6 fit, M12
scoring, A9/A10 metrics, end-to-end on driver testdata.
"""

import pytest
from pyspark.sql import functions as F

from photon_ml_spark.datamodel import FeatureShardConfig, INTERCEPT_KEY
from photon_ml_spark.functions import metrics
from photon_ml_spark.ml import glm, scoring
from photon_ml_spark.sources import datasets, featurize


@pytest.fixture(scope="module")
def training(spark, sf_dir):
    df = datasets.lineitem_training_frame(spark, sf_dir).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def dictionary(spark, training):
    d = featurize.build_feature_dictionary(training, ["features"], has_intercept=True)
    return d.cache()


def test_dictionary_deterministic(dictionary):
    rows = {r.feature_key: r.feature_index for r in dictionary.collect()}
    # 5 features + intercept, lexicographic order, intercept last
    assert len(rows) == 6
    assert rows[INTERCEPT_KEY] == 5
    keys = sorted(k for k in rows if k != INTERCEPT_KEY)
    assert [rows[k] for k in keys] == list(range(5))


def test_no_duplicate_features(training):
    dups = featurize.check_duplicate_features(training, ["features"])
    assert dups.count() == 0


@pytest.fixture(scope="module")
def assembled(training, dictionary):
    shard = FeatureShardConfig("features", ["features"])
    out = featurize.assemble_shard(training, dictionary, shard).cache()
    out.count()
    return out


def test_assembled_shapes(assembled, training):
    assert assembled.count() == training.count()
    row = assembled.select("features_indices", "features_values").first()
    assert list(row.features_indices) == [0, 1, 2, 3, 4]
    assert len(row.features_values) == 5


def test_map_strategy_guard_falls_back_to_join(training, dictionary):
    """The ≤max_map_keys 'map' contract is enforced: an oversized
    dictionary must choose the shuffle-safe join plan (and still produce
    identical output), never an unbounded driver collect."""
    shard = FeatureShardConfig("features", ["features"])
    guarded = featurize.assemble_shard(
        training, dictionary, shard, strategy="map", max_map_keys=2
    )
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    mapped = featurize.assemble_shard(training, dictionary, shard, strategy="map")
    plan_map = mapped._jdf.queryExecution().executedPlan().toString()
    # the fallback adds dictionary-join operators the in-place map
    # rewrite never needs (upstream joins appear in both counts)
    assert plan.count("Join") > plan_map.count("Join"), (
        "oversized map dictionary did not fall back to join"
    )
    a = {r.uid: (list(r.features_indices), list(r.features_values))
         for r in guarded.select("uid", "features_indices", "features_values").collect()}
    b = {r.uid: (list(r.features_indices), list(r.features_values))
         for r in mapped.select("uid", "features_indices", "features_values").collect()}
    assert a == b


def test_fit_score_auc(spark, assembled):
    model = glm.fit_fixed_effect(assembled, dim=5, family="binomial")
    assert model.coefficients.shape == (5,)

    scored = scoring.score_literal(assembled, model)
    scored = scoring.apply_mean(scored, "binomial")
    n = scored.count()
    assert n == assembled.count()

    auc = metrics.auroc(scored, score="score", label="response").first().auroc
    assert 0.0 <= auc <= 1.0
    # the label has signal (returnflag correlates with measures weakly);
    # at minimum the fit should beat random on its own training data
    assert auc >= 0.5

    suite = metrics.evaluation_suite(
        scored.withColumn("prediction_err", F.col("prediction")),
        score="prediction", label="response", weight="weight",
    ).first()
    assert 0.0 < suite.rmse < 1.0
    assert suite.n == n


def test_score_by_join_matches_literal(spark, assembled):
    model = glm.fit_fixed_effect(assembled, dim=5, family="binomial")
    lit_scores = scoring.score_literal(assembled, model).select("uid", "score")
    tbl = model.as_table(spark)
    join_scores = scoring.score_by_join(
        assembled, tbl, intercept=model.intercept
    ).select("uid", F.col("score").alias("score_j"))
    diff = (
        lit_scores.join(join_scores, "uid")
        .select(F.max(F.abs(F.col("score") - F.col("score_j"))).alias("d"))
        .first()
        .d
    )
    assert diff < 1e-9


def test_score_by_join_above_literal_cap(spark):
    """Round-3 verdict item: the literal path must REFUSE a model wider
    than MAX_LITERAL_COEFFICIENTS while score_by_join handles the same
    width exactly — the two physical strategies meet at the cap
    boundary. Model: coef[i] = (i % 7) - 3 over dim = cap + 1; rows
    activate scattered indices incl. the last one, so a truncated or
    mis-joined model changes the exact integer sums."""
    import numpy as np

    from photon_ml_spark.functions.vectors import (
        MAX_LITERAL_COEFFICIENTS,
        sparse_dot_literal,
    )

    dim = MAX_LITERAL_COEFFICIENTS + 1
    coefs = [(i % 7) - 3.0 for i in range(dim)]
    with pytest.raises(ValueError, match="score_by_join"):
        sparse_dot_literal(F.col("i"), F.col("v"), coefs)

    model_tbl = spark.range(dim).select(
        F.col("id").alias("feature_index"),
        ((F.col("id") % 7) - 3).cast("double").alias("coefficient"),
    )
    rows = spark.range(200).select(
        F.col("id").alias("uid"),
        F.array(
            F.col("id") % dim,
            (F.col("id") * 97 + 13) % dim,
            F.lit(dim - 1).cast("long"),
        ).alias("features_indices"),
        F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0)).alias("features_values"),
    )
    got = {
        r.uid: r.score
        for r in scoring.score_by_join(
            rows, model_tbl, intercept=0.5
        ).select("uid", "score").collect()
    }
    for uid in range(200):
        idx = [uid % dim, (uid * 97 + 13) % dim, dim - 1]
        want = 0.5 + float(
            np.dot([1.0, 2.0, 3.0], [(i % 7) - 3.0 for i in idx])
        )
        assert got[uid] == want, uid
