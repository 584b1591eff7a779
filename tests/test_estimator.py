"""GameEstimator/GameTransformer facade: fit on the sf0.001 training
frame with a fixed + per-supplier random coordinate, transform, check
the spark.ml-style contract."""

from pyspark.sql import functions as F

from photon_ml_spark.datamodel import FeatureShardConfig
from photon_ml_spark.estimator import GameEstimator
from photon_ml_spark.ml.coordinate_descent import CoordinateConfig
from photon_ml_spark.sources import datasets, featurize


def test_estimator_fit_transform(spark, sf_dir):
    training = datasets.lineitem_training_frame(spark, sf_dir).cache()
    dictionary = featurize.build_feature_dictionary(
        training, ["features"], has_intercept=True
    ).cache()
    shard = FeatureShardConfig("features", ["features"])
    assembled = featurize.assemble_shard(
        training, dictionary, shard, strategy="map"
    ).cache()

    est = GameEstimator(
        coordinates=[
            CoordinateConfig(name="global", kind="fixed", dim=5),
            CoordinateConfig(
                name="per-supplier", kind="random", dim=5,
                entity_col="suppkey", reg_param=1.0, min_samples=5,
            ),
        ],
        family="binomial",
        n_iterations=1,
    )
    fitted = est.fit(assembled)
    assert len(fitted.history) == 2  # one update per coordinate

    out = fitted.transform(assembled)
    assert "score" in out.columns and "prediction" in out.columns
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("prediction").alias("pmin"),
        F.max("prediction").alias("pmax"),
    ).first()
    assert stats.n == assembled.count()
    assert 0.0 <= stats.pmin <= stats.pmax <= 1.0
    # the model must discriminate at least weakly on training data
    from photon_ml_spark.functions.metrics import auroc

    auc = auroc(out, score="score", label="response").first().auroc
    assert auc > 0.5


def test_estimator_multi_shard_coordinates(spark):
    """GameEstimator with coordinates on two DIFFERENT feature shards
    (the GameEstimator.scala:55 surface with per-coordinate
    featureShardId): each coordinate trains and scores through its own
    indices/values columns, and the transformer's score is the sum of
    the per-shard margins."""
    from photon_ml_spark.datamodel import FeatureShardConfig
    from photon_ml_spark.estimator import GameEstimator
    from photon_ml_spark.ml.coordinate_descent import CoordinateConfig
    from photon_ml_spark.ml.scoring import score_literal, score_random_effect
    from photon_ml_spark.sources import datasets, featurize
    from pyspark.sql import functions as F

    training = datasets.lineitem_training_frame(spark, "/root/testdata/sf0.001")
    a_terms = F.array(F.lit("qty"), F.lit("price"))
    two = training.select(
        "uid", "response", "offset", "weight", "suppkey",
        F.filter(
            "features", lambda f: F.array_contains(a_terms, f["term"])
        ).alias("bag_a"),
        F.filter(
            "features", lambda f: ~F.array_contains(a_terms, f["term"])
        ).alias("bag_b"),
    )
    da = featurize.build_feature_dictionary(two, ["bag_a"])
    db = featurize.build_feature_dictionary(two, ["bag_b"])
    dim_a, dim_b = da.count(), db.count()
    assembled = featurize.assemble_shard(
        two, da, FeatureShardConfig("sa", ["bag_a"]), strategy="map"
    )
    assembled = featurize.assemble_shard(
        assembled, db, FeatureShardConfig("sb", ["bag_b"]), strategy="map"
    ).cache()
    est = GameEstimator(
        coordinates=[
            CoordinateConfig(
                name="global", kind="fixed", dim=dim_a,
                indices_col="sa_indices", values_col="sa_values",
            ),
            CoordinateConfig(
                name="per_supplier", kind="random", dim=dim_b,
                indices_col="sb_indices", values_col="sb_values",
                entity_col="suppkey", reg_param=1.0,
            ),
        ],
        family="binomial",
        n_iterations=1,
    )
    fitted = est.fit(assembled)
    scored = fitted.transform(assembled)
    # decompose: transformer total == fixed margin on shard A + RE
    # margin on shard B, row by row
    fx = fitted.model.coordinates["global"]
    re_tbl = fitted.model.coordinates["per_supplier"].select(
        F.col("entity").alias("suppkey"), "coefficients", "intercept"
    )
    manual = score_literal(
        assembled, fx, indices_col="sa_indices", values_col="sa_values",
        out_col="m_fixed",
    )
    manual = score_random_effect(
        manual, re_tbl, entity_col="suppkey",
        indices_col="sb_indices", values_col="sb_values", out_col="m_re",
    )
    joined = scored.select("uid", "score").join(
        manual.select(
            "uid", (F.col("m_fixed") + F.col("m_re")).alias("expect")
        ),
        "uid",
    )
    bad = joined.filter(
        F.abs(F.col("score") - F.col("expect")) > 1e-9
    ).count()
    assert bad == 0
    assembled.unpersist()


def test_transformer_save_load_roundtrip(spark, sf_dir, tmp_path):
    """fit → save → load → transform equals the in-memory transform
    row-for-row — the spark.ml Model persistence contract
    (GameEstimator.scala:55 "interfaces identical to Spark ML")."""
    training = datasets.lineitem_training_frame(spark, sf_dir).cache()
    dictionary = featurize.build_feature_dictionary(
        training, ["features"], has_intercept=True
    ).cache()
    shard = FeatureShardConfig("features", ["features"])
    assembled = featurize.assemble_shard(
        training, dictionary, shard, strategy="map"
    ).cache()

    est = GameEstimator(
        coordinates=[
            CoordinateConfig(name="global", kind="fixed", dim=5),
            CoordinateConfig(
                name="per-supplier", kind="random", dim=5,
                entity_col="suppkey", reg_param=1.0, min_samples=5,
            ),
        ],
        family="binomial",
        n_iterations=1,
    )
    fitted = est.fit(assembled)
    path = str(tmp_path / "transformer_model")
    fitted.save(path)  # spark resolved from the active session

    from photon_ml_spark.estimator import GameTransformer

    loaded = GameTransformer.load(path, spark)
    assert loaded.model.family == "binomial"
    assert set(loaded.model.configs) == {"global", "per-supplier"}

    a = {
        r.uid: (r.score, r.prediction)
        for r in fitted.transform(assembled).select(
            "uid", "score", "prediction"
        ).collect()
    }
    b = {
        r.uid: (r.score, r.prediction)
        for r in loaded.transform(assembled).select(
            "uid", "score", "prediction"
        ).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert abs(a[k][0] - b[k][0]) < 1e-12
        assert abs(a[k][1] - b[k][1]) < 1e-12
