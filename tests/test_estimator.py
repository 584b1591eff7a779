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
