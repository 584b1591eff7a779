"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship GAME pipeline slice on sf0.001;
``queries()``/``oracle_sql()`` expose the SURVEY §2 operator inventory
(registered in photon_ml_spark/queries*.py) for the DuckDB correctness
gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: featurize lineitem⋈orders → fit fixed-effect binomial
    GLM (offset+weight) → score → per-row prediction frame."""
    from pyspark.sql import functions as F

    from photon_ml_spark.datamodel import FeatureShardConfig
    from photon_ml_spark.ml import glm, scoring
    from photon_ml_spark.sources import datasets, featurize

    sf_dir = "/root/testdata/sf0.001"
    training = datasets.lineitem_training_frame(spark, sf_dir).cache()
    dictionary = featurize.build_feature_dictionary(
        training, ["features"], has_intercept=True
    )
    shard = FeatureShardConfig("features", ["features"])
    assembled = featurize.assemble_shard(
        training, dictionary, shard, strategy="map"
    ).cache()
    model = glm.fit_fixed_effect(assembled, dim=5, family="binomial")
    scored = scoring.score_literal(assembled, model)
    scored = scoring.apply_mean(scored, "binomial")
    return scored.select(
        "uid", "response", "offset", "weight",
        F.col("score").alias("margin"), "prediction",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from photon_ml_spark.queries import all_queries

    return {name: spec.run for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from photon_ml_spark.queries import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
