"""Model scoring / batch inference (SURVEY §2.10 M12; §2.3 J4/J5).

Two physical strategies, both pure DataFrame:

- ``score_literal``: coefficients inlined in the plan (broadcast with
  it) — map-side dot product, zero shuffle. This is the reference's
  fixed-effect broadcast scoring (FixedEffectCoordinate.scala:144-155,
  FixedEffectModel.scala:55-65).
- ``score_by_join``: model as a (feature_index → coefficient) table,
  explode + equi-join + re-aggregate. Shuffles, but scales to models
  that cannot live in one plan/broadcast (hundreds of millions of
  coefficients — the reference's PalDB regime).

Per-entity (random-effect) scoring is a model-table equi-join on the
entity column (RandomEffectModel.scala:259-298 hand-rolls a replicated
partitioned hash join; Catalyst picks broadcast/SMJ itself) — see
``score_random_effect``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from photon_ml_spark.functions.links import mean_for_family
from photon_ml_spark.functions.vectors import sparse_dot_literal
from photon_ml_spark.ml.glm import FixedEffectGLM


def score_literal(
    df: DataFrame,
    model: FixedEffectGLM,
    indices_col: str = "features_indices",
    values_col: str = "features_values",
    out_col: str = "score",
) -> DataFrame:
    """Map-side margin: x·β + intercept (no offset — residual bookkeeping
    keeps raw coordinate scores, CoordinateDataScores.scala:30)."""
    margin = (
        sparse_dot_literal(
            F.coalesce(F.col(indices_col), F.array()),
            F.coalesce(F.col(values_col), F.array()),
            list(model.coefficients),
        )
        + F.lit(model.intercept)
    )
    return df.withColumn(out_col, margin)


def score_by_join(
    df: DataFrame,
    model_table: DataFrame,
    intercept: float = 0.0,
    indices_col: str = "features_indices",
    values_col: str = "features_values",
    uid_col: str = "uid",
    out_col: str = "score",
    broadcast_model: bool = True,
) -> DataFrame:
    """Margin via (feature_index, coefficient) table join — the
    arbitrarily-wide-model path. ``broadcast_model=False`` for models
    past broadcast size (shuffle join on feature_index)."""
    ex = df.select(
        uid_col,
        F.explode(
            F.arrays_zip(
                F.col(indices_col).alias("feature_index"),
                F.col(values_col).alias("feature_value"),
            )
        ).alias("__p"),
    ).select(uid_col, F.col("__p.feature_index").alias("feature_index"),
             F.col("__p.feature_value").alias("feature_value"))
    mt = F.broadcast(model_table) if broadcast_model else model_table
    sums = (
        ex.join(mt, "feature_index", "inner")
        .groupBy(uid_col)
        .agg(F.sum(F.col("feature_value") * F.col("coefficient")).alias("__dot"))
    )
    return (
        df.join(sums, uid_col, "left")
        .withColumn(out_col, F.coalesce(F.col("__dot"), F.lit(0.0)) + F.lit(intercept))
        .drop("__dot")
    )


def score_random_effect(
    df: DataFrame,
    model_table: DataFrame,
    entity_col: str,
    indices_col: str = "features_indices",
    values_col: str = "features_values",
    out_col: str = "score",
) -> DataFrame:
    """Per-entity model scoring (J5): left join the per-entity model
    table (entity, coefficients array<double>, intercept) on the entity
    column; entities with no model score 0.0
    (RandomEffectModel.scala:283-287 — same missing-model semantics).

    The dot product indexes the entity's dense coefficient array by the
    row's feature indices — JVM-side zip_with/aggregate, no UDF.
    """
    joined = df.join(model_table, entity_col, "left")
    terms = F.zip_with(
        F.coalesce(F.col(values_col), F.array()),
        F.transform(
            F.coalesce(F.col(indices_col), F.array()),
            lambda i: F.element_at(F.col("coefficients"), (i + 1).cast("int")),
        ),
        lambda v, c: v * F.coalesce(c, F.lit(0.0)),
    )
    margin = F.aggregate(terms, F.lit(0.0), lambda a, x: a + x) + F.coalesce(
        F.col("intercept"), F.lit(0.0)
    )
    has_model = F.col("coefficients").isNotNull()
    return joined.withColumn(
        out_col, F.when(has_model, margin).otherwise(F.lit(0.0))
    ).drop("coefficients", "intercept")


def add_scores(
    a: DataFrame, b: DataFrame, uid_col: str = "uid",
    score_col: str = "score", sign: int = 1,
) -> DataFrame:
    """Score-set union arithmetic (J11/U4): full outer join on uid,
    missing side counts 0 (DataScores.scala:29-54 '+'/'-')."""
    sa = a.select(uid_col, F.col(score_col).alias("__sa"))
    sb = b.select(uid_col, F.col(score_col).alias("__sb"))
    return sa.join(sb, uid_col, "full_outer").select(
        uid_col,
        (
            F.coalesce(F.col("__sa"), F.lit(0.0))
            + F.lit(float(sign)) * F.coalesce(F.col("__sb"), F.lit(0.0))
        ).alias(score_col),
    )


def attach_residual_offset(
    data: DataFrame, scores: DataFrame, uid_col: str = "uid",
    offset_col: str = "offset", score_col: str = "score",
) -> DataFrame:
    """Residual-score attach (J1/J2): left join scores on uid, missing
    score → 0, added to offset (FixedEffectDataset.scala:46-58)."""
    s = scores.select(uid_col, F.col(score_col).alias("__res"))
    return (
        data.join(s, uid_col, "left")
        .withColumn(offset_col, F.col(offset_col) + F.coalesce(F.col("__res"), F.lit(0.0)))
        .drop("__res")
    )


def apply_mean(df: DataFrame, family: str, margin_col: str = "score",
               out_col: str = "prediction") -> DataFrame:
    """Mean function per family (M12: sigmoid/exp applied by model class)."""
    return df.withColumn(out_col, mean_for_family(F.col(margin_col), family))
