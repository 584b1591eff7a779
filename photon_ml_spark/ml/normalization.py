"""Feature normalization contexts + coefficient back-transform (M5).

Rebuilds photon-lib/.../normalization/NormalizationContext.scala:37-128
and the factor derivation from feature summaries
(GameTrainingDriver.scala:590-656). The affine transform is
``x' = (x - shift) * factor``; training runs in the transformed space
and coefficients map back exactly (NormalizationContext.scala:77-94):

    beta_orig_j   = beta'_j * factor_j
    intercept     = intercept' - SUM_j beta'_j * factor_j * shift_j

Everything is a DataFrame computation over a long-form (feature, ...)
table — at 100M features a driver-side vector would not fit, a table
joins into the scoring/model pipeline naturally.

Factors come from exact moment sums (functions/stats.feature_statistics)
rather than stddev_samp so that results are reproducible bit-for-bit
across engines when inputs are integer-valued (the oracle contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from photon_ml_spark.functions.stats import feature_statistics

KINDS = (
    "standardization",
    "scale_with_standard_deviation",
    "scale_with_max_magnitude",
    "none",
)


def normalization_table(
    df: DataFrame, cols: list[str], kind: str = "standardization"
) -> DataFrame:
    """Per-feature (feature, shift, factor) normalization contexts.

    - standardization:                shift=mean, factor=1/std
    - scale_with_standard_deviation:  shift=0,    factor=1/std
    - scale_with_max_magnitude:       shift=0,    factor=1/max|x|
    - none:                           shift=0,    factor=1

    Invalid (<=0 / NaN) variance repairs factor to 1.0, mirroring
    FeatureDataStatistics' variance repair (:121-138).
    """
    if kind not in KINDS:
        raise ValueError(f"kind must be one of {KINDS}")
    stats = feature_statistics(df, cols, round_digits=None)
    std = F.sqrt(F.col("variance"))
    inv_std = F.when(
        F.col("variance") > 0, F.lit(1.0) / std
    ).otherwise(F.lit(1.0))
    maxabs = F.greatest(F.abs(F.col("min")), F.abs(F.col("max")))
    inv_max = F.when(maxabs > 0, F.lit(1.0) / maxabs).otherwise(F.lit(1.0))
    if kind == "standardization":
        shift, factor = F.col("mean"), inv_std
    elif kind == "scale_with_standard_deviation":
        shift, factor = F.lit(0.0), inv_std
    elif kind == "scale_with_max_magnitude":
        shift, factor = F.lit(0.0), inv_max
    else:
        shift, factor = F.lit(0.0), F.lit(1.0)
    return stats.select(
        "feature", shift.alias("shift"), factor.alias("factor")
    )


def backmap_coefficients(
    coef_table: DataFrame,
    norm_table: DataFrame,
    intercept_transformed: float,
    intercept_key: str = "(INTERCEPT)",
) -> DataFrame:
    """Map transformed-space coefficients to original space.

    ``coef_table``: (feature, coef) in the trained (normalized) space;
    ``norm_table``: (feature, shift, factor). Returns one row per
    feature with the original-space coefficient, plus an
    ``intercept_key`` row carrying the adjusted intercept — shape
    matches the reference's model table with an intercept slot
    (ModelProcessingUtils / NormalizationContext.scala:77-94).
    """
    j = coef_table.join(norm_table, "feature", "inner")
    feats = j.select(
        "feature",
        "shift",
        "factor",
        (F.col("coef") * F.col("factor")).alias("coef_orig"),
    )
    adj = j.agg(
        (
            F.lit(float(intercept_transformed))
            - F.sum(F.col("coef") * F.col("factor") * F.col("shift"))
        ).alias("coef_orig")
    ).select(
        F.lit(intercept_key).alias("feature"),
        F.lit(0.0).alias("shift"),
        F.lit(1.0).alias("factor"),
        "coef_orig",
    )
    return feats.unionByName(adj)
