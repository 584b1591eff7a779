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


# ------------------------------------------------- sparse-pair layout (CLI)


def sparse_normalization_table(
    df: DataFrame,
    indices_col: str = "features_indices",
    values_col: str = "features_values",
    kind: str = "standardization",
) -> DataFrame:
    """Per-feature-INDEX normalization contexts over the engine's
    sparse-pair layout — (feature_index, shift, factor).

    Implicit zeros count: the reference's summaries run over whole
    sparse vectors (FeatureDataStatistics), so moments use the full
    row count n while the sums come from the stored nonzeros (zeros
    contribute nothing to Σx, Σx², max|x|... except when a feature is
    absent somewhere, which makes min effectively ≤ 0 — handled by
    moments, and max|x| is unaffected by zeros unless all-zero, where
    the factor repairs to 1). Same variance-repair rule as the wide
    layout.
    """
    if kind not in KINDS:
        raise ValueError(f"kind must be one of {KINDS}")
    n = df.count()
    pairs = df.select(
        F.explode(F.arrays_zip(F.col(indices_col), F.col(values_col))).alias(
            "__p"
        )
    ).select(
        F.col(f"__p.{indices_col}").alias("feature_index"),
        F.col(f"__p.{values_col}").cast("double").alias("x"),
    )
    m = pairs.groupBy("feature_index").agg(
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.max(F.abs("x")).alias("maxabs"),
    )
    nn = F.lit(float(n))
    # guard the n-1 divisor: a single-row input would divide by zero,
    # which THROWS under Spark 4 ANSI mode — undefined variance falls
    # into the existing variance>0 repair (factor = 1) instead
    variance = F.when(
        nn > 1.0,
        (F.col("s2") - F.col("s1") * F.col("s1") / nn) / (nn - 1.0),
    )
    mean = F.col("s1") / nn
    std = F.sqrt(variance)
    inv_std = F.when(variance > 0, F.lit(1.0) / std).otherwise(F.lit(1.0))
    inv_max = F.when(
        F.col("maxabs") > 0, F.lit(1.0) / F.col("maxabs")
    ).otherwise(F.lit(1.0))
    if kind == "standardization":
        shift, factor = mean, inv_std
    elif kind == "scale_with_standard_deviation":
        shift, factor = F.lit(0.0), inv_std
    elif kind == "scale_with_max_magnitude":
        shift, factor = F.lit(0.0), inv_max
    else:
        shift, factor = F.lit(0.0), F.lit(1.0)
    return m.select(
        "feature_index", shift.alias("shift"), factor.alias("factor")
    )


def apply_sparse_normalization(
    df: DataFrame,
    norm: DataFrame,
    indices_col: str = "features_indices",
    values_col: str = "features_values",
    uid_col: str = "uid",
) -> DataFrame:
    """Scale the sparse values by each feature's factor: v' = v·factor.

    Training on the factor-scaled SPARSE pairs with a free intercept is
    exactly equivalent to training on the densified affine transform
    (x−shift)·factor: the shift's margin contribution
    −Σ_j β'_j·factor_j·shift_j is row-independent, so the TRAINED
    intercept already absorbs it — i_scaled = i_affine − Σ β'·f·s.
    Backmap from this scaled-only space is therefore β_j = β'_j·f_j
    with the intercept UNCHANGED (the :77-94 shift adjustment applies
    only when the data itself was affine-shifted, as in the wide-layout
    ``backmap_coefficients`` oracle path). Sparsity is preserved —
    nothing densifies at any scale.

    Plan shape: explode pairs → broadcast-or-shuffle join on
    feature_index → re-collect index-sorted arrays → join back on uid.
    """
    others = [c for c in df.columns if c not in (indices_col, values_col)]
    pairs = df.select(
        uid_col,
        F.explode(F.arrays_zip(F.col(indices_col), F.col(values_col))).alias(
            "__p"
        ),
    ).select(
        uid_col,
        F.col(f"__p.{indices_col}").alias("feature_index"),
        F.col(f"__p.{values_col}").cast("double").alias("x"),
    )
    scaled = pairs.join(norm, "feature_index", "left").select(
        uid_col,
        "feature_index",
        (F.col("x") * F.coalesce(F.col("factor"), F.lit(1.0))).alias("x"),
    )
    rebuilt = (
        scaled.groupBy(uid_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("feature_index", "x"))
            ).alias("__pairs")
        )
        .select(
            uid_col,
            F.col("__pairs.feature_index").alias(indices_col),
            F.col("__pairs.x").alias(values_col),
        )
    )
    # left join: rows with EMPTY feature arrays have no pairs to rebuild
    out = df.select(*others).join(rebuilt, uid_col, "left")
    empty_i = F.coalesce(
        F.col(indices_col), F.expr("CAST(array() AS array<bigint>)")
    )
    empty_v = F.coalesce(
        F.col(values_col), F.expr("CAST(array() AS array<double>)")
    )
    return out.withColumn(indices_col, empty_i).withColumn(values_col, empty_v)


def backmap_fixed_model(model, norm_rows: list) -> "object":
    """Original-space FixedEffectGLM from a fit on the factor-scaled
    sparse pairs (``apply_sparse_normalization``).

    ``norm_rows``: collected (feature_index, shift, factor) rows —
    O(dim), the same driver-side footprint as the model vector itself.
    β_j = β'_j·factor_j; the intercept carries over unchanged — in the
    scaled-only training space it already equals the original-space
    intercept (see ``apply_sparse_normalization``).
    """
    import numpy as np

    from photon_ml_spark.ml.glm import FixedEffectGLM

    coef = np.asarray(model.coefficients, dtype=float).copy()
    for r in norm_rows:
        j = int(r["feature_index"])
        if 0 <= j < len(coef):
            coef[j] = coef[j] * float(r["factor"])
    return FixedEffectGLM(
        family=model.family,
        coefficients=coef,
        intercept=float(model.intercept),
        dim=model.dim,
        reg_param=model.reg_param,
    )


def backmap_random_effects(
    models: DataFrame, norm: DataFrame
) -> DataFrame:
    """Original-space per-entity models from fits on the factor-scaled
    sparse pairs — the same algebra as ``backmap_fixed_model`` applied
    across the models TABLE (posexplode coefficients → join contexts on
    position → re-collect; intercepts carry over unchanged), so nothing
    is collected to the driver regardless of entity count."""
    others = [c for c in models.columns if c != "coefficients"]
    ex = models.select(
        *others,
        F.posexplode("coefficients").alias("feature_index", "__c"),
    ).join(norm, "feature_index", "left")
    scaled = ex.select(
        *others,
        "feature_index",
        (F.col("__c") * F.coalesce(F.col("factor"), F.lit(1.0))).alias("__c"),
    )
    return (
        scaled.groupBy(*others)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("feature_index", "__c"))
            ).alias("__pairs")
        )
        .select(
            *others,
            F.col("__pairs.__c").alias("coefficients"),
        )
    )
