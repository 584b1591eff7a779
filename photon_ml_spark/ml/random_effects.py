"""Random-effect (per-entity) GLM training (SURVEY §2.10 M2, §2.2 P7-P9).

The reference co-partitions data by entity and runs thousands-to-
millions of independent local solves inside executors
(RandomEffectCoordinate.scala:234-300, SingleNodeOptimizationProblem).
Spark-first that is exactly ``groupBy(entity).applyInPandas`` — one
Arrow batch per entity, numpy Newton per group, a model DataFrame out.

Scale design:
- The T2 per-entity cap (operators/sampling.py) bounds the largest
  group BEFORE this operator — the reference's hard assumption that
  one entity's data fits one partition (RandomEffectDataset.scala:38-45).
- AQE skew-join handling + hash partitioning on the entity column
  replace the reference's hand-built bin-packing partitioner
  (RandomEffectDatasetPartitioner.scala:98-170).
- The model is a DataFrame (entity, coefficients, intercept, …), never
  a driver-side map: joins do the scoring (ml/scoring.py
  score_random_effect).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MODEL_SCHEMA = (
    "entity string, coefficients array<double>, intercept double, "
    "n_samples long, n_iter long, converged boolean"
)
MODEL_SCHEMA_VAR = MODEL_SCHEMA + ", variances array<double>, intercept_variance double"


def classify_warm_start(
    data: DataFrame,
    prior_models: DataFrame,
    entity_col: str = "entity",
    model_entity_col: str = "entity",
) -> DataFrame:
    """J3's train|copy|new split: FULL OUTER join data entities with
    prior-model entities (RandomEffectCoordinate.scala:243-292,
    fullOuterJoin at :252).

    Returns (entity, status) with status ∈ {train_warm (data+prior),
    train_cold (data only), copy (prior only — model carried forward
    untrained)}.
    """
    d = (
        data.select(F.col(entity_col).cast("string").alias("entity"))
        .distinct()
        .withColumn("__has_data", F.lit(1))
    )
    m = (
        prior_models.select(F.col(model_entity_col).cast("string").alias("entity"))
        .distinct()
        .withColumn("__has_model", F.lit(1))
    )
    return d.join(m, "entity", "full_outer").select(
        "entity",
        F.when(
            F.col("__has_data").isNotNull() & F.col("__has_model").isNotNull(),
            F.lit("train_warm"),
        )
        .when(F.col("__has_data").isNotNull(), F.lit("train_cold"))
        .otherwise(F.lit("copy"))
        .alias("status"),
    )


def fit_random_effects(
    df: DataFrame,
    entity_col: str,
    dim: int,
    family: str = "binomial",
    indices_col: str = "features_indices",
    values_col: str = "features_values",
    label_col: str = "response",
    weight_col: str | None = "weight",
    offset_col: str | None = "offset",
    reg_param: float = 1.0,
    max_iter: int = 50,
    tol: float = 1e-8,
    min_samples: int = 1,
    prior_model: DataFrame | None = None,
    compute_variance: str | None = None,
    project_subspace: bool = False,
    lower_bounds=None,
    upper_bounds=None,
) -> DataFrame:
    """Fit one GLM per entity; returns a model DataFrame.

    ``prior_model`` (entity, coefficients, intercept[, variances,
    intercept_variance]) enables warm start (M7) and, when variances
    are present, the Gaussian-prior incremental penalty (M9). Full J3
    train|copy|new semantics (fullOuterJoin at
    RandomEffectCoordinate.scala:252): entities with data are (re)fit
    warm or cold; entities present only in the prior model are carried
    forward untrained as "copy" rows (n_samples=0, n_iter=0) via an
    anti-join union — incremental retraining never loses a model;
    entities below ``min_samples`` without a prior are dropped (P9).

    ``project_subspace`` is P7 (RandomEffectDataset.scala:390-426,
    LinearSubspaceProjector.scala:37-66): each entity solves in the
    subspace of its OWN active feature indices (∪ prior support) and
    scatters coefficients back to the full ``dim``. The design matrix
    shrinks from (n, dim) to (n, |active|) — essential when the global
    feature space is wide but per-entity support is narrow.
    """
    from photon_ml_spark.ml.local_glm import fit_local_glm

    cols = [
        F.col(entity_col).cast("string").alias("__entity"),
        F.col(indices_col).alias("__idx"),
        F.col(values_col).alias("__val"),
        F.col(label_col).cast("double").alias("__y"),
        (F.col(weight_col).cast("double") if weight_col else F.lit(1.0)).alias("__w"),
        (F.col(offset_col).cast("double") if offset_col else F.lit(0.0)).alias("__o"),
    ]
    data = df.select(*cols)
    has_prior = prior_model is not None
    if has_prior:
        prior_has_var = "variances" in prior_model.columns
        pm = prior_model.select(
            F.col("entity").alias("__entity"),
            F.col("coefficients").alias("__prior_coef"),
            F.col("intercept").alias("__prior_int"),
            *(
                [
                    F.col("variances").alias("__prior_var"),
                    F.col("intercept_variance").alias("__prior_int_var"),
                ]
                if prior_has_var
                else []
            ),
        )
        data = data.join(pm, "__entity", "left")
    else:
        prior_has_var = False

    schema = MODEL_SCHEMA_VAR if compute_variance else MODEL_SCHEMA
    rp, fam, mi, tl, cv = reg_param, family, max_iter, tol, compute_variance
    d, ms = dim, min_samples

    out_cols = ["entity", "coefficients", "intercept", "n_samples", "n_iter", "converged"]
    if compute_variance:
        out_cols += ["variances", "intercept_variance"]

    proj = project_subspace

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < ms and (not has_prior or pdf["__prior_coef"].iloc[0] is None):
            # dropped entity (P9); object dtype so Arrow accepts empty lists
            return pd.DataFrame({c: pd.Series([], dtype=object) for c in out_cols})

        x0 = None
        prior_mean = None
        prior_prec = None
        prior_coef = None
        if has_prior and pdf["__prior_coef"].iloc[0] is not None:
            prior_coef = np.asarray(pdf["__prior_coef"].iloc[0], dtype=np.float64)

        if proj:
            # P7: active-index union (∪ prior support) → dense subspace
            active = set()
            for idx in pdf["__idx"]:
                if idx is not None:
                    active.update(int(i) for i in idx)
            if prior_coef is not None:
                active.update(np.nonzero(prior_coef)[0].tolist())
            cols_map = {g: l for l, g in enumerate(sorted(active))}
            local_d = len(cols_map)
            X = np.zeros((n, local_d))
            for r, (idx, val) in enumerate(zip(pdf["__idx"], pdf["__val"])):
                if idx is not None and len(idx):
                    for i, v in zip(idx, val):
                        X[r, cols_map[int(i)]] = v
        else:
            cols_map = None
            local_d = d
            X = np.zeros((n, d))
            for r, (idx, val) in enumerate(zip(pdf["__idx"], pdf["__val"])):
                if idx is not None and len(idx):
                    X[r, np.asarray(idx, dtype=np.int64)] = np.asarray(val)

        if prior_coef is not None:
            pc = prior_coef
            if proj:
                pc = np.zeros(local_d)
                for g, l in cols_map.items():
                    if g < len(prior_coef):
                        pc[l] = prior_coef[g]
            pi = float(pdf["__prior_int"].iloc[0])
            x0 = np.concatenate([pc, [pi]])
            if prior_has_var and pdf["__prior_var"].iloc[0] is not None:
                pv = np.asarray(pdf["__prior_var"].iloc[0], dtype=np.float64)
                if proj:
                    pvp = np.full(local_d, np.inf)
                    for g, l in cols_map.items():
                        if g < len(pv):
                            pvp[l] = pv[g]
                    pv = pvp
                piv = float(pdf["__prior_int_var"].iloc[0])
                prior_mean = x0.copy()
                prior_prec = 1.0 / np.clip(np.concatenate([pv, [piv]]), 1e-12, None)
        res = fit_local_glm(
            X,
            pdf["__y"].to_numpy(),
            weight=pdf["__w"].to_numpy(),
            offset=pdf["__o"].to_numpy(),
            family=fam,
            l2=rp,
            x0=x0,
            prior_mean=prior_mean,
            prior_precision=prior_prec,
            max_iter=mi,
            tol=tl,
            compute_variance=cv,
            lower_bounds=(
                None if lower_bounds is None
                else (np.asarray(lower_bounds)[sorted(cols_map)] if proj
                      else lower_bounds)
            ),
            upper_bounds=(
                None if upper_bounds is None
                else (np.asarray(upper_bounds)[sorted(cols_map)] if proj
                      else upper_bounds)
            ),
        )
        coef = res["coefficients"]
        variances = res.get("variances")
        if proj:
            full = np.zeros(d)
            for g, l in cols_map.items():
                full[g] = coef[l]
            coef = full
            if variances is not None:
                fullv = np.zeros(d)
                for g, l in cols_map.items():
                    fullv[g] = variances[l]
                variances = fullv
        out = {
            "entity": [pdf["__entity"].iloc[0]],
            "coefficients": [coef.tolist()],
            "intercept": [res["intercept"]],
            "n_samples": [n],
            "n_iter": [res["n_iter"]],
            "converged": [res["converged"]],
        }
        if cv:
            out["variances"] = [variances.tolist()]
            out["intercept_variance"] = [res["intercept_variance"]]
        return pd.DataFrame(out)

    fitted = data.groupBy("__entity").applyInPandas(solve, schema=schema)
    if not has_prior:
        return fitted

    # J3 "copy": prior-model entities with no training data pass through
    # untrained (RandomEffectCoordinate.scala:252 fullOuterJoin). One
    # anti-join on entity against the distinct data entities — partial-
    # aggregated distinct, no extra pass over the model side.
    copy_cols = [
        F.col("entity").cast("string").alias("entity"),
        F.col("coefficients"),
        F.col("intercept").cast("double").alias("intercept"),
        F.lit(0).cast("long").alias("n_samples"),
        F.lit(0).cast("long").alias("n_iter"),
        F.lit(True).alias("converged"),
    ]
    if compute_variance:
        copy_cols += [
            (
                F.col("variances") if prior_has_var
                else F.lit(None).cast("array<double>")
            ).alias("variances"),
            (
                F.col("intercept_variance").cast("double") if prior_has_var
                else F.lit(None).cast("double")
            ).alias("intercept_variance"),
        ]
    copied = prior_model.join(
        df.select(F.col(entity_col).cast("string").alias("entity")).distinct(),
        "entity",
        "left_anti",
    ).select(*copy_cols)
    return fitted.unionByName(copied)
