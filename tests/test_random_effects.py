"""Random-effect (per-entity applyInPandas) training tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from photon_ml_spark.datamodel import FeatureShardConfig
from photon_ml_spark.ml import glm, random_effects, scoring
from photon_ml_spark.sources import datasets, featurize


@pytest.fixture(scope="module")
def assembled(spark, sf_dir):
    training = datasets.lineitem_training_frame(spark, sf_dir)
    dictionary = featurize.build_feature_dictionary(
        training, ["features"], has_intercept=True
    )
    shard = FeatureShardConfig("features", ["features"])
    out = featurize.assemble_shard(training, dictionary, shard).cache()
    out.count()
    return out


@pytest.fixture(scope="module")
def re_model(assembled):
    m = random_effects.fit_random_effects(
        assembled, entity_col="suppkey", dim=5, family="binomial",
        reg_param=1.0, min_samples=5,
    ).cache()
    m.count()
    return m


def test_model_per_entity(assembled, re_model, spark):
    n_entities = assembled.select("suppkey").distinct().count()
    rows = re_model.collect()
    assert len(rows) == n_entities  # all suppliers have >= 5 lines at sf0.001
    for r in rows[:5]:
        assert len(r.coefficients) == 5
        assert r.converged


def test_matches_single_entity_glr(spark, assembled):
    """Per-entity solve must agree with spark.ml GLR run on that
    entity's rows alone (same objective: binomial IRLS, L2=0)."""
    ent = assembled.groupBy("suppkey").count().orderBy(F.desc("count")).first()[0]
    sub = assembled.filter(F.col("suppkey") == ent)
    m_re = (
        random_effects.fit_random_effects(
            sub, entity_col="suppkey", dim=5, family="binomial", reg_param=0.0,
            tol=1e-10,
        )
        .first()
    )
    m_glr = glm.fit_fixed_effect(sub, dim=5, family="binomial", reg_param=0.0)
    assert np.allclose(m_re.coefficients, m_glr.coefficients, atol=2e-3)
    assert abs(m_re.intercept - m_glr.intercept) < 2e-3


def test_min_samples_drops(assembled):
    big = random_effects.fit_random_effects(
        assembled, entity_col="suppkey", dim=5, min_samples=10**9
    )
    assert big.count() == 0


def test_warm_start_prior(assembled, re_model):
    warm = random_effects.fit_random_effects(
        assembled, entity_col="suppkey", dim=5, family="binomial",
        reg_param=1.0, prior_model=re_model,
    )
    r = warm.orderBy("entity").first()
    assert r.n_iter <= 2  # warm start: already at optimum

    strong = re_model.select(
        "entity", "coefficients", "intercept",
        F.expr("transform(coefficients, c -> 1e-9d)").alias("variances"),
        F.lit(1e-9).alias("intercept_variance"),
    )
    pinned = random_effects.fit_random_effects(
        assembled, entity_col="suppkey", dim=5, family="binomial",
        reg_param=0.0, prior_model=strong,
    )
    j = (
        re_model.select("entity", F.col("coefficients").alias("c0"))
        .join(pinned.select("entity", F.col("coefficients").alias("c1")), "entity")
        .collect()
    )
    for r in j:
        assert np.allclose(r.c0, r.c1, atol=1e-3)  # tight prior pins coefficients


def test_prior_only_entities_copied_forward(assembled, re_model):
    """J3 copy semantics (RandomEffectCoordinate.scala:252): entities
    present only in the prior model must pass through untrained, not be
    silently dropped from the incremental-retrain output."""
    half = assembled.filter(F.col("suppkey") <= 5)
    kept = {r.entity for r in half.select(
        F.col("suppkey").cast("string").alias("entity")).distinct().collect()}
    out = random_effects.fit_random_effects(
        half, entity_col="suppkey", dim=5, family="binomial",
        reg_param=1.0, prior_model=re_model,
    ).cache()
    prior_rows = {r.entity: r for r in re_model.collect()}
    out_rows = {r.entity: r for r in out.collect()}
    # nothing lost: output covers every prior entity plus all data entities
    assert set(out_rows) == set(prior_rows) | kept
    copied = set(prior_rows) - kept
    assert copied, "test needs at least one prior-only entity"
    for e in copied:
        r = out_rows[e]
        assert r.n_samples == 0 and r.n_iter == 0
        assert np.allclose(r.coefficients, prior_rows[e].coefficients)
        assert r.intercept == pytest.approx(prior_rows[e].intercept)
    out.unpersist()


def test_score_random_effect(assembled, re_model):
    data = assembled.withColumnRenamed("suppkey", "entity")
    scored = scoring.score_random_effect(
        data, re_model.select("entity", "coefficients", "intercept"),
        entity_col="entity",
    ).cache()
    assert scored.count() == assembled.count()
    # a modeled entity scores nonzero somewhere; missing-model rows score 0
    stats = scored.agg(
        F.sum(F.when(F.col("score") != 0.0, 1).otherwise(0)).alias("nz")
    ).first()
    assert stats.nz > 0
    scored.unpersist()


def test_variance_output(assembled):
    m = random_effects.fit_random_effects(
        assembled, entity_col="suppkey", dim=5, compute_variance="full",
    )
    r = m.first()
    assert len(r.variances) == 5
    assert all(v > 0 for v in r.variances)


def test_subspace_projection_matches_full_solve(spark, sf_dir):
    """P7: per-entity subspace fit scatters back to identical
    coefficients (inactive dims are exactly 0 in both paths)."""
    import numpy as np
    from pyspark.sql import functions as F

    from photon_ml_spark.ml.random_effects import fit_random_effects

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_suppkey").cast("string").alias("entity"),
        # entity-dependent support: odd suppliers never see feature 2
        F.when(
            F.col("l_suppkey") % 2 == 0,
            F.array(F.lit(0).cast("long"), F.lit(2).cast("long")),
        ).otherwise(F.array(F.lit(0).cast("long"), F.lit(1).cast("long")))
        .alias("features_indices"),
        F.array(
            (F.col("l_quantity") / 25.0).cast("double"),
            (F.col("l_discount") * 10.0).cast("double"),
        ).alias("features_values"),
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("response"),
    )
    kw = dict(
        entity_col="entity", dim=4, family="binomial",
        weight_col=None, offset_col=None, reg_param=0.5,
    )
    full = {r.entity: (r.coefficients, r.intercept)
            for r in fit_random_effects(li, **kw).collect()}
    proj = {r.entity: (r.coefficients, r.intercept)
            for r in fit_random_effects(li, project_subspace=True, **kw).collect()}
    assert full.keys() == proj.keys()
    for e in full:
        assert np.allclose(full[e][0], proj[e][0], atol=1e-6), e
        assert abs(full[e][1] - proj[e][1]) < 1e-6
        # dim 3 never active anywhere -> exactly zero
        assert proj[e][0][3] == 0.0


def test_skewed_entity_capped_before_fit(spark, sf_dir):
    """The 100 TB skew discipline: one entity 50x heavier than the rest
    is bounded by the T2 reservoir cap BEFORE the per-entity solve, so
    no applyInPandas group exceeds the cap (the reference's
    one-entity-fits-one-partition invariant, RandomEffectDataset.scala:
    38-45) — and the capped fit still produces a usable model with
    rescaled weights compensating the sample loss."""
    from pyspark.sql import functions as F

    from photon_ml_spark.ml.random_effects import fit_random_effects
    from photon_ml_spark.operators.sampling import per_entity_cap

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # entity '0' absorbs half the table -> heavy key; others stay small
    skewed = li.select(
        F.when(F.col("l_orderkey") % 2 == 0, "hot")
        .otherwise(F.col("l_suppkey").cast("string")).alias("entity"),
        (F.col("l_orderkey") * 100 + F.col("l_linenumber")).alias("uid"),
        F.array(F.lit(0).cast("long")).alias("features_indices"),
        F.array((F.col("l_quantity") / 25.0).cast("double")).alias("features_values"),
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("response"),
        F.lit(1.0).alias("weight"),
    )
    cap = 150
    capped = per_entity_cap(
        skewed, entity_col="entity", cap=cap, weight_col="weight",
        order_cols=["uid"],
    )
    sizes = capped.groupBy("entity").count()
    assert sizes.agg(F.max("count")).first()[0] <= cap
    # weight rescale preserves each entity's total weight
    hot_w = capped.filter(F.col("entity") == "hot").agg(F.sum("weight")).first()[0]
    hot_n = skewed.filter(F.col("entity") == "hot").count()
    assert abs(hot_w - hot_n) / hot_n < 1e-9

    models = fit_random_effects(
        capped, entity_col="entity", dim=1, family="binomial",
        weight_col="weight", offset_col=None, reg_param=1.0,
    )
    rows = {r.entity: r for r in models.collect()}
    assert rows["hot"].n_samples == cap
    assert rows["hot"].converged
