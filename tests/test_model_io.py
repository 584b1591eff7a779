"""Model save/load round-trip (S9/P10) + scored sink (S8/T6)."""

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from photon_ml_spark.datamodel import FeatureShardConfig
from photon_ml_spark.ml.coordinate_descent import CoordinateConfig, train_game
from photon_ml_spark.sources import datasets, featurize, model_io


@pytest.fixture(scope="module")
def trained(spark, sf_dir):
    training = datasets.lineitem_training_frame(spark, sf_dir)
    dictionary = featurize.build_feature_dictionary(
        training, ["features"], has_intercept=True
    )
    shard = FeatureShardConfig("features", ["features"])
    assembled = featurize.assemble_shard(training, dictionary, shard).cache()
    coords = [
        CoordinateConfig(name="global", kind="fixed", dim=5),
        CoordinateConfig(
            name="per-supplier", kind="random", dim=5, entity_col="suppkey",
            reg_param=10.0, min_samples=5,
        ),
    ]
    model, _ = train_game(assembled, coords, family="binomial", n_iterations=1)
    return model, assembled, dictionary


def test_round_trip(spark, trained, tmp_path_factory):
    model, assembled, dictionary = trained
    path = str(tmp_path_factory.mktemp("game_model"))
    model_io.save_game_model(model, path, spark, dictionary=dictionary)
    assert os.path.exists(f"{path}/metadata.json")

    loaded = model_io.load_game_model(path, spark)
    assert set(loaded.coordinates) == set(model.coordinates)
    np.testing.assert_allclose(
        loaded.coordinates["global"].coefficients,
        model.coordinates["global"].coefficients,
        rtol=1e-12,
    )
    # scores from loaded model match original bit-for-bit
    a = model.score(assembled).select("uid", "score")
    b = loaded.score(assembled).select("uid", F.col("score").alias("score2"))
    d = (
        a.join(b, "uid")
        .agg(F.max(F.abs(F.col("score") - F.col("score2"))).alias("d"))
        .first()
        .d
    )
    assert d < 1e-12


def test_sparsification(spark, trained, tmp_path_factory):
    model, _, _ = trained
    path = str(tmp_path_factory.mktemp("sparse_model"))
    model_io.save_game_model(model, path, spark, sparsity_threshold=1e9)
    loaded = model_io.load_game_model(path, spark)
    assert np.all(loaded.coordinates["global"].coefficients == 0.0)


def test_save_scores_file_limit(spark, trained, tmp_path_factory):
    model, assembled, _ = trained
    path = str(tmp_path_factory.mktemp("scores")) + "/out"
    scored = model.score(assembled).select("uid", "score")
    model_io.save_scores(scored, path, output_files_limit=1)
    parts = glob.glob(f"{path}/part-*")
    assert len(parts) == 1
    assert spark.read.parquet(path).count() == assembled.count()


def test_legacy_glm_text_round_trip(spark, trained, tmp_path):
    """Legacy text model format (README "Models",
    IOUtils.scala writeModelsInText): name\tterm\tcoef\tlambda lines,
    coefficients sorted desc within each model's partition."""
    model, _, dictionary = trained
    fixed = model.coordinates["global"]
    path = str(tmp_path / "glm_text")
    model_io.save_glm_text(
        [(10.0, fixed), (1.0, fixed)], dictionary, path, spark
    )
    back = model_io.load_glm_text(spark, path)
    rows = back.collect()
    dim = len(fixed.coefficients)
    assert len(rows) == 2 * dim
    assert {r.reg_weight for r in rows} == {10.0, 1.0}
    by_lam = {}
    for r in rows:
        by_lam.setdefault(r.reg_weight, []).append(r.coefficient)
    for lam, coefs in by_lam.items():
        assert sorted(coefs, reverse=True) == sorted(
            (float(c) for c in fixed.coefficients), reverse=True
        )
    # per-model contiguity + desc sort survive in the raw text lines:
    # each λ's lines form one contiguous run, coefficient-desc within it
    for part in glob.glob(f"{path}/part-*"):
        with open(part) as fh:
            lam_coef = [
                (line.split("\t")[3], float(line.split("\t")[2]))
                for line in fh
                if line.strip()
            ]
        lams = [l for l, _ in lam_coef]
        runs = [l for i, l in enumerate(lams) if i == 0 or lams[i - 1] != l]
        assert len(runs) == len(set(runs))  # contiguous per λ
        for lam in set(lams):
            vals = [c for l, c in lam_coef if l == lam]
            assert vals == sorted(vals, reverse=True)
    # name/term split round-trips the dictionary's feature keys
    keys = {
        (r.name, r.term)
        for r in back.filter(F.col("reg_weight") == 10.0).collect()
    }
    assert len(keys) == dim


def test_save_scores_model_id_tag(spark, tmp_path):
    """model_id tags every scored row (GameScoringDriver modelId)."""
    from photon_ml_spark.sources.model_io import save_scores

    df = spark.range(10).selectExpr("id AS uid", "CAST(id AS DOUBLE) AS score")
    out = str(tmp_path / "scores")
    save_scores(df, out, model_id="m-2026-08-15")
    back = spark.read.parquet(out)
    assert back.filter("model_id = 'm-2026-08-15'").count() == 10
    # untagged path keeps the slim schema
    out2 = str(tmp_path / "scores2")
    save_scores(df, out2)
    assert "model_id" not in spark.read.parquet(out2).columns
