"""Coefficient variances across the REFERENCE-layout model wire (M9/M10
interop): the reference persists ``Coefficients.variancesOption`` into
``BayesianLinearModelAvro.variances`` (ModelProcessingUtils.scala:77-130;
AvroUtils.scala:326-355) and its incremental learning consumes exactly
those (PriorDistribution.scala:23-120). These tests pin that the engine's
export writes them, the import reads them, and a retrain-with-prior from
an imported model uses precision 1/σ² instead of the warm-start-only
fallback."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from photon_ml_spark.datamodel import FEATURE_KEY_SEP as S
from photon_ml_spark.datamodel import INTERCEPT_KEY
from photon_ml_spark.ml.coordinate_descent import CoordinateConfig, GameModel
from photon_ml_spark.ml.glm import FixedEffectGLM
from photon_ml_spark.sources.model_io import (
    load_photon_game_model,
    save_photon_game_model,
)


def _fixed_model(spark):
    d = spark.createDataFrame(
        [(f"f{S}t{i}", i) for i in range(4)],
        "feature_key string, feature_index long",
    )
    model = GameModel(family="gaussian")
    model.configs["global"] = CoordinateConfig(
        name="global", kind="fixed", dim=4,
        indices_col="s1_indices", values_col="s1_values",
    )
    model.coordinates["global"] = FixedEffectGLM(
        family="gaussian",
        coefficients=np.array([0.5, 1.5, -1.25, 2.0]),
        intercept=3.5, dim=4,
    )
    return model, d


def test_fixed_variance_export_import_roundtrip(spark, tmp_path):
    """Export with a key-form variance table (incl. an intercept row
    with NULL index — the imported-dictionary shape) → the Avro record
    carries the variances array → load restores the table by key →
    re-export from the loaded model keeps them (the model.variances
    fallback path)."""
    from photon_ml_spark.sources.avro_io import (
        BAYESIAN_LINEAR_MODEL_SCHEMA,
        read_avro,
    )

    model, d = _fixed_model(spark)
    vt = spark.createDataFrame(
        [(f"f{S}t0", 0, 0.04), (f"f{S}t2", 2, 0.25), (INTERCEPT_KEY, None, 1.0)],
        "feature_key string, feature_index long, variance double",
    )
    out = str(tmp_path / "exported")
    save_photon_game_model(
        model, {"s1": d}, out, spark, variance_tables={"global": vt}
    )

    # raw wire record: variances is a NameTermValueAvro array, same
    # keying as the means, intercept as ("(INTERCEPT)", "")
    (rec,) = read_avro(
        spark,
        f"{out}/fixed-effect/global/coefficients",
        avro_schema=BAYESIAN_LINEAR_MODEL_SCHEMA,
    ).collect()
    assert rec.variances is not None
    wire = {(v.name, v.term): v.value for v in rec.variances}
    assert wire == {
        ("f", "t0"): pytest.approx(0.04),
        ("f", "t2"): pytest.approx(0.25),
        ("(INTERCEPT)", ""): pytest.approx(1.0),
    }

    back, dicts = load_photon_game_model(spark, out, family="gaussian")
    assert "global" in back.variances
    got = {
        r.feature_key: (r.feature_index, r.variance)
        for r in back.variances["global"].collect()
    }
    assert got[INTERCEPT_KEY][0] is None  # no intercept slot in the dict
    assert got[INTERCEPT_KEY][1] == pytest.approx(1.0)
    assert got[f"f{S}t0"][1] == pytest.approx(0.04)
    assert got[f"f{S}t2"][1] == pytest.approx(0.25)
    # indices resolved against the LOADED dictionary
    idx = {r.feature_key: r.feature_index for r in dicts["s1"].collect()}
    assert got[f"f{S}t0"][0] == idx[f"f{S}t0"]

    # re-export the loaded model: variances keep riding the wire
    out2 = str(tmp_path / "exported2")
    save_photon_game_model(back, dicts, out2, spark)
    (rec2,) = read_avro(
        spark,
        f"{out2}/fixed-effect/global/coefficients",
        avro_schema=BAYESIAN_LINEAR_MODEL_SCHEMA,
    ).collect()
    wire2 = {(v.name, v.term): v.value for v in rec2.variances}
    assert wire2 == wire


def test_fixed_variance_index_form_uses_dictionary(spark, tmp_path):
    """A bare (feature_index, variance) table — the shape a variance-
    computing train run produces in memory — resolves (name, term)
    through the dictionary."""
    from photon_ml_spark.sources.avro_io import (
        BAYESIAN_LINEAR_MODEL_SCHEMA,
        read_avro,
    )

    model, d = _fixed_model(spark)
    vt = spark.createDataFrame(
        [(1, 0.5), (3, 0.125), (2, 0.0)],  # zero filtered like the means
        "feature_index long, variance double",
    )
    out = str(tmp_path / "exported")
    save_photon_game_model(
        model, {"s1": d}, out, spark, variance_tables={"global": vt}
    )
    (rec,) = read_avro(
        spark,
        f"{out}/fixed-effect/global/coefficients",
        avro_schema=BAYESIAN_LINEAR_MODEL_SCHEMA,
    ).collect()
    wire = {(v.name, v.term): v.value for v in rec.variances}
    assert wire == {
        ("f", "t1"): pytest.approx(0.5),
        ("f", "t3"): pytest.approx(0.125),
    }


def test_random_effect_variances_roundtrip(spark, tmp_path):
    """Per-entity σ² (variances + intercept_variance columns on the
    model table) survive export→import; an entity whose record carries
    none comes back null, not all-zero (zero variance would read as
    infinite prior precision)."""
    d = spark.createDataFrame(
        [(f"f{S}t{i}", i) for i in range(3)],
        "feature_key string, feature_index long",
    )
    model = GameModel(family="gaussian")
    model.configs["per_e"] = CoordinateConfig(
        name="per_e", kind="random", dim=3, entity_col="eid",
        indices_col="s1_indices", values_col="s1_values",
    )
    model.coordinates["per_e"] = spark.createDataFrame(
        [
            ("e1", [1.0, 0.5, -2.0], 0.25, [0.04, 0.09, 0.16], 0.01),
            ("e2", [0.0, 0.5, 0.0], -1.0, None, None),
        ],
        "entity string, coefficients array<double>, intercept double, "
        "variances array<double>, intercept_variance double",
    )
    out = str(tmp_path / "re_exported")
    save_photon_game_model(model, {"s1": d}, out, spark)

    back, dicts = load_photon_game_model(spark, out, family="gaussian")
    re = {r.entity: r for r in back.coordinates["per_e"].collect()}
    assert "variances" in back.coordinates["per_e"].columns
    idx = {r.feature_key: r.feature_index for r in dicts["s1"].collect()}
    v1 = re["e1"].variances
    assert v1 is not None
    assert v1[idx[f"f{S}t0"]] == pytest.approx(0.04)
    assert v1[idx[f"f{S}t1"]] == pytest.approx(0.09)
    assert v1[idx[f"f{S}t2"]] == pytest.approx(0.16)
    assert re["e1"].intercept_variance == pytest.approx(0.01)
    assert re["e2"].variances is None
    assert re["e2"].intercept_variance is None


def test_incremental_prior_from_imported_model(spark, tmp_path, capsys):
    """The verdict's end-to-end loop: train (variance_computation) →
    export-model → import-model → retrain with incremental_training
    from the IMPORT. The imported σ² must feed the Gaussian prior
    (precision 1/σ²): on a drifted second batch, the retrain stays
    measurably closer to the prior model than the same retrain from a
    variances-stripped copy (the warm-start-only fallback)."""
    import json
    import shutil

    from photon_ml_spark import cli
    from photon_ml_spark.sources import datasets

    training = datasets.lineitem_training_frame(
        spark, "/root/testdata/sf0.001"
    )
    batch1 = training.filter(F.col("uid") % 5 != 0)
    batch2 = training.filter(F.col("uid") % 97 == 0).withColumn(
        "response", 1.0 - F.col("response")
    )
    in1, in2 = str(tmp_path / "b1.parquet"), str(tmp_path / "b2.parquet")
    batch1.write.parquet(in1)
    batch2.write.parquet(in2)

    coords = [{"name": "global", "kind": "fixed", "reg_param": 1e-3}]
    run1 = str(tmp_path / "run1")
    cli.train(
        {
            "input": in1,
            "feature_bags": ["features"],
            "coordinates": coords,
            "family": "binomial",
            "n_iterations": 1,
            "output_dir": run1,
            "variance_computation": "simple",
        },
        spark,
    )
    exported = str(tmp_path / "exported")
    cli.export_model({"model_dir": run1, "output_dir": exported}, spark)
    imported = str(tmp_path / "imported")
    cli.import_model({"model_dir": exported, "output_dir": imported}, spark)
    capsys.readouterr()

    # the import restored the native variance table, keyed, with the
    # intercept row (NULL index — the imported dictionary has no
    # intercept slot)
    vt = spark.read.parquet(f"{imported}/fixed-effect/global/variances")
    vrows = {r.feature_key: r for r in vt.collect()}
    assert INTERCEPT_KEY in vrows
    assert vrows[INTERCEPT_KEY].feature_index is None
    assert all(r.variance > 0 for r in vrows.values())

    # stripped copy: same model + dictionary, no σ² → warm-start-only
    stripped = str(tmp_path / "stripped")
    shutil.copytree(imported, stripped)
    shutil.rmtree(f"{stripped}/fixed-effect/global/variances")

    def retrain(model_dir, out):
        cli.train(
            {
                "input": in2,
                "feature_bags": ["features"],
                "coordinates": coords,
                "family": "binomial",
                "n_iterations": 1,
                "output_dir": out,
                "incremental_training": {"model_dir": model_dir},
            },
            spark,
        )
        capsys.readouterr()
        rows = spark.read.parquet(
            f"{out}/fixed-effect/{coords[0]['name']}/coefficients"
        ).collect()
        return {r.feature_key: float(r.coefficient) for r in rows}

    with_prior = retrain(imported, str(tmp_path / "ret_prior"))
    warm_only = retrain(stripped, str(tmp_path / "ret_warm"))

    prior_rows = spark.read.parquet(
        f"{imported}/fixed-effect/global/coefficients"
    ).collect()
    prior = {r.feature_key: float(r.coefficient) for r in prior_rows}

    keys = sorted(prior)
    d_prior = np.array([with_prior.get(k, 0.0) - prior[k] for k in keys])
    d_warm = np.array([warm_only.get(k, 0.0) - prior[k] for k in keys])
    # the σ² prior pins the retrain near the previous model; the
    # warm-start-only fit drifts on the flipped labels
    assert np.linalg.norm(d_prior) < 0.5 * np.linalg.norm(d_warm)


def test_random_variances_from_train_roundtrip(spark, tmp_path, capsys):
    """variance_computation now reaches RANDOM coordinates (the
    reference threads varianceComputationType into every per-entity
    problem — RandomEffectOptimizationProblem.scala:133-189): the
    trained model table carries per-entity σ², the reference-layout
    export puts them on the wire, and import restores them
    value-for-value."""
    from photon_ml_spark import cli
    from photon_ml_spark.sources import datasets

    training = datasets.lineitem_training_frame(
        spark, "/root/testdata/sf0.001"
    )
    inp = str(tmp_path / "b.parquet")
    training.filter(F.col("suppkey") < 6).write.parquet(inp)

    run1 = str(tmp_path / "run1")
    cli.train(
        {
            "input": inp,
            "feature_bags": ["features"],
            "coordinates": [
                {"name": "global", "kind": "fixed", "reg_param": 1e-3},
                {"name": "per_supplier", "kind": "random",
                 "entity_col": "suppkey", "reg_param": 5.0},
            ],
            "family": "binomial",
            "n_iterations": 1,
            "output_dir": run1,
            "variance_computation": "simple",
        },
        spark,
    )
    capsys.readouterr()
    models = spark.read.parquet(f"{run1}/random-effect/per_supplier/models")
    assert "variances" in models.columns
    assert "intercept_variance" in models.columns
    trained = models.filter(F.col("n_samples") > 0).collect()
    assert trained
    for r in trained:
        assert r.intercept_variance > 0
        assert all(v >= 0 for v in r.variances)

    exported = str(tmp_path / "exported")
    cli.export_model({"model_dir": run1, "output_dir": exported}, spark)
    imported = str(tmp_path / "imported")
    cli.import_model({"model_dir": exported, "output_dir": imported}, spark)
    capsys.readouterr()

    back = spark.read.parquet(
        f"{imported}/random-effect/per_supplier/models"
    )
    assert "variances" in back.columns

    def sig(rows, drop_last=False):
        # entity → (intercept_variance, sorted nonzero σ²) — index
        # spaces differ between the runs, values don't. drop_last
        # removes the TRAIN dictionary's intercept slot (final index):
        # the per-entity local fit leaves that never-observed column
        # with junk σ² = 1/l2, which the wire intentionally omits (the
        # dedicated intercept_variance entry owns the intercept key).
        return {
            r.entity: (
                round(float(r.intercept_variance), 12),
                tuple(sorted(
                    round(float(v), 12)
                    for v in (r.variances[:-1] if drop_last else r.variances)
                    if v != 0.0
                )),
            )
            for r in rows
            if r.variances is not None
        }
    a = sig(trained, drop_last=True)
    b = sig(back.collect())
    for ent, v in a.items():
        assert b.get(ent) == v, (ent, v, b.get(ent))
