"""GAME model persistence (SURVEY §2.1 S9/S10, §2.2 P10).

Rebuilds photon-client/.../data/avro/ModelProcessingUtils.scala:77-265:
the reference writes one Avro coefficient dir per coordinate
(``fixed-effect/<name>/coefficients``, ``random-effect/<name>/…``) plus
``model-metadata.json``. Spark-first the layout is the same but tables
are parquet:

    <dir>/metadata.json
    <dir>/fixed-effect/<name>/coefficients/   (feature_index, feature_key?, coefficient)
    <dir>/random-effect/<name>/models/        (entity, coefficients, intercept, …)

Sparsification (P10): coefficients with |value| < threshold are
dropped at save (modelSparsityThreshold, GameTrainingDriver.scala:
166-169); load reconstitutes dense arrays with zeros.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


def _hadoop_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file through the JVM Hadoop FileSystem so
    metadata lands on the SAME filesystem as the coefficient tables
    (hdfs://, s3a://, file:// — whatever the path's scheme resolves to),
    never split across local disk and a remote store."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _hadoop_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def _hadoop_delete(spark: SparkSession, path: str) -> None:
    """Delete a path (no-op if absent) on whatever filesystem the
    scheme resolves to — used to clear stale format-marker files when a
    sink overwrites an artifact written in a different layout."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if fs.exists(p):
        fs.delete(p, True)


def _hadoop_read_text(spark: SparkSession, path: str) -> str:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    stream = fs.open(p)
    try:
        # py4j passes byte[] buffers by copy, so stream.read(buf) can't
        # fill a Python bytearray — drain JVM-side into a String instead
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()

from photon_ml_spark.ml.coordinate_descent import CoordinateConfig, GameModel
from photon_ml_spark.ml.glm import FixedEffectGLM


def save_game_model(
    model: GameModel,
    path: str,
    spark: SparkSession,
    sparsity_threshold: float = 0.0,
    dictionary: DataFrame | dict | None = None,
) -> None:
    """Persist; ``dictionary`` (feature_key, feature_index) adds
    human-readable keys to fixed-effect coefficient tables (the
    reference always writes name/term pairs). With per-coordinate
    feature shards (CoordinateDataConfiguration.featureShardId) pass a
    ``{coordinate_name: dictionary}`` map instead — each fixed table is
    labeled with ITS shard's vocabulary; coordinates absent from the
    map are written unlabeled."""
    meta = {"family": model.family, "coordinates": {}}
    for name, cfg in model.configs.items():
        m = model.coordinates[name]
        coord_dict = (
            dictionary.get(name)
            if isinstance(dictionary, dict)
            else dictionary
        )
        meta["coordinates"][name] = {
            "kind": cfg.kind,
            "dim": cfg.dim,
            "entity_col": cfg.entity_col,
            "indices_col": cfg.indices_col,
            "values_col": cfg.values_col,
            "reg_param": cfg.reg_param,
        }
        if cfg.kind == "fixed":
            meta["coordinates"][name]["intercept"] = float(m.intercept)
            tbl = m.as_table(spark)
            if sparsity_threshold > 0:
                tbl = tbl.filter(F.abs(F.col("coefficient")) >= sparsity_threshold)
            if coord_dict is not None:
                tbl = tbl.join(F.broadcast(coord_dict), "feature_index", "left")
            tbl.write.mode("overwrite").parquet(
                f"{path}/fixed-effect/{name}/coefficients"
            )
        else:
            out = m
            if sparsity_threshold > 0:
                # zero-out small entries but keep dense arrays (per-entity
                # vectors are already small post-P7)
                t = sparsity_threshold
                out = out.withColumn(
                    "coefficients",
                    F.transform(
                        "coefficients",
                        lambda c: F.when(F.abs(c) >= t, c).otherwise(F.lit(0.0)),
                    ),
                )
            out.write.mode("overwrite").parquet(f"{path}/random-effect/{name}/models")
    _hadoop_write_text(spark, f"{path}/metadata.json", json.dumps(meta, indent=2))


def load_game_model(path: str, spark: SparkSession) -> GameModel:
    meta = json.loads(_hadoop_read_text(spark, f"{path}/metadata.json"))
    model = GameModel(family=meta["family"])
    for name, c in meta["coordinates"].items():
        cfg = CoordinateConfig(
            name=name, kind=c["kind"], dim=c["dim"], entity_col=c["entity_col"],
            indices_col=c["indices_col"], values_col=c["values_col"],
            reg_param=c["reg_param"],
        )
        model.configs[name] = cfg
        if c["kind"] == "fixed":
            rows = (
                spark.read.parquet(f"{path}/fixed-effect/{name}/coefficients")
                .select("feature_index", "coefficient")
                .collect()
            )
            coef = np.zeros(c["dim"])
            for r in rows:
                coef[r.feature_index] = r.coefficient
            model.coordinates[name] = FixedEffectGLM(
                family=meta["family"], coefficients=coef,
                intercept=c["intercept"], dim=c["dim"], reg_param=c["reg_param"],
            )
        else:
            model.coordinates[name] = spark.read.parquet(
                f"{path}/random-effect/{name}/models"
            )
    return model


def save_scores(
    scored: DataFrame,
    path: str,
    output_files_limit: int | None = None,
    model_id: str | None = None,
) -> None:
    """S8 scored-output sink (GameScoringDriver.scala:229-256):
    optional coalesce to bound output file count (T6); ``model_id``
    tags every row (the driver's modelId param, :56 — scores from
    several models can share one downstream table)."""
    if model_id is not None:
        scored = scored.withColumn("model_id", F.lit(model_id))
    out = scored.coalesce(output_files_limit) if output_files_limit else scored
    out.write.mode("overwrite").parquet(path)


# --------------------------------------------------- legacy GLM text format


def save_glm_text(
    models,
    dictionary: DataFrame,
    path: str,
    spark: SparkSession,
) -> None:
    """Legacy Photon text model sink (README "Models"; writer
    IOUtils.scala:243-288 writeModelsInText): one line per coefficient,
    ``name\\tterm\\tcoefficient\\tregularization_weight``, coefficients
    sorted descending by value within each model, each model's lines
    CONTIGUOUS in its output file (partitioned on λ; when two λs hash
    into one shuffle partition the within-partition sort keys on
    (λ, coefficient desc), so models never interleave) — the GLMSuite
    regularization-sweep artifact.

    ``models`` is an iterable of (reg_weight, FixedEffectGLM);
    ``dictionary`` maps (feature_key, feature_index). Spark-first: the
    coefficient tables union into one relation, repartition on λ and
    sort within partitions — a distributed text sink, no driver loop
    over coefficients."""
    from photon_ml_spark.datamodel import FEATURE_KEY_SEP

    frames = []
    for lam, model in models:
        frames.append(
            model.as_table(spark).withColumn("reg_weight", F.lit(float(lam)))
        )
    tbl = frames[0]
    for f in frames[1:]:
        tbl = tbl.unionByName(f)
    parts = F.split(F.col("feature_key"), FEATURE_KEY_SEP)
    lines = (
        tbl.join(F.broadcast(dictionary), "feature_index")
        .select(
            "reg_weight",
            "coefficient",
            F.element_at(parts, 1).alias("name"),
            F.coalesce(F.element_at(parts, 2), F.lit("")).alias("term"),
        )
        .repartition("reg_weight")
        .sortWithinPartitions("reg_weight", F.desc("coefficient"))
        .select(
            F.concat_ws(
                "\t", "name", "term",
                F.col("coefficient").cast("string"),
                F.col("reg_weight").cast("string"),
            ).alias("value")
        )
    )
    lines.write.mode("overwrite").text(path)


def load_glm_text(spark: SparkSession, path: str) -> DataFrame:
    """Read a legacy text model dir back into a relation
    (name, term, coefficient, reg_weight)."""
    parts = F.split(F.col("value"), "\t")
    return spark.read.text(path).select(
        F.element_at(parts, 1).alias("name"),
        F.element_at(parts, 2).alias("term"),
        F.element_at(parts, 3).cast("double").alias("coefficient"),
        F.element_at(parts, 4).cast("double").alias("reg_weight"),
    )
