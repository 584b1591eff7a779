"""Config-driven CLI drivers (the reference's spark-submit surface:
GameTrainingDriver.scala:908-931, GameScoringDriver.scala:263-270 —
scopt args become one JSON config here).

    python -m photon_ml_spark.cli train --config train.json
    python -m photon_ml_spark.cli score --config score.json

Train config:
    {"input": "<path>",                     # conventional-column frame
     "input_format": "parquet",             # or "avro" (TrainingExampleAvro)
     "feature_bags": ["features"],          # (name,term,value) array cols
     "shard": "features",
     "coordinates": [{"name": "global", "kind": "fixed"},
                     {"name": "per_user", "kind": "random",
                      "entity_col": "userId", "reg_param": 1.0,
                      "elastic_net_param": 0.0, "solver": "auto"}],
     "family": "binomial", "n_iterations": 2,
     "output_dir": "<model dir>", "sparsity_threshold": 0.0}

Score config:
    {"input": "...", "model_dir": "...", "output_dir": "...",
     "output_files_limit": 1}

The dictionary is persisted beside the model (S4) so scoring assembles
with the training vocabulary — unknown score-time features drop,
matching the reference's fixed-index-map behavior.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def _assembled(spark, cfg, dictionary=None):
    from photon_ml_spark.datamodel import FeatureShardConfig
    from photon_ml_spark.sources import featurize

    if cfg.get("input_format", "parquet") == "avro":
        from photon_ml_spark.sources.avro_io import read_training_examples

        df = read_training_examples(spark, cfg["input"])
    else:
        df = spark.read.parquet(cfg["input"])
    bags = cfg.get("feature_bags", ["features"])
    if dictionary is None:
        dictionary = featurize.build_feature_dictionary(
            df, bags, has_intercept=True
        ).cache()
    shard = FeatureShardConfig(cfg.get("shard", "features"), bags)
    n_keys = dictionary.count()
    strategy = "map" if n_keys <= 100_000 else "join"
    return (
        featurize.assemble_shard(df, dictionary, shard, strategy=strategy),
        dictionary,
        n_keys,
    )


def train(cfg: dict, spark: SparkSession) -> None:
    from photon_ml_spark.estimator import GameEstimator
    from photon_ml_spark.ml.coordinate_descent import CoordinateConfig
    from photon_ml_spark.sources.model_io import save_game_model

    assembled, dictionary, dim = _assembled(spark, cfg)
    shard = cfg.get("shard", "features")
    coords = [
        CoordinateConfig(
            name=c["name"],
            kind=c["kind"],
            dim=dim,
            indices_col=f"{shard}_indices",
            values_col=f"{shard}_values",
            entity_col=c.get("entity_col"),
            reg_param=c.get("reg_param", 0.0),
            min_samples=c.get("min_samples", 1),
            elastic_net_param=c.get("elastic_net_param", 0.0),
            solver=c.get("solver", "auto"),
        )
        for c in cfg["coordinates"]
    ]
    est = GameEstimator(
        coordinates=coords,
        family=cfg.get("family", "binomial"),
        n_iterations=cfg.get("n_iterations", 2),
    )
    fitted = est.fit(assembled.cache())
    out = cfg["output_dir"]
    save_game_model(
        fitted.model, out, spark,
        sparsity_threshold=cfg.get("sparsity_threshold", 0.0),
        dictionary=dictionary,
    )
    dictionary.write.mode("overwrite").parquet(f"{out}/feature-dictionary")
    print(json.dumps({"status": "trained", "model_dir": out, "dim": dim,
                      "updates": len(fitted.history)}))


def score(cfg: dict, spark: SparkSession) -> None:
    from photon_ml_spark.estimator import GameTransformer
    from photon_ml_spark.sources.model_io import load_game_model, save_scores

    dictionary = spark.read.parquet(f"{cfg['model_dir']}/feature-dictionary").cache()
    assembled, _, _ = _assembled(spark, cfg, dictionary=dictionary)
    model = load_game_model(cfg["model_dir"], spark)
    scored = GameTransformer(model=model).transform(assembled)
    save_scores(
        scored, cfg["output_dir"],
        output_files_limit=cfg.get("output_files_limit"),
    )
    print(json.dumps({"status": "scored", "output_dir": cfg["output_dir"]}))


def main(argv: list[str] | None = None) -> None:
    from photon_ml_spark.session import get_spark

    ap = argparse.ArgumentParser(prog="photon_ml_spark")
    ap.add_argument("command", choices=["train", "score"])
    ap.add_argument("--config", required=True)
    args = ap.parse_args(argv)
    with open(args.config) as f:
        cfg = json.load(f)
    spark = get_spark(app_name=f"photon-ml-spark-{args.command}")
    {"train": train, "score": score}[args.command](cfg, spark)


if __name__ == "__main__":
    main()
