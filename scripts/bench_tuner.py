"""Tuner-seam overhead measurement (round-7 verdict Next #6): one
GP-tuner-driven train run over the sf0.1 GAME config — the
GameEstimatorEvaluationFunction-shaped loop (reference
GameTrainingDriver.scala:677-726: each tuner point = one full GAME fit
+ one validation-metric scan) — so the per-iteration cost of the tuner
seam is a measured BASELINE note, not a guess.

Prints one JSON line: total wall, n evaluations, s/evaluation, and the
fit-only A/B (the same single fit without the tuner) so the seam's
overhead beyond `n_points x fit` is visible.

    python scripts/bench_tuner.py            # sf0.1, 5 GP evaluations
    TUNER_ITERS=8 python scripts/bench_tuner.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".stress", "tuner"
)


def main() -> None:
    n_evals = int(os.environ.get("TUNER_ITERS", "5"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from photon_ml_spark import cli
    from photon_ml_spark.session import get_spark
    from photon_ml_spark.sources import datasets

    spark = get_spark(app_name="bench-tuner", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("WARN")

    shutil.rmtree(ROOT, ignore_errors=True)
    inp, va = os.path.join(ROOT, "train"), os.path.join(ROOT, "val")
    frame = datasets.lineitem_training_frame(
        spark, SRC, uid_strategy="monotonic", pre_repartition=32
    )
    is_val = F.pmod(F.xxhash64("uid"), F.lit(10)) == 0
    frame.filter(~is_val).write.parquet(inp)
    frame.filter(is_val).write.parquet(va)

    cfg = {
        "input": inp,
        "validation_input": va,
        "feature_bags": ["features"],
        "coordinates": [
            {"name": "global", "kind": "fixed"},
            {
                "name": "per_supplier", "kind": "random",
                "entity_col": "suppkey", "reg_param": 10.0,
            },
        ],
        "family": "binomial",
        "n_iterations": 1,
        "output_dir": os.path.join(ROOT, "model"),
    }

    import contextlib
    import io

    # A/B leg: one plain fit (no tuner) under the same config — the
    # per-fit denominator the seam's s/fit is judged against. Its
    # report line is swallowed so this script prints exactly one.
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(io.StringIO()):
        cli.train(dict(cfg), spark)
    fit_only = round(time.perf_counter() - t0, 2)
    shutil.rmtree(cfg["output_dir"], ignore_errors=True)

    cfg["tuner"] = {
        "kind": "gp",
        "bounds": {
            "global": [0.01, 100.0, "log"],
            "per_supplier": [0.1, 1000.0, "log"],
        },
        "n_init": 2,
    }
    cfg["tuner_iterations"] = n_evals

    buf = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(buf):
        cli.train(cfg, spark)
    wall = round(time.perf_counter() - t0, 2)
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    evals = rep["tuner"]["evaluations"]
    # GPTuner semantics: n = acquisition iterations ON TOP of n_init
    # space-filling seeds, so the evaluation count is n_init + n
    assert len(evals) == n_evals + 2, (len(evals), n_evals)

    print(
        json.dumps(
            {
                "metric": "tuner_train_sec",
                "value": wall,
                "unit": "sec",
                "n_evaluations": len(evals),
                # the winning point is refit once for the output
                # model, so the run contains n_evaluations + 1 fits
                "n_fits": len(evals) + 1,
                "sec_per_fit": round(wall / (len(evals) + 1), 2),
                "fit_only_sec": fit_only,
                "seam_overhead_sec": round(
                    wall - (len(evals) + 1) * fit_only, 2
                ),
                "best": rep["tuner"]["best"],
                "sf_dir": SRC,
            }
        )
    )


if __name__ == "__main__":
    main()
