"""Training lifecycle events + pluggable tuner seam (reference
photon-client event/ package and photon-api hyperparameter/tuner/
HyperparameterTuner.scala): listener ordering, failure isolation,
close-on-clear, estimator emission, and tuner-driven selection in
cli.train."""

import json

import pytest
from pyspark.sql import functions as F

from photon_ml_spark import cli, events
from photon_ml_spark.events import CollectingListener


def test_emitter_dispatch_isolation_and_close():
    class Boom(events.EventListener):
        def __init__(self):
            self.closed = False

        def handle(self, event):
            raise RuntimeError("observer bug")

        def close(self):
            self.closed = True
            raise RuntimeError("close bug")

    em = events.EventEmitter()
    good, bad = CollectingListener(), Boom()
    em.register_listener(bad)
    em.register_listener(good)
    ev = events.TrainingStartEvent(time=1.0)
    em.send_event(ev)  # bad listener's exception must not block good
    assert good.events == [ev]
    em.clear_listeners()  # close errors swallowed, both closed/cleared
    assert bad.closed and good.closed
    em.send_event(events.TrainingFinishEvent(time=2.0))
    assert good.events == [ev]  # cleared — no further delivery


def test_estimator_emits_ordered_training_events(spark):
    from photon_ml_spark.estimator import GameEstimator
    from photon_ml_spark.ml.coordinate_descent import CoordinateConfig
    from photon_ml_spark.sources import datasets, featurize
    from photon_ml_spark.datamodel import FeatureShardConfig

    frame = datasets.lineitem_training_frame(spark, "/root/testdata/sf0.001")
    dictionary = featurize.build_feature_dictionary(frame, ["features"])
    assembled = featurize.assemble_shard(
        frame, dictionary, FeatureShardConfig("features", ["features"]),
        strategy="map",
    )
    dim = dictionary.count()
    est = GameEstimator(
        coordinates=[
            CoordinateConfig(
                name="global", kind="fixed", dim=dim,
                indices_col="features_indices", values_col="features_values",
            )
        ],
        family="binomial", n_iterations=2,
    )
    li = CollectingListener()
    est.register_listener(li)
    est.fit(assembled)
    kinds = [type(e).__name__ for e in li.events]
    assert kinds[0] == "TrainingStartEvent"
    assert kinds[-1] == "TrainingFinishEvent"
    updates = [
        e for e in li.events if isinstance(e, events.CoordinateUpdateEvent)
    ]
    assert [(u.iteration, u.coordinate) for u in updates] == [
        (1, "global"), (2, "global"),
    ]


def test_cli_train_with_injected_tuner(spark, tmp_path, capsys):
    """A custom HyperparameterTuner injected into cli.train drives
    model selection (the factory-built config path uses the same
    seam)."""
    from photon_ml_spark.ml.hypersearch import HyperparameterTuner
    from photon_ml_spark.sources import datasets

    training = datasets.lineitem_training_frame(spark, "/root/testdata/sf0.001")
    inp = str(tmp_path / "tuner_in.parquet")
    va = str(tmp_path / "tuner_va.parquet")
    training.filter(F.col("uid") % 3 != 0).write.parquet(inp)
    training.filter(F.col("uid") % 3 == 0).write.parquet(va)

    class TwoPointTuner(HyperparameterTuner):
        def search(self, evaluate, n, maximize=False):
            history = [
                (p, evaluate(p))
                for p in ({"global": 0.01}, {"global": 1000.0})
            ]
            pick = max if maximize else min
            best = pick(history, key=lambda h: h[1])
            return {
                "best_params": best[0], "best_value": best[1],
                "history": history,
            }

    out = str(tmp_path / "tuned_model")
    li = CollectingListener()
    cli.train(
        {
            "input": inp,
            "validation_input": va,
            "feature_bags": ["features"],
            "coordinates": [{"name": "global", "kind": "fixed"}],
            "family": "binomial",
            "n_iterations": 1,
            "output_dir": out,
        },
        spark,
        listeners=[li],
        tuner=TwoPointTuner(),
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    evals = rep["tuner"]["evaluations"]
    assert [e["config"] for e in evals] == [
        {"global": 0.01}, {"global": 1000.0},
    ]
    assert rep["tuner"]["best"]["metric"] == max(e["metric"] for e in evals)
    # the event stream saw setup, two optimization logs, the selection
    kinds = [type(e).__name__ for e in li.events]
    assert kinds[0] == "SetupEvent"
    logs = [e for e in li.events if isinstance(e, events.OptimizationLogEvent)]
    assert [l.reg_weights for l in logs] == [
        {"global": 0.01}, {"global": 1000.0},
    ]
    sel = [e for e in li.events if isinstance(e, events.ModelSelectionEvent)]
    assert len(sel) == 1 and sel[0].metric == rep["tuner"]["best"]["metric"]

    # sweep + tuner together is ambiguous — refused
    with pytest.raises(ValueError, match="not both"):
        cli.train(
            {
                "input": inp,
                "validation_input": va,
                "feature_bags": ["features"],
                "coordinates": [{"name": "global", "kind": "fixed"}],
                "output_dir": out,
                "reg_param_sweep": [{"global": 0.1}],
            },
            spark,
            tuner=TwoPointTuner(),
        )


def test_make_tuner_factory():
    from photon_ml_spark.ml import hypersearch as hs

    assert isinstance(
        hs.make_tuner({"kind": "grid", "grid": {"a": [1, 2]}}), hs.GridTuner
    )
    assert isinstance(
        hs.make_tuner({"kind": "sobol", "bounds": {"a": [0.1, 10, "log"]}}),
        hs.QuasiRandomTuner,
    )
    gp = hs.make_tuner({"kind": "gp", "bounds": {"a": [0.1, 10, "log"]}})
    assert isinstance(gp, hs.GPTuner)
    # the grid tuner really searches through the seam
    got = hs.make_tuner(
        {"kind": "grid", "grid": {"a": [1.0, 2.0, 3.0]}}
    ).search(lambda p: (p["a"] - 2.0) ** 2, n=0, maximize=False)
    assert got["best_params"] == {"a": 2.0}
    with pytest.raises(ValueError, match="unknown tuner kind"):
        hs.make_tuner({"kind": "nope"})


def test_emitter_reentrant_listener_does_not_deadlock():
    """A listener that calls back into the SAME emitter from handle()
    must not deadlock: the reference's Lock.synchronized is a reentrant
    JVM monitor, so our dispatch snapshots the listener list and runs
    callbacks outside the (non-reentrant) lock."""
    import threading

    from photon_ml_spark import events

    emitter = events.EventEmitter()
    seen = []

    class Reentrant(events.EventListener):
        def handle(self, event):
            seen.append(event)
            if len(seen) == 1:
                # both re-entrant paths: register AND nested dispatch
                emitter.register_listener(events.CollectingListener())
                emitter.send_event(
                    events.SetupEvent(params={"nested": True})
                )

        def close(self):
            # close() that re-enters clear_listeners must not deadlock
            emitter.clear_listeners()

    emitter.register_listener(Reentrant())
    done = []

    def run():
        emitter.send_event(events.SetupEvent(params={}))
        emitter.clear_listeners()
        done.append(True)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=20)
    assert done, "emitter deadlocked on re-entrant listener"
    assert len(seen) >= 1


def test_jsonlines_file_listener_appends_per_event(tmp_path):
    """The file listener appends + flushes EACH event as it happens (a
    hard crash loses at most the tail, not the whole log), never
    truncates a pre-existing log, renders dataclass fields as JSON
    with a repr fallback, and refuses post-close handling loudly."""
    import json

    from photon_ml_spark import events

    path = str(tmp_path / "events.jsonl")
    # pre-existing content must survive (append, never truncate)
    with open(path, "w") as fh:
        fh.write('{"event": "PriorRun"}\n')
    li = events.JsonLinesFileListener(path)
    li.handle(events.SetupEvent(params={"x": 1, "weird": {1, 2}}))
    # durable BEFORE close: the first event is already on disk
    assert open(path).read().count("\n") == 2
    li.handle(events.OptimizationLogEvent(index=0, reg_weights={"g": 0.5},
                                          metric=0.9))
    with pytest.raises(OSError):
        events.JsonLinesFileListener(str(tmp_path / "no" / "dir.jsonl"))
    li.close()
    rows = [json.loads(l) for l in open(path).read().splitlines()]
    assert [r["event"] for r in rows] == [
        "PriorRun", "SetupEvent", "OptimizationLogEvent",
    ]
    assert rows[2]["reg_weights"] == {"g": 0.5} and rows[2]["metric"] == 0.9
    assert "weird" in rows[1]["params"]  # set rendered via repr fallback
    with pytest.raises(RuntimeError, match="already closed"):
        li.handle(events.TrainingStartEvent(time=0.0))
    li.close()  # idempotent


def test_cli_event_log_config(spark, tmp_path):
    """cfg['event_log'] wires a JsonLinesFileListener through train();
    the finally-block close flushes it even though the caller never
    touches the listener."""
    import json

    from photon_ml_spark import cli
    from photon_ml_spark.sources import datasets

    inp = str(tmp_path / "train_in.parquet")
    datasets.lineitem_training_frame(
        spark, "/root/testdata/sf0.001"
    ).write.parquet(inp)
    log_path = str(tmp_path / "events.jsonl")
    import contextlib
    import io
    with contextlib.redirect_stdout(io.StringIO()):
        cli.train(
            {
                "input": inp,
                "feature_bags": ["features"],
                "coordinates": [{"name": "global", "kind": "fixed"}],
                "family": "binomial",
                "n_iterations": 1,
                "output_dir": str(tmp_path / "model"),
                "event_log": log_path,
            },
            spark,
        )
    names = [json.loads(l)["event"] for l in open(log_path).read().splitlines()]
    assert names[0] == "SetupEvent"
    assert "TrainingStartEvent" in names and "TrainingFinishEvent" in names
    assert "CoordinateUpdateEvent" in names


def test_cli_train_with_config_tuner_prior_shrink(spark, tmp_path, capsys):
    """cfg['tuner'] with a ``prior`` block warm-starts the search box
    around the best prior observation (ShrinkSearchRange +
    priorFromJson — the reference's production retraining flow): every
    point the tuner evaluates lies inside the shrunk bounds, which
    exclude the bad prior corner."""
    from photon_ml_spark.ml.hypersearch import shrink_search_range
    from photon_ml_spark.sources import datasets

    training = datasets.lineitem_training_frame(spark, "/root/testdata/sf0.001")
    inp = str(tmp_path / "prior_in.parquet")
    va = str(tmp_path / "prior_va.parquet")
    training.filter(F.col("uid") % 3 != 0).write.parquet(inp)
    training.filter(F.col("uid") % 3 == 0).write.parquet(va)

    prior = {
        "records": [
            {"global": 1.0, "evaluationValue": 0.9},
            {"global": 900.0, "evaluationValue": 0.1},
        ]
    }
    bounds = {"global": [0.01, 1000.0, "log"]}
    tuner_spec = {
        "kind": "sobol",
        "bounds": bounds,
        "prior": {
            "records_json": json.dumps(prior), "radius": 0.15, "seed": 1,
        },
    }
    out = str(tmp_path / "prior_model")
    cli.train(
        {
            "input": inp,
            "validation_input": va,
            "feature_bags": ["features"],
            "coordinates": [{"name": "global", "kind": "fixed"}],
            "family": "binomial",
            "n_iterations": 1,
            "output_dir": out,
            "tuner": tuner_spec,
            "tuner_iterations": 4,
        },
        spark,
    )
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    evals = rep["tuner"]["evaluations"]
    assert len(evals) == 4
    # the same shrink computation the factory ran: all evaluated points
    # inside the shrunk box, which excludes the bad 900.0 corner
    shrunk = shrink_search_range(
        {k: tuple(v) for k, v in bounds.items()},
        json.dumps(prior), radius=0.15, seed=1,
    )
    lo, hi, _ = shrunk["global"]
    assert hi < 900.0
    for e in evals:
        assert lo - 1e-12 <= e["config"]["global"] <= hi + 1e-12
