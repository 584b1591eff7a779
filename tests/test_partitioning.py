"""Hive-style date partitioning: the S7 scale claim (a date predicate
prunes partitions at the source, never listing excluded days) proven on
a real partitioned write, plus coordinate-descent per-update validation
(M3's evaluation hook)."""

import contextlib
import io

from pyspark.sql import functions as F

from photon_ml_spark.sources.datasets import load_events


def test_date_partition_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_daily")
    ev = load_events(spark, sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(out)

    all_days = spark.read.parquet(out)
    n_days = all_days.select("day").distinct().count()
    pruned = all_days.filter(
        (F.col("day") >= "2024-01-03") & (F.col("day") <= "2024-01-04")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the pruned scan must touch only the 2 matching day directories
    files = {
        r[0].rsplit("/day=", 1)[1].split("/")[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert files == {"2024-01-03", "2024-01-04"}
    assert n_days > 2


def _unpartitioned_windows(df):
    """Physical-plan Window operators with no partition spec (the
    `WindowExec: No Partition Defined` single-task shape). A fully
    specified Window prints `Window [exprs], [partSpec], [orderSpec]`
    (two `], [` separators); with one separator the remaining group is
    EITHER a partition spec (partitioned-unordered count window — fine)
    or an order spec (global ordered window — the scale killer); order
    specs always carry ASC/DESC direction markers."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = []
    for line in plan.splitlines():
        if "Window [" not in line:
            continue
        if line.count("], [") >= 2:
            continue
        tail = line.rsplit("], [", 1)[-1]
        if " ASC" in tail or " DESC" in tail or line.count("], [") == 0:
            bad.append(line.strip())
    return bad


def test_auc_family_has_no_global_window(spark):
    """auroc/aupr/peak_f1 must never funnel all distinct scores through
    a single-partition window (VERDICT r1 'What's wrong' #1)."""
    from photon_ml_spark.functions import metrics

    df = spark.range(1000).select(
        (F.col("id") * 0.001).alias("score"),
        (F.col("id") % 2).cast("double").alias("label"),
        F.lit(1.0).alias("weight"),
    )
    for fn in (metrics.auroc, metrics.aupr, metrics.peak_f1):
        bad = _unpartitioned_windows(fn(df, weight="weight"))
        assert not bad, f"{fn.__name__}: unpartitioned Window in plan: {bad}"


def test_dedup_pipelines_have_no_global_window(spark, sf_dir):
    """token_ids' shingle dictionary must be built without a global
    row_number window (VERDICT r1 'What's wrong' #2)."""
    from photon_ml_spark.operators.dedup import (
        minhash_lsh_dedup,
        simhash_neardup_pairs,
        token_ids,
    )
    from photon_ml_spark.sources.datasets import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    for df in (
        token_ids(docs),
        minhash_lsh_dedup(docs, threshold=0.5),
        simhash_neardup_pairs(docs, max_hamming=3),
    ):
        bad = _unpartitioned_windows(df)
        assert not bad, f"unpartitioned Window in plan: {bad}"


def test_coordinate_descent_per_update_validation(spark, sf_dir):
    from photon_ml_spark.functions.metrics import evaluation_suite
    from photon_ml_spark.ml.coordinate_descent import CoordinateConfig, train_game
    from photon_ml_spark.sources import datasets, featurize
    from photon_ml_spark.datamodel import FeatureShardConfig

    training = datasets.lineitem_training_frame(spark, sf_dir)
    dictionary = featurize.build_feature_dictionary(
        training, ["features"], has_intercept=True
    ).cache()
    shard = FeatureShardConfig("features", ["features"])
    assembled = featurize.assemble_shard(
        training, dictionary, shard, strategy="map"
    ).cache()
    train = assembled.filter(F.col("uid") % 5 != 0)
    valid = assembled.filter(F.col("uid") % 5 == 0)

    def evaluator(scored_df):
        row = evaluation_suite(
            scored_df, score="score", label="response", weight="weight"
        ).first()
        return {"rmse": row.rmse, "logistic_loss": row.logistic_loss}

    _, history = train_game(
        train,
        coordinates=[
            CoordinateConfig(name="global", kind="fixed", dim=5),
            CoordinateConfig(
                name="per_supplier", kind="random", dim=5,
                entity_col="suppkey", reg_param=1.0, min_samples=5,
            ),
        ],
        family="binomial",
        n_iterations=2,
        validation_df=valid,
        evaluator=evaluator,
    )
    # one entry per coordinate update, each carrying the metric dict
    # (CoordinateDescent.scala:312-333 per-update validation)
    assert len(history) == 4
    assert all("metrics" in h and h["metrics"]["rmse"] > 0 for h in history)
    # training should not get catastrophically worse across updates
    first, last = history[0]["metrics"]["rmse"], history[-1]["metrics"]["rmse"]
    assert last <= first * 1.5


def test_range_join_plan_is_hash_join(spark):
    """The bucketed range join must compile to a hash/sort-merge
    equi-join; the naive BETWEEN predicate nested-loops. This is the
    operator's entire reason to exist — locked at the plan level."""
    from photon_ml_spark.operators.temporal import range_join

    left = spark.range(0, 1000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("t"),
        F.col("id").alias("uid"),
    )
    right = spark.range(0, 100).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 7).alias("t_start"),
        (F.col("id") * 7 + 30).alias("t_end"), F.col("id").alias("rid"),
    )
    bucketed = range_join(
        left, right, on="k", left_ts="t",
        right_start="t_start", right_end="t_end", bucket_width=30,
    )
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    naive = left.join(right, "k").filter(
        (F.col("t") >= F.col("t_start")) & (F.col("t") <= F.col("t_end"))
    )
    # the naive shape degrades only without an equality key — document
    # the contrast on the keyless variant
    naive_keyless = left.drop("k").crossJoin(right.drop("k")).filter(
        (F.col("t") >= F.col("t_start")) & (F.col("t") <= F.col("t_end"))
    )
    keyless_plan = naive_keyless._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in keyless_plan or "CartesianProduct" in keyless_plan
    keyless_bucketed = range_join(
        left.drop("k"), right.drop("k"), on=None, left_ts="t",
        right_start="t_start", right_end="t_end", bucket_width=30,
    )
    kb_plan = keyless_bucketed._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in kb_plan and "CartesianProduct" not in kb_plan


def test_as_of_join_plan_single_exchange(spark):
    """The as-of join must cost exactly one shuffle + one per-key sort
    (the merge-join shape) with no join operator at all — the whole
    point of the tagged-union rendering."""
    from photon_ml_spark.operators.temporal import as_of_join

    left = spark.range(0, 100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts"),
        F.col("id").alias("uid"),
    )
    right = spark.range(0, 20).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 3).alias("ts"),
        F.col("id").alias("v"),
    )
    plan = (
        as_of_join(left, right, on="k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    # the single window is fully partitioned by the key
    assert "windowspecdefinition(k#" in plan


def test_substring_dedup_plan_shapes(spark, sf_dir):
    """Substring dedup: spans come from doc-partitioned windows only
    (no global window), and the rolling strategy's per-window modular
    sums partial-aggregate BEFORE the exchange — the n-fold
    contribution explode must never hit the shuffle."""
    from photon_ml_spark.operators.dedup import (
        _window_keys_rolling,
        duplicated_window_spans,
    )
    from photon_ml_spark.sources.datasets import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    for strat in ("string", "rolling"):
        bad = _unpartitioned_windows(
            duplicated_window_spans(docs, n=10, strategy=strat)
        )
        assert not bad, f"{strat}: unpartitioned Window in plan: {bad}"

    toks = docs.selectExpr(
        "doc_id AS __id",
        "filter(split(lower(text), '\\\\s+'), t -> t != '') AS __toks",
    ).filter(F.size("__toks") >= 10)
    plan = (
        _window_keys_rolling(toks, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the per-window modular sums must combine map-side (partial_sum
    # directly over the Generate/explode output), so the n-fold
    # contribution fan-out never reaches a shuffle
    i_explode = plan.find("Generate explode")
    i_partial = plan.find("partial_sum")
    assert i_partial != -1, "no map-side partial aggregate in plan"
    assert i_explode != -1 and i_partial < i_explode, (
        "partial aggregate must consume the contribution explode "
        "(printed above it in the bottom-up plan)"
    )


def test_shard_writer_plan_no_global_sort(spark):
    """write_training_shards' layout = one hash exchange + local sort:
    the plan must contain no global (range-partitioned) sort."""
    from photon_ml_spark.operators.sampling import shuffle_assignment

    df = spark.range(0, 1000).withColumnRenamed("id", "uid")
    out = (
        shuffle_assignment(df, "uid", 8, 17)
        .repartition(8, "shard")
        .sortWithinPartitions("shard", "ord", "uid")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Sort [" in line:
            assert "false, 0" in line, f"global sort in shard layout: {line}"
    assert "rangepartitioning" not in plan.lower()
