"""Sampling operators (SURVEY §2.2 P5/P6/P9, §2.5 T2).

Reproducibility contract (SURVEY §7 hazard 3): every sampler derives
its randomness from ``xxhash64(uid, seed)``, never ``rand()`` — the
reference seeds with ``byteswap64(hash ^ uid)`` for recompute-stable
lineage (RandomEffectDataset.scala:504-511,
BinaryClassificationDownSampler.scala:52-55). A deterministic ``gate``
override exists so oracle tests can substitute an engine-portable
predicate with identical semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# xxhash64 output spans the full signed-64 range; normalize to [0, 1).
_HASH_SPAN = float(2**64)


def hash_uniform(uid: Column, seed: int) -> Column:
    """Deterministic U[0,1) per (uid, seed) via xxhash64."""
    return (F.xxhash64(uid, F.lit(seed)).cast("double") + float(2**63)) / _HASH_SPAN


# Park–Miller modulus/multiplier: a*(m-1) < 2^63, so the arithmetic is
# exact in BIGINT on any engine — the portable twin of hash_uniform.
_LCG_M = 2147483647
_LCG_A = 48271


def lcg_uniform(uid: Column, seed: int) -> Column:
    """Engine-portable U[0,1) per (uid, seed): Park–Miller LCG over
    BIGINT, reproducible verbatim in ANSI SQL —
    ``(48271 * ((uid + seed) % 2147483647)) % 2147483647 / 2147483647.0``.
    Same determinism contract as hash_uniform; weaker mixing, so prefer
    xxhash64 when cross-engine replay is not required."""
    h = (F.lit(_LCG_A) * ((uid + F.lit(seed)) % _LCG_M)) % _LCG_M
    return h.cast("double") / float(_LCG_M)


def uniform_downsample(
    df: DataFrame, rate: float, uid_col: str = "uid", seed: int = 42,
    gate: Column | None = None,
) -> DataFrame:
    """P5 (DefaultDownSampler.scala:28-50): uniform keep at ``rate``,
    weights untouched (the reference keeps weights as-is for uniform)."""
    keep = gate if gate is not None else hash_uniform(F.col(uid_col), seed) < rate
    return df.filter(keep)


def stratified_downsample(
    df: DataFrame,
    rate: float,
    label_col: str = "response",
    weight_col: str = "weight",
    uid_col: str = "uid",
    seed: int = 42,
    gate: Column | None = None,
) -> DataFrame:
    """P6 (BinaryClassificationDownSampler.scala:32-70): keep all
    positives; sample negatives at ``rate`` and rescale their weight by
    1/rate so expected total negative weight is preserved."""
    is_pos = F.col(label_col) == 1.0
    keep_neg = gate if gate is not None else hash_uniform(F.col(uid_col), seed) < rate
    out = df.filter(is_pos | keep_neg)
    return out.withColumn(
        weight_col,
        F.when(is_pos, F.col(weight_col)).otherwise(F.col(weight_col) / rate),
    )


def weighted_downsample(
    df: DataFrame,
    prob: Column,
    uid_col: str = "uid",
    seed: int = 42,
    uniform: Column | None = None,
) -> DataFrame:
    """Per-row Bernoulli keep with row-dependent probability ``prob``
    (a Column in [0,1]) — importance/quality resampling for corpus
    curation (e.g. ``prob = clip(quality_score) ** temperature``).

    Generalizes P5's fixed-rate gate to a per-row rate; same
    determinism contract (``hash_uniform`` of the id, replayable across
    retries and engines via the ``uniform`` override). Pure filter:
    no shuffle, pushes down past column pruning."""
    u = uniform if uniform is not None else hash_uniform(F.col(uid_col), seed)
    return df.filter(u < prob)


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    test_frac: float,
    id_col: str = "doc_id",
    seed: int = 42,
    uniform: Column | None = None,
) -> DataFrame:
    """Train/test split that cannot leak near-duplicates across the
    boundary: the split key is the doc's near-dup CLUSTER, not the doc,
    so a document and all its near-copies land on the same side. A
    per-doc split over a deduplicated-by-pairs corpus still leaks —
    two near-copies that both survived (e.g. below the dedup threshold
    but above memorization similarity) would straddle the boundary.

    ``pairs`` is any near-dup edge list (MinHash/LSH, SimHash,
    embedding cosine, semantic); docs in no pair are singleton
    clusters. Returns every doc annotated (cluster_id, split ∈
    {'train','test'}). The gate is the same deterministic
    engine-portable uniform as the samplers, applied to cluster_id —
    one connected-components pass + one hash, no extra shuffles beyond
    ``cluster_and_keep``.
    """
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError(f"test_frac must be in [0, 1], got {test_frac}")
    from photon_ml_spark.operators.dedup import cluster_and_keep

    ck = cluster_and_keep(docs, pairs, id_col=id_col)
    u = (
        uniform
        if uniform is not None
        else hash_uniform(F.col("cluster_id"), seed)
    )
    return ck.drop("is_keep").withColumn(
        "split", F.when(u < test_frac, F.lit("test")).otherwise(F.lit("train"))
    )


def corpus_mix(
    df: DataFrame,
    group_col: str,
    target_shares: dict[str, float],
    uid_col: str = "uid",
    seed: int = 42,
    uniform: Column | None = None,
    rate_col: str | None = None,
) -> DataFrame:
    """Downsample groups (sources/domains/languages) so the surviving
    corpus matches ``target_shares`` while keeping as much data as
    possible: with the feasible total T* = min_g count_g / share_g, a
    group keeps ``share_g · T* / count_g`` of its rows (rate 1 for the
    binding group). Groups absent from ``target_shares`` are dropped.

    Scale shape: one tiny count aggregate (|groups| rows), the 1-row
    T* scalar cross-joined in-plan (never collected to the driver),
    rates broadcast back onto the corpus, then a deterministic
    per-row Bernoulli filter (``weighted_downsample``). The only
    full-data pass is the final filter.

    ``rate_col`` (optional) exposes each row's keep rate in the output
    for auditing.

    Validation: shares must be > 0, and every target group must have
    rows in the corpus — a missing group would otherwise be silently
    excluded from the T* minimum and the surviving mix would deviate
    from the request with no signal. The check is one tiny aggregate
    (|groups| rows) the plan computes anyway."""
    bad_shares = {k: v for k, v in target_shares.items() if not v > 0}
    if bad_shares:
        raise ValueError(
            f"corpus_mix target_shares must be > 0; got {bad_shares}"
        )
    spark = df.sparkSession
    shares = spark.createDataFrame(
        [(k, float(v)) for k, v in target_shares.items()],
        f"{group_col} string, __share double",
    )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__cnt"))
    missing = [
        r[0]
        for r in shares.join(counts, group_col, "left_anti")
        .select(group_col)
        .collect()
    ]
    if missing:
        raise ValueError(
            "corpus_mix target groups have zero rows in the corpus "
            f"(would silently skew the mix): {sorted(missing)}"
        )
    joined = counts.join(shares, group_col)
    tstar = joined.agg(
        F.min(F.col("__cnt") / F.col("__share")).alias("__tstar")
    )
    rates = joined.crossJoin(F.broadcast(tstar)).select(
        group_col,
        F.least(
            F.lit(1.0), F.col("__share") * F.col("__tstar") / F.col("__cnt")
        ).alias("__rate"),
    )
    out = weighted_downsample(
        df.join(F.broadcast(rates), group_col),
        F.col("__rate"),
        uid_col=uid_col,
        seed=seed,
        uniform=uniform,
    )
    if rate_col:
        return out.withColumn(rate_col, F.col("__rate")).drop("__rate")
    return out.drop("__rate")


def filter_entities_by_support(
    df: DataFrame,
    entity_col: str,
    min_support: int,
    exempt: DataFrame | None = None,
) -> DataFrame:
    """P9 (RandomEffectDataset.scala:586-606): drop all rows of entities
    with fewer than ``min_support`` rows, unless the entity appears in
    ``exempt`` (entities with a prior model, J12 semantics).

    Implemented as count-aggregate + semi-join — Catalyst partial-
    aggregates the count map-side, and AQE picks broadcast when the
    surviving entity set is small.
    """
    support = (
        df.groupBy(entity_col).agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") >= min_support)
        .select(entity_col)
    )
    if exempt is not None:
        support = support.unionByName(exempt.select(entity_col)).distinct()
    return df.join(support, entity_col, "left_semi")


def per_entity_cap(
    df: DataFrame,
    entity_col: str,
    cap: int,
    weight_col: str | None = "weight",
    uid_col: str = "uid",
    seed: int = 42,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """T2 bounded per-entity reservoir (RandomEffectDataset.scala:454-527
    + MinHeapWithFixedCapacity.scala): keep ≤ ``cap`` rows per entity,
    chosen by deterministic hash order; survivors' weights are rescaled
    by total/kept so each entity's total weight is preserved.

    Spark-first: a rank window per entity replaces the reference's
    combineByKey min-heap — the window shuffles once on entity and
    sorts within partitions; no driver involvement. ``order_cols``
    overrides the hash ordering (oracle determinism).

    This cap is what makes ``applyInPandas`` per-entity solves safe:
    it bounds the largest group (the reference's 2 GB/partition
    assumption, RandomEffectDataset.scala:38-45).
    """
    if order_cols:
        order = [F.col(c) for c in order_cols]
    else:
        order = [F.xxhash64(F.col(uid_col), F.lit(seed)), F.col(uid_col)]
    win = Window.partitionBy(entity_col).orderBy(*order)
    cnt_win = Window.partitionBy(entity_col)
    out = (
        df.withColumn("__rn", F.row_number().over(win))
        .withColumn("__total", F.count(F.lit(1)).over(cnt_win))
        .filter(F.col("__rn") <= cap)
    )
    if weight_col:
        out = out.withColumn(
            weight_col,
            F.col(weight_col)
            * F.col("__total")
            / F.least(F.col("__total"), F.lit(cap)).cast("double"),
        )
    return out.drop("__rn", "__total")


# ------------------------------------------------------- global shuffle


def shuffle_assignment(
    df: DataFrame,
    uid_col: str = "uid",
    n_shards: int = 8,
    seed: int = 17,
    uniform: Column | None = None,
    order_key: Column | None = None,
) -> DataFrame:
    """Deterministic global-shuffle assignment for training-data export:
    adds ``shard`` (pseudo-random shard id) and ``ord`` (within-shard
    order key) as pure column expressions.

    (shard, ord, uid) totally orders the dataset as a pseudo-random
    permutation — the pre-training "shuffle the corpus" step — without
    a global sort: the physical layout needs ONE hash exchange on
    shard plus a per-partition sort (``write_training_shards``), so
    the plan scales to any corpus size. Defaults use the
    engine-portable Park–Miller LCG (exact BIGINT arithmetic, oracle-
    replayable); production can pass ``uniform=hash_uniform(...)`` /
    ``order_key=xxhash64(...)`` for stronger mixing.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    uid = F.col(uid_col)

    # Two LCG rounds, not one: a single Park–Miller step is linear in
    # uid with multiplier 48271, so a block of consecutive uids smaller
    # than M/48271 ≈ 44k maps to one narrow interval — every row lands
    # in shard 0. The composition (A²·x mod M, effective multiplier
    # ≈ 1.8e8) wraps every ~12 consecutive uids and spreads them
    # uniformly, while remaining a bijection on Z_M (tie-free order
    # keys for distinct uids < M) and exact in BIGINT on any engine.
    def lcg2(x):
        h1 = (F.lit(_LCG_A) * (x % _LCG_M)) % _LCG_M
        return (F.lit(_LCG_A) * h1) % _LCG_M

    u = (
        uniform
        if uniform is not None
        else lcg2(uid + F.lit(seed)).cast("double") / float(_LCG_M)
    )
    o = order_key if order_key is not None else lcg2(uid + F.lit(seed + 1))
    return df.withColumns(
        {
            "shard": F.floor(u * n_shards).cast("long"),
            "ord": o.cast("long"),
        }
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    uid_col: str = "uid",
    seed: int = 17,
    fmt: str = "parquet",
) -> None:
    """Materialize the shuffled corpus as ``path/shard=K/`` directories,
    one sorted file per shard: one hash exchange on shard + a local
    (shard, ord, uid) sort — no global ordering operator anywhere in
    the plan. Readers stream shards independently; concatenating
    shard 0..n-1 replays the full pseudo-random permutation."""
    out = shuffle_assignment(df, uid_col=uid_col, n_shards=n_shards, seed=seed)
    (
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "ord", uid_col)
        .write.partitionBy("shard")
        .format(fmt)
        .mode("overwrite")
        .save(path)
    )
