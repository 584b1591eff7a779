"""Coordinate descent / backfitting across GAME coordinates (M3).

Rebuilds photon-lib/.../algorithm/CoordinateDescent.scala:43-167,373-463
as a driver-side Python loop over DataFrames (the reference's own
orchestration is driver-side Scala — there is no Catalyst analog for
an iterative training loop):

- coordinates train in sequence; each sees the others' current scores
  as extra offset (residual attach, J1/J2)
- the summed score set is maintained INCREMENTALLY:
  ``summed − old_i + new_i`` (outer-join arithmetic J11,
  CoordinateDescent.scala:412-415,441-446) — never a full rescore
- warm start on iterations ≥ 2 (M7): fixed effects re-fit (IRLS
  converges in a few rounds anyway), random effects get the previous
  model table as ``prior_model`` (x0 per entity)
- locked coordinates (M8): scored with their pre-trained model, never
  re-trained (FixedEffectModelCoordinate analog)

Cache discipline (the reference persists+counts every intermediate,
RandomEffectDataset.scala:279-341): the running score sum is
checkpointed per update and the superseded generation is released
after its replacement materializes. Per-coordinate score frames are
materialized KIND-CONDITIONALLY (r14, see _SCORE_CHECKPOINT_KINDS):
a FIXED coordinate's score is a shuffle-free literal projection of the
cached training frame — kept lazy, because re-deriving it on the one
later read (the refit subtraction) is cheaper than writing a second
row-set-sized generation per update (r13). A RANDOM coordinate's score
re-runs a model-table join on every lazy read, which the r13 bench
measured as net-negative — it is checkpointed once per update, with
the superseded generation released like the summed frames.

Lineage discipline: the running score sum is rebuilt from its own
previous generation every update, so its LOGICAL plan doubles per
generation (cache substitution keeps execution cheap, but analysis/
codegen of the exponentially growing plan OOMs the driver after ~20
generations — measured locally). Each persisted generation is
therefore ``localCheckpoint``-ed, which truncates the plan to a leaf.
The reference's RDD design has the same discipline implicitly (RDD
lineage is per-partition, and persist+count cuts recompute, not plan
size — DataFrames need the explicit cut).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from photon_ml_spark.ml import glm as glm_mod
from photon_ml_spark.ml import random_effects as re_mod
from photon_ml_spark.ml import scoring
from photon_ml_spark.operators.indexing import release_local_checkpoint


#: Coordinate kinds whose per-coordinate score frame is CHECKPOINTED
#: instead of left lazy (see train_game's score-materialization note).
#: A fixed coordinate's score is a literal dot product over the cached
#: training frame — re-deriving it on the refit subtraction is cheaper
#: than a row-set-sized checkpoint per update (r13). A RANDOM
#: coordinate's score is a join against the per-entity model table,
#: and the lazy form re-runs that join on every downstream read (the
#: refit's fit input AND the summed-score checkpoint) — measured
#: net-negative at bench scale (r14 interleaved A/B), so random scores
#: are materialized once per update again. Module-level so the A/B
#: harness can flip it; not part of the public API.
_SCORE_CHECKPOINT_KINDS = frozenset({"random"})


@dataclass
class CoordinateConfig:
    """One GAME coordinate (fixed or per-entity random effect)."""

    name: str
    kind: str  # 'fixed' | 'random'
    dim: int
    indices_col: str = "features_indices"
    values_col: str = "features_values"
    entity_col: str | None = None  # required for kind='random'
    reg_param: float = 0.0
    min_samples: int = 1
    # T2 active-data cap INSIDE the loop (RandomEffectDataset.scala:
    # 454-527 active/passive split): a random coordinate trains on at
    # most this many rows per entity (deterministic reservoir, weights
    # rescaled to preserve entity mass) while SCORING still covers
    # every row — the passive rows get scores through the model join.
    # This is the rail that keeps a skewed entity (one key owning 30%
    # of the fact table) inside the per-group memory budget.
    active_cap: int | None = None
    locked: bool = False  # M8: score but never (re)train
    pretrained: object = None  # FixedEffectGLM | model DataFrame when locked/warm
    # P7 per-entity subspace projection for RANDOM coordinates
    # (RandomEffectDataset.scala:390-426, LinearSubspaceProjector.
    # scala:37-66): each entity solves in the subspace of its own
    # active indices (∪ prior support) and scatters back to ``dim``.
    # REQUIRED when the shard is wide (a 100M-feature space cannot be
    # solved densely per entity); off by default because narrow-shard
    # fits skip the gather/scatter.
    project_subspace: bool = False
    # per-coordinate optimizer config (GLMOptimizationConfiguration
    # analog): elastic-net mixing (fixed kind; OWLQN when > 0), solver
    # override ('auto' | 'tron'), box bounds (arrays, fixed kind)
    elastic_net_param: float = 0.0
    solver: str = "auto"
    lower_bounds: object = None
    upper_bounds: object = None
    # M9 incremental Gaussian prior for FIXED coordinates: arrays of
    # length dim+1 (intercept last). Random coordinates take their
    # prior through ``pretrained`` (the previous model TABLE, which
    # may carry per-entity variances).
    prior_mean: object = None
    prior_precision: object = None
    # varianceComputationType for RANDOM coordinates (the reference
    # threads it into every per-entity problem —
    # RandomEffectOptimizationProblem.scala:133-189): None | 'simple' |
    # 'full'. The fitted model table then carries per-entity
    # variances/intercept_variance columns — the σ² the next
    # incremental run (and the reference-layout export) consumes.
    # Fixed-coordinate variances are computed at the CD optimum by the
    # train driver instead (exact offset-inclusive curvature).
    compute_variance: str | None = None

    def __post_init__(self):
        if self.kind not in ("fixed", "random"):
            raise ValueError(f"kind must be fixed|random: {self.kind}")
        if self.kind == "random" and not self.entity_col:
            raise ValueError(f"coordinate {self.name}: random needs entity_col")
        if self.locked and self.pretrained is None:
            raise ValueError(f"coordinate {self.name}: locked needs pretrained")


@dataclass
class GameModel:
    """Ordered coordinate → model map (GameModel.scala:32); total score
    = Σ coordinate scores (:108-112)."""

    family: str
    coordinates: dict[str, object] = field(default_factory=dict)  # name → model
    configs: dict[str, CoordinateConfig] = field(default_factory=dict)
    # per-FIXED-coordinate σ² tables (feature_key, feature_index,
    # variance), populated by load_photon_game_model when the imported
    # record carries variances (BayesianLinearModelAvro.variances;
    # random-effect σ² ride the coordinate's model TABLE instead as
    # variances/intercept_variance columns) — the payload incremental
    # training turns into Gaussian-prior precision (M9)
    variances: dict[str, DataFrame] = field(default_factory=dict)

    def score(self, df: DataFrame, out_col: str = "score") -> DataFrame:
        """M12 batch inference: margin = Σ coordinate margins. Mid-
        training (per-update validation, CoordinateDescent.scala:
        312-333) only the coordinates fitted SO FAR contribute —
        configs without a model yet are skipped."""
        out = df
        fitted = [n for n in self.configs if n in self.coordinates]
        if not fitted:
            raise ValueError("GameModel.score: no fitted coordinates")
        parts = []
        for name in fitted:
            col = f"__score_{name}"
            out = _score_coordinate(out, self.configs[name], self.coordinates[name], col)
            parts.append(F.col(col))
        total = parts[0]
        for p in parts[1:]:
            total = total + p
        return out.withColumn(out_col, total).drop(
            *[f"__score_{n}" for n in fitted]
        )


def _score_coordinate(df: DataFrame, cfg: CoordinateConfig, model, out_col: str) -> DataFrame:
    if cfg.kind == "fixed":
        return scoring.score_literal(
            df, model, indices_col=cfg.indices_col, values_col=cfg.values_col,
            out_col=out_col,
        )
    mt = model.select(
        F.col("entity").alias(cfg.entity_col), "coefficients", "intercept"
    )
    return scoring.score_random_effect(
        df, mt, entity_col=cfg.entity_col,
        indices_col=cfg.indices_col, values_col=cfg.values_col, out_col=out_col,
    )


def _fit_coordinate(
    data: DataFrame, cfg: CoordinateConfig, family: str, prior, offset_col: str,
    uid_col: str = "uid",
):
    if cfg.kind == "fixed":
        return glm_mod.fit_fixed_effect(
            data, dim=cfg.dim, family=family,
            indices_col=cfg.indices_col, values_col=cfg.values_col,
            offset_col=offset_col, reg_param=cfg.reg_param,
            elastic_net_param=cfg.elastic_net_param, solver=cfg.solver,
            lower_bounds=cfg.lower_bounds, upper_bounds=cfg.upper_bounds,
            prior_mean=cfg.prior_mean, prior_precision=cfg.prior_precision,
            # the loop refits this coordinate every iteration and never
            # reads the GLR summary diagnostics — skip their ~4 extra
            # aggregation jobs per update (guide §1.2)
            diagnostics=False,
            # M7: the previous update's model (or pretrained, on the
            # first update) is the optimizer start point — the
            # reference passes the existing model into every
            # optimizationProblem.run (CoordinateDescent / ModelTraining.
            # scala:178-224). Custom-solver paths only; GLR ignores it.
            x0=prior if isinstance(prior, glm_mod.FixedEffectGLM) else None,
        )
    if cfg.active_cap is not None:
        from photon_ml_spark.operators.sampling import per_entity_cap

        data = per_entity_cap(
            data, cfg.entity_col, cap=cfg.active_cap,
            weight_col="weight" if "weight" in data.columns else None,
            uid_col=uid_col,
        )
    # The M9 Gaussian penalty (variances on the prior table) applies
    # ONLY when the prior IS the caller's pretrained model — the
    # documented first-update semantics. Later CD generations of this
    # coordinate serve as warm start/carry-forward alone; with
    # compute_variance set they now CARRY variances, and leaving them
    # on would make iteration N+1 shrink toward iteration N (a prior
    # toward our own previous update — not any reference semantic).
    if (
        prior is not None
        and prior is not cfg.pretrained
        and hasattr(prior, "columns")
        and "variances" in prior.columns
    ):
        prior = prior.drop("variances", "intercept_variance")
    return re_mod.fit_random_effects(
        data, entity_col=cfg.entity_col, dim=cfg.dim, family=family,
        indices_col=cfg.indices_col, values_col=cfg.values_col,
        offset_col=offset_col, reg_param=cfg.reg_param,
        min_samples=cfg.min_samples, prior_model=prior,
        lower_bounds=cfg.lower_bounds, upper_bounds=cfg.upper_bounds,
        compute_variance=cfg.compute_variance,
        project_subspace=cfg.project_subspace,
    )


def train_game(
    df: DataFrame,
    coordinates: list[CoordinateConfig],
    family: str = "binomial",
    n_iterations: int = 2,
    uid_col: str = "uid",
    offset_col: str = "offset",
    validation_df: DataFrame | None = None,
    evaluator=None,
    on_update=None,
) -> tuple[GameModel, list[dict]]:
    """Run coordinate descent; returns (model, per-update history).

    ``evaluator(scored_validation_df) -> dict`` is called after every
    coordinate update when ``validation_df`` is given
    (CoordinateDescent.scala:312-333 per-coordinate validation).

    ``on_update(entry)`` (optional) fires after every coordinate update
    with the history entry just appended — the estimator uses it to
    emit ``CoordinateUpdateEvent``s to registered listeners while the
    loop is still running (events.py)."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()

    model = GameModel(family=family, configs={c.name: c for c in coordinates})
    score_dfs: dict[str, DataFrame] = {}
    summed: DataFrame | None = None  # (uid, score) running total
    history: list[dict] = []
    ours: set[int] = set()  # ids of RE model frames THIS loop checkpointed
    score_ckpts: set[int] = set()  # ids of CHECKPOINTED score frames

    def _persist(d: DataFrame) -> DataFrame:
        # eager localCheckpoint: materializes AND truncates the logical
        # plan (see module docstring). SERIALIZED storage, explicitly:
        # the checkpointed generations are row-set-sized (every uid ×
        # score, once per coordinate update) and the localCheckpoint default
        # level stores DESERIALIZED row objects — at the 100x stress
        # scale (60M rows) that is one JVM object graph per row per
        # generation and OOMed a 24g heap in the first x100 summed-
        # score join (r13 decade run); serialized blocks hold the same
        # generations in ~2.5 GB. Same storage rule as PLANS.md's
        # corpus-scale persist discipline. On a multi-executor cluster
        # with executor churn, prefer reliable checkpoints
        # (spark.sparkContext.setCheckpointDir + df.checkpoint).
        return d.localCheckpoint(
            eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
        )

    # Warm start (M7/M9): a non-locked coordinate carrying a
    # ``pretrained`` model enters the loop as x0/prior ONLY — a random
    # coordinate receives it as prior on its first update (with
    # carry-forward for data-less entities). Its scores do NOT join
    # the running sum before the coordinate is first trained: the
    # reference trains the first coordinate of iteration 1 with
    # residualsOpt = None (CoordinateDescent.scala:383-394 — initial
    # models are starting points, only already-updated coordinates
    # contribute residuals). Locked coordinates keep being scored
    # inside the loop as before.
    for cfg in coordinates:
        if cfg.pretrained is not None and not cfg.locked:
            model.coordinates[cfg.name] = cfg.pretrained

    for it in range(1, n_iterations + 1):
        for cfg in coordinates:
            # residual offset = base offset + all OTHER coordinates' scores
            if summed is not None and cfg.name in score_dfs:
                others = scoring.add_scores(
                    summed, score_dfs[cfg.name], uid_col=uid_col, sign=-1
                )
            else:
                others = summed
            if others is not None:
                data = scoring.attach_residual_offset(
                    df, others, uid_col=uid_col, offset_col=offset_col
                )
            else:
                data = df

            prior_to_release = None
            if cfg.locked:
                coord_model = cfg.pretrained
            else:
                # previous generation of THIS coordinate: random gets
                # it as prior/carry-forward, fixed as optimizer x0
                prior = model.coordinates.get(cfg.name)
                coord_model = _fit_coordinate(
                    data, cfg, family, prior, offset_col, uid_col=uid_col
                )
                if cfg.kind == "random":
                    coord_model = _persist(coord_model)
                    ours.add(id(coord_model))
                    # the superseded RE model table served as prior/x0
                    # for the fit just materialized — but the LAZY
                    # per-coordinate score below still references it
                    # through ``others``/``base`` until the new summed
                    # generation materializes, so the release happens
                    # AFTER the summed checkpoint (only generations
                    # THIS loop checkpointed: a caller-provided
                    # pretrained frame is not ours to drop)
                    if prior is not None and id(prior) in ours:
                        prior_to_release = prior
            model.coordinates[cfg.name] = coord_model

            # Score materialization is KIND-CONDITIONAL (r14, refining
            # the r13 all-lazy rule after the interleaved A/B): a FIXED
            # coordinate's score is a shuffle-free literal dot product
            # over the cached training frame — lazy, because re-deriving
            # it on the refit subtraction is cheaper than a row-set-
            # sized checkpoint per update. A RANDOM coordinate's score
            # is a join against the (checkpointed) per-entity model
            # table, and the lazy form re-runs that join on EVERY
            # downstream read — the refit's fit input and the summed
            # checkpoint — which the r13 bench measured as net-negative;
            # it is checkpointed once per update and the superseded
            # generation released below. Numerics identical either way —
            # same expressions over the same pinned rows (checkpoint is
            # row-transparent).
            new_score = _score_coordinate(df, cfg, coord_model, "score").select(
                uid_col, "score"
            )
            old_score = score_dfs.get(cfg.name)
            if cfg.kind in _SCORE_CHECKPOINT_KINDS:
                new_score = _persist(new_score)
                score_ckpts.add(id(new_score))

            # incremental summed-score maintenance (J11): summed − old + new
            old_summed = summed
            if summed is None:
                summed = _persist(new_score)
            else:
                base = others if cfg.name in score_dfs else summed
                summed = _persist(
                    scoring.add_scores(base, new_score, uid_col=uid_col)
                )
            # Release superseded generations. These frames are eager
            # localCheckpoints, so plain unpersist() is a NO-OP on them
            # (checkpoint blocks are RDD-level storage, not CacheManager
            # entries) — without the explicit release the loop
            # accumulates a row-set-sized stale frame per coordinate
            # update until driver GC. Score frames are lazy and never
            # alias a summed generation, so the release is
            # unconditional.
            if old_summed is not None and old_summed is not summed:
                release_local_checkpoint(old_summed)
            if prior_to_release is not None:
                release_local_checkpoint(prior_to_release)
                ours.discard(id(prior_to_release))
            # the superseded CHECKPOINTED score generation of this
            # coordinate was read for the last time by the summed
            # checkpoint just materialized (through ``others``) —
            # release its blocks now (lazy score frames have nothing
            # to release)
            if old_score is not None and id(old_score) in score_ckpts:
                release_local_checkpoint(old_score)
                score_ckpts.discard(id(old_score))
            score_dfs[cfg.name] = new_score

            entry = {"iteration": it, "coordinate": cfg.name}
            if validation_df is not None and evaluator is not None:
                scored_val = model.score(validation_df)
                entry["metrics"] = evaluator(scored_val)
            history.append(entry)
            if on_update is not None:
                on_update(entry)

    df.unpersist()
    # the running sum and the per-coordinate score generations are loop
    # internals — nothing in the returned (model, history) reads them,
    # so their checkpoint blocks are released here (lazy score frames
    # have nothing to release); the final RE model tables (returned
    # inside the model) are the only checkpointed frames that outlive
    # the call
    if summed is not None:
        release_local_checkpoint(summed)
    for s in score_dfs.values():
        if id(s) in score_ckpts:
            release_local_checkpoint(s)
    return model, history
