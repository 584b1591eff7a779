"""spark.ml-style estimator/transformer facade — the reference's
primary programmatic surface (README "API": "interfaces identical to
those of Spark ML"; GameEstimator.scala:55, GameTransformer.scala:39).

``GameEstimator(coordinates...).fit(df)`` returns a fitted
``GameTransformer`` whose ``transform(df)`` appends the summed GAME
score and the family mean prediction — the same contract as a
``spark.ml`` Model. The underlying machinery is
ml/coordinate_descent.train_game (M3) and ml/scoring (M12).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from photon_ml_spark import events
from photon_ml_spark.events import EventEmitter
from photon_ml_spark.ml.coordinate_descent import (
    CoordinateConfig,
    GameModel,
    train_game,
)
from photon_ml_spark.ml.scoring import apply_mean


@dataclass
class GameTransformer:
    """Fitted GAME model as a transformer (GameTransformer.scala:150-283).

    ``transform`` appends ``score`` (Σ coordinate margins + offset is
    NOT folded in — evaluation adds offset explicitly, matching
    GameScoringDriver.scala:234) and ``prediction`` (family mean).
    """

    model: GameModel
    history: list = field(default_factory=list)

    def transform(
        self, df: DataFrame, score_col: str = "score",
        prediction_col: str = "prediction",
    ) -> DataFrame:
        scored = self.model.score(df, out_col=score_col)
        return apply_mean(
            scored, self.model.family, margin_col=score_col,
            out_col=prediction_col,
        )

    def save(self, path: str, spark=None) -> None:
        """Persist the fitted model in the engine's native layout —
        the spark.ml ``Model.save`` analog the reference's "interfaces
        identical to Spark ML" story implies (GameEstimator.scala:55).
        ``spark`` defaults to the active session. Training ``history``
        is a fit-time log, not model state, and is not persisted."""
        from photon_ml_spark.sources.model_io import save_game_model

        if spark is None:
            spark = self._active_spark()
        save_game_model(self.model, path, spark)

    @classmethod
    def load(cls, path: str, spark=None) -> "GameTransformer":
        """Inverse of ``save``: rebuild the transformer from a native
        model dir (also accepts anything ``cli train`` or
        ``import-model`` wrote)."""
        from photon_ml_spark.sources.model_io import load_game_model

        if spark is None:
            spark = cls._active_spark()
        return cls(model=load_game_model(path, spark))

    @staticmethod
    def _active_spark():
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise ValueError(
                "no active SparkSession; pass spark= explicitly"
            )
        return spark


@dataclass
class GameEstimator(EventEmitter):
    """Configure coordinates once, ``fit`` per dataset
    (GameEstimator.scala:397-491 lifecycle, minus the Avro plumbing —
    input is any DataFrame with the conventional columns).

    Also an ``EventEmitter`` (reference GameTrainingDriver's event
    surface, photon-client event/EventEmitter.scala): ``fit`` emits
    ``TrainingStartEvent`` → one ``CoordinateUpdateEvent`` per
    coordinate update (in loop order, while training runs) →
    ``TrainingFinishEvent`` to listeners registered via
    ``register_listener``."""

    coordinates: list[CoordinateConfig]
    family: str = "binomial"
    n_iterations: int = 2
    uid_col: str = "uid"
    offset_col: str = "offset"

    def fit(
        self,
        df: DataFrame,
        validation_df: DataFrame | None = None,
        evaluator=None,
    ) -> GameTransformer:
        self.send_event(events.TrainingStartEvent(time=events.now()))
        model, history = train_game(
            df,
            coordinates=self.coordinates,
            family=self.family,
            n_iterations=self.n_iterations,
            uid_col=self.uid_col,
            offset_col=self.offset_col,
            validation_df=validation_df,
            evaluator=evaluator,
            on_update=lambda e: self.send_event(
                events.CoordinateUpdateEvent(
                    iteration=e["iteration"],
                    coordinate=e["coordinate"],
                    metrics=e.get("metrics"),
                )
            ),
        )
        self.send_event(events.TrainingFinishEvent(time=events.now()))
        return GameTransformer(model=model, history=history)
