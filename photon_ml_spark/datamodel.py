"""Column-name conventions for GAME-style training DataFrames.

The reference wraps every row in a ``GameDatum`` object
(photon-lib/.../ml/data/GameDatum.scala:37-42) carrying response,
offset, weight, a map of feature-shard vectors, and a map of id tags.
Spark-first, a "GAME dataset" is just a DataFrame with conventional
columns — one vector column per feature shard, one string/long column
per id tag — so Catalyst can prune/push/codegen everything.

Reserved names mirror photon-api/.../data/InputColumnsNames.scala.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class InputColumns:
    """Overridable reserved column names (InputColumnsNames.scala)."""

    uid: str = "uid"
    response: str = "response"
    offset: str = "offset"
    weight: str = "weight"
    metadata_map: str = "metadataMap"
    features: str = "features"

    def all(self) -> list[str]:
        return [self.uid, self.response, self.offset, self.weight,
                self.metadata_map, self.features]


DEFAULT_COLUMNS = InputColumns()


@dataclass
class FeatureShardConfig:
    """Merge N feature bags (source array columns) into one shard vector.

    Mirrors FeatureShardConfiguration (photon-client/.../data/avro/
    AvroDataReader.scala:85-99): a shard is the union of its bags'
    (name, term, value) entries, with an optional intercept slot.
    """

    shard_name: str
    feature_bags: list[str] = field(default_factory=list)
    has_intercept: bool = True


INTERCEPT_KEY = "(INTERCEPT)"
# Feature key separator: key = name + SEP + term (Utils.getFeatureKey,
# photon-client/.../util/Utils.scala:58-59; Constants.DELIMITER = "\\u0001").
FEATURE_KEY_SEP = "\u0001"
