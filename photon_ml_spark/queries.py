"""Query registry: one entry per implemented SURVEY §2 operator.

Each registered query is a (spark, sf_dir) → DataFrame callable that
exercises an engine operator on the driver's synthetic tables, paired
(where SQL-expressible) with an ANSI-SQL oracle string DuckDB runs on
the same parquet. Column names are aligned on both sides because the
driver's comparator hashes values under sorted column names.

Float convention: every floating-point output column in an
oracle-compared query is ROUND(x, 6)-ed on BOTH sides so summation-
order differences between engines cannot flip the value hash.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class QuerySpec:
    run: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    note: str = ""


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, note: str = ""):
    def deco(fn):
        QUERY_REGISTRY[name] = QuerySpec(run=fn, oracle=oracle, note=note)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def r6(c) -> F.Column:
    return F.round(c, 6)


# Import side-effect modules that register queries.
def _load_all_registrations():
    from photon_ml_spark import queries_core  # noqa: F401
    try:
        from photon_ml_spark import queries_ml  # noqa: F401
    except ImportError:
        pass
    try:
        from photon_ml_spark import queries_pipeline  # noqa: F401
    except ImportError:
        pass
    try:
        from photon_ml_spark import queries_streaming  # noqa: F401
    except ImportError:
        pass


def all_queries() -> dict[str, QuerySpec]:
    _load_all_registrations()
    return dict(QUERY_REGISTRY)
