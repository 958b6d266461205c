"""Query registry.

Every operator the engine claims (SURVEY.md §2.2 + north-star extensions)
registers here as a ``QuerySpec``: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` plus, when SQL-expressible, an equivalent DuckDB oracle SQL
string. The driver contract (__spark_entry__.py) exposes exactly this
registry.

Column-name discipline: the Spark DataFrame and the oracle SQL must produce
identical column names (the driver sorts columns by name before hashing) —
every computed column is aliased on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL over the pre-registered views
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "streamprocessing_spark.queries.core",
    "streamprocessing_spark.queries.analytics",
    "streamprocessing_spark.queries.tpch_extra",
    "streamprocessing_spark.queries.curation",
    "streamprocessing_spark.queries.quality",
    "streamprocessing_spark.queries.timeseries",
    "streamprocessing_spark.queries.layout",
    "streamprocessing_spark.queries.graph",
    "streamprocessing_spark.queries.dedup",
    "streamprocessing_spark.queries.similarity",
    "streamprocessing_spark.queries.text",
    "streamprocessing_spark.queries.multimodal",
    "streamprocessing_spark.queries.streaming",
    "streamprocessing_spark.queries.rainstorm",
)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def _load() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    # Python-side operators (mapInPandas kernels) must serialize by value
    # so executors never need this package on their sys.path.
    from streamprocessing_spark.shipping import ensure_shippable

    ensure_shippable()


def all_specs() -> dict[str, QuerySpec]:
    _load()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
