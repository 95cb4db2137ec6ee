"""Query registry — the single source of truth for the driver contract.

Every operator the engine implements registers a named query here:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string
DuckDB runs on the same parquet views. ``__spark_entry__.py`` simply
re-exports this registry.

Conventions (SURVEY.md §7 risk register):
- alias every computed column identically in Spark and SQL;
- round floating aggregates (sum→2dp, avg/score→4-6dp) so IEEE
  summation-order differences between engines can't flip the hash;
- prefer DATE / string / int output columns over raw timestamps
  (testdata mixes ms and ns units);
- deterministic tie-breaks on every rank/top-k/dedup.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "project_orbit_spark.operators.relational",
    "project_orbit_spark.operators.joins",
    "project_orbit_spark.operators.windows",
    "project_orbit_spark.operators.dedup",
    "project_orbit_spark.operators.skew",
    "project_orbit_spark.operators.sketches",
    "project_orbit_spark.functions.textbank",
    "project_orbit_spark.functions.textquality",
    "project_orbit_spark.functions.extraction",
    "project_orbit_spark.functions.predicates",
    "project_orbit_spark.functions.inference",
    "project_orbit_spark.functions.html_extract",
    "project_orbit_spark.similarity.cosine",
    "project_orbit_spark.similarity.retrieval",
    "project_orbit_spark.similarity.lsh",
    "project_orbit_spark.streaming.windows",
    "project_orbit_spark.streaming.incremental",
    "project_orbit_spark.streaming.stateful",
    "project_orbit_spark.multimodal.binary_ops",
    "project_orbit_spark.gold.payload",
    "project_orbit_spark.gold.pipelines",
)

_loaded = False


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench, tags=tags)
        return fn

    return deco


def _load() -> None:
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _loaded = True


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def get_query(name: str) -> Query:
    _load()
    return _REGISTRY[name]


def query_map() -> dict[str, QueryFn]:
    """name -> callable, the shape __spark_entry__.queries() returns."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_map() -> dict[str, str]:
    """name -> DuckDB SQL for every oracle-able query."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}


def bench_queries() -> dict[str, Query]:
    return {name: q for name, q in all_queries().items() if q.bench}
