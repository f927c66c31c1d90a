"""Query registry: every SURVEY §2 operator key + the LLM-pipeline extensions.

Each :class:`QuerySpec` binds a name to (a) a PySpark DataFrame implementation
``fn(spark, sf_dir)`` and (b) an equivalent DuckDB oracle SQL string (or None
for non-SQL-expressible ops → the driver records a rows-only check).
Column names/aliases are kept identical between the two by construction.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: frozenset[str] = field(default_factory=frozenset)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc, frozenset(tags))
        return fn
    return deco


def all_queries() -> dict[str, QuerySpec]:
    # import side-effect registration
    from flink_job_spark.queries import (  # noqa: F401
        analytics,
        asof,
        behavior,
        cdc,
        core,
        crawl,
        dedup,
        insights,
        mleval,
        multimodal,
        prep,
        relational,
        similarity,
        sketch,
        text,
        tpch,
        windows,
    )
    return REGISTRY
