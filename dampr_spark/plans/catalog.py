"""Query catalog: every SURVEY.md §2 operator as a named DataFrame query
paired with an ANSI-SQL oracle that DuckDB runs over the same parquet.

Registry contract (the driver's correctness gate):
- ``builder(spark, sf_dir) -> DataFrame`` — the Spark-side plan.
- ``oracle`` — equivalent DuckDB SQL, or ``None`` for non-SQL-expressible ops
  (the driver then records a weaker rows-only check).
- Column names are aliased identically on both sides; double-typed aggregates
  are rounded identically on both sides (the compare hashes values).

Queries live in sibling modules grouped by domain; importing this module
imports them all so the registry is complete.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, CatalogQuery] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query builder to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog query {name!r}")
        _REGISTRY[name] = CatalogQuery(
            name=name, builder=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tuple(tags)
        )
        return fn

    return deco


def _load_all() -> None:
    # Import side effect populates the registry.
    from dampr_spark.plans import dedupops, eventops, relational, textops, vectorops  # noqa: F401


def all_queries() -> dict[str, CatalogQuery]:
    _load_all()
    return dict(_REGISTRY)


def get_query(name: str) -> CatalogQuery:
    _load_all()
    return _REGISTRY[name]


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """name -> builder, for ``__spark_entry__.queries()``."""
    return {n: q.builder for n, q in all_queries().items()}


def oracle_map() -> dict[str, str]:
    """name -> oracle SQL (only queries that have one), for
    ``__spark_entry__.oracle_sql()``."""
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}
