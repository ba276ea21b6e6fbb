"""Query catalog registry.

Every operator family from SURVEY.md §2 is expressed as a named query:
a Spark DataFrame function ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs
over the same parquet tables. The driver compares row count + schema +
order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- float aggregates go through exact decimal arithmetic and a single
  final cast to double (bit-identical regardless of row order);
- timestamps are compared at millisecond floor (``unix_millis`` ≡
  ``epoch_ms``) or formatted to seconds, never raw (parquet ns truncates
  differently in the two engines).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a catalog query (and optional DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, tags, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Name → Query for the full catalog (imports all plan modules)."""
    import flink_spark.plans  # noqa: F401  (registers on import)

    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracles() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle}
