"""Query registry backing ``__spark_entry__``.

Each operator from SURVEY.md §2 registers one named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the equivalent
ANSI SQL a DuckDB oracle can run on the same parquet tables.  Operators
without an exact SQL oracle (approximate sketches, UDF-opaque or stateful
ops) register ``oracle=None`` and get a rows-only check.

Contract details that live here so every operator honors them:
- column names must match between the Spark result and the oracle SQL
  (the comparison sorts columns by name before hashing values);
- floating-point outputs are rounded *inside* the query on both sides
  (summation order differs between engines; rounding makes values
  bit-comparable).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


#: name -> Query; populated by importing dirhash_spark.operators.
REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering an operator query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import all operator modules and return the populated registry."""
    from . import operators  # noqa: F401  (import populates REGISTRY)

    return REGISTRY
