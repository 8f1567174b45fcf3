"""Named-table catalog over the driver-generated parquet fixtures.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings.  ``load_table`` normalizes physical quirks of
the fixtures (TIMESTAMP(NANOS) columns arrive as int64 under
``nanosAsLong`` and are converted to microsecond timestamps, truncating —
matching DuckDB's ns→us read behavior) so operators see one clean logical
schema regardless of scale factor.

Scale note: every accessor returns a *lazy* DataFrame straight off the
parquet scan — column pruning and predicate pushdown reach the file source
(verify with ``df.explain``: ``PushedFilters``/``ReadSchema``).  Nothing
here collects or caches eagerly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Columns written as parquet TIMESTAMP(NANOS); read as int64 nanos and
#: converted here. (`orders.o_orderdate` / `lineitem.l_shipdate` are
#: TIMESTAMP(MICROS)/NTZ and need no conversion.)
_NANO_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing nano-timestamp columns."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for col in _NANO_TS_COLS.get(name, []):
        if dtypes.get(col) == "bigint":
            # Integer division: nanos exceed 2^53, double math would drift.
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views (for spark.sql operators)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


class Catalog:
    """Convenience handle: ``cat.orders`` etc., one lazy DataFrame each."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return load_table(self.spark, self.sf_dir, name)
        raise AttributeError(name)

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)
