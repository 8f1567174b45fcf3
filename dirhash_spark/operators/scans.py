"""Scans, sources, sinks, projection (SURVEY §2.B B1-B4) + flagship query.

Scale notes: all scans are plain ``spark.read`` file sources — Catalyst
pushes predicates and prunes columns into the parquet reader (visible as
``PushedFilters``/``ReadSchema`` in ``.explain("formatted")``).  The sink
writes partitioned parquet the same way a 1000-executor job would (one
file per task, no driver funnel).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog, sink_dir
from ..registry import query

# Committed engine-owned CSV fixtures (NOT the reference's iris.csv).
_DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "data"
)
CSV_FIXTURE = os.path.join(_DATA_DIR, "sensors.csv")
#: Deliberately malformed CSV: bad casts, wrong arities, empty fields —
#: the first thing a real ingest hits (the reference's only data file is
#: a CSV, /root/reference/test/data/iris.csv).
DIRTY_CSV_FIXTURE = os.path.join(_DATA_DIR, "readings_dirty.csv")

_DIRTY_SCHEMA = "id INT, room STRING, reading DOUBLE, ts STRING"

# DuckDB re-implementation of Spark's CSV parse modes: read raw lines
# (delim that never occurs + no quoting), split, and replicate the
# malformed-row rule observed from Spark's univocity parser —
# a row is malformed iff the token count differs from the schema arity
# or a non-empty token fails its cast (empty string → NULL is *valid*).
_DIRTY_LINES_CTE = f"""
    WITH lines AS (
      SELECT line FROM read_csv('{DIRTY_CSV_FIXTURE}', header=false, delim='|',
                                quote='', columns={{'line': 'VARCHAR'}}, skip=1)
    ),
    parsed AS (
      SELECT line, string_split(line, ',') AS p FROM lines
    ),
    typed AS (
      SELECT line,
             TRY_CAST(NULLIF(p[1], '') AS INTEGER) AS id,
             NULLIF(p[2], '') AS room,
             TRY_CAST(NULLIF(p[3], '') AS DOUBLE) AS reading,
             NULLIF(p[4], '') AS ts,
             (len(p) != 4
              OR (coalesce(p[1], '') != '' AND TRY_CAST(p[1] AS INTEGER) IS NULL)
              OR (coalesce(p[3], '') != '' AND TRY_CAST(p[3] AS DOUBLE) IS NULL)
             ) AS is_malformed
      FROM parsed
    )
"""


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.

    The star join from SURVEY §7 M0 — fact table joins dimensions
    (broadcast: nation/region are tiny, customer comfortably under the
    64 MB threshold at bench SF), then partial+final hash aggregation.

    Money arithmetic follows the repo-wide exact-integer discipline:
    price → cents and discount → basis points via ``floor(x*s + 0.5)``
    (IEEE-identical in both engines), the per-item term
    ``cents * (10000 - bps)`` is an exact BIGINT, and the sum rides
    DECIMAL(38,0) (BIGINT would overflow near sf100: ~1e11/row · 6e9
    rows) before one integer ``div`` back to cents.  No
    engine-dependent float summation order anywhere — the old
    ``round(sum(double), 2)`` form survived 5 rounds on luck, not
    correctness.
    """
    cat = Catalog(spark, sf_dir)
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    bps = F.floor(F.col("l_discount") * 10000 + F.lit(0.5)).cast("long")
    unit = (cents * (F.lit(10000) - bps)).cast("decimal(38,0)")
    return (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.sum(unit).alias("units"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "nation",
            "region",
            F.expr("CAST(units div 10000 AS BIGINT)").alias("revenue_cents"),
            "n_items",
        )
        .orderBy(F.col("revenue_cents").desc())
    )


FLAGSHIP_ORACLE = """
SELECT n_name AS nation, r_name AS region,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (10000 - CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)))
            // 10000 AS BIGINT) AS revenue_cents,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""

query("flagship_revenue_by_nation", oracle=FLAGSHIP_ORACLE, tags=("flagship", "join", "agg"))(flagship)


@query(
    "scan_parquet",
    oracle="SELECT p_partkey, p_name, p_retailprice FROM part WHERE p_size >= 25",
    tags=("scan",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1: parquet scan with pushed-down filter + pruned columns.

    Reference analog: the fixed-binary/listing sources (dirhash.py:277-286,
    339-386); here the source is columnar so the filter and the 3-column
    projection reach the reader.
    """
    cat = Catalog(spark, sf_dir)
    return cat.part.where(F.col("p_size") >= 25).select("p_partkey", "p_name", "p_retailprice")


@query(
    "scan_csv_infer",
    oracle=f"SELECT sensor_id, room, reading, CAST(is_active AS BOOLEAN) AS is_active FROM read_csv('{CSV_FIXTURE}', header=true) ORDER BY sensor_id",
    tags=("scan",),
)
def scan_csv_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2: CSV scan with header + schema inference (REF-adjacent: the
    reference's docker smoke hashes a CSV directory, README.md:63-65)."""
    df = spark.read.option("header", True).option("inferSchema", True).csv(CSV_FIXTURE)
    return df.select(
        F.col("sensor_id").cast("bigint").alias("sensor_id"),
        F.col("room").cast("string").alias("room"),
        F.col("reading").cast("double").alias("reading"),
        F.col("is_active").cast("boolean").alias("is_active"),
    )


@query(
    "scan_csv_permissive",
    oracle=_DIRTY_LINES_CTE + "SELECT id, room, reading, ts FROM typed",
    tags=("scan", "csv"),
)
def scan_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV parse mode over a malformed fixture: every input
    row survives; a field that fails its cast (or is missing because the
    row has too few tokens) becomes NULL, extra tokens are dropped.

    The oracle re-implements the mode in portable SQL (line split +
    TRY_CAST) rather than relying on any reader flag, so the semantics
    being verified are explicit.
    """
    return (
        spark.read.schema(_DIRTY_SCHEMA)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(DIRTY_CSV_FIXTURE)
        .select("id", "room", "reading", "ts")
    )


@query(
    "scan_csv_dropmalformed",
    oracle=_DIRTY_LINES_CTE
    + "SELECT id, room, reading, ts FROM typed WHERE NOT is_malformed",
    tags=("scan", "csv"),
)
def scan_csv_dropmalformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DROPMALFORMED CSV parse mode: rows with a wrong token count or a
    failed non-empty cast are dropped entirely; an empty field is NULL,
    not malformed (default nullValue "")."""
    return (
        spark.read.schema(_DIRTY_SCHEMA)
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(DIRTY_CSV_FIXTURE)
        .select("id", "room", "reading", "ts")
    )


@query(
    "csv_corrupt_records",
    oracle=_DIRTY_LINES_CTE
    + """
    SELECT line AS raw_line, id, room, reading, ts
    FROM typed WHERE is_malformed
    """,
    tags=("scan", "csv"),
)
def csv_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_corrupt_record`` capture: PERMISSIVE parse with the corrupt
    column declared in the schema keeps the raw text of every malformed
    row alongside whatever fields did parse — the audit-trail pattern for
    a production ingest (quarantine the raw lines, load the rest)."""
    df = (
        spark.read.schema(_DIRTY_SCHEMA + ", _corrupt_record STRING")
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(DIRTY_CSV_FIXTURE)
    )
    return df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line"), "id", "room", "reading", "ts"
    )


@query(
    "sink_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem WHERE l_orderkey % 10 = 0
    """,
    tags=("sink",),
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3: parquet sink (write, then scan back — REF analog: archive sink,
    dirhash.py:558-578).  Round-trips a filtered projection through a
    temp parquet dataset; the returned DataFrame reads from the sink, so
    a value match proves the write path preserved data exactly."""
    cat = Catalog(spark, sf_dir)
    out = sink_dir("lineitem_mod10", sf_dir)
    subset = cat.lineitem.where(F.col("l_orderkey") % 10 == 0).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    subset.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@query(
    "project_rename",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS customer_name,
           round(c_acctbal, 2) AS balance, c_mktsegment AS segment
    FROM customer
    """,
    tags=("projection",),
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4: projection + rename (REF analog A3: tagging chunks with their
    path is a projection, dirhash.py:392-402)."""
    cat = Catalog(spark, sf_dir)
    return cat.customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("customer_name"),
        F.round(F.col("c_acctbal"), 2).alias("balance"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "scan_cached_branches",
    oracle="""
    WITH hot AS (
      SELECT o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_totalprice > 150000
    ),
    by_status AS (
      SELECT 'by_status' AS branch, o_orderstatus AS key,
             count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
               / 100 AS total
      FROM hot GROUP BY o_orderstatus
    ),
    by_bucket AS (
      SELECT 'by_custmod' AS branch, CAST(o_custkey % 10 AS VARCHAR) AS key,
             count(*) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
               / 100 AS total
      FROM hot GROUP BY o_custkey % 10
    )
    SELECT * FROM by_status UNION ALL SELECT * FROM by_bucket
    """,
    tags=("scan", "cache", "reuse"),
)
def scan_cached_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized intermediate reuse: one expensive filter feeds two
    independent aggregations — without ``persist`` each branch would
    rescan and refilter the full table (Spark plans branches
    independently; there is no automatic CSE across actions).  With it,
    the filtered set materializes once in memory/disk cache and both
    branches read the cached columnar form (InMemoryTableScan in both
    subtrees — plan-asserted).

    At 100 TB the decision is explicit cost math: cache when
    branch_count × downstream_scan_cost exceeds materialization cost —
    exactly the call a dashboard refresh with a shared base CTE makes.
    ``unpersist`` releases executor memory deterministically rather
    than waiting for LRU pressure — which requires the EAGER tier: the
    branches collect (bounded: |statuses| + 10 rows) before the cache
    is dropped, so the returned frame no longer references it.  Sums
    ride exact per-row cents, not round(sum(double)) — the float sum
    is summation-order-dependent (flagship's fix, DESIGN.md).
    """
    union, hot = _cached_branch_frames(spark, sf_dir)
    try:
        rows = union.collect()  # bounded: |statuses| + 10 rows
    finally:
        hot.unpersist()
    return spark.createDataFrame(
        rows, "branch STRING, key STRING, n BIGINT, total DOUBLE"
    )


def _cached_branch_frames(spark: SparkSession, sf_dir: str):
    """(union, hot): the lazy two-branch aggregation over the persisted
    hot subset — shared by the registered query (which collects it and
    unpersists) and the plan pin in tests/test_plans.py (which asserts
    both subtrees read InMemoryTableScan).  Callers own hot.unpersist()."""
    cat = Catalog(spark, sf_dir)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    hot = (
        cat.orders.where(F.col("o_totalprice") > 150000)
        .select("o_custkey", "o_orderstatus", cents.alias("cents"))
        .persist()
    )
    total = (F.sum("cents").cast("double") / 100).alias("total")
    by_status = hot.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), total
    ).select(
        F.lit("by_status").alias("branch"),
        F.col("o_orderstatus").alias("key"),
        "n",
        "total",
    )
    by_bucket = hot.groupBy((F.col("o_custkey") % 10).alias("b")).agg(
        F.count(F.lit(1)).alias("n"), total
    ).select(
        F.lit("by_custmod").alias("branch"),
        F.col("b").cast("string").alias("key"),
        "n",
        "total",
    )
    return by_status.unionAll(by_bucket), hot
