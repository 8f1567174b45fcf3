"""Additional sources/sinks beyond parquet+CSV: JSON scan, ORC
round-trip, hive-partitioned write with partition pruning, bucketed
tables for shuffle-free joins.

Scale notes: the partitioned sink is the canonical 100 TB layout —
``partitionBy`` on a low-cardinality column gives free partition pruning
on read; bucketing pre-shuffles a fact table once at write time so every
later equi join/agg on the bucket key skips its exchange entirely.

Format-coverage note: Avro (``from_avro``/``to_avro``) was evaluated
and is NOT registered — this container ships pyspark without the
external spark-avro jar (AVRO_NOT_LOADED), and installs are out of
scope.  XML is covered twice: the expression path (``from_xml``,
operators/functions.py fn_xml_parse) and the native file source
(``scan_xml`` below — Spark 4 ships the built-in ``xml`` format, no
external package needed).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog, sink_dir
from ..registry import query
from .dirhash_pipeline import HASHTREE


@query(
    "scan_json_lines",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS totalprice
    FROM orders WHERE o_orderkey % 25 = 0
    """,
    tags=("scan", "json"),
)
def scan_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source round-trip: write a subset as JSONL, scan it
    back with explicit schema (schema-on-read; inference would also
    work but an explicit StructType is the production shape)."""
    cat = Catalog(spark, sf_dir)
    out = sink_dir("orders_jsonl", sf_dir)
    subset = cat.orders.where(F.col("o_orderkey") % 25 == 0).select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("totalprice")
    )
    subset.write.mode("overwrite").json(out)
    return spark.read.schema("o_orderkey BIGINT, o_orderstatus STRING, totalprice DOUBLE").json(out)


@query(
    "scan_xml",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, round(c_acctbal, 2) AS acctbal
    FROM customer WHERE c_custkey % 10 = 0
    """,
    tags=("scan", "xml"),
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source round-trip via Spark 4's built-in ``xml`` format
    (upstreamed from spark-xml; no external jar): write a customer
    subset as ``<customers><customer>...</customer></customers>``
    documents, scan them back with an explicit schema and ``rowTag``.

    Scale note: the XML reader splits by rowTag across files but a
    single huge document is one task — at 100 TB the layout must be
    many row-tagged files (as written here), never one document; parse
    cost makes XML an ingest-then-convert-to-parquet format, which is
    exactly the round-trip this query exercises.
    """
    cat = Catalog(spark, sf_dir)
    out = sink_dir("customer_xml", sf_dir)
    subset = cat.customer.where(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", "c_name", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal")
    )
    subset.write.mode("overwrite").format("xml").option("rootTag", "customers").option(
        "rowTag", "customer"
    ).save(out)
    return (
        spark.read.format("xml")
        .option("rowTag", "customer")
        .schema("c_custkey BIGINT, c_name STRING, c_mktsegment STRING, acctbal DOUBLE")
        .load(out)
    )


@query(
    "sink_orc",
    oracle="""
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
    FROM supplier
    """,
    tags=("sink", "orc"),
)
def sink_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/scan round-trip (columnar alternative to parquet;
    same vectorized reader path in Spark)."""
    cat = Catalog(spark, sf_dir)
    out = sink_dir("supplier_orc", sf_dir)
    cat.supplier.select(
        "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal")
    ).write.mode("overwrite").orc(out)
    return spark.read.orc(out)


@query(
    "sink_parquet_partitioned",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("sink", "partitioning"),
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet sink + pruned scan: write partitioned by
    o_orderstatus, read back with a partition filter — the scan touches
    only the o_orderstatus=F directory (PartitionFilters in the plan),
    which is how a 100 TB table avoids reading 100 TB."""
    cat = Catalog(spark, sf_dir)
    out = sink_dir("orders_by_status", sf_dir)
    staged = cat.orders.select("o_orderkey", "o_custkey", "o_orderstatus")
    staged.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    # explicit schema: a zero-row write leaves no data files to infer
    # from — empty input must read back as an empty table, not crash
    return (
        spark.read.schema(staged.schema).parquet(out)
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


@query(
    "join_bucketed",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("join", "bucketing"),
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both sides written bucketed on the join
    key (8 buckets), so the join reads matching buckets directly — no
    exchange on either side at read time.  The one-time bucketing write
    replaces the per-query shuffle: the amortization that matters when
    the same fact table joins on the same key daily at 100 TB."""
    cat = Catalog(spark, sf_dir)
    warehouse = os.path.join(tempfile.gettempdir(), "dirhash_spark_warehouse")
    spark.sql("CREATE DATABASE IF NOT EXISTS dirhash_bench")
    for name, df, key in (
        ("orders_b", cat.orders.select("o_orderkey", "o_custkey", "o_totalprice"), "o_custkey"),
        ("customer_b", cat.customer.select("c_custkey", "c_mktsegment"), "c_custkey"),
    ):
        # External table path: the warehouse dir is a static conf, so give
        # each table an explicit location under tmp instead.
        spark.sql(f"DROP TABLE IF EXISTS dirhash_bench.{name}")
        df.write.mode("overwrite").option(
            "path", os.path.join(warehouse, name)
        ).bucketBy(8, key).sortBy(key).saveAsTable(f"dirhash_bench.{name}")
    o = spark.table("dirhash_bench.orders_b")
    c = spark.table("dirhash_bench.customer_b")
    # hint("merge"): at test SF Catalyst would broadcast the small side,
    # hiding the point; at 100 TB neither side broadcasts, and the SMJ
    # over co-bucketed scans runs with ZERO exchange before the join
    # (asserted in tests/test_plans.py).
    return (
        o.hint("merge")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "sink_parquet_clustered",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, round(l_extendedprice, 2) AS price
    FROM lineitem WHERE l_shipdate >= DATE '1995-01-01'
    """,
    tags=("sink", "layout"),
)
def sink_parquet_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-sizing + clustering at write time — the other half of the
    100 TB layout story (sink_parquet_partitioned handles pruning):

    - ``repartition(8)`` caps the file count (a daily 100 TB append with
      default parallelism writes millions of small files; explicit
      repartition → files sized to maxPartitionBytes for readers);
    - ``sortWithinPartitions(l_shipdate)`` clusters each file's row
      groups by ship date, so parquet min/max row-group statistics turn
      later date-range scans into row-group skips — z-order-lite, zero
      extra shuffle (the sort rides the repartition exchange).
    """
    cat = Catalog(spark, sf_dir)
    out = sink_dir("lineitem_clustered", sf_dir)
    (
        cat.lineitem.select(
            "l_orderkey", "l_linenumber", "l_shipdate", F.round("l_extendedprice", 2).alias("price")
        )
        .repartition(8)
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out).where(F.col("l_shipdate") >= "1995-01-01")


@query(
    "scan_binary_file",
    # DuckDB's read_blob is the independent recursive reader; Spark's
    # binaryFile source skips zero-length files, so the oracle filters
    # size > 0.  Bytes travel as an uppercase-hex STRING (injective, and
    # identical between Spark F.hex and DuckDB hex): the driver harness
    # canonicalizes result frames with pandas, which cannot hash raw
    # bytearray cells (r4 ERR).  One fixture file is not valid UTF-8, so
    # hex — not a VARCHAR cast — is the faithful rendering.  The path
    # interpolates the checkout-relative HASHTREE constant, same as
    # dirhash_pipeline's oracles — a literal path would break the
    # cross-engine check in any other checkout location.
    oracle=f"""
    SELECT replace(filename, '{HASHTREE}/', '') AS rel_path,
           CAST(size AS BIGINT) AS length,
           hex(content) AS content_hex
    FROM read_blob('{HASHTREE}/**')
    WHERE size > 0
    """,
    tags=("scan", "binary"),
)
def scan_binary_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in binaryFile source over the fixture tree (REF
    A1/A2 analog: whole-file bytes + metadata in one recursive scan;
    the chunked path in dirhash/chunks.py is for files larger than one
    task should hold).  modificationTime excluded (not reproducible)."""
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(HASHTREE)
        .select(
            F.regexp_replace("path", r"^file:.*?/hashtree/", "").alias("rel_path"),
            "length",
            F.hex("content").alias("content_hex"),
        )
        .orderBy("rel_path")
    )


def _morton16(a, b):
    """Interleave the low 16 bits of two int columns into a 32-bit
    Morton (Z-order) code, JVM-side: bit i of a → bit 2i, bit i of b →
    bit 2i+1.  Unrolled statically (shift amounts must be literals)."""
    code = F.lit(0).cast("long")
    for i in range(16):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        code = code.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return code


@query(
    "sink_parquet_zorder",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(epoch(o_orderdate) / 86400 AS BIGINT) AS day_no,
           round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 200
    """,
    tags=("sink", "layout", "zorder"),
)
def sink_parquet_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering: sort the write by the Morton interleave of
    (custkey, order day), so parquet row groups are tight in BOTH
    dimensions at once — min/max statistics then skip row groups for
    range predicates on either column, where a single-column sort only
    helps its own column.  This is the manual form of Delta/Iceberg
    OPTIMIZE ZORDER BY, built from plain bitwise expressions.  The
    oracle checks the clustering is semantics-neutral (same rows back
    under a custkey range scan)."""
    cat = Catalog(spark, sf_dir)
    out = sink_dir("orders_zorder", sf_dir)
    day_no = F.unix_date(F.to_date("o_orderdate")).cast("long")
    base = cat.orders.select(
        "o_orderkey",
        "o_custkey",
        day_no.alias("day_no"),
        F.round("o_totalprice", 2).alias("price"),
    )
    (
        base.withColumn("z", _morton16(F.col("o_custkey").cast("long"), F.col("day_no")))
        .repartition(8)
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(out)
    )
    return spark.read.parquet(out).where(F.col("o_custkey").between(100, 200))


@query(
    "scan_text_lines",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) || '|' || lang AS value
    FROM documents WHERE doc_id % 10 = 0
    """,
    tags=("scan", "text"),
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text source round-trip: write one line per record, read
    back with spark.read.text (the raw-corpus ingestion shape — one
    line = one value column, parsing deferred to expressions)."""
    cat = Catalog(spark, sf_dir)
    out = sink_dir("docs_txt", sf_dir)
    (
        cat.documents.where(F.col("doc_id") % 10 == 0)
        .select(F.concat_ws("|", F.col("doc_id").cast("string"), "lang").alias("value"))
        .write.mode("overwrite")
        .text(out)
    )
    return spark.read.text(out)


@query(
    "sink_upsert_parquet",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 100 = 0
                THEN round(o_totalprice + 1000, 2)
                ELSE round(o_totalprice, 2) END AS totalprice,
           CASE WHEN o_orderkey % 100 = 0 THEN 'updated' ELSE 'base' END AS src
    FROM orders
    """,
    tags=("sink", "upsert"),
)
def sink_upsert_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert/merge on plain parquet — the pattern when no transactional
    table format is available: updates ⟕-anti the base (keep unmatched
    base rows), union the updates, rewrite.  One shuffle-free anti join
    when updates broadcast (they usually do: updates ≪ base); at table
    scale, partition the base and rewrite ONLY partitions containing
    updated keys (partition pruning bounds the rewrite, not the table).
    The oracle is the merged state."""
    cat = Catalog(spark, sf_dir)
    out = sink_dir("orders_upserted", sf_dir)
    base = cat.orders.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), F.lit("base").alias("src")
    )
    updates = (
        cat.orders.where(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") + 1000, 2).alias("totalprice"),
            F.lit("updated").alias("src"),
        )
    )
    merged = base.join(
        F.broadcast(updates.select("o_orderkey")), "o_orderkey", "left_anti"
    ).unionByName(updates)
    merged.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@query(
    "scan_parquet_schema_evolution",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS total,
           CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS status
    FROM orders
    """,
    tags=("scan", "schema"),
)
def scan_parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet batches written at
    different times with different schemas (a ``status`` column added in
    the second batch) read back as ONE dataset via ``mergeSchema`` —
    rows from the older batch surface NULL for the added column.

    This is the long-lived-dataset reality at 100 TB: columns get added
    over years and nobody rewrites petabytes of history; footer-merging
    on read (cheap: schemas only) is the standard answer, with the
    caveat that merge is additive-only — type CHANGES need a rewrite or
    a cast-on-read view.  The oracle states the expected merged content
    directly over the source table (old-batch rows must carry NULL
    status), so a merge that dropped, misaligned, or backfilled the
    added column fails the hash.  DuckDB's ``union_by_name`` over the
    same files was cross-checked during development and agrees.
    """
    cat = Catalog(spark, sf_dir)
    out = sink_dir("schema_evo", sf_dir)
    base = cat.orders.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("total"), "o_orderstatus"
    )
    (
        base.where(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "total")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "b1"))
    )
    (
        base.where(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "total", F.col("o_orderstatus").alias("status"))
        .write.mode("overwrite")
        .parquet(os.path.join(out, "b2"))
    )
    return (
        spark.read.option("mergeSchema", True)
        .parquet(os.path.join(out, "b1"), os.path.join(out, "b2"))
        .select("o_orderkey", "total", "status")
    )


@query(
    "maintenance_compact",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_rows,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("sink", "maintenance", "compaction"),
)
def maintenance_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: explode the orders table into 64 tiny
    files (the state a streaming append or over-parallel write leaves
    behind), then compact to 4 right-sized files and prove the rewrite
    lossless by aggregating the compacted copy against the source-table
    oracle.

    The compaction itself is the canonical maintenance job: one
    ``repartition(4)`` round-trip, no logic — at 100 TB the same job
    runs per partition-directory with the target file count sized to
    ``maxPartitionBytes`` so readers get full-split scans instead of
    per-file task overhead (the many-small-files tax is task scheduling
    and footer reads, not bytes).  ``spark.read`` of the compacted dir
    feeds the returned aggregate, so the correctness check covers the
    full write→read cycle, and a local test pins the file counts.
    """
    cat = Catalog(spark, sf_dir)
    frag = sink_dir("orders_fragmented", sf_dir)
    compact = sink_dir("orders_compacted", sf_dir)
    cat.orders.repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(compact)
    return (
        spark.read.parquet(compact)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "scan_python_datasource",
    oracle="""
    SELECT i AS id, (i * i) % 97 AS val
    FROM generate_series(0, 7999) t(i)
    """,
    tags=("scan", "datasource", "spark4"),
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4's ``pyspark.sql.datasource``):
    a partition-parallel synthetic source — 8 planned input partitions,
    each generating its own id range executor-side.  This is the
    extension point for reading systems Spark has no connector for
    (internal APIs, bespoke formats): ``partitions()`` declares the
    split so reads parallelize like any file scan, and each
    ``read(partition)`` streams rows via Arrow.

    Deterministic contents (val = id² mod 97) make the source exactly
    oracle-checkable — proving the rows really came through the custom
    reader path, not just that it ran.
    """
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _RangePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class _SynthReader(DataSourceReader):
        def partitions(self):
            return [_RangePartition(i * 1000, (i + 1) * 1000) for i in range(8)]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield (i, (i * i) % 97)

    class _SynthSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "dirhash_synthseq"

        def schema(self) -> str:
            return "id BIGINT, val BIGINT"

        def reader(self, schema):
            return _SynthReader()

    spark.dataSource.register(_SynthSource)
    return spark.read.format("dirhash_synthseq").load()


@query(
    "sink_time_travel",
    # The oracle derives both snapshot states from the source table: v1
    # is the base projection, v2 re-prices 'F' orders down 10%.  Reading
    # each version back through the manifest must reproduce exactly
    # these aggregates.
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
    ),
    v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'F'
                  THEN floor(round(o_totalprice, 2) * 0.9 * 100 + 0.5) / 100
                  ELSE round(o_totalprice, 2) END AS price
      FROM orders
    )
    SELECT 1 AS version, count(*) AS n_rows,
           CAST(sum(CAST(floor(price * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM v1
    UNION ALL
    SELECT 2, count(*),
           CAST(sum(CAST(floor(price * 100 + 0.5) AS BIGINT)) AS BIGINT)
    FROM v2
    """,
    tags=("sink", "versioning", "time-travel"),
)
def sink_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-versioned parquet sink with time-travel reads — the
    lakehouse pattern (Delta/Iceberg's core mechanic) on plain files:
    each write lands in an immutable ``v=N`` directory and a tiny
    manifest file is (re)written LAST to point at the current version.
    Readers resolve the manifest (or any pinned historical version)
    and read exactly one snapshot directory — writers never mutate a
    published snapshot, so concurrent readers are isolated for free and
    rollback is "point the manifest back".

    At scale the only thing that grows is data under ``v=N``; the
    manifest stays one small JSON whose rewrite is the atomic commit
    point (object stores rename/put atomically at this size).  Time
    travel = reading a non-current version, verified here by returning
    per-version aggregates of BOTH snapshots read back through the
    version resolver.
    """
    import json

    cat = Catalog(spark, sf_dir)
    root = sink_dir("orders_versioned", sf_dir)
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    manifest = os.path.join(root, "_manifest.json")

    def publish(df, version: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(root, f"v={version}"))
        # Manifest written AFTER the data: the commit point.
        with open(manifest, "w") as f:
            json.dump({"current": version}, f)

    def read_version(version: int | None):
        with open(manifest) as f:
            current = json.load(f)["current"]
        v = current if version is None else version
        if not 1 <= v <= current:
            raise ValueError(f"version {v} out of range 1..{current}")
        return spark.read.parquet(os.path.join(root, f"v={v}"))

    v1 = cat.orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("price"),
    )
    publish(v1, 1)
    # floor-scale, not round(): cross-engine round() on binary doubles
    # diverges on ties; floor(x*0.9*100 + 0.5)/100 states one IEEE
    # sequence both engines reproduce bit-exactly.
    v2 = read_version(None).withColumn(
        "price",
        F.when(
            F.col("o_orderstatus") == "F",
            F.floor(F.col("price") * 0.9 * 100 + 0.5) / 100,
        ).otherwise(F.col("price")),
    )
    publish(v2, 2)

    def summarize(version: int):
        # Integer-cents sum, not round(sum(double)): per-row floor to
        # cents is exact on already-2-decimal prices, and a BIGINT sum
        # is order-independent — round(sum(...)) on doubles could flake
        # on a tie-adjacent total because each engine sums in its own
        # order (the repo's floor-scale discipline, applied to the
        # aggregate as well as the row values).
        return read_version(version).agg(
            F.lit(version).alias("version"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.floor(F.col("price") * 100 + F.lit(0.5)).cast("long")).alias(
                "total_cents"
            ),
        ).select("version", "n_rows", "total_cents")

    # time travel: v1 is still readable after v2 became current
    return summarize(1).unionByName(summarize(2))


@query(
    "join_dynamic_partition_prune",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
    )
    SELECT f.ship_month,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, l_extendedprice
          FROM lineitem) f
    JOIN dim USING (ship_month)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("join", "partition", "scale"),
)
def join_dynamic_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (DPP): the fact table is laid out
    partitioned by ship month, and the month set to read is only known
    at RUNTIME (it comes out of a filtered dim-side subquery) — Spark
    inserts a ``dynamicpruning`` subquery into the fact scan's
    PartitionFilters, so only the matching month directories are ever
    listed and read.  At 100 TB this is the third leg of the pruning
    tripod next to static partition pruning (sink_parquet_partitioned)
    and runtime bloom filters (DESIGN.md): a selective dim filter
    cutting the fact I/O itself, before any join executes.

    The write side pays one shuffle-free partitioned write (84 month
    directories at TPC-H date range); the read-back joins on the
    partition column with a broadcastable dim, the DPP-qualifying
    shape.  Revenue is exact cents (BIGINT), so the post-prune
    aggregate hash-matches the oracle, which states the same join
    unpartitioned — two different I/O strategies, one answer."""
    cat = Catalog(spark, sf_dir)
    out = sink_dir("lineitem_by_month", sf_dir)
    (
        cat.lineitem.select(
            F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
            "l_extendedprice",
        )
        .write.mode("overwrite")
        .partitionBy("ship_month")
        .parquet(out)
    )
    # explicit schema: a zero-row write leaves no data files to infer from
    fact = spark.read.schema("l_extendedprice double, ship_month string").parquet(out)
    dim = (
        cat.orders.where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 150000)
        )
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("ship_month"))
        .distinct()
    )
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
    return (
        fact.join(dim, "ship_month")
        .groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(cents).cast("bigint").alias("revenue_cents"),
        )
        .orderBy("ship_month")
    )


@query(
    "scan_nested_pruning",
    oracle="""
    SELECT o_orderkey,
           o_totalprice AS price
    FROM orders
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 100000
    ORDER BY o_orderkey
    """,
    tags=("scan", "nested", "pruning"),
)
def scan_nested_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-schema pruning + filter pushdown THROUGH a struct: orders
    are re-laid-out with their attributes packed into a struct column
    (`info: {priority, price, status}` — the shape every
    denormalized/event payload table has), then the read-back selects
    ONE struct field and filters on another.  With
    ``nestedSchemaPruning`` (on by default) the parquet ReadSchema
    shows only the two leaves — not the whole struct — so at 100 TB a
    wide payload struct costs only the fields a query touches.  The
    oracle states the same rows from the flat table; the struct
    round-trip plus pruning must be semantics-free."""
    cat = Catalog(spark, sf_dir)
    out = sink_dir("orders_nested", sf_dir)
    (
        cat.orders.select(
            "o_orderkey",
            F.struct(
                F.col("o_orderpriority").alias("priority"),
                F.col("o_totalprice").alias("price"),
                F.col("o_orderstatus").alias("status"),
            ).alias("info"),
        )
        .write.mode("overwrite")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .where(
            (F.col("info.priority") == "1-URGENT")
            & (F.col("info.price") > 100000)
        )
        .select("o_orderkey", F.col("info.price").alias("price"))
        .orderBy("o_orderkey")
    )


@query(
    "scan_csv_multiline",
    # The CSV is generated from nation with embedded newlines injected
    # into the comment field; the oracle states the expected parse from
    # the clean source table directly.
    oracle="""
    SELECT n_nationkey,
           n_name,
           'line1 ' || n_name || chr(10) || 'line2 ' || CAST(n_regionkey AS VARCHAR)
             AS note
    FROM nation ORDER BY n_nationkey
    """,
    tags=("scan", "csv", "parse"),
)
def scan_csv_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV with embedded newlines inside quoted fields (``multiLine``):
    the parse mode that completes the malformed-CSV matrix (PERMISSIVE
    / DROPMALFORMED / corrupt-record capture / and now quoted
    newlines).  The fixture is generated by writing nation rows whose
    note field CONTAINS a newline through Spark's own CSV writer
    (which quotes it correctly), then read back with
    ``multiLine=true`` — without the option, each record would split
    at the embedded newline and shred the file.

    Scale note: multiLine CSV is the one read mode that is NOT
    splittable (a record boundary can't be found mid-file), so each
    file parses as one task — the docstring-level warning is: land
    multiline CSV as many medium files, or convert to parquet at the
    edge; this operator exists to make that trade explicit."""
    cat = Catalog(spark, sf_dir)
    out = sink_dir("nation_mlcsv", sf_dir)
    note = F.concat(
        F.lit("line1 "),
        F.col("n_name"),
        F.lit("\n"),
        F.lit("line2 "),
        F.col("n_regionkey").cast("string"),
    )
    (
        cat.nation.select("n_nationkey", "n_name", note.alias("note"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(out)
    )
    return (
        spark.read.option("header", True)
        .option("multiLine", True)
        .csv(out)
        .select(
            F.col("n_nationkey").cast("int").alias("n_nationkey"),
            "n_name",
            "note",
        )
        .orderBy("n_nationkey")
    )


@query(
    "sql_exchange_reuse",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM lineitem GROUP BY 1
    ),
    top5 AS (
      SELECT l_suppkey, cents, 'top' AS bucket
      FROM rev ORDER BY cents DESC, l_suppkey LIMIT 5
    ),
    bot5 AS (
      SELECT l_suppkey, cents, 'bottom' AS bucket
      FROM rev ORDER BY cents ASC, l_suppkey LIMIT 5
    )
    SELECT l_suppkey, CAST(cents AS BIGINT) AS cents, bucket
    FROM (SELECT * FROM top5 UNION ALL SELECT * FROM bot5)
    ORDER BY bucket, l_suppkey
    """,
    tags=("sql", "plan", "scale"),
)
def sql_exchange_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange reuse: the top-5 and bottom-5 revenue suppliers both
    consume the SAME per-supplier aggregate — Spark detects the two
    identical shuffle subtrees and plans ONE exchange with a
    ReusedExchange reading it (plan-asserted), so the corpus-sized
    aggregation is paid once even though the program references it
    twice.  This is the free sibling of explicit ``.cache()``: no
    memory pinning, works across any identical subplans in one action.
    Each branch then reduces via TakeOrderedAndProject (no global
    sort).  Exact cents arithmetic for the oracle."""
    cat = Catalog(spark, sf_dir)
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint")
    rev = cat.lineitem.groupBy("l_suppkey").agg(F.sum(cents).alias("cents"))
    top = (
        rev.orderBy(F.col("cents").desc(), "l_suppkey")
        .limit(5)
        .withColumn("bucket", F.lit("top"))
    )
    bot = (
        rev.orderBy(F.col("cents").asc(), "l_suppkey")
        .limit(5)
        .withColumn("bucket", F.lit("bottom"))
    )
    return (
        top.unionByName(bot)
        .select("l_suppkey", F.col("cents").cast("bigint").alias("cents"), "bucket")
        .orderBy("bucket", "l_suppkey")
    )


@query(
    "sink_csv_roundtrip",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
    FROM customer WHERE c_custkey % 10 = 0
    """,
    tags=("sink", "csv"),
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink/scan round-trip, completing the sink matrix next to
    parquet/ORC/JSONL.  Money rides as integer cents: CSV is a TEXT
    format, so a double column would round-trip through decimal
    rendering (engine-formatting territory) — integers are re-parsed
    bit-exactly.  Written with header, read back with explicit schema
    (inference on the read side is the scan_csv_infer query's job)."""
    cat = Catalog(spark, sf_dir)
    out = sink_dir("customer_csv", sf_dir)
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    cat.customer.where(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", "c_mktsegment", cents.alias("acctbal_cents")
    ).write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema(
        "c_custkey BIGINT, c_mktsegment STRING, acctbal_cents BIGINT"
    ).option("header", True).csv(out)
