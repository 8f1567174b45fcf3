"""UDF surfaces (SURVEY §2.B B46-B48): row UDF, pandas UDAF, mapInPandas
UDTF.

These exist to prove the extension surface, with the cost model stated:
a row-at-a-time Python UDF (B46) pays per-row serialization — fine for
a demo, wrong for a hot path; the pandas UDAF (B47) and mapInPandas
UDTF (B48) move data via Arrow in columnar batches (~10-100× faster) and
are the sanctioned shapes for custom logic the built-ins can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..catalog import Catalog
from ..registry import query


@query(
    "udf_python",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debtor'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier
    FROM customer
    """,
    tags=("udf",),
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B46: scalar Python UDF (row-at-a-time; the slow path, kept tiny)."""
    cat = Catalog(spark, sf_dir)

    @F.udf(returnType=StringType())
    def tier(bal: float) -> str:
        if bal < 0:
            return "debtor"
        if bal < 5000:
            return "standard"
        return "premium"

    return cat.customer.select("c_custkey", tier("c_acctbal").alias("tier"))


@query(
    "udaf_pandas",
    oracle="""
    SELECT l_returnflag,
           floor(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                          * CAST(l_quantity AS BIGINT)) AS DOUBLE)
                 / (100 * sum(CAST(l_quantity AS BIGINT))) * 10000) / 10000
             AS weighted_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf", "udaf"),
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B47: grouped-agg pandas UDAF (Arrow batches; quantity-weighted
    mean price per return flag).

    The UDAF reduces to EXACT integer sufficient statistics (per-row
    price cents × integer quantity) before the one float division:
    pandas' pairwise float sum and DuckDB's sequential sum drift in
    low-order bits, and the floor(×1e4) output rounding amplifies a
    sub-1e-4 drift into a visible mismatch as row counts grow —
    integer sums are order-invariant, and the single int/int division
    is exactly rounded on both engines (the agg_regression idiom)."""
    cat = Catalog(spark, sf_dir)

    @F.pandas_udf(DoubleType())
    def weighted_mean(price: pd.Series, qty: pd.Series) -> float:
        import numpy as np

        pc_ = np.floor(price.to_numpy() * 100 + 0.5).astype(np.int64)
        q = np.floor(qty.to_numpy() + 0.5).astype(np.int64)
        return float(int((pc_ * q).sum()) / (100 * int(q.sum())))

    return (
        cat.lineitem.groupBy("l_returnflag")
        .agg(weighted_mean("l_extendedprice", "l_quantity").alias("_w"))
        .select("l_returnflag", (F.floor(F.col("_w") * 10000) / 10000).alias("weighted_price"))
    )


_EXPAND_SCHEMA = StructType(
    [
        StructField("n_nationkey", IntegerType(), False),
        StructField("seq", LongType(), False),
        StructField("tag", StringType(), False),
    ]
)


@query(
    "udtf_map_in_pandas",
    oracle="""
    SELECT n_nationkey,
           CAST(unnest(generate_series(0, n_nationkey % 3)) AS BIGINT) AS seq,
           n_name || '#' || CAST(unnest(generate_series(0, n_nationkey % 3)) AS VARCHAR) AS tag
    FROM nation
    """,
    tags=("udf", "udtf"),
)
def udtf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B48: table function via mapInPandas — each input row yields
    1..3 output rows (the 1→N shape of decoders, frame samplers,
    chunkers)."""
    cat = Catalog(spark, sf_dir)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, seqs, tags = [], [], []
            for key, name in zip(pdf["n_nationkey"], pdf["n_name"]):
                for i in range(int(key) % 3 + 1):
                    keys.append(int(key))
                    seqs.append(i)
                    tags.append(f"{name}#{i}")
            yield pd.DataFrame({"n_nationkey": keys, "seq": seqs, "tag": tags})

    return cat.nation.select("n_nationkey", "n_name").mapInPandas(expand, _EXPAND_SCHEMA)


@query(
    "udtf_map_in_arrow",
    oracle="""
    SELECT s_suppkey,
           CAST(unnest(generate_series(0, s_suppkey % 4)) AS BIGINT) AS seq,
           s_name || ':' || CAST(unnest(generate_series(0, s_suppkey % 4)) AS VARCHAR) AS tag
    FROM supplier
    """,
    tags=("udf", "udtf", "arrow"),
)
def udtf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function at the Arrow RecordBatch level (``mapInArrow``) —
    one step lower than mapInPandas: no pandas materialization, the
    Python side sees columnar Arrow buffers directly.  That is the right
    tier for pass-through-heavy transforms (binary payloads, tensors)
    where pandas' object boxing would dominate; this query proves the
    1→N row expansion contract at that tier (each supplier emits
    1..4 rows).
    """
    import pyarrow as pa

    cat = Catalog(spark, sf_dir)

    def expand(batches):
        for rb in batches:
            d = rb.to_pydict()
            keys, seqs, tags = [], [], []
            for k, n in zip(d["s_suppkey"], d["s_name"]):
                for i in range(int(k) % 4 + 1):
                    keys.append(k)
                    seqs.append(i)
                    tags.append(f"{n}:{i}")
            yield pa.RecordBatch.from_pydict(
                {"s_suppkey": keys, "seq": seqs, "tag": tags},
                schema=pa.schema(
                    [("s_suppkey", pa.int64()), ("seq", pa.int64()), ("tag", pa.string())]
                ),
            )

    return cat.supplier.select("s_suppkey", "s_name").mapInArrow(
        expand, "s_suppkey BIGINT, seq BIGINT, tag STRING"
    )


@query(
    "udtf_cogroup_asof",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.event_id, p.ts AS purchase_ts,
           max(c.ts) AS last_click_ts
    FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
    GROUP BY p.user_id, p.event_id, p.ts
    """,
    tags=("udf", "cogroup", "asof"),
)
def udtf_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: each user's purchases and clicks arrive
    as one pandas DataFrame pair, merged with ``pd.merge_asof`` (most
    recent click at-or-before each purchase) — the escape hatch for
    per-key algorithms that genuinely need a dataframe library
    (irregular resampling, curve fitting, ragged joins).

    Spark cogroups both sides with ONE shuffle each, then hands aligned
    Arrow batches to Python.  Crucially the cogroup key is a *hash
    bucket* of the user, not the raw ``user_id``: cogrouped
    applyInPandas pays one Python invocation per group, so keying on
    the natural id means millions of interpreter crossings at scale
    (measured here: 1,500 users → 12.7 s at sf0.1).  Bucketing bounds
    the group count regardless of user cardinality — each call
    receives a whole bucket and ``pd.merge_asof(by="user_id")`` aligns
    the users *inside* the batch, vectorized (same rewrite: 12.7 s →
    ~1 s).  The bucket count scales with the cluster
    (``max(64, 2 * defaultParallelism)``) so the cogrouped stage is
    never capped below the executor count on a large cluster and a
    single hot bucket stays small, while bucket *membership* for a
    given count stays deterministic (pmod-of-xxhash64); the result is
    bucket-count-invariant, so the oracle is unaffected.
    State still never crosses users, so semantics are
    unchanged; the JVM-side twin is ``join_asof``, and this form is the
    escape hatch when per-key logic outgrows SQL.  The oracle states
    the as-of semantics relationally (max click ≤ purchase per
    purchase row).
    """
    cat = Catalog(spark, sf_dir)
    # 2× parallelism: enough buckets that the cogrouped stage is never
    # capped below the executor count on a big cluster, few enough that
    # per-group Python invocation overhead stays amortized (4× measured
    # +0.76 s at sf0.1 on local[32] — 128 near-empty groups).
    n_buckets = max(64, 2 * spark.sparkContext.defaultParallelism)
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)).alias("bucket")
    purchases = cat.events.where(F.col("event_type") == "purchase").select(
        bucket, "user_id", "event_id", "ts"
    )
    clicks = cat.events.where(F.col("event_type") == "click").select(
        bucket, "user_id", "ts"
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("event_id", LongType()),
            StructField("purchase_ts", TimestampType()),
            StructField("last_click_ts", TimestampType()),
        ]
    )

    def asof_merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=["user_id", "event_id", "purchase_ts", "last_click_ts"])
        # merge_asof(by=...) needs both frames sorted on the "on" key;
        # it aligns per-user within the bucket without a Python loop.
        left = left.sort_values("ts")
        merged = pd.merge_asof(
            left,
            right.sort_values("ts").rename(columns={"ts": "last_click_ts"}),
            left_on="ts",
            right_on="last_click_ts",
            by="user_id",
            direction="backward",
        )
        return merged.rename(columns={"ts": "purchase_ts"})[
            ["user_id", "event_id", "purchase_ts", "last_click_ts"]
        ]

    return (
        purchases.groupBy("bucket")
        .cogroup(clicks.groupBy("bucket"))
        .applyInPandas(asof_merge, out_schema)
    )


@query(
    "udtf_group_apply_arrow",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT) * user_id)
                      AS DOUBLE)
                 / sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) * 10000) / 10000
             AS value_weighted_user
    FROM events
    GROUP BY event_type
    """,
    tags=("udf", "arrow", "spark4"),
)
def udtf_group_apply_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInArrow: each event type's rows arrive as ONE
    pyarrow Table (zero pandas boxing — the lowest-overhead grouped
    Python surface), reduced with pyarrow compute kernels to a
    value-weighted mean.  Completes the Arrow tier alongside
    ``udtf_map_in_arrow`` (1→N map) — this is the grouped N→1 shape.

    Same shuffle contract as any groupBy: one exchange on the key,
    whole groups materialize per batch — so per-group cardinality must
    be bounded (here: 5 types × ~events/5), the same constraint as
    collect_list.  The reduction runs over EXACT integer statistics
    (value cents × user_id, both int64) so it is summation-order-
    invariant — Arrow's pc.sum and DuckDB's scan-order sum drift in
    low-order float bits otherwise — and the one int/int division is
    exactly rounded on both engines before the floor (the /100 of the
    cents scaling cancels in the ratio).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    cat = Catalog(spark, sf_dir)

    def weighted(table: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(table.column("value"), 100.0), 0.5)),
            pa.int64(),
        )
        u = pc.cast(table.column("user_id"), pa.int64())
        num = pc.sum(pc.multiply(cents, u)).as_py()
        den = pc.sum(cents).as_py()
        import math

        return pa.table(
            {
                "event_type": [table.column("event_type")[0].as_py()],
                "n": [table.num_rows],
                "value_weighted_user": [math.floor(num / den * 10000) / 10000],
            }
        )

    return (
        cat.events.select("event_type", "user_id", "value")
        .groupBy("event_type")
        .applyInArrow(weighted, "event_type STRING, n BIGINT, value_weighted_user DOUBLE")
    )


@query(
    "udtf_python_chunker",
    # Both engines state the same rule: whitespace tokens, windows of 32
    # starting every 24 (8-token overlap), short tail windows kept.
    # DuckDB list slices are 1-based inclusive: [s+1 : s+32] == Python
    # tokens[s : s+32].
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id, CAST(s // 24 AS INT) AS win_idx,
           CAST(s AS INT) AS start_tok,
           CAST(len(toks[s + 1 : s + 32]) AS INT) AS n_tok,
           array_to_string(toks[s + 1 : s + 32], ' ') AS window_text
    FROM t, unnest(generate_series(0, len(toks) - 1, 24)) AS g(s)
    """,
    tags=("udf", "udtf", "spark4", "chunking"),
)
def udtf_python_chunker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF (`@udtf` class API): a table function the SQL
    layer can LATERAL-join — here the context-window chunker that
    prepares documents for embedding (32-token windows, 8-token overlap
    so boundary semantics survive in at least one window).  This is the
    declared-UDTF surface (class + eval + yield), distinct from the
    mapInPandas/mapInArrow *batch* table functions: the planner places a
    row-wise generator under a Generate, and registration makes it
    callable from SQL.

    Scale: a UDTF is row-at-a-time Python — fine for a 1→N generator
    whose cost is dominated by string work, wrong for bulk numerics
    (use the Arrow tiers; see DESIGN.md's Python boundary policy).
    """
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, win_idx int, start_tok int, n_tok int,"
        " window_text string"
    )
    class ChunkWindows:
        def eval(self, doc_id, text):  # noqa: ANN001 — UDTF protocol
            toks = [t for t in text.split() if t]
            for s in range(0, len(toks), 24):
                win = toks[s : s + 32]
                yield doc_id, s // 24, s, len(win), " ".join(win)

    spark.udtf.register("chunk_windows", ChunkWindows)
    cat = Catalog(spark, sf_dir)
    cat.documents.createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT c.* FROM documents, LATERAL chunk_windows(doc_id, text) c"
    )


@query(
    "query_observe_metrics",
    oracle="""
    SELECT count(*) AS n_rows,
           max(l_orderkey) AS max_orderkey,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    WHERE l_quantity > 10
    """,
    tags=("monitoring", "spark4"),
)
def query_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`df.observe` + `Observation`: named accumulator metrics collected
    as a side effect of one pass — the data-quality/monitoring hook a
    production pipeline attaches to every stage (row counts in/out,
    domain sums) without a second scan.  The observed metrics are
    returned as a one-row DataFrame; the oracle recomputes them
    relationally, proving the accumulator path agrees with a plain
    aggregate.  (DISTINCT aggregates are rejected by CollectMetrics —
    INVALID_OBSERVED_METRICS — so the cardinality probe is a max, not a
    count distinct.)

    Scale: observe() metrics ride the task results of the SAME job —
    zero extra shuffles, zero extra scans, constant driver memory (one
    struct per metric), unlike a .count() + .agg() pair which scans
    twice.
    """
    from pyspark.sql import Observation

    cat = Catalog(spark, sf_dir)
    obs = Observation("lineitem_quality")
    observed = cat.lineitem.where(F.col("l_quantity") > 10).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )
    observed.write.format("noop").mode("overwrite").save()  # one real pass
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["max_orderkey"], m["sum_price"])],
        "n_rows BIGINT, max_orderkey BIGINT, sum_price DOUBLE",
    )


@query(
    "udf_python_arrow",
    oracle="""
    SELECT c_custkey,
           upper(c_name) || '#' || CAST(length(c_name) AS VARCHAR) AS tagged
    FROM customer
    """,
    tags=("udf", "arrow", "spark4"),
)
def udf_python_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (``@udf(useArrow=True)``) —
    the Spark 3.5+/4 middle rung between the row-at-a-time pickled UDF
    (B46, ~100× slow path) and a full ``pandas_udf``: same scalar
    per-value signature as B46 so existing UDF code ports unchanged,
    but arguments cross the boundary as Arrow record batches, not
    pickled rows.  The demo tags each customer name with its length —
    trivially SQL-expressible (the oracle states it natively), which
    is exactly what makes it a clean boundary-correctness probe.  Plan
    shows ArrowEvalPython, not BatchEvalPython."""
    from pyspark.sql.functions import udf

    @udf(returnType="string", useArrow=True)
    def tag(name: str) -> str:
        return f"{name.upper()}#{len(name)}"

    cat = Catalog(spark, sf_dir)
    return cat.customer.select("c_custkey", tag("c_name").alias("tagged"))
