"""Scalar function library (SURVEY §2.B B34-B38): strings, date/time,
math + conditional, arrays, JSON.

Everything here is a built-in ``pyspark.sql.functions`` expression —
JVM-side, codegen-friendly, never a Python UDF.  Cross-engine gotchas
handled explicitly: DuckDB's ``year()`` returns BIGINT (cast to INT on
both sides), ``datediff`` argument order differs, JSON scalars are
extracted unquoted and cast to concrete types on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import query


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substr(p_name, 1, 8) AS name_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           trim(p_name) AS name_trimmed,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           CAST(length(p_name) AS INT) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
    FROM part
    """,
    tags=("function", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34: string scalar functions (concat/upper/substr/trim/regexp/lpad)."""
    cat = Catalog(spark, sf_dir)
    return cat.part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.trim("p_name").alias("name_trimmed"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch95,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    """,
    tags=("function", "datetime"),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35: date/time functions (year/month/date_trunc/datediff/cast).

    Spark ``datediff(end, start)`` vs DuckDB ``datediff('day', start,
    end)`` — argument order flipped deliberately to mean the same thing.
    """
    cat = Catalog(spark, sf_dir)
    return cat.orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")).alias(
            "days_since_epoch95"
        ),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@query(
    "fn_math_cond",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 30000.0), 2) AS abs_diff,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           round(power(1.0 + l_tax, 2), 6) AS tax_sq,
           CASE WHEN l_quantity > 40 THEN 'bulk'
                WHEN l_quantity > 15 THEN 'mid'
                ELSE 'small' END AS qty_class,
           coalesce(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    """,
    tags=("function", "math"),
)
def fn_math_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36: math (round/abs/pow/floor) + conditional (CASE, coalesce)."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000.0), 2).alias("abs_diff"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.pow(F.lit(1.0) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.when(F.col("l_quantity") > 40, "bulk")
        .when(F.col("l_quantity") > 15, "mid")
        .otherwise("small")
        .alias("qty_class"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4) AS first_val,
           round(CAST(list_sort(embedding)[1] AS DOUBLE), 4) AS min_val,
           round(CAST(list_sort(embedding)[len(embedding)] AS DOUBLE), 4) AS max_val,
           round(CAST(list_sum(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))) AS DOUBLE), 4) AS head_sum
    FROM embeddings
    """,
    tags=("function", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B37: array functions over the embedding column (size/element_at/
    array_sort/slice/aggregate)."""
    cat = Catalog(spark, sf_dir)
    emb = F.col("embedding")
    # try_element_at, not element_at: the session runs Spark 4's ANSI
    # default, where element_at on an EMPTY array throws
    # INVALID_ARRAY_INDEX_IN_ELEMENT_AT instead of returning NULL — a
    # zero-length embedding (real-pipeline failure output) would kill
    # the whole query where the oracle's embedding[1] is just NULL.
    # head_sum is guarded the same way: DuckDB's list_sum([]) is NULL,
    # Spark's aggregate identity would be 0.0.
    return cat.embeddings.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.try_element_at(emb, F.lit(1)).cast("double"), 4).alias("first_val"),
        F.round(F.array_min(emb).cast("double"), 4).alias("min_val"),
        F.round(F.array_max(emb).cast("double"), 4).alias("max_val"),
        F.round(
            F.when(
                F.size(emb) >= 1,
                F.aggregate(
                    F.slice(emb, 1, 4),
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double"),
                ),
            ),
            4,
        ).alias("head_sum"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
           (CAST(json_extract_string(props, '$.k') AS INT) % 10 = 0) AS k_mod10
    FROM events
    """,
    tags=("function", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B38: JSON scalar extraction from ``events.props`` (cast to a
    concrete type on both sides — extraction returns strings)."""
    cat = Catalog(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return cat.events.select(
        "event_id",
        k.alias("k_value"),
        ((k % 10) == 0).alias("k_mod10"),
    )


@query(
    "fn_struct_nested",
    oracle="""
    WITH s AS (
      SELECT {'key': o_orderkey,
              'fin': {'price': round(o_totalprice, 2), 'status': o_orderstatus}} AS rec
      FROM orders WHERE o_orderkey % 40 = 0
    )
    SELECT rec.key AS okey, rec.fin.price AS price, rec.fin.status AS status,
           upper(rec.fin.status) AS status_u
    FROM s
    """,
    tags=("functions", "struct"),
)
def fn_struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested struct build + field access (the parquet-nested-data
    shape): pack two levels, project fields back out, compute on an
    inner field.  Catalyst flattens the struct round-trip away —
    the plan reads the 3 leaf columns only."""
    cat = Catalog(spark, sf_dir)
    packed = cat.orders.where(F.col("o_orderkey") % 40 == 0).select(
        F.struct(
            F.col("o_orderkey").alias("key"),
            F.struct(
                F.round("o_totalprice", 2).alias("price"),
                F.col("o_orderstatus").alias("status"),
            ).alias("fin"),
        ).alias("rec")
    )
    return packed.select(
        F.col("rec.key").alias("okey"),
        F.col("rec.fin.price").alias("price"),
        F.col("rec.fin.status").alias("status"),
        F.upper("rec.fin.status").alias("status_u"),
    )


@query(
    "fn_interval",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           CAST(o_orderdate - INTERVAL 1 WEEK AS DATE) AS minus_1w,
           last_day(o_orderdate) AS month_end
    FROM orders WHERE o_orderkey % 30 = 0
    """,
    tags=("functions", "datetime", "interval"),
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar interval arithmetic: add_months (end-of-month clamping
    matches SQL INTERVAL MONTH addition in both engines), day-based
    date_sub, last_day."""
    cat = Catalog(spark, sf_dir)
    return cat.orders.where(F.col("o_orderkey") % 30 == 0).select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).alias("plus_3m"),
        F.date_sub("o_orderdate", 7).alias("minus_1w"),
        F.last_day("o_orderdate").alias("month_end"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT o_orderkey,
           coalesce(MAP {o_orderstatus: round(o_totalprice, 2)}['F'][1], -1.0) AS f_price,
           cardinality(MAP {o_orderstatus: round(o_totalprice, 2)}) AS n_keys
    FROM orders WHERE o_orderkey % 30 = 0
    """,
    tags=("functions", "map"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map type: build a map column, look up a key with a null-safe
    default, take its cardinality (the map-column shape of sparse
    feature/attribute data in parquet)."""
    cat = Catalog(spark, sf_dir)
    m = F.create_map(F.col("o_orderstatus"), F.round("o_totalprice", 2))
    return cat.orders.where(F.col("o_orderkey") % 30 == 0).select(
        "o_orderkey",
        F.coalesce(F.element_at(m, "F"), F.lit(-1.0)).alias("f_price"),
        F.size(m).alias("n_keys"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey << 2 AS shifted,
           xor(o_orderkey, 21845) AS xored,
           bit_count(CAST(o_orderkey AS BIGINT)) AS popcount
    FROM orders WHERE o_orderkey % 30 = 0
    """,
    tags=("functions", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar ops (the building blocks the SimHash/LSH operators
    lean on): and, shift, xor, population count."""
    cat = Catalog(spark, sf_dir)
    k = F.col("o_orderkey")
    return cat.orders.where(k % 30 == 0).select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        F.shiftleft(k, 2).alias("shifted"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.bit_count(k).alias("popcount"),
    )


@query(
    "fn_higher_order",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id % 50 = 0)
    SELECT vec_id,
           CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_pos,
           round(list_sum(list_transform(v, x -> x * x)), 4) AS sum_sq,
           round(list_max(list_transform(v, x -> abs(x))), 4) AS max_abs,
           len(list_filter(v, x -> abs(x) > 2)) > 0 AS any_gt2
    FROM e
    """,
    tags=("functions", "higher-order"),
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — transform / filter / aggregate /
    exists lambdas over the embedding vectors, entirely inside codegen.

    These lambdas are the mechanism that keeps this engine's vector math
    (cosine, LSH signatures, centroid distances) JVM-side instead of in
    Python UDFs; this query pins the surface itself against DuckDB's
    list_* equivalents.  Double-cast discipline: the float32 embeddings
    are widened BEFORE any arithmetic on both engines, and outputs are
    rounded in-query, so float32-space vs float64-space evaluation can't
    diverge the hash.
    """
    cat = Catalog(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    return cat.embeddings.where(F.col("vec_id") % 50 == 0).select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x), 4).alias("sum_sq"),
        F.round(F.array_max(F.transform(v, lambda x: F.abs(x))), 4).alias("max_abs"),
        F.exists(v, lambda x: F.abs(x) > 2).alias("any_gt2"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT o_orderkey AS okey, round(o_totalprice, 2) AS price,
           o_orderstatus AS status
    FROM orders WHERE o_orderkey % 40 = 0
    """,
    tags=("functions", "variant"),
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT round-trip (Spark 4's open-ended JSON
    type): pack two levels of order fields into JSON, ``parse_json`` to
    VARIANT, extract typed scalars back out with ``variant_get`` path
    expressions.  The oracle is the ground truth straight from the
    table, so any loss or retyping inside the VARIANT encode/decode
    fails the hash.  VARIANT is the scale answer for ragged event
    payloads: one binary-encoded column with per-path extraction pushed
    into the scan, instead of a brittle wide struct schema or per-query
    JSON string parsing.
    """
    cat = Catalog(spark, sf_dir)
    j = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("key"),
            F.struct(
                F.round("o_totalprice", 2).alias("price"),
                F.col("o_orderstatus").alias("status"),
            ).alias("fin"),
        )
    )
    return (
        cat.orders.where(F.col("o_orderkey") % 40 == 0)
        .select(F.parse_json(j).alias("v"))
        .select(
            F.expr("variant_get(v, '$.key', 'bigint')").alias("okey"),
            F.expr("variant_get(v, '$.fin.price', 'double')").alias("price"),
            F.expr("variant_get(v, '$.fin.status', 'string')").alias("status"),
        )
    )


@query(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || lang || '.example.com/docs/' || source || '/' ||
             doc_id || '?page=' || (doc_id % 7) || '&ref=search' AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^https://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]page=([^&]*)', 1) AS page
    FROM u
    """,
    tags=("fn", "url"),
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with ``parse_url`` (HOST / PATH / QUERY and a
    single query parameter) over URLs assembled from document metadata —
    the crawl-provenance parsing step of a web-corpus pipeline.  The
    oracle reconstructs each component with regexes, checking Spark's
    dedicated parser against a from-scratch implementation.  Map-only,
    zero shuffle.
    """
    cat = Catalog(spark, sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.col("lang"),
        F.lit(".example.com/docs/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?page="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&ref=search"),
    )
    return cat.documents.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("page")).alias("page"),
    )


@query(
    "fn_xml_parse",
    oracle="""
    SELECT o_orderkey AS okey,
           o_orderstatus AS status,
           round(o_totalprice, 2) AS price
    FROM orders WHERE o_orderkey % 30 = 0
    """,
    tags=("fn", "xml", "spark4"),
)
def fn_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest (Spark 4 native ``from_xml``): serialize each order to
    an XML fragment with attribute + nested-element structure, parse it
    back through a typed schema, and extract the fields — the
    round-trip proof pattern (cf. ``fn_variant``) that the XML path
    preserves values exactly, with the source table as ground truth.

    ``from_xml`` evaluates JVM-side like ``from_json``; at 100 TB an
    XML feed parses scan-parallel with zero Python involvement.  The
    price rides through XML as a 2-decimal string and is re-rounded
    identically on the oracle side, so floats compare bit-stable.
    """
    cat = Catalog(spark, sf_dir)
    xml = F.concat(
        F.lit('<order key="'),
        F.col("o_orderkey"),
        F.lit('"><status>'),
        F.col("o_orderstatus"),
        F.lit("</status><price>"),
        F.round("o_totalprice", 2).cast("decimal(18,2)").cast("string"),
        F.lit("</price></order>"),
    )
    parsed = (
        cat.orders.where(F.col("o_orderkey") % 30 == 0)
        .select(F.from_xml(xml, "_key BIGINT, status STRING, price DOUBLE").alias("x"))
    )
    return parsed.select(
        F.col("x._key").alias("okey"),
        F.col("x.status").alias("status"),
        F.round("x.price", 2).alias("price"),
    )


@query(
    "fn_try_arith",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE floor(o_totalprice / (o_orderkey % 7) * 100) / 100 END AS safe_div,
           TRY_CAST(CASE WHEN o_orderkey % 3 = 0 THEN 'not-a-number'
                         ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS safe_cast,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE floor(o_totalprice) END AS safe_mod_price
    FROM orders WHERE o_orderkey % 25 = 0
    """,
    tags=("fn", "ansi", "spark4"),
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic under ANSI mode (Spark 4 default): ANSI SQL
    makes division by zero and bad casts hard ERRORS — the right default
    for a warehouse, but a 100 TB batch job must not die on row
    3,000,000,001.  The ``try_`` family returns NULL instead, per row,
    with no mode toggle: ``try_divide`` on an engineered zero
    denominator, ``try_cast`` on unparseable strings, and a guarded
    modulo — each NULL position exactly reproduced by the oracle's CASE
    guards.

    All three are JVM expressions inside codegen; the cost of safety is
    one branch per row, not a fallback interpreter path.
    """
    cat = Catalog(spark, sf_dir)
    o = cat.orders.where(F.col("o_orderkey") % 25 == 0)
    bad_str = F.when(F.col("o_orderkey") % 3 == 0, F.lit("not-a-number")).otherwise(
        F.col("o_orderkey").cast("string")
    )
    return o.select(
        "o_orderkey",
        (F.floor(F.try_divide("o_totalprice", F.col("o_orderkey") % 7) * 100) / 100).alias("safe_div"),
        bad_str.try_cast("bigint").alias("safe_cast"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None).cast("double"))
        .otherwise(F.floor("o_totalprice").cast("double"))
        .alias("safe_mod_price"),
    )


@query(
    "fn_collation",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN p_brand ELSE upper(p_brand) END AS brand
      FROM part
    )
    SELECT lower(brand) AS brand_ci, count(*) AS n
    FROM mixed
    GROUP BY lower(brand)
    """,
    tags=("fn", "collation", "spark4"),
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: group under the UTF8_LCASE collation so case
    variants coalesce WITHOUT rewriting the data — the collation is part
    of the string type, so every comparison/join/sort downstream honors
    it (unlike a lower() scrub, which loses the original and silently
    changes equality semantics for everything else).  Mixed-case input
    is constructed deterministically (odd part keys upper-cased).

    The group representative under a collation is whichever variant a
    partition saw first, so the output canonicalizes with lower() — the
    oracle states the same aggregation as an explicit lower() GROUP BY,
    proving the collation groups exactly the case-insensitive classes.
    """
    cat = Catalog(spark, sf_dir)
    mixed = cat.part.select(
        F.when(F.col("p_partkey") % 2 == 0, F.col("p_brand"))
        .otherwise(F.upper("p_brand"))
        .alias("brand")
    )
    return (
        mixed.groupBy(F.collate("brand", "UTF8_LCASE").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lower("k").alias("brand_ci"), "n")
    )


@query(
    "fn_regexp_all",
    # Pattern stays in the Java/RE2 common dialect (a plain character
    # class + bounded quantifier — no lookaround, no \\b) so Spark's
    # java.util.regex and DuckDB's RE2 agree match-for-match; both
    # engines' regexp_extract_all default to group 0 semantics here
    # (Spark needs the explicit idx=0 — its default is group 1).
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]{5,}')) AS n_long,
           coalesce(regexp_extract_all(text, '[a-z]{5,}')[1], '') AS first_long,
           coalesce(array_to_string(
             list_sort(list_distinct(regexp_extract_all(text, '[a-z]{5,}'))), ','
           ), '') AS distinct_long,
           regexp_replace(text, '[a-z]{5,}', '#', 'g') AS masked
    FROM documents
    """,
    tags=("fn", "regexp"),
)
def fn_regexp_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match regexp surface: extract-all, count, first match,
    order-preserving distinct join, global replace — the text-wrangling
    quartet behind tokenizers and PII scrubbers (text_pii_mask is the
    applied form).  All five expressions are JVM regexp built-ins in
    one map-only Project over the pruned (doc_id, text) scan: zero
    shuffles, one pass, whole-stage codegen.  Cross-engine note: the
    distinct match list is sorted before joining — DuckDB's
    ``list_distinct`` does NOT preserve first-occurrence order (Spark's
    ``array_distinct`` does), so only the sorted rendering compares.
    """
    cat = Catalog(spark, sf_dir)
    pat = r"[a-z]{5,}"
    matches = F.regexp_extract_all(F.col("text"), F.lit(pat), 0)
    return cat.documents.select(
        "doc_id",
        F.size(matches).alias("n_long"),
        # try_element_at: under ANSI (this session's default) a doc
        # with NO match would crash element_at on the empty array —
        # the coalesce('') fallback was unreachable
        F.coalesce(F.try_element_at(matches, F.lit(1)), F.lit("")).alias("first_long"),
        F.array_join(F.array_sort(F.array_distinct(matches)), ",").alias(
            "distinct_long"
        ),
        F.regexp_replace(F.col("text"), pat, "#").alias("masked"),
    )


@query(
    "fn_surrogate_key",
    oracle="""
    SELECT o_orderkey,
           substr(sha256('ord' || '||' || coalesce(CAST(o_orderkey AS VARCHAR), '')
                         || '||' || coalesce(CAST(o_custkey AS VARCHAR), '')), 1, 32)
             AS sk
    FROM orders ORDER BY o_orderkey
    """,
    tags=("function", "warehouse"),
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate key: the dbt_utils.generate_surrogate_key
    idiom — hash of a namespaced, delimiter-joined column tuple (each
    field NULL-coalesced to '', per dbt_utils), truncated to 128 bits.
    Content-derived keys are what make cross-system joins and
    idempotent re-loads possible without a central sequence (a
    monotonically_increasing_id is neither stable across runs nor
    comparable across engines).  Map-only, codegen'd sha2; the '||'
    delimiter guards against concat ambiguity ('ab'+'c' vs 'a'+'bc').
    The coalesce is load-bearing, not style: concat_ws silently SKIPS
    null fields, so ('a', NULL) and ('a') would collide on the same
    key — the exact ambiguity the delimiter exists to prevent — and
    the oracle's NULL-propagating '||' would disagree besides."""
    cat = Catalog(spark, sf_dir)
    sk = F.substring(
        F.sha2(
            F.concat(
                F.lit("ord"),
                F.lit("||"),
                F.coalesce(F.col("o_orderkey").cast("string"), F.lit("")),
                F.lit("||"),
                F.coalesce(F.col("o_custkey").cast("string"), F.lit("")),
            ),
            256,
        ),
        1,
        32,
    )
    return cat.orders.select("o_orderkey", sk.alias("sk")).orderBy("o_orderkey")
