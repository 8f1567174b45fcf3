"""Reshaping operators (EXT; no REF analog — the reference's only shape
change is chunk explosion, covered columnar by B40 chunk_split_text):
pivot, unpivot/melt, lateral explode, deterministic hash sampling.

Scale notes:
- pivot with an explicit value list skips the distinct-values discovery
  job and plans two bounded aggregations (map-side-combined group on
  both keys, then the pivot aggregate) — both exchanges carry one row
  per group;
- unpivot is stack(): pure row-local projection, zero shuffle;
- posexplode is a generator inside the scan stage — the blow-up happens
  after pushdown/pruning, never before;
- hash sampling (`xxhash64(key) % N``) is the scale-safe sample: it is
  deterministic (reproducible experiments, exact oracle), pushes work to
  every partition evenly, and unlike TABLESAMPLE keeps the same rows
  under repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog
from ..registry import query


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS qty_F,
           round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot l_linestatus into columns.  The explicit value list
    ['F','O'] skips the extra distinct-values job Spark otherwise runs,
    and keeps the plan a single groupBy pass."""
    cat = Catalog(spark, sf_dir)
    out = (
        cat.lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )
    return out.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_F"),
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_O"),
    )


@query(
    "reshape_unpivot",
    oracle="""
    SELECT s_suppkey, metric, round(val, 2) AS val
    FROM (
      SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS val FROM supplier
      UNION ALL
      SELECT s_suppkey, 'suppkey_x10', s_suppkey * 10.0 FROM supplier
    )
    """,
    tags=("reshape", "unpivot"),
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) wide columns into (metric, val) rows via stack()
    — a row-local generator, no shuffle."""
    cat = Catalog(spark, sf_dir)
    return cat.supplier.select(
        "s_suppkey",
        F.expr(
            "stack(2, 'acctbal', s_acctbal, 'suppkey_x10', CAST(s_suppkey AS DOUBLE) * 10.0)"
        ).alias("metric", "raw"),
    ).select("s_suppkey", "metric", F.round("raw", 2).alias("val"))


@query(
    "reshape_posexplode",
    oracle="""
    SELECT vec_id, CAST(g.pos - 1 AS INT) AS pos,
           round(CAST(g.x AS DOUBLE), 4) AS x
    FROM embeddings,
         LATERAL (SELECT unnest(embedding) AS x,
                         generate_subscripts(embedding, 1) AS pos) g
    WHERE vec_id % 100 = 0 AND g.pos <= 4
    """,
    tags=("reshape", "explode"),
)
def reshape_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode with position over the embedding array.  The
    vec_id filter is applied before the generator, so pushdown bounds
    the blow-up."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.embeddings.where(F.col("vec_id") % 100 == 0)
        .select("vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "raw"))
        .select("vec_id", "pos", F.round(F.col("raw").cast("double"), 4).alias("x"))
    )


@query(
    "sample_hash_deterministic",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM orders WHERE o_orderkey % 20 = 3
    """,
    tags=("sample",),
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% sample by key residue — the reproducible sample
    for experiment pipelines (same rows on every engine, every run,
    every partitioning; exact-oracle-checkable, unlike TABLESAMPLE)."""
    cat = Catalog(spark, sf_dir)
    return cat.orders.where(F.col("o_orderkey") % 20 == 3).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice")
    )


@query(
    "sample_stratified",
    oracle="""
    WITH rates AS (
      SELECT * FROM (VALUES ('en', 100), ('de', 500), ('es', 500),
                            ('fr', 500), ('zh', 250)) r(lang, permille)
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r USING (lang)
    WHERE d.doc_id % 1000 < r.permille
    """,
    tags=("sampling", "stratified"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language sampling rates
    (down-weight the dominant language, keep the tail) applied through
    the same key-residue predicate as ``sample_hash_deterministic`` —
    membership depends only on (doc_id, lang), never on partitioning,
    task retries, or row order, so the sample is reproducible across
    cluster layouts and re-runs (``df.sample``/``sampleBy`` are not:
    their Bernoulli draws follow partition iteration order).

    The rate table rides along as a broadcast literal; the filter is a
    map-only predicate after the join — no shuffle, and Catalyst folds
    it into the scan filter when the rate table is a literal map.  This
    is the language-rebalancing step of corpus curation (e.g. cap 'en'
    at 10% while retaining 50% of low-resource languages).
    """
    cat = Catalog(spark, sf_dir)
    rates = spark.createDataFrame(
        [("en", 100), ("de", 500), ("es", 500), ("fr", 500), ("zh", 250)],
        "lang string, permille int",
    )
    return (
        cat.documents.join(F.broadcast(rates), "lang")
        .where(F.col("doc_id") % 1000 < F.col("permille"))
        .select("doc_id", "lang")
    )


@query(
    "corpus_temperature_sampling",
    # alpha = 0.5 (temperature 2) on purpose: the quota formula reduces
    # to floor(sqrt(n_min * n_l)), and IEEE sqrt is correctly rounded in
    # both engines — pow(x, 0.7) is not guaranteed bit-identical across
    # libm implementations, and a last-ulp difference under floor()
    # would flake the oracle.  Selection key is a Knuth multiplicative
    # hash in pure BIGINT arithmetic (identical cross-engine; at real
    # scale with 64-bit ids use xxhash64 — engine-local, same shape).
    oracle="""
    WITH n AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
    q AS (
      SELECT lang, n_l,
             CAST(floor(sqrt(CAST(n_l * (SELECT min(n_l) FROM n) AS DOUBLE)))
                  AS BIGINT) AS quota
      FROM n
    ),
    keyed AS (
      SELECT doc_id, lang,
             CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296
                  AS BIGINT) AS skey
      FROM documents
    ),
    pre AS (
      SELECT k.doc_id, k.lang, k.skey, q.quota
      FROM keyed k JOIN q USING (lang)
      WHERE k.skey < (CAST(4294967296 AS HUGEINT) * q.quota * 11)
                       // (10 * q.n_l) + 1024
    ),
    ranked AS (
      SELECT doc_id, lang, quota,
             row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id) AS rk
      FROM pre
    )
    SELECT doc_id, lang FROM ranked WHERE rk <= quota
    """,
    tags=("sampling", "temperature", "multilingual"),
)
def corpus_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual rebalancing (the mT5/XLM-R
    recipe): downsample so per-language counts become proportional to
    ``n_l^alpha`` with alpha=0.5 — the head language shrinks, the tail
    survives.  Anchoring the scale at the smallest language (quota_l =
    floor(sqrt(n_min * n_l)), the largest downsample-only solution of
    ``c_l ∝ sqrt(n_l)``) makes the result a pure selection, so the
    whole op is exact-oracle-checkable; membership depends only on
    (doc_id, lang) via a deterministic key, never on partitioning or
    iteration order (same reproducibility contract as
    ``sample_hash_deterministic``).

    Scale shape: language counts and quotas are a 5-row broadcast; the
    corpus-side work is one map-only key computation + an integer
    threshold prefilter that admits ~1.1 × quota rows, and the exact
    per-language rank runs over THAT — the window input is sized by the
    output (which must be materialized anyway), not the corpus.  The
    prefilter threshold mirrors the oracle exactly, so cross-engine
    equality holds by construction even where the hash happens to be
    locally dense.  Dropping the rank and keeping only the threshold
    filter is the zero-sort approximate variant (quota ± sampling
    noise) — the exact form costs one output-sized sort per language.
    """
    cat = Catalog(spark, sf_dir)
    # n_min as a GLOBAL WINDOW over the language-count rollup, not a
    # separate aggregate + crossJoin: the aggregate form made the
    # rollup a lineage diamond that planned as TWO corpus scans (r8
    # plan audit).  The single-partition window is safe here because
    # its input is the post-aggregate table — one row per language —
    # so the whole quota computation stays one lazy lang-count subtree
    # and the corpus is scanned once for counts, once for the probe.
    n = cat.documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    quotas = n.withColumn(
        "n_min", F.min("n_l").over(Window.partitionBy(F.lit(1)))
    ).select(
        "lang",
        "n_l",
        F.floor(F.sqrt((F.col("n_l") * F.col("n_min")).cast("double")))
        .cast("long")
        .alias("quota"),
    )
    # Scramble and prefilter products ride DECIMAL(38,0)/HUGEINT, the
    # sample_balanced_classes rule: doc_id ≳ 3.5e9 (or quota ≳ 2e8)
    # would overflow BIGINT — ANSI Spark throws, DuckDB raises — at
    # exactly the corpus sizes this operator targets.  The threshold
    # uses integer `div` on both engines so prefilter membership stays
    # bit-identical by construction, never a float rounding question.
    keyed = cat.documents.select(
        "doc_id",
        "lang",
        ((F.col("doc_id").cast("decimal(38,0)") * 2654435761) % 4294967296)
        .cast("long")
        .alias("skey"),
    )
    pre = keyed.join(F.broadcast(quotas), "lang").where(
        F.col("skey")
        < F.expr(
            "CAST(4294967296 AS DECIMAL(38,0)) * quota * 11 div (10 * n_l) + 1024"
        )
    )
    w = Window.partitionBy("lang").orderBy("skey", "doc_id")
    return (
        pre.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= F.col("quota"))
        .select("doc_id", "lang")
    )


@query(
    "corpus_mixture_weights",
    oracle=r"""
    WITH per_lang AS (
      SELECT lang,
             count(*) AS n_docs,
             sum(len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')))
               AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT sum(n_tokens) AS total_tokens,
             count(*) AS n_langs
      FROM per_lang
    )
    SELECT lang,
           n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           floor(least(1.0, (CAST(total_tokens AS DOUBLE) / n_langs) / n_tokens)
                 * 10000) / 10000 AS sample_weight,
           CAST(floor(least(1.0, (CAST(total_tokens AS DOUBLE) / n_langs) / n_tokens)
                      * n_tokens) AS BIGINT) AS expected_tokens
    FROM per_lang CROSS JOIN tot
    """,
    tags=("pipeline", "sampling", "mixture"),
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture rebalancing: given a uniform-over-languages
    token target, compute each language's sampling weight
    ``min(1, target_share / actual_share)`` and the token budget it
    yields — the planning step before a weighted sampler (e.g.
    ``sample_stratified``) materializes the mix.  Over-represented
    languages are down-sampled; under-represented ones keep weight 1.0
    (up-sampling is a repetition-factor decision made elsewhere).

    Token counting is one map-only pass; the per-language aggregate is
    vocabulary-of-languages sized, so the totals ride a one-row
    broadcast back onto it.  The weight math divides exact integer
    token counts on both engines, floored once for bit-stable doubles.
    """
    cat = Catalog(spark, sf_dir)
    n_toks = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != ""))
    per_lang = cat.documents.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_toks).alias("n_tokens"),
    )
    tot = per_lang.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    weight = F.least(
        F.lit(1.0),
        (F.col("total_tokens").cast("double") / F.col("n_langs")) / F.col("n_tokens"),
    )
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (F.floor(weight * 10000) / 10000).alias("sample_weight"),
        F.floor(weight * F.col("n_tokens")).cast("bigint").alias("expected_tokens"),
    )


@query(
    "pack_sequences",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, doc_id % 16 AS shard,
             CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, shard, n_tokens,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM t
    )
    SELECT shard, CAST(cum_before // 2048 AS BIGINT) AS pack_no,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
    FROM c
    GROUP BY shard, pack_no
    """,
    tags=("pipeline", "packing"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed token-budget training
    bins (2048 whitespace tokens) — the step that turns a curated corpus
    into dense context windows; unpacked short docs waste ~half the FLOPs
    of a training run.

    Deterministic first-fit-in-order packing: within each shard, docs are
    taken in doc_id order and a doc opens a new pack when the running
    token count before it crosses the budget (a straddling doc belongs to
    the pack where its prefix sum lands — the simple rule both engines
    can state exactly; real packers then truncate or wrap the overflow
    inside the fixed-size tensor).

    Scale shape: the prefix sum is windowed PER SHARD (`doc_id % 16` —
    arithmetic, not hash, so the DuckDB oracle agrees), never a global
    ordering — 100 TB packs as 16-way (or 16k-way) independent streams,
    one shuffle on the shard key, and shard count scales with the
    cluster while each shard's window stays a linear in-memory pass.
    The output is pack-grain metadata; materializing packed token
    tensors is the same plan with collect_list over the pack key.
    """
    cat = Catalog(spark, sf_dir)
    n_tokens = (
        F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != ""))
        .cast("bigint")
        .alias("n_tokens")
    )
    t = cat.documents.select(
        "doc_id", (F.col("doc_id") % 16).alias("shard"), n_tokens
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        c.groupBy("shard", F.expr("cum_before div 2048").alias("pack_no"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


@query(
    "sample_balanced_classes",
    oracle="""
    WITH k AS (
      SELECT doc_id, lang,
             CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296
                  AS BIGINT) AS skey
      FROM documents
    ),
    m AS (
      SELECT min(cnt) AS mc
      FROM (SELECT count(*) AS cnt FROM documents GROUP BY lang)
    ),
    r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id) AS rn
      FROM k
    )
    SELECT doc_id, lang FROM r, m WHERE rn <= mc
    ORDER BY lang, doc_id
    """,
    tags=("sampling", "llm"),
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class rebalancing: downsample every language class to the size of
    the smallest one — the deterministic core of "don't let the head
    language drown the tail" training-mix construction (the inverse
    lever of ``corpus_temperature_sampling``, which reweights instead
    of truncating).

    Selection must be identical on both engines AND stable under
    re-partitioning, so "random" is a Knuth multiplicative scramble of
    the doc key ((id · 2654435761) mod 2³²) — pure BIGINT arithmetic,
    no engine RNG — and each class keeps its min-count lowest-scramble
    docs (doc_id tie-break).  Scale shape: one (lang, count) aggregate
    broadcasts the floor; the per-class row_number is a single shuffle
    on the class key.  Classes are few, so each class sorts in one
    task — at 100 TB swap the exact rank for a scramble-key threshold
    estimated from the class counts (map-only, approximately exact);
    the fixture-scale form keeps the exact rank the oracle states."""
    cat = Catalog(spark, sf_dir)
    # The scramble product rides DECIMAL(38,0)/HUGEINT: doc_id ≳ 3.5e9
    # would overflow BIGINT (Spark non-ANSI wraps negative, DuckDB
    # raises — divergence exactly at the corpus sizes this targets).
    k = cat.documents.select(
        "doc_id",
        "lang",
        ((F.col("doc_id").cast("decimal(38,0)") * 2654435761) % 4294967296)
        .cast("long")
        .alias("skey"),
    )
    mc = (
        cat.documents.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").alias("mc"))
    )
    w = Window.partitionBy("lang").orderBy("skey", "doc_id")
    return (
        k.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(mc))
        .where(F.col("rn") <= F.col("mc"))
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )
