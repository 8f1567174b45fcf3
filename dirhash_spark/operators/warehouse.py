"""Warehouse maintenance operators: batch MERGE (upsert/delete apply).

EXT surface — the reference (a directory-hashing tool, ``dirhash.py``)
has no table-maintenance story; this is the CDC-apply batch pattern
every lakehouse needs next to ``scd2_history`` (timeseries.py): given a
base snapshot and a small change batch of ops (U=update, D=delete,
I=insert), produce the next snapshot in ONE pass over the base.

Physical shape (the 100-TB design): the change batch is orders of
magnitude smaller than the base, so it rides as a BROADCAST build side
— the base table streams through one broadcast hash join + a filter +
a union with the inserts, never shuffling.  The naive MERGE-as-full-
outer-join formulation would shuffle the entire base on the key; this
plan touches each base row exactly once, map-side.  (Engines with
copy-on-write MERGE add file-level pruning on top; the join shape
below is what runs inside each rewritten file group.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import query


def _change_batch(cat: Catalog) -> DataFrame:
    """Deterministic change batch derived from the customer snapshot:
    key-residue selected updates (halve the balance), deletes, and
    inserts under fresh keys — both engines re-derive the same batch.
    """
    c = cat.customer
    upd = c.where(F.col("c_custkey") % 10 == 3).select(
        F.col("c_custkey").alias("k"),
        F.lit("U").alias("op"),
        (F.floor(F.col("c_acctbal") * 50) / 100).alias("new_bal"),
    )
    dele = c.where(F.col("c_custkey") % 10 == 7).select(
        F.col("c_custkey").alias("k"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("new_bal"),
    )
    ins = c.where(F.col("c_custkey") % 100 == 1).select(
        (F.col("c_custkey") + 10_000_000).alias("k"),
        F.lit("I").alias("op"),
        F.lit(0.0).alias("new_bal"),
    )
    return upd.unionByName(dele).unionByName(ins)


@query(
    "merge_upsert",
    oracle="""
    WITH upd AS (
      SELECT c_custkey AS k, floor(c_acctbal * 50) / 100 AS new_bal
      FROM customer WHERE c_custkey % 10 = 3
    ),
    del AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 10 = 7),
    ins AS (SELECT c_custkey + 10000000 AS k FROM customer WHERE c_custkey % 100 = 1)
    SELECT c.c_custkey,
           c.c_name,
           c.c_nationkey,
           CASE WHEN u.k IS NOT NULL THEN u.new_bal ELSE c.c_acctbal END AS c_acctbal,
           c.c_mktsegment,
           CASE WHEN u.k IS NOT NULL THEN 'updated' ELSE 'kept' END AS merge_action
    FROM customer c
    LEFT JOIN upd u ON c.c_custkey = u.k
    LEFT JOIN del d ON c.c_custkey = d.k
    WHERE d.k IS NULL
    UNION ALL
    SELECT k,
           'Customer#new' || CAST(k AS VARCHAR),
           CAST(k % 25 AS INT),
           CAST(0.0 AS DOUBLE),
           'AUTOMOBILE',
           'inserted'
    FROM ins
    """,
    tags=("warehouse", "merge", "cdc"),
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE: apply a (U/D/I) change batch to the customer
    snapshot in one base pass (see module docstring for the plan
    argument).  MERGE semantics made explicit:

    - matched + op=U  -> update (here: balance halved, floor-scaled)
    - matched + op=D  -> drop the row
    - not-matched + op=I -> insert (fresh keys, derived attributes)
    - base rows with no change row pass through unchanged

    The change batch is broadcast (``F.broadcast``); the base scan is
    the only large input and it is never shuffled — plan-asserted in
    tests/test_plans.py (no exchange above the customer scan).
    """
    cat = Catalog(spark, sf_dir)
    changes = _change_batch(cat)
    base = cat.customer
    merged = base.join(
        F.broadcast(changes.where(F.col("op") != "I")),
        base["c_custkey"] == F.col("k"),
        "left",
    ).where(F.col("op").isNull() | (F.col("op") == "U"))
    survivors = merged.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.when(F.col("op") == "U", F.col("new_bal"))
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        "c_mktsegment",
        F.when(F.col("op") == "U", F.lit("updated"))
        .otherwise(F.lit("kept"))
        .alias("merge_action"),
    )
    inserts = changes.where(F.col("op") == "I").select(
        F.col("k").alias("c_custkey"),
        F.concat(F.lit("Customer#new"), F.col("k").cast("string")).alias("c_name"),
        (F.col("k") % 25).cast("int").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("AUTOMOBILE").alias("c_mktsegment"),
        F.lit("inserted").alias("merge_action"),
    )
    return survivors.unionByName(inserts)
