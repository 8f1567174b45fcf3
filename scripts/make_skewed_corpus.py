"""Build an adversarially SKEWED copy of a testdata scale-factor dir.

The layout-invariance sweep proves results don't depend on physical
partitioning; this generator attacks the other cluster-scale failure
axis: pathological KEY DISTRIBUTION.  On a 1000-executor cluster the
query that dies first is the one whose hot key lands 30% of the corpus
in one task — a skewed group a balanced test fixture never produces.
Every query takes ``sf_dir`` as a parameter and the DuckDB oracle runs
on the same files, so the whole oracle-snapshot harness replays
unchanged against the skewed dir: correctness must hold AND every
query must complete with hot keys present.

Injected skew (deterministic, seed 9):

- ``orders``:    30% of ``o_custkey``  -> the minimum custkey (hot dim FK)
- ``lineitem``:  20% of ``l_orderkey`` -> the minimum orderkey (hot join
                 key: ~12k lineitems on one order at sf0.01); 20% of
                 ``l_partkey``/``l_suppkey`` -> one hot part/supplier
- ``events``:    30% of ``user_id``    -> one hot user (hot sessionize /
                 window / funnel key)
- ``documents``: 25% of docs become near-copies of ONE template doc
                 (template text + a tiny per-doc suffix), all sharing
                 its ``lang`` — hot gram buckets, hot minhash/simhash
                 bands, one giant near-dup cluster, one hot
                 (lang, length-bucket) levenshtein block;
                 ``n_chars`` recomputed to stay consistent
- ``embeddings``: 30% of vectors resampled into a tight cone around one
                 direction (unit norm ± small noise) — one dense
                 Voronoi cell for IVF training/assignment and a dense
                 cosine cluster for embedding dedup
- dims (``region nation customer supplier part``): copied verbatim

Each output file is cast back to the source file's exact Arrow schema
so Spark and DuckDB see identical types to the pristine corpus.

Usage: python scripts/make_skewed_corpus.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

HOT_FRACTION = {"orders": 0.30, "lineitem": 0.20, "events": 0.30,
                "documents": 0.25, "embeddings": 0.30}


def _load(src: str, name: str):
    t = pq.read_table(f"{src}/{name}.parquet")
    return t, t.schema


def _write(out_dir: str, name: str, df, schema: pa.Schema) -> None:
    # Cast back to the EXACT source schema (float32 embeddings, us
    # timestamps) so engines see identical types to the pristine dir.
    table = pa.Table.from_pandas(df, preserve_index=False)
    table = table.select(schema.names).cast(pa.schema(
        [schema.field(n) for n in schema.names]
    ))
    pq.write_table(table, f"{out_dir}/{name}.parquet")


def build(src: str, out: str) -> dict:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(9)

    for name in ("region", "nation", "customer", "supplier", "part"):
        t, _ = _load(src, name)
        pq.write_table(t, f"{out}/{name}.parquet")

    # orders: hot customer ---------------------------------------------
    t, schema = _load(src, "orders")
    df = t.to_pandas()
    hot_cust = int(df["o_custkey"].min())
    mask = rng.random(len(df)) < HOT_FRACTION["orders"]
    df.loc[mask, "o_custkey"] = hot_cust
    _write(out, "orders", df, schema)
    hot_order = int(df["o_orderkey"].min())

    # lineitem: hot order / part / supplier ----------------------------
    t, schema = _load(src, "lineitem")
    df = t.to_pandas()
    m = rng.random(len(df)) < HOT_FRACTION["lineitem"]
    df.loc[m, "l_orderkey"] = hot_order
    hot_part = int(df["l_partkey"].min())
    hot_supp = int(df["l_suppkey"].min())
    m2 = rng.random(len(df)) < HOT_FRACTION["lineitem"]
    df.loc[m2, "l_partkey"] = hot_part
    df.loc[m2, "l_suppkey"] = hot_supp
    _write(out, "lineitem", df, schema)

    # events: hot user --------------------------------------------------
    t, schema = _load(src, "events")
    df = t.to_pandas()
    hot_user = int(df["user_id"].min())
    m = rng.random(len(df)) < HOT_FRACTION["events"]
    df.loc[m, "user_id"] = hot_user
    _write(out, "events", df, schema)

    # documents: one giant near-dup template cluster --------------------
    t, schema = _load(src, "documents")
    df = t.to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    template_text = str(df.loc[0, "text"])
    template_lang = str(df.loc[0, "lang"])
    m = rng.random(len(df)) < HOT_FRACTION["documents"]
    m[0] = False  # keep the template itself pristine
    idxs = np.flatnonzero(m)
    texts = df["text"].tolist()
    langs = df["lang"].tolist()
    for i in idxs:
        # near-copy: template plus a tiny unique suffix, so exact dedup
        # sees distinct rows but every fuzzy/banded method buckets them
        texts[i] = template_text + " variant token" + str(int(df.loc[i, "doc_id"]))
        langs[i] = template_lang
    df["text"] = texts
    df["lang"] = langs
    df["n_chars"] = [len(s) for s in df["text"]]
    _write(out, "documents", df, schema)

    # embeddings: one dense cosine cone ---------------------------------
    t, schema = _load(src, "embeddings")
    df = t.to_pandas()
    dim = len(df.loc[0, "embedding"])
    axis = rng.standard_normal(dim)
    axis /= np.linalg.norm(axis)
    m = rng.random(len(df)) < HOT_FRACTION["embeddings"]
    vecs = df["embedding"].tolist()
    for i in np.flatnonzero(m):
        v = axis + 0.05 * rng.standard_normal(dim)
        vecs[i] = (v / np.linalg.norm(v)).astype(np.float32)
    df["embedding"] = vecs
    _write(out, "embeddings", df, schema)

    return {
        "out": out,
        "hot_custkey": hot_cust, "hot_orderkey": hot_order,
        "hot_partkey": hot_part, "hot_suppkey": hot_supp,
        "hot_user": hot_user, "template_doc": 0,
        "dense_cone_vectors": int(m.sum()),
    }


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skewdata_sf001"
    print(build(src, out))


if __name__ == "__main__":
    main()
