"""Synthesize a 10x ("sf1.0") copy of /root/testdata/sf0.1 for the
full-catalog scale sweep (benchmarks/scale_sweep.py).

The driver only ships sf{0.001,0.01,0.1}; every scale claim beyond that
rested on targeted 10x spot-proofs. This generator builds a
structure-preserving 10x replication so the WHOLE catalog can be timed at
10x and super-linear stragglers surface:

- region/nation: fixed (TPC-H dimension tables don't grow with SF).
- customer/supplier/part/orders/lineitem/events: 10 copies with per-copy
  key offsets applied consistently to every PK and FK, so join
  cardinalities and per-key fan-outs are EXACTLY preserved within each
  copy and never collide across copies (orders.o_custkey moves with
  customer.c_custkey, lineitem moves with orders/part/supplier,
  events.user_id moves with event_id).
- documents: doc_id offset; copy i applies a per-copy ALPHABET ROTATION
  (a bijective character map, rot-i over a-z/A-Z via translate). A
  bijection on characters preserves every within-copy relation EXACTLY —
  shingle-set Jaccard, n-gram postings, blocking keys, Levenshtein
  distances, token lengths — while copies share (almost) no shingles, so
  the dup RATE stays constant and the dup COUNT grows x10: the organic
  model. Three measured wrong fixtures led here: (1) plain replication
  hands every doc 9 exact twins; (2) a first-token salt leaves cross-copy
  char-shingle Jaccard ~0.99 (every doc an artificial 10-clique at
  MinHash 0.8 — cluster_consistency_check ran 33x); (3) a per-token
  '_c{i}' suffix injects the SAME 4-char shingles into every doc of a
  copy, and whenever a MinHash permutation's global minimum lands on one
  of those ubiquitous shingles, unrelated docs share signature
  components — measured 2006-doc LSH buckets (sf0.1 max: 4) and a 300 s
  timeout. Digits/punctuation pass through the rotation, so numerically
  identical docs can still collide across copies — negligible on this
  word-like data.
- embeddings: vec_id offset; copy i CYCLICALLY ROLLS the vector's
  dimensions by i (distance-preserving within a copy, so every organic
  near-dup pair exists once per copy — dup RATE constant, dup COUNT x10,
  the organic scaling), plus a small deterministic jitter for
  distinctness. A jitter-only replication was measured to be the wrong
  fixture: each vector's 10 jittered copies sit at cos ~0.997 of each
  other, handing every vector an artificial 10-clique of near-dups and
  quadratic-looking blowups in the near-dup family that a real 10x corpus
  would not have. (Shift-invariant vectors — e.g. constants — still
  collapse to jitter-distance; none exist in this data.)

Output is parquet under .scale/sf1.0 (gitignored; ~170 MB). Pure DuckDB,
runs in seconds. Usage: python benchmarks/gen_scale_data.py [n_copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale", "sf1.0")

# One offset unit per table, far above any real key at sf0.1.
KOFF = 100_000_000


def main(n_copies: int = 10) -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT range AS i FROM range({n_copies})")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    # Dimensions: fixed across SF.
    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src(t)}")

    write("customer", f"""
        SELECT c_custkey + i * {KOFF} AS c_custkey,
               c_name || ' #' || i AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')}, copies""")

    write("supplier", f"""
        SELECT s_suppkey + i * {KOFF} AS s_suppkey,
               s_name || ' #' || i AS s_name,
               s_nationkey, s_acctbal
        FROM {src('supplier')}, copies""")

    write("part", f"""
        SELECT p_partkey + i * {KOFF} AS p_partkey,
               p_name || ' #' || i AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM {src('part')}, copies""")

    write("orders", f"""
        SELECT o_orderkey + i * {KOFF} AS o_orderkey,
               o_custkey + i * {KOFF} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}, copies""")

    write("lineitem", f"""
        SELECT l_orderkey + i * {KOFF} AS l_orderkey,
               l_partkey + i * {KOFF} AS l_partkey,
               l_suppkey + i * {KOFF} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}, copies""")

    write("events", f"""
        SELECT event_id + i * {KOFF} AS event_id,
               ts,
               user_id + i * {KOFF} AS user_id,
               event_type, value, props
        FROM {src('events')}, copies""")

    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    rot_case = " ".join(
        f"WHEN {i} THEN translate(text, '{lower}{upper}', "
        f"'{lower[i:] + lower[:i]}{upper[i:] + upper[:i]}')"
        for i in range(10)
    )
    write("documents", f"""
        WITH rotated AS (
            SELECT doc_id + i * {KOFF} AS doc_id,
                   CASE i {rot_case} ELSE text END AS text,
                   lang, source
            FROM {src('documents')}, copies)
        SELECT doc_id, text, lang, source, length(text) AS n_chars
        FROM rotated""")

    # Roll dims by the copy index (distance-preserving per copy), then a
    # deterministic (vec_id, value) jitter of amplitude 0.01 for
    # distinctness.
    write("embeddings", f"""
        WITH rolled AS (
            SELECT vec_id + i * {KOFF} AS vec_id,
                   list_concat(
                       embedding[(i % len(embedding)) + 1 :],
                       embedding[1 : i % len(embedding)]
                   ) AS emb,
                   label
            FROM {src('embeddings')}, copies)
        SELECT vec_id,
               CAST(list_transform(emb, x -> CAST(x + 0.01 * (
                   (CAST(hash(vec_id, floor(x * 1e6)) % 2001 AS DOUBLE)
                    - 1000.0) / 1000.0
               ) AS FLOAT)) AS FLOAT[]) AS embedding,
               label
        FROM rolled""")

    print(f"done -> {DST}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
