#!/usr/bin/env python
"""Generate a scaled-up copy of a testdata sf directory (default 10x).

FK-consistent replication: replica k offsets every key by k * (max+1)
of its domain, so joins produce k-disjoint copies of the base join
graph — per-query work scales linearly with the factor, which is
exactly what the scale-envelope run wants to measure (VERDICT r1 #9).
Dimension tables (region, nation) are NOT replicated (they are fixed
domains, like the real world). Document text is re-tokenized per
replica (EVERY token gets a '_r<k>' suffix, via a \S+ capture so the
final token is suffixed too) so replicas share no 3-gram shingles — the
near-dup structure of the base corpus is preserved, not multiplied.
(r5 fix: the previous form INSERTED ' r<k> ' between words,
which made any two same-replica docs sharing a single word share the
shingle 'r<k> w r<k>' — quadratically inflating shingle-candidate sets
for exact similarity joins; the banded/capped dedup paths masked it by
dropping the degenerate blocks. Suffixing keeps intra-replica shingle
structure IDENTICAL to the base corpus: shingles match iff the base
shingles match.) Embedding vectors are copied as-is (ANN corpus grows 10x;
queries stay the replica-0 ids).

Usage: python scripts/make_scale_data.py [src_dir] [dest_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DEST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def main() -> None:
    os.makedirs(DEST, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def offset(t: str, col: str) -> int:
        return con.sql(f"SELECT max({col}) + 1 FROM {src(t)}").fetchone()[0]

    C = offset("customer", "c_custkey")
    S = offset("supplier", "s_suppkey")
    P = offset("part", "p_partkey")
    O = offset("orders", "o_orderkey")
    E = offset("events", "event_id")
    D = offset("documents", "doc_id")
    V = offset("embeddings", "vec_id")

    copies = {
        "region": "SELECT * FROM {src}",
        "nation": "SELECT * FROM {src}",
        "customer": f"""
            SELECT c_custkey + k*{C} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM {{src}}, range({FACTOR}) r(k)""",
        "supplier": f"""
            SELECT s_suppkey + k*{S} AS s_suppkey, s_name, s_nationkey, s_acctbal
            FROM {{src}}, range({FACTOR}) r(k)""",
        "part": f"""
            SELECT p_partkey + k*{P} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM {{src}}, range({FACTOR}) r(k)""",
        "orders": f"""
            SELECT o_orderkey + k*{O} AS o_orderkey, o_custkey + k*{C} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {{src}}, range({FACTOR}) r(k)""",
        "lineitem": f"""
            SELECT l_orderkey + k*{O} AS l_orderkey, l_partkey + k*{P} AS l_partkey,
                   l_suppkey + k*{S} AS l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM {{src}}, range({FACTOR}) r(k)""",
        # user_id shares the customer key domain (g5 as-of joins on it)
        "events": f"""
            SELECT event_id + k*{E} AS event_id, ts, user_id + k*{C} AS user_id,
                   event_type, value, props
            FROM {{src}}, range({FACTOR}) r(k)""",
        "documents": f"""
            SELECT doc_id + k*{D} AS doc_id,
                   CASE WHEN k = 0 THEN text
                        ELSE regexp_replace(text, '(\\S+)', '\\1_r' || k, 'g') END AS text,
                   lang, source, n_chars
            FROM {{src}}, range({FACTOR}) r(k)""",
        "embeddings": f"""
            SELECT vec_id + k*{V} AS vec_id, embedding, label
            FROM {{src}}, range({FACTOR}) r(k)""",
    }

    for t, sql in copies.items():
        q = sql.format(src=src(t))
        con.sql(f"COPY ({q}) TO '{DEST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{DEST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
