#!/usr/bin/env python
"""Deterministic sf1 surface = 10x key-shifted replication of the
driver's sf0.1 testdata (which is read-only; this writes elsewhere).

Purpose (r7 verdict item 2): run the FULL 128-query audit and bench at
10x the driver's bench scale to catch accidentally super-linear
queries and summation-order drift the smaller surfaces can't. The
cross-engine audit compares Spark and DuckDB on the SAME generated
parquet, so parity validity does not depend on distributional realism
— but growth measurements do, so replication is shaped to keep every
rate LINEAR:

* all keys shift by ``replica * (max_key + 1)`` consistently across FK
  pairs (orders.o_custkey moves with customer.c_custkey, lineitem with
  orders/part/supplier, events.user_id with itself) — entity counts
  grow 10x, per-entity cardinalities stay constant;
* region/nation stay unreplicated (bounded dims stay bounded);
* dates/timestamps/values are untouched (filter selectivities hold);
* document TEXTS are token-ROTATED per replica (split on ' ', rotate
  by replica-dependent offset, rejoin): token multiset, n_chars, and
  language stats are exactly preserved while replica-vs-replica
  shingle Jaccard collapses to ~0 — the corpus duplicate rate grows
  linearly, not quadratically (10 verbatim copies of every doc would
  make every near-dup query's output quadratic in replicas, a DATA
  artifact masquerading as a super-linear plan);
* embeddings get a replica-dependent FLOAT nudge on coordinate 0 so
  cosine ties/duplicate vectors don't blow up ANN candidate sets.

Usage: python scripts/make_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect(":memory:")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet')"
        )

    def stride(table: str, key: str) -> int:
        return con.sql(f"SELECT MAX({key}) + 1 FROM {table}").fetchone()[0]

    s_cust = stride("customer", "c_custkey")
    s_supp = stride("supplier", "s_suppkey")
    s_part = stride("part", "p_partkey")
    s_ord = stride("orders", "o_orderkey")
    s_ev = stride("events", "event_id")
    s_usr = stride("events", "user_id")
    s_doc = stride("documents", "doc_id")
    s_vec = stride("embeddings", "vec_id")

    r = f"(SELECT UNNEST(range({REPLICAS})) AS i)"
    copies = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""
            SELECT CAST(c_custkey + i * {s_cust} AS BIGINT) AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM customer CROSS JOIN {r}""",
        "supplier": f"""
            SELECT CAST(s_suppkey + i * {s_supp} AS BIGINT) AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM supplier CROSS JOIN {r}""",
        "part": f"""
            SELECT CAST(p_partkey + i * {s_part} AS BIGINT) AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM part CROSS JOIN {r}""",
        "orders": f"""
            SELECT CAST(o_orderkey + i * {s_ord} AS BIGINT) AS o_orderkey,
                   CAST(o_custkey + i * {s_cust} AS BIGINT) AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders CROSS JOIN {r}""",
        "lineitem": f"""
            SELECT CAST(l_orderkey + i * {s_ord} AS BIGINT) AS l_orderkey,
                   CAST(l_partkey + i * {s_part} AS BIGINT) AS l_partkey,
                   CAST(l_suppkey + i * {s_supp} AS BIGINT) AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem CROSS JOIN {r}""",
        "events": f"""
            SELECT CAST(event_id + i * {s_ev} AS BIGINT) AS event_id, ts,
                   CAST(user_id + i * {s_usr} AS BIGINT) AS user_id,
                   event_type, value, props
            FROM events CROSS JOIN {r}""",
        # token rotation: same multiset of tokens and separators, so
        # n_chars and every token statistic are preserved exactly
        "documents": f"""
            SELECT CAST(doc_id + i * {s_doc} AS BIGINT) AS doc_id,
                   CASE WHEN i = 0 THEN text ELSE array_to_string(
                       list_concat(
                           toks[1 + ((i * len(toks)) // {REPLICAS}):],
                           toks[:((i * len(toks)) // {REPLICAS})]
                       ), ' ')
                   END AS text,
                   lang, source, n_chars
            FROM (SELECT *, string_split(text, ' ') AS toks FROM documents)
            CROSS JOIN {r}""",
        "embeddings": f"""
            SELECT CAST(vec_id + i * {s_vec} AS BIGINT) AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                        ELSE list_concat(
                            [CAST(embedding[1] + 0.01 * i AS FLOAT)],
                            embedding[2:])
                   END AS embedding,
                   label
            FROM embeddings CROSS JOIN {r}""",
    }
    for t, q in copies.items():
        dst = os.path.join(out, f"{t}.parquet")
        con.sql(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}", flush=True)


if __name__ == "__main__":
    main()
