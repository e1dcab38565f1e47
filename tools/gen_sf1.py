#!/usr/bin/env python3
"""Deterministic sf1 upsample of the driver's sf0.1 tables — the third
scale decade for EVERY oracle family (round-12 verdict item #1 closed the
gap: the TPC-H star and the events->customer key domain are now generated
too, so the relational/events-x-customer oracles are sf1-valid).

Ten deterministic copies of each table (pure SQL over the existing
parquet, no RNG). All id offsets use stride = max(id)+1 (round-12 ADVICE:
count(*) is collision-free only while ids happen to be dense 0-based; a
sparse-id source would silently collide across copies).

  - documents: doc_id' = doc_id + c*stride; copy 0 text verbatim, copy c>0
    text || ' v<c>' (one extra token -> high-Jaccard CROSS-COPY near-dups,
    the realistic re-crawl shape, at 10x volume); n_chars recomputed so
    the length invariant holds.
  - embeddings: vec_id' = vec_id + c*stride; every component shifted by
    c * 0.001 (distinct vectors, near-identical direction -> cross-copy
    semantic near-dups); label kept.
  - events: 10 copies, timeline shifted by c*31 days (the sf0.1 window is
    one month) so the event RATE stays constant while the corpus covers
    10x the wall-clock. user_id' = user_id + c * CUSTOMER_STRIDE — the
    customer key domain, NOT events' own user domain: copy c's users are
    copy c's customers, so events x customer joins (market_share,
    user_retention, skew_join_salted, fk_orphans) stay valid at sf1 with
    constant per-copy user density.
  - TPC-H star: customer/orders/lineitem/part/supplier upsampled with
    consistent per-domain strides (o_custkey follows customer's stride,
    lineitem's three FKs follow orders/part/supplier); non-key columns
    verbatim so value distributions are scale-invariant. nation/region
    copied verbatim — fixed-size dimensions at every TPC-H SF.

Both engines read the SAME generated files, so any perturbation is
correctness-neutral; what the gate exercises is count-derived parameter
branches and join plans agreeing cross-engine one decade up.

Usage: python3 tools/gen_sf1.py [outDir] [srcDir]
  (defaults: .scale/sf1 from /root/testdata/sf0.1; pass .scale/sf10
   .scale/sf1 to stack a second decade for bench-only scale runs)
"""
import os
import sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
COPIES = 10
os.makedirs(OUT, exist_ok=True)

con = duckdb.connect()


def stride(table, key):
    return 1 + con.execute(
        f"SELECT max({key}) FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]


doc_stride = stride("documents", "doc_id")
vec_stride = stride("embeddings", "vec_id")
ev_stride = stride("events", "event_id")
cust_stride = stride("customer", "c_custkey")
order_stride = stride("orders", "o_orderkey")
part_stride = stride("part", "p_partkey")
supp_stride = stride("supplier", "s_suppkey")

COPY_JOIN = f"CROSS JOIN (SELECT unnest(range({COPIES})) AS c) c"


def gen(table, select_sql, order_by):
    con.execute(f"""
    COPY (
      SELECT {select_sql}
      FROM read_parquet('{SRC}/{table}.parquet') t
      {COPY_JOIN}
      ORDER BY {order_by}
    ) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)
    """)


gen("documents", f"""
    t.doc_id + c.c * {doc_stride} AS doc_id,
    CASE WHEN c.c = 0 THEN t.text ELSE t.text || ' v' || c.c END AS text,
    t.lang, t.source,
    CAST(length(CASE WHEN c.c = 0 THEN t.text
                     ELSE t.text || ' v' || c.c END) AS BIGINT) AS n_chars
    """, "doc_id")

gen("embeddings", f"""
    t.vec_id + c.c * {vec_stride} AS vec_id,
    [CAST(x + c.c * 0.001 AS FLOAT) for x in t.embedding] AS embedding,
    t.label
    """, "vec_id")

gen("events", f"""
    t.event_id + c.c * {ev_stride} AS event_id,
    t.ts + (c.c * INTERVAL 31 DAY) AS ts,
    t.user_id + c.c * {cust_stride} AS user_id,
    t.event_type, t.value, t.props
    """, "ts")

gen("customer", f"""
    t.c_custkey + c.c * {cust_stride} AS c_custkey,
    t.c_name, t.c_nationkey, t.c_acctbal, t.c_mktsegment
    """, "c_custkey")

gen("orders", f"""
    t.o_orderkey + c.c * {order_stride} AS o_orderkey,
    t.o_custkey + c.c * {cust_stride} AS o_custkey,
    t.o_orderstatus, t.o_totalprice, t.o_orderdate, t.o_orderpriority
    """, "o_orderkey")

gen("lineitem", f"""
    t.l_orderkey + c.c * {order_stride} AS l_orderkey,
    t.l_partkey + c.c * {part_stride} AS l_partkey,
    t.l_suppkey + c.c * {supp_stride} AS l_suppkey,
    t.l_linenumber, t.l_quantity, t.l_extendedprice, t.l_discount,
    t.l_tax, t.l_returnflag, t.l_linestatus, t.l_shipdate
    """, "l_orderkey, l_linenumber")

gen("part", f"""
    t.p_partkey + c.c * {part_stride} AS p_partkey,
    t.p_name, t.p_brand, t.p_type, t.p_size, t.p_retailprice
    """, "p_partkey")

gen("supplier", f"""
    t.s_suppkey + c.c * {supp_stride} AS s_suppkey,
    t.s_name, t.s_nationkey, t.s_acctbal
    """, "s_suppkey")

# fixed-size dimensions: every TPC-H SF ships the same 25 nations / 5 regions
for t in ("nation", "region"):
    con.execute(f"""
    COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))
    TO '{OUT}/{t}.parquet' (FORMAT PARQUET)
    """)

for t in ("documents", "embeddings", "events", "customer", "orders",
          "lineitem", "part", "supplier", "nation", "region"):
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{OUT}/{t}.parquet rows={n}")

# referential-integrity gate: the whole point of the round-13 rewrite
checks = [
    ("events.user_id in customer",
     f"SELECT count(*) FROM read_parquet('{OUT}/events.parquet') e "
     f"WHERE e.user_id NOT IN (SELECT c_custkey FROM read_parquet('{OUT}/customer.parquet'))"),
    ("orders.o_custkey in customer",
     f"SELECT count(*) FROM read_parquet('{OUT}/orders.parquet') o "
     f"WHERE o.o_custkey NOT IN (SELECT c_custkey FROM read_parquet('{OUT}/customer.parquet'))"),
    ("lineitem.l_orderkey in orders",
     f"SELECT count(*) FROM read_parquet('{OUT}/lineitem.parquet') l "
     f"WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM read_parquet('{OUT}/orders.parquet'))"),
    ("lineitem.l_partkey in part",
     f"SELECT count(*) FROM read_parquet('{OUT}/lineitem.parquet') l "
     f"WHERE l.l_partkey NOT IN (SELECT p_partkey FROM read_parquet('{OUT}/part.parquet'))"),
    ("lineitem.l_suppkey in supplier",
     f"SELECT count(*) FROM read_parquet('{OUT}/lineitem.parquet') l "
     f"WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM read_parquet('{OUT}/supplier.parquet'))"),
]
for name, sql in checks:
    bad = con.execute(sql).fetchone()[0]
    status = "OK" if bad == 0 else f"VIOLATED ({bad} rows)"
    print(f"ri-check {name}: {status}")
    if bad:
        sys.exit(1)
