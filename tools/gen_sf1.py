#!/usr/bin/env python3
"""Deterministic sf1 upsample of the driver's sf0.1 documents/embeddings
tables — the third scale decade for the dedup/ANN family's corpus-derived
parameter branches (round-11 verdict item #3).

Ten deterministic copies of each table (pure SQL over the existing
parquet, no RNG):
  - documents: doc_id' = doc_id + c*N; copy 0 text verbatim, copy c>0
    text || ' v<c>' (one extra token -> high-Jaccard CROSS-COPY near-dups,
    the realistic re-crawl shape, at 10x volume); n_chars recomputed so
    the length invariant holds.
  - embeddings: vec_id' = vec_id + c*N; every component shifted by
    c * 0.001 (distinct vectors, near-identical direction -> cross-copy
    semantic near-dups); label kept.

Both engines read the SAME generated files, so any perturbation is
correctness-neutral; what the gate exercises is the ceil(log2 n) /
sqrt(n)-derived parameter branches agreeing cross-engine one decade up.

Usage: python3 tools/gen_sf1.py [outDir]   (default .scale/sf1)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
os.makedirs(OUT, exist_ok=True)

con = duckdb.connect()

n_docs = con.execute(
    f"SELECT count(*) FROM read_parquet('{SRC}/documents.parquet')").fetchone()[0]
n_vecs = con.execute(
    f"SELECT count(*) FROM read_parquet('{SRC}/embeddings.parquet')").fetchone()[0]

con.execute(f"""
COPY (
  SELECT d.doc_id + c.c * {n_docs} AS doc_id,
         CASE WHEN c.c = 0 THEN d.text ELSE d.text || ' v' || c.c END AS text,
         d.lang, d.source,
         CAST(length(CASE WHEN c.c = 0 THEN d.text
                          ELSE d.text || ' v' || c.c END) AS BIGINT) AS n_chars
  FROM read_parquet('{SRC}/documents.parquet') d
  CROSS JOIN (SELECT unnest(range(10)) AS c) c
  ORDER BY doc_id
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT e.vec_id + c.c * {n_vecs} AS vec_id,
         [CAST(x + c.c * 0.001 AS FLOAT) for x in e.embedding] AS embedding,
         e.label
  FROM read_parquet('{SRC}/embeddings.parquet') e
  CROSS JOIN (SELECT unnest(range(10)) AS c) c
  ORDER BY vec_id
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
""")

# events: 10 copies, user_id offset per copy (per-user streams intact),
# timeline shifted by c * 31 days (the sf0.1 window is one month) so the
# event RATE stays constant while the corpus covers 10x the wall-clock —
# sessions, interval joins, and hour buckets scale without densifying.
n_users = 1 + con.execute(
    f"SELECT max(user_id) FROM read_parquet('{SRC}/events.parquet')").fetchone()[0]
n_ev = con.execute(
    f"SELECT count(*) FROM read_parquet('{SRC}/events.parquet')").fetchone()[0]
con.execute(f"""
COPY (
  SELECT e.event_id + c.c * {n_ev} AS event_id,
         e.ts + (c.c * INTERVAL 31 DAY) AS ts,
         e.user_id + c.c * {n_users} AS user_id,
         e.event_type, e.value, e.props
  FROM read_parquet('{SRC}/events.parquet') e
  CROSS JOIN (SELECT unnest(range(10)) AS c) c
  ORDER BY ts
) TO '{OUT}/events.parquet' (FORMAT PARQUET)
""")

for t in ("documents", "embeddings", "events"):
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{OUT}/{t}.parquet rows={n}")
