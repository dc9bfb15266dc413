#!/usr/bin/env python3
"""Dev-only: rebuild the 16x scale-sweep corpus (default /tmp/sf16x).

Replicates every sf0.1 table 16x with PER-COPY id shifts so joins stay
FK-consistent and dedup/graph/ER node sets genuinely grow 16x. Not part
of the shipped library; the SCALE.md sweeps cite this recipe.

Shift design (each constraint is an op premise a plain copy violates):
- suppkey bands are PERMUTED by ((k*7) % 16) to decorrelate supplier
  bands from part bands -- a monotone +k shift correlates the dims and
  in17_zorder_layout's locality `require` fails (SCALE.md #14: premise
  violation, not an engine bug).
- customer keys shift DENSELY (+k*15000, keeping 0..16*15000-1 dense)
  because q56's decimal-prefix hierarchy requires every prefix of
  custkey+1 to exist (its in-op require catches gap bases); orders'
  o_custkey shifts identically so the FK holds. Dense keys stay far
  under the er-family's b_id = custkey + 10^7 band.
- the copy index k must NOT leak into the output schema (a previous
  ad-hoc build did, and q22's self-join died with AMBIGUOUS_REFERENCE
  `k` at 16x only) -- hence the EXCLUDE (k).
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf16x"
N = 16

# per-table REPLACE list applied to `SELECT * EXCLUDE (k) REPLACE (...)`
SHIFTS = {
    "lineitem": ("l_orderkey + k*1000000000 AS l_orderkey, "
                 "l_partkey + k*1000000 AS l_partkey, "
                 "l_suppkey + ((k*7)%16)*10000 AS l_suppkey"),
    "orders": ("o_orderkey + k*1000000000 AS o_orderkey, "
               "o_custkey + k*15000 AS o_custkey"),
    "customer": "c_custkey + k*15000 AS c_custkey",
    "part": "p_partkey + k*1000000 AS p_partkey",
    "supplier": "s_suppkey + ((k*7)%16)*10000 AS s_suppkey",
    "events": ("event_id + k*100000000 AS event_id, "
               "user_id + k*1000000 AS user_id"),
    "documents": "doc_id + k*10000000 AS doc_id",
    "embeddings": "vec_id + k*1000000 AS vec_id",
}
COPY_AS_IS = ["region", "nation"]  # the 25-nation domain is semantic

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
for t, repl in SHIFTS.items():
    con.execute(
        f"COPY (SELECT * EXCLUDE (k) REPLACE ({repl}) "
        f"FROM read_parquet('{SRC}/{t}.parquet'), "
        f"(SELECT range AS k FROM range({N}))) "
        f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')")
        .fetchone()[0])
for t in COPY_AS_IS:
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
        f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")

# premise checks: fail HERE, not mid-sweep
checks = [
    # schema drift (the leaked-k bug)
    ("no stray columns", f"""
      SELECT count(*) = 0 FROM (
        SELECT column_name FROM (DESCRIBE SELECT * FROM
          read_parquet('{DST}/orders.parquet'))
        EXCEPT
        SELECT column_name FROM (DESCRIBE SELECT * FROM
          read_parquet('{SRC}/orders.parquet')))"""),
    # FK consistency
    ("l_suppkey FK", f"""
      SELECT count(*) = 0 FROM read_parquet('{DST}/lineitem.parquet') l
      LEFT JOIN read_parquet('{DST}/supplier.parquet') s
        ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL"""),
    ("o_custkey FK", f"""
      SELECT count(*) = 0 FROM read_parquet('{DST}/orders.parquet') o
      LEFT JOIN read_parquet('{DST}/customer.parquet') c
        ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL"""),
    ("l_orderkey FK", f"""
      SELECT count(*) = 0 FROM read_parquet('{DST}/lineitem.parquet') l
      LEFT JOIN read_parquet('{DST}/orders.parquet') o
        ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL"""),
    # q56 premise: customer keys 0-based dense
    ("custkey dense", f"""
      SELECT min(c_custkey) = 0 AND
             max(c_custkey) = count(*) - 1 AND
             count(DISTINCT c_custkey) = count(*)
      FROM read_parquet('{DST}/customer.parquet')"""),
]
for name, sql in checks:
    ok = con.execute(sql).fetchone()[0]
    print(("ok  " if ok else "FAIL"), name)
    if not ok:
        sys.exit(1)
print("corpus ready at", DST)
