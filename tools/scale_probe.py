#!/usr/bin/env python3
"""Build an N-fold replicated copy of a testdata dir for scale probing.

Usage: python3 tools/scale_probe.py <src_sf_dir> <dst_dir> [factor]

Replicates documents/embeddings/events with re-keyed ids, so every
original row gains (factor-1) identical twins — a brutal near-duplicate
load for the dedup/ANN candidate paths (a 10x probe at sf0.1 yields 50k
docs in 10-way duplicate groups -> ~250k true near-dup pairs).

Caveat: DuckDB rewrites ts as microsecond TIMESTAMP, so the events table
needs `spark.read` schema awareness (Spark reads it as TIMESTAMP_NTZ, not
the nanos-long of the original) — use the probe for the document/vector
operators; event operators are covered by the real testdata.

Then, e.g.:
  spark-shell --master 'local[32]' --driver-memory 8g \
    --driver-class-path target/scala-2.13/classes
  graft.operators.Dedup.dedupMinhash(spark, "<dst_dir>").count
"""
import sys
import duckdb

src, dst = sys.argv[1], sys.argv[2]
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
con = duckdb.connect()
n_docs = con.execute(
    f"SELECT count(*) FROM read_parquet('{src}/documents.parquet')").fetchone()[0]
n_ev = con.execute(
    f"SELECT count(*) FROM read_parquet('{src}/events.parquet')").fetchone()[0]
con.execute(f"""
COPY (SELECT doc_id + {n_docs} * r AS doc_id, text, lang, source, n_chars
      FROM read_parquet('{src}/documents.parquet'), range(0, {factor}) t(r))
TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (SELECT vec_id + {n_docs} * r AS vec_id, embedding, label
      FROM read_parquet('{src}/embeddings.parquet'), range(0, {factor}) t(r))
TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (SELECT event_id + {n_ev} * r AS event_id, ts, user_id + 10000 * r AS user_id,
             event_type, value, props
      FROM read_parquet('{src}/events.parquet'), range(0, {factor}) t(r))
TO '{dst}/events.parquet' (FORMAT PARQUET)""")
# Star-schema facts for the analytics family (copurchase, q18, q4...):
# orderkeys re-key (linear growth in orders/baskets, identical basket
# size distribution); part/supp/cust keys stay, so per-part counts grow
# by `factor` — the realistic axis (more orders, same catalog).
n_ord = con.execute(
    f"SELECT count(*) FROM read_parquet('{src}/orders.parquet')").fetchone()[0]
con.execute(f"""
COPY (SELECT l_orderkey + {n_ord} * r AS l_orderkey, l_partkey, l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{src}/lineitem.parquet'), range(0, {factor}) t(r))
TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")
con.execute(f"""
COPY (SELECT o_orderkey + {n_ord} * r AS o_orderkey, o_custkey, o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{src}/orders.parquet'), range(0, {factor}) t(r))
TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
for t in ("customer", "supplier", "part", "nation", "region"):
    con.execute(f"""
    COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))
    TO '{dst}/{t}.parquet' (FORMAT PARQUET)""")
print(f"wrote {factor}x replica of {src} to {dst}")
