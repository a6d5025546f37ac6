#!/usr/bin/env python3
"""Generate a 10x (sf1-equivalent) testdata set from /root/testdata/sf0.1.

The driver ships sf0.001/0.01/0.1 only; the scale rehearsal needs one
more decade. This derives sf1 deterministically from sf0.1 by key-space
translation — 10 copies with every primary/foreign key shifted into a
disjoint range — so the join fan-in, group cardinalities per key, and
value distributions match a genuinely larger corpus:

- region/nation stay fixed (TPC-H keeps small dims constant across SF);
- customer/supplier/part/orders/lineitem/events scale 10x with
  consistent FK remapping (per-entity history sizes stay constant,
  exactly TPC-H's scaling law);
- documents: copy 0 is verbatim; copies 1-9 get a deterministic
  per-copy word permutation (string_agg ordered by md5(word, pos,
  copy)) — token/length/language statistics survive, but shingle sets
  decorrelate, so near-dup pair counts scale like a diverse corpus
  instead of a 10-way mirrored one;
- embeddings: copies 1-9 rotate the vector by k positions — for the
  synthetic iid vectors a rotation is ~orthogonal, so ANN/near-dup
  neighborhoods scale instead of collapsing onto cos=1 mirror pairs.

Output: bigdata/sf1/*.parquet (gitignored). Usage: python3 scripts/gen_sf1.py
"""
import os
import duckdb

import sys
# args: [src_dir] [dst_name] [copies] — defaults derive sf1 from sf0.1;
# "gen_sf1.py bigdata/sf1 sf10 10" derives the next decade from sf1
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
if not os.path.isabs(SRC): SRC = os.path.join(_root, SRC)
DST = os.path.join(_root, "bigdata", sys.argv[2] if len(sys.argv) > 2 else "sf1")
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

# GEN_TABLES=documents,embeddings restricts generation to a table
# subset — the next decade of the corpus-side tables costs ~10x the
# prior one, so a text/dedup/ANN-only rehearsal shouldn't pay for a
# lineitem rewrite it won't read. Default: every table.
_only = {t.strip() for t in os.environ.get("GEN_TABLES", "").split(",") if t.strip()}

def write(t, sql):
    if _only and t not in _only:
        return
    out = f"{DST}/{t}.parquet"
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"{t}: {n} rows")

# fixed dims: verbatim
for t in ("region", "nation"):
    write(t, f"SELECT * FROM {src(t)}")

# key-range sizes (offset unit per copy)
C = con.execute(f"SELECT max(c_custkey)+1 FROM {src('customer')}").fetchone()[0]
S = con.execute(f"SELECT max(s_suppkey)+1 FROM {src('supplier')}").fetchone()[0]
P = con.execute(f"SELECT max(p_partkey)+1 FROM {src('part')}").fetchone()[0]
O = con.execute(f"SELECT max(o_orderkey)+1 FROM {src('orders')}").fetchone()[0]
E = con.execute(f"SELECT max(event_id)+1 FROM {src('events')}").fetchone()[0]
U = con.execute(f"SELECT max(user_id)+1 FROM {src('events')}").fetchone()[0]
D = con.execute(f"SELECT max(doc_id)+1 FROM {src('documents')}").fetchone()[0]
V = con.execute(f"SELECT max(vec_id)+1 FROM {src('embeddings')}").fetchone()[0]

copies = f"(SELECT unnest(range({COPIES})) AS k)"

write("customer", f"""
  SELECT c_custkey + k*{C} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM {src('customer')} CROSS JOIN {copies}""")

write("supplier", f"""
  SELECT s_suppkey + k*{S} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')} CROSS JOIN {copies}""")

write("part", f"""
  SELECT p_partkey + k*{P} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
  FROM {src('part')} CROSS JOIN {copies}""")

write("orders", f"""
  SELECT o_orderkey + k*{O} AS o_orderkey, o_custkey + k*{C} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')} CROSS JOIN {copies}""")

write("lineitem", f"""
  SELECT l_orderkey + k*{O} AS l_orderkey, l_partkey + k*{P} AS l_partkey,
         l_suppkey + k*{S} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')} CROSS JOIN {copies}""")

write("events", f"""
  SELECT event_id + k*{E} AS event_id, ts, user_id + k*{U} AS user_id,
         event_type, value, props
  FROM {src('events')} CROSS JOIN {copies}""")

# documents: copy 0 verbatim; copies 1-9 word-permuted per copy
write("documents", f"""
  WITH base AS (
    SELECT d.*, k FROM {src('documents')} d CROSS JOIN {copies}
  ), words AS (
    SELECT doc_id, k, lang, source,
           unnest(string_split(text, ' ')) AS w,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM base
    WHERE k > 0
  ), permuted AS (
    SELECT doc_id, k, lang, source,
           string_agg(w, ' ' ORDER BY md5(w || '|' || pos || '|' || k)) AS text
    FROM words GROUP BY doc_id, k, lang, source
  )
  SELECT doc_id AS doc_id, text, lang, source, n_chars
  FROM base WHERE k = 0
  UNION ALL
  SELECT doc_id + k*{D} AS doc_id, text, lang, source, length(text)::BIGINT AS n_chars
  FROM permuted""")

# embeddings: copy 0 verbatim; copies 1-9 rotate the vector by a
# per-(vec_id, k) SALTED amount. A fixed per-copy rotation would
# compose across derivations (sf1 -> sf10 would stack rotations j+k,
# giving every base vector dozens of exact duplicates at equal j+k —
# the cos=1 mirror collapse this perturbation exists to prevent);
# hashing (vec_id, k) makes the amount unique per output vector, so
# repeated derivation keeps neighborhoods decorrelated (measured
# residual: ~1.4% of same-ancestor pairs collide mod 64 after two
# derivations — bounded, and realistic for a web-scale corpus).
write("embeddings", f"""
  WITH base AS (
    SELECT e.*, k,
           1 + CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR) || '|rot|' || k),1,7)) AS BIGINT) % 62 AS r
    FROM {src('embeddings')} e CROSS JOIN {copies}
  )
  SELECT vec_id AS vec_id, embedding, label FROM base WHERE k = 0
  UNION ALL
  SELECT vec_id + k*{V} AS vec_id,
         (embedding[r+1:] || embedding[1:r])::FLOAT[] AS embedding, label
  FROM base WHERE k > 0""")

print("done ->", DST)
