#!/usr/bin/env python3
"""Generate a local sf1 dataset (10x sf0.1) for scaling measurements.

Driver-side measurement tooling (not shipped library code): the round
driver's testdata tops out at sf0.1 (17 MB), so every superlinear-risk
claim in SCALE.md was extrapolated from plan shape. This builds a 10x
dataset whose STATISTICAL SHAPE scales the way real growth would, so
BENCH_sf1.json / SCALE.md can record measured sf0.1 -> sf1 exponents:

- 10 copies of each fact table with a per-copy key STRIDE applied
  consistently to primary and foreign keys (copy k's orders reference
  copy k's customers), so join fan-outs and group cardinalities scale
  linearly like organic growth, not like a degenerate hot key.
- dimension tables (region, nation) stay fixed — the TPC-H contract.
- documents: copy 0 is byte-identical to sf0.1; copies k>0 go through
  a per-copy a-z SUBSTITUTION CIPHER (stopwords preserved so quality
  gates keep passing). A cipher is an ISOMETRY of the similarity
  space: every intra-copy token/shingle/trigram overlap — and so
  every MinHash/SimHash/Jaccard/PPJoin relation — is EXACTLY copy 0's,
  so dup structure scales perfectly linearly (x10 clusters, x10
  pairs), while cross-copy similarity collapses to the stopword floor
  real corpora have anyway. (First attempt suffixed every token,
  which injected shared cross-doc character trigrams and blew up the
  near-dup candidate volume quadratically — an artifact, not data.)
  Replicating text verbatim would be the opposite artifact: 10-clique
  dup components (45 pairs each) the real corpus does not have.
- embeddings: copies k>0 get small deterministic per-copy noise
  (seeded), preserving per-copy cluster geometry for IVF/LSH while
  keeping cross-copy vectors distinct.
- events: user_id strides (10x users), timestamps unchanged (10x
  events per window — window-agg groups stay put, per-window counts
  grow; the skew-ish direction that stresses state).

Usage: python3 tools/gen_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/graft_sf1] [seed=9176]
Deterministic (seed fixed); ~240 MB output at sf1. COMPOSES: running it
again with src=<sf1 dir>, a fresh seed (required — see the SEED comment)
and dst=/tmp/graft_sf10 yields a 100x (~2.4 GB) dataset with the same
linear dup-structure invariant, self-checked at every level.
"""
import sys, os, hashlib
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
# Composition (a second 10x decade, e.g. src=sf1 -> dst=sf10) REQUIRES a
# fresh seed: reusing the sf1 ciphers would make second-level copy k's
# untouched block equal first-level copy k verbatim (sigma_k(base) both
# times) — manufactured cross-copy exact dups the self-check rejects.
# Distinct seeds make every composite sigma'_{k2} . sigma_{k1} a fresh
# random permutation (a collision with any single-level sigma needs
# sigma'_{k2} = sigma_{k1'} . sigma_{k1}^-1: probability 1/26! per pair).
# The same aliasing exists for the embedding noise tag, so the seed
# enters the noise hash too (the default keeps sf1 byte-identical).
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 9176
COPIES = 10
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()


def stride(table, key):
    return con.execute(
        f"SELECT max({key}) + 1 FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]


def gen(table, sql):
    out = f"{dst}/{table}.parquet"
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"[gen_sf1] {table}: {n} rows")


def copies_union(table, expr_fn):
    return " UNION ALL ".join(
        f"SELECT {expr_fn(k)} FROM read_parquet('{src}/{table}.parquet')"
        for k in range(COPIES))


# dimensions: fixed
for t in ("region", "nation"):
    gen(t, f"SELECT * FROM read_parquet('{src}/{t}.parquet')")

cust_s = stride("customer", "c_custkey")
supp_s = stride("supplier", "s_suppkey")
part_s = stride("part", "p_partkey")
ord_s = stride("orders", "o_orderkey")
ev_s = stride("events", "event_id")
user_s = stride("events", "user_id")
doc_s = stride("documents", "doc_id")
vec_s = stride("embeddings", "vec_id")

gen("customer", copies_union(
    "customer", lambda k: f"c_custkey + {k * cust_s} AS c_custkey, "
    "c_name, c_nationkey, c_acctbal, c_mktsegment"))
gen("supplier", copies_union(
    "supplier", lambda k: f"s_suppkey + {k * supp_s} AS s_suppkey, "
    "* EXCLUDE (s_suppkey)"))
gen("part", copies_union(
    "part", lambda k: f"p_partkey + {k * part_s} AS p_partkey, "
    "* EXCLUDE (p_partkey)"))
gen("orders", copies_union(
    "orders", lambda k: f"o_orderkey + {k * ord_s} AS o_orderkey, "
    f"o_custkey + {k * cust_s} AS o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"))
gen("lineitem", copies_union(
    "lineitem", lambda k: f"l_orderkey + {k * ord_s} AS l_orderkey, "
    f"l_partkey + {k * part_s} AS l_partkey, "
    f"l_suppkey + {k * supp_s} AS l_suppkey, "
    "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    "l_returnflag, l_linestatus, l_shipdate"))
gen("events", copies_union(
    "events", lambda k: f"event_id + {k * ev_s} AS event_id, ts, "
    f"user_id + {k * user_s} AS user_id, event_type, value, props"))

# documents: per-copy substitution cipher for k>0 (copy 0 identical);
# length-preserving, so n_chars carries over unchanged
import random, string
STOP = ("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")
stop_sql = ", ".join(f"'{w}'" for w in STOP)
doc_selects = ["SELECT * FROM read_parquet('%s/documents.parquet')" % src]
for k in range(1, COPIES):
    perm = list(string.ascii_lowercase)
    random.Random(SEED + k).shuffle(perm)
    dstab = "".join(perm)
    doc_selects.append(
        f"SELECT doc_id + {k * doc_s} AS doc_id, "
        f"array_to_string(list_transform(string_split(text, ' '), "
        f"t -> CASE WHEN t IN ({stop_sql}) THEN t "
        f"ELSE translate(t, 'abcdefghijklmnopqrstuvwxyz', '{dstab}') END), ' ') AS text, "
        f"lang, source, n_chars "
        f"FROM read_parquet('{src}/documents.parquet')")
gen("documents", " UNION ALL ".join(doc_selects))

# embeddings: per-copy deterministic noise for k>0 via a hash-seeded
# pseudo-random per (vec_id, dim, copy) in [-0.02, 0.02]
emb_selects = ["SELECT * FROM read_parquet('%s/embeddings.parquet')" % src]
for k in range(1, COPIES):
    # default seed keeps the noise tag '_{k}' so sf1 regenerates
    # byte-identically to the recorded BENCH_sf1 dataset
    tag = f"_{k}" if SEED == 9176 else f"_{SEED}_{k}"
    emb_selects.append(
        f"SELECT vec_id + {k * vec_s} AS vec_id, "
        f"list_transform(embedding, x -> (x + "
        f"((hash(vec_id::VARCHAR || '_' || x::VARCHAR || '{tag}') % 41)::DOUBLE - 20.0) "
        f"/ 1000.0)::FLOAT) AS embedding, label "
        f"FROM read_parquet('{src}/embeddings.parquet')")
gen("embeddings", " UNION ALL ".join(emb_selects))

# self-check the isometry claim: intra-copy exact-dup pairs must be
# exactly 10x the base corpus's, with ZERO cross-copy exact dups —
# the linear-structure property every dedup scaling exponent rests on
base_pairs = con.execute(
    f"SELECT count(*) FROM read_parquet('{src}/documents.parquet') a "
    f"JOIN read_parquet('{src}/documents.parquet') b "
    f"ON a.text = b.text AND a.doc_id < b.doc_id").fetchone()[0]
intra, cross = con.execute(
    f"WITH d AS (SELECT doc_id, doc_id // {doc_s} AS cp, text "
    f"FROM read_parquet('{dst}/documents.parquet')) "
    f"SELECT count(*) FILTER (a.cp = b.cp), count(*) FILTER (a.cp <> b.cp) "
    f"FROM d a JOIN d b ON a.text = b.text AND a.doc_id < b.doc_id").fetchone()
assert intra == base_pairs * COPIES and cross == 0, \
    f"dup structure not linear: intra {intra} (want {base_pairs * COPIES}), cross {cross}"
print(f"[gen_sf1] dup-structure check: {intra} intra-copy exact pairs "
      f"(= {COPIES}x base {base_pairs}), 0 cross-copy")

h = hashlib.md5()
for t in sorted(os.listdir(dst)):
    h.update(open(f"{dst}/{t}", "rb").read())
print(f"[gen_sf1] done -> {dst}  (md5 of all parquet bytes: {h.hexdigest()})")
