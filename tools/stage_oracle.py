#!/usr/bin/env python3
"""Materialize the minhash-chain oracle's intermediate relations to
parquet in BOUNDED BATCHES, so DuckDB can verify the chain families at
sf10 without re-deriving 400M shingle md5s inside one query (the r14
`dedup_kcore` capacity cap). Driver-side measurement tooling only.

Every stage's SQL comes from stage_sql.json, dumped by `graft.Verify`
from the SAME Scala fragments the inline oracles embed — this tool
spells NO chain SQL of its own, so the staged derivation cannot drift
from the oracle's.

Stages (each a directory of parquet parts under <stage_dir>):
  sigs  — per-doc minhash signatures; batched by doc_id % B
          (the md5-heavy stage: ~800 shingle md5s per doc)
  tg    — per-doc packed-trigram lists; batched by doc_id % B
  bands — 4 band hashes per doc from the MATERIALIZED sigs (one shot)
  cand  — LSH candidate pairs; batched by hash(bhash) % B — exact,
          because the self-join requires equal bhash
  pairs — trigram-Jaccard-verified pairs; batched by hash(doc_a) % B

Usage: python3 tools/stage_oracle.py <sf_dir> <verify_out_dir> <stage_dir> [batches=32]
(<verify_out_dir> must hold stage_sql.json from a Verify run.)
"""
import sys, os, json, glob, shutil, time
import duckdb

sf_dir = sys.argv[1]
out_dir = sys.argv[2]
stage_dir = sys.argv[3]
B = int(sys.argv[4]) if len(sys.argv) > 4 else 32

stage_sql = json.load(open(f"{out_dir}/stage_sql.json"))
os.makedirs(stage_dir, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET memory_limit='24GB'")


def fresh(name):
    d = f"{stage_dir}/{name}"
    if os.path.isdir(d):
        shutil.rmtree(d)
    os.makedirs(d)
    return d


def batched(name, view_sql_for_batch, sql):
    """Run `sql` once per batch, with the stage's input relation bound
    to a batch-restricted view; one parquet part per batch."""
    d = fresh(name)
    t0 = time.time()
    for k in range(B):
        for vname, vsql in view_sql_for_batch(k).items():
            con.execute(f"CREATE OR REPLACE VIEW {vname} AS {vsql}")
        con.execute(f"COPY ({sql}) TO '{d}/part_{k:03d}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
    print(f"[stage] {name}: {n} rows in {time.time()-t0:.1f}s ({B} batches)")


docs = f"read_parquet('{sf_dir}/documents.parquet')"

# sigs + tg: batch the documents view by doc_id
for stage in ("sigs", "tg"):
    batched(
        stage,
        lambda k: {"documents": f"SELECT * FROM {docs} WHERE doc_id % {B} = {k}"},
        stage_sql[stage])

# bands: derived from materialized sigs — 4 md5s/doc, one shot
d = fresh("bands")
con.execute(f"CREATE OR REPLACE VIEW staged_sigs AS SELECT * FROM read_parquet('{stage_dir}/sigs/*.parquet')")
t0 = time.time()
con.execute(f"COPY ({stage_sql['bands']}) TO '{d}/part_000.parquet' (FORMAT PARQUET)")
n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
print(f"[stage] bands: {n} rows in {time.time()-t0:.1f}s (1 batch)")

# cand: self-join within bhash hash-buckets (exact partition of the
# JOIN space: the join predicate requires equal bhash) — but the same
# (doc_a, doc_b) pair can collide in MULTIPLE bands landing in
# different buckets, so the per-batch DISTINCT is not global.
# Consolidate with a global DISTINCT: cand is pair-volume (linear in
# the corpus's dup structure), not md5-volume — the cheap side.
batched(
    "cand_raw",
    lambda k: {"bands": f"SELECT * FROM read_parquet('{stage_dir}/bands/*.parquet') WHERE hash(bhash) % {B} = {k}"},
    stage_sql["cand"])
d = fresh("cand")
t0 = time.time()
con.execute(f"COPY (SELECT DISTINCT * FROM read_parquet('{stage_dir}/cand_raw/*.parquet'))"
            f" TO '{d}/part_000.parquet' (FORMAT PARQUET)")
n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
print(f"[stage] cand: {n} rows after global DISTINCT in {time.time()-t0:.1f}s")
shutil.rmtree(f"{stage_dir}/cand_raw")

# pairs: verify candidates against the staged trigram lists
batched(
    "pairs",
    lambda k: {
        "cand": f"SELECT * FROM read_parquet('{stage_dir}/cand/*.parquet') WHERE hash(doc_a) % {B} = {k}",
        "tg": f"SELECT * FROM read_parquet('{stage_dir}/tg/*.parquet')"},
    stage_sql["pairs"])

print(f"[stage] done -> {stage_dir}")
