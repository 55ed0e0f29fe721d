#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: DuckDB-compare each
Verify output parquet against its oracle SQL. Driver-side tool only (not
part of the shipped library).

The comparison is TYPE-SENSITIVE like the driver's hash: raw pandas
dtypes (straight off DuckDB's arrow conversion, BEFORE any int64/float64
normalization) must match between the Spark parquet and the oracle
result. An uncast SUM(BIGINT) in an oracle comes back HUGEINT -> object/
float dtype and fails here even when every value agrees — the exact bug
class that cost 5 entries in round 10.

Additionally every oracle is DESCRIBE-bound and any HUGEINT / UHUGEINT /
INT128 / UINT128 result column is a lint failure on its own (those types
cannot round-trip the driver's hash against a Spark BIGINT). Run just the
lint (no Verify outputs needed beyond oracle_sql.json, which
`graft.Verify <sf> <out> --oracle-only` dumps in seconds) with:

    python3 tools/check.py <sf_dir> <out_dir> --lint-only
"""
import sys, os, json, glob, re
import duckdb, pandas as pd

# flags may appear anywhere; strip them before reading positionals
args = [a for a in sys.argv[1:] if not a.startswith("--")]
lint_only = "--lint-only" in sys.argv[1:]
# --only=a,b,c scopes BOTH lint and compare to the named entries — for
# incremental sf10 batches, where recomparing every standing 10M-row
# output costs more than the new entries being checked.
only = None
staged_dir = None
batch_docs = 0
for a in sys.argv[1:]:
    if a.startswith("--only="):
        only = {n.strip() for n in a[len("--only="):].split(",") if n.strip()}
    if a.startswith("--staged="):
        staged_dir = a[len("--staged="):]
    if a.startswith("--batch-docs="):
        batch_docs = int(a[len("--batch-docs="):])
sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# --staged=<dir>: verify the minhash-chain families against relations
# MATERIALIZED by tools/stage_oracle.py instead of re-deriving 400M
# shingle md5s inside one query (sf10 capacity; see
# DedupQueries.stageSql). The staged SQL comes from
# oracle_sql_staged.json — the same Scala fragments, exact-string
# rewritten onto staged_* views by Verify, so it cannot drift.
if staged_dir is not None:
    staged_sql = json.load(open(f"{out_dir}/oracle_sql_staged.json"))
    oracle.update({k: v for k, v in staged_sql.items() if k in oracle})
if only is not None:
    missing = only - set(oracle)
    if missing:
        print(f"WARN --only names not in oracle map: {sorted(missing)}")
    oracle = {k: v for k, v in oracle.items() if k in only}
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
if staged_dir is not None:
    for rel in ["sigs", "tg", "bands", "cand", "pairs"]:
        con.execute(f"CREATE VIEW staged_{rel} AS SELECT * FROM "
                    f"read_parquet('{staged_dir}/{rel}/*.parquet')")
    con.execute("SET memory_limit='24GB'")

BAD_TYPES = ("HUGEINT", "UHUGEINT", "INT128", "UINT128")

def lint(name, sql):
    """DESCRIBE-bind the oracle; return list of (col, type, reason) offenders.

    Two type classes are banned from an oracle's FINAL projection:
    - HUGEINT/UHUGEINT: cannot round-trip the driver's hash against a
      Spark BIGINT (the round-10 lesson) -> CAST(... AS BIGINT).
    - DECIMAL: its precision/scale comes from DuckDB's literal- and
      arithmetic-inference rules, which are DuckDB-VERSION-SENSITIVE
      (v1.0.0 infers 0.1 + 0.2 as DECIMAL(3,1)); a driver upgrade can
      silently change the scale and flip value hashes. House rule: a
      double aggregate goes through DECIMAL(18,4) *inside* the query
      (dsum) but the final projection casts to DOUBLE on both sides.
    """
    desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    out = [(c, ty, "wide-int; CAST(... AS BIGINT)") for c, ty, *_ in desc
           if any(b in ty.upper() for b in BAD_TYPES)]
    out += [(c, ty, "decimal scale is dialect-inferred; cast the final column to DOUBLE")
            for c, ty, *_ in desc if "DECIMAL" in ty.upper()]
    return out

# Oracle-SQL constructs whose *behavior* (not type) changed or is broken
# across DuckDB versions; each was worked around individually and the
# avoidance is enforced textually so it can't silently creep back in.
TEXT_LINTS = [
    # v1.0.0 list_reduce corrupts STRUCT accumulators carrying
    # list/string fields across rows (EventQueries.scala:1111-1120:
    # a 4-element fold keeps only the last id; kept ids leak BETWEEN
    # users at other SFs). House rule: fold scalars, or ride a
    # recursive CTE (the events_debounce / taxi_early_fires pattern).
    ("list_reduce-struct-accumulator",
     re.compile(r"list_reduce[^;]{0,400}?(struct_pack|->\s*\{)", re.S | re.I)),
]

# Dialect contract the oracles assume, pinned as seeded probes: each
# (name, sql, expected) runs at lint time, so the DuckDB version doing
# the judging PROVES it still implements the semantics the oracle SQL
# was written against — a driver-side DuckDB upgrade that changes any
# of these fails the lint loudly instead of flipping value hashes
# silently. Expectations recorded against v1.0.0 (FIXTURES.md table E).
DIALECT_PROBES = [
    ("round half-away-from-zero on DOUBLE",
     "SELECT round(2.5::DOUBLE, 0), round(3.5::DOUBLE, 0), round(-2.5::DOUBLE, 0)",
     (3.0, 4.0, -3.0)),
    ("round half-away-from-zero on DECIMAL",
     "SELECT round(2.5::DECIMAL(3,1), 0)::DOUBLE, round(0.125::DECIMAL(9,3), 2)::DOUBLE",
     (3.0, 0.13)),
    ("integer / is true division; // is integer division truncating toward zero (matches Spark div)",
     "SELECT typeof(1/2), 1/2, 1//2, typeof(1::BIGINT // 2), (-3)::BIGINT // 2",
     ("DOUBLE", 0.5, 0, "BIGINT", -1)),
    ("decimal-literal arithmetic keeps max-operand scale (v1.0.0 inference)",
     "SELECT typeof(0.1 + 0.2), (0.1 + 0.2) = 0.3",
     ("DECIMAL(3,1)", True)),
    ("list_reduce is init-first, index-ascending",
     "SELECT list_reduce([1, 2, 3], (s, x) -> s * 10 + x)",
     (123,)),
    ("list_reduce widens to DOUBLE through a DOUBLE init",
     "SELECT typeof(list_reduce(list_prepend(0.0::DOUBLE, [1.0, 2.0]), (s, x) -> s + 0.25 * (x - s))),"
     " list_reduce(list_prepend(0.0::DOUBLE, [1.0, 2.0]), (s, x) -> s + 0.25 * (x - s))",
     ("DOUBLE", 0.6875)),
    ("epoch_ms(TIMESTAMP) is BIGINT milliseconds",
     "SELECT epoch_ms(TIMESTAMP '2024-01-01 00:00:00.123'), typeof(epoch_ms(TIMESTAMP '2024-01-01 00:00:00.123'))",
     (1704067200123, "BIGINT")),
    ("SUM(BIGINT) is HUGEINT (the reason the BIGINT-cast rule exists)",
     "SELECT typeof(sum(x)) FROM (SELECT 1::BIGINT AS x)",
     ("HUGEINT",)),
]

def run_probes():
    n_bad = 0
    for pname, sql, want in DIALECT_PROBES:
        try:
            got = con.execute(sql).fetchone()
        except Exception as e:
            print(f"LINT-FAIL dialect probe [{pname}]: errored: {e}")
            n_bad += 1
            continue
        if tuple(got) != tuple(want):
            print(f"LINT-FAIL dialect probe [{pname}]: got {got}, oracle SQL assumes {want}"
                  " — this DuckDB diverges from the dialect contract (FIXTURES.md table E)")
            n_bad += 1
    if n_bad == 0:
        print(f"LINT OK: {len(DIALECT_PROBES)} dialect probes match the pinned contract "
              f"(duckdb {duckdb.__version__})")
    return n_bad

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints->int64, floats->float64, timestamps->ns
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]): df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]): df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith("datetime"): df[c] = pd.to_datetime(df[c])
        else:
            try:
                import decimal
                if df[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
                    df[c] = df[c].astype("float64")
            except Exception: pass
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def raw_dtypes(df):
    """Pre-normalization dtype FAMILY map. Width differences (int32 vs
    int64) hash identically after the driver's normalization; a family
    change (int -> float64/object, the HUGEINT conversion signature)
    does not — that's what this catches."""
    fams = {}
    for c in df.columns:
        d = df[c]
        if pd.api.types.is_bool_dtype(d): fams[c] = "bool"
        elif pd.api.types.is_integer_dtype(d): fams[c] = "int"
        elif pd.api.types.is_float_dtype(d): fams[c] = "float"
        elif str(d.dtype).startswith("datetime"): fams[c] = "datetime"
        else: fams[c] = str(d.dtype)
    return fams

# ---- oracle lint (always runs; the only thing --lint-only runs) ----
n_lint = run_probes()
for name in sorted(oracle):
    try:
        bad = lint(name, oracle[name])
    except Exception as e:
        print(f"LINT-ERR {name}: {e}"); n_lint += 1; continue
    for col, ty, why in bad:
        print(f"LINT-FAIL {name}: column ({col}, {ty}) — {why}")
        n_lint += 1
    for lname, rx in TEXT_LINTS:
        if rx.search(oracle[name]):
            print(f"LINT-FAIL {name}: oracle SQL matches banned construct [{lname}]")
            n_lint += 1
if n_lint == 0:
    print(f"LINT OK: {len(oracle)} oracles — no wide-int/DECIMAL finals, no banned constructs")
if lint_only:
    sys.exit(1 if n_lint else 0)

# ---- full value + type comparison ----
n_pass = n_fail = 0
for name in sorted(oracle):
    pq_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{pq_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        got_raw = con.execute(f"SELECT * FROM read_parquet('{pq_dir}/*.parquet')").df()
        if batch_docs > 0:
            # --batch-docs=N: evaluate the oracle once per documents
            # batch (doc_id % N) and concatenate. EXACT only for
            # per-doc oracles (each output row a function of one doc —
            # the multimodal codec family); callers scope it with
            # --only to such entries. Bounds DuckDB's peak memory on
            # the per-byte list-comprehension rebuilds at sf10.
            parts = []
            for k in range(batch_docs):
                con.execute(
                    "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/documents.parquet') WHERE doc_id % {batch_docs} = {k}")
                parts.append(con.execute(oracle[name]).df())
            con.execute(
                "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
            # empty frames degrade concat dtypes to object; keep one
            # only when every batch is empty (schema carrier)
            nonempty = [p for p in parts if len(p)]
            want_raw = pd.concat(nonempty or parts[:1], ignore_index=True)
        else:
            want_raw = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
    gt, wt = raw_dtypes(got_raw), raw_dtypes(want_raw)
    if sorted(gt) == sorted(wt) and any(gt[c] != wt[c] for c in gt):
        diff = {c: (gt[c], wt[c]) for c in gt if gt[c] != wt[c]}
        print(f"FAIL {name}: dtype mismatch (spark, oracle) = {diff}"); n_fail += 1; continue
    got, want = canon(got_raw), canon(want_raw)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    except AssertionError as e:
        print(f"FAIL {name}: value mismatch\n  {str(e)[:500]}"); n_fail += 1

# queries without oracle: rows-only check
all_out = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)}
if only is not None:
    all_out &= only
for name in sorted(all_out - set(oracle)):
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
    status = "PASS" if n > 0 else "FAIL"
    print(f"{status} {name} (rows-only: {n})")
    if n > 0: n_pass += 1
    else: n_fail += 1
print(f"\n{n_pass} pass, {n_fail} fail, {n_lint} lint-fail")
sys.exit(1 if (n_fail or n_lint) else 0)
