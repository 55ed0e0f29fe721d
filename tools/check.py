#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: DuckDB-compare each
Verify output parquet against its oracle SQL. Driver-side tool only (not
part of the shipped library)."""
import sys, os, json, glob
import duckdb, pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

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

n_pass = n_fail = 0
for name in sorted(oracle):
    pq_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{pq_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        got = canon(con.execute(f"SELECT * FROM read_parquet('{pq_dir}/*.parquet')").df())
        want = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: {e}"); n_fail += 1; continue
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
for name in sorted(all_out - set(oracle)):
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchone()[0]
    status = "PASS" if n > 0 else "FAIL"
    print(f"{status} {name} (rows-only: {n})")
    if n > 0: n_pass += 1
    else: n_fail += 1
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
