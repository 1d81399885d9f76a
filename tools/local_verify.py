#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query output under
OUTDIR, run the matching oracle SQL in DuckDB (tables registered from SFDIR)
and compare rows/schema/values. Usage: local_verify.py [SFDIR] [OUTDIR]."""
import json, sys, math
import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")

oracle = json.load(open(f"{OUTDIR}/oracle_sql.json"))

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

ok, bad = [], []
for name, sql in sorted(oracle.items()):
    def run_once(query):
        # one execution per result: rows AND arrow types derived from the
        # same arrow table (heavy oracles like d2/e4 were executed twice)
        tbl = con.execute(query).arrow()
        cols = tbl.schema.names
        types = {n: str(t) for n, t in zip(cols, tbl.schema.types)}
        rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
        return list(cols), types, rows

    try:
        s_cols, s_types, s_rows = run_once(
            f"SELECT * FROM read_parquet('{OUTDIR}/{name}/*.parquet')")
    except Exception as e:
        bad.append((name, f"spark-result read failed: {e}"))
        continue
    try:
        d_cols, d_types, d_rows = run_once(sql)
    except Exception as e:
        bad.append((name, f"oracle SQL failed: {str(e).splitlines()[0]}"))
        continue
    sc, sr = canon(s_cols, s_rows)
    dc, dr = canon(d_cols, d_rows)
    if sc != dc:
        bad.append((name, f"schema mismatch: spark={sc} duck={dc}"))
    # The DRIVER's hash is type-width sensitive (decimal precision, int
    # width): compare arrow types too, so width bugs fail locally.
    elif s_types != d_types:
        diffs = {c: (s_types.get(c), d_types.get(c)) for c in s_types
                 if s_types.get(c) != d_types.get(c)}
        bad.append((name, f"type-width mismatch: {diffs}"))
    elif len(sr) != len(dr):
        bad.append((name, f"row count: spark={len(sr)} duck={len(dr)}"))
    elif sr != dr:
        diff = next(i for i, (a, b) in enumerate(zip(sr, dr)) if a != b)
        bad.append((name, f"values differ at sorted-row {diff}:\n  cols={sc}\n  spark={sr[diff]}\n  duck ={dr[diff]}"))
    else:
        ok.append((name, len(sr)))

print(f"== PASS {len(ok)}/{len(ok)+len(bad)}")
for n, r in ok:
    print(f"  ok   {n} ({r} rows)")
for n, msg in bad:
    print(f"  FAIL {n}: {msg}")
sys.exit(1 if bad else 0)
