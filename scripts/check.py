#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify over a
scale dir, then execute each oracle_sql.json entry in DuckDB against the same
parquet tables and compare (schema, row count, values).

Usage: python3 scripts/check.py [sfDir] [outDir] [--no-verify] [--ordered] [names...]

--ordered compares rows in emitted order instead of sorting both sides
first, validating the every-query-ends-in-a-total-order convention (sound
because Verify coalesces each result to a single parquet file).
"""
import json, math, subprocess, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/graft_verify"
    only = set(args[2:])
    if "--no-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
            cwd="/root/repo", capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if "[verify]" in line or "error" in line.lower():
                print(line)
        for line in r.stderr.splitlines():
            if "[verify]" in line:
                print(line)
        if r.returncode != 0:
            print("VERIFY FAILED"); print(r.stdout[-3000:]); print(r.stderr[-3000:]); sys.exit(1)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); bad += 1; continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e).splitlines()[0]}"); bad += 1; continue
        res = compare(name, spark_df, duck_df,
                      ordered="--ordered" in sys.argv)
        if res is None:
            print(f"ok   {name} ({len(spark_df)} rows)"); ok += 1
        else:
            print(f"FAIL {name}: {res}"); bad += 1
    print(f"\n{ok} ok, {bad} failed")
    sys.exit(1 if bad else 0)

def compare(name, a, b, ordered=False):
    acols, bcols = sorted(a.columns), sorted(b.columns)
    if acols != bcols:
        return f"columns differ: spark={acols} duck={bcols}"
    if len(a) != len(b):
        return f"row count differs: spark={len(a)} duck={len(b)}"
    # Driver parity: the driver hashes pandas-materialized values, so a DuckDB
    # HUGEINT (object dtype) vs Spark BIGINT (int64) mismatches even when
    # numerically equal. Width differences within a kind (int32 vs int64) DID
    # hash-match in round 1, so compare dtype *kind* only.
    for c in acols:
        ak, bk = a[c].dtype.kind, b[c].dtype.kind
        if ak != bk:
            return (f"col {c} dtype kind differs: spark={a[c].dtype} "
                    f"duck={b[c].dtype} (driver hash would mismatch)")
    if ordered:
        a = a[acols].reset_index(drop=True)
        b = b[bcols].reset_index(drop=True)
    else:
        a = a[acols].sort_values(acols).reset_index(drop=True)
        b = b[bcols].sort_values(bcols).reset_index(drop=True)
    for c in acols:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not cell_eq(x, y):
                return (f"col {c} row {i}: spark={x!r} duck={y!r} "
                        f"(types {type(x).__name__}/{type(y).__name__})")
    return None

def cell_eq(x, y):
    if x is None and y is None:
        return True
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y):
            return True
        return x == y  # driver hash-compares: demand bit-exactness
    try:
        import numpy as np
        if isinstance(x, np.ndarray) or isinstance(y, np.ndarray):
            return list(x) == list(y)
        if (isinstance(x, float) or isinstance(y, float)) and (
                isinstance(x, (int, float)) and isinstance(y, (int, float))):
            return float(x) == float(y)
    except Exception:
        pass
    if x != y and str(x) == str(y):
        return True
    return x == y

if __name__ == "__main__":
    main()
