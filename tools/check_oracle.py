#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name> parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the sf_dir
tables, and compares: row count, column names (sorted), and values
(rows sorted, columns sorted by name). Exact compare; floats compared
exactly first and with 1e-9 relative tolerance as a diagnostic.
"""
import json, math, os, sys
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem partsupp events documents embeddings".split()

def norm(v):
    import numpy as np
    if isinstance(v, np.ndarray):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, np.generic):
        return norm(v.item())
    if isinstance(v, float):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def eq(a, b, tol):
    if isinstance(a, float) and isinstance(b, float):
        if a == b or (math.isnan(a) and math.isnan(b)):
            return True
        return tol > 0 and abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y, tol) for x, y in zip(a, b))
    return a == b

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # a Spark-written table is a directory
            p = f"{p}/*.parquet"
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_exact = n_tol = n_fail = n_rowsonly = 0
    for name in names:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        if name not in oracle:
            status = f"rows-only ({len(got)} rows)"
            n_rowsonly += 1
            if len(got) == 0:
                status = "FAIL rows-only: 0 rows"; n_fail += 1; n_rowsonly -= 1
            print(f"{name:24s} {status}")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:24s} FAIL oracle sql error: {e}")
            n_fail += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"{name:24s} FAIL schema: spark={gcols} oracle={ecols}")
            n_fail += 1
            continue
        # The driver's comparator sorts raw pandas values and hashes
        # serialized rows: array cells crash it ("unhashable ndarray") and
        # dtype drift (e.g. DuckDB HUGEINT vs Spark int64) hash-mismatches
        # even when values are numerically equal. Reject both here.
        import numpy as np
        bad = [c for c in gcols if len(got) and any(
            isinstance(v, (np.ndarray, list, tuple)) for v in got[c].head(5))]
        if bad:
            print(f"{name:24s} FAIL array-typed output columns (driver-unhashable): {bad}")
            n_fail += 1
            continue
        # Driver behavior (calibrated on CORRECTNESS_r01): int-width drift
        # (int32 vs int64) hashes equal, but int-vs-float (DuckDB HUGEINT ->
        # float64, ceil(DOUBLE) -> float64 vs Spark LONG) hash-mismatches.
        # Compare dtype KIND, not width.
        kind = lambda d: {"u": "i"}.get(d.kind, d.kind)
        dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in gcols
              if kind(got[c].dtype) != kind(exp[c].dtype)]
        if dt:
            print(f"{name:24s} FAIL dtype-kind drift (driver hash-mismatch): {dt}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"{name:24s} FAIL rows: spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        # The driver reads the Spark parquet through pyarrow->pandas, which
        # coerces timestamps to datetime64[ns]; values outside the int64-ns
        # range (1677-09-21 .. 2262-04-11) silently WRAP there while the
        # DuckDB-read oracle stays datetime64[us] — hash-mismatch with both
        # engines holding identical values (bit us in r8: 9999-12-31 SCD2
        # sentinel). Reject out-of-ns-range timestamps up front.
        ts_lo, ts_hi = pd.Timestamp.min, pd.Timestamp.max
        oob = [c for c in gcols if got[c].dtype.kind == "M" and len(got) and
               ((got[c].dropna() < ts_lo.to_datetime64()) |
                (got[c].dropna() > ts_hi.to_datetime64())).any()]
        if oob:
            print(f"{name:24s} FAIL timestamp outside pandas-ns range "
                  f"(driver pyarrow read wraps it): {oob}")
            n_fail += 1
            continue
        grows = sorted([tuple(norm(v) for v in r) for r in got[gcols].itertuples(index=False)], key=repr)
        erows = sorted([tuple(norm(v) for v in r) for r in exp[ecols].itertuples(index=False)], key=repr)
        exact = all(eq(a, b, 0) for a, b in zip(grows, erows))
        if exact:
            print(f"{name:24s} OK exact ({len(got)} rows)")
            n_exact += 1
        elif all(eq(a, b, 1e-9) for a, b in zip(grows, erows)):
            diffs = [(a, b) for a, b in zip(grows, erows) if not eq(a, b, 0)][:2]
            print(f"{name:24s} WARN tol-only match; first diffs: {diffs}")
            n_tol += 1
        else:
            diffs = [(a, b) for a, b in zip(grows, erows) if not eq(a, b, 1e-9)][:3]
            print(f"{name:24s} FAIL values; first diffs: {diffs}")
            n_fail += 1
    print(f"\nexact={n_exact} tol={n_tol} rows_only={n_rowsonly} fail={n_fail}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
