#!/usr/bin/env python3
"""Dev-only oracle pre-validation (mimics the driver's t2 compare).

Usage: python3 dev/check_oracles.py <sfDir> <verifyOutDir>

Reads each query's Spark parquet output from <verifyOutDir>/<name>/ and
runs the corresponding SQL from oracle_sql.json in DuckDB over views on
<sfDir>/*.parquet, then compares: columns sorted by name, rows sorted by
all columns, values compared exactly (floats to 1e-9).
This script is NOT part of the library; it exists so oracle mismatches
are caught before the driver runs.
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # fold -0.0 and 0.0 (str-sort would split them)
        return v
    if isinstance(v, bool):
        return bool(v)
    return v

def sort_key(t):
    # Sort on non-float columns first (they are the row identity in
    # every catalog query); floats join the key only as a coarse
    # (6-dp) tiebreak so two engines straddling a 1e-9 rounding
    # boundary still align row-for-row for the epsilon compare.
    non_f = tuple((x is None, str(x)) for x in t
                  if not isinstance(x, float))
    f = tuple(round(x, 6) for x in t if isinstance(x, float))
    return (non_f, f)

def cells_equal(a, b):
    # absolute-only tolerance: every float output is pround'd (>=2dp
    # granularity), so genuine divergence is >=0.005 even at 1e9
    # magnitude — a rel_tol there would mask real mismatches that the
    # driver's exact hash compare fails
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=0.0, abs_tol=1e-9)
    return a == b

def rows_equal(a, b):
    return len(a) == len(b) and all(
        cells_equal(x, y) for x, y in zip(a, b))

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=sort_key)
    return [cols[i] for i in order], out

def main():
    sf_dir, vout = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{vout}/oracle_sql.json"))
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    failures = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        files = glob.glob(f"{vout}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output")
            failures += 1
            continue
        try:
            got_cols = [d[0] for d in con.execute(
                f"SELECT * FROM '{vout}/{name}/*.parquet' LIMIT 0"
            ).description]
            got = con.execute(
                f"SELECT * FROM '{vout}/{name}/*.parquet'").fetchall()
            want_rel = con.execute(oracle[name])
            want_cols = [d[0] for d in want_rel.description]
            want = want_rel.fetchall()
        except Exception as e:
            print(f"{name}: ERROR {str(e)[:200]}")
            failures += 1
            continue
        gc, g = norm_rows(got_cols, got)
        wc, w = norm_rows(want_cols, want)
        if gc != wc:
            print(f"{name}: COLS spark={gc} oracle={wc}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"{name}: ROWCOUNT spark={len(g)} oracle={len(w)}")
            failures += 1
            continue
        bad = [(a, b) for a, b in zip(g, w) if not rows_equal(a, b)]
        if bad:
            print(f"{name}: {len(bad)} MISMATCHED rows of {len(g)}; "
                  f"first: spark={bad[0][0]} oracle={bad[0][1]} cols={gc}")
            failures += 1
        else:
            print(f"{name}: OK ({len(g)} rows)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
