#!/usr/bin/env python3
"""Dev-only DuckDB timing pass over the catalog's oracle SQL.

Usage: python3 dev/time_oracles.py <sfDir> <verifyOutDir> [rounds]

Times each oracle query from <verifyOutDir>/oracle_sql.json in DuckDB
over views on <sfDir>/*.parquet (median of `rounds`, default 3) and
prints one line per query plus a total — the comparison column for
BASELINE.md's Spark-vs-DuckDB table. Not part of the library.
"""
import sys, json, time, statistics
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, vout = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    oracle = json.load(open(f"{vout}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    names = sorted(oracle)
    samples = {n: [] for n in names}
    for r in range(rounds):
        for n in names:  # interleaved, like graft.Bench
            t0 = time.time()
            con.execute(oracle[n]).fetchall()
            samples[n].append(time.time() - t0)
    med = {n: statistics.median(samples[n]) for n in names}
    for n in names:
        print(f"{n}: {med[n]:.4f}")
    print(f"TOTAL: {sum(med.values()):.4f} over {len(names)} queries "
          f"(median of {rounds})")

if __name__ == "__main__":
    main()
