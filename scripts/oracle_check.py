#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
shipped library is pure Scala/Spark).

Usage: python3 scripts/oracle_check.py <sf_dir> <verify_out_dir>

Reads each <verify_out_dir>/<name> parquet produced by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
source parquet tables, and compares: row count, column names (sorted),
and a hash of the sorted value matrix.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # %.17g round-trips doubles uniquely: the driver's gate is
        # bit-exact, and %.9g once green-lit a 1-ulp miss (b8, r4)
        # that the driver then rejected.
        return f"{v:.17g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_fingerprint(df):
    # pandas DataFrame -> order-insensitive fingerprint
    cols = sorted(df.columns)
    rows = ["|".join(canon(v) for v in rec)
            for rec in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    import hashlib
    return cols, len(rows), hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
            gc, gn, gh = table_fingerprint(got)
            wc, wn, wh = table_fingerprint(want)
            if gc != wc:
                print(f"FAIL {name}: columns {gc} != {wc}")
                n_fail += 1
            elif gn != wn:
                print(f"FAIL {name}: rows {gn} != {wn}")
                n_fail += 1
            elif gh != wh:
                print(f"FAIL {name}: hash mismatch ({gn} rows)")
                # show a diff sample
                merged = got.merge(want, how="outer", indicator=True,
                                   on=None)
                print(merged[merged._merge != "both"].head(6))
                n_fail += 1
            else:
                print(f"PASS {name} ({gn} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
