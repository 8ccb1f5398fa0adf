#!/usr/bin/env python3
"""Determinism-under-parallelism gate: compare two graft.Verify output
dirs (e.g. SPARK_GRAFT_CPUS=4 vs =32) query by query. A query passes
iff its sorted row matrix is byte-identical at %.17g double precision
— the README's bit-identity claim, checked rather than asserted.

Usage: determinism_check.py OUT_DIR_A OUT_DIR_B
"""
import sys
import glob
import os
import hashlib

import pyarrow.parquet as pq


def canon(v):
    # %.17g round-trips doubles uniquely (same rule as oracle_check.py,
    # so a determinism PASS here speaks for the driver's gate too).
    if isinstance(v, float):
        return "%.17g" % v
    return str(v)


def digest(qdir):
    tables = [pq.read_table(f) for f in sorted(glob.glob(f"{qdir}/*.parquet"))]
    if not tables:
        return None
    rows = []
    for t in tables:
        cols = sorted(t.column_names)
        data = [t.column(c).to_pylist() for c in cols]
        rows.extend(
            "\x1f".join(canon(col[i]) for col in data)
            for i in range(t.num_rows))
    rows.sort()
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sorted(
        d for d in os.listdir(a)
        if os.path.isdir(os.path.join(a, d)))
    mismatches, missing = [], []
    for n in names:
        if not os.path.isdir(os.path.join(b, n)):
            missing.append(n)
            continue
        da, db = digest(os.path.join(a, n)), digest(os.path.join(b, n))
        status = "PASS" if da == db else "MISMATCH"
        if da != db:
            mismatches.append(n)
        print(f"{status} {n}")
    print(f"== {len(names) - len(mismatches) - len(missing)} identical, "
          f"{len(mismatches)} mismatched, {len(missing)} missing ==")
    if mismatches or missing:
        sys.exit(1)


if __name__ == "__main__":
    main()
