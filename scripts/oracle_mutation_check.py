#!/usr/bin/env python3
"""Oracle-SIDE mutation harness (r13 verdict item #7; dev tool only).

MutationSpec perturbs the ENGINE and asserts the canonical result
moves; the symmetric failure — a comparator that ignores what it
should compare (hash over the wrong column set, a projection that
drops the mutated column, a row-count check that never fires) — was
untested. For ONE query per family this script perturbs the ORACLE SQL
and asserts the driver-style compare FAILS against the unmodified
engine parquet, with the RIGHT gate firing:

  widen  — `SELECT *, 1 AS graft_extra FROM (sql)`       -> column gate
  rows   — `SELECT * FROM (sql) LIMIT n-1`               -> row gate
  hash   — `SELECT * REPLACE (numcol + 1 AS numcol) ...` -> hash gate
           (first numeric output column, discovered via DESCRIBE)

A mutation that still PASSES is a dead comparator: the build fails.

Usage: python3 scripts/oracle_mutation_check.py <sf_dir> <verify_out_dir>
(run after graft.Verify has populated <verify_out_dir>; check.sh does.)
"""
import json
import re
import sys

import duckdb
import pyarrow.parquet as pq

from oracle_check import TABLES, table_fingerprint

NUMERIC = ("BIGINT", "INTEGER", "DOUBLE", "FLOAT", "SMALLINT", "TINYINT")


def compare(got_fp, want_df):
    wc, wn, wh = table_fingerprint(want_df)
    gc, gn, gh = got_fp
    if gc != wc:
        return "cols"
    if gn != wn:
        return "rows"
    if gh != wh:
        return "hash"
    return "match"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # One representative per family: the first query (sorted) whose
    # engine parquet exists.
    reps = {}
    for name in sorted(oracle):
        fam = re.match(r"([a-z]+)", name).group(1)
        if fam not in reps:
            try:
                pq.read_table(f"{out_dir}/{name}")
                reps[fam] = name
            except Exception:
                continue
    n_ok = n_dead = 0
    for fam, name in sorted(reps.items()):
        sql = oracle[name]
        got_fp = table_fingerprint(
            pq.read_table(f"{out_dir}/{name}").to_pandas(date_as_object=False))
        base = con.sql(sql).df()
        if compare(got_fp, base) != "match":
            print(f"SKIP {fam}/{name}: base compare is not green here")
            continue
        n = len(base)
        if n == 0:
            # A 0-row base makes the rows (LIMIT 0 = no-op) and hash
            # mutations vacuous matches — not dead comparators. Try the
            # next query in the family; if none has rows, widen alone
            # still proves the column gate.
            alt = next((q for q in sorted(oracle)
                        if re.match(r"([a-z]+)", q).group(1) == fam
                        and q != name
                        and len(con.sql(oracle[q]).df()) > 0), None)
            if alt is not None:
                # The alt was chosen by its ORACLE having rows; its
                # engine parquet may still be absent (partial Verify
                # output — the rep loop tolerates exactly this). SKIP,
                # don't die: one family's quirk must not kill the gate.
                try:
                    alt_fp = table_fingerprint(
                        pq.read_table(f"{out_dir}/{alt}")
                        .to_pandas(date_as_object=False))
                except Exception as e:
                    print(f"SKIP {fam}/{alt}: engine output unreadable "
                          f"({type(e).__name__})")
                    continue
                name, sql, got_fp = alt, oracle[alt], alt_fp
                base = con.sql(sql).df()
                if compare(got_fp, base) != "match":
                    print(f"SKIP {fam}/{name}: base compare is not green here")
                    continue
                n = len(base)
        desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        numcols = [r[0] for r in desc if r[1] in NUMERIC]
        muts = [
            ("widen", f"SELECT *, 1 AS graft_extra FROM ({sql})", "cols"),
        ]
        if n > 0:
            muts.append(
                ("rows", f"SELECT * FROM ({sql}) LIMIT {n - 1}", "rows"))
        if numcols and n > 0:
            c = numcols[0]
            muts.append(("hash",
                         f'SELECT * REPLACE ("{c}" + 1 AS "{c}") FROM ({sql})',
                         "hash"))
        for label, msql, expect in muts:
            try:
                verdict = compare(got_fp, con.sql(msql).df())
            except Exception as e:
                print(f"ERROR {fam}/{name} [{label}]: {type(e).__name__}: {e}")
                n_dead += 1
                continue
            if verdict == "match":
                print(f"DEAD COMPARE {fam}/{name} [{label}]: mutated oracle "
                      f"still matches the engine result")
                n_dead += 1
            elif verdict != expect:
                # A different gate firing first is still a live compare
                # (e.g. the hash mutation on an all-null column keeps
                # the hash equal but can't happen — numeric + 1 always
                # moves NULL-free values; NULLs stay NULL, so if every
                # value in the column is NULL the hash gate cannot see
                # the mutation). Treat wrong-gate as dead to keep the
                # contract sharp.
                print(f"DEAD COMPARE {fam}/{name} [{label}]: expected the "
                      f"{expect} gate, got {verdict}")
                n_dead += 1
            else:
                print(f"LIVE {fam}/{name} [{label}] -> {verdict} gate fired")
                n_ok += 1
    print(f"== {n_ok} live, {n_dead} dead ==")
    if n_ok == 0:
        # An all-SKIP run exercised zero gates — that must not read as
        # a passing liveness check.
        print("DEAD HARNESS: no mutation gate was exercised "
              "(every family skipped)")
        sys.exit(1)
    sys.exit(1 if n_dead else 0)


if __name__ == "__main__":
    main()
