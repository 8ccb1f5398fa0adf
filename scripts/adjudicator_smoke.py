#!/usr/bin/env python3
"""Adjudicator LIVENESS smoke (r15 verdict item #8): prove, once per
check.sh run, that the bench's regression layer can still FIRE — flag,
re-measure, verdict — on every surface class. The r15 regex find
(parseBestKnown silently parsing ZERO ledger entries for a whole
round) teaches that guard layers rot without a liveness pin: a vacuous
flag pass looks exactly like a healthy quiet round.

Mechanism: run Bench on a 3-query subset (one plan query, one eager
query, one sr drain) against a SYNTHETIC best-known ledger of 1 ms
entries injected via SPARK_GRAFT_BENCH_BEST, with
SPARK_GRAFT_BENCH_ASSUME_CLEAN=1 so a contended host cannot make the
smoke vacuous (the run records pressure_clean_forced=true and
merge_ledgers refuses to fold it). Every surface must flag (nothing
real runs in 1.5 ms + 200 ms jitter floor) and every flag must ship a
confirmed/unresolved verdict with the right kind and gate fields —
ambient is impossible by construction, and its appearance would itself
be a broken-threshold signal.

Run from the repo root (check.sh does). ~90 s: one subset Bench run.
"""
import json
import os
import subprocess
import sys
import tempfile

PLAN = "b21_vpin_rolling"     # warm ~0.3-1.0 s at sf0.1: safely above the flag floor
EAGER = "v8_compaction"       # cold ~1.7 s: the eager-cold surface
DRAIN = "sr18_stream_startoffsets_replay"  # cheapest drain (~1.2 s)


def main():
    synthetic = {
        PLAN: 0.001,
        f"cold:{EAGER}": 0.001,
        DRAIN: 0.001,
        "wall:sr_concurrent": 0.001,
    }
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(synthetic, f)
        best_path = f.name
    out_path = tempfile.mktemp(suffix=".json", prefix="graft_adjsmoke_")
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_ONLY=f"{PLAN},{EAGER},{DRAIN}",
               SPARK_GRAFT_BENCH_BEST=best_path,
               SPARK_GRAFT_BENCH_OUT=out_path,
               SPARK_GRAFT_BENCH_REPEATS="2",
               SPARK_GRAFT_BOARD_CONCURRENCY="0",
               SPARK_GRAFT_BENCH_ASSUME_CLEAN="1")
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       env=env, capture_output=True, text=True)
    if r.returncode != 0 or not os.path.exists(out_path):
        print(r.stdout[-3000:])
        print(r.stderr[-2000:])
        sys.exit("adjudicator_smoke: Bench subset run FAILED")
    with open(out_path) as f:
        run = json.load(f)
    os.unlink(best_path)
    os.unlink(out_path)

    bad = []
    regs = run.get("regressions", {})
    verdicts = {}
    for bucket in ("regressions_confirmed", "regressions_ambient",
                   "regressions_unresolved"):
        for k, v in run.get(bucket, {}).items():
            verdicts[k] = (bucket, v)

    def expect_flag(key, kind, stat_key):
        e = regs.get(key)
        if e is None:
            bad.append(f"{key}: flag DID NOT FIRE against a 1 ms best "
                       "(the flag pass is vacuous)")
            return
        if e.get("kind") != kind:
            bad.append(f"{key}: kind {e.get('kind')!r}, expected {kind!r}")
        if stat_key not in e:
            bad.append(f"{key}: flag entry missing its '{stat_key}' statistic")
        v = verdicts.get(key)
        if v is None:
            bad.append(f"{key}: flagged but NO verdict shipped")
            return
        bucket, entry = v
        if bucket == "regressions_ambient":
            bad.append(f"{key}: verdict 'ambient' on a 1 ms best — the "
                       "threshold itself is broken")
        if "remeasure" not in entry:
            bad.append(f"{key}: verdict entry missing its re-measure")
        if kind == "drain" and "re_fsync_ms" not in entry:
            bad.append(f"{key}: drain verdict missing the fsync gate reading")

    expect_flag(PLAN, "plan", "warm")
    expect_flag(f"cold:{EAGER}", "eager", "measured")
    expect_flag(DRAIN, "drain", "measured")

    wall = run.get("walls", {}).get("wall:sr_concurrent", {})
    if not wall.get("flagged", False):
        bad.append("wall:sr_concurrent: did not flag against a 1 ms best")
    elif wall.get("verdict") not in ("confirmed", "unresolved"):
        bad.append(f"wall:sr_concurrent: verdict {wall.get('verdict')!r} "
                   "(ambient impossible on a 1 ms best)")

    if not run.get("pressure_clean_forced", False):
        bad.append("pressure_clean_forced missing/false — the merge "
                   "refusal seal is not on this run")

    if bad:
        print("ADJUDICATOR SMOKE FAILED — the regression layer is not live:")
        for b in bad:
            print("  " + b)
        sys.exit(1)
    print(f"adjudicator_smoke: OK — plan/eager/drain flags fired and "
          f"adjudicated ({', '.join(sorted(regs))}); wall flagged with "
          f"verdict '{wall.get('verdict')}'")


if __name__ == "__main__":
    main()
