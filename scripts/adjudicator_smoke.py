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

Second case (r17, closing the r16 verdict #1 gap): a PLAN-only run
under SPARK_GRAFT_BENCH_FORCE_RT=999 — a forced degraded-scheduler
reading — must adjudicate its flag to 'unresolved', never 'confirmed':
the r16 driver artifact minted a false plan "confirmed" in a real
176 ms/job regime the drain-only rt gate ignored. The forced run
records roundtrip_forced=true and merge_ledgers refuses to fold it.

Run from the repo root (check.sh does). ~2.5 min: two subset Bench runs.
"""
import json
import os
import subprocess
import sys
import tempfile

PLAN = "b21_vpin_rolling"     # warm ~0.3-1.0 s at sf0.1: safely above the flag floor
EAGER = "v8_compaction"       # cold ~1.7 s: the eager-cold surface
DRAIN = "sr18_stream_startoffsets_replay"  # cheapest drain (~1.2 s)


def run_bench(synthetic, only, extra_env):
    """One subset Bench run against a synthetic ledger; returns
    (parsed run json, full stdout). Temp files are cleaned up on every
    path, including Bench failures (r16 ADVICE: mktemp was race-prone
    and failures leaked both files)."""
    best_fd, best_path = tempfile.mkstemp(suffix=".json",
                                          prefix="graft_adjsmoke_best_")
    out_fd, out_path = tempfile.mkstemp(suffix=".json",
                                        prefix="graft_adjsmoke_out_")
    os.close(out_fd)
    os.unlink(out_path)  # Bench must create it; a pre-existing empty
    #                      file would mask a Bench that wrote nothing
    try:
        with os.fdopen(best_fd, "w") as f:
            json.dump(synthetic, f)
        env = dict(os.environ,
                   SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
                   SPARK_GRAFT_ONLY=only,
                   SPARK_GRAFT_BENCH_BEST=best_path,
                   SPARK_GRAFT_BENCH_OUT=out_path,
                   SPARK_GRAFT_BENCH_REPEATS="2",
                   SPARK_GRAFT_BOARD_CONCURRENCY="0",
                   SPARK_GRAFT_BENCH_ASSUME_CLEAN="1",
                   **extra_env)
        # The smoke's probe readings are synthetic-run noise — keep
        # them out of the rolling cross-run regime log.
        env["SPARK_GRAFT_RT_LOG"] = os.devnull
        r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                           env=env, capture_output=True, text=True)
        if r.returncode != 0 or not os.path.exists(out_path):
            print(r.stdout[-3000:])
            print(r.stderr[-2000:])
            sys.exit("adjudicator_smoke: Bench subset run FAILED")
        with open(out_path) as f:
            return json.load(f), r.stdout
    finally:
        for p in (best_path, out_path):
            try:
                os.unlink(p)
            except FileNotFoundError:
                pass


def main():
    bad = []

    # ---- Case 1: every surface class flags and adjudicates ----
    run, stdout = run_bench(
        {PLAN: 0.001, f"cold:{EAGER}": 0.001, DRAIN: 0.001,
         "wall:sr_concurrent": 0.001},
        f"{PLAN},{EAGER},{DRAIN}", {})

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
        # Every kind's verdict carries its rt gate reading since r17.
        if "re_roundtrip_ms" not in entry:
            bad.append(f"{key}: verdict missing the round-trip gate reading")
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

    # The compact summary tail (r16 verdict #3): the LAST line Bench
    # prints must be a standalone <256-byte JSON object any tail
    # capture can parse. Under `sbt runMain` the process appends its
    # own "[success]" banner after the program's output, so scan
    # backwards for the last parseable JSON line instead of demanding
    # literal last position.
    tail = ""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("[info] "):  # sbt prefixes program stdout
            line = line[len("[info] "):]
        if line.startswith("{"):
            tail = line
            break
    try:
        parsed_tail = json.loads(tail)
        if "bench_summary" not in parsed_tail:
            bad.append("the last JSON stdout line is not a bench_summary — "
                       "the summary must be printed AFTER the full line")
        elif len(tail.encode()) >= 256:
            bad.append(f"bench_summary line is {len(tail.encode())} bytes "
                       "(must stay <256 so tail captures keep it whole)")
    except json.JSONDecodeError:
        bad.append(f"no parseable JSON summary line in stdout: {tail[:120]!r}")

    # ---- Case 2: a degraded round-trip regime cannot mint 'confirmed'
    # on a PLAN flag (r16 verdict #1 — the surface the drain-only gate
    # missed, demonstrated by the driver's own artifact) ----
    run2, _ = run_bench({PLAN: 0.001}, PLAN,
                        {"SPARK_GRAFT_BENCH_FORCE_RT": "999"})
    if not run2.get("roundtrip_forced", False):
        bad.append("forced-rt run: roundtrip_forced missing/false — the "
                   "merge refusal seal is not on it")
    if PLAN not in run2.get("regressions", {}):
        bad.append("forced-rt run: plan flag did not fire")
    elif PLAN not in run2.get("regressions_unresolved", {}):
        where = [b for b in ("regressions_confirmed", "regressions_ambient")
                 if PLAN in run2.get(b, {})]
        bad.append(f"forced-rt run: plan verdict landed in {where} — a "
                   "999 ms/job regime must read 'unresolved', never "
                   "'confirmed' (the r16 x34 false-confirm shape)")

    if bad:
        print("ADJUDICATOR SMOKE FAILED — the regression layer is not live:")
        for b in bad:
            print("  " + b)
        sys.exit(1)
    print(f"adjudicator_smoke: OK — plan/eager/drain flags fired and "
          f"adjudicated ({', '.join(sorted(regs))}); wall flagged with "
          f"verdict '{wall.get('verdict')}'; degraded-rt plan flag read "
          "'unresolved'; bench_summary tail parsed")


if __name__ == "__main__":
    main()
