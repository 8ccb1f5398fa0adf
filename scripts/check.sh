#!/bin/bash
# Dev loop: run Verify at sf0.01 then compare against the DuckDB oracle,
# then prove the compare itself is live (oracle-side mutations), then
# guard the BENCH_BEST ledger against clobbers.
#
# pipefail (r14 ADVICE): without it the mutation gate's exit(1) was
# swallowed by a trailing `tail` and the liveness check was silently
# advisory. With it, `sbt | head` would die of SIGPIPE instead — so
# sbt logs to a file and the truncation greps the file, and the
# mutation check runs UNPIPED (its output is already short).
set -e
set -o pipefail
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
rm -rf "$OUT"
cd /root/repo
LOG=$(mktemp /tmp/graft_check_XXXX.log)
trap 'rm -f "$LOG"' EXIT
if ! sbt -batch "runMain graft.Verify $SF $OUT" >"$LOG" 2>&1; then
  echo "Verify FAILED; last 40 log lines:"
  tail -40 "$LOG"
  exit 1
fi
grep -Ev '^\[info\]' "$LOG" | grep -v 'WARN' | head -30 || true
python3 scripts/oracle_check.py "$SF" "$OUT"
(cd scripts && python3 oracle_mutation_check.py "$SF" "$OUT")
python3 scripts/bench_best_guard.py
python3 scripts/scalebench_guard.py
# Adjudicator liveness (r15 verdict #8): prove the regression layer
# can still flag + re-measure + verdict on every surface class (plan
# warm / eager cold / drain / wall) against a synthetic 1 ms ledger,
# plus (r17) that a forced degraded round-trip regime reads
# 'unresolved' on a plan flag and that the bench_summary stdout tail
# parses. The r15 parseBestKnown regex find showed a vacuous flag
# pass looks exactly like a healthy quiet round — this fails check.sh
# instead. ~2.5 min (two subset Bench runs). Skippable for tight
# subset loops with SPARK_GRAFT_SKIP_ADJSMOKE=1.
if [ "${SPARK_GRAFT_SKIP_ADJSMOKE:-0}" != "1" ]; then
  python3 scripts/adjudicator_smoke.py
fi
