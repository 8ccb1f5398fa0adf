#!/bin/bash
# Dev loop: run Verify at sf0.01 then compare against the DuckDB oracle,
# then prove the compare itself is live (oracle-side mutations).
set -e
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
rm -rf "$OUT"
cd /root/repo
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -Ev '^\[info\]' | grep -v 'WARN' | head -30
python3 scripts/oracle_check.py "$SF" "$OUT"
(cd scripts && python3 oracle_mutation_check.py "$SF" "$OUT") | tail -3
