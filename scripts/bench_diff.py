#!/usr/bin/env python3
"""Diff a graft.Bench JSON line against BENCH_BASELINE.json.

Usage: python3 scripts/bench_diff.py <bench_output_file> [baseline_round]

The bench output file may contain sbt noise; the first {"metric"...}
JSON object found is used. Prints per-query deltas sorted by
regression size and flags queries >25% slower than the baseline.
"""
import json
import re
import sys


def load_bench(path):
    text = open(path).read()
    m = re.search(r'\{"metric".*\}', text)
    if not m:
        sys.exit(f"no bench JSON line found in {path}")
    return json.loads(m.group(0))


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    bench = load_bench(sys.argv[1])
    baseline_round = sys.argv[2] if len(sys.argv) > 2 else None
    base = json.load(open("BENCH_BASELINE.json"))
    rounds = base["rounds"]
    if baseline_round is None:
        baseline_round = sorted(rounds)[-1]
    ref = rounds[baseline_round]["queries"]

    rows = []
    for name, sec in bench["queries"].items():
        old = ref.get(name)
        if old is None or old <= 0 or sec <= 0:
            rows.append((0.0, name, old, sec, "new" if old is None else "n/a"))
        else:
            rows.append(((sec - old) / old, name, old, sec, ""))
    rows.sort(reverse=True)

    regressions = 0
    print(f"vs baseline '{baseline_round}'  (total {bench['value']:.1f}s)")
    for delta, name, old, sec, tag in rows:
        flag = ""
        if tag == "":
            if delta > 0.25:
                flag = "  <-- REGRESSION"
                regressions += 1
            print(f"{name:28s} {old:6.2f} -> {sec:6.2f}  {delta*100:+6.1f}%{flag}")
        else:
            print(f"{name:28s} {'--':>6} -> {sec:6.2f}  [{tag}]")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
