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

    # Warm-plan noise band: when both sides carry queries_warm (the
    # plan-construction-free re-run graft.Bench emits), summarize the
    # spread on queries present in both — the low-noise signal that
    # separates real plan deltas from per-query session jitter.
    warm_new = bench.get("queries_warm") or {}
    warm_ref = rounds[baseline_round].get("queries_warm") or {}
    deltas = [
        (warm_new[n] - warm_ref[n]) / warm_ref[n]
        for n in warm_new
        if n in warm_ref and warm_ref[n] > 0 and warm_new[n] > 0
    ]
    if deltas:
        inside = sum(1 for d in deltas if abs(d) <= 0.05)
        mean = sum(deltas) / len(deltas)
        p95 = sorted(abs(d) for d in deltas)[int(0.95 * (len(deltas) - 1))]
        print(f"\nwarm noise band: {inside}/{len(deltas)} queries within ±5% "
              f"(mean {mean*100:+.1f}%, |delta| p95 {p95*100:.1f}%)")
        if "overhead" in bench:
            print(f"per-query session floor (1-row scan): {bench['overhead']*1000:.0f} ms")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
