#!/usr/bin/env python3
"""BENCH_BEST regression guard (r14 verdict item #6, wired into
check.sh): the working-tree BENCH_BEST.json may only ever IMPROVE on
the committed one — any raised value or dropped key means a ledger
clobber (a subset run overwrote the full ledger, or a hand edit
regressed an entry), and the whole adjudication layer would silently
compare against garbage from then on.

Exit 1 listing every violation; exit 0 when the working tree is a
superset with elementwise values <= HEAD's. An intentional re-seed
(fixture reshape) goes through `merge_ledgers.py bench --allow` and
must be committed in the same change that justifies it — this guard
compares tree vs HEAD, so once committed the new value IS the
baseline.
"""
import json
import subprocess
import sys


def main():
    out = subprocess.run(["git", "show", "HEAD:BENCH_BEST.json"],
                         capture_output=True, text=True)
    if out.returncode != 0:
        print("bench_best_guard: no committed BENCH_BEST.json; skipping")
        return
    head = json.loads(out.stdout)
    with open("BENCH_BEST.json") as f:
        tree = json.load(f)
    # An intentional reseed (merge_ledgers.py bench --allow) records
    # BOTH endpoints in BENCH_BEST_RESEED.json ({"from": HEAD value at
    # reseed time, "to": new value}); a raise is allowed only while
    # HEAD still equals "from" AND the tree equals "to" — once the
    # reseed is committed the entry is inert, so a stale sidecar can
    # never whitelist clobbering the key back to its old reseeded
    # value after the ledger has improved past it (r15 ADVICE).
    try:
        with open("BENCH_BEST_RESEED.json") as f:
            reseed = json.load(f)
    except FileNotFoundError:
        reseed = {}
    bad = []
    for k in sorted(head):
        if k not in tree:
            bad.append(f"DROPPED {k} (HEAD {head[k]})")
        elif tree[k] > head[k] + 1e-9:
            e = reseed.get(k)
            if (isinstance(e, dict) and e.get("from") == head[k]
                    and e.get("to") == tree[k]):
                print(f"bench_best_guard: RESEED {k}: {head[k]} -> {tree[k]} "
                      "(allowed via BENCH_BEST_RESEED.json)")
            else:
                bad.append(f"RAISED  {k}: {head[k]} -> {tree[k]}")
    if bad:
        print("BENCH_BEST regressed vs HEAD (ledger clobber?):")
        for b in bad:
            print("  " + b)
        print("If this is an intentional re-seed, commit it via "
              "merge_ledgers.py bench --allow with its justification.")
        sys.exit(1)
    n_new = len(set(tree) - set(head))
    print(f"bench_best_guard: OK ({len(tree)} entries, {n_new} new vs HEAD)")


if __name__ == "__main__":
    main()
