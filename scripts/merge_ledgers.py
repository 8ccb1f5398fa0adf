#!/usr/bin/env python3
"""Ledger-merge automation (r14 verdict item #6).

BENCH_BEST.json and SCALEBENCH_LOCAL.json are the ledgers the whole
bench-adjudication layer keys off; both were maintained by MANUAL
rules in BENCHNOTES/memory (elementwise-min over pressure-clean runs
only; subset SCALEBENCH runs merged over the git-HEAD base) — one
slip clobbers a ledger and every later regression verdict silently
compares against garbage. This script IS those rules:

  merge_ledgers.py bench <run.json> [--allow name,name]
      Verify <run.json> is pressure-clean (refuse otherwise), then
      fold it into BENCH_BEST.json:
        - plan queries:  min(best, queries_warm[q])    (warm > 0 only)
        - sr drains:     min(best, queries[sr*])       (cold > 0 only;
                         the k=1 discipline — drains have no warm)
        - eager queries: "cold:<q>" <- min(best, queries[q]) for every
                         q in the run's "eager" roster (their warm
                         re-counts a cached frame; the cold min is what
                         their regression flag fires on)
        - walls:         "wall:sr_concurrent"   <- sr_drains.concurrent_wall
                         "wall:board_concurrent" <- board_concurrent.wall
      Existing keys are NEVER raised or dropped. --allow names an
      explicit re-seed (e.g. a query whose fixture changed shape):
      those keys take the run's value even if higher.

  merge_ledgers.py scale <subset.json>
      Merge a SCALEBENCH subset run's "queries" entries over the
      git-HEAD SCALEBENCH_LOCAL.json (NOT the working copy — a prior
      unmerged subset must not become the base), preserving every
      other top-level field from HEAD unless the subset run carried a
      fresh d16_check/d12_skew_check.

check.sh runs scripts/bench_best_guard.py separately so a hand-edited
BENCH_BEST that regressed (raised/dropped) any entry fails the build.
"""
import json
import subprocess
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def git_head(path):
    out = subprocess.run(["git", "show", f"HEAD:{path}"], cwd=".",
                         capture_output=True, text=True)
    if out.returncode != 0:
        sys.exit(f"refusing to merge: cannot read HEAD:{path} ({out.stderr.strip()})")
    return json.loads(out.stdout)


def merge_bench(run_path, allow):
    run = load(run_path)
    if not run.get("pressure_clean", False):
        sys.exit(f"refusing to merge {run_path}: pressure_clean is false "
                 "(only quiet-host runs may update best-known)")
    if run.get("pressure_clean_forced", False):
        sys.exit(f"refusing to merge {run_path}: pressure_clean was FORCED "
                 "(SPARK_GRAFT_BENCH_ASSUME_CLEAN is for the adjudicator "
                 "liveness smoke only — its numbers are not quiet-host)")
    if run.get("roundtrip_forced", False):
        sys.exit(f"refusing to merge {run_path}: round-trip readings were "
                 "FORCED (SPARK_GRAFT_BENCH_FORCE_RT is for the adjudicator "
                 "smoke's degraded-regime case only)")
    if run.get("failed"):
        sys.exit(f"refusing to merge {run_path}: failed queries {run['failed']}")
    best = load("BENCH_BEST.json")
    before = dict(best)
    updates = {}
    for q, w in run.get("queries_warm", {}).items():
        if not q.startswith("sr") and w and w > 0:
            updates[q] = w
    for q, c in run.get("queries", {}).items():
        if q.startswith("sr") and c and c > 0:
            updates[q] = c
    # Eager plan queries additionally seed a COLD best-known under
    # "cold:<name>" (r15 verdict item #1): their warm only re-counts a
    # cached frame, so the cold column is the statistic their
    # regression flag fires on. The roster comes from the run artifact
    # itself (Bench.EagerPlanQueries emits it), so this script can
    # never drift from the flag pass's registry.
    for q in run.get("eager", []):
        c = run.get("queries", {}).get(q)
        if c and c > 0:
            updates[f"cold:{q}"] = c
    # Walls are SCHEDULE aggregates, not per-query numbers: a subset
    # run (SPARK_GRAFT_ONLY), a non-default concurrency, or a schedule
    # with a crashed member ships an artificially short wall that the
    # min-rule would then poison the best-knowns with — every later
    # healthy run would flag, re-run its whole schedule, and read
    # 'confirmed'. Merge walls only from a FULL board run (the run
    # must cover at least every per-query entry already in the ledger)
    # at the default concurrency with empty failed lists.
    full_board = set(run.get("queries", {})) >= {
        k for k in best if ":" not in k}
    sr = run.get("sr_drains", {})
    board = run.get("board_concurrent", {})
    if full_board:
        if not sr.get("failed") and sr.get("concurrency") == 4:
            sr_wall = sr.get("concurrent_wall", 0)
            if sr_wall and sr_wall > 0:
                updates["wall:sr_concurrent"] = sr_wall
        if not board.get("failed") and board.get("concurrency") == 6:
            board_wall = board.get("wall", 0)
            if board_wall and board_wall > 0:
                updates["wall:board_concurrent"] = board_wall
    else:
        print("subset run: wall entries not merged")
    n_new = n_better = n_reseed = 0
    reseeds = {}
    for q, v in sorted(updates.items()):
        v = round(v, 3)
        if q in allow and v != best.get(q):
            print(f"RESEED {q}: {best.get(q)} -> {v}")
            best[q] = v
            reseeds[q] = v
            n_reseed += 1
        elif q not in best:
            print(f"NEW    {q}: {v}")
            best[q] = v
            n_new += 1
        elif v < best[q]:
            print(f"BETTER {q}: {best[q]} -> {v}")
            best[q] = v
            n_better += 1
    dropped = set(before) - set(best)
    assert not dropped, f"merge dropped keys: {dropped}"
    with open("BENCH_BEST.json", "w") as f:
        json.dump(dict(sorted(best.items())), f, indent=1)
        f.write("\n")
    # Sidecar for bench_best_guard: a RAISED entry vs HEAD is
    # tolerated iff it matches an explicit --allow reseed recorded
    # here (committed alongside the ledger, documenting intent) —
    # otherwise the guard would force a red check.sh between the
    # reseed and its commit. Each entry records BOTH endpoints
    # ({"from": head-value-at-reseed-time, "to": new-value}): the
    # guard honors a raise only when HEAD still equals "from", so the
    # moment the reseed is committed (HEAD == "to") the entry goes
    # inert — a flat value-only sidecar would whitelist raising the
    # key back to its old reseeded value FOREVER (r15 ADVICE). Inert
    # entries are pruned on every merge for the same reason.
    try:
        with open("BENCH_BEST_RESEED.json") as f:
            prior = json.load(f)
    except FileNotFoundError:
        prior = {}
    head_best = git_head("BENCH_BEST.json")
    prior = {q: e for q, e in prior.items()
             if isinstance(e, dict) and head_best.get(q) == e.get("from")}
    for q, v in reseeds.items():
        prior[q] = {"from": head_best.get(q), "to": v}
    if prior:
        with open("BENCH_BEST_RESEED.json", "w") as f:
            json.dump(dict(sorted(prior.items())), f, indent=1)
            f.write("\n")
    else:
        import os
        if os.path.exists("BENCH_BEST_RESEED.json"):
            os.remove("BENCH_BEST_RESEED.json")
    print(f"== BENCH_BEST: {n_new} new, {n_better} improved, "
          f"{n_reseed} reseeded, {len(best)} total ==")


def merge_scale(subset_path):
    subset = load(subset_path)
    base = git_head("SCALEBENCH_LOCAL.json")
    merged = dict(base)
    qs = dict(base.get("queries", {}))
    # r15 ADVICE: basing on git-HEAD alone silently DISCARDS a prior
    # uncommitted merge's entries when two subset runs are merged
    # without a commit between them — the exact ledger-clobber class
    # this script exists to prevent. Union the working tree's queries
    # into the HEAD base first: they are real measurements either way
    # (a prior merge's output, or a direct subset run that overwrote
    # the file), and the shrink guard below still catches anything
    # destructive. Invalid JSON in the tree is a hard stop — that is
    # not a ledger, and guessing would hide whatever truncated it.
    try:
        tree = load("SCALEBENCH_LOCAL.json")
    except FileNotFoundError:
        tree = base
    except json.JSONDecodeError:
        sys.exit("working-tree SCALEBENCH_LOCAL.json is not valid JSON — "
                 "restore it (git checkout) before merging")
    tree_qs = tree.get("queries", {})
    uncommitted = {q: v for q, v in tree_qs.items()
                   if base.get("queries", {}).get(q) != v}
    if uncommitted:
        print(f"working tree differs from HEAD: keeping "
              f"{len(uncommitted)} uncommitted entries "
              f"({', '.join(sorted(uncommitted)[:6])}"
              f"{'...' if len(uncommitted) > 6 else ''})")
        qs.update(tree_qs)
        for k in ("d16_check", "d12_skew_check"):
            if k in tree:
                merged[k] = tree[k]
    new_qs = subset.get("queries", {})
    if not new_qs:
        sys.exit(f"refusing to merge {subset_path}: no 'queries' entries")
    qs.update(new_qs)
    merged["queries"] = qs
    for k in ("d16_check", "d12_skew_check"):
        if k in subset:
            merged[k] = subset[k]
    if len(merged["queries"]) < len(base.get("queries", {})):
        sys.exit("merge would SHRINK the queries ledger — aborting")
    with open("SCALEBENCH_LOCAL.json", "w") as f:
        json.dump(merged, f, indent=1)
        f.write("\n")
    print(f"== SCALEBENCH_LOCAL: {len(new_qs)} entries merged over HEAD base, "
          f"{len(merged['queries'])} total ==")


def main():
    if len(sys.argv) < 3 or sys.argv[1] not in ("bench", "scale"):
        sys.exit(__doc__)
    allow = set()
    if "--allow" in sys.argv:
        i = sys.argv.index("--allow")
        allow = set(sys.argv[i + 1].split(","))
    if sys.argv[1] == "bench":
        merge_bench(sys.argv[2], allow)
    else:
        merge_scale(sys.argv[2])


if __name__ == "__main__":
    main()
