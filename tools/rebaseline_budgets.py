#!/usr/bin/env python3
"""Re-baseline the Bench.scala per-query budget table from N quiet full-suite
runs (round-9 verdict item 4).

Rule: budget = median of the quiet runs; if max > 1.25 x median (a noisy
query), budget = max — so the 2x regression gate models cost, not stale
floors, and every observed quiet run sits <= 1.25x its budget by
construction.

LOADED runs (`--loaded file.json`, repeatable — e.g. the driver's
full-suite BENCH_DETAIL.json) enter as a FLOOR: budget = max(quiet rule,
loaded observations), never lower. Full-suite load inflates the noisy
families (streaming micro-batch machinery, iterative lineage-cut jobs) well
past their quiet medians; a quiet-only rebaseline then encodes floors the
next driver run trips over (round-11 verdict item 6 — events_funnel's
loaded band collapsed to its 0.564 s quiet median in the r10 rebaseline).
With only --loaded inputs, current budgets are kept and merely raised.

Values are rewritten IN PLACE inside the `budget: Map[String, Double]`
literal; surrounding comparator comments are preserved (they justify the
plan shape; the number is the measured band under that shape).

Usage: rebaseline_budgets.py [run1.json run2.json ...]
       [--loaded detail.json ...] [--apply]
       (quiet runs positional; default is dry-run report to stdout)
"""
import json, re, statistics, sys

BENCH = "src/main/scala/graft/Bench.scala"

def main():
    argv = sys.argv[1:]
    apply = "--apply" in argv
    loaded_paths, args, it = [], [], iter([a for a in argv if a != "--apply"])
    for a in it:
        if a == "--loaded":
            loaded_paths.append(next(it))
        else:
            args.append(a)
    assert args or loaded_paths, "need at least one quiet or --loaded run"
    runs = [json.load(open(p))["queries"] for p in args]
    loaded = [json.load(open(p))["queries"] for p in loaded_paths]
    names = set(runs[0]) if runs else set(loaded[0])
    for r in runs[1:]:
        assert set(r) == names, "runs disagree on query set"

    src = open(BENCH).read()
    # Bound the rewrite to the budget map literal. The matching ")" is found
    # by raw paren-depth counting, which a comment containing an unbalanced
    # paren would silently mis-bound — so strip line comments for the DEPTH
    # WALK only (the rewrite still runs over the original text).
    start = src.index("val budget: Map[String, Double] = Map(")
    walk = re.sub(r"//[^\n]*", lambda m: " " * len(m.group(0)), src)
    i, depth, end = walk.index("(", start), 0, -1
    for j in range(i, len(walk)):
        if walk[j] == "(":
            depth += 1
        elif walk[j] == ")":
            depth -= 1
            if depth == 0:
                end = j
                break
    assert end > start, "budget map close paren not found"
    body = src[start:end]
    # Sanity-pin the computed bound: the slice must end at a budget entry
    # (possibly followed by comment lines) and the map's ")" must be the
    # next structural character — otherwise a stray paren moved the bound
    # and --apply could rewrite pairs outside the map or miss its tail.
    tail = re.sub(r"//[^\n]*", "", body).rstrip().rstrip(",").rstrip()
    assert re.search(r'->\s*[0-9]+(?:\.[0-9]+)?$', tail), \
        f"budget map bound looks wrong; slice ends with: ...{tail[-60:]!r}"

    entry = re.compile(r'"([a-z0-9_]+)"\s*->\s*([0-9]+(?:\.[0-9]+)?)')
    current = {m.group(1): float(m.group(2)) for m in entry.finditer(body)}
    missing_budget = names - set(current)
    missing_run = set(current) - names
    if missing_budget:
        print("queries with no budget entry:", sorted(missing_budget))
    if missing_run:
        print("budget entries not in runs:", sorted(missing_run))

    new = {}
    for n in sorted(names & set(current)):
        if runs:
            ts = [r[n] for r in runs]
            med, mx = statistics.median(ts), max(ts)
            quiet = mx if mx > 1.25 * med else med
        else:
            quiet = current[n]  # --loaded only: keep, never lower
        floor = max((l[n] for l in loaded if n in l), default=0.0)
        new[n] = round(max(quiet, floor), 3)

    changed = [(n, current[n], new[n]) for n in new
               if abs(new[n] - current[n]) / max(current[n], 1e-9) > 1e-6]
    changed.sort(key=lambda t: abs(t[2] / max(t[1], 1e-9) - 1), reverse=True)
    print(f"{len(changed)}/{len(new)} budgets change; top deltas:")
    for n, o, v in changed[:15]:
        print(f"  {n}: {o} -> {v}  ({v/max(o,1e-9):.2f}x)")

    if not apply:
        print("(dry run; pass --apply to rewrite Bench.scala)")
        return

    def repl(m):
        n = m.group(1)
        return f'"{n}" -> {new[n]}' if n in new else m.group(0)
    new_body = entry.sub(repl, body)
    open(BENCH, "w").write(src[:start] + new_body + src[end:])
    print("Bench.scala budget table rewritten.")

if __name__ == "__main__":
    main()
