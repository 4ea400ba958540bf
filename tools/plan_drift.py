#!/usr/bin/env python3
"""Plan-drift guard (round-10 verdict task 6).

PLANS.md pins the physical plan of every registered query, but nothing
used to FAIL when a plan silently changed shape between rounds — a
Catalyst upgrade, an accidental hint removal, or a refactor could turn
a broadcast join into a cartesian and only show up as a bench spike.

This tool compares the LOAD-BEARING token signature of each query's
plan between two PLANS.md-format files (normally: a fresh dump vs the
committed one) and exits nonzero on any difference:

    sbt -batch "runMain graft.DumpPlans /tmp/plans_fresh.md"
    python3 tools/plan_drift.py PLANS.md /tmp/plans_fresh.md

The signature counts the tokens that decide scale behavior — shuffle
exchanges, single-partition funnels, cartesians / broadcast NLJs,
reused exchanges, windows and their group-limit bounds, sorts — not the
full text, so expression-id churn and cosmetic renumbering never fire
the guard, while a new Exchange or a lost WindowGroupLimit always does.

Intentional plan changes are re-pinned by regenerating PLANS.md
(`runMain graft.DumpPlans`) and committing the diff — the guard makes
drift VISIBLE-or-fail, not impossible.
"""
import re
import sys

# token -> regex counted per query section. Counted on plan lines only
# (the fenced blocks), so prose notes can name these without tripping.
TOKENS = {
    "exchange_hash": re.compile(r"Exchange hashpartitioning"),
    "exchange_range": re.compile(r"Exchange rangepartitioning"),
    "exchange_single": re.compile(r"Exchange SinglePartition"),
    "broadcast_exchange": re.compile(r"BroadcastExchange"),
    "reused_exchange": re.compile(r"ReusedExchange"),
    "cartesian": re.compile(r"CartesianProduct"),
    "bnl_join": re.compile(r"BroadcastNestedLoopJoin"),
    "sort_merge_join": re.compile(r"SortMergeJoin"),
    "broadcast_hash_join": re.compile(r"BroadcastHashJoin"),
    "shuffled_hash_join": re.compile(r"ShuffledHashJoin"),
    "window": re.compile(r"\bWindow\b(?! ?GroupLimit)"),
    "window_group_limit": re.compile(r"WindowGroupLimit"),
    "take_ordered": re.compile(r"TakeOrderedAndProject"),
    "sort": re.compile(r"\bSort\b(?!MergeJoin)"),
    "expand": re.compile(r"\bExpand\b"),
    "generate": re.compile(r"\bGenerate\b"),
}


def signatures(path):
    """{query_name: {token: count}} for each '## qNNN_*' section's
    fenced code blocks."""
    sigs = {}
    name = None
    in_fence = False
    lines = []
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.rstrip("\n")
            m = re.match(r"^## (\S+)$", line)
            if m:
                if name is not None:
                    sigs[name] = count(lines)
                name, lines, in_fence = m.group(1), [], False
                continue
            if line.startswith("```"):
                in_fence = not in_fence
                continue
            if in_fence and name is not None:
                lines.append(line)
    if name is not None:
        sigs[name] = count(lines)
    return sigs


def count(lines):
    text = "\n".join(lines)
    return {tok: len(rx.findall(text)) for tok, rx in TOKENS.items()}


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    committed, fresh = signatures(sys.argv[1]), signatures(sys.argv[2])
    drifted = []
    for q in sorted(set(committed) | set(fresh)):
        if q not in committed:
            drifted.append((q, "NEW (not in committed PLANS.md)"))
            continue
        if q not in fresh:
            drifted.append((q, "MISSING from fresh dump"))
            continue
        diffs = [
            f"{t}: {committed[q][t]} -> {fresh[q][t]}"
            for t in TOKENS
            if committed[q][t] != fresh[q][t]
        ]
        if diffs:
            drifted.append((q, "; ".join(diffs)))
    if drifted:
        print(f"PLAN DRIFT in {len(drifted)} quer"
              f"{'y' if len(drifted) == 1 else 'ies'}:")
        for q, why in drifted:
            print(f"  {q}: {why}")
        print("\nIf intentional: regenerate with "
              "`sbt -batch 'runMain graft.DumpPlans'` and commit PLANS.md.")
        sys.exit(1)
    print(f"plan drift: {len(committed)} queries, signatures identical")


if __name__ == "__main__":
    main()
