#!/usr/bin/env python3
"""Round-over-round bench comparison: diff two bench_full.json artifacts
(or any JSON with a "queries" map of name -> seconds), normalizing for
machine-speed windows via a marker-query ratio.

Usage: python3 scripts/compare_bench.py OLD.json NEW.json [marker]

The marker (default q03_a1_unify_latest — an untouched, stable query)
estimates the environment shift between the two runs; per-query ratios
are reported both raw and marker-normalized so a 1.4x uniform machine
slowdown does not read as 127 regressions.
"""
import json
import sys


def load(p):
    with open(p) as f:
        d = json.load(f)
    return d["queries"] if "queries" in d else d


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    marker = sys.argv[3] if len(sys.argv) > 3 else "q03_a1_unify_latest"
    old, new = load(old_p), load(new_p)
    common = sorted(set(old) & set(new))
    env = (new[marker] / old[marker]) if marker in old and marker in new \
        else 1.0
    print(f"queries: old={len(old)} new={len(new)} common={len(common)}")
    print(f"totals:  old={sum(old.values()):.1f}s new={sum(new.values()):.1f}s")
    print(f"marker {marker}: {old.get(marker, float('nan')):.2f} -> "
          f"{new.get(marker, float('nan')):.2f}  (env shift x{env:.2f})")
    added = sorted(set(new) - set(old))
    if added:
        print("added:   " + ", ".join(f"{q}={new[q]:.2f}s" for q in added))
    gone = sorted(set(old) - set(new))
    if gone:
        print("removed: " + ", ".join(gone))
    rows = []
    for q in common:
        if old[q] < 0.15:  # below timing noise floor
            continue
        raw = new[q] / old[q]
        rows.append((raw / env, raw, q, old[q], new[q]))
    rows.sort()
    print(f"\n{'norm':>6} {'raw':>6}  query (old -> new)")
    interesting = [r for r in rows if r[0] < 0.8 or r[0] > 1.25]
    for normr, raw, q, o, n in interesting or rows[:5] + rows[-5:]:
        print(f"{normr:6.2f} {raw:6.2f}  {q}: {o:.2f} -> {n:.2f}")
    if not interesting:
        print("(no per-query change beyond +-25% after normalization; "
              "showing extremes)")


if __name__ == "__main__":
    main()
