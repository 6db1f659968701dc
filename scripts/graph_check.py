#!/usr/bin/env python3
"""Growth-ratio gate over BENCH_GRAPH.json (round-14 verdict item 1):
the graph corpora differ by 10x in edge count (graph_small 1M edges ->
graph_big 10M edges, scripts/graph_testdata.py), so every iterative
graph operator must grow at most MAX_GROWTH (default 15x) in min-of-N
time — the same "superlinear blowups only show at scale" discipline as
the relational sweeps. A fixed per-round scheduler tax plus linear work
lands well under 15x; a superlinear join or a hot-reducer blowup does
not.

BENCH_GRAPH.json is JSONL: one object per GraphProbe invocation
({"dir":..., "edges":N, "nodes":N, "ops": {op: {"min_sec":s, ...}}}).
Records for the same dir MERGE per-op (newest op reading wins), so an
op can be re-probed alone without discarding the rest of the record.

Usage: python3 scripts/graph_check.py [BENCH_GRAPH.json] [--max-growth X]
Exit 0 = every op present in both sizes and within the growth bound.
"""
import json
import sys

MAX_GROWTH = 15.0
# ops where the small-size time is dominated by fixed per-round job
# overhead (sub-second floors): growth ratios on a <FLOOR_SEC base are
# scheduler noise, not scaling signal — they pass on the absolute bound
FLOOR_SEC = 2.0


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_GRAPH.json"
    max_growth = MAX_GROWTH
    if "--max-growth" in sys.argv:
        max_growth = float(sys.argv[sys.argv.index("--max-growth") + 1])
    by_dir = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            key = rec["dir"].rstrip("/").rsplit("/", 1)[-1]
            if key in by_dir:
                by_dir[key]["ops"].update(rec["ops"])
                by_dir[key]["edges"] = rec["edges"]
            else:
                by_dir[key] = rec
    small = by_dir.get("graph_small")
    big = by_dir.get("graph_big")
    if not small or not big:
        print(f"FAIL: need both graph_small and graph_big records, "
              f"have {sorted(by_dir)}")
        return 1
    scale = big["edges"] / small["edges"]
    print(f"edge growth {scale:.1f}x "
          f"({small['edges']} -> {big['edges']}); bound {max_growth}x")
    rc = 0
    for op, s in sorted(small["ops"].items()):
        b = big["ops"].get(op)
        if b is None:
            print(f"FAIL {op:<12} missing from graph_big record")
            rc = 1
            continue
        t0, t1 = s["min_sec"], b["min_sec"]
        ratio = t1 / t0 if t0 > 0 else float("inf")
        if t0 < FLOOR_SEC:
            # sub-floor base: judge the big side absolutely instead
            ok = t1 <= FLOOR_SEC * max_growth
            verdict = "ok(floor)" if ok else "FAIL(floor)"
        else:
            ok = ratio <= max_growth
            verdict = "ok" if ok else "FAIL"
        print(f"{verdict:<11} {op:<12} {t0:>7.2f}s -> {t1:>7.2f}s "
              f"({ratio:>5.1f}x)")
        if not ok:
            rc = 1
    for op in sorted(set(big["ops"]) - set(small["ops"])):
        print(f"WARN {op:<12} only in graph_big (no ratio)")
    print("== graph growth gate", "PASS ==" if rc == 0 else "FAIL ==")
    return rc


if __name__ == "__main__":
    sys.exit(main())
