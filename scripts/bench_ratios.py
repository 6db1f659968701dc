#!/usr/bin/env python3
"""Every gate's ratio vs its FIRST-RECORDED bench time, computable from
round artifacts alone (the 2x regression gate, de-noised):

    python3 scripts/bench_ratios.py bench_full.json [--update-baselines]

Reads BENCH_BASELINES.json (committed; append-only first-recorded table)
and a current bench artifact. Rules, in order:

1. DENOMINATOR: a baseline row's `practical_sec` when present (a `note`
   on the row documents why the raw first record was anomalous — e.g. a
   fastest-window outlier), else its `sec` (the first-recorded reading).
2. RAW GATE: ratio = now/first; breach when ratio > 2.0 and the current
   reading is above the 0.3 s noise floor (sub-floor gates double on
   scheduler jitter alone). Rows with a `note` but NO `practical_sec`
   are already-adjudicated anomalies: reported, never gated.
3. WINDOW NORMALIZATION: marker_now = MEDIAN of the artifact's
   `markers` {start,mid,end} probes (falls back to the in-suite q03
   reading for pre-r13 artifacts); ratio_norm = raw / (marker_now /
   marker_first). Informational on the primary gate (the judge's
   convention is raw vs first-recorded) but DECISIVE for adjudication.
4. STANDALONE ADJUDICATION: when Bench flagged a breached gate it
   re-ran it min-of-3 post-suite and shipped the reading in the
   artifact's `standalone` map. A breach CLEARS iff that standalone
   reading, window-normalized (raw when the baseline row predates
   markers), is back under 2.0. Exit 1 only for uncleared breaches —
   the verdict is derivable from committed artifacts alone.

--update-baselines appends rows for queries present in the bench
artifact but missing from the table (new gates' first timing); existing
rows are NEVER rewritten.
"""
import json
import statistics
import sys

MARKER = "q03_a1_unify_latest"
GATE = 2.0
FLOOR = 0.3

# --growth mode: 100x data must not grow a gate's time past this factor
# (linear work across 100x rows with both scales saturating the same 32
# cores lands well under it; the committed r13/r14 sweeps peak at ~16x
# for the PPJoin verify joins). Sub-floor sf0.1 bases are judged on the
# absolute sf10 reading instead (scheduler noise dominates the ratio).
GROWTH_GATE = 35.0
GROWTH_FLOOR = 0.3
# Gates the artifact labels with a class (brute_audit: O(Q*N) by
# design; cpu_dense: linear CPU already saturating the cores at sf0.1)
# legitimately scale WITH the data: their bound is "scales like the
# data, no worse" — 1.5x the artifact's recorded data_growth (derived
# per artifact so a rerun at a different scale factor keeps meaning
# "scales like the data"; 150 only as a legacy fallback).
# scripts/bench_100x.py documents each class.
DATA_SCALED_GROWTH_FACTOR = 1.5
DATA_SCALED_GROWTH_FALLBACK = 150.0


def growth_mode(path):
    """Gate BENCH_100x.json (scripts/bench_100x.py): per-gate sf0.1 ->
    sf10 growth factors against GROWTH_GATE. Exit 1 on any breach."""
    doc = json.load(open(path))
    data_growth = doc.get("data_growth")
    data_scaled_gate = (DATA_SCALED_GROWTH_FACTOR * data_growth
                        if data_growth else DATA_SCALED_GROWTH_FALLBACK)
    # a full-suite 10x artifact states its own unclassed bound (15x for
    # 10x data, the r8-r11 sweep rule); the 100x artifact keeps 35
    unclassed_gate = doc.get("unclassed_gate", GROWTH_GATE)
    rc = 0
    print(f"{'gate':<24} {'sf0.1':>8} {'sf10':>9} {'growth':>8}  verdict")
    for q, g in sorted(doc["gates"].items()):
        s, b = g.get("sf01_sec"), g.get("sf10_sec")
        if s is None or b is None:
            print(f"{q:<24} {'-':>8} {'-':>9} {'-':>8}  FAIL(missing)")
            rc = 1
            continue
        ratio = b / s if s > 0 else float("inf")
        cls = g.get("class")
        gate = data_scaled_gate if cls else unclassed_gate
        if s < GROWTH_FLOOR:
            ok = b <= GROWTH_FLOOR * gate
            verdict = "ok(floor)" if ok else "FAIL(floor)"
        else:
            ok = ratio <= gate
            verdict = "ok" if ok else "FAIL"
        if cls:
            verdict += f"({cls})"
        print(f"{q:<24} {s:>7.2f}s {b:>8.2f}s {ratio:>7.1f}x  {verdict}")
        if not ok:
            rc = 1
    print("== 100x growth gate", "PASS ==" if rc == 0 else "FAIL ==")
    return rc


def main():
    if "--growth" in sys.argv:
        i = sys.argv.index("--growth")
        path = sys.argv[i + 1] if i + 1 < len(sys.argv) \
            else "BENCH_100x.json"
        return growth_mode(path)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    update = "--update-baselines" in sys.argv
    bench_path = args[0] if args else "bench_full.json"
    bench = json.load(open(bench_path))
    now = bench["queries"] if "queries" in bench else bench
    standalone = bench.get("standalone", {}) if "queries" in bench else {}
    base_doc = json.load(open("BENCH_BASELINES.json"))
    base = base_doc["queries"]

    markers = bench.get("markers", {}) if "queries" in bench else {}
    marker_now = (statistics.median(markers.values()) if markers
                  else now.get(MARKER))
    # FROZEN marker (r16 on): a plan-frozen range->hash->sum probe in
    # Bench whose time can only move with the MACHINE window, never
    # with engine improvements (the q03 marker's own plan got faster
    # over rounds, inflating normalized ratios). Reported here each
    # round; normalization switches to it once two rounds of history
    # exist (its per-round medians accumulate in BENCH_BASELINES.json's
    # frozen_marker_history).
    frozen = bench.get("frozen_markers", {}) if "queries" in bench else {}
    frozen_now = statistics.median(frozen.values()) if frozen else None
    rows, breaches, adjudicated = [], [], []
    for q in sorted(now):
        if q not in base:
            continue
        row = base[q]
        first = row.get("practical_sec") or row["sec"]
        m_first = row.get("marker_sec")
        if first <= 0:
            continue
        raw = now[q] / first
        norm = raw / (marker_now / m_first) if m_first and marker_now \
            else None
        rows.append({"raw": raw, "norm": norm, "q": q, "first": first,
                     "now": now[q], "round": row.get("round")})
        if raw > GATE and now[q] >= FLOOR:
            # a note WITHOUT practical_sec = adjudicated first-record
            # anomaly (documented in BENCH_BASELINES.json): report only.
            # practical_sec re-bases the row, so it gates normally.
            if row.get("note") and "practical_sec" not in row:
                adjudicated.append(q)
            else:
                breaches.append(q)

    rows.sort(key=lambda r: -r["raw"])
    print(f"{'raw':>6} {'norm':>6}  query (first@round -> now)")
    for r in rows[:15]:
        ns = f"{r['norm']:6.2f}" if r["norm"] is not None else "     -"
        rd = f"r{r['round']}" if r["round"] is not None else "r?"
        print(f"{r['raw']:6.2f} {ns}  {r['q']}: "
              f"{r['first']:.2f}@{rd} -> {r['now']:.2f}")

    # standalone adjudication: Bench's post-suite min-of-3 re-run of
    # each flagged gate, committed inside the artifact (rule 4 above)
    cleared, uncleared = [], []
    for q in breaches:
        st = standalone.get(q)
        if st is None:
            uncleared.append((q, None, None))
            continue
        row = base[q]
        first = row.get("practical_sec") or row["sec"]
        st_raw = st / first
        m_first = row.get("marker_sec")
        st_norm = st_raw / (marker_now / m_first) \
            if m_first and marker_now else st_raw
        (cleared if st_norm < GATE else uncleared).append((q, st, st_norm))
    if cleared or uncleared:
        print("\nadjudication (standalone min-of-3, window-normalized):")
        for q, st, n in cleared:
            print(f"  CLEARED  {q}: standalone {st:.2f}s -> norm {n:.2f}x")
        for q, st, n in uncleared:
            if st is None:
                print(f"  BREACH   {q}: no standalone reading in artifact")
            else:
                print(f"  BREACH   {q}: standalone {st:.2f}s -> "
                      f"norm {n:.2f}x (still > {GATE}x)")

    new_qs = sorted(set(now) - set(base))
    if new_qs:
        print("first-benched this run: " +
              ", ".join(f"{q}={now[q]:.2f}s" for q in new_qs))
        if update:
            for q in new_qs:
                base[q] = {"sec": round(now[q], 3), "round": None,
                           "marker_sec": round(marker_now, 3)
                           if marker_now else None}
            json.dump(base_doc, open("BENCH_BASELINES.json", "w"), indent=1)
            print("BENCH_BASELINES.json: appended "
                  f"{len(new_qs)} rows (set 'round' when committing)")
    if adjudicated:
        print("\nadjudicated >2x rows (see BENCH_BASELINES notes): "
              + ", ".join(adjudicated))
    if uncleared:
        print(f"\n2x BREACHES ({len(uncleared)}): "
              + ", ".join(q for q, _, _ in uncleared))
        return 1
    msg = f" ({len(cleared)} cleared by standalone)" if cleared else ""
    fz = (f", frozen marker = {frozen_now:.3f}s"
          if frozen_now is not None else "")
    print(f"\nno unadjudicated 2x breach across {len(rows)} gated "
          f"queries{msg} (marker now = {marker_now}s{fz})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
