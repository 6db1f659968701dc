#!/usr/bin/env python3
"""Name the trigger behind a suite-load spike (SURVEY §8 "suite-load
spike class"; VERDICT r12 #2) from a committed bench diag artifact:

    python3 scripts/bench_diag.py [bench_full_diag.jsonl]

Bench records, for EVERY timed region in execution order: wall seconds,
GC seconds inside the region (JMX deltas — local mode, one JVM), used
heap at start, process CPU seconds, JIT compilation seconds, storage
bytes read/written (/proc/self/io), and the kernel PSI cpu/io "some"
stall deltas. This tool joins each gate's pass1/pass2/standalone
readings and classifies every >=2x pass-to-pass inflation:

  GC_DEBT     gc_sec delta covers >=50% of the inflation — the gate
              paid preceding gates' garbage (barrier threshold knob).
  EXTRA_CPU   process-CPU delta covers >=50% — the slow run genuinely
              computed more (JIT deopt/recompile, cache-cold plan,
              spill): look at jit_sec and rd/wr_mb to split.
  CPU_STALL   PSI-cpu stall delta covers >=30% — runnable-but-waiting:
              CPU contention from outside the measured work.
  IO_STALL    PSI-io stall up or storage bytes inflated — writeback /
              shuffle-file contention.
  DESCHED     none of the above moved while wall inflated: the JVM's
              threads simply got less machine (host-level time slice —
              the r12/r13 "slow window" class). Verdict: environment,
              not plan.

Exit code is always 0 — this is a diagnostic reader, not a gate; the
gating path is scripts/bench_ratios.py over bench_full.json.
"""
import json
import sys
from collections import defaultdict


def classify(slow, fast, inflation):
    gc_d = slow.get("gc_sec", 0) - fast.get("gc_sec", 0)
    cpu_d = slow.get("cpu_sec", 0) - fast.get("cpu_sec", 0)
    psi_cpu_d = slow.get("psi_cpu_sec", 0) - fast.get("psi_cpu_sec", 0)
    psi_io_d = slow.get("psi_io_sec", 0) - fast.get("psi_io_sec", 0)
    io_d = (slow.get("rd_mb", 0) + slow.get("wr_mb", 0)
            - fast.get("rd_mb", 0) - fast.get("wr_mb", 0))
    if inflation <= 0:
        return "FLAT", {}
    detail = {"gc": gc_d, "cpu": cpu_d, "psi_cpu": psi_cpu_d,
              "psi_io": psi_io_d, "io_mb": io_d,
              "jit": slow.get("jit_sec", 0) - fast.get("jit_sec", 0)}
    if gc_d / inflation >= 0.5:
        return "GC_DEBT", detail
    if cpu_d / inflation >= 0.5:
        return "EXTRA_CPU", detail
    if psi_cpu_d / inflation >= 0.3:
        return "CPU_STALL", detail
    if psi_io_d / inflation >= 0.3 or io_d > 200:
        return "IO_STALL", detail
    return "DESCHED", detail


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_full_diag.jsonl"
    regions = [json.loads(l) for l in open(path) if l.strip()]
    by_gate = defaultdict(list)
    for r in regions:
        by_gate[r["q"]].append(r)

    total_gc = sum(r.get("gc_sec", 0) for r in regions)
    total_wall = sum(r["sec"] for r in regions)
    total_cpu = sum(r.get("cpu_sec", 0) for r in regions)
    print(f"{len(regions)} timed regions, wall {total_wall:.1f}s, "
          f"cpu {total_cpu:.1f}s, GC inside regions {total_gc:.1f}s "
          f"({100*total_gc/max(total_wall,1e-9):.1f}%)")

    markers = [r for r in regions if r["phase"] == "marker"]
    if markers:
        print("markers (q03): " + ", ".join(
            f"{r['sec']:.2f}s(cpu {r.get('cpu_sec',0):.1f} "
            f"gc {r.get('gc_sec',0):.2f})" for r in markers))

    # per-phase wall/cpu to surface a window drift across the suite
    for ph in ("pass1", "pass2"):
        ps = [r for r in regions if r["phase"] == ph]
        if ps:
            print(f"{ph}: wall {sum(r['sec'] for r in ps):.1f}s, "
                  f"cpu {sum(r.get('cpu_sec',0) for r in ps):.1f}s, "
                  f"psi_cpu {sum(r.get('psi_cpu_sec',0) for r in ps):.1f}s, "
                  f"psi_io {sum(r.get('psi_io_sec',0) for r in ps):.1f}s")

    print(f"\n{'gate':<28} {'slow':>6} {'fast':>6} {'ratio':>6}  "
          f"class (dominant deltas)")
    rows = []
    for q, rs in by_gate.items():
        passes = [r for r in rs if r["phase"] in
                  ("pass1", "pass2", "standalone")]
        if len(passes) < 2:
            continue
        slow = max(passes, key=lambda r: r["sec"])
        fast = min(passes, key=lambda r: r["sec"])
        if fast["sec"] <= 0 or slow["sec"] < 0.3:
            continue
        ratio = slow["sec"] / fast["sec"]
        if ratio < 2.0:
            continue
        cls, det = classify(slow, fast, slow["sec"] - fast["sec"])
        rows.append((ratio, q, slow, fast, cls, det))
    rows.sort(reverse=True, key=lambda r: r[0])
    for ratio, q, slow, fast, cls, det in rows:
        dd = " ".join(f"{k}{v:+.2f}" for k, v in det.items()
                      if abs(v) >= 0.05)
        print(f"{q:<28} {slow['sec']:>6.2f} {fast['sec']:>6.2f} "
              f"{ratio:>6.2f}  {cls} (slow={slow['phase']}; {dd})")
    if not rows:
        print("(no gate with a >=2x pass-to-pass inflation above the "
              "0.3s floor)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
