#!/usr/bin/env python3
"""Produce the committed FULL-SUITE 10x growth artifact (round-15
verdict item 1): BENCH_100x.json covers the 23 headline gates; this
runs EVERY gate at 10x data (testdata_sf1, scripts/scale_testdata.py
10 <dir>) in Bench subset mode (min-of-2 warm per gate) and records
per-gate growth vs the committed sf0.1 bench_full.json of the same
binary. Gate with `bench_ratios.py --growth BENCH_10x_full.json`
(bound: 15x for 10x data — the r8-r11 sweep rule — derived per
artifact from unclassed_gate/data_growth).

The gate list and the sf0.1 denominators both come from
bench_full.json, so the artifact can never silently drop a gate:
run the full sf0.1 bench FIRST on the shipped binary.

Usage: python3 scripts/bench_10x_full.py [sf1dir] [--skip-run]
  --skip-run reuses /tmp/bench_10x_run.log (artifact re-assembly).
"""
import json
import os
import subprocess
import sys

# Same legitimately-data-scaled classes as bench_100x.py (documented
# there); bounded at 1.5x the data growth instead of the overhead-base
# bound. q212 is the brute O(Q*N) retrieval-eval audit lane (q218 is
# its probe-pruned scale twin and carries no class).
CLASSES = {
    "q25_ann_topk": "brute_audit",
    "q155_matryoshka_topk": "brute_audit",
    "q156_rrf_fusion": "brute_audit",
    "q197_knn_label_noise": "brute_audit",
    "q212_retrieval_metrics": "brute_audit",
    "q216_ivf_recall": "brute_audit",
    "q217_ivf_recall_curve": "brute_audit",
    "q144_web_prep": "cpu_dense",
    "q52_kmeans_partial": "cpu_dense",
    "q69_cms_registers": "cpu_dense",
    "q83_heavy_hitters": "cpu_dense",
    "q126_dsir_components": "cpu_dense",
    "q128_cluster_balance": "cpu_dense",
}
RUN_LOG = "/tmp/bench_10x_run.log"


def run_bench(sf1, gates):
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf1,
        "SPARK_GRAFT_CPUS": env.get("SPARK_GRAFT_CPUS", "32"),
        "SPARK_DRIVER_MEM": env.get("SPARK_DRIVER_MEM", "48g"),
        "SPARK_GRAFT_BENCH_ONLY": ",".join(gates),
    })
    with open(RUN_LOG, "w") as log:
        subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       env=env, stdout=log, stderr=subprocess.STDOUT,
                       check=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf1 = args[0] if args else "/root/repo/testdata_sf1"
    sf01_res = json.load(open("bench_full.json"))["queries"]
    gates_all = sorted(sf01_res)
    if "--skip-run" not in sys.argv:
        run_bench(sf1, gates_all)
    line = None
    for ln in open(RUN_LOG, errors="replace"):
        if '"metric":"total"' in ln:
            line = ln[ln.index('{"metric"'):]
    if line is None:
        print(f"FAIL: no bench JSON line in {RUN_LOG}")
        return 1
    sf1_res = json.loads(line)["queries"]
    gates = {}
    for q in gates_all:
        b, s = sf1_res.get(q), sf01_res.get(q)
        gates[q] = {
            "sf01_sec": round(s, 3) if s is not None else None,
            "sf10_sec": round(b, 3) if b is not None else None,
            "growth": round(b / s, 2)
                if b is not None and s else None,
        }
        if q in CLASSES:
            gates[q]["class"] = CLASSES[q]
    doc = {"sf10_dir": sf1, "data_growth": 10, "unclassed_gate": 15,
           "note": "FULL-SUITE 10x record: sf10_sec is Bench "
                   "subset-mode min-of-2 warm at local[32] against "
                   "testdata_sf1 (10x of the driver's sf0.1); sf01_sec "
                   "from the committed bench_full.json of the same "
                   "binary; gate with bench_ratios.py --growth",
           "gates": gates}
    json.dump(doc, open("BENCH_10x_full.json", "w"), indent=1)
    worst = sorted(((g["growth"] or 0, q) for q, g in gates.items()),
                   reverse=True)[:15]
    for growth, q in worst:
        g = gates[q]
        print(f"{q:<26} sf0.1 {g['sf01_sec']}s -> 10x {g['sf10_sec']}s"
              f"  ({g['growth']}x)")
    print(f"wrote BENCH_10x_full.json ({len(gates)} gates)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
