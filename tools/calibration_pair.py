"""Strong-scaling pair WITH a same-window host-ceiling calibration.

The quiet-window protocol (tools/quiet_scaling.py) showed that even
steal-free pairs swing 0.52-0.80 with the host's memory-bandwidth phase:
a 1-proc STREAM triad reads 2-5 GB/s while 4 procs aggregate only
5-8 GB/s on this VM — i.e. four cores get ~1.5-2.5x the bandwidth of
one, so a bandwidth-bound phase cannot exceed ~0.4-0.6 efficiency here
NO MATTER THE PLAN, while a real 4x-executor cluster multiplies memory
buses along with cores.

This harness separates the two causes the only honest way — empirically,
in the same window:

  1. triad probes at 1 and 4 procs (the bandwidth roofline at this
     moment);
  2. a CALIBRATION job (jobs/calib_scan.py): same parquet, same JVM
     tokenizer, map + scalar-agg only — no shuffle, no Python, no skew.
     Its pair efficiency is the host's ceiling for perfectly parallel
     work on this data profile;
  3. the FLAGSHIP job (jobs/topk_cosine.py, pinned tile decomposition).

Reported: eff_calib (host ceiling), eff_flagship (raw), and
eff_flagship / eff_calib (plan-attributable scaling — what a cluster
whose per-executor resources don't shrink with size would see). All
probes and both raw walls are recorded; nothing is filtered.

Run: python tools/calibration_pair.py [--pairs 2] [--input ...]
Appends to BENCH/calibration.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.quiet_scaling import steal_window, cpu_stat  # noqa: E402
from tools.scaling_bench import run_at, triad_probe  # noqa: E402


def run_calib(cpus: int, input_path: str, passes: int = 3) -> float:
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="12g")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "calib_scan.py"),
         "--input", input_path, "--cpus", str(cpus), "--warmup",
         "--passes", str(passes)],
        capture_output=True, text=True, env=env, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["wall_s"]


def frac(a: dict, b: dict) -> float:
    d = {k: b[k] - a[k] for k in a}
    return round(d["steal"] / max(1, d["busy"]), 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=1)
    ap.add_argument("--input", default="/tmp/scaling_pages.parquet")
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--max-prefs", type=int, default=200)
    ap.add_argument("--wait-quiet", action="store_true",
                    help="poll steal/busy and only start when quiet")
    args = ap.parse_args()

    out_path = os.path.join(REPO, "BENCH", "calibration.jsonl")
    for _ in range(args.pairs):
        if args.wait_quiet:
            while True:
                w = steal_window(10)
                if w["steal_frac"] <= 0.004 and w["busy_frac"] <= 0.02:
                    break
                print(f"noisy ({w}), waiting", flush=True)
                time.sleep(20)
        rec = {"t": round(time.time(), 1), "calib_passes": 3,
               "triad1_start": triad_probe(1), "triad4_start": triad_probe(4)}
        # interleave sizes around the calibration so both jobs sample the
        # same host phase: calib1, flag1, calib4, flag4, calib1 again
        s0 = cpu_stat()
        rec["calib_wall_1a"] = run_calib(1, args.input)
        br = min(2048, max(128, -(-1000 // max(1, int(round(8 ** 0.5))))))
        r1 = run_at(1, args.input, "/tmp/calib_out_1", args.k,
                    args.max_prefs, block_rows=br)
        s1 = cpu_stat()
        rec["calib_wall_4"] = run_calib(4, args.input)
        r4 = run_at(4, args.input, "/tmp/calib_out_4", args.k,
                    args.max_prefs, block_rows=br)
        s2 = cpu_stat()
        rec["calib_wall_1b"] = run_calib(1, args.input)
        rec.update({
            # record the workload size: pairs are only comparable ACROSS
            # windows at equal n_docs (pairs 21-22 silently ran on a
            # stale 40k-doc leftover — caught by this field's absence)
            "n_docs": r1.get("n_docs"),
            "triad1_end": triad_probe(1), "triad4_end": triad_probe(4),
            "flag_wall_1": r1["wall_s"], "flag_wall_4": r4["wall_s"],
            "phases_1": r1["phases"], "phases_4": r4["phases"],
            "steal_during_1side": frac(s0, s1),
            "steal_during_4side": frac(s1, s2),
        })
        calib1 = min(rec["calib_wall_1a"], rec["calib_wall_1b"])
        rec["eff_calib"] = round(calib1 / (4 * rec["calib_wall_4"]), 3)
        rec["eff_flagship"] = round(
            rec["flag_wall_1"] / (4 * rec["flag_wall_4"]), 3)
        rec["eff_normalized"] = (
            round(rec["eff_flagship"] / rec["eff_calib"], 3)
            if rec["eff_calib"] > 0 else None)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec, indent=1), flush=True)


if __name__ == "__main__":
    main()
