#!/usr/bin/env python
"""Spark-free control for the N->4N scaling gap: is it the engine or the host?

The scaling harness (run_scaling.py) measures raw 2-core -> 8-core
efficiency ~0.55 on this shared KVM guest. Two hypotheses fit that number:

  (a) the ENGINE stops scaling (driver serialization, skew, shuffle
      contention inside one Spark app) — would indict the plan at 100 TB;
  (b) the HOST stops scaling (memory bandwidth / hypervisor steal shared
      across the 8-core span) — indicts only this box, since on a real
      cluster each executor node brings its own memory channels.

This control separates them with zero Spark coordination: run the SAME
2-core pinned leg (spark-submit bench.py, pipeline only) as

  * one solo process pinned to cores 0-1 (bracketed before AND after), and
  * four INDEPENDENT processes started simultaneously, pinned to disjoint
    spans 0-1 / 2-3 / 4-5 / 6-7 — the same physical span as the 8-core leg,
    but four separate JVMs with four separate drivers, schedulers, heaps
    and shuffle dirs. No Spark object is shared; there is nothing the
    engine could serialize across them.

host_efficiency = mean(concurrent per-process pages/sec) / solo pages/sec.
If it lands at ~the measured 8-core raw efficiency, the entire scaling gap
is reproduced WITHOUT any intra-app scaling mechanism — i.e. it is the
host's per-core throughput that degrades when 8 cores are busy, not the
engine's plan. If it stays ~1.0, the gap is intra-app and the engine owns it.

Usage: python BENCH/host_ceiling_control.py [replicas=32]
Writes BENCH/host_ceiling.json and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

SPANS = ["0-1", "2-3", "4-5", "6-7"]


def leg(span: str, replicas: int, zpath: Path, tag: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS="2",
               WDD_DRIVER_MEM="4g",          # 2 GiB/core, as run_scaling.py
               WDD_BENCH_QUERIES="none",
               WDD_BENCH_REPLICAS=str(replicas))
    env.pop("WDD_EXECUTORS", None)
    t0 = time.monotonic()
    out = subprocess.run(
        ["taskset", "-c", span, SPARK_SUBMIT,
         "--driver-memory", env["WDD_DRIVER_MEM"],
         "--py-files", str(zpath), str(ROOT / "bench.py")],
        env=env, capture_output=True, text=True, timeout=2400,
        cwd=str(ROOT))
    wall = time.monotonic() - t0
    if out.returncode != 0:
        dump = ROOT / "BENCH" / f"ctrl_fail_{tag}_{int(time.time())}.log"
        dump.write_text(out.stdout[-20000:] + "\n=== STDERR ===\n"
                        + out.stderr[-40000:])
        raise RuntimeError(f"control leg {tag} (span {span}) failed -> {dump}")
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            r = json.loads(line)
            return {"tag": tag, "span": span, "proc_wall_s": round(wall, 1),
                    "pipeline_s": r["value"],
                    "pages": r["pages"], "pages_per_sec": r["pages_per_sec"],
                    "recall": r["dup_pair_recall"], "clusters": r["clusters"]}
    raise RuntimeError(f"control leg {tag}: no JSON line in stdout")


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sys.path.insert(0, str(ROOT / "BENCH"))
    from run_scaling import build_zip
    zpath = build_zip()

    print(f"solo leg A (span 0-1, x{replicas})...", flush=True)
    solo_a = leg("0-1", replicas, zpath, "soloA")
    print(json.dumps(solo_a), flush=True)

    print("4 concurrent independent legs (spans 0-1..6-7)...", flush=True)
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [ex.submit(leg, span, replicas, zpath, f"conc{i}")
                for i, span in enumerate(SPANS)]
        conc = [f.result() for f in futs]
    for c in conc:
        print(json.dumps(c), flush=True)

    print("solo leg B (span 0-1, bracket)...", flush=True)
    solo_b = leg("0-1", replicas, zpath, "soloB")
    print(json.dumps(solo_b), flush=True)

    solo_pps = (solo_a["pages_per_sec"] + solo_b["pages_per_sec"]) / 2
    conc_pps = [c["pages_per_sec"] for c in conc]
    mean_conc = sum(conc_pps) / len(conc_pps)
    result = {
        "protocol": ("pipeline-only bench.py legs, 2 cores each, "
                     f"x{replicas} replicas; solo (bracketed) vs 4 "
                     "independent simultaneous JVMs on disjoint spans 0-7"),
        "solo": [solo_a, solo_b],
        "solo_pages_per_sec_mean": round(solo_pps, 1),
        "concurrent": conc,
        "concurrent_pages_per_sec": [round(p, 1) for p in conc_pps],
        "host_efficiency_per_process": round(mean_conc / solo_pps, 3),
        "aggregate_scaleup_4x_cores": round(sum(conc_pps) / solo_pps, 2),
        "solo_drift_a_over_b": round(
            solo_a["pages_per_sec"] / solo_b["pages_per_sec"], 3),
        "interpretation": (
            "host_efficiency_per_process ~= the 8-core raw scaling "
            "efficiency => the N->4N gap reproduces with zero intra-app "
            "coordination and is a host ceiling, not an engine property"),
    }
    (ROOT / "BENCH" / "host_ceiling.json").write_text(
        json.dumps(result, indent=1))
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
