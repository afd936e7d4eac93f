#!/usr/bin/env python
"""Quick window probe: the host's attainable scaling ceilings RIGHT NOW on
the 2->8 (and optionally 8->32) core spans, no Spark involved. Used to pick
a quiet window for the full BENCH/run_scaling.py measurement — the shared
host's bandwidth ceiling drifts 0.4-2.0 across windows and gates any
framework's measurable efficiency.

Usage: python BENCH/probe_window.py [--wide]
Prints one JSON line: {"kernel_2_8": ..., "memcpy_2_8": ..., ...}
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pin_to(procs: int):
    try:
        os.sched_setaffinity(0, set(range(procs)))
    except Exception:
        pass


def kernel_burn(seed):
    from wdd.kernels.extract import extract_html_features
    from wdd.kernels.minhash import minhash_signature
    from wdd.kernels.simhash import simhash64_batch
    html = ("<html><body><p>"
            + "alpha beta gamma delta epsilon zeta " * 40 + "</p></body></html>")
    t0 = time.time()
    n = 0
    while time.time() - t0 < 4.0:
        f = extract_html_features(html)
        simhash64_batch([f])
        minhash_signature("alpha beta gamma " * 60)
        n += 1
    return n


def memcpy_burn(_):
    import numpy as np
    arr = np.random.default_rng(0).integers(0, 255, size=64 * 1024 * 1024,
                                            dtype=np.uint8)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 3.0:
        arr.copy()
        n += 1
    return n


def main():
    spans = [(2, 8)] + ([(8, 32)] if "--wide" in sys.argv else [])
    ctx = mp.get_context("spawn")
    out = {}
    for name, fn in (("kernel", kernel_burn), ("memcpy", memcpy_burn)):
        rates = {}
        for procs in sorted({p for s in spans for p in s}):
            with ctx.Pool(procs, initializer=_pin_to, initargs=(procs,)) as p:
                rates[procs] = sum(p.map(fn, range(procs)))
        for lo, hi in spans:
            out[f"{name}_{lo}_{hi}"] = round(rates[hi] / rates[lo] / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
