"""Raw-CPU scaling probe — establishes the machine's parallel-efficiency

ceiling so the N->4N Spark evidence is interpreted against hardware
reality. Pure-Python integer spin in K processes: no Spark, no shared heap,
tiny working set (no memory-bandwidth component).

Usage: python tools/hw_probe.py  -> one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def spin(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def measure(procs: int, n: int = 4_000_000, rounds: int = 3) -> float:
    t0 = time.time()
    with mp.Pool(procs) as p:
        p.map(spin, [n] * procs * rounds)
    return procs * rounds / (time.time() - t0)


def triad(args):
    import numpy as np

    n, = args
    a = np.ones(n, dtype=np.float64)
    b = np.ones(n, dtype=np.float64)
    t0 = time.time()
    for _ in range(10):
        b = a * 2.0 + b
    return 10 * 3 * 8 * n / (time.time() - t0)


def bandwidth(procs: int, n: int = 30_000_000) -> float:
    with mp.Pool(procs) as p:
        return sum(p.map(triad, [(n,)] * procs)) / 1e9


def main():
    out = {}
    for procs in (1, 2, 4, 8, 16, 32):
        out[procs] = round(measure(procs), 1)
    effs = {f"{a}->{b}": round(out[b] / (b // a * out[a]), 3)
            for a, b in [(1, 4), (2, 8), (4, 16), (8, 32)]}
    bw = {procs: round(bandwidth(procs), 1) for procs in (1, 4, 16)}
    print(json.dumps({
        "cpu_throughput_per_procs": out,
        "cpu_efficiency_4x": effs,
        "triad_bandwidth_gbps": bw,
        "bandwidth_headroom_4_to_16": round(bw[16] / bw[4], 2),
    }))


if __name__ == "__main__":
    main()
