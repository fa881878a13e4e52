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


def main():
    out = {}
    for procs in (1, 2, 4, 8, 16, 32):
        out[procs] = round(measure(procs), 1)
    effs = {f"{a}->{b}": round(out[b] / (b // a * out[a]), 3)
            for a, b in [(1, 4), (2, 8), (4, 16), (8, 32)]}
    print(json.dumps({"throughput_per_procs": out, "efficiency_4x": effs}))


if __name__ == "__main__":
    main()
