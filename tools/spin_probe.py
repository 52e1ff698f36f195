"""Width-swept CPU spin probe — the scaling-capture forensics tool.

Measures pure-Python scalar throughput (5M-iteration arithmetic loop) solo
and at parallel widths, and reports the busy/solo PER-CORE throughput ratio
at each width. On a healthy host the ratio stays near 1.0 up to the core
count; the sandbox's documented failure mode (BENCH §R4.0) is a
hypervisor-starved wide geometry: guest idle, low steal, yet ratio 0.5-0.7
at width 32 (quiet windows probe 0.95+). Run before/after a scaling
capture to attribute a bad pair to the window rather than the engine.

    python tools/spin_probe.py [widths ...]     # default: 2 8 32

Prints one JSON line {solo_sec, widths: {W: {per_core_ratio, wall}}}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

N = 5_000_000


def _spin(_=None) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(N):
        x += i & 7
    return time.perf_counter() - t0


def main() -> None:
    widths = [int(w) for w in sys.argv[1:]] or [2, 8, 32]
    solo = min(_spin() for _ in range(3))
    out = {"solo_sec": round(solo, 3), "widths": {}}
    for w in widths:
        with mp.Pool(w) as pool:
            t0 = time.perf_counter()
            times = pool.map(_spin, range(w))
            wall = time.perf_counter() - t0
        # mean per-process loop time vs solo: 1.0 = every lane ran at
        # solo speed; <1 = lanes were descheduled/starved
        ratio = solo / (sum(times) / len(times))
        out["widths"][str(w)] = {
            "per_core_ratio": round(ratio, 3),
            "wall": round(wall, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
