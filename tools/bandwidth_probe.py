"""Memory-bandwidth scaling calibration for the 3/12-core scaling pair.

Measures the box's aggregate streaming-read bandwidth at P = 1, 3, 12
worker processes (numpy float64 sum over a private 256 MB array — pure
memory traffic, no Spark, no disk after the first touch) and reports the
3 -> 12 scaling ratio. This bounds what ANY memory-streaming job can
show for 3 -> 12 core scaling on this VM: if raw streaming itself scales
at s < 1, a job reading ~s at the same levels is at the instrument's
ceiling, not leaving scaling on the table. Companion evidence for the
round-8 efficiency-estimator note in BENCH/NOTES.md; run alone on an
otherwise idle box.

Usage: python tools/bandwidth_probe.py [reps]   (default 3)
Prints one JSON line; each rep's window carries its own steal reading.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (for the _WindowMonitor contention guard)

ARR_BYTES = 256 * 1024 * 1024
SECONDS = 2.0


def _worker(barrier, out, idx):
    a = np.ones(ARR_BYTES // 8, dtype=np.float64)
    float(a.sum())                      # touch every page before timing
    barrier.wait()
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < SECONDS:
        float(a.sum())
        n += 1
    out[idx] = n * ARR_BYTES / (time.perf_counter() - t0)


def aggregate_gbps(procs: int) -> float:
    barrier = mp.Barrier(procs)
    out = mp.Array("d", procs)
    ps = [mp.Process(target=_worker, args=(barrier, out, i))
          for i in range(procs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(out[:]) / 1e9


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    best: dict[int, float] = {}
    windows: list[dict] = []
    for _ in range(reps):
        for procs in (1, 3, 12):
            with bench._WindowMonitor(procs) as m:
                g = aggregate_gbps(procs)
            windows.append({"procs": procs, "gbps": round(g, 2), **m.stats})
            # interference only SUBTRACTS bandwidth: keep the max
            if g > best.get(procs, 0.0):
                best[procs] = g
    scaling_3_12 = (best[12] / best[3]) / 4.0
    print(json.dumps({
        "arr_mb_per_worker": ARR_BYTES // (1024 * 1024),
        "best_gbps": {str(k): round(v, 2) for k, v in best.items()},
        "scaling_1_3": round((best[3] / best[1]) / 3.0, 3),
        "scaling_3_12": round(scaling_3_12, 3),
        "windows": windows,
    }))


if __name__ == "__main__":
    main()
