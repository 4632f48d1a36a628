"""Extend the full-box flagship's clean-attempt pool (VERDICT r7 #5).

Runs extra local[32] flagship attempts with the exact board protocol —
measure_level(cpus, ..., runs=2), minimum of the two passes, the
attempt's own contention window — and appends each to
BENCH/pair_history.jsonl under the same kind=full key bench.main()
uses, so the next bench run's headline row picks up the deeper pool.
Clean attempts only improve the pooled clean minimum; contended ones
are retained with their windows (never become the record).

Usage: python tools/pool_fullbox.py [attempts]   (default 3)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    n_pages = bench.pages_for_sf(sf_dir)
    full_key = {"kind": "full", "source_hash": bench._flagship_source_hash(),
                "sf": sf_dir.rstrip("/").rsplit("/", 1)[-1],
                "pages": n_pages, "cores": cpus}
    for i in range(attempts):
        t_a, w_a = bench.measure_level(cpus, sf_dir, n_pages, 2)
        rec = {"t": round(min(t_a), 3), "win": w_a,
               "clean": not w_a["contended"]}
        bench._append_history(
            "pair_history.jsonl", [rec],
            {**full_key, "at": time.strftime("%Y-%m-%d %H:%M:%S")},
        )
        pool = bench._load_clean_history("pair_history.jsonl", full_key)
        print(f"attempt {i}: t={rec['t']}s clean={rec['clean']} win={w_a} "
              f"| clean pool {len(pool)}"
              + (f", pooled min {min(r['t'] for r in pool)}s" if pool else ""),
              flush=True)


if __name__ == "__main__":
    main()
