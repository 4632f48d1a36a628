"""VERDICT r7 #6: does the saturated local[32] flagship PROVOKE steal
accounting on this VM (the sf10-minhash class), or were r7's contended
full-box windows genuine co-tenant interference?

Design (mirrors the round-7 burn-sweep controls, BENCH/NOTES.md):
run N alternating cycles of [idle gap, flagship pass] on an otherwise
idle box, sampling steal% separately inside each phase. Verdict:
  - provoked: steal elevated DURING passes, ~0 in adjacent idle gaps,
    wall times agreeing within ~10% (invariance) -> the full-box row
    qualifies for the reproducible-min attribution.
  - genuine contention: steal uncorrelated with pass boundaries or
    wall time monotone in steal -> retry-until-clean policy suffices.
Run AFTER bench.py finishes (needs the box to itself).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from bench import (  # noqa: E402
    _idle_probe, get_spark, pages_for_sf, prepare_pages,
    run_pipeline_once, stop_spark, _WindowMonitor,
)

SF_DIR = "/root/testdata/sf0.1"
CYCLES = 6
GAP_S = 12


def main() -> None:
    n_pages = pages_for_sf(SF_DIR)
    spark = get_spark(app_name="adjudicate-fullbox", master="local[32]",
                      shuffle_partitions=32)
    pages_path = prepare_pages(spark, n_pages)
    # warm-up outside all windows (JIT + python workers + page cache)
    run_pipeline_once(spark, SF_DIR, pages_path, n_pages)
    out = {"cycles": []}
    for i in range(CYCLES):
        with _WindowMonitor(32) as idle_mon:
            time.sleep(GAP_S)
        with _WindowMonitor(32) as run_mon:
            t = run_pipeline_once(spark, SF_DIR, pages_path, n_pages)
        out["cycles"].append({
            "idle_win": idle_mon.stats, "t": round(t, 3),
            "run_win": run_mon.stats,
        })
        c = out["cycles"][-1]
        print(f"cycle {i}: idle_steal={c['idle_win']['steal_pct']} "
              f"t={c['t']} run_steal={c['run_win']['steal_pct']} "
              f"run_contended={c['run_win']['contended']}", flush=True)
    stop_spark(spark)
    ts = [c["t"] for c in out["cycles"]]
    lo = min(ts)
    out["t_min"] = lo
    out["t_spread_pct"] = round(100.0 * (max(ts) - lo) / lo, 2)
    out["idle_steals"] = [c["idle_win"]["steal_pct"] for c in out["cycles"]]
    out["run_steals"] = [c["run_win"]["steal_pct"] for c in out["cycles"]]
    out["idle_probe_after"] = _idle_probe()
    print(json.dumps(out))
    with open("/tmp/adjudicate_fullbox.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
