"""Seed/extend the per-query clean-window pool (BENCH/query_history.jsonl)
for specific board queries — the standing attribution tool (VERDICT r6 #2:
a board row that drifts on byte-unchanged code gets more clean-window
samples, not a hand-run A/B; the bench board then reports the pooled
clean minimum automatically).

Usage:
    python tools/pool_queries.py map_match streaming_dedup --passes 4

Each pass is noop-sunk with its own contention window (bench's monitor);
every pass is appended to the pool with the same key (query source hash /
sf / cores) that bench.timed_queries uses, so the next bench run's board
record picks the pooled minimum up. Pass 1 of each query is a discarded
warm-up, exactly like the board protocol.

Replaces the round-scoped tools/attrib_r6.py (VERDICT r6 #7): the one
reusable piece of that script — full-cost timing of a query factory
under a contention window — is what this does, against the shared pool
instead of a one-off JSON line.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from trajlib_spark.session import get_spark, stop_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+", help="board query names")
    ap.add_argument("--passes", type=int, default=4,
                    help="timed passes per query (after 1 warm-up)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = sf_dir.rstrip("/").rsplit("/", 1)[-1]

    import __spark_entry__ as E

    qs = E.queries()
    unknown = [q for q in args.queries if q not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    # repo-root cwd so the pool lands in the repo's BENCH/
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    spark = get_spark(app_name="pool-queries", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    try:
        for name in args.queries:
            key = {"q": name, "src": bench._query_source_hash(name, qs[name]),
                   "sf": sf_name, "cores": args.cpus}
            recs = []
            for p in range(args.passes + 1):
                with bench._WindowMonitor(args.cpus) as mon:
                    t0 = time.time()
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite").save()
                    dt = time.time() - t0
                bench.log(f"  {name} pass {p}{' (warm-up)' if p == 0 else ''}: "
                          f"{dt:.3f}s {mon.stats}")
                if p > 0:
                    recs.append({"sec": round(dt, 3),
                                 "clean": not mon.contended,
                                 "win": mon.stats})
                spark.catalog.clearCache()
            bench._append_history(
                "query_history.jsonl", recs,
                {**key, "at": time.strftime("%Y-%m-%d %H:%M:%S")},
            )
            hist = bench._load_clean_history("query_history.jsonl", key)
            pooled = min((r["sec"] for r in hist), default=None)
            bench.log(f"{name}: pooled clean minimum now {pooled}s over "
                      f"{len(hist)} windows")
    finally:
        stop_spark(spark)


if __name__ == "__main__":
    main()
