"""Bench contention-guard plumbing (no Spark): the window monitor must
produce the documented stats shape and thresholds, and the clean-pair
history pool must filter on key + cleanliness and bound its window."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_window_monitor_stats_shape():
    with bench._WindowMonitor(4) as m:
        time.sleep(0.6)
    s = m.stats
    assert set(s) == {"steal_pct", "load1_max", "contended"}
    assert s["steal_pct"] >= 0.0
    assert s["load1_max"] >= 0.0
    # an idle sleep on a quiet box must not read as contended unless the
    # box genuinely is (steal threshold is absolute, loadavg vs 4+8)
    assert s["contended"] in (True, False)


def test_window_monitor_contended_thresholds(monkeypatch):
    # forced steal: fake /proc/stat deltas via _cpu_sample
    seq = iter([(0, 1000), (100, 2000)])  # 10% steal over the window
    monkeypatch.setattr(bench, "_cpu_sample", lambda: next(seq))
    with bench._WindowMonitor(4) as m:
        pass
    assert m.stats["steal_pct"] == 10.0
    assert m.contended


def test_pair_history_pool_filter_and_bound(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    key = {"source_hash": "abc", "sf": "sf0.1", "pages": 10,
           "cores_small": 3, "cores_big": 12}
    other = {**key, "source_hash": "zzz"}
    recs = [
        {"t3": 40.0 + i, "t12": 10.0, "eff": 1.0, "clean": i % 2 == 0}
        for i in range(30)
    ]
    bench._append_pair_history(recs, key)
    bench._append_pair_history([{"t3": 1.0, "t12": 1.0, "clean": True}], other)
    hist = bench._load_pair_history(key)
    assert len(hist) == 12                      # bounded window
    assert all(r["clean"] for r in hist)        # clean only
    assert all(r["source_hash"] == "abc" for r in hist)  # keyed
    # corrupt line is skipped, not fatal
    with open(os.path.join("BENCH", "pair_history.jsonl"), "a") as f:
        f.write("not json\n")
    assert len(bench._load_pair_history(key)) == 12
    # a different key (code change) starts an empty pool
    assert bench._load_pair_history({**key, "source_hash": "new"}) == []
