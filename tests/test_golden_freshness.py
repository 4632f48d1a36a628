"""Guard: the committed golden-oracle parquet must equal what
tools/gen_golden.py regenerates today — catches any drift between an
operator's semantics and its committed oracle (the failure mode where a
code change silently invalidates the driver gate). Spot-checks a
representative subset at sf0.001 (cheap); `python tools/gen_golden.py`
regenerates everything if this fails intentionally."""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF = "/root/testdata/sf0.001"
GOLD = os.path.join(os.path.dirname(__file__), "golden", "oracle", "sf0.001")

# pages_points / polygon_adjacency / porto_* left round 3, simhash round 4:
# they now have LIVE DuckDB SQL oracles instead of committed goldens
CASES = [
    "segment_cut", "similarity_all", "minhash_lsh", "video_frames",
    "ann_ivf", "ann_ivf_recall", "measure_topk_lcss", "media_all",
    "embedding_near_dups", "newsimi_augment", "cluster_merge",
]


@pytest.mark.parametrize("name", CASES)
def test_committed_golden_is_fresh(name):
    import gen_golden as G

    fresh = G.GENERATORS[name](SF).reset_index(drop=True)
    committed = pd.read_parquet(os.path.join(GOLD, f"{name}.parquet"))
    a = fresh.sort_values(list(fresh.columns)).reset_index(drop=True)
    b = committed.sort_values(list(committed.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=True)
