"""The sf10 map-match probe input (bench._sf10_rep_points) must keep
every one of its 100 shifted copies fully matchable — the probe's
117k-points/s claim assumes each copy drives full-size candidate-join +
Viterbi work, which fails silently if the offset lattice pushes copies
outside road-grid coverage (points with no edge-cell candidates drop out
of the match, and the probe would "speed up" by doing less work). Pinned
here at 2 trajectories × 100 copies through the real cells → candidate
join → Viterbi plan."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from bench import G  # noqa: E402
from trajlib_spark.operators import cells, map_match as mm_ops  # noqa: E402
from trajlib_spark.sources import roads, synth  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_rep_points_all_copies_match(spark, monkeypatch):
    pts = synth.synthetic_points(spark, SF)
    keep = pts.select("traj_id").distinct().orderBy("traj_id").limit(2)
    small = pts.join(F.broadcast(keep), "traj_id")
    n_small = small.count()
    assert n_small > 0

    # route the probe helper onto the 2-trajectory subset: the helper's
    # only data dependency is synth.synthetic_points(spark, sf_dir)
    monkeypatch.setattr(bench.synth, "synthetic_points",
                        lambda s, d: small)
    rep = bench._sf10_rep_points(spark, "ignored")

    assert rep.count() == 100 * n_small
    assert rep.select("traj_id").distinct().count() == 2 * 100

    _, edge_nodes, _ = roads.road_grid_arrays(G)
    edges = roads.road_edges(spark, G)
    matched = mm_ops.match_trajectories(
        cells.with_cell(rep, G), edges, G, edge_nodes
    )
    # EVERY replicated point must survive the candidate join + Viterbi:
    # a copy shifted out of road coverage would silently shrink this
    assert matched.count() == 100 * n_small
