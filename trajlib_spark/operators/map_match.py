"""HMM map matching, Spark-first (SURVEY §2.13; reference:
/root/reference/trajlib/data_processing/utils/map_match.py:176-213 runs
leuvenmapmatching's DistanceMatcher per trajectory and rebuilds edge
connectivity with an O(n²) python loop :143-173).

Plan shape:
- candidate generation is a CELL EQUI-JOIN: every edge registers the grid
  cells its max_dist-halo'd MBR covers (edges ≪ points; the halo fans the
  small side), points join on their cell id, and the exact point-to-
  segment distance is pure Catalyst arithmetic — no pair explosion, no UDF;
- the Viterbi recurrence is inherently sequential per trajectory → one
  grouped Arrow batch per trajectory (applyInPandas), with the edge
  topology broadcast as numpy arrays;
- edge connectivity (the reference's quadratic loop) is a self-join of the
  matched-state set on node id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import GridConfig
from ..kernels import viterbi as vk


def _bounded_idx(v, v_min: float, v_max: float, unit: float, size: int):
    clamped = F.greatest(F.lit(v_min), F.least(F.lit(v_max), v))
    idx = F.floor(F.floor(clamped - F.lit(v_min)) / F.lit(unit)).cast("long")
    return F.least(F.lit(size - 1), F.greatest(F.lit(0), idx))


def edge_covering_cells(
    edges: DataFrame, grid: GridConfig, halo_m: float = vk.MAX_DIST_M
) -> DataFrame:
    """(edge_id, cell_id): cells of each edge's MBR grown by the candidate
    radius — a point within halo_m of the edge always shares a cell."""
    xlo = F.least("x1", "x2") - F.lit(halo_m)
    xhi = F.greatest("x1", "x2") + F.lit(halo_m)
    ylo = F.least("y1", "y2") - F.lit(halo_m)
    yhi = F.greatest("y1", "y2") + F.lit(halo_m)
    d = edges.select(
        "edge_id",
        _bounded_idx(xlo, grid.x_min, grid.x_max, grid.x_unit, grid.x_size).alias("ix_lo"),
        _bounded_idx(xhi, grid.x_min, grid.x_max, grid.x_unit, grid.x_size).alias("ix_hi"),
        _bounded_idx(ylo, grid.y_min, grid.y_max, grid.y_unit, grid.y_size).alias("iy_lo"),
        _bounded_idx(yhi, grid.y_min, grid.y_max, grid.y_unit, grid.y_size).alias("iy_hi"),
    )
    d = d.select(
        "edge_id", F.explode(F.sequence("ix_lo", "ix_hi")).alias("i_x"), "iy_lo", "iy_hi"
    ).select("edge_id", "i_x", F.explode(F.sequence("iy_lo", "iy_hi")).alias("i_y"))
    return d.select(
        "edge_id", (F.col("i_x") * F.lit(grid.y_size) + F.col("i_y")).cast("long").alias("cell_id")
    )


def candidate_edges(
    points_cells: DataFrame,
    edges: DataFrame,
    grid: GridConfig,
    max_dist: float = vk.MAX_DIST_M,
) -> DataFrame:
    """(traj_id, point_id, ts_ms, x, y, edge_id, dist) for every edge within
    max_dist of the point. points_cells must carry cell_id (cells.with_cell)."""
    cov = edge_covering_cells(edges, grid, max_dist)
    geom = edges.select("edge_id", "x1", "y1", "x2", "y2")
    cand = (
        points_cells.select("traj_id", "point_id", "ts_ms", "x", "y", "cell_id")
        .join(F.broadcast(cov), "cell_id")
        .join(F.broadcast(geom), "edge_id")
    )
    dx = F.col("x2") - F.col("x1")
    dy = F.col("y2") - F.col("y1")
    l2 = dx * dx + dy * dy
    t_raw = F.when(
        l2 > 0, ((F.col("x") - F.col("x1")) * dx + (F.col("y") - F.col("y1")) * dy) / l2
    ).otherwise(F.lit(0.0))
    t = F.least(F.lit(1.0), F.greatest(F.lit(0.0), t_raw))
    ex = F.col("x1") + t * dx - F.col("x")
    ey = F.col("y1") + t * dy - F.col("y")
    dist = F.sqrt(ex * ex + ey * ey)
    return (
        cand.withColumn("dist", dist)
        .where(F.col("dist") <= F.lit(max_dist))
        .select("traj_id", "point_id", "ts_ms", "x", "y", "edge_id", "dist")
    )


def match_trajectories(
    points_cells: DataFrame,
    edges: DataFrame,
    grid: GridConfig,
    edge_nodes: np.ndarray,
    max_dist: float = vk.MAX_DIST_M,
    obs_noise: float = vk.OBS_NOISE_M,
) -> DataFrame:
    """→ (traj_id, point_id, edge_id) matched edge per point (−1 where no
    edge is within max_dist). edge_nodes is the broadcast [n_edges, 2]
    topology array (roads.road_grid_arrays)."""
    cand = candidate_edges(points_cells, edges, grid, max_dist)
    # every point must reach the kernel, including candidate-less ones
    # (they reset the chain): left-join candidates back onto the points
    base = points_cells.select("traj_id", "point_id", "ts_ms", "x", "y")
    full = base.join(cand.select("traj_id", "point_id", "edge_id", "dist"),
                     ["traj_id", "point_id"], "left")

    topo = edge_nodes  # captured → serialized once per executor

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["ts_ms", "point_id", "edge_id"], kind="mergesort"
        )
        pts, ce, cd = [], [], []
        grouped = {
            pid: g for pid, g in pdf.groupby("point_id", sort=False)
        }
        order = pdf[["ts_ms", "point_id"]].drop_duplicates().sort_values(
            ["ts_ms", "point_id"], kind="mergesort"
        )["point_id"].to_numpy()
        for pid in order:
            g = grouped[pid]
            m = g["edge_id"].notna()
            pts.append((g["x"].iat[0], g["y"].iat[0]))
            ce.append(g.loc[m, "edge_id"].to_numpy(dtype=np.int64))
            cd.append(g.loc[m, "dist"].to_numpy(dtype=np.float64))
        matched = vk.viterbi_match(
            np.asarray(pts), ce, cd, topo, obs_noise=obs_noise
        )
        return pd.DataFrame(
            {
                "traj_id": pdf["traj_id"].iat[0],
                "point_id": order.astype(np.int64),
                "edge_id": matched,
            }
        )

    return full.groupBy("traj_id").applyInPandas(
        run, "traj_id long, point_id long, edge_id long"
    )


def matched_edge_connections(matched: DataFrame, edges: DataFrame) -> DataFrame:
    """Connectivity among the DISTINCT matched edges: (edge_a, edge_b)
    where a's end node is b's start node — the reference's O(n²) loop
    (map_match.py:163-173) as a node-id self-join."""
    used = (
        matched.where(F.col("edge_id") >= 0)
        .select("edge_id").distinct()
        .join(F.broadcast(edges.select("edge_id", "from_node", "to_node")), "edge_id")
    )
    a = used.select(F.col("edge_id").alias("edge_a"), F.col("to_node").alias("node"))
    b = used.select(F.col("edge_id").alias("edge_b"), F.col("from_node").alias("node"))
    return (
        a.join(b, "node")
        .where(F.col("edge_a") != F.col("edge_b"))
        .select("edge_a", "edge_b")
    )
