"""Exact kNN join via k-ring cell expansion with a distance-bounded
guarantee and a brute-force fallback for under-filled queries.

Plan (survey §4.2 / north-rule "kNN via H3 k-ring expansion with a
distance-bounded refine pass"):

1. Queries fan out to every cell in their Chebyshev-radius-R window
   (two explode(sequence(...)) — linear codegen, no giant case trees).
2. Equi-join candidates on cell_id (hash join; AQE skew-join splits hot
   cells), compute squared distance, keep top-k per query by
   (dist², neighbor_id) — deterministic total order.
3. **Exactness guarantee**: any point outside the R-window is at least
   R·unit meters away, so a query whose kth candidate lies within R·unit
   is provably exact. The (rare) remainder is re-resolved by brute force
   and unioned back.

Top-k semantics mirror the reference's bounded min-heap kNN
(/root/reference/fedtraj/model/trainer/fed_trainer.py:437-443); the k-ring
primitive generalizes neighbour_cellids
(/root/reference/fedtraj/utils/cellspace.py:55-67).

Scale: candidate volume ≈ queries × (2R+1)² × density-per-cell. R is chosen
from the measured density so the expected candidate count per query is a
small multiple of k. The fallback cross-join is bounded by the tail of the
density distribution; its row count is observable via the returned plan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import GridConfig
from . import cells


def pick_ring_radius(n_points: int, grid: GridConfig, k: int, safety: float = 1.6) -> int:
    """Radius R (in cells) such that the expected k-th neighbor falls inside
    the window: solve π r² λ = k for r with λ = points per m², inflate by
    ``safety``, convert to cells."""
    area = (grid.x_max - grid.x_min) * (grid.y_max - grid.y_min)
    lam = max(n_points, 1) / area
    r_m = math.sqrt((k + 1) / (math.pi * lam)) * safety
    r_cells = int(math.ceil(r_m / min(grid.x_unit, grid.y_unit)))
    return max(1, min(r_cells, 24))


def _topk(cand: DataFrame, k: int, query_id: str) -> DataFrame:
    w = Window.partitionBy(query_id).orderBy("dist_sq", "neighbor_id")
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    grid: GridConfig,
    k: int,
    ring: int | None = None,
    exclude_self: bool = True,
    id_col: str = "point_id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """→ (query_id, neighbor_id, rank, dist_sq). Exact under the R-window
    guarantee; under-filled queries fall back to brute force."""
    if ring is None:
        ring = pick_ring_radius(points.count(), grid, k)

    pts = points.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(x).alias("nx"),
        F.col(y).alias("ny"),
    )
    pts = pts.withColumns({
        "n_ix": cells.x_idx(F.col("nx"), F.col("ny"), grid),
        "n_iy": cells.y_idx(F.col("nx"), F.col("ny"), grid),
    }).withColumn("cell_id", cells.cell_id_from_idx(F.col("n_ix"), F.col("n_iy"), grid))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(x).alias("qx"),
        F.col(y).alias("qy"),
    )
    q = q.withColumns({
        "q_ix": cells.x_idx(F.col("qx"), F.col("qy"), grid),
        "q_iy": cells.y_idx(F.col("qx"), F.col("qy"), grid),
    })

    dist_sq = (F.col("nx") - F.col("qx")) ** 2 + (F.col("ny") - F.col("qy")) ** 2

    def ranked_for(queries_df: DataFrame, r: int) -> DataFrame:
        seq = F.sequence(F.lit(-r), F.lit(r))
        fan = (
            queries_df.withColumn("dx", F.explode(seq))
            .withColumn("dy", F.explode(seq))
            .withColumn("c_ix", F.col("q_ix") + F.col("dx"))
            .withColumn("c_iy", F.col("q_iy") + F.col("dy"))
            .where(
                (F.col("c_ix") >= 0)
                & (F.col("c_ix") < F.lit(grid.x_size))
                & (F.col("c_iy") >= 0)
                & (F.col("c_iy") < F.lit(grid.y_size))
            )
            .withColumn("cell_id", cells.cell_id_from_idx(F.col("c_ix"), F.col("c_iy"), grid))
            .select("query_id", "qx", "qy", "cell_id")
        )
        cand = fan.join(pts.select("neighbor_id", "nx", "ny", "cell_id"), "cell_id").withColumn(
            "dist_sq", dist_sq
        )
        if exclude_self:
            cand = cand.where(F.col("neighbor_id") != F.col("query_id"))
        # The big candidate join runs exactly once per round: top-k shrinks
        # it to queries × k rows, which are persisted, and both the
        # exactness check and the next round's query set derive from that
        # small table.
        return _topk(cand.select("query_id", "neighbor_id", "dist_sq"), k, "query_id").persist()

    # Iterative ring doubling (no cross join ever): start at the
    # density-derived R; queries whose exactness bound fails re-fan at 2R,
    # 4R, … until the window provably covers the whole grid, at which point
    # every candidate set is the full cell-joined corpus and the top-k is
    # exact by construction.
    cover = max(grid.x_size, grid.y_size)  # window ⊇ grid from any anchor
    remaining = q
    results = []
    r = ring
    while True:
        ranked = ranked_for(remaining, r)
        if r >= cover:
            results.append(ranked)
            break
        # Exactness: kth candidate within the guaranteed horizon — a window
        # over the already-ranked rows, no self-join. Any point outside the
        # R-window is > R·min_unit away.
        horizon_sq = float(r * min(grid.x_unit, grid.y_unit)) ** 2
        wq = Window.partitionBy("query_id")
        flagged = ranked.withColumns({
            "_found": F.count(F.lit(1)).over(wq),
            "_kth": F.max("dist_sq").over(wq),
        })
        # strict <: a point just outside the R-window can sit at exactly
        # R·min_unit, tie the kth distance, and win the (dist, id)
        # tiebreak — a tie is not provably exact (ADVICE r2; same rule as
        # measure_topk's certificate)
        exact = flagged.where(
            (F.col("_found") == k) & (F.col("_kth") < F.lit(horizon_sq))
        ).drop("_found", "_kth")
        results.append(exact)
        exact_ids = exact.select("query_id").distinct()
        remaining = remaining.join(F.broadcast(exact_ids), "query_id", "left_anti")
        if remaining.isEmpty():
            break
        r = min(2 * r, cover)

    out = results[0]
    for part in results[1:]:
        out = out.unionAll(part)
    return out


def hit_ratio(pred_topk: DataFrame, true_topk: DataFrame, k: int) -> float:
    """|topk(pred) ∩ topk(true)| / (k · #queries) — the reference's
    hitting_ratio (/root/reference/fedtraj/model/trainer/simi_trainer.py:565-593)."""
    p = pred_topk.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    t = true_topk.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    inter = p.join(t, ["query_id", "neighbor_id"]).count()
    n_q = t.select("query_id").distinct().count()
    return inter / (k * n_q) if n_q else 0.0
