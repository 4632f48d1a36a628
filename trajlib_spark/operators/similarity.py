"""Pairwise trajectory similarity as a pair-table join + Arrow-batched DP
kernels — the scalable replacement for the reference's dense N² matrix with
a multiprocessing pool (/root/reference/fedtraj/utils/
preprocessing_porto.py:269-322).

Plan shape:
- build the (i, j) pair table with ``a.id < b.id`` (upper triangle only,
  the reference's halving trick as a join condition);
- attach both polylines (two hash joins; at scale, block the pair space
  by a coarse cell prefix so only spatially-plausible pairs join);
- evaluate the kernel per Arrow batch via mapInPandas (never a dense
  matrix — the pair table is the output).

Normalization matches the reference: per-axis population-σ z-score over
ALL points of the dataset (preprocessing_porto.py:232-252 — numpy std is
population σ, hence stddev_pop) before LCSS/EDR with ε = 0.25
(/root/reference/fedtraj/config.py:75).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import LCSS_EDR_EPS
from ..kernels import dp_distances as dpk


def collect_polylines(
    points: DataFrame,
    traj: str = "traj_id",
    order: tuple[str, ...] = ("ts_ms", "point_id"),
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """(traj_id, xs array<double>, ys array<double>) — one shuffle; the
    sort happens inside the agg via sort_array over (order, coords) structs
    so no grouped-map UDF is needed."""
    skey = F.struct(*[F.col(c) for c in order], F.col(x).alias("_x"), F.col(y).alias("_y"))
    return (
        points.groupBy(traj)
        .agg(F.sort_array(F.collect_list(skey)).alias("_pts"))
        .select(
            traj,
            F.transform("_pts", lambda s: s["_x"]).alias("xs"),
            F.transform("_pts", lambda s: s["_y"]).alias("ys"),
        )
    )


def normalize_polylines(polys: DataFrame) -> DataFrame:
    """Global per-axis z-score with population σ over every point."""
    stats = (
        polys.select(F.explode("xs").alias("vx"))
        .agg(F.avg("vx").alias("mx"), F.stddev_pop("vx").alias("sx"))
        .collect()[0]
    )
    stats_y = (
        polys.select(F.explode("ys").alias("vy"))
        .agg(F.avg("vy").alias("my"), F.stddev_pop("vy").alias("sy"))
        .collect()[0]
    )
    mx, sx, my, sy = stats.mx, stats.sx, stats_y.my, stats_y.sy
    return polys.select(
        *[c for c in polys.columns if c not in ("xs", "ys")],
        F.transform("xs", lambda v: (v - F.lit(mx)) / F.lit(sx)).alias("xs"),
        F.transform("ys", lambda v: (v - F.lit(my)) / F.lit(sy)).alias("ys"),
    )


def pair_table(
    ids: DataFrame,
    id_col: str = "traj_id",
    block_col: str | None = None,
) -> DataFrame:
    """Upper-triangular (i, j) pairs; optionally blocked so only rows
    sharing ``block_col`` pair up (the federation / cell-block bound that
    keeps the pair count quadratic-in-shard instead of quadratic-in-N)."""
    a = ids.select(F.col(id_col).alias("i"), *( [F.col(block_col)] if block_col else [] ))
    b = ids.select(F.col(id_col).alias("j"), *( [F.col(block_col).alias("_bj")] if block_col else [] ))
    if block_col:
        joined = a.join(b, F.col(block_col) == F.col("_bj")).drop("_bj")
    else:
        joined = a.crossJoin(b)
    return joined.where(F.col("i") < F.col("j"))


_KERNELS: dict[str, Callable] = {
    "edwp": lambda t1, t2, eps: dpk.edwp_distance_vec(t1, t2),
    "lcss": lambda t1, t2, eps: dpk.lcss_distance_vec(t1, t2, eps),
    "edr": lambda t1, t2, eps: dpk.edr_distance_vec(t1, t2, eps),
    "frechet": lambda t1, t2, eps: dpk.discrete_frechet(t1, t2),
    "hausdorff": lambda t1, t2, eps: dpk.hausdorff_distance(t1, t2),
}


def similarity_join(
    polys: DataFrame,
    measure: str,
    eps: float = LCSS_EDR_EPS,
    pairs: DataFrame | None = None,
    id_col: str = "traj_id",
    block_col: str | None = None,
) -> DataFrame:
    """→ (i, j, dist) for every pair. ``pairs`` overrides the generated
    upper-triangular pair table (e.g. a k-ring-bounded candidate set)."""
    if measure not in _KERNELS:
        raise ValueError(f"unknown measure {measure!r}; one of {sorted(_KERNELS)}")
    kern = _KERNELS[measure]
    if pairs is None:
        pairs = pair_table(polys.select(id_col, *( [block_col] if block_col else [] )),
                           id_col, block_col)
    left = polys.select(
        F.col(id_col).alias("i"), F.col("xs").alias("xs_i"), F.col("ys").alias("ys_i")
    )
    right = polys.select(
        F.col(id_col).alias("j"), F.col("xs").alias("xs_j"), F.col("ys").alias("ys_j")
    )
    joined = pairs.select("i", "j").join(left, "i").join(right, "j")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dists = np.empty(len(pdf))
            xi, yi = pdf["xs_i"].to_numpy(), pdf["ys_i"].to_numpy()
            xj, yj = pdf["xs_j"].to_numpy(), pdf["ys_j"].to_numpy()
            for r in range(len(pdf)):
                t1 = np.column_stack([xi[r], yi[r]])
                t2 = np.column_stack([xj[r], yj[r]])
                dists[r] = kern(t1, t2, eps)
            yield pd.DataFrame({"i": pdf["i"], "j": pdf["j"], "dist": dists})

    i_type = dict(joined.dtypes)["i"]
    return joined.mapInPandas(run, f"i {i_type}, j {i_type}, dist double")


def measure_topk(
    db_polys: DataFrame,
    query_polys: DataFrame,
    measure: str,
    k: int,
    eps: float = LCSS_EDR_EPS,
    id_col: str = "traj_id",
) -> DataFrame:
    """kNN by a true trajectory measure (the reference's knn-by-EDwP/LCSS,
    /root/reference/fedtraj/model/trainer/fed_trainer.py:445-452):
    query × db pair table (query side broadcast — the reference caps
    queries at 1000 for the same reason), DP kernel per pair in Arrow
    batches, window top-k by (dist, neighbor). At scale, pre-filter the
    pair table with a k-ring cell-block join before the kernel."""
    from pyspark.sql import Window

    q = query_polys.select(
        F.col(id_col).alias("i"), F.col("xs").alias("xs_q"), F.col("ys").alias("ys_q")
    )
    db = db_polys.select(
        F.col(id_col).alias("j"), F.col("xs").alias("xs_d"), F.col("ys").alias("ys_d")
    )
    joined = F.broadcast(q).crossJoin(db).where(F.col("i") != F.col("j"))
    kern = _KERNELS[measure]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dists = np.empty(len(pdf))
            for r in range(len(pdf)):
                t1 = np.column_stack([pdf["xs_q"].iat[r], pdf["ys_q"].iat[r]])
                t2 = np.column_stack([pdf["xs_d"].iat[r], pdf["ys_d"].iat[r]])
                dists[r] = kern(t1, t2, eps)
            yield pd.DataFrame(
                {"query_id": pdf["i"], "neighbor_id": pdf["j"], "dist": dists}
            )

    i_type = dict(joined.dtypes)["i"]
    scored = joined.mapInPandas(
        run, f"query_id {i_type}, neighbor_id {i_type}, dist double"
    )
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def symmetrize_normalize(dists: DataFrame) -> DataFrame:
    """(S + Sᵀ) / max — union the mirrored pairs and scale by the global
    max distance (/root/reference/fedtraj/model/trainer/
    simi_trainer.py:197-200; max over splits preprocessing_porto.py:219-221)."""
    both = dists.unionAll(
        dists.select(F.col("j").alias("i"), F.col("i").alias("j"), "dist")
    )
    mx = both.agg(F.max("dist")).collect()[0][0]
    return both.withColumn("dist", F.col("dist") / F.lit(float(mx)))


def rank_metric(dists_qd: DataFrame, query: str = "i", target_dist: str = "self_dist") -> DataFrame:
    """Mean rank of the true match per query: count of db distances ≤ the
    query's own-pair distance (/root/reference/fedtraj/model/trainer/
    fed_trainer.py:343-347)."""
    return dists_qd.groupBy(query).agg(
        F.sum(F.when(F.col("dist") <= F.col(target_dist), 1).otherwise(0)).alias("rank")
    )
