"""Federated segment clustering: per-shard DBSCAN (grouped pandas UDF over
the shard's pair matrix — shards are small by construction, which is the
federation semantics), DataFrame cluster aggregates, and the driver-side
greedy centroid merge.

Reference: /root/reference/clustering.py —
- local_clustering (:98-122): DBSCAN(eps=1000, min_samples=2,
  metric='precomputed') over d = d1 + d2 + d3;
- centroid = mean of segment midpoints (:28-39), radius = max midpoint
  distance (:41-50);
- federated_cluster_aggregation (:125-144): all centroid pairs sorted by
  distance ascending (stable), greedily merge disjoint pairs with d < 3.0,
  single pass;
- silhouette over the merged labeling (:202-220).

Scale: DBSCAN is quadratic per shard — exactly like the reference, whose
federation bound is the contract. Cross-shard work is only the centroid
list (#clusters rows), which is collected to the driver like the
reference's aggregation step.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import (
    DBSCAN_EPS,
    DBSCAN_MIN_SAMPLES,
    DIST_ALPHA,
    DIST_BETA,
    DIST_GAMMA,
    FED_MERGE_EPS,
)
from ..kernels import clustering as ck


def cluster_segments(
    segments: DataFrame,
    eps: float = DBSCAN_EPS,
    min_samples: int = DBSCAN_MIN_SAMPLES,
    alpha: float = DIST_ALPHA,
    beta: float = DIST_BETA,
    gamma: float = DIST_GAMMA,
    fed: str = "fed_id",
) -> DataFrame:
    """segments: (fed_id, segment_id, start_x, start_y, end_x, end_y,
    emb array<double>) → (fed_id, segment_id, label); label -1 = noise.
    Segment order inside a shard = ascending segment_id (the reference
    enumerates its per-federation DataFrame in row order)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("segment_id", kind="mergesort")
        starts = pdf[["start_x", "start_y"]].to_numpy()
        ends = pdf[["end_x", "end_y"]].to_numpy()
        embs = np.stack(pdf["emb"].to_numpy()) if len(pdf) else np.zeros((0, 0))
        dist = ck.segment_distance_matrix(starts, ends, embs, alpha, beta, gamma)
        labels = ck.dbscan_precomputed(dist, eps, min_samples)
        return pd.DataFrame(
            {
                "fed_id": pdf[fed].to_numpy(),
                "segment_id": pdf["segment_id"].to_numpy(),
                "label": labels,
            }
        )

    return segments.groupBy(fed).applyInPandas(
        run, "fed_id int, segment_id long, label long"
    )


def cluster_aggregates(labeled: DataFrame, segments: DataFrame) -> DataFrame:
    """Per (fed_id, label ≠ -1): size, centroid (mean of midpoints), radius
    (max midpoint→centroid distance) — two-phase aggregation, all Catalyst."""
    segs = segments.select(
        "fed_id", "segment_id",
        ((F.col("start_x") + F.col("end_x")) / 2).alias("mid_x"),
        ((F.col("start_y") + F.col("end_y")) / 2).alias("mid_y"),
    )
    j = labeled.where(F.col("label") != -1).join(segs, ["fed_id", "segment_id"])
    cent = j.groupBy("fed_id", "label").agg(
        F.count(F.lit(1)).alias("size"),
        F.avg("mid_x").alias("centroid_x"),
        F.avg("mid_y").alias("centroid_y"),
    )
    back = j.join(cent, ["fed_id", "label"])
    rad = back.groupBy("fed_id", "label").agg(
        F.max(
            F.sqrt(
                F.pow(F.col("mid_x") - F.col("centroid_x"), F.lit(2.0))
                + F.pow(F.col("mid_y") - F.col("centroid_y"), F.lit(2.0))
            )
        ).alias("radius")
    )
    return cent.join(rad, ["fed_id", "label"])


def federated_merge(
    cluster_agg: DataFrame, eps: float = FED_MERGE_EPS
) -> DataFrame:
    """Greedy disjoint merge of the per-shard clusters by centroid distance
    (driver-side — cluster count ≪ N, like the reference). Returns
    (fed_id, label, global_cluster) where global_cluster indexes the merged
    clustering in the reference's final list order."""
    rows = cluster_agg.orderBy("fed_id", "label").collect()
    centroids = [(r.centroid_x, r.centroid_y) for r in rows]
    groups = ck.greedy_merge(centroids, eps)
    spark = cluster_agg.sparkSession
    out = []
    for gid, members in enumerate(groups):
        for m in members:
            out.append((int(rows[m].fed_id), int(rows[m].label), gid))
    return spark.createDataFrame(out, "fed_id int, label long, global_cluster int")


def silhouette_distributed(
    labeled_segments: DataFrame,
    pair_dists: DataFrame,
    id_col: str = "segment_id",
    label_col: str = "global_cluster",
) -> float:
    """Mean silhouette over a symmetric (i, j, dist) pair table + labels —
    two groupBys, no dense matrix."""
    lab = labeled_segments.select(F.col(id_col).alias("i"), F.col(label_col).alias("li"))
    lab_j = labeled_segments.select(F.col(id_col).alias("j"), F.col(label_col).alias("lj"))
    d = pair_dists.join(lab, "i").join(lab_j, "j")
    per = d.groupBy("i", "li", "lj").agg(
        F.sum("dist").alias("sd"), F.count(F.lit(1)).alias("n")
    )
    a = per.where(F.col("li") == F.col("lj")).select(
        "i", (F.col("sd") / F.col("n")).alias("a")  # n = cluster size - 1 (no self pair)
    )
    b = (
        per.where(F.col("li") != F.col("lj"))
        .select("i", (F.col("sd") / F.col("n")).alias("ab"))
        .groupBy("i")
        .agg(F.min("ab").alias("b"))
    )
    s = a.join(b, "i").select(
        ((F.col("b") - F.col("a")) / F.greatest("a", "b")).alias("s")
    )
    # singleton clusters have no 'a' row → they contribute 0, like sklearn
    n_total = labeled_segments.count()
    ssum = s.agg(F.sum("s")).collect()[0][0] or 0.0
    return float(ssum) / n_total if n_total else 0.0
