"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: exact brute-force cosine top-k — the correctness
  baseline. Dot products via zip_with/aggregate stay JVM-side; the
  quadratic join is bounded by the query set size (queries × corpus),
  which Catalyst executes as a broadcast of the (small) query side.
- ``ivf_topk``: the scale path — k-means-style inverted-file partitioning
  (centroids trained on a sample at the driver, assignments and probing
  fully distributed). Probing n_probe nearest centroids bounds the scanned
  fraction to ~n_probe/n_list of the corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _l1(a: Column, b: Column) -> Column:
    """Manhattan distance — the reference's torch.cdist(…, p=1) embedding
    metric (/root/reference/fedtraj/model/trainer/fed_trainer.py:344)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _l2sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    metric: str = "cosine",
) -> DataFrame:
    """→ (query_id, neighbor_id, rank, cosine); rank by (score, neighbor_id)
    for a deterministic total order. metric ∈ {cosine, l2, l1} — l1 is the
    reference's embedding-distance-matrix metric (cdist p=1)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = F.broadcast(q).crossJoin(c)
    if exclude_self:
        pairs = pairs.where(F.col("neighbor_id") != F.col("query_id"))
    if metric == "cosine":
        score = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
        order = [F.desc("cosine"), F.asc("neighbor_id")]
    elif metric == "l2":
        score = F.sqrt(_l2sq(F.col("qv"), F.col("cv")))
        order = [F.asc("cosine"), F.asc("neighbor_id")]
    elif metric == "l1":
        score = _l1(F.col("qv"), F.col("cv"))
        order = [F.asc("cosine"), F.asc("neighbor_id")]
    else:
        raise ValueError("metric must be cosine | l2 | l1")
    scored = pairs.withColumn("cosine", score)
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def train_centroids(
    corpus: DataFrame,
    n_list: int = 64,
    sample: int = 4096,
    iters: int = 8,
    vec_col: str = "embedding",
    seed: int = 11,
) -> np.ndarray:
    """Lloyd's iterations on a driver-side sample (centroid training is a
    tiny fraction of corpus size; assignment stays distributed)."""
    rows = corpus.select(vec_col).limit(sample).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), min(n_list, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ cent.T
        assign = sims.argmax(axis=1)
        for ci in range(len(cent)):
            m = assign == ci
            if m.any():
                v = X[m].mean(axis=0)
                cent[ci] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def _best_centroids(vec: Column, centroids: np.ndarray, n: int) -> Column:
    """Array of the n nearest centroid ids (by dot with the normalized
    centroid — equivalent to cosine ranking for fixed query)."""
    sims = F.array(*[
        F.struct(
            _dot(vec, F.array(*[F.lit(float(v)) for v in c])).alias("sim"),
            F.lit(i).alias("cid"),
        )
        for i, c in enumerate(centroids)
    ])
    top = F.slice(F.reverse(F.array_sort(sims)), 1, n)
    return F.transform(top, lambda s: s["cid"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    list; queries probe their n_probe nearest lists; exact cosine + window
    top-k inside the probed union. Equi-join on list id — hash join, no
    cross join against the full corpus."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    c = c.withColumn("list_id", _best_centroids(F.col("cv"), centroids, 1)[0])
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q = q.withColumn("probe", F.explode(_best_centroids(F.col("qv"), centroids, n_probe)))
    cand = q.join(c, q["probe"] == c["list_id"])
    if exclude_self:
        cand = cand.where(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.withColumn(
        "cosine", _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> float:
    a = approx.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    e = exact.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    inter = a.join(e, ["query_id", "neighbor_id"]).count()
    denom = e.count()
    return inter / denom if denom else 0.0
