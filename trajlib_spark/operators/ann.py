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
    # norms are per-ROW quantities: compute them once per vector before the
    # pair join instead of once per PAIR inside it (the fold over the array
    # is the expensive part; values are bit-identical either way)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    pairs = F.broadcast(q).crossJoin(c)
    if exclude_self:
        pairs = pairs.where(F.col("neighbor_id") != F.col("query_id"))
    if metric == "cosine":
        score = _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
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


SAMPLE_HASH_MULT = 2654435761
SAMPLE_HASH_MOD = 999999937


def train_centroids(
    corpus: DataFrame,
    n_list: int = 64,
    sample: int = 4096,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 11,
) -> np.ndarray:
    """Lloyd's iterations on a driver-side sample (centroid training is a
    tiny fraction of corpus size; assignment stays distributed). The sample
    is DETERMINISTIC across runs and partitionings: rows ordered by a fixed
    multiplicative hash of the id (pure int64 arithmetic, reproducible
    outside Spark for oracle parity)."""
    rows = (
        corpus.select(F.col(vec_col), F.col(id_col))
        .orderBy(
            # reduce the id mod MOD BEFORE multiplying: pmod(id) < 1e9 keeps
            # the product < 2.7e18 < int64 max for ANY id, where id * MULT
            # overflows (ANSI ArithmeticException) past id ≈ 3.5e9
            # (ADVICE r2); identical ordering for id < MOD
            (F.pmod(F.col(id_col).cast("long"), F.lit(SAMPLE_HASH_MOD))
             * F.lit(SAMPLE_HASH_MULT)) % F.lit(SAMPLE_HASH_MOD),
            F.col(id_col),
        )
        .limit(sample)
        .collect()
    )
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


def nearest_lists_py(X: np.ndarray, centroids: np.ndarray, n: int) -> np.ndarray:
    """(rows, n) ids of the n highest-dot centroids per row — pure-numpy
    reduction (no BLAS threading nondeterminism; for dim ≤ 128 numpy's sum
    is a sequential fold, reproducible anywhere). Ties resolve to the
    lowest centroid id (stable argsort)."""
    sims = (X[:, None, :] * centroids[None, :, :]).sum(axis=2)
    if n == 1:
        return sims.argmax(axis=1)[:, None]
    return np.argsort(-sims, axis=1, kind="stable")[:, :n]


def _with_lists(
    df: DataFrame, centroids: np.ndarray, n: int, vec_col: str, out: str,
    chunk: int = 256,
) -> DataFrame:
    """Attach an array of the n nearest centroid ids via an Arrow-batched
    UDF over a broadcast numpy matrix — linear work per row, no
    O(n_list·dim) Catalyst expression (janino-safe at n_list ≥ 1024)."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids = []
            vecs = pdf[vec_col].to_numpy()
            for lo in range(0, len(pdf), chunk):
                part = np.stack(vecs[lo : lo + chunk]).astype(np.float64)
                ids.extend(nearest_lists_py(part, C, n).tolist())
            pdf = pdf.copy()
            pdf[out] = ids
            yield pdf

    fields = ", ".join(f"{name} {dtype}" for name, dtype in df.dtypes)
    return df.mapInPandas(run, f"{fields}, {out} array<int>")


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
    cross join against the full corpus. List assignment is an Arrow-batched
    argmax over the broadcast centroid matrix (scales to any n_list; the
    previous inline-literal expression broke codegen past ~100 lists)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    c = _with_lists(c, centroids, 1, "cv", "_lists").withColumn(
        "list_id", F.col("_lists")[0]
    ).drop("_lists")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    q = _with_lists(q, centroids, n_probe, "qv", "_lists").withColumn(
        "probe", F.explode("_lists")
    ).drop("_lists")
    cand = q.join(c, q["probe"] == c["list_id"])
    if exclude_self:
        cand = cand.where(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.withColumn(
        "cosine", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def recall_by_query(approx: DataFrame, exact: DataFrame, k: int) -> DataFrame:
    """(query_id, n_hit, recall) per query: |approx ∩ exact| within the
    top-k, over the exact neighbor count — the DataFrame-valued recall
    certification (recall_at_k collapses it to one scalar). Two bounded
    aggregates + one semi-join; no new scan of the corpus."""
    a = approx.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    e = exact.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    hits = (
        e.join(a, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    base = e.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        base.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact")).alias("recall"),
        )
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int) -> float:
    a = approx.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    e = exact.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    inter = a.join(e, ["query_id", "neighbor_id"]).count()
    denom = e.count()
    return inter / denom if denom else 0.0
