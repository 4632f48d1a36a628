"""Deduplication operators for the training-data pipeline: exact,
MinHash+LSH, SimHash, n-gram Jaccard verification, and embedding-cosine
near-dup. Designed for the 100 TB shape: every method reduces to
hash → groupBy/join on small keys; no all-pairs stage ever runs on the full
corpus — candidates come from banded buckets, and only candidates get the
exact verification kernel.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- exact dedup -------------------------------------------------------------

def exact_duplicates(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_hash, keeper, n_dups): md5 groups; keeper = min id."""
    return (
        docs.select(F.md5(F.col(text)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("n_dups"))
    )


# --- shingling + MinHash ------------------------------------------------------

def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Multiply-shift style mixing family on Z_2^64: x → a·x + b with odd a
    (wrapping uint64) is a bijection, so per-row minima estimate Jaccard
    like the classic (a·x + b) mod p family — but the whole signature
    matrix vectorizes as one numpy broadcast instead of object-dtype
    big-int modmuls."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def _stable_shingles(text: str, k: int) -> np.ndarray:
    """Hashes of all k-byte shingle windows with a process-stable FNV-1a
    (python hash() of str is salted per process — useless across
    executors)."""
    s = text.lower().encode("utf-8", "ignore")
    if len(s) < k:
        s = s + b" " * (k - len(s))
    arr = np.frombuffer(s, dtype=np.uint8).astype(np.uint64)
    # FNV-1a over each k-byte window, vectorized across windows
    n = len(arr) - k + 1
    h = np.full(n, np.uint64(1469598103934665603), dtype=np.uint64)
    prime = np.uint64(1099511628211)
    for off in range(k):
        h = (h ^ arr[off : off + n]) * prime
    return np.unique(h)


def minhash_signatures(
    docs: DataFrame,
    num_perm: int = 64,
    shingle_k: int = 5,
    text: str = "text",
    id_col: str = "doc_id",
    seed: int = 1,
) -> DataFrame:
    """(doc_id, sig array<long>) — multiply-shift row-wise min, vectorized
    ACROSS the whole Arrow batch: all docs' bytes are concatenated once,
    FNV-1a runs over every k-byte window in k passes, cross-document
    windows are masked to u64::MAX, and each permutation's per-doc minima
    come from one ``np.minimum.reduceat`` — no per-document Python loop or
    per-document (num_perm × n_shingles) allocation (that allocation
    dominated the sf0.1 bench at ~2 ms/doc)."""
    a, b = _minhash_params(num_perm, seed)
    u64max = np.uint64(0xFFFFFFFFFFFFFFFF)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        old = np.seterr(over="ignore")  # uint64 wrap is the point
        try:
            for pdf in batches:
                if not len(pdf):
                    yield pd.DataFrame({id_col: pdf[id_col], "sig": []})
                    continue
                bs = [
                    (s or "").lower().encode("utf-8", "ignore") for s in pdf[text]
                ]
                bs = [
                    x if len(x) >= shingle_k else x + b" " * (shingle_k - len(x))
                    for x in bs
                ]
                lens = np.array([len(x) for x in bs], dtype=np.int64)
                arr = np.frombuffer(b"".join(bs), dtype=np.uint8).astype(np.uint64)
                n_win = len(arr) - shingle_k + 1
                h = np.full(n_win, np.uint64(1469598103934665603), dtype=np.uint64)
                prime = np.uint64(1099511628211)
                for off in range(shingle_k):
                    h = (h ^ arr[off : off + n_win]) * prime
                starts = np.zeros(len(bs), dtype=np.int64)
                starts[1:] = np.cumsum(lens)[:-1]
                counts = lens - shingle_k + 1
                invalid = np.zeros(n_win, dtype=bool)
                for d in range(len(bs) - 1):  # cross-doc windows never count
                    invalid[starts[d] + counts[d] : starts[d + 1]] = True
                sig = np.empty((num_perm, len(bs)), dtype=np.uint64)
                # permutations mixed in broadcast chunks (one fused pass per
                # chunk instead of 64 full-array passes); chunk size bounds
                # the (chunk × n_win) temporary to ~512 MB
                chunk = max(1, min(8, int(512e6 // max(n_win * 8, 1))))
                for p0 in range(0, num_perm, chunk):
                    pa = a[p0 : p0 + chunk]
                    pb = b[p0 : p0 + chunk]
                    mixed = h[None, :] * pa[:, None] + pb[:, None]
                    mixed[:, invalid] = u64max
                    sig[p0 : p0 + chunk] = np.minimum.reduceat(
                        mixed, starts, axis=1
                    )
                # store as signed 64-bit for the Spark LongType column
                sigs = sig.T.astype(np.int64).tolist()
                yield pd.DataFrame({id_col: pdf[id_col], "sig": sigs})
        finally:
            np.seterr(**old)

    return docs.select(id_col, text).mapInPandas(
        run, f"{id_col} long, sig array<long>"
    )


def lsh_candidates(
    signatures: DataFrame,
    bands: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Banded LSH: split each signature into ``bands`` bands, bucket-join on
    (band_idx, band hash), emit candidate pairs (i < j) once. The join key
    is a hash — tiny shuffle rows, the scale path."""
    n_perm = None  # rows agree by construction
    banded = signatures.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bidx: F.slice(
                    "sig",
                    bidx * (F.size("sig") / bands).cast("int") + 1,
                    (F.size("sig") / bands).cast("int"),
                ),
            )
        ).alias("band_idx", "band"),
    ).select(id_col, "band_idx", F.hash("band").alias("bucket"))
    # the banded table feeds BOTH sides of the self-join — materialize it
    # once (at 100 TB this is the "write the signature table" step) instead
    # of recomputing the signature UDF per side
    banded = banded.persist()
    a = banded.select(F.col(id_col).alias("i"), "band_idx", "bucket")
    b = banded.select(F.col(id_col).alias("j"), "band_idx", "bucket")
    cands = (
        a.join(b, ["band_idx", "bucket"])
        .where(F.col("i") < F.col("j"))
        .select("i", "j")
        .distinct()
        .persist()
    )
    cands.count()  # materialize the (small) pair table while banded is hot
    banded.unpersist()  # release the big banded blocks (ADVICE r2)
    return cands


def ngram_jaccard_verify(
    docs: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.8,
    shingle_k: int = 5,
    text: str = "text",
    id_col: str = "doc_id",
    collect_max_docs: int = 100_000,
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs only → (i, j, jaccard)
    with jaccard >= threshold.

    When the doc table is small enough to broadcast anyway
    (≤ ``collect_max_docs`` rows — the same boundedness Catalyst's
    broadcast join already assumed for the text attach), the texts ship
    ONCE per executor as a broadcast dict and the kernel reads SLIM
    (i, j) rows: the old fast path duplicated both documents onto every
    candidate pair crossing the Arrow boundary (~13 GB serialized at
    sf1.0 for a 180 MB decision). Above the gate the proven join path
    runs unchanged (at corpus scale the attach degrades to a shuffle
    join; a driver collect would not degrade, so it stays gated)."""
    sc = docs.sparkSession.sparkContext
    slim = candidates.repartition(sc.defaultParallelism, "i", "j")
    if docs.count() <= collect_max_docs:
        doc_map = {r[0]: r[1] for r in docs.select(id_col, text).collect()}
        bmap = sc.broadcast(doc_map)

        def run_slim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            tm = bmap.value
            ids_sorted = None  # built once per task, only if a filter is needed
            cache: dict[int, np.ndarray] = {}

            def sh(key: int) -> np.ndarray:
                v = cache.get(key)
                if v is None:
                    cache[key] = v = _stable_shingles(tm[key] or "", shingle_k)
                return v

            for pdf in batches:
                if not len(pdf):
                    continue
                ii = pdf["i"].to_numpy()
                jj = pdf["j"].to_numpy()
                # inner-join semantics of the join path: drop pairs whose
                # id has no doc row (vectorized membership test; candidate
                # tables derived from the same docs never hit this)
                if ids_sorted is None:
                    ids_sorted = np.sort(
                        np.fromiter(tm.keys(), dtype=np.int64, count=len(tm))
                    )
                pos_i = np.searchsorted(ids_sorted, ii)
                pos_j = np.searchsorted(ids_sorted, jj)
                ok = (
                    (pos_i < ids_sorted.size)
                    & (ids_sorted[np.minimum(pos_i, ids_sorted.size - 1)] == ii)
                    & (pos_j < ids_sorted.size)
                    & (ids_sorted[np.minimum(pos_j, ids_sorted.size - 1)] == jj)
                )
                if not ok.all():
                    ii, jj = ii[ok], jj[ok]
                    if not len(ii):
                        continue
                # group the batch's pairs by i: one vectorized searchsorted
                # membership pass per left doc (same core as the join path)
                order = np.argsort(ii, kind="stable")
                ii, jj = ii[order], jj[order]
                starts = np.flatnonzero(np.r_[True, ii[1:] != ii[:-1]])
                bounds = np.r_[starts, len(ii)]
                jac = np.empty(len(ii))
                for s, e in zip(bounds[:-1], bounds[1:]):
                    A = sh(ii[s])
                    parts = [sh(jj[r]) for r in range(s, e)]
                    sizes = np.array([p.size for p in parts], dtype=np.int64)
                    B = np.concatenate(parts) if parts else np.empty(0, np.uint64)
                    pos = np.searchsorted(A, B)
                    member = (pos < A.size) & (A[np.minimum(pos, A.size - 1)] == B)
                    seg = np.zeros(len(sizes), dtype=np.int64)
                    seg[1:] = np.cumsum(sizes)[:-1]
                    inter = np.add.reduceat(member, seg) if B.size else np.zeros(len(sizes), np.int64)
                    union = A.size + sizes - inter
                    jac[s:e] = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
                yield pd.DataFrame({"i": ii, "j": jj, "jaccard": jac})

        out = slim.mapInPandas(run_slim, "i long, j long, jaccard double")
        return out.where(F.col("jaccard") >= threshold)

    left = docs.select(F.col(id_col).alias("i"), F.col(text).alias("t_i"))
    right = docs.select(F.col(id_col).alias("j"), F.col(text).alias("t_j"))
    # the python kernel's cost is per PAIR, not per byte: AQE would coalesce
    # this small-byte shuffle to 1-2 partitions and serialize the kernel —
    # spread the pairs across the cluster explicitly. Round 9: repartition
    # the SLIM (i, j) table and attach the texts afterwards — the old plan
    # repartitioned after the joins and shuffled every candidate pair with
    # both documents aboard (at sf1.0: ~7 GB moved to place a 180 MB
    # decision; guide §2.3 "project before the exchange").
    joined = slim.join(left, "i").join(right, "j")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one shingle cache per TASK (docs repeat across the task's batches,
        # not just within one batch)
        cache: dict[int, np.ndarray] = {}

        def sh(key: int, t: str | None) -> np.ndarray:
            if key not in cache:
                cache[key] = _stable_shingles(t or "", shingle_k)
            return cache[key]

        for pdf in batches:
            if not len(pdf):
                continue
            ii = pdf["i"].to_numpy()
            jj = pdf["j"].to_numpy()
            ti = pdf["t_i"].to_numpy()
            tj = pdf["t_j"].to_numpy()
            # group the batch's pairs by i: one vectorized searchsorted
            # membership pass per left doc instead of a per-pair
            # intersect1d sort (the counts are integer-exact either way)
            order = np.argsort(ii, kind="stable")
            ii, jj, ti, tj = ii[order], jj[order], ti[order], tj[order]
            starts = np.flatnonzero(np.r_[True, ii[1:] != ii[:-1]])
            bounds = np.r_[starts, len(ii)]
            jac = np.empty(len(ii))
            for s, e in zip(bounds[:-1], bounds[1:]):
                A = sh(ii[s], ti[s])
                parts = [sh(jj[r], tj[r]) for r in range(s, e)]
                sizes = np.array([p.size for p in parts], dtype=np.int64)
                B = np.concatenate(parts) if parts else np.empty(0, np.uint64)
                pos = np.searchsorted(A, B)
                member = (pos < A.size) & (A[np.minimum(pos, A.size - 1)] == B)
                seg = np.zeros(len(sizes), dtype=np.int64)
                seg[1:] = np.cumsum(sizes)[:-1]
                inter = np.add.reduceat(member, seg) if B.size else np.zeros(len(sizes), np.int64)
                union = A.size + sizes - inter
                jac[s:e] = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
            yield pd.DataFrame({"i": ii, "j": jj, "jaccard": jac})

    out = joined.mapInPandas(run, "i long, j long, jaccard double")
    return out.where(F.col("jaccard") >= threshold)


# --- SimHash ------------------------------------------------------------------

def simhash_signatures(
    docs: DataFrame,
    shingle_k: int = 5,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """64-bit SimHash of the shingle set → (doc_id, simhash). Near-dups have
    small Hamming distance; bucket by rotations/bands for candidate joins."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for s in pdf[text]:
                sh = _stable_shingles(s or "", shingle_k)
                if len(sh) == 0:
                    out.append(0)
                    continue
                bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                        & np.uint64(1)).astype(np.int64)
                acc = (2 * bits - 1).sum(axis=0)
                val = 0
                for bit in range(64):
                    if acc[bit] > 0:
                        val |= 1 << bit
                # store as signed 64-bit
                out.append(val - (1 << 64) if val >= (1 << 63) else val)
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return docs.select(id_col, text).mapInPandas(run, f"{id_col} long, simhash long")


def simhash_candidates(
    sigs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    n_bands: int | None = None,
) -> DataFrame:
    """Candidate pairs with Hamming distance <= max_hamming, via banded
    bucket joins on n_bands equal slices of the 64-bit signature. By the
    pigeonhole principle any pair within distance n_bands - 1 shares at
    least one untouched band, so n_bands defaults to max_hamming + 1
    (guaranteed recall); fewer bands = cheaper but probabilistic."""
    if n_bands is None:
        n_bands = min(64, max_hamming + 1)
    width = 64 // n_bands
    mask = (1 << width) - 1
    sigs = sigs.persist()  # feeds both sides of the banded self-join
    banded = sigs.select(
        F.col(id_col), F.col("simhash"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), width * b).bitwiseAND(F.lit(mask))
                for b in range(n_bands)
            ])
        ).alias("band_idx", "band_val"),
    )
    # Round 9: the signature rides THROUGH the band join (8 bytes/row), so
    # the hamming filter runs inline on the join's probe output — the old
    # plan shuffled every raw bucket pair into a distinct and then re-joined
    # the signature table twice (at sf1.0: ~196M bucket-pair rows through a
    # distinct + two joins, for ~15k surviving pairs). A hot band value
    # (thousands of near-identical docs in one 12-bit bucket) is a single
    # join key AQE cannot split, so the left side is salted on a
    # deterministic hash of the id and the right side explodes the salt
    # range (guide §2.5): each bucket's quadratic probe work spreads over
    # SALT partitions, each (i, j) pair still meets exactly once per band.
    salt_n = 16
    a = banded.select(
        F.col(id_col).alias("i"), F.col("simhash").alias("h_i"),
        "band_idx", "band_val",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_n)).cast("int").alias("_salt"),
    )
    b = banded.select(
        F.col(id_col).alias("j"), F.col("simhash").alias("h_j"),
        "band_idx", "band_val",
    ).withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))))
    return (
        a.join(b, ["band_idx", "band_val", "_salt"])
        .where(F.col("i") < F.col("j"))
        .withColumn("hamming", F.bit_count(F.col("h_i").bitwiseXOR(F.col("h_j"))))
        .where(F.col("hamming") <= max_hamming)
        .select("i", "j", "hamming")
        .distinct()
    )


# --- embedding-cosine near-dup --------------------------------------------------

def embedding_near_dups(
    embs: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 7,
) -> DataFrame:
    """(i, j, cosine) pairs with cosine >= threshold. Candidates from
    ``n_tables`` INDEPENDENT random-hyperplane sign sketches (a pair within
    angle θ collides in one table w.p. (1−θ/π)^n_planes; independent tables
    raise recall to 1−(1−p)^T — a single sketch misses any pair that
    differs in ≥1 bit), verified exactly with zip_with/aggregate —
    Catalyst-only verification, bucket equi-joins only."""
    dim = len(embs.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    # sequential per-table draws, stacked (identical values to drawing
    # inside a per-table loop — the oracle generator replicates this)
    planes = np.vstack([rng.normal(size=(n_planes, dim)) for _ in range(n_tables)])

    def sketch_batch(batches):
        # Arrow-batched sign sketches over the broadcast plane matrix: an
        # inline-literal Catalyst expression would be n_tables·n_planes
        # aggregate-HOFs with dim literals each — seconds of codegen per
        # plan. Pure-numpy reduction (no BLAS threading) keeps the bucket
        # values reproducible outside Spark for the oracle.
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        for pdf in batches:
            vecs = pdf[vec_col].to_numpy()
            buckets = []
            for lo in range(0, len(pdf), 1024):
                X = np.stack(vecs[lo : lo + 1024]).astype(np.float64)
                bits = (X[:, None, :] * planes[None, :, :]).sum(axis=2) > 0
                per_table = bits.reshape(len(X), n_tables, n_planes)
                buckets.extend((per_table * weights).sum(axis=2).tolist())
            pdf = pdf.copy()
            pdf["_buckets"] = buckets
            yield pdf

    fields = ", ".join(f"{n} {t}" for n, t in embs.select(id_col, vec_col).dtypes)
    sk = embs.select(id_col, vec_col).mapInPandas(
        sketch_batch, f"{fields}, _buckets array<long>"
    ).persist()
    # one row per (table, bucket) — candidates are the union of per-table
    # bucket self-joins, deduped before the exact verify
    banded = sk.select(
        id_col, vec_col,
        F.posexplode("_buckets").alias("table_idx", "bucket"),
    )
    a = banded.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v_i"),
                      "table_idx", "bucket")
    b = banded.select(F.col(id_col).alias("j"), F.col(vec_col).alias("v_j"),
                      "table_idx", "bucket")

    # Round 9: the exact cosine verify moved from an interpreted Catalyst
    # aggregate/zip_with fold (measured ~0.5 ms per evaluation — it
    # dominated the operator) to an Arrow batch scorer replaying the fold's
    # exact IEEE op order: per-dimension multiply-add from a 0.0 seed for
    # the dot and both norms, then the same dot/(n_i*n_j) division — numpy
    # ufuncs are unfused, so every rounding step matches and the cosine is
    # bit-identical. The threshold filter stays Catalyst; it now fires
    # BEFORE the pair dedup, so only survivors reach the distinct (the old
    # plan shuffled every candidate pair with both vectors through
    # dropDuplicates). Multi-table duplicates of a pair compute the same
    # cosine and the distinct collapses them as before.
    def score(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            Vi = np.array(list(pdf["v_i"].to_numpy()), dtype=np.float64)
            Vj = np.array(list(pdf["v_j"].to_numpy()), dtype=np.float64)
            dot = np.zeros(len(pdf))
            ni = np.zeros(len(pdf))
            nj = np.zeros(len(pdf))
            for d in range(Vi.shape[1]):
                dot += Vi[:, d] * Vj[:, d]
                ni += Vi[:, d] * Vi[:, d]
                nj += Vj[:, d] * Vj[:, d]
            cos = dot / (np.sqrt(ni) * np.sqrt(nj))
            yield pd.DataFrame(
                {"i": pdf["i"].to_numpy(), "j": pdf["j"].to_numpy(),
                 "cosine": cos}
            )

    scored = (
        a.join(b, ["table_idx", "bucket"])
        .where(F.col("i") < F.col("j"))
        .select("i", "j", "v_i", "v_j")
        .mapInPandas(score, "i long, j long, cosine double")
    )
    return (
        scored.where(F.col("cosine") >= threshold)
        .select("i", "j", "cosine")
        .distinct()
    )


# --- near-dup components ------------------------------------------------------

def connected_components(
    pairs: DataFrame, i: str = "i", j: str = "j", max_iter: int = 25,
    jump: bool = True, stats: dict | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``: component
    = the smallest node id reachable over the undirected pair edges — the
    stage that turns verified near-dup PAIRS into dedup GROUPS (keep
    component == node, drop the rest).

    Min-label propagation to fixpoint with POINTER JUMPING: each round
    (1) takes the min over each node's neighbors' labels (one shuffle),
    then (2) replaces every label by its label's label (one self-join) —
    the path-compression half of large-star/small-star.  Propagation
    alone needs diameter rounds (a 100 k-node chain would need 100 k and
    the r4 code would have returned NON-converged labels after max_iter);
    with jumping the label horizon doubles per round, so rounds ≈
    log₂(diameter) and max_iter=25 covers diameters up to ~2²⁵.  Dense
    near-dup clusters (diameter 1-3) still converge in 2-3 rounds and
    only pay one extra hash join per round.

    Labels only decrease, so the global label sum is a convergence
    certificate — one scalar aggregate per round, no row-level diff join;
    exhausting max_iter without fixpoint RAISES instead of returning a
    partial labeling.  Each round's result is an EAGER localCheckpoint:
    the round's plan references the previous labels several times, so
    without lineage truncation the logical plan doubles per round
    (2^rounds nodes — the property test OOM'd the driver on a
    diameter-15 random graph before this).  ``stats``, when given, gets
    {"rounds": n} for pilot instrumentation."""
    # mirror each edge via explode, not union: the union's two branches
    # each re-ran the whole upstream pipeline (e.g. the LSH verify) in one
    # job — one scan emits both directions (round 9, guide §2.4)
    und = (
        pairs.select(
            F.explode(F.array(
                F.struct(F.col(i).alias("a"), F.col(j).alias("b")),
                F.struct(F.col(j).alias("a"), F.col(i).alias("b")),
            )).alias("_e")
        )
        .select("_e.a", "_e.b")
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    cur = labels.agg(F.sum("label")).collect()[0][0]
    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        nbr = und.join(
            labels.select(F.col("node").alias("b"), F.col("label")), "b"
        ).select(F.col("a").alias("node"), "label")
        cand = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        pre_jump = None
        if jump:
            # pointer jump: label ← min(label, label(label)). label is
            # always a node of the same component (it entered via an edge
            # or a previous jump), so the jump target exists in cand and
            # reachability is preserved while path distances halve.
            # Checkpoint first — the self-join reads cand twice and would
            # otherwise re-run the neighbor-min stage both times.
            pre_jump = cand.localCheckpoint(eager=True)
            hop = pre_jump.select(
                F.col("node").alias("label"), F.col("label").alias("_l2")
            )
            cand = pre_jump.join(hop, "label", "left").select(
                "node",
                F.least(F.col("label"), F.coalesce("_l2", "label")).alias("label"),
            )
        new_labels = cand.localCheckpoint(eager=True)
        new = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()  # checkpoint blocks of the superseded round
        if pre_jump is not None:
            pre_jump.unpersist()  # the intermediate pre-jump checkpoint
        labels = new_labels
        if new == cur:
            converged = True
            break
        cur = new
    und.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels.select("node", F.col("label").alias("component"))
