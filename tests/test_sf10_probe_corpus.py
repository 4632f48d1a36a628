"""The sf10 dedup probe corpus (bench._sf10_salted_docs) must carry the
structure its scaling claim rests on: 100 salted copies per doc where
salts 0-9 are mutual near-dups (suffix-only change) and salts 10-99 are
near-dups of NOTHING (additive seeded-noise prefixes dilute every cross
similarity below the 0.5 threshold). Round 7 learned the hard way that a
corpus-shape mistake here is not benign — the first probe shape
(in-place vowel substitution) MANUFACTURED similarity, exploded the
banded-join candidate set and filled the disk (BENCH/NOTES.md). This
pins the designed structure at 50 docs × 100 salts through the real
minhash → LSH → verify operators, so any future corpus edit re-proves
itself in seconds instead of failing at 500k docs."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from trajlib_spark.operators import dedup  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_salted_corpus_pair_structure(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 50)
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    salted = bench._sf10_salted_docs(spark, str(tmp_path), 2)
    assert salted.count() == 50 * 100

    sigs = dedup.minhash_signatures(salted)
    cands = dedup.lsh_candidates(sigs)
    rows = dedup.ngram_jaccard_verify(salted, cands, threshold=0.5).collect()

    # the dilution property: NO verified pair touches a salt>=10 copy —
    # neither (original, noised) nor (noised, noised) of the same doc
    assert not [
        r for r in rows
        if r["i"] // 1_000_000 >= 10 or r["j"] // 1_000_000 >= 10
    ]

    # the within-decade property: every doc contributes exactly its
    # C(10,2) = 45 pairs among salts 0-9 (signatures are seeded-hash
    # deterministic, so banding recall here is exact, not probabilistic)
    same_doc = [
        r for r in rows if r["i"] % 1_000_000 == r["j"] % 1_000_000
    ]
    per_doc: dict[int, int] = {}
    for r in same_doc:
        d = r["i"] % 1_000_000
        per_doc[d] = per_doc.get(d, 0) + 1
    assert len(per_doc) == 50
    assert set(per_doc.values()) == {45}

    # cross-doc template pairs exist (the sf0.1 corpus is synthetic
    # template text) but stay marginal — the probe's pair count scales
    # with docs, not quadratically: 100 here vs 2250 within-decade
    cross = [r for r in rows if r["i"] % 1_000_000 != r["j"] % 1_000_000]
    assert len(same_doc) == 50 * 45
    assert len(cross) < len(same_doc) // 10
