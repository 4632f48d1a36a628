"""node2vec walk generation (cell-graph embedding input, SURVEY §2.4):
distributed walks must equal the pure-python replica, be deterministic
across partitionings, and follow real graph edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trajlib_spark.config import PORTO_GRID
from trajlib_spark.operators import cells, walks

G = PORTO_GRID


@pytest.fixture(scope="module")
def pairs(spark):
    return cells.neighbour_cell_pairs(spark, G).persist()


def test_walks_match_python_replica(spark, pairs):
    starts = spark.createDataFrame(
        [(5,), (100,), (2481,), (7000,)], "cell_id long"
    )
    got = sorted(
        (r.walk_id, r.pos, r.cell_id)
        for r in walks.node2vec_walks(pairs, starts, 8, 3).collect()
    )
    pair_rows = [(r.src_cell, r.dst_cell) for r in pairs.collect()]
    expect = sorted(walks.walks_py(pair_rows, [5, 100, 2481, 7000], 8, 3))
    assert got == expect
    # full length, every start covered
    assert len(got) == 4 * 3 * 8


def test_arrow_walks_bit_identical_to_join_chain(spark, pairs):
    """The broadcast-adjacency Arrow fast path must emit exactly the same
    (walk_id, pos, cell_id) rows as the join-chain implementation — same
    sorted-neighbor ordering, same integer hash chooser."""
    starts = spark.createDataFrame(
        [(5,), (100,), (2481,), (7000,)], "cell_id long"
    )
    chain = sorted(
        (r.walk_id, r.pos, r.cell_id)
        for r in walks.node2vec_walks(pairs, starts, 10, 3, impl="catalyst").collect()
    )
    arrow = sorted(
        (r.walk_id, r.pos, r.cell_id)
        for r in walks.node2vec_walks(pairs, starts, 10, 3, impl="arrow").collect()
    )
    assert arrow == chain
    with pytest.raises(ValueError):
        walks.node2vec_walks(pairs, starts, 4, 1, impl="nope")


def test_dead_end_walks_dropped_identically(spark):
    """A degree-0 start node (absent from the edge list — the only
    dead-end shape an undirected adjacency admits) drops its walks
    ENTIRELY in every implementation: the chain loses the row at the
    step-1 inner join, and the arrow/python paths enforce the same rule,
    so the bit-identical guarantee is unconditional (ADVICE r5)."""
    tiny = spark.createDataFrame(
        [(1, 2), (2, 3)], "src_cell long, dst_cell long"
    )
    starts = spark.createDataFrame([(1,), (99,)], "cell_id long")
    chain = sorted(
        map(tuple, walks.node2vec_walks(tiny, starts, 5, 2, impl="catalyst").collect())
    )
    arrow = sorted(
        map(tuple, walks.node2vec_walks(tiny, starts, 5, 2, impl="arrow").collect())
    )
    py = sorted(walks.walks_py([(1, 2), (2, 3)], [1, 99], 5, 2))
    assert chain == arrow == py
    # node 99's walks are gone entirely — even pos 0
    assert all(r[0] // 2 != 99 for r in chain)
    # node 1's walks survive at full length
    assert len(chain) == 2 * 5


def test_auto_impl_selection(spark, pairs):
    """impl='auto' takes the broadcast-arrow path for metadata-scale
    graphs (no join in the plan) and falls back to the catalyst chain
    when the edge list exceeds max_broadcast_edges."""
    starts = spark.createDataFrame([(42,)], "cell_id long")
    auto_plan = (
        walks.node2vec_walks(pairs, starts, 5, 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" not in auto_plan  # arrow: one Arrow pass
    chain_plan = (
        walks.node2vec_walks(pairs, starts, 5, 1, max_broadcast_edges=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in chain_plan


def test_walks_plan_shape(spark, pairs):
    """All walk-step joins are broadcast hash joins (the cell graph is
    metadata-scale); no cross join, no shuffle join in the chain."""
    starts = spark.createDataFrame([(42,), (99,)], "cell_id long")
    out = walks.node2vec_walks(pairs, starts, 6, 2, impl="catalyst")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_walks_follow_edges_and_are_deterministic(spark, pairs):
    starts = spark.createDataFrame([(42,)], "cell_id long")
    a = walks.node2vec_walks(pairs, starts, 6, 2).collect()
    b = walks.node2vec_walks(pairs.repartition(7), starts, 6, 2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    adj = {}
    for r in pairs.collect():
        adj.setdefault(r.src_cell, set()).add(r.dst_cell)
        adj.setdefault(r.dst_cell, set()).add(r.src_cell)
    by_walk = {}
    for r in a:
        by_walk.setdefault(r.walk_id, {})[r.pos] = r.cell_id
    for wid, seq in by_walk.items():
        path = [seq[p] for p in sorted(seq)]
        assert path[0] == 42
        for u, v in zip(path, path[1:]):
            assert v in adj[u], (wid, u, v)


def test_skipgram_pairs_match_replica(spark, pairs):
    """(center, context) generation: every ordered pair within ±window,
    center ≠ context, exactly once per (walk, position pair)."""
    starts = spark.createDataFrame([(5,), (100,)], "cell_id long")
    w = walks.node2vec_walks(pairs, starts, 8, 2).persist()
    got = sorted(
        (r.walk_id, r.center_pos, r.center, r.context)
        for r in walks.skipgram_pairs(w, window=3).collect()
    )
    by_walk: dict[int, dict[int, int]] = {}
    for r in w.collect():
        by_walk.setdefault(r.walk_id, {})[r.pos] = r.cell_id
    expect = sorted(
        (wid, cp, seq[cp], seq[xp])
        for wid, seq in by_walk.items()
        for cp in seq
        for xp in seq
        if xp != cp and abs(xp - cp) <= 3
    )
    assert got == expect
    w.unpersist()


def test_skipgram_pairs_non_contiguous_positions(spark, pairs):
    """Walks whose positions are NOT contiguous (filtered upstream) still
    get exact position-window semantics: the index-space slice is a
    superset of the position window (positions strictly increase along
    the sorted array), and the final |Δpos| ≤ window filter trims the
    extras (ADVICE r5)."""
    starts = spark.createDataFrame([(5,), (100,)], "cell_id long")
    w = (
        walks.node2vec_walks(pairs, starts, 10, 2)
        .where(~F.col("pos").isin(3, 4, 7))
        .persist()
    )
    got = sorted(
        (r.walk_id, r.center_pos, r.center, r.context)
        for r in walks.skipgram_pairs(w, window=2).collect()
    )
    by_walk: dict[int, dict[int, int]] = {}
    for r in w.collect():
        by_walk.setdefault(r.walk_id, {})[r.pos] = r.cell_id
    expect = sorted(
        (wid, cp, seq[cp], seq[xp])
        for wid, seq in by_walk.items()
        for cp in seq
        for xp in seq
        if xp != cp and abs(xp - cp) <= 2
    )
    assert got == expect
    w.unpersist()


def test_skipgram_window_ten_covers_reference_context(spark, pairs):
    """With the reference's context window 10 and walk_length 12, every
    position pairs with all but the two farthest-away positions."""
    starts = spark.createDataFrame([(42,)], "cell_id long")
    w = walks.node2vec_walks(pairs, starts, 12, 1)
    n = walks.skipgram_pairs(w, window=10).count()
    # ordered pairs within |Δpos| ≤ 10 among 12 positions: 12·11 − 2
    assert n == 12 * 11 - 2


def test_auto_walks_bit_identical_with_precollected_rows(spark, pairs):
    """auto mode feeds its single bounded Arrow collect straight into the
    arrow adjacency (ADVICE r6 / VERDICT r7 #1) — output stays
    bit-identical to both explicit impls."""
    starts = spark.createDataFrame([(7,), (42,), (99,)], "cell_id long")
    a = sorted(map(tuple, walks.node2vec_walks(pairs, starts, 8, 2).collect()))
    b = sorted(map(tuple, walks.node2vec_walks(
        pairs, starts, 8, 2, impl="arrow").collect()))
    c = sorted(map(tuple, walks.node2vec_walks(
        pairs, starts, 8, 2, impl="catalyst").collect()))
    assert a == b == c and len(a) == 3 * 2 * 8


def test_auto_catalyst_branch_never_materializes_edges(spark, pairs, monkeypatch):
    """VERDICT r7 #1: when auto mode's bounded probe says "too big for the
    broadcast", the branch decision must be a scalar count — NO edge rows
    may reach the driver (the old form collected max_broadcast_edges+1
    Row objects precisely on the graphs too big to broadcast). Spy:
    DataFrame.collect/toPandas raise for the duration of the auto call
    with a bound of 0; the catalyst chain must still come back lazily."""
    from pyspark.sql import DataFrame

    starts = spark.createDataFrame([(42,)], "cell_id long")

    def _boom(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver materialization on the catalyst branch")

    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    out = walks.node2vec_walks(pairs, starts, 6, 2, max_broadcast_edges=0)
    monkeypatch.undo()
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, walks.node2vec_walks(
        pairs, starts, 6, 2, impl="catalyst").collect()))
    assert got == want and len(got) == 2 * 6


def test_skipgram_pairs_raise_on_duplicate_positions(spark, pairs):
    """VERDICT r7 #2: duplicate (walk_id, pos) input — e.g. a unioned
    walk table that reused walk_ids — used to silently drop in-window
    pairs; the precondition is now enforced in-operator with a loud
    task error naming the offending walk_id."""
    starts = spark.createDataFrame([(5,)], "cell_id long")
    w = walks.node2vec_walks(pairs, starts, 6, 1)
    bad = w.unionAll(w)  # every (walk_id, pos) now appears twice
    with pytest.raises(Exception, match=r"duplicate \(walk_id, pos\)"):
        walks.skipgram_pairs(bad, window=3).collect()
    # and the clean table still works through the guarded projection —
    # window 10 ≥ max Δpos 5, so all 6·5 ordered pairs qualify
    assert walks.skipgram_pairs(w, window=10).count() == 6 * 5
