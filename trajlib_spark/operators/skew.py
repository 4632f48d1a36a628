"""Explicit skew handling for hot cells (north rule: "skewed hot cells are
handled with salted repartitioning and explicit AQE hints").

Three layers, outermost first:

1. AQE (session.py turns on adaptive + skewJoin) — splits skewed
   shuffle-join partitions at runtime; covers equi-joins.
2. ``salted_aggregate`` — two-phase aggregation for hot GROUP BY keys that
   partial aggregation alone can't fix (e.g. collect_list-style aggs where
   map-side combine doesn't shrink data): shard each key into
   ``salt`` sub-keys, aggregate per (key, salt), then merge per key.
3. ``rebalance_hint`` / ``skew_join_hint`` — explicit Catalyst hints for
   plans the caller knows are skewed (the documented
   "/*+ REPARTITION */-style" escape hatch).

The hot-cell pre-pass (``hot_keys``) identifies keys above a frequency
threshold so callers can salt only those (cheap count, pushdown-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, threshold_frac: float = 0.01) -> DataFrame:
    """Keys holding more than threshold_frac of all rows (the skew
    pre-pass). One aggregation; broadcastable result."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > threshold_frac * total)
        .select(key)
    )


def with_salt(df: DataFrame, salt: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt (task-retry-safe: hash of all columns,
    not rand())."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase GROUP BY: groupBy(keys + salt) with ``partial_aggs`` then
    groupBy(keys) with ``merge_aggs`` over the partial results. The hot key
    spreads over ``salt`` reducers in phase 1; phase 2 touches only
    #keys × salt rows."""
    salted = with_salt(df, salt)
    phase1 = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*merge_aggs)


def salted_count(df: DataFrame, keys: list[str], salt: int = 16) -> DataFrame:
    """Skew-proof count per key group (tile-count shape)."""
    return salted_aggregate(
        df,
        keys,
        [F.count(F.lit(1)).alias("_c")],
        [F.sum("_c").alias("cnt")],
        salt=salt,
    )


def rebalance_hint(df: DataFrame, *cols: str) -> DataFrame:
    """AQE rebalance hint — splits skewed partitions on write/exchange."""
    return df.hint("rebalance", *cols) if cols else df.hint("rebalance")


def skew_join_hint(df: DataFrame, *cols: str) -> DataFrame:
    """Explicit SKEW hint wrapper (AQE skewJoin handles most cases; this
    forces the treatment when statistics mislead it)."""
    return df.hint("skew", *cols) if cols else df
