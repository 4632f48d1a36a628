"""Uniform-grid cell index (the engine's H3/S2 analog) as pure Catalyst
column expressions — no UDFs, so cell assignment stays inside whole-stage
codegen and fuses with the parquet scan.

Reference semantics (/root/reference/fedtraj/utils/cellspace.py):
- cell id layout ``i_x * y_size + i_y`` (:26-27)
- out-of-MBR points snap to the MBR center (:39-43) — quirk reproduced
- truncation order ``int(x - x_min) // x_unit`` (:47-48): integer cast of
  the offset *before* the unit division. For the non-negative offsets that
  remain after clamping this equals ``floor(floor(x - x_min) / x_unit)``,
  which is what we emit (property-tested against the scalar oracle).
- ``get_mbr`` (:20-24), ``neighbour_cellids`` 8-neighborhood (:55-67),
  and the neighbour-pair enumeration (:71-108).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import GridConfig


def clamp_x(x: Column, y: Column, grid: GridConfig) -> Column:
    """Snap-to-center for out-of-range points (cellspace.py:39-43).
    Note the reference snaps *both* coordinates if *either* is outside."""
    cx, _ = grid.center
    return F.when(_in_mbr(x, y, grid), x).otherwise(F.lit(cx))


def clamp_y(x: Column, y: Column, grid: GridConfig) -> Column:
    _, cy = grid.center
    return F.when(_in_mbr(x, y, grid), y).otherwise(F.lit(cy))


def _in_mbr(x: Column, y: Column, grid: GridConfig) -> Column:
    return (
        (x >= F.lit(grid.x_min))
        & (x <= F.lit(grid.x_max))
        & (y >= F.lit(grid.y_min))
        & (y <= F.lit(grid.y_max))
    )


def _idx(v: Column, v_min: float, unit: float) -> Column:
    # int(v - v_min) // unit with v - v_min >= 0  ==  floor(floor(.)/unit)
    return F.floor(F.floor(v - F.lit(v_min)) / F.lit(unit)).cast("long")


def x_idx(x: Column, y: Column, grid: GridConfig) -> Column:
    return _idx(clamp_x(x, y, grid), grid.x_min, grid.x_unit)


def y_idx(x: Column, y: Column, grid: GridConfig) -> Column:
    return _idx(clamp_y(x, y, grid), grid.y_min, grid.y_unit)


def cell_id_from_idx(i_x: Column, i_y: Column, grid: GridConfig) -> Column:
    return (i_x * F.lit(grid.y_size) + i_y).cast("long")


def cell_id(x: Column, y: Column, grid: GridConfig) -> Column:
    return cell_id_from_idx(x_idx(x, y, grid), y_idx(x, y, grid), grid)


def idx_from_cell_id(cid: Column, grid: GridConfig) -> tuple[Column, Column]:
    """Inverse: cell_id → (i_x, i_y) (cellspace.py:30-31)."""
    ys = F.lit(grid.y_size)
    return (cid / ys).cast("long"), cid % ys


def cell_mbr(i_x: Column, i_y: Column, grid: GridConfig) -> Column:
    """Tile geometry struct (x_lo, y_lo, x_hi, y_hi) (cellspace.py:20-24)."""
    x_lo = F.lit(grid.x_min) + F.lit(grid.x_unit) * i_x
    y_lo = F.lit(grid.y_min) + F.lit(grid.y_unit) * i_y
    return F.struct(
        x_lo.alias("x_lo"),
        y_lo.alias("y_lo"),
        (x_lo + F.lit(grid.x_unit)).alias("x_hi"),
        (y_lo + F.lit(grid.y_unit)).alias("y_hi"),
    )


def kring_offsets(k: int, include_center: bool = True) -> list[tuple[int, int]]:
    """Chebyshev ring of radius k; k=1 without center = the reference's
    8-neighborhood (cellspace.py:55-67)."""
    return [
        (dx, dy)
        for dx in range(-k, k + 1)
        for dy in range(-k, k + 1)
        if include_center or not (dx == 0 and dy == 0)
    ]


def kring_cell_ids(i_x: Column, i_y: Column, grid: GridConfig, k: int,
                   include_center: bool = True) -> Column:
    """Array of boundary-clipped cell ids in the k-ring window around
    (i_x, i_y). Pure expression — explode it to fan out a kNN candidate
    join. Out-of-grid neighbors are dropped (boundary clipping,
    cellspace.py:59-60)."""
    cells = []
    for dx, dy in kring_offsets(k, include_center):
        nx, ny = i_x + F.lit(dx), i_y + F.lit(dy)
        ok = (nx >= 0) & (nx < F.lit(grid.x_size)) & (ny >= 0) & (ny < F.lit(grid.y_size))
        cells.append(F.when(ok, cell_id_from_idx(nx, ny, grid)))
    return F.array_compact(F.array(*cells))


def all_cells(spark: SparkSession, grid: GridConfig) -> DataFrame:
    """One row per grid cell: (cell_id, i_x, i_y). Generated distributed
    via spark.range — never collected on the driver."""
    ys = grid.y_size
    return (
        spark.range(grid.n_cells)
        .select(
            F.col("id").alias("cell_id"),
            (F.col("id") / F.lit(ys)).cast("long").alias("i_x"),
            (F.col("id") % F.lit(ys)).alias("i_y"),
        )
    )


def neighbour_cell_pairs(spark: SparkSession, grid: GridConfig) -> DataFrame:
    """Every adjacent cell pair exactly once (S, E, SE, SW sweeps), the
    cell-graph edge list of cellspace.py:71-108 — built as 4 selects over
    the cell range + union, no cross join."""
    cells = all_cells(spark, grid)
    sweeps = []
    for dx, dy in ((0, 1), (1, 0), (1, 1), (1, -1)):
        nx, ny = F.col("i_x") + F.lit(dx), F.col("i_y") + F.lit(dy)
        sweeps.append(
            cells.where(
                (nx >= 0) & (nx < F.lit(grid.x_size)) & (ny >= 0) & (ny < F.lit(grid.y_size))
            ).select(
                F.col("cell_id").alias("src_cell"),
                cell_id_from_idx(nx, ny, grid).alias("dst_cell"),
            )
        )
    out = sweeps[0]
    for s in sweeps[1:]:
        out = out.unionAll(s)
    return out


def with_cell(df: DataFrame, grid: GridConfig, x: str = "x", y: str = "y",
              prefix: str = "") -> DataFrame:
    """Attach (i_x, i_y, cell_id) columns computed from Mercator x/y."""
    xc, yc = F.col(x), F.col(y)
    ix, iy = x_idx(xc, yc, grid), y_idx(xc, yc, grid)
    return df.withColumns({
        f"{prefix}i_x": ix,
        f"{prefix}i_y": iy,
        f"{prefix}cell_id": cell_id_from_idx(ix, iy, grid),
    })
