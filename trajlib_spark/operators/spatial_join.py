"""Point-in-polygon spatial join, Spark-first.

Two-phase plan (the STRtree-broadcast analog from the survey §4.2):

1. **Coarse**: each polygon is rasterized to the grid cells covering its
   bounding box (pure expressions over the GeoJSON coord array), giving a
   small (cell_id, geo_id, coord) index that Catalyst broadcast-joins with
   the point table on cell_id — a hash join, no theta join, no UDF.
2. **Refine**: an exact even-odd ray-cast implemented with array
   higher-order functions (aggregate/filter over the ring edges), staying
   inside codegen. Even-odd over all rings handles holes for free.

Reference semantics generalized: the reference only has the rectangular
``inrange`` containment test (/root/reference/fedtraj/utils/
preprocessing_porto.py:24-33) applied to every point of a trajectory; this
operator is the polygon-set generalization demanded by the GeoData model
(/root/reference/trajlib/data_processing/utils/data_definition.py:137-181).

At 100 TB: the polygon index is tiny (regions/countries) → broadcast; the
point side never shuffles at all — the join is map-side. Hot cells don't
matter here because the build side is the polygon index, not the points.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import GridConfig
from . import cells


def _bounded_idx(v: Column, v_min: float, v_max: float, unit: float, size: int) -> Column:
    """Grid index of a coordinate clamped to the MBR edge (coverage clamps
    to the boundary — unlike point assignment, which snaps to center)."""
    clamped = F.greatest(F.lit(v_min), F.least(F.lit(v_max), v))
    idx = F.floor(F.floor(clamped - F.lit(v_min)) / F.lit(unit)).cast("long")
    return F.least(F.lit(size - 1), F.greatest(F.lit(0), idx))


def polygon_covering_cells(polygons: DataFrame, grid: GridConfig) -> DataFrame:
    """(geo_id, cell_id, coord): every grid cell whose MBR intersects the
    polygon's bounding box. coord is carried along so the refine phase
    needs no second join."""
    pts = F.flatten(F.col("coord"))
    xs = F.transform(pts, lambda p: p[0])
    ys = F.transform(pts, lambda p: p[1])
    df = polygons.select(
        "geo_id",
        "coord",
        _bounded_idx(F.array_min(xs), grid.x_min, grid.x_max, grid.x_unit, grid.x_size).alias("ix_lo"),
        _bounded_idx(F.array_max(xs), grid.x_min, grid.x_max, grid.x_unit, grid.x_size).alias("ix_hi"),
        _bounded_idx(F.array_min(ys), grid.y_min, grid.y_max, grid.y_unit, grid.y_size).alias("iy_lo"),
        _bounded_idx(F.array_max(ys), grid.y_min, grid.y_max, grid.y_unit, grid.y_size).alias("iy_hi"),
    )
    df = df.select(
        "geo_id",
        "coord",
        F.explode(F.sequence("ix_lo", "ix_hi")).alias("i_x"),
        "iy_lo",
        "iy_hi",
    ).select(
        "geo_id",
        "coord",
        "i_x",
        F.explode(F.sequence("iy_lo", "iy_hi")).alias("i_y"),
    )
    return df.select(
        "geo_id",
        cells.cell_id_from_idx(F.col("i_x"), F.col("i_y"), grid).alias("cell_id"),
        "coord",
    )


def ray_cast_inside(x: Column, y: Column, coord: Column) -> Column:
    """Even-odd crossing test as a pure Catalyst expression over bound
    Columns. For each ring (closed: last vertex == first) count edges
    crossing the horizontal ray to +inf from the point; odd total = inside.
    The when() guard keeps the division away from horizontal edges
    (y2 == y1), which would error under Spark's ANSI mode; the crossing
    precondition already implies y2 != y1. The oracle SQL
    (synth.pip_crossing_case) implements the identical arithmetic.

    CRITICAL plan-safety detail: the point coordinates are threaded through
    the aggregate's *zero* value instead of being captured by the lambda
    bodies. Spark's reference tracking drops attributes that only appear
    captured inside lambda functions, which makes the optimizer believe
    this predicate references the polygon side alone and push it below the
    join — producing an invalid plan
    (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at runtime, observed on 4.1.x).
    With x/y in the zero argument the reference set is correct and the
    predicate stays at the join.
    """

    def crossing(e: Column, px: Column, py: Column) -> Column:
        ax, ay = e["0"][0], e["0"][1]
        bx, by = e["1"][0], e["1"][1]
        return F.when(
            (ay > py) != (by > py),
            px < ((bx - ax) * (py - ay) / (by - ay) + ax),
        ).otherwise(F.lit(False))

    def merge(acc: Column, ring: Column) -> Column:
        n = F.size(ring)
        edges = F.arrays_zip(F.slice(ring, 1, n - 1), F.slice(ring, 2, n - 1))
        cnt = F.size(F.filter(edges, lambda e: crossing(e, acc["px"], acc["py"])))
        return F.struct(
            (acc["c"] + cnt).alias("c"),
            acc["px"].alias("px"),
            acc["py"].alias("py"),
        )

    zero = F.struct(F.lit(0).alias("c"), x.alias("px"), y.alias("py"))
    total = F.aggregate(coord, zero, merge, lambda acc: acc["c"])
    return total % 2 == 1


def point_in_polygon(
    points: DataFrame,
    polygons: DataFrame,
    grid: GridConfig,
    x: str = "x",
    y: str = "y",
    point_cols: list[str] | None = None,
) -> DataFrame:
    """Join rows (point columns…, geo_id) for every point inside a polygon.

    ``points`` needs Mercator columns x/y; cell_id is computed if absent.
    ``polygons`` is GeoData-shaped: (geo_id, coord array<array<array<double>>>).
    """
    if "cell_id" not in points.columns:
        points = cells.with_cell(points, grid, x=x, y=y)
    # Round 9: classify each covering cell ONCE at index-build time. A cell
    # is _full when a margin-grown rectangle containing every point the
    # cell can hold is provably inside the polygon: (a) no polygon edge's
    # bbox overlaps the rectangle — the boundary never enters it, so the
    # even-odd parity is constant across it — and (b) one rectangle corner
    # has odd parity. Probes against _full cells then skip the per-point
    # ray cast entirely (the interpreted HOF that dominated the pip stage);
    # only boundary-cell probes still pay it, and Or short-circuits. The
    # margin covers the inner-floor index slack (+1) with room (±2); the
    # grid's snap-to-center quirk parks out-of-MBR points in the CENTER
    # cell at arbitrary coordinates, so that one cell is never _full.
    raw = polygon_covering_cells(polygons, grid).withColumnRenamed("cell_id", "_g_cell")
    ix = F.floor(F.col("_g_cell") / F.lit(grid.y_size))
    iy = F.col("_g_cell") % F.lit(grid.y_size)
    rx_lo = F.lit(grid.x_min) + ix * F.lit(grid.x_unit) - F.lit(2.0)
    rx_hi = F.lit(grid.x_min) + (ix + 1) * F.lit(grid.x_unit) + F.lit(3.0)
    ry_lo = F.lit(grid.y_min) + iy * F.lit(grid.y_unit) - F.lit(2.0)
    ry_hi = F.lit(grid.y_min) + (iy + 1) * F.lit(grid.y_unit) + F.lit(3.0)

    def edge_bbox_overlaps(ring: Column) -> Column:
        n = F.size(ring)
        edges = F.arrays_zip(F.slice(ring, 1, n - 1), F.slice(ring, 2, n - 1))
        return F.exists(
            edges,
            lambda e: (F.greatest(e["0"][0], e["1"][0]) >= rx_lo)
            & (F.least(e["0"][0], e["1"][0]) <= rx_hi)
            & (F.greatest(e["0"][1], e["1"][1]) >= ry_lo)
            & (F.least(e["0"][1], e["1"][1]) <= ry_hi),
        )

    cx, cy = grid.center
    center_cell = cells.cell_id(F.lit(float(cx)), F.lit(float(cy)), grid)
    full = (
        (F.col("_g_cell") != center_cell)
        & ~F.exists(F.col("coord"), edge_bbox_overlaps)
        & ray_cast_inside(rx_lo, ry_lo, F.col("coord"))
    )
    # localCheckpoint cuts the lineage so the classification is computed
    # ONCE when the broadcast relation is built — without it the optimizer
    # collapses the _full projection INTO the join condition and every
    # probe re-runs the whole cell classification (measured 5x slower
    # than the plain ray cast). Lazy: materializes at broadcast build.
    index = F.broadcast(
        raw.withColumn("_full", full).localCheckpoint(eager=False)
    )
    # refine lives in the join condition: evaluated exactly at the hash
    # join's probe, immune to pushdown/replan mangling
    cond = (points["cell_id"] == index["_g_cell"]) & (
        index["_full"]
        | ray_cast_inside(points[x], points[y], index["coord"])
    )
    cand = points.join(index, cond)
    out_cols = point_cols or [c for c in points.columns if c != "cell_id"]
    return cand.select(*[points[c] for c in out_cols], index["geo_id"])
