"""The flagship end-to-end plan (north rule): pages → extracted text →
geotagged points → cell/tile assignment → point-in-polygon join → tile
pyramid, with every stage checkpointed + lineage rows so a run resumes
mid-pipeline.

This is the web-table graft of the reference preprocess pipeline
(/root/reference/fedtraj/utils/preprocessing_porto.py:326-343): CSV→points
becomes pages→mined points; the bbox filter generalizes to the polygon
join; cell assignment is identical CellSpace arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import PORTO_GRID
from ..operators import cells, extract, raster, spatial_join, staypoints
from ..sources.store import TableStore, run_stages


def pipeline_stages(pages: DataFrame, polygons: DataFrame):
    """Stage list for run_stages: each step reads its input from the store
    (so resume works) except the first, which reads the live pages frame."""
    grid = PORTO_GRID

    def s_pages(spark, store):
        return pages

    def s_points(spark, store):
        pg = store.load(spark, "pages")
        return extract.pages_to_points(pg)

    def s_cells(spark, store):
        pts = store.load(spark, "points")
        return cells.with_cell(pts, grid)

    def s_collapsed(spark, store):
        pts = store.load(spark, "cells")
        return staypoints.collapse_consecutive_cells(
            pts, grid, traj="url", order=["ts_ms", "pos"]
        )

    def s_pip(spark, store):
        pts = store.load(spark, "cells")
        return spatial_join.point_in_polygon(
            pts, polygons, grid, point_cols=["url", "pos", "cell_id"]
        )

    def s_tiles(spark, store):
        pts = store.load(spark, "cells")
        return raster.tile_counts(pts, grid)

    return [
        ("pages", s_pages),
        ("points", s_points),
        ("cells", s_cells),
        ("collapsed", s_collapsed),
        ("pip_join", s_pip),
        ("tiles", s_tiles),
    ]


def run_pages_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    polygons: DataFrame,
    store: TableStore,
    resume: bool = True,
) -> dict[str, str]:
    return run_stages(spark, store, pipeline_stages(pages, polygons), resume=resume)
