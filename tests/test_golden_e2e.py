"""End-to-end golden test (survey §5.4 / FIXTURES §F6): the full pages
pipeline over a tiny deterministic input must equal the committed golden
parquet exactly (sorted frame equality). Regenerate with
`python tests/test_golden_e2e.py` after an INTENTIONAL semantic change —
the diff then shows up in review."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
N_PAGES = 200
SF = "/root/testdata/sf0.001"


def _compute(spark):
    from trajlib_spark.config import PORTO_GRID
    from trajlib_spark.operators import cells, extract, raster, spatial_join, staypoints
    from trajlib_spark.sources import pages as pages_src
    from trajlib_spark.sources import synth

    G = PORTO_GRID
    pg = pages_src.generate_pages(spark, N_PAGES)
    pts = cells.with_cell(extract.pages_to_points(pg), G)
    polys = synth.synthetic_polygons(spark, SF)
    out = {}
    out["points"] = pts.select(
        "url", "pos", "ts_ms", "cell_id", "i_x", "i_y",
        F.round("lon", 6).alias("lon_r"), F.round("lat", 6).alias("lat_r"),
    )
    out["pip"] = spatial_join.point_in_polygon(
        pts, polys, G, point_cols=["url", "pos"]
    )
    out["collapsed"] = staypoints.collapse_consecutive_cells(
        pts, G, traj="url", order=["ts_ms", "pos"]
    ).select("url", "pos", "seq", "cell_id")
    out["tiles"] = raster.tile_counts(pts, G)
    return out


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("table", ["points", "pip", "collapsed", "tiles"])
def test_golden(spark, table):
    path = os.path.join(GOLDEN_DIR, f"{table}.parquet")
    assert os.path.exists(path), "golden missing — run this file as a script"
    got = _canon(_compute(spark)[table].toPandas())
    want = _canon(pd.read_parquet(path))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


if __name__ == "__main__":
    from trajlib_spark.session import get_spark

    spark = get_spark(master="local[4]")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, df in _compute(spark).items():
        _canon(df.toPandas()).to_parquet(os.path.join(GOLDEN_DIR, f"{name}.parquet"))
        print("wrote", name)
    spark.stop()
