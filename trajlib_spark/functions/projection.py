"""Web-Mercator projection as pure Catalyst column expressions.

Semantics: /root/reference/fedtraj/utils/tool_funcs.py:101-115 (lonlat2meters
/ meters2lonlat). Kept as column expressions — no UDF — so projection stays
inside whole-stage codegen and Catalyst can pipeline it with the parquet
scan. The multiplication order matches the reference exactly so results are
bit-identical to the scalar oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import DEG2RAD, MERC_Y_SCALE, SEMI_MAJOR_AXIS


def merc_x(lon: Column) -> Column:
    """x = 6378137.0 * (lon * 0.017453292519943295)."""
    return F.lit(SEMI_MAJOR_AXIS) * (lon * F.lit(DEG2RAD))


def merc_y(lat: Column) -> Column:
    """y = 3189068.5 * ln((1 + sin(lat_rad)) / (1 - sin(lat_rad)))."""
    t = F.sin(lat * F.lit(DEG2RAD))
    return F.lit(MERC_Y_SCALE) * F.log((F.lit(1.0) + t) / (F.lit(1.0) - t))


def inv_merc_lon(x: Column) -> Column:
    return x / F.lit(SEMI_MAJOR_AXIS) / F.lit(DEG2RAD)


def inv_merc_lat(y: Column) -> Column:
    t = F.exp(y / F.lit(MERC_Y_SCALE))
    return F.asin((t - F.lit(1.0)) / (t + F.lit(1.0))) / F.lit(DEG2RAD)
