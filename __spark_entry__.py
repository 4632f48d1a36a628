"""Driver contract for the spark-graft builder (PySpark target).

Every operator from SURVEY.md §2 that is SQL-expressible has BOTH a
``queries()`` entry (the engine's DataFrame plan) and an ``oracle_sql()``
entry (equivalent DuckDB SQL over the same parquet views). Parity-critical
arithmetic lives once in trajlib_spark.sources.synth / trajlib_spark.config
and is interpolated into both sides. Non-SQL-expressible operators
(TRACLUS, DP similarity kernels, DBSCAN, MinHash) ship as rows-only checks
backed by numpy-oracle pytest coverage in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trajlib_spark.config import (
    DIST_FEATURE_SCALE,
    PORTO_GRID,
    SESSION_GAP_S,
)
from trajlib_spark.operators import ann as ann_ops
from trajlib_spark.operators import cells as cell_ops
from trajlib_spark.operators import cluster as cluster_ops
from trajlib_spark.operators import dedup as dedup_ops
from trajlib_spark.operators import extract as extract_ops
from trajlib_spark.operators import features as feat_ops
from trajlib_spark.operators import knn as knn_ops
from trajlib_spark.operators import raster as raster_ops
from trajlib_spark.operators import segment as segment_ops
from trajlib_spark.operators import similarity as simi_ops
from trajlib_spark.operators import spatial_join as sj_ops
from trajlib_spark.operators import staypoints as stay_ops
from trajlib_spark.operators import text as text_ops
from trajlib_spark.sources import pages as pages_src
from trajlib_spark.sources import synth
from trajlib_spark.sources.synth import dlit

G = PORTO_GRID
_L = dlit

# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth.synthetic_points(spark, sf_dir)


def _points_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cell_ops.with_cell(_points(spark, sf_dir), G)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# DuckDB CTE: synthetic points with cell assignment (mirrors operators.cells)
def _cells_sql() -> str:
    inb = (
        f"(x >= {_L(G.x_min)} AND x <= {_L(G.x_max)} "
        f"AND y >= {_L(G.y_min)} AND y <= {_L(G.y_max)})"
    )
    cx, cy = G.center
    return f"""
SELECT point_id, traj_id, ts_ms, x, y, i_x, i_y,
       i_x * {G.y_size} + i_y AS cell_id
FROM (
  SELECT point_id, traj_id, ts_ms, x, y,
         CAST(floor(floor(cxx - {_L(G.x_min)}) / {_L(G.x_unit)}) AS BIGINT) AS i_x,
         CAST(floor(floor(cyy - {_L(G.y_min)}) / {_L(G.y_unit)}) AS BIGINT) AS i_y
  FROM (
    SELECT point_id, traj_id, ts_ms, x, y,
           CASE WHEN {inb} THEN x ELSE {_L(cx)} END AS cxx,
           CASE WHEN {inb} THEN y ELSE {_L(cy)} END AS cyy
    FROM pts
  ) clamped
) idx
"""


_PRELUDE = f"WITH pts AS ({synth.points_sql('duckdb')}), cells AS ({_cells_sql()})"


# ---------------------------------------------------------------------------
# geospatial queries
# ---------------------------------------------------------------------------

def q_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _points(spark, sf_dir).select(
        "point_id",
        "traj_id",
        "ts_ms",
        F.round("lon", 6).alias("lon_r"),
        F.round("lat", 6).alias("lat_r"),
    )


SQL_POINTS = f"""
WITH pts AS ({synth.points_sql('duckdb')})
SELECT point_id, traj_id, ts_ms,
       round(lon, 6) AS lon_r, round(lat, 6) AS lat_r
FROM pts
"""


def q_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _points_cells(spark, sf_dir).select("point_id", "i_x", "i_y", "cell_id")


SQL_CELL_ASSIGN = f"{_PRELUDE}\nSELECT point_id, i_x, i_y, cell_id FROM cells"


def q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return raster_ops.tile_counts(_points(spark, sf_dir), G, zooms=(0, 1, 2, 3)).select(
        F.col("zoom").cast("long").alias("zoom"), "i_x", "i_y", "cell_id", "cnt"
    )


def _sql_tile_pyramid() -> str:
    lvls = []
    for z in (0, 1, 2, 3):
        gz = G.at_zoom(z)
        d = float(2 ** z)
        lvls.append(f"""
SELECT CAST({z} AS BIGINT) AS zoom, i_x, i_y,
       i_x * {gz.y_size} + i_y AS cell_id, cnt
FROM (
  SELECT CAST(floor(CAST(bi_x AS DOUBLE) / {_L(d)}) AS BIGINT) AS i_x,
         CAST(floor(CAST(bi_y AS DOUBLE) / {_L(d)}) AS BIGINT) AS i_y,
         count(*) AS cnt
  FROM (SELECT i_x AS bi_x, i_y AS bi_y FROM cells) b
  GROUP BY 1, 2
) z{z}""")
    return _PRELUDE + "\n" + "\nUNION ALL\n".join(lvls)


SQL_TILE_PYRAMID = _sql_tile_pyramid()


def q_stay_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = stay_ops.collapse_consecutive_cells(
        _points_cells(spark, sf_dir), G, traj="traj_id", order=["ts_ms", "point_id"]
    )
    return out.select(
        "traj_id", F.col("seq").cast("long").alias("seq"), "point_id", "cell_id"
    )


SQL_STAY_COLLAPSE = f"""{_PRELUDE},
flagged AS (
  SELECT *, lag(cell_id) OVER (PARTITION BY traj_id ORDER BY ts_ms, point_id) AS prev_cell
  FROM cells
),
kept AS (SELECT * FROM flagged WHERE prev_cell IS NULL OR cell_id <> prev_cell)
SELECT traj_id,
       CAST(row_number() OVER (PARTITION BY traj_id ORDER BY ts_ms, point_id) - 1 AS BIGINT) AS seq,
       point_id, cell_id
FROM kept
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = stay_ops.sessionize(
        _points(spark, sf_dir), traj="traj_id", ts_ms="ts_ms",
        order_tiebreak="point_id", gap_s=SESSION_GAP_S, min_points=2,
    )
    return s.groupBy("traj_id", F.col("session_idx").cast("long").alias("session_idx")).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("ts_ms").alias("start_ms"),
        F.max("ts_ms").alias("end_ms"),
    )


SQL_SESSIONIZE = f"""
WITH pts AS ({synth.points_sql('duckdb')}),
gaps AS (
  SELECT traj_id, point_id, ts_ms,
         CASE WHEN ts_ms - lag(ts_ms) OVER w > {SESSION_GAP_S * 1000} THEN 1 ELSE 0 END AS brk
  FROM pts WINDOW w AS (PARTITION BY traj_id ORDER BY ts_ms, point_id)
),
sess AS (
  SELECT traj_id, point_id, ts_ms,
         sum(brk) OVER (PARTITION BY traj_id ORDER BY ts_ms, point_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM gaps
)
SELECT traj_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_points, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
FROM sess
GROUP BY traj_id, session_idx
HAVING count(*) >= 2
"""


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    polys = synth.synthetic_polygons(spark, sf_dir)
    return sj_ops.point_in_polygon(
        _points_cells(spark, sf_dir), polys, G, point_cols=["point_id"]
    ).select("point_id", "geo_id")


SQL_PIP_JOIN = f"""
WITH pts AS ({synth.points_sql('duckdb')}),
edges AS ({synth.polygon_edges_sql()})
SELECT p.point_id, e.geo_id
FROM pts p JOIN edges e ON TRUE
GROUP BY p.point_id, e.geo_id
HAVING sum(CASE WHEN {synth.pip_crossing_case('p.x', 'p.y', 'e')} THEN 1 ELSE 0 END) % 2 = 1
"""


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    queries = pts.where(F.col("point_id") % 97 == 0)
    out = knn_ops.knn_join(pts, queries, G, k=5)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
    )


SQL_KNN = f"""
WITH pts AS ({synth.points_sql('duckdb')}),
q AS (SELECT * FROM pts WHERE point_id % 97 = 0)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT q.point_id AS query_id, p.point_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.point_id
           ORDER BY (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y), p.point_id
         ) AS rank
  FROM q JOIN pts p ON p.point_id <> q.point_id
) ranked
WHERE rank <= 5
"""


def q_spatial_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = feat_ops.spatial_features(
        _points(spark, sf_dir), G, traj="traj_id", order=["ts_ms", "point_id"]
    )
    return out.select(
        "point_id",
        F.round("x_norm", 6).alias("x_norm_r"),
        F.round("y_norm", 6).alias("y_norm_r"),
        F.round("dist_feat", 6).alias("dist_r"),
        F.round("radian_feat", 6).alias("radian_r"),
    )


SQL_SPATIAL_FEATURES = f"""
WITH pts AS ({synth.points_sql('duckdb')}),
nbr AS (
  SELECT point_id, x, y,
         lag(x) OVER w AS xp, lag(y) OVER w AS yp,
         lead(x) OVER w AS xn, lead(y) OVER w AS yn
  FROM pts WINDOW w AS (PARTITION BY traj_id ORDER BY ts_ms, point_id)
)
SELECT point_id,
  round((x - {_L(G.x_min)}) / {_L(G.x_max - G.x_min)}, 6) AS x_norm_r,
  round((y - {_L(G.y_min)}) / {_L(G.y_max - G.y_min)}, 6) AS y_norm_r,
  round(CASE WHEN xp IS NOT NULL AND xn IS NOT NULL THEN
    ((sqrt((x - xp) * (x - xp) + (y - yp) * (y - yp))
      + sqrt((xn - x) * (xn - x) + (yn - y) * (yn - y))) / 2.0e0) / {_L(DIST_FEATURE_SCALE)}
    ELSE 0.0e0 END, 6) AS dist_r,
  round(CASE WHEN xp IS NOT NULL AND xn IS NOT NULL THEN
    1.0e0 - abs({_L(3.141592653589793)} - atan2(xp - x, yp - y) + atan2(xn - x, yn - y))
      / {_L(3.141592653589793)}
    ELSE 0.0e0 END, 6) AS radian_r
FROM nbr
"""


def q_kinematics(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = feat_ops.kinematics(_points(spark, sf_dir))
    return out.select(
        "point_id",
        F.round("step_m", 3).alias("step_r"),
        F.round("speed_mps", 4).alias("speed_r"),
        F.round("bearing_rad", 3).alias("bearing_r"),
    )


SQL_KINEMATICS = f"""
WITH pts AS ({synth.points_sql('duckdb')}),
nbr AS (
  SELECT point_id, x, y, ts_ms,
         lag(x) OVER w AS xp, lag(y) OVER w AS yp, lag(ts_ms) OVER w AS tp
  FROM pts WINDOW w AS (PARTITION BY traj_id ORDER BY ts_ms, point_id)
)
SELECT point_id,
  round(sqrt((x - xp) * (x - xp) + (y - yp) * (y - yp)), 3) AS step_r,
  round(CASE WHEN (ts_ms - tp) / 1000.0e0 > 0
        THEN sqrt((x - xp) * (x - xp) + (y - yp) * (y - yp)) / ((ts_ms - tp) / 1000.0e0)
        END, 4) AS speed_r,
  round(atan2(y - yp, x - xp), 3) AS bearing_r
FROM nbr
"""


def q_bearing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference tool_funcs.radian bearings of consecutive lon/lat steps."""
    from pyspark.sql import Window
    from trajlib_spark.functions.geometry import bearing_radian

    pts = _points(spark, sf_dir)
    w = Window.partitionBy("traj_id").orderBy("ts_ms", "point_id")
    lp, lt = F.lag("lon").over(w), F.lag("lat").over(w)
    return pts.select(
        "point_id",
        bearing_radian(lp, lt, F.col("lon"), F.col("lat")).alias("bearing_ref"),
    ).where(F.col("bearing_ref").isNotNull())


SQL_BEARING = f"""
WITH pts AS ({synth.points_sql('duckdb')}),
nbr AS (
  SELECT point_id, lon, lat, lag(lon) OVER w AS lp, lag(lat) OVER w AS lt
  FROM pts WINDOW w AS (PARTITION BY traj_id ORDER BY ts_ms, point_id)
)
SELECT point_id,
  round(CASE
    WHEN lon - lp = 0 AND lat - lt >= 0 THEN {_L(1.5707963267948966)}
    WHEN lon - lp = 0 THEN {_L(4.71238898038469)}
    WHEN lon - lp < 0 THEN atan((lat - lt) / (lon - lp)) + {_L(3.141592653589793)}
    WHEN lat - lt < 0 THEN atan((lat - lt) / (lon - lp)) + {_L(6.283185307179586)}
    ELSE atan((lat - lt) / (lon - lp)) END, 3) AS bearing_ref
FROM nbr WHERE lp IS NOT NULL
"""


def q_traj_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = feat_ops.traj_stats(_points(spark, sf_dir))
    return out.select(
        "traj_id",
        "n_points",
        F.round("path_m", 2).alias("path_r"),
        F.round("chord_m", 2).alias("chord_r"),
        F.round("sinuosity", 4).alias("sinuosity_r"),
        F.round("travel_time_s", 1).alias("tt_r"),
    )


SQL_TRAJ_STATS = f"""
WITH pts AS ({synth.points_sql('duckdb')}),
stepped AS (
  SELECT traj_id, point_id, ts_ms, x, y,
         sqrt((x - lag(x) OVER w) * (x - lag(x) OVER w)
              + (y - lag(y) OVER w) * (y - lag(y) OVER w)) AS step,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY traj_id) AS n
  FROM pts WINDOW w AS (PARTITION BY traj_id ORDER BY ts_ms, point_id)
),
agg AS (
  SELECT traj_id, count(*) AS n_points,
         coalesce(sum(step), 0.0e0) AS path_m,
         min(ts_ms) AS t0, max(ts_ms) AS t1,
         arg_min(x, rn) AS x0, arg_min(y, rn) AS y0,
         arg_max(x, rn) AS x1, arg_max(y, rn) AS y1
  FROM stepped GROUP BY traj_id
)
SELECT traj_id, n_points, round(path_m, 2) AS path_r,
       round(sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)), 2) AS chord_r,
       round(CASE WHEN sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)) > 0
             THEN path_m / sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)) END, 4) AS sinuosity_r,
       round((t1 - t0) / 1000.0e0, 1) AS tt_r
FROM agg
"""


def q_segment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined segment distance d1 + d2 (endpoint + angular,
    clustering.py:57-83) over whole-trajectory chords, blocked by
    fed_id = traj_id % 5 (federation semantics)."""
    stats = feat_ops.traj_stats(_points(spark, sf_dir))
    pts = _points(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("traj_id").orderBy("ts_ms", "point_id")
    ends = (
        pts.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("traj_id")))
        .where((F.col("rn") == 1) | (F.col("rn") == F.col("n")))
        .groupBy("traj_id")
        .agg(
            F.min_by(F.struct("x", "y"), "rn").alias("s"),
            F.max_by(F.struct("x", "y"), "rn").alias("e"),
        )
        .select(
            "traj_id",
            (F.col("traj_id") % 5).alias("fed_id"),
            F.col("s.x").alias("sx"), F.col("s.y").alias("sy"),
            F.col("e.x").alias("ex"), F.col("e.y").alias("ey"),
        )
    )
    a = ends.alias("a")
    b = ends.alias("b")
    j = a.join(b, (F.col("a.fed_id") == F.col("b.fed_id"))
               & (F.col("a.traj_id") < F.col("b.traj_id")))
    d1 = (
        F.sqrt((F.col("b.sx") - F.col("a.sx")) ** 2 + (F.col("b.sy") - F.col("a.sy")) ** 2)
        + F.sqrt((F.col("b.ex") - F.col("a.ex")) ** 2 + (F.col("b.ey") - F.col("a.ey")) ** 2)
    )
    ang_a = F.atan2(F.col("a.ey") - F.col("a.sy"), F.col("a.ex") - F.col("a.sx"))
    ang_b = F.atan2(F.col("b.ey") - F.col("b.sy"), F.col("b.ex") - F.col("b.sx"))
    diff = F.abs(ang_a - ang_b)
    diff = F.when(diff > F.lit(3.141592653589793), F.lit(6.283185307179586) - diff).otherwise(diff)
    len_a = F.sqrt((F.col("a.ex") - F.col("a.sx")) ** 2 + (F.col("a.ey") - F.col("a.sy")) ** 2)
    len_b = F.sqrt((F.col("b.ex") - F.col("b.sx")) ** 2 + (F.col("b.ey") - F.col("b.sy")) ** 2)
    d2 = F.abs(F.sin(diff)) * F.greatest(len_a, len_b)
    return j.select(
        F.col("a.traj_id").alias("i"),
        F.col("b.traj_id").alias("j"),
        F.round(d1, 3).alias("d1_r"),
        F.round(d2, 3).alias("d2_r"),
        F.round(d1 + d2, 3).alias("d_r"),
    )


SQL_SEGMENT_PAIRS = f"""
WITH pts AS ({synth.points_sql('duckdb')}),
stepped AS (
  SELECT traj_id, x, y, row_number() OVER (PARTITION BY traj_id ORDER BY ts_ms, point_id) AS rn
  FROM pts
),
ends AS (
  SELECT traj_id, traj_id % 5 AS fed_id,
         arg_min(x, rn) AS sx, arg_min(y, rn) AS sy,
         arg_max(x, rn) AS ex, arg_max(y, rn) AS ey
  FROM stepped GROUP BY traj_id
),
pairs AS (
  SELECT a.traj_id AS i, b.traj_id AS j,
         sqrt((b.sx - a.sx) * (b.sx - a.sx) + (b.sy - a.sy) * (b.sy - a.sy))
         + sqrt((b.ex - a.ex) * (b.ex - a.ex) + (b.ey - a.ey) * (b.ey - a.ey)) AS d1,
         atan2(a.ey - a.sy, a.ex - a.sx) AS ang_a,
         atan2(b.ey - b.sy, b.ex - b.sx) AS ang_b,
         sqrt((a.ex - a.sx) * (a.ex - a.sx) + (a.ey - a.sy) * (a.ey - a.sy)) AS len_a,
         sqrt((b.ex - b.sx) * (b.ex - b.sx) + (b.ey - b.sy) * (b.ey - b.sy)) AS len_b
  FROM ends a JOIN ends b ON a.fed_id = b.fed_id AND a.traj_id < b.traj_id
)
SELECT i, j, round(d1, 3) AS d1_r,
  round(abs(sin(CASE WHEN abs(ang_a - ang_b) > {_L(3.141592653589793)}
                THEN {_L(6.283185307179586)} - abs(ang_a - ang_b)
                ELSE abs(ang_a - ang_b) END)) * greatest(len_a, len_b), 3) AS d2_r,
  round(d1 + abs(sin(CASE WHEN abs(ang_a - ang_b) > {_L(3.141592653589793)}
                THEN {_L(6.283185307179586)} - abs(ang_a - ang_b)
                ELSE abs(ang_a - ang_b) END)) * greatest(len_a, len_b), 3) AS d_r
FROM pairs
"""


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_ops.exact_duplicates(_docs(spark, sf_dir))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, min(doc_id) AS keeper, count(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        text_ops.word_count(F.col("text")).alias("n_words"),
        F.length("text").cast("long").alias("n_chars_live"),
    )


SQL_TOKEN_COUNT = """
SELECT doc_id,
       CAST((length(text) - length(replace(text, ' ', ''))) / 1 AS BIGINT) + 1 AS n_words,
       CAST(length(text) AS BIGINT) AS n_chars_live
FROM documents
"""


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = text_ops.with_quality(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_words",
        F.round("punct_ratio", 6).alias("punct_r"),
        F.round("avg_word_len", 6).alias("awl_r"),
        F.round("quality_score", 6).alias("quality_r"),
    )


def _sql_quality() -> str:
    occ = lambda n: f"CAST((length(text) - length(replace(text, '{n}', ''))) / {len(n)} AS BIGINT)"
    punct = " + ".join(occ(p) for p in text_ops.PUNCT)
    nw = f"({occ(' ')} + 1)"
    awl = f"(CAST(length(text) - ({nw} - 1) AS DOUBLE) / CAST({nw} AS DOUBLE))"
    pr = f"(CAST({punct} AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE))"
    score = (
        f"least(CAST({nw} AS DOUBLE) / 64.0e0, 1.0e0) * 0.4e0"
        f" + CASE WHEN {awl} >= 3.0e0 AND {awl} <= 10.0e0 THEN 0.3e0 ELSE 0.0e0 END"
        f" + CASE WHEN {pr} > 0.0e0 AND {pr} < 0.1e0 THEN 0.3e0 ELSE 0.0e0 END"
    )
    return f"""
SELECT doc_id, {nw} AS n_words,
       round({pr}, 6) AS punct_r,
       round({awl}, 6) AS awl_r,
       round({score}, 6) AS quality_r
FROM documents
"""


SQL_QUALITY = _sql_quality()


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.with_lang_id(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def _sql_lang_id() -> str:
    t = "concat(' ', lower(text), ' ')"
    hit_exprs = {}
    for lang, markers in text_ops.LANG_MARKERS.items():
        terms = " + ".join(
            f"CAST((length({t}) - length(replace({t}, '{m}', ''))) / {len(m)} AS BIGINT)"
            for m in markers
        )
        hit_exprs[lang] = terms
    langs = sorted(text_ops.LANG_MARKERS)
    # argmax, ties to alphabetically-first — the >= chain in alpha order
    case = "CASE "
    for i, lang in enumerate(langs):
        conds = " AND ".join(
            f"h_{lang} >= h_{other}" for other in langs[i + 1 :]
        )
        case += f"WHEN {conds or 'TRUE'} THEN '{lang}' "
    case += "END"
    mx = f"greatest({', '.join('h_' + l for l in langs)})"
    hits_sel = ", ".join(f"{expr} AS h_{lang}" for lang, expr in hit_exprs.items())
    return f"""
WITH hits AS (SELECT doc_id, {hits_sel} FROM documents)
SELECT doc_id, CASE WHEN {mx} > 0 THEN {case} ELSE 'und' END AS lang_pred
FROM hits
"""


SQL_LANG_ID = _sql_lang_id()


def q_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % 50 == 0)
    out = ann_ops.cosine_topk(embs, queries, k=10)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
    )


SQL_ANN_COSINE = """
WITH ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         sum(a.v * b.v) AS dot,
         sqrt(sum(a.v * a.v)) AS na, sqrt(sum(b.v * b.v)) AS nb
  FROM ex a JOIN ex b ON a.i = b.i
  WHERE a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY dot / (na * nb) DESC, neighbor_id) AS rank
  FROM dots
) r WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible; numpy-oracle-tested in tests/)
# ---------------------------------------------------------------------------

def q_segment_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = segment_ops.segment_trajectories(_points(spark, sf_dir))
    return out.select(
        "traj_id",
        F.col("seg_idx").cast("long").alias("seg_idx"),
        F.col("start_idx").cast("long").alias("start_idx"),
        F.col("end_idx").cast("long").alias("end_idx"),
        F.col("n_points").cast("long").alias("n_points"),
    )


def q_rdp_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = segment_ops.simplify_trajectories(_points(spark, sf_dir), epsilon=100.0)
    return out.where(F.col("rdp_keep")).select("traj_id", "point_id")


def q_similarity_edwp(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).withColumn("fed_id", F.col("traj_id") % 5)
    polys = simi_ops.collect_polylines(
        pts.select("traj_id", "fed_id", "ts_ms", "point_id", "x", "y")
    ).join(pts.select("traj_id", "fed_id").distinct(), "traj_id")
    d = simi_ops.similarity_join(polys, "edwp", block_col="fed_id")
    return d.select("i", "j", F.round("dist", 3).alias("dist_r"))


def q_similarity_lcss(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir).withColumn("fed_id", F.col("traj_id") % 5)
    polys = simi_ops.collect_polylines(
        pts.select("traj_id", "fed_id", "ts_ms", "point_id", "x", "y")
    ).join(pts.select("traj_id", "fed_id").distinct(), "traj_id")
    normed = simi_ops.normalize_polylines(polys)
    d = simi_ops.similarity_join(normed, "lcss", eps=0.25, block_col="fed_id")
    return d.select("i", "j", F.round("dist", 6).alias("dist_r"))


def q_cluster_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = segment_ops.segment_trajectories(_points(spark, sf_dir))
    segs = segs.where(F.col("n_points") >= 2).select(
        (F.col("traj_id").cast("long") % 5).cast("int").alias("fed_id"),
        (F.col("traj_id").cast("long") * 1000 + F.col("seg_idx")).alias("segment_id"),
        F.element_at("seg_xs", 1).alias("start_x"),
        F.element_at("seg_ys", 1).alias("start_y"),
        F.element_at("seg_xs", -1).alias("end_x"),
        F.element_at("seg_ys", -1).alias("end_y"),
        F.transform(
            F.sequence(F.lit(0), F.lit(31)),
            lambda k: F.sin(F.col("seg_idx") * 0.7 + k * 0.31),
        ).alias("emb"),
    )
    return cluster_ops.cluster_segments(segs, eps=50000.0, min_samples=2).select(
        F.col("fed_id").cast("long").alias("fed_id"), "segment_id", "label"
    )


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sigs = dedup_ops.minhash_signatures(docs)
    cands = dedup_ops.lsh_candidates(sigs)
    return dedup_ops.ngram_jaccard_verify(docs, cands, threshold=0.5).select(
        "i", "j", F.round("jaccard", 4).alias("jaccard_r")
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dedup_ops.simhash_signatures(_docs(spark, sf_dir))
    return dedup_ops.simhash_candidates(sigs, max_hamming=10).select(
        "i", "j", F.col("hamming").cast("long").alias("hamming")
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_ops.with_fingerprint(_docs(spark, sf_dir)).select("doc_id", "fingerprint")


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % 50 == 0)
    centroids = ann_ops.train_centroids(embs, n_list=32)
    out = ann_ops.ivf_topk(embs, queries, k=10, centroids=centroids, n_probe=8)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
    )


def q_pages_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages-mining slice of the flagship pipeline (deterministic pages
    derived from the sf via a fixed N; rows-only — mining is regex/UDF)."""
    n = {"sf0.001": 2000, "sf0.01": 20000, "sf0.1": 100000}.get(
        sf_dir.rstrip("/").rsplit("/", 1)[-1], 2000
    )
    pg = pages_src.generate_pages(spark, n)
    pts = extract_ops.pages_to_points(pg)
    out = cell_ops.with_cell(pts, G)
    return out.select("url", "pos", "ts_ms", "cell_id")


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages → mined points → cells → PIP join on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    pg = pages_src.generate_pages(spark, 2000)
    pts = cell_ops.with_cell(extract_ops.pages_to_points(pg), G)
    polys = synth.synthetic_polygons(spark, sf_dir)
    return sj_ops.point_in_polygon(
        pts, polys, G, point_cols=["url", "pos", "cell_id"]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "points_derive": q_points,
        "cell_assign": q_cell_assign,
        "tile_pyramid": q_tile_pyramid,
        "stay_collapse": q_stay_collapse,
        "sessionize": q_sessionize,
        "pip_join": q_pip_join,
        "knn": q_knn,
        "spatial_features": q_spatial_features,
        "kinematics": q_kinematics,
        "bearing": q_bearing,
        "traj_stats": q_traj_stats,
        "segment_pairs": q_segment_pairs,
        "dedup_exact": q_dedup_exact,
        "token_count": q_token_count,
        "quality_score": q_quality,
        "lang_id": q_lang_id,
        "ann_cosine": q_ann_cosine,
        # rows-only (no SQL equivalent; numpy-oracle-tested in tests/)
        "segment_cut": q_segment_cut,
        "rdp_simplify": q_rdp_simplify,
        "similarity_edwp": q_similarity_edwp,
        "similarity_lcss": q_similarity_lcss,
        "cluster_segments": q_cluster_segments,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "doc_fingerprint": q_fingerprint,
        "ann_ivf": q_ann_ivf,
        "pages_points": q_pages_points,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "points_derive": SQL_POINTS,
        "cell_assign": SQL_CELL_ASSIGN,
        "tile_pyramid": SQL_TILE_PYRAMID,
        "stay_collapse": SQL_STAY_COLLAPSE,
        "sessionize": SQL_SESSIONIZE,
        "pip_join": SQL_PIP_JOIN,
        "knn": SQL_KNN,
        "spatial_features": SQL_SPATIAL_FEATURES,
        "kinematics": SQL_KINEMATICS,
        "bearing": SQL_BEARING,
        "traj_stats": SQL_TRAJ_STATS,
        "segment_pairs": SQL_SEGMENT_PAIRS,
        "dedup_exact": SQL_DEDUP_EXACT,
        "token_count": SQL_TOKEN_COUNT,
        "quality_score": SQL_QUALITY,
        "lang_id": SQL_LANG_ID,
        "ann_cosine": SQL_ANN_COSINE,
    }
