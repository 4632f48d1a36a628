"""HTML text extraction and coordinate mining over the pages table
(url, warc_ts, html, text, lang).

The contract (BASELINE.json input_hint): per-url extracted text must be
byte-identical between the canonical single-process extractor
(``extract_text_py``) and the distributed Arrow-batched twin
(``with_extracted_text``). The extractor is deliberately simple and fully
specified: concatenate the contents of <p>…</p> blocks (joined by "\\n"),
strip any nested tags, decode the five core HTML entities. Determinism is
the spec — no heuristics, no encoding sniffing (UTF-8 only).

Coordinate mining (``mine_coordinates_py`` / ``pages_to_points``): decimal
"lat, lon" mentions with exactly 6 decimals, the geotagged-point source for
the trajectory pipeline — the web-table analog of the reference's POLYLINE
explosion (/root/reference/trajlib/data_processing/data_reader/
porto.py:19-49): url plays traj_id, point k gets timestamp
warc_ts + 15k seconds (the reference's fixed 15-s cadence, porto.py:26-28),
and the strict bbox filter mirrors inrange
(/root/reference/fedtraj/utils/preprocessing_porto.py:24-33).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import MAX_LAT, MAX_LON, MIN_LAT, MIN_LON
from ..functions.projection import merc_x, merc_y

_P_BLOCK = re.compile(rb"<p(?:\s[^>]*)?>(.*?)</p>", re.DOTALL)
_TAG = re.compile(rb"<[^>]*>")
_ENTITIES = [
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&amp;", b"&"),  # must be last: &amp;lt; → &lt; (not <)
]

COORD_RE = re.compile(r"(-?\d{1,3}\.\d{6}), (-?\d{1,3}\.\d{6})")


def extract_text_py(html: bytes) -> str:
    """Canonical extractor — the byte-identity oracle."""
    parts = []
    for block in _P_BLOCK.findall(html):
        block = _TAG.sub(b"", block)
        for ent, rep in _ENTITIES:
            block = block.replace(ent, rep)
        parts.append(block)
    return b"\n".join(parts).decode("utf-8")


def with_extracted_text(pages: DataFrame, html_col: str = "html",
                        out_col: str = "extracted_text") -> DataFrame:
    """Arrow-batched twin of extract_text_py (bytes → str per batch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [extract_text_py(bytes(b)) for b in pdf[html_col]]
            yield pdf

    from pyspark.sql import types as T

    schema = T.StructType(
        list(pages.schema.fields) + [T.StructField(out_col, T.StringType())]
    )
    return pages.mapInPandas(run, schema)


def mine_coordinates_py(text: str) -> list[tuple[float, float]]:
    """(lat, lon) mentions in order of appearance."""
    return [(float(a), float(b)) for a, b in COORD_RE.findall(text)]


def pages_to_points(
    pages: DataFrame,
    text_col: str = "text",
    bbox_filter: bool = True,
    project: bool = True,
    method: str = "jvm",
) -> DataFrame:
    """(url, pos, ts_ms, lon, lat[, x, y]): one row per in-bbox coordinate
    mention.

    method='jvm' (default, the hot path): regexp_extract_all +
    posexplode — the whole mining stage stays inside whole-stage codegen,
    no Python boundary at all. method='arrow' is the pandas-UDF twin
    (same output, equality-tested) kept for parity with the pure-python
    canonical miner. Everything downstream (bbox predicate, 15-s cadence
    timestamps, Mercator projection) is pure Catalyst either way."""
    if method == "jvm":
        pat = r"(-?\d{1,3}\.\d{6}), (-?\d{1,3}\.\d{6})"
        pts = (
            pages.select(
                "url",
                F.unix_millis(F.col("warc_ts").cast("timestamp")).alias("base_ms"),
                F.posexplode(
                    F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
                ).alias("pos", "mention"),
            )
            .select(
                "url",
                "base_ms",
                "pos",
                F.split("mention", ", ").getItem(0).cast("double").alias("lat"),
                F.split("mention", ", ").getItem(1).cast("double").alias("lon"),
            )
        )
    elif method == "arrow":

        def mine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                urls, base_ms, poss, lats, lons = [], [], [], [], []
                ts_ms = (pdf["warc_ts"].astype("int64") // 10**6).to_numpy()
                for u, t, txt in zip(pdf["url"], ts_ms, pdf[text_col]):
                    for k, (la, lo) in enumerate(mine_coordinates_py(txt or "")):
                        urls.append(u)
                        base_ms.append(int(t))
                        poss.append(k)
                        lats.append(la)
                        lons.append(lo)
                yield pd.DataFrame(
                    {"url": urls, "base_ms": base_ms, "pos": poss,
                     "lat": lats, "lon": lons}
                )

        pts = pages.select("url", "warc_ts", text_col).mapInPandas(
            mine, "url string, base_ms long, pos int, lat double, lon double"
        )
    else:
        raise ValueError("method must be 'jvm' or 'arrow'")

    pts = pts.select(
        "url",
        "pos",
        (F.col("base_ms") + F.col("pos") * F.lit(15000)).alias("ts_ms"),
        "lon",
        "lat",
    )
    if bbox_filter:
        # strict inequalities, exactly like the reference's inrange
        pts = pts.where(
            (F.col("lon") > F.lit(MIN_LON))
            & (F.col("lon") < F.lit(MAX_LON))
            & (F.col("lat") > F.lit(MIN_LAT))
            & (F.col("lat") < F.lit(MAX_LAT))
        )
    if project:
        pts = pts.withColumns({"x": merc_x(F.col("lon")), "y": merc_y(F.col("lat"))})
    return pts
