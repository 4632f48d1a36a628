"""Benchmark harness. Prints ONE JSON line:
{"metric": "pages_per_sec_pip_tiles", "value": N, "unit": "sec", ...,
 "queries": {name: seconds}, "sf": ..., "scaling": {...}}

Headline = the north-rule metric: spatial-join + tile-assignment throughput
(pages/sec) over the deterministic pages table — extract → project → cell
assign → PIP join against the broadcast polygon set → tile pyramid, results
sunk to a noop writer (compute measured, not disk).

Scaling evidence (BASELINE.md §3): the same job at local[8] (N) and
local[32] (4N), efficiency = throughput_32 / (4 × throughput_8).
``--scaling`` additionally writes BENCH/BASELINE.md with ≥3 timed runs.

Usage: python bench.py [--scaling]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from trajlib_spark.config import PORTO_GRID  # noqa: E402
from trajlib_spark.operators import cells, extract, raster, spatial_join  # noqa: E402
from trajlib_spark.session import get_spark, stop_spark  # noqa: E402
from trajlib_spark.sources import pages as pages_src  # noqa: E402
from trajlib_spark.sources import synth  # noqa: E402

G = PORTO_GRID


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def pages_for_sf(sf_dir: str) -> int:
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return {"sf0.001": 5_000, "sf0.01": 50_000, "sf0.1": 400_000}.get(name, 50_000)


def run_pipeline_once(spark, sf_dir: str, n_pages: int) -> float:
    """One timed pass of the headline job; returns seconds."""
    pg = pages_src.generate_pages(spark, n_pages, skew=True)
    pts = cells.with_cell(extract.pages_to_points(pg), G)
    polys = synth.synthetic_polygons(spark, sf_dir)
    pip = spatial_join.point_in_polygon(pts, polys, G, point_cols=["url", "pos", "cell_id"])
    tiles = raster.tile_counts(pts, G)
    t0 = time.time()
    pip.write.format("noop").mode("overwrite").save()
    tiles.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def timed_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as E

    names = [
        "cell_assign", "tile_pyramid", "stay_collapse", "sessionize",
        "pip_join", "knn", "spatial_features", "traj_stats", "segment_pairs",
        "dedup_exact", "token_count", "quality_score", "lang_id",
        "ann_cosine", "segment_cut", "minhash_lsh", "doc_fingerprint",
    ]
    qs = E.queries()
    out = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
        log(f"  q {name}: {out[name]}s")
    return out


def measure_level(cores: int, sf_dir: str, n_pages: int, runs: int) -> list[float]:
    spark = get_spark(app_name=f"bench-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    run_pipeline_once(spark, sf_dir, min(n_pages, 20_000))  # warm-up
    times = [run_pipeline_once(spark, sf_dir, n_pages) for _ in range(runs)]
    stop_spark(spark)
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scaling_mode = "--scaling" in sys.argv
    n_pages = pages_for_sf(sf_dir)
    runs = 3 if scaling_mode else 2

    log(f"bench: sf_dir={sf_dir} pages={n_pages} cpus={cpus}")
    t_small = measure_level(8, sf_dir, n_pages, runs)
    t_big = measure_level(cpus, sf_dir, n_pages, runs)
    med8, medbig = statistics.median(t_small), statistics.median(t_big)
    thr8, thrbig = n_pages / med8, n_pages / medbig
    eff = thrbig / ((cpus / 8) * thr8)
    log(f"local[8]: {med8:.2f}s ({thr8:.0f} pages/s); local[{cpus}]: "
        f"{medbig:.2f}s ({thrbig:.0f} pages/s); efficiency={eff:.3f}")

    spark = get_spark(app_name="bench-queries", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    queries = timed_queries(spark, sf_dir)
    stop_spark(spark)

    result = {
        "metric": "pages_per_sec_pip_tiles",
        "value": round(thrbig, 1),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").rsplit("/", 1)[-1],
        "pages": n_pages,
        "scaling": {
            "cores_small": 8,
            "cores_big": cpus,
            "sec_small": round(med8, 3),
            "sec_big": round(medbig, 3),
            "pages_per_sec_small": round(thr8, 1),
            "pages_per_sec_big": round(thrbig, 1),
            "efficiency": round(eff, 3),
        },
    }
    if scaling_mode:
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "w") as f:
            f.write(
                "# BENCH/BASELINE — measured throughput + scaling evidence\n\n"
                f"Job: pages → mined points → cell assign → PIP join (broadcast "
                f"polygon set) → tile pyramid, {n_pages} pages ({result['sf']}), "
                "noop sink, warm-up discarded, median of "
                f"{runs} runs per level.\n\n"
                "| level | cores | median sec | pages/sec |\n|---|---|---|---|\n"
                f"| N | 8 | {med8:.2f} | {thr8:.0f} |\n"
                f"| 4N | {cpus} | {medbig:.2f} | {thrbig:.0f} |\n\n"
                f"**Scaling efficiency (N→4N)** = throughput_4N / (4 × throughput_N) "
                f"= **{eff:.3f}** (target ≥ 0.8, BASELINE.json)\n\n"
                f"All runs: local[8]={[round(t,2) for t in t_small]}, "
                f"local[{cpus}]={[round(t,2) for t in t_big]}\n\n"
                "Per-query timings (noop sink, seconds):\n\n"
                + "\n".join(f"- {k}: {v}" for k, v in queries.items())
                + "\n"
            )
        log("wrote BENCH/BASELINE.md")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
