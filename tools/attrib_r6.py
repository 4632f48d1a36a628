"""Round-6 attribution measurements (VERDICT r5 #2/#3/#5):

1. cell_walks: same-window A/B of the catalyst join chain vs the arrow
   broadcast path at the BENCH ROW's exact shape (sf0.1 starts,
   walk_length 12, walks_per_node 2) — attributes the r5 +94% delta and
   evidences the new auto→arrow default.
2. lm_score: pre-agg ON (current operator) vs OFF (legacy raw-trigram
   scoring join) at sf0.1 (low repetition) and at 10× salted docs
   (repetition-heavy) — plus the scoring-join input rows both ways.
3. streaming machinery floor: a 2-batch passthrough replay with the same
   _replay_stream harness the streaming_* queries use — the fixed cost a
   streaming bench row pays before any data-path work.

Prints one JSON line; run in a quiet window.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trajlib_spark.config import PORTO_GRID  # noqa: E402
from trajlib_spark.operators import cells, walks as walk_ops  # noqa: E402
from trajlib_spark.session import get_spark, stop_spark  # noqa: E402

G = PORTO_GRID
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(make_df) -> float:
    """Full cost: the DataFrame is BUILT inside the timer (operators with
    internal driver-side actions — adjacency collects, model totals —
    charge them to the measurement, exactly like the bench board does)."""
    t0 = time.time()
    make_df().write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    out: dict = {"sf": SF, "loadavg": os.getloadavg()[0]}
    spark = get_spark(app_name="attrib-r6", master="local[32]",
                      shuffle_partitions=32)

    # ---- 1. cell_walks A/B at the bench-row shape ----
    import __spark_entry__ as E
    pts = E._points_cells(spark, SF)
    pairs = cells.neighbour_cell_pairs(spark, G)
    starts = pts.select("cell_id").distinct()
    for impl in ("catalyst", "arrow", "catalyst", "arrow"):  # interleaved, min-of-2
        dt = timed(lambda: walk_ops.node2vec_walks(pairs, starts, 12, 2, impl=impl))
        out.setdefault(f"cell_walks_{impl}", []).append(dt)
    spark.catalog.clearCache()

    # ---- 2. lm_score pre-agg A/B ----
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    salted = docs.select(
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("_s"), "doc_id", "text"
    ).select(
        (F.col("doc_id") + F.col("_s") * 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" #"), F.col("_s").cast("string")).alias("text"),
    )

    def lm_legacy(d):
        """Pre-r4 shape: scoring join over the RAW trigram stream."""
        tri = d.select(
            F.col("doc_id"),
            F.explode(F.sequence(F.lit(1), F.length(F.lower(F.col("text"))) - 2)).alias("_p"),
            F.lower(F.col("text")).alias("_t"),
        ).select("doc_id", F.col("_t").substr(F.col("_p"), F.lit(3)).alias("tri"))
        model = tri.groupBy("tri").agg(F.count(F.lit(1)).alias("cnt")).persist()
        total = model.agg(F.sum("cnt")).collect()[0][0]
        scored = tri.join(F.broadcast(model), "tri").select(
            "doc_id", F.log(F.col("cnt") / F.lit(float(total))).alias("_lp")
        )
        return scored.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            (F.round(F.avg("_lp"), 6) + F.lit(0.0)).alias("lm_score_r"),
        )

    from trajlib_spark.operators import text as text_ops
    for tag, d in (("sf01", docs), ("10x", salted)):
        for variant in ("preagg", "legacy", "preagg", "legacy"):
            fn = text_ops.trigram_lm_score if variant == "preagg" else lm_legacy
            dt = timed(lambda: fn(d))
            out.setdefault(f"lm_{tag}_{variant}", []).append(dt)
            spark.catalog.clearCache()
        # scoring-join input rows both ways (the quantity the pre-agg trades)
        tri = d.select(
            F.col("doc_id"),
            F.explode(F.sequence(F.lit(1), F.length(F.lower(F.col("text"))) - 2)).alias("_p"),
            F.lower(F.col("text")).alias("_t"),
        ).select("doc_id", F.col("_t").substr(F.col("_p"), F.lit(3)).alias("tri"))
        out[f"lm_{tag}_raw_rows"] = tri.count()
        out[f"lm_{tag}_preagg_rows"] = tri.groupBy("doc_id", "tri").count().count()
        spark.catalog.clearCache()

    # ---- 3. streaming replay machinery floor ----
    schema = "doc_id long, text string"
    b1 = docs.select("doc_id", "text").where(F.col("doc_id") < 100)
    b2 = docs.select("doc_id", "text").where((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    for _ in range(2):
        t0 = time.time()
        res = E._replay_stream(spark, [b1, b2], lambda s: s, schema)
        n = res.count()
        out.setdefault("replay_passthrough", []).append(round(time.time() - t0, 3))
    out["replay_passthrough_rows"] = n

    stop_spark(spark)
    out["loadavg_after"] = os.getloadavg()[0]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
