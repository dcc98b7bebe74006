"""HLL vs exact COUNT(DISTINCT) at scale: fixed-state registers vs the
distinct expand/shuffle. Prints a SCALING.md section. Run alone:
    python scripts/sketch_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectordb_spark import get_spark
from vectordb_spark.operators.sketch import hll_bucket_sql, hll_rank_sql

SIZES = [10_000_000, 50_000_000]
KEYSPACE = 2_000_000  # ~2M distinct users in the stream


def timed_min3(fn) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    spark = get_spark("sketch-scaling")
    print("## HLL distinct vs exact COUNT(DISTINCT) (synthesized key stream)\n")
    print("16 slices x N rows, ~2M distinct keys; HLL = 64 registers per")
    print("slice (fixed state, map-side combined), exact = the distinct")
    print("expand/shuffle. Same rows, same session, min of 3.\n")
    print("| rows | exact distinct s | HLL s | HLL est (slice 0) | exact (slice 0) |")
    print("|---|---|---|---|---|")
    for n in SIZES:
        df = spark.range(n).select(
            (F.col("id") % 16).alias("slice"),
            ((F.col("id") * 2654435761) % KEYSPACE).alias("user_id"),
        )

        def run_exact():
            df.groupBy("slice").agg(
                F.countDistinct("user_id").alias("d")
            ).collect()

        regs_plan = (
            df.select(
                "slice",
                F.expr(hll_bucket_sql("user_id")).alias("b"),
                F.expr(hll_rank_sql("user_id")).alias("r"),
            )
            .groupBy("slice", "b")
            .agg(F.max("r").alias("r"))
            .groupBy("slice")
            .agg(
                F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("spart"),
                F.count(F.lit(1)).alias("nb"),
            )
            .select(
                "slice",
                (
                    F.lit(0.709 * 64 * 64)
                    / (F.col("spart") + (F.lit(64) - F.col("nb")))
                ).alias("est"),
            )
        )

        def run_hll():
            regs_plan.collect()

        t_exact = timed_min3(run_exact)
        t_hll = timed_min3(run_hll)
        est0 = round(
            [r["est"] for r in regs_plan.collect() if r["slice"] == 0][0]
        )
        exact0 = (
            df.where(F.col("slice") == 0)
            .agg(F.countDistinct("user_id"))
            .first()[0]
        )
        print(f"| {n:,} | {t_exact} | {t_hll} | {est0:,} | {exact0:,} |")


if __name__ == "__main__":
    main()
