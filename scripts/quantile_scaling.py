"""HDR-histogram quantiles vs exact percentile() at scale: fixed-state
count aggregate vs the full-sort path. Prints a SCALING.md section.
Run alone:
    python scripts/quantile_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from vectordb_spark import get_spark
from vectordb_spark.operators.sketch import hdr_bucket_lb_sql

SIZES = [10_000_000, 50_000_000]
SLICES = 16


def timed_min3(fn) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    spark = get_spark("quantile-scaling")
    bexpr, lbexpr = hdr_bucket_lb_sql("x")
    print("## HDR quantiles vs exact percentile (synthesized value stream)\n")
    print(f"{SLICES} slices x N rows, long-tailed integer values; HDR =")
    print("<= ~790 count buckets per slice (map-side combined), exact =")
    print("sort-based percentile(). Same rows, same session, min of 3.\n")
    print("| rows | exact p50/p99 s | HDR s | HDR p99 (slice 0) | exact p99 (slice 0) |")
    print("|---|---|---|---|---|")
    for n in SIZES:
        # heavy-tailed: x = (id*phi mod 1e6)^2 / 1e6 → tail to ~1e6
        df = spark.range(n).select(
            (F.col("id") % SLICES).alias("slice"),
            (
                ((F.col("id") * 2654435761) % 1_000_000)
                * ((F.col("id") * 2654435761) % 1_000_000)
                / 1_000_000
            ).cast("long").alias("x"),
        )

        def run_exact():
            df.groupBy("slice").agg(
                F.expr("percentile(x, 0.5)").alias("p50"),
                F.expr("percentile(x, 0.99)").alias("p99"),
            ).collect()

        b = df.groupBy("slice", F.expr(bexpr).alias("bucket")).agg(
            F.expr(f"MIN({lbexpr})").alias("lb"), F.count(F.lit(1)).alias("c")
        )
        cum = b.withColumn(
            "cum", F.sum("c").over(W.partitionBy("slice").orderBy("bucket"))
        ).withColumn("n", F.sum("c").over(W.partitionBy("slice")))
        est = cum.groupBy("slice").agg(
            F.min(
                F.when(
                    F.col("cum") >= F.expr("CAST(ceil(0.5 * n) AS BIGINT)"),
                    F.col("lb"),
                )
            ).alias("p50"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("CAST(ceil(0.99 * n) AS BIGINT)"),
                    F.col("lb"),
                )
            ).alias("p99"),
        )

        t_exact = timed_min3(run_exact)
        t_hdr = timed_min3(lambda: est.collect())
        hdr0 = next(r for r in est.collect() if r["slice"] == 0)
        ex0 = next(
            r
            for r in df.groupBy("slice")
            .agg(F.expr("percentile(x, 0.99)").alias("p99"))
            .collect()
            if r["slice"] == 0
        )
        print(
            f"| {n:,} | {t_exact} | {t_hdr} | {hdr0['p99']:,} |"
            f" {ex0['p99']:,.0f} |"
        )
    print(
        "\nThe exact path sorts every value inside each group"
        " (percentile() buffers the whole group); the HDR aggregate is"
        " whole-stage-codegen counting whose shuffle carries <= ~790"
        " buckets per slice per partition. The estimate is within 1/16"
        " of truth by construction — and at 100 TB the exact path is"
        " not merely slower, it is the difference between a bounded"
        " partial aggregate and unbounded per-group sort state."
    )


if __name__ == "__main__":
    main()
