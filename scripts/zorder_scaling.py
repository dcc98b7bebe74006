"""Z-order layout vs single-column sort at scale: what Morton
clustering buys a two-column rectangle scan. Prints a SCALING.md
section. Run alone:
    python scripts/zorder_scaling.py

Layout cost is one range-shuffle write, paid once; the payoff is
file/row-group pruning on BOTH columns. Measured directly on parquet
(row-group min/max skipping — the same stats Table.rewrite_zorder
records per segment for driver-side dir pruning).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectordb_spark import get_spark
from vectordb_spark.operators.zorder import z_value_sql, zorder_by

N = 50_000_000
FILES = 64
DOMAIN = 4096  # 12-bit axes


def timed_min3(fn) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    spark = get_spark("zorder_scaling")
    work = tempfile.mkdtemp(prefix="zorder_scale_")
    src = spark.range(N).select(
        F.col("id").alias("rid"),
        (F.col("id") % DOMAIN).alias("a"),
        (F.expr("CAST(id * 7919 AS BIGINT) DIV 128") % DOMAIN).alias("b"),
        (F.col("id") % 97).cast("double").alias("val"),
    )

    layouts = {}
    t0 = time.time()
    src.repartitionByRange(FILES, "a").sortWithinPartitions("a").write.parquet(
        os.path.join(work, "bya")
    )
    t_a = round(time.time() - t0, 1)
    t0 = time.time()
    zorder_by(src, "a", "b", bits=12, num_files=FILES).write.parquet(
        os.path.join(work, "byz")
    )
    t_z = round(time.time() - t0, 1)
    layouts["sorted by a"] = os.path.join(work, "bya")
    layouts["z-ordered (a, b)"] = os.path.join(work, "byz")

    preds = {
        "rect a x b (1/16 each)": (
            (F.col("a") >= 1024) & (F.col("a") < 1280)
            & (F.col("b") >= 2048) & (F.col("b") < 2304),
            (1024, 1280, 2048, 2304),
        ),
        "a-only range (1/16)": (
            (F.col("a") >= 1024) & (F.col("a") < 1280),
            (1024, 1280, 0, DOMAIN),
        ),
        "b-only range (1/16)": (
            (F.col("b") >= 2048) & (F.col("b") < 2304),
            (0, DOMAIN, 2048, 2304),
        ),
    }
    print("## Z-order layout vs single-column sort (the one-sort-order problem)")
    print()
    print(f"{N:,} rows, axes 0..{DOMAIN - 1}, {FILES} files per layout; "
          f"layout write cost: sort-by-a {t_a}s, z-order {t_z}s (one "
          f"range shuffle each). 'files' = files whose (a, b) bounds "
          f"intersect the predicate (what per-segment manifest stats "
          f"prune driver-side; parquet row-group stats prune further "
          f"inside touched files).")
    print()
    print("| predicate | layout | agg (min-of-3) | candidate rows / files |")
    print("|---|---|---|---|")
    import glob

    bounds = {}
    for name, path in layouts.items():
        per_file = []
        for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
            part = spark.read.parquet(f)
            per_file.append(part.agg(
                F.min("a"), F.max("a"), F.min("b"), F.max("b"),
                F.count(F.lit(1)),
            ).head())
        bounds[name] = per_file
    for pname, (pred, (alo, ahi, blo, bhi)) in preds.items():
        for name, path in layouts.items():
            df = spark.read.parquet(path)
            t = timed_min3(lambda d=df, p=pred: d.where(p).agg(
                F.count(F.lit(1)), F.sum("val")).collect())
            touched = rows = 0
            for lo_a, hi_a, lo_b, hi_b, n in bounds[name]:
                if hi_a >= alo and lo_a < ahi and hi_b >= blo and lo_b < bhi:
                    touched += 1
                    rows += n
            print(f"| {pname} | {name} | {t}s | {rows:,} in "
                  f"{touched}/{FILES} |")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
