"""Time-bucketed rollup view (continuous aggregate) at scale: the
claims under test are (1) refresh cost tracks the DELTA — the bucket
is a derived group key, so maintenance rides the certified COUNT/SUM
merge and never rescans events, (2) state is |live buckets × groups|
regardless of row count, and with ``retention_ns`` it stays BOUNDED on
an unbounded time axis, (3) coarser grains (hour → day) serve as pure
O(state) re-aggregations via ``coarsen``. Prints a SCALING.md section.
Run alone (idle machine — see .claude/skills/verify gotchas):
    python scripts/rollup_matview_scaling.py

Shape: 20M base events in 16 commits across ~5000 hour buckets × 8
event types; a mixed delta (new events + LATE events into old buckets);
a COW delete wave; each step's refresh raced against a from-scratch
twin with full-state equality asserted; a retention-bounded sibling
(1000 h) tracks the same stream with its state row count recorded.
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
from vectordb_spark.operators.matview import IncrementalRollupView
from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
from vectordb_spark.table import Table

N_BASE = 20_000_000
HOUR = 3_600_000_000_000
BASE_TS = 500_000 * HOUR
HOURS = 5_000
TYPES = 8
RETENTION = 1_000 * HOUR


def _rows_df(spark, start: int, n: int, *, late_frac_mod: int | None = None):
    """Events with an LCG-scattered hour bucket; with late_frac_mod,
    1/mod of the rows land in the OLDEST 100 buckets (late data)."""
    df = spark.range(start, start + n)
    h = (F.col("id") * 2654435761 + 12345) % HOURS
    if late_frac_mod is not None:
        h = F.when(F.col("id") % late_frac_mod == 0, (F.col("id") % 100)).otherwise(
            h
        )
    return df.select(
        F.col("id"),
        (F.lit(BASE_TS) + h * F.lit(HOUR) + (F.col("id") % 1000)).alias("ts"),
        # NOT id % TYPES: the LCG multiplier is ≡ 1 (mod 8), so the
        # hour bucket determines id mod 8 and the pair cardinality
        # collapses to |buckets|; id // 8 is free of that congruence
        F.concat(F.lit("t"), (F.expr("id div 8") % TYPES)).alias("typ"),
        ((F.col("id") * 7) % 1000).alias("val"),
        F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
    )


def _state(mv):
    return {
        (r["_bucket_start_ns"], r["typ"]): (r["n_rows"], float(r["_sum_dec"]))
        for r in mv.df().collect()
    }


def main() -> None:
    spark = get_spark("rollup_matview_scaling")
    work = tempfile.mkdtemp(prefix="rmv_scale_")
    schema = TableSchema(
        name="rmv_scale",
        fields=[
            FieldSchema(name="id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="ts", field_type=FieldType.INT8),
            FieldSchema(name="typ", field_type=FieldType.STRING),
            FieldSchema(name="val", field_type=FieldType.INT8),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, os.path.join(work, "rmv_scale"))
    t._init_storage()
    t0 = time.time()
    for c in range(16):
        t.insert_df(_rows_df(spark, c * (N_BASE // 16), N_BASE // 16))
    t_ingest = round(time.time() - t0, 1)

    mv = IncrementalRollupView(
        t, os.path.join(work, "mv"), "ts", HOUR, ["typ"], "val"
    )
    t0 = time.time()
    mv.full_build()
    t_build = round(time.time() - t0, 1)
    bounded = IncrementalRollupView(
        t, os.path.join(work, "mvb"), "ts", HOUR, ["typ"], "val",
        retention_ns=RETENTION,
    )
    bounded.full_build()
    n_state = mv.df().count()
    n_bounded = bounded.df().count()
    t0 = time.time()
    n_coarse = mv.coarsen(24 * HOUR).count()
    t_coarse = round(time.time() - t0, 2)

    print(
        f"\n## Rollup (continuous-aggregate) view at {N_BASE:,} events × "
        f"{HOURS} hour buckets × {TYPES} types (r12)\n"
    )
    print(
        f"base ingest (16 commits) {t_ingest}s; full_build {t_build}s; "
        f"state = {n_state:,} (bucket, type) rows vs {N_BASE:,} events; "
        f"retention-bounded sibling ({RETENTION // HOUR}h horizon) = "
        f"{n_bounded:,} rows; coarsen(day) re-aggregates to {n_coarse:,} "
        f"day rows off state in {t_coarse}s\n"
    )
    print("| step | refresh s | full rebuild s | bounded refresh s | state rows (bounded) |")
    print("|---|---|---|---|---|")

    def _step(label: str, tag: str) -> None:
        t0 = time.time()
        mv.refresh(force_incremental=True)
        t_ref = round(time.time() - t0, 2)
        t0 = time.time()
        bounded.refresh(force_incremental=True)
        t_bref = round(time.time() - t0, 2)
        twin = IncrementalRollupView(
            t, os.path.join(work, f"twin_{tag}"), "ts", HOUR, ["typ"], "val"
        )
        t0 = time.time()
        twin.full_build()
        t_full = round(time.time() - t0, 2)
        assert _state(mv) == _state(twin), f"{label}: diverged"
        nb = bounded.df().count()
        print(f"| {label} | {t_ref} | {t_full} | {t_bref} | {nb:,} |")

    # 1M new events, 1/16 of them LATE into the oldest 100 buckets
    t.insert_df(_rows_df(spark, N_BASE, 1_000_000, late_frac_mod=16))
    _step("insert 1M (6% late)", "ins")
    # COW delete wave: one PK-range segment's worth
    t.delete(filter="id < 200000")
    _step("delete 200k (COW)", "del")

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
