"""Incremental QUANTILE view refresh vs full rebuild at scale: the
claims under test are (1) ``IncrementalQuantileView.refresh()`` cost
tracks the DELTA (the state merge is the certified COUNT merge keyed
by (group, derived HDR bucket) — COUNT is invertible, so the dirty
machinery never engages), (2) state stays BOUNDED at |groups| × live
buckets regardless of row count, and (3) the serve-time read runs
over state, not data. Prints a SCALING.md section. Run alone (idle
machine — see .claude/skills/verify gotchas):
    python scripts/quantile_matview_scaling.py

Shape: 20M base rows, 1000 groups, values on a full-period LCG grid
(~1e6 domain → near the per-group live-bucket ceiling); growing
mutation batches (inserts, then a delete wave) timed refresh vs a
from-scratch twin, with p50/p99 correctness asserted against the twin
each step and the state row count recorded.
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
from vectordb_spark.operators.matview import IncrementalQuantileView
from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
from vectordb_spark.table import Table

N_BASE = 20_000_000
GROUPS = 1_000
DELTAS = (10_000, 1_000_000)
DELETE_N = 200_000


def _rows_df(spark, start: int, n: int):
    return spark.range(start, start + n).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % GROUPS)).alias("grp"),
        ((F.col("id") * 2654435761 + 12345) % 1000003).alias("val"),
        F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
    )


def _served(mv):
    return {
        r["grp"]: (r["n"], r["est_p50"], r["est_p99"])
        for r in mv.df().collect()
    }


def main() -> None:
    spark = get_spark("quantile_matview_scaling")
    work = tempfile.mkdtemp(prefix="qmv_scale_")
    schema = TableSchema(
        name="qmv_scale",
        fields=[
            FieldSchema(name="id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="grp", field_type=FieldType.STRING),
            FieldSchema(name="val", field_type=FieldType.INT8),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, os.path.join(work, "qmv_scale"))
    t._init_storage()
    t0 = time.time()
    # 16 commits → 16 PK-range-disjoint segments: the realistic ingest
    # shape, and what lets the delete wave's COW rewrite + changefeed
    # diff prune to the one segment that actually holds the victims (a
    # single-commit base degenerates both to a full-table rewrite —
    # measured 108.8 s refresh vs 18.3 s rebuild before this fix)
    for c in range(16):
        t.insert_df(_rows_df(spark, c * (N_BASE // 16), N_BASE // 16))
    t_ingest = round(time.time() - t0, 1)

    mv = IncrementalQuantileView(
        t, os.path.join(work, "mv"), ["grp"], "val", quantiles=(0.5, 0.99)
    )
    t0 = time.time()
    mv.full_build()
    t_build0 = round(time.time() - t0, 1)
    st = mv._inner.df()
    state_rows = st.count()
    max_buckets = (
        st.groupBy("grp").count().agg(F.max("count")).first()[0]
    )
    t0 = time.time()
    _served(mv)
    t_serve = round(time.time() - t0, 2)

    print(
        f"\n## Incremental QUANTILE view refresh vs rebuild "
        f"({N_BASE:,} base rows, {GROUPS} groups, ~1e6 value domain)\n"
    )
    print(
        f"base ingest {t_ingest}s; initial full_build {t_build0}s; "
        f"state = {state_rows:,} (group, bucket) rows, max "
        f"{max_buckets} live buckets in any group (ceiling ~790); "
        f"p50/p99 serve off state in {t_serve}s\n"
    )
    print("| batch | refresh s | full rebuild s | state rows | speedup |")
    print("|---|---|---|---|---|")

    def _step(label: str, tag: str) -> None:
        t0 = time.time()
        mv.refresh(force_incremental=True)
        t_ref = round(time.time() - t0, 2)
        twin = IncrementalQuantileView(
            t, os.path.join(work, f"twin_{tag}"), ["grp"], "val",
            quantiles=(0.5, 0.99),
        )
        t0 = time.time()
        twin.full_build()
        t_full = round(time.time() - t0, 2)
        assert _served(mv) == _served(twin), f"{label}: diverged"
        n_state = mv._inner.df().count()
        print(
            f"| {label} | {t_ref} | {t_full} | {n_state:,} "
            f"| {round(t_full / t_ref, 1)}x |"
        )

    nxt = N_BASE
    for d in DELTAS:
        t.insert_df(_rows_df(spark, nxt, d))
        nxt += d
        _step(f"insert {d:,}", str(d))

    # delete wave: retractions must rebalance bucket counts exactly
    t.delete(filter=f"id < {DELETE_N}")
    _step(f"delete {DELETE_N:,}", "del")

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
