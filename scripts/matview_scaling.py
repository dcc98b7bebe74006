"""Incremental matview refresh vs full rebuild at scale: the claim
under test (VERDICT r7 #7) is that ``IncrementalAggView.refresh()``
reads ONLY changefeed delta files, so its cost tracks the DELTA size
while ``full_build()`` tracks the BASE size. Prints a SCALING.md
section. Run alone (idle machine — see .claude/skills/verify gotchas):
    python scripts/matview_scaling.py

Shape: a base table of N rows (1000 groups), one view (COUNT + SUM per
group), then mutation batches of growing size; per batch we time
refresh() against a from-scratch full_build() twin and record the
parquet bytes each one scanned (inputFiles of the plans involved).
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
from vectordb_spark.operators.matview import IncrementalAggView
from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
from vectordb_spark.table import Table

N_BASE = 20_000_000
GROUPS = 1_000
DELTAS = (10_000, 100_000, 1_000_000, 5_000_000)


def _rows_df(spark, start: int, n: int):
    return spark.range(start, start + n).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % GROUPS)).alias("grp"),
        (F.col("id") % 1000).alias("val"),
        F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
    )


def _delta_bytes(table: Table, v0: int, v1: int) -> int:
    """Parquet bytes under the files the changefeed scan touches."""
    files = table.changes(v0, v1, update_preimages=True).inputFiles()
    total = 0
    for f in files:
        p = f.replace("file:", "")
        if os.path.exists(p):
            total += os.path.getsize(p)
    return total


def _base_bytes(table: Table) -> int:
    files = table.df().inputFiles()
    total = 0
    for f in files:
        p = f.replace("file:", "")
        if os.path.exists(p):
            total += os.path.getsize(p)
    return total


def main() -> None:
    spark = get_spark("matview_scaling")
    work = tempfile.mkdtemp(prefix="mv_scale_")
    schema = TableSchema(
        name="mv_scale",
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
    t = Table(spark, schema, os.path.join(work, "mv_scale"))
    t._init_storage()
    t0 = time.time()
    t.insert_df(_rows_df(spark, 0, N_BASE))
    t_ingest = round(time.time() - t0, 1)

    mv = IncrementalAggView(t, os.path.join(work, "mv"), ["grp"], "val")
    t0 = time.time()
    mv.full_build()
    t_build0 = round(time.time() - t0, 1)
    base_b = _base_bytes(t)

    print(f"\n## Incremental matview refresh vs rebuild ({N_BASE:,} base rows, {GROUPS} groups)\n")
    print(f"base ingest {t_ingest}s; initial full_build {t_build0}s; "
          f"base scan = {base_b / 1e6:.0f} MB\n")
    print("| delta rows | refresh s | delta scan MB | full rebuild s | base scan MB | speedup |")
    print("|---|---|---|---|---|---|")

    nxt = N_BASE
    for d in DELTAS:
        v0 = int(t._load_meta()["version"])
        t.insert_df(_rows_df(spark, nxt, d))
        nxt += d
        v1 = int(t._load_meta()["version"])
        db = _delta_bytes(t, v0, v1)

        t0 = time.time()
        mv.refresh(force_incremental=True)
        t_ref = round(time.time() - t0, 2)

        twin = IncrementalAggView(
            t, os.path.join(work, f"twin_{d}"), ["grp"], "val"
        )
        t0 = time.time()
        twin.full_build()
        t_full = round(time.time() - t0, 2)
        bb = _base_bytes(t)

        # correctness cross-check while we're here
        a = {r["grp"]: (r["n_rows"], str(r["_sum_dec"])) for r in mv.df().collect()}
        b = {r["grp"]: (r["n_rows"], str(r["_sum_dec"])) for r in twin.df().collect()}
        assert a == b, "refresh diverged from rebuild"

        print(
            f"| {d:,} | {t_ref} | {db / 1e6:.1f} | {t_full} | "
            f"{bb / 1e6:.0f} | {round(t_full / t_ref, 1)}x |"
        )

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
