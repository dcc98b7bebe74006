"""Steady-state view freshness under a growing table: the
stream_matview_maintenance gate claims per-batch refresh cost tracks
BATCH size, not table size. This measures it: fixed-size ingest
batches land in a growing engine table (the foreachBatch sink's exact
operation sequence — insert_df then force-incremental refresh — minus
the Structured Streaming harness, which only adds trigger latency),
and we record refresh wall-clock + changefeed bytes as the base grows.
Prints a SCALING.md section. Run alone (idle machine):
    python scripts/stream_matview_scaling.py
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

BATCH = 200_000
N_BATCHES = 15
GROUPS = 500


def _rows_df(spark, start: int, n: int):
    return spark.range(start, start + n).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % GROUPS)).alias("grp"),
        (F.col("id") % 1000).alias("val"),
        F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
    )


def _bytes(files) -> float:
    total = 0
    for f in files:
        p = f.replace("file:", "")
        if os.path.exists(p):
            total += os.path.getsize(p)
    return total / 1e6


def main() -> None:
    spark = get_spark("stream_matview_scaling")
    work = tempfile.mkdtemp(prefix="smv_scale_")
    schema = TableSchema(
        name="smv_scale",
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
    t = Table(spark, schema, os.path.join(work, "smv_scale"))
    t._init_storage()
    mv = IncrementalAggView(t, os.path.join(work, "mv"), ["grp"], "val")
    mv.full_build()  # empty state, like the gate

    print(f"\n## Streaming-matview freshness vs table growth "
          f"({N_BATCHES} batches x {BATCH:,} rows, {GROUPS} groups)\n")
    print("| batch | base rows | refresh s | changefeed MB | base MB |")
    print("|---|---|---|---|---|")
    nxt = 0
    samples = []
    for b in range(1, N_BATCHES + 1):
        v0 = int(t._load_meta()["version"])
        t.insert_df(_rows_df(spark, nxt, BATCH))
        nxt += BATCH
        v1 = int(t._load_meta()["version"])
        ch_mb = _bytes(
            t.changes(v0, v1, update_preimages=True).inputFiles()
        )
        t0 = time.time()
        mv.refresh(force_incremental=True)
        dt = round(time.time() - t0, 2)
        samples.append(dt)
        if b <= 3 or b % 5 == 0 or b == N_BATCHES:
            base_mb = _bytes(t.df().inputFiles())
            print(f"| {b} | {nxt:,} | {dt} | {ch_mb:.1f} | {base_mb:.0f} |",
                  flush=True)
    head = sum(samples[1:4]) / 3
    tail = sum(samples[-3:]) / 3
    print(f"\nmean refresh s: batches 2-4 = {head:.2f}, "
          f"last 3 = {tail:.2f} (ratio {tail / head:.2f}x over a "
          f"{N_BATCHES}x base growth)")

    # correctness close-out: the final state equals from-scratch
    twin = IncrementalAggView(t, os.path.join(work, "twin"), ["grp"], "val")
    twin.full_build()
    a = {r["grp"]: (r["n_rows"], str(r["_sum_dec"])) for r in mv.df().collect()}
    c = {r["grp"]: (r["n_rows"], str(r["_sum_dec"])) for r in twin.df().collect()}
    assert a == c, "chained refreshes diverged from rebuild"
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
