"""Steady-state JOIN-view freshness under a growing fact stream: the
stream_join_matview_maintenance gate claims per-batch refresh cost
tracks BATCH size, not fact size — now across a JOIN. Fixed-size fact
batches land in a growing engine fact table (the foreachBatch sink's
exact operation sequence — insert_df then force-incremental join-view
refresh — minus the Structured Streaming harness, which only adds
trigger latency) against a static 200k-row dim; every fifth batch also
moves 200 dim keys, so the A0⋈ΔD term fires periodically against an
ever-larger old-fact snapshot (unclustered here — the un-pruned worst
case; the clustered pruning row lives in join_matview_scaling.py).
Prints a SCALING.md section. Run alone (idle machine):
    python scripts/stream_join_matview_scaling.py
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
from vectordb_spark.operators.matview import IncrementalJoinAggView
from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
from vectordb_spark.table import Table

BATCH = 200_000
N_BATCHES = 15
N_DIM = 200_000
NATIONS = 25
DIM_MOVE = 200


def _fact_df(spark, start: int, n: int):
    return spark.range(start, start + n).select(
        F.col("id").alias("oid"),
        (F.col("id") % N_DIM).alias("cid"),
        (F.col("id") % 1000).alias("amount"),
        F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
    )


def main() -> None:
    spark = get_spark("stream_join_matview_scaling")
    work = tempfile.mkdtemp(prefix="sjv_scale_")
    fschema = TableSchema(
        name="sjv_fact",
        fields=[
            FieldSchema(name="oid", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="cid", field_type=FieldType.INT8),
            FieldSchema(name="amount", field_type=FieldType.INT8),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    dschema = TableSchema(
        name="sjv_dim",
        fields=[
            FieldSchema(name="ckey", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="nation", field_type=FieldType.INT4),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    fact = Table(spark, fschema, os.path.join(work, "sjv_fact"))
    fact._init_storage()
    dim = Table(spark, dschema, os.path.join(work, "sjv_dim"))
    dim._init_storage()
    dim.insert_df(
        spark.range(N_DIM).select(
            F.col("id").alias("ckey"),
            (F.col("id") % NATIONS).cast("int").alias("nation"),
            F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
        )
    )
    mv = IncrementalJoinAggView(
        fact, dim, os.path.join(work, "mv"),
        fact_key="cid", dim_key="ckey",
        group_cols=["nation"], value_col="amount",
    )
    mv.full_build()  # empty fact: the streaming-gate start state

    print(f"\n## Streaming JOIN-view freshness vs fact growth "
          f"({N_BATCHES} batches x {BATCH:,} rows, dim {N_DIM:,}, "
          f"{DIM_MOVE} dim moves every 5th batch)\n")
    print("| batch | fact rows | dim moved | refresh s |")
    print("|---|---|---|---|")
    nxt = 0
    fact_only, with_dim = [], []
    for b in range(1, N_BATCHES + 1):
        fact.insert_df(_fact_df(spark, nxt, BATCH))
        nxt += BATCH
        moved = b % 5 == 0
        if moved:
            dim.insert(
                [
                    {
                        "ckey": int(i),
                        "nation": int((i % NATIONS + b) % NATIONS),
                        "v": [0.0, 0.0],
                    }
                    for i in range(DIM_MOVE)
                ],
                upsert=True,
            )
        t0 = time.time()
        mv.refresh(force_incremental=True)
        dt = round(time.time() - t0, 2)
        (with_dim if moved else fact_only).append(dt)
        print(f"| {b} | {nxt:,} | {'yes' if moved else ''} | {dt} |",
              flush=True)
    fo_head = sum(fact_only[:3]) / 3
    fo_tail = sum(fact_only[-3:]) / 3
    print(f"\nfact-only refresh mean: first-3 = {fo_head:.2f}s, "
          f"last-3 = {fo_tail:.2f}s across {N_BATCHES // 5 * 4}x fact "
          f"growth; dim-move refreshes: {with_dim} (each scans the "
          f"old fact snapshot — unclustered worst case; clustered "
          f"pruning cuts that term to the changed-key segments, "
          f"measured in join_matview_scaling.py).")
    shutil.rmtree(work, ignore_errors=True)


OVERLAP = 10_000
OV_BATCHES = 10


def overlap_section() -> None:
    """r12 (VERDICT r11 #7): the streaming sink's per-batch upserts
    ride _cow_upsert — rehearse the key-overlap pattern where EVERY
    micro-batch updates old keys, so every batch commit triggers
    segment rewrites before the join-view refresh. Two key patterns:
    'local' (overlap keys come from the previous batch's range — COW
    prunes to the newest segments) and 'scattered' (overlap keys
    stride the whole key history — candidates approach the whole
    base, the ≥1/2-bytes crossover fires, and the commit becomes the
    legacy consolidation: the honest worst case)."""
    spark = get_spark("stream_join_matview_overlap")
    for pattern in ("local", "scattered"):
        work = tempfile.mkdtemp(prefix=f"sjv_ovl_{pattern}_")
        fschema = TableSchema(
            name="sjo_fact",
            fields=[
                FieldSchema(name="oid", field_type=FieldType.INT8, primary_key=True),
                FieldSchema(name="cid", field_type=FieldType.INT8),
                FieldSchema(name="amount", field_type=FieldType.INT8),
                FieldSchema(
                    name="v", field_type=FieldType.VECTOR_FLOAT,
                    dimension=2, metric="EUCLIDEAN",
                ),
            ],
        )
        dschema = TableSchema(
            name="sjo_dim",
            fields=[
                FieldSchema(name="ckey", field_type=FieldType.INT8, primary_key=True),
                FieldSchema(name="nation", field_type=FieldType.INT4),
                FieldSchema(
                    name="v", field_type=FieldType.VECTOR_FLOAT,
                    dimension=2, metric="EUCLIDEAN",
                ),
            ],
        )
        fact = Table(spark, fschema, os.path.join(work, "sjo_fact"))
        fact._init_storage()
        dim = Table(spark, dschema, os.path.join(work, "sjo_dim"))
        dim._init_storage()
        dim.insert_df(
            spark.range(N_DIM).select(
                F.col("id").alias("ckey"),
                (F.col("id") % NATIONS).cast("int").alias("nation"),
                F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
            )
        )
        mv = IncrementalJoinAggView(
            fact, dim, os.path.join(work, "mv"),
            fact_key="cid", dim_key="ckey",
            group_cols=["nation"], value_col="amount",
        )
        mv.full_build()
        print(
            f"\n## Streaming upserts x COW: {pattern} key overlap "
            f"({OV_BATCHES} batches x {BATCH:,} rows, "
            f"{OVERLAP:,} old-key updates per batch)\n"
        )
        print("| batch | fact rows | segs rewritten | ingest s | refresh s |")
        print("|---|---|---|---|---|")
        nxt = 0
        for b in range(1, OV_BATCHES + 1):
            batch_df = _fact_df(spark, nxt, BATCH)
            if b > 1:
                if pattern == "local":
                    keys = spark.range(nxt - BATCH, nxt - BATCH + OVERLAP)
                else:
                    stride = max(1, nxt // OVERLAP)
                    keys = spark.range(OVERLAP).select(
                        (F.col("id") * stride).alias("id")
                    )
                ov = keys.select(
                    F.col("id").alias("oid"),
                    (F.col("id") % N_DIM).alias("cid"),
                    F.lit(-1).cast("long").alias("amount"),
                    F.array(F.lit(0.0), F.lit(0.0))
                    .cast("array<float>")
                    .alias("v"),
                )
                batch_df = batch_df.unionByName(ov)
            files0 = set(fact._load_meta()["files"])
            t0 = time.time()
            fact.insert_df(batch_df, upsert=True)
            t_ing = round(time.time() - t0, 2)
            rewritten = len(files0 - set(fact._load_meta()["files"]))
            nxt += BATCH
            t0 = time.time()
            mv.refresh(force_incremental=True)
            t_ref = round(time.time() - t0, 2)
            print(
                f"| {b} | {nxt:,} | {rewritten}/{len(files0)} "
                f"| {t_ing} | {t_ref} |",
                flush=True,
            )
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    if "--overlap-only" in sys.argv:
        overlap_section()
    else:
        main()
