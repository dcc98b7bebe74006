"""Incremental JOIN-view refresh vs full rebuild at scale: the claim
under test (round 10) is the delta-join rule's cost split —
``IncrementalJoinAggView.refresh()`` pays

* fact-delta term (dA JOIN D1): changefeed bytes + a dim-side join —
  tracks the FACT DELTA size, never the fact base;
* dim-delta term (A0 JOIN dD): ONE scan of the old fact snapshot under
  a broadcast of the dim changefeed — bounded by the fact base read
  (prunable only when the fact is clustered on the join key), but with
  join+agg work bounded by the affected rows;

while ``full_build()`` always re-joins and re-aggregates everything.
Prints a SCALING.md section. Run alone (idle machine — see
.claude/skills/verify gotchas):
    python scripts/join_matview_scaling.py
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

N_FACT = 20_000_000
N_DIM = 200_000
NATIONS = 25
FACT_DELTAS = (10_000, 100_000, 1_000_000)
DIM_DELTA = 1_000


def _fact_df(spark, start: int, n: int):
    return spark.range(start, start + n).select(
        F.col("id").alias("oid"),
        (F.col("id") % N_DIM).alias("cid"),
        (F.col("id") % 1000).alias("amount"),
        F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
    )


def _dim_df(spark):
    return spark.range(N_DIM).select(
        F.col("id").alias("ckey"),
        (F.col("id") % NATIONS).cast("int").alias("nation"),
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
    spark = get_spark("join_matview_scaling")
    work = tempfile.mkdtemp(prefix="jv_scale_")
    fschema = TableSchema(
        name="jv_fact",
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
        name="jv_dim",
        fields=[
            FieldSchema(name="ckey", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="nation", field_type=FieldType.INT4),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    fact = Table(spark, fschema, os.path.join(work, "jv_fact"))
    fact._init_storage()
    dim = Table(spark, dschema, os.path.join(work, "jv_dim"))
    dim._init_storage()
    t0 = time.time()
    fact.insert_df(_fact_df(spark, 0, N_FACT))
    dim.insert_df(_dim_df(spark))
    t_ingest = round(time.time() - t0, 1)

    mv = IncrementalJoinAggView(
        fact, dim, os.path.join(work, "mv"),
        fact_key="cid", dim_key="ckey",
        group_cols=["nation"], value_col="amount",
    )
    t0 = time.time()
    mv.full_build()
    t_build0 = round(time.time() - t0, 1)
    fact_b = _bytes(fact.df().inputFiles())
    dim_b = _bytes(dim.df().inputFiles())

    print(f"\n## Incremental JOIN-view refresh vs rebuild "
          f"({N_FACT:,} fact x {N_DIM:,} dim rows, {NATIONS} nations)\n")
    print(f"ingest {t_ingest}s; initial full_build {t_build0}s; "
          f"fact scan = {fact_b:.0f} MB, dim scan = {dim_b:.1f} MB\n")
    print("| mutation | refresh s | changefeed MB | full rebuild s | "
          "rebuild scan MB | speedup |")
    print("|---|---|---|---|---|---|")

    def _measure(tag: str, mutate) -> None:
        vf0 = int(fact._load_meta()["version"])
        vd0 = int(dim._load_meta()["version"])
        mutate()
        vf1 = int(fact._load_meta()["version"])
        vd1 = int(dim._load_meta()["version"])
        ch_b = 0.0
        if vf1 != vf0:
            ch_b += _bytes(
                fact.changes(vf0, vf1, update_preimages=True).inputFiles()
            )
        if vd1 != vd0:
            ch_b += _bytes(
                dim.changes(vd0, vd1, update_preimages=True).inputFiles()
            )
        t0 = time.time()
        mv.refresh(force_incremental=True)
        t_ref = round(time.time() - t0, 2)

        twin = IncrementalJoinAggView(
            fact, dim, os.path.join(work, f"twin_{tag}"),
            fact_key="cid", dim_key="ckey",
            group_cols=["nation"], value_col="amount",
        )
        t0 = time.time()
        twin.full_build()
        t_full = round(time.time() - t0, 2)
        rebuild_b = _bytes(fact.df().inputFiles()) + _bytes(
            dim.df().inputFiles()
        )

        a = {r["nation"]: (r["n_rows"], str(r["_sum_dec"]))
             for r in mv.df().collect()}
        b = {r["nation"]: (r["n_rows"], str(r["_sum_dec"]))
             for r in twin.df().collect()}
        assert a == b, f"refresh diverged from rebuild at {tag}"
        print(f"| {tag} | {t_ref} | {ch_b:.1f} | {t_full} | "
              f"{rebuild_b:.0f} | {round(t_full / t_ref, 1)}x |", flush=True)

    nxt = N_FACT
    for d in FACT_DELTAS:
        start = nxt

        def _ins(start=start, d=d):
            fact.insert_df(_fact_df(spark, start, d))

        nxt += d
        _measure(f"fact +{d:,}", _ins)

    def _dim_move():
        rows = [
            {
                "ckey": int(i),
                "nation": int((i % NATIONS + 1) % NATIONS),
                "v": [0.0, 0.0],
            }
            for i in range(DIM_DELTA)
        ]
        dim.insert(rows, upsert=True)

    _measure(f"dim moves {DIM_DELTA:,}", _dim_move)

    # ---- clustered fact: the r11 ΔD-key segment pruning ----
    # rewrite the fact key-clustered (degenerate z-curve over (cid,
    # cid) = a plain cid sort into 32 tight-range segments), absorb
    # the rewrite version into the view, then repeat the dim-move:
    # refresh now scans only the segments whose cid range contains a
    # changed key (IncrementalJoinAggView._pruned_fact_snapshot).
    t0 = time.time()
    fact.rewrite_zorder(("cid", "cid"), segments=32)
    t_z = round(time.time() - t0, 1)
    mv.refresh(force_incremental=True)  # sync past the rewrite commit

    def _dim_move2():
        rows = [
            {
                "ckey": int(i),
                "nation": int((i % NATIONS + 2) % NATIONS),
                "v": [0.0, 0.0],
            }
            for i in range(DIM_DELTA, 2 * DIM_DELTA)
        ]
        dim.insert(rows, upsert=True)

    _measure(f"dim moves {DIM_DELTA:,} (cid-clustered fact)", _dim_move2)
    st = mv.last_refresh_stats
    print(
        f"\ncid-clustered rewrite took {t_z}s (32 segments); the "
        f"clustered dim-move refresh scanned "
        f"{st['fact0_segments_scanned']}/{st['fact0_segments_total']} "
        f"fact segments — the A0 JOIN dD term's fact read now tracks "
        f"the changed-key span, not the base."
    )

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
