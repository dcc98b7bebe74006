"""Incremental TOP-K view refresh vs full rebuild at scale: the claim
under test is that ``IncrementalTopKView.refresh()`` shuffles only
STATE ∪ DELTA (|groups| × (k+slack) rows + the changefeed) while
``full_build()`` ranks the whole base — and that a leader-killing
delete batch (the dirty path) costs one bounded group-scoped rescan,
not a base re-rank. Prints a SCALING.md section. Run alone (idle
machine — see .claude/skills/verify gotchas):
    python scripts/topk_matview_scaling.py

Shape: 20M base rows, 1000 groups, k=10/slack=10; growing insert
batches timed refresh-vs-rebuild, then one batch that deletes the top
slack+1 rows of 100 groups — every one of those groups must rescan,
and ONLY those (the script asserts dirtied-group correctness against
a from-scratch twin each step).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vectordb_spark import get_spark
from vectordb_spark.operators.matview import IncrementalTopKView
from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
from vectordb_spark.table import Table

N_BASE = 20_000_000
GROUPS = 1_000
K, SLACK = 10, 10
DELTAS = (10_000, 100_000, 1_000_000)
DIRTY_GROUPS = 100


def _rows_df(spark, start: int, n: int):
    # val is a full-period LCG of id: unique ranks within (and across)
    # groups, so leaders are well-defined and leader deletes dirty
    # exactly the targeted groups
    return spark.range(start, start + n).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % GROUPS)).alias("grp"),
        # Knuth-hash ids onto a ~1e6 grid (fits int64 at any N here):
        # near-unique ranks, so leaders are well-defined per group
        ((F.col("id") * 2654435761 + 12345) % 1000003).alias("val"),
        F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
    )


def _topk_rows(mv):
    return {
        (r["grp"], r["rank"]): (r["id"], r["val"])
        for r in mv.df().collect()
    }


def main() -> None:
    spark = get_spark("topk_matview_scaling")
    work = tempfile.mkdtemp(prefix="topk_scale_")
    schema = TableSchema(
        name="topk_scale",
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
    t = Table(spark, schema, os.path.join(work, "topk_scale"))
    t._init_storage()
    t0 = time.time()
    t.insert_df(_rows_df(spark, 0, N_BASE))
    t_ingest = round(time.time() - t0, 1)

    mv = IncrementalTopKView(
        t, os.path.join(work, "mv"), ["grp"], "val", k=K, slack=SLACK
    )
    t0 = time.time()
    mv.full_build()
    t_build0 = round(time.time() - t0, 1)
    state_rows = mv._state_df().count()

    print(
        f"\n## Incremental TOP-K view refresh vs rebuild "
        f"({N_BASE:,} base rows, {GROUPS} groups, k={K}/slack={SLACK})\n"
    )
    print(
        f"base ingest {t_ingest}s; initial full_build {t_build0}s "
        f"(map-side WindowGroupLimit partial top-{K + SLACK + 1}); "
        f"state = {state_rows:,} rows\n"
    )
    print("| batch | refresh s | full rebuild s | speedup |")
    print("|---|---|---|---|")

    def _step(label: str, tag: str) -> None:
        t0 = time.time()
        mv.refresh(force_incremental=True)
        t_ref = round(time.time() - t0, 2)
        twin = IncrementalTopKView(
            t, os.path.join(work, f"twin_{tag}"), ["grp"], "val",
            k=K, slack=SLACK,
        )
        t0 = time.time()
        twin.full_build()
        t_full = round(time.time() - t0, 2)
        assert _topk_rows(mv) == _topk_rows(twin), f"{label}: diverged"
        print(f"| {label} | {t_ref} | {t_full} | {round(t_full / t_ref, 1)}x |")

    nxt = N_BASE
    for d in DELTAS:
        t.insert_df(_rows_df(spark, nxt, d))
        nxt += d
        _step(f"insert {d:,}", str(d))

    # leader-killing batch: delete the top SLACK+1 rows of DIRTY_GROUPS
    # groups — every targeted group drops below k at-or-above-floor
    # candidates and must rescan; the other 900 stay clean
    w = Window.partitionBy("grp").orderBy(F.desc("val"), F.asc("id"))
    victims = [
        r["id"]
        for r in t.df()
        .withColumn("_rn", F.row_number().over(w))
        .where(
            (F.col("_rn") <= SLACK + 1)
            & (F.substring("grp", 2, 10).cast("int") < DIRTY_GROUPS)
        )
        .select("id")
        .collect()
    ]
    t.delete(primary_keys=victims)
    _step(f"delete {len(victims):,} leaders ({DIRTY_GROUPS} dirty groups)",
          "dirty")

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
