"""Copy-on-write upsert/delete vs full-base consolidation at scale.

The r11 write-path claim: a point-ish upsert or delete against a
multi-segment table should cost the AFFECTED segments, not the table —
manifest min/max stats prune candidates, a broadcast semi-join finds
the segments actually holding conflicts, only those rewrite, everything
else is retained verbatim in the new manifest. The legacy path (still
the fallback for unsupported PK types, over-broadcast-size batches,
and COW_DISABLED tables) rewrites the whole live base every commit.
Each variant runs against its own fresh identical table; legacy is
forced via the operator's own fallback knobs (COW_UPSERT_MAX_BATCH=0 /
COW_DISABLED=True), so both timings include full commit bookkeeping.

Prints a SCALING.md section. Run alone (idle machine — see
.claude/skills/verify gotchas):
    python scripts/cow_write_scaling.py
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
from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
from vectordb_spark.table import Table

N_BASE = 20_000_000
N_SEGMENTS = 16
UPSERT_SIZES = (1_000, 100_000)


def _mk_table(spark, work, name):
    schema = TableSchema(
        name=name,
        fields=[
            FieldSchema(name="k", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="val", field_type=FieldType.DOUBLE),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, os.path.join(work, name))
    t._init_storage()
    per = N_BASE // N_SEGMENTS
    for s in range(N_SEGMENTS):
        t.insert_df(
            spark.range(s * per, (s + 1) * per).select(
                F.col("id").alias("k"),
                (F.col("id") % 997).cast("double").alias("val"),
                F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
            )
        )
    return t


def _batch(spark, start, n):
    return spark.range(start, start + n).select(
        F.col("id").alias("k"),
        F.lit(-1.0).alias("val"),
        F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
    )


def main() -> None:
    spark = get_spark("cow_write_scaling")
    work = tempfile.mkdtemp(prefix="cow_scale_")
    print(
        f"\n## COW upsert/delete vs full-base rewrite "
        f"({N_BASE:,} rows, {N_SEGMENTS} segments)\n"
    )
    print("| mutation | COW s | segs rewritten / total | legacy (full rewrite) s |")
    print("|---|---|---|---|")

    rows = []
    for n in UPSERT_SIZES:
        t = _mk_table(spark, work, f"cw_{n}")
        files0 = set(t._load_meta()["files"])
        t0 = time.time()
        t.insert_df(_batch(spark, 5_000_000, n), upsert=True)
        t_cow = round(time.time() - t0, 2)
        rewritten = len(files0 - set(t._load_meta()["files"]))

        t2 = _mk_table(spark, work, f"cw_leg_{n}")
        t2.COW_UPSERT_MAX_BATCH = 0  # force the legacy consolidation
        t0 = time.time()
        t2.insert_df(_batch(spark, 5_000_000, n), upsert=True)
        t_leg = round(time.time() - t0, 2)
        rows.append((f"upsert {n:,}", t_cow, f"{rewritten}/{N_SEGMENTS}", t_leg))
        print(f"| upsert {n:,} | {t_cow} | {rewritten}/{N_SEGMENTS} | {t_leg} |",
              flush=True)
        shutil.rmtree(os.path.join(work, f"cw_{n}"), ignore_errors=True)
        shutil.rmtree(os.path.join(work, f"cw_leg_{n}"), ignore_errors=True)

    t = _mk_table(spark, work, "cw_del")
    files0 = set(t._load_meta()["files"])
    t0 = time.time()
    t.delete(filter="k >= 100000 AND k < 101000")
    t_cow = round(time.time() - t0, 2)
    rewritten = len(files0 - set(t._load_meta()["files"]))
    t2 = _mk_table(spark, work, "cw_del_leg")
    t2.COW_DISABLED = True  # force the legacy consolidation
    t0 = time.time()
    t2.delete(filter="k >= 100000 AND k < 101000")
    t_leg = round(time.time() - t0, 2)
    print(f"| delete 1,000 (range) | {t_cow} | {rewritten}/{N_SEGMENTS} | {t_leg} |",
          flush=True)

    # scattered-key mutation (r12): keys land in HALF-minus-one of the
    # segments — pre-r12 this ran one serial Spark write job (plus two
    # footer jobs) per matched segment; now it is one partitionBy write
    # + one staging stats scan whatever the matched count
    t = _mk_table(spark, work, "cw_scatter")
    files0 = set(t._load_meta()["files"])
    per = N_BASE // N_SEGMENTS
    t0 = time.time()
    t.delete(primary_keys=[i * per + 123 for i in range(7)])
    t_cow = round(time.time() - t0, 2)
    rewritten = len(files0 - set(t._load_meta()["files"]))
    print(
        f"| delete 7 scattered keys | {t_cow} | {rewritten}/{N_SEGMENTS} | — |",
        flush=True,
    )
    shutil.rmtree(os.path.join(work, "cw_scatter"), ignore_errors=True)

    string_section(spark, work)
    shutil.rmtree(work, ignore_errors=True)


STRING_BASE = 2_000_000
STRING_SEGMENTS = 16


def _mk_string_table(spark, work, name):
    schema = TableSchema(
        name=name,
        fields=[
            FieldSchema(
                name="doc", field_type=FieldType.STRING, primary_key=True
            ),
            FieldSchema(name="val", field_type=FieldType.DOUBLE),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, os.path.join(work, name))
    t._init_storage()
    per = STRING_BASE // STRING_SEGMENTS
    for s in range(STRING_SEGMENTS):
        t.insert_df(
            spark.range(s * per, (s + 1) * per).select(
                F.format_string("doc-%09d", F.col("id")).alias("doc"),
                (F.col("id") % 997).cast("double").alias("val"),
                F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
            )
        )
    return t


def string_section(spark, work) -> None:
    """r12 (VERDICT r11 missing #2): STRING primary keys take the COW
    path via exact write-time string min/max stats. The pre-r12
    behavior (string PK -> full consolidating rewrite every mutation)
    is replayed by forcing the operator's own legacy knob."""
    print(
        f"\n## String-PK COW ({STRING_BASE:,} rows, "
        f"{STRING_SEGMENTS} segments, zero-padded doc ids)\n"
    )
    print("| mutation | COW s | segs rewritten / total | pre-r12 (full rewrite) s |")
    print("|---|---|---|---|")

    def _sbatch(start, n):
        return spark.range(start, start + n).select(
            F.format_string("doc-%09d", F.col("id")).alias("doc"),
            F.lit(-1.0).alias("val"),
            F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
        )

    t = _mk_string_table(spark, work, "cws_up")
    files0 = set(t._load_meta()["files"])
    t0 = time.time()
    t.insert_df(_sbatch(1_000_000, 1_000), upsert=True)
    t_cow = round(time.time() - t0, 2)
    rewritten = len(files0 - set(t._load_meta()["files"]))
    t2 = _mk_string_table(spark, work, "cws_up_leg")
    t2.COW_UPSERT_MAX_BATCH = 0
    t0 = time.time()
    t2.insert_df(_sbatch(1_000_000, 1_000), upsert=True)
    t_leg = round(time.time() - t0, 2)
    print(
        f"| upsert 1,000 | {t_cow} | {rewritten}/{STRING_SEGMENTS} | {t_leg} |",
        flush=True,
    )
    shutil.rmtree(os.path.join(work, "cws_up"), ignore_errors=True)
    shutil.rmtree(os.path.join(work, "cws_up_leg"), ignore_errors=True)

    t = _mk_string_table(spark, work, "cws_del")
    files0 = set(t._load_meta()["files"])
    keys = [f"doc-{1_000_000 + i:09d}" for i in range(1_000)]
    t0 = time.time()
    t.delete(primary_keys=keys)
    t_cow = round(time.time() - t0, 2)
    rewritten = len(files0 - set(t._load_meta()["files"]))
    t2 = _mk_string_table(spark, work, "cws_del_leg")
    t2.COW_DISABLED = True
    t0 = time.time()
    t2.delete(primary_keys=keys)
    t_leg = round(time.time() - t0, 2)
    print(
        f"| delete 1,000 keys | {t_cow} | {rewritten}/{STRING_SEGMENTS} | {t_leg} |",
        flush=True,
    )


if __name__ == "__main__":
    if "--string-only" in sys.argv:
        _spark = get_spark("cow_write_scaling")
        _work = tempfile.mkdtemp(prefix="cow_scale_str_")
        try:
            string_section(_spark, _work)
        finally:
            shutil.rmtree(_work, ignore_errors=True)
    else:
        main()
