"""Versioned-commit throughput: the fixed per-commit floor, measured.

Every engine write (insert / delete / upsert / stream micro-batch) is
one manifest version: a parquet segment write + footer-stats read + an
atomic manifest swap. VERDICT r9 #6 asked for the explicit commits/sec
figure next to SCALING.md's refresh fixed-floor analysis — this prints
it: single-row commits (the pathological ingest shape), 1k-row commits
(a sane micro-batch), and 100k-row commits (a healthy batch), each as
commits/sec and rows/sec. The point at 100 TB: the floor is per
COMMIT, not per row — batch size, not table size, sets ingest cost,
which is why the streaming sink groups rows into micro-batches instead
of committing per event.

Run alone (idle machine — see .claude/skills/verify gotchas):
    python scripts/commit_throughput.py
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


def main() -> None:
    spark = get_spark("commit_throughput")
    work = tempfile.mkdtemp(prefix="commit_tp_")
    schema = TableSchema(
        name="tp",
        fields=[
            FieldSchema(name="k", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="val", field_type=FieldType.DOUBLE),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, os.path.join(work, "tp"))
    t._init_storage()

    def _batch_df(start: int, n: int):
        return spark.range(start, start + n).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("val"),
            F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
        )

    print("\n## Versioned-commit throughput (single JVM, local[32])\n")
    print("| commit size | commits | wall s | commits/s | rows/s |")
    print("|---|---|---|---|---|")
    nxt = 0
    # warm one commit (JIT + page cache) before any timed block
    t.insert_df(_batch_df(nxt, 1))
    nxt += 1
    for size, commits in ((1, 50), (1_000, 50), (100_000, 10)):
        t0 = time.time()
        for _ in range(commits):
            t.insert_df(_batch_df(nxt, size))
            nxt += size
        dt = time.time() - t0
        print(
            f"| {size:,} rows | {commits} | {dt:.1f} | "
            f"{commits / dt:.2f} | {commits * size / dt:,.0f} |",
            flush=True,
        )
    v = t._load_meta()["version"]
    print(f"\nfinal manifest version: {v}; every commit above is one "
          "atomic manifest swap with footer-stats capture.")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
