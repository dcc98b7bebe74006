"""Delta refresh vs full rebuild across all three index families
(text, sparse, vector — r12 completed the trilogy): the claim is that
``refresh_*`` costs track the TAIL, not the table, while the only
alternative (a full rebuild) re-pays the whole corpus every time.
Prints a SCALING.md section. Run alone on an idle machine:
    python scripts/index_refresh_scaling.py
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

SIZES = (200_000, 1_000_000)
TAIL = 50_000
VOCAB_N = 400


def _text_df(spark, start: int, n: int):
    # zipf-ish 24-token docs from a 400-word vocab, fully Column-side
    w = (
        F.floor(
            F.pow(
                F.rand(seed=7) * 0.999 + F.lit(0.001), F.lit(3.0)
            ) * VOCAB_N
        )
        .cast("int")
    )
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(24)), lambda _: F.concat(F.lit("w"), w.cast("string"))),
            " ",
        ).alias("text"),
        F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("Emb"),
    )


def _sparse_df(spark, start: int, n: int):
    # 3 nonzero dims per row over a 100k-dim hashed space
    def dim(salt):
        return F.pmod(F.xxhash64(F.col("id") + F.lit(salt)), F.lit(100_000)).cast("long")

    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.struct(
            F.array_sort(F.array(dim(1), dim(2), dim(3))).alias("indices"),
            F.array(F.lit(1.0), F.lit(0.5), F.lit(0.25))
            .cast("array<float>")
            .alias("values"),
        ).alias("Vec"),
    )


def _vec_df(spark, start: int, n: int):
    return spark.range(start, start + n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda j: (F.pmod(F.xxhash64(F.col("id") * j), F.lit(1000)) / 500.0 - 1.0).cast("float"),
        ).alias("embedding"),
    )


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    spark = get_spark("index_refresh_scaling")
    work = tempfile.mkdtemp(prefix="idx_refresh_")
    print(
        f"\n## Delta refresh vs full rebuild, all three index families "
        f"(tail {TAIL:,} rows)\n"
    )
    print("| family | base rows | rebuild(base) s | refresh(tail) s | rebuild(base+tail) s |")
    print("|---|---|---|---|---|")

    for n in SIZES:
        # ---- text
        ts = TableSchema(
            name=f"tr_{n}",
            fields=[
                FieldSchema(name="doc_id", field_type=FieldType.INT8, primary_key=True),
                FieldSchema(name="text", field_type=FieldType.STRING),
                FieldSchema(
                    name="Emb", field_type=FieldType.VECTOR_FLOAT,
                    dimension=2, metric="EUCLIDEAN",
                ),
            ],
        )
        t = Table(spark, ts, os.path.join(work, f"tr_{n}"))
        t._init_storage()
        t.insert_df(_text_df(spark, 0, n))
        b0 = _timed(lambda: t.rebuild_text_index("text", buckets=64))
        t.insert_df(_text_df(spark, n, TAIL))
        rf = _timed(lambda: t.refresh_text_index("text"))
        b1 = _timed(lambda: t.rebuild_text_index("text", buckets=64))
        print(f"| text | {n:,} | {b0} | {rf} | {b1} |", flush=True)
        shutil.rmtree(os.path.join(work, f"tr_{n}"), ignore_errors=True)

        # ---- sparse
        ss = TableSchema(
            name=f"sr_{n}",
            fields=[
                FieldSchema(name="doc_id", field_type=FieldType.INT8, primary_key=True),
                FieldSchema(
                    name="Vec",
                    field_type=FieldType.SPARSE_VECTOR_FLOAT,
                    dimension=1 << 60,
                    metric="EUCLIDEAN",
                ),
            ],
        )
        t = Table(spark, ss, os.path.join(work, f"sr_{n}"))
        t._init_storage()
        t.insert_df(_sparse_df(spark, 0, n))
        b0 = _timed(lambda: t.rebuild_sparse_index("Vec", buckets=64))
        t.insert_df(_sparse_df(spark, n, TAIL))
        rf = _timed(lambda: t.refresh_sparse_index("Vec"))
        b1 = _timed(lambda: t.rebuild_sparse_index("Vec", buckets=64))
        print(f"| sparse | {n:,} | {b0} | {rf} | {b1} |", flush=True)
        shutil.rmtree(os.path.join(work, f"sr_{n}"), ignore_errors=True)

        # ---- vector (trained IVF)
        vs = TableSchema(
            name=f"vr_{n}",
            fields=[
                FieldSchema(name="vec_id", field_type=FieldType.INT8, primary_key=True),
                FieldSchema(
                    name="embedding",
                    field_type=FieldType.VECTOR_FLOAT,
                    dimension=16,
                    metric="EUCLIDEAN",
                ),
            ],
        )
        t = Table(spark, vs, os.path.join(work, f"vr_{n}"))
        t._init_storage()
        t.insert_df(_vec_df(spark, 0, n))
        b0 = _timed(
            lambda: t.rebuild(
                "embedding", index_type="IVF", k=8, train="lloyd", rounds=2
            )
        )
        t.insert_df(_vec_df(spark, n, TAIL))
        rf = _timed(lambda: t.refresh_index("embedding"))
        b1 = _timed(
            lambda: t.rebuild(
                "embedding", index_type="IVF", k=8, train="lloyd", rounds=2
            )
        )
        print(f"| vector (IVF lloyd) | {n:,} | {b0} | {rf} | {b1} |", flush=True)
        shutil.rmtree(os.path.join(work, f"vr_{n}"), ignore_errors=True)

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
