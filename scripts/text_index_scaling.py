"""Measure the persisted inverted text index: build cost, bucket-pruned
search vs a corpus-scan BM25, and the pruning fraction. Prints a
markdown section for SCALING.md. Run alone on an idle machine:
    python scripts/text_index_scaling.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from vectordb_spark import get_spark
from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
from vectordb_spark.table import Table

TMP = "/tmp/vdb_scaling"
DOC_SIZES = [200_000, 1_000_000]
VOCAB = [f"w{i}" for i in range(395)] + ["the", "a", "key", "row", "data"]
TERMS = "w7 w123 row"
BUCKETS = 64


def synth_docs(spark, n: int) -> str:
    """Zipf-ish corpus: common words dominate so posting lists are
    realistically skewed (w0 hot, w394 cold)."""
    path = f"{TMP}/tdoc_{n}"
    if not os.path.exists(path):
        rng = np.random.RandomState(23)
        zipf = np.minimum(rng.zipf(1.3, size=(n, 40)) - 1, len(VOCAB) - 1)
        texts = [" ".join(VOCAB[w] for w in row[: 20 + row[0] % 20]) for row in zipf]
        pdf = pd.DataFrame({"doc_id": np.arange(n), "text": texts})
        spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(
            path
        )
    return path


def timed_min3(fn) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    spark = get_spark("text-index-scaling")
    print("## Persisted text index: build + bucket-pruned BM25 search\n")
    print("Synthetic zipf corpus, ~30-token docs, 400-word vocab; 3-term")
    print(f"query, buckets={BUCKETS} (terms prune the posting scan to")
    print("|distinct term buckets|/64 of index files at listing time).\n")
    print(
        "| docs | build s | corpus-scan BM25 s | indexed BM25 s "
        "| phrase s | postings read |"
    )
    print("|---|---|---|---|---|---|")
    schema = TableSchema(
        name="d",
        fields=[
            FieldSchema(name="doc_id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="text", field_type=FieldType.STRING),
            FieldSchema(
                name="Emb",
                field_type=FieldType.VECTOR_FLOAT,
                dimension=2,
                metric="EUCLIDEAN",
            ),
        ],
    )
    for n in DOC_SIZES:
        src = spark.read.parquet(synth_docs(spark, n)).withColumn(
            "Emb", F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>")
        )
        work = tempfile.mkdtemp(prefix="vdb_tidx_scale_")
        t = Table(spark, schema, os.path.join(work, "d"))
        t._init_storage()
        t.insert_df(src)
        t0 = time.time()
        info = t.rebuild_text_index("text", buckets=BUCKETS)
        t_build = round(time.time() - t0, 2)

        t_idx = timed_min3(
            lambda: t.search_text_df(TERMS, limit=10).collect()
        )
        t_phrase = timed_min3(
            lambda: t.search_text_df(
                "w7 w123", limit=10, phrase=True
            ).collect()
        )

        # corpus-scan comparator: same quantized BM25, no index
        from vectordb_spark.functions.text_rank import bm25_sq_expr

        def corpus_scan():
            d = t.df()
            words = F.split("text", " ", -1)
            toks = d.select("_row_id", F.explode(words).alias("w"))
            dl = d.select("_row_id", F.size(words).cast("long").alias("dl"))
            stats = dl.agg(
                F.count(F.lit(1)).alias("n"), F.sum("dl").cast("long").alias("s")
            )
            hits = toks.where(F.col("w").isin(*TERMS.split()))
            tf = hits.groupBy("_row_id", "w").agg(F.count(F.lit(1)).alias("tf"))
            dfreq = hits.groupBy("w").agg(F.countDistinct("_row_id").alias("df"))
            (
                tf.join(F.broadcast(dfreq), "w")
                .join(dl, "_row_id")
                .crossJoin(F.broadcast(stats))
                .select(
                    "_row_id",
                    F.expr(bm25_sq_expr("tf", "df", "dl", "n", "s")).alias("sq"),
                )
                .groupBy("_row_id")
                .agg(F.sum("sq").alias("score"))
                .orderBy(F.col("score").desc(), "_row_id")
                .limit(10)
                .collect()
            )

        t_scan = timed_min3(corpus_scan)

        idx_dir = os.path.join(t.path, t._load_meta()["text_indexes"]["text"]["dir"])
        total_postings = spark.read.parquet(idx_dir).count()
        terms = TERMS.split()
        read_postings = (
            spark.read.parquet(idx_dir).where(F.col("_token").isin(*terms)).count()
        )
        frac = read_postings / total_postings
        print(
            f"| {n:,} | {t_build} | {t_scan} | {t_idx} | {t_phrase} | "
            f"{read_postings:,}/{total_postings:,} ({frac:.1%}) |"
        )
        shutil.rmtree(work, ignore_errors=True)
    print(
        "\nThe indexed path never tokenizes the corpus at query time: it"
        "\nreads only the query terms' hash-bucket partitions (file-level"
        "\npruning) and term-filters within them (parquet predicate on"
        "\n_token). Build is one explode + groupBy pass — rebuild cadence"
        "\namortizes it across queries, and the hybrid tail merge keeps"
        "\nresults exact between rebuilds."
    )


if __name__ == "__main__":
    main()
