"""Measure scaling behavior and ANN recall; write SCALING.md.

Synthesizes vector/document corpora at 3 sizes in /tmp (testdata is
read-only and fixed-size), times the headline operators at each size,
and sweeps the IVF nprobe/recall curve. Run:
    python scripts/scaling_report.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from vectordb_spark import get_spark
from pyspark.sql import functions as F

TMP = "/tmp/vdb_scaling"
VEC_SIZES = [100_000, 500_000, 2_000_000]
DOC_SIZES = [10_000, 50_000, 200_000]
DIM = 64
VOCAB = [f"w{i}" for i in range(400)]


def synth_vectors(spark, n: int) -> str:
    path = f"{TMP}/vec_{n}"
    if not os.path.exists(path):
        rng = np.random.RandomState(7)
        chunks = []
        for start in range(0, n, 500_000):
            m = min(500_000, n - start)
            chunks.append(
                pd.DataFrame(
                    {
                        "vec_id": np.arange(start, start + m),
                        "embedding": list(
                            rng.standard_normal((m, DIM)).astype(np.float32)
                        ),
                        "label": rng.randint(0, 10, m),
                    }
                )
            )
        pdf = pd.concat(chunks, ignore_index=True)
        spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
    return path


def synth_docs(spark, n: int) -> str:
    path = f"{TMP}/doc_{n}"
    if not os.path.exists(path):
        rng = np.random.RandomState(11)
        # 10% near-dup pairs: same token sequence with one word changed
        base = [
            " ".join(rng.choice(VOCAB, size=rng.randint(40, 120)))
            for _ in range(int(n * 0.9))
        ]
        texts = list(base)
        for i in range(n - len(base)):
            src = base[rng.randint(len(base))].split()
            src[rng.randint(len(src))] = VOCAB[rng.randint(len(VOCAB))]
            texts.append(" ".join(src))
        pdf = pd.DataFrame(
            {
                "doc_id": np.arange(n),
                "text": texts,
                "lang": [f"l{i % 7}" for i in range(n)],
                "source": ["synth"] * n,
                "n_chars": [len(t) for t in texts],
            }
        )
        spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
    return path


def timed_min3(fn) -> float:
    """min of 3 — this VM's CPU/IO is bursty; the min is the operator
    cost, the spread is the environment."""
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    spark = get_spark("scaling")
    os.makedirs(TMP, exist_ok=True)
    lines = [
        "# SCALING — measured operator scaling + ANN recall",
        "",
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}] / "
        "synthetic data in /tmp (regenerate: `python scripts/scaling_report.py`).",
        "",
        "## Exact KNN (brute force, 64-dim, top-10, input cached)",
        "",
        "min-of-3 on memory-cached input: measures the scoring+top-K",
        "operator itself. Cold scans in this VM are disk-bound",
        "(~40 MB/s) and say nothing about the plan.",
        "",
        "| rows | min s | rows/s |",
        "|---|---|---|",
    ]

    from vectordb_spark.operators.knn import knn

    q = [float(x) for x in np.random.RandomState(3).standard_normal(DIM)]
    for n in VEC_SIZES:
        path = synth_vectors(spark, n)
        df = spark.read.parquet(path).cache()
        df.count()
        run = lambda: knn(df, "embedding", q, 10, metric="EUCLIDEAN", id_col="vec_id").collect()  # noqa: E731
        t = timed_min3(run)
        lines.append(f"| {n:,} | {t} | {int(n / t):,} |")
        df.unpersist()

    lines += [
        "",
        "## MinHash+LSH near-dup pairs (16 hashes, 8×2 bands)",
        "",
        "| docs | pairs found | min s |",
        "|---|---|---|",
    ]
    from vectordb_spark.queries.dedup import dedup_minhash_lsh

    for n in DOC_SIZES:
        path = synth_docs(spark, n)
        # dedup_minhash_lsh reads {sf_dir}/documents.parquet — point it
        # at the synthetic dir by symlinking the expected layout
        link_dir = f"{TMP}/sf_docs_{n}"
        os.makedirs(link_dir, exist_ok=True)
        link = f"{link_dir}/documents.parquet"
        if not os.path.exists(link):
            os.symlink(path, link)
        rows = len(dedup_minhash_lsh(spark, link_dir).collect())  # warm plan
        t = timed_min3(lambda: dedup_minhash_lsh(spark, link_dir).collect())
        lines.append(f"| {n:,} | {rows:,} | {t} |")

    lines += [
        "",
        "## IVF recall@10 vs nprobe (100k random 64-dim vectors, k=16)",
        "",
        "Random high-dim vectors are the worst case for IVF (no cluster",
        "structure) — this is the honest floor, not the typical case.",
        "",
        "| nprobe | recall@10 | fraction scanned |",
        "|---|---|---|",
    ]
    from vectordb_spark.operators.ann import IVFIndex, recall_at_k

    df = spark.read.parquet(synth_vectors(spark, VEC_SIZES[0])).cache()
    df.count()
    exact = knn(df, "embedding", q, 10, metric="EUCLIDEAN", id_col="vec_id")
    idx = IVFIndex(k=16, seed=42)
    indexed = idx.build(df, "embedding").cache()
    total = indexed.count()
    for nprobe in (1, 2, 4, 8, 12, 16):
        approx = idx.search(indexed, "embedding", q, 10, nprobe=nprobe, id_col="vec_id")
        r = recall_at_k(approx, exact, "vec_id", 10)
        frac = (
            indexed.where(F.col("_cluster").isin(idx.probe_clusters(q, nprobe))).count()
            / total
        )
        lines.append(f"| {nprobe} | {r:.2f} | {frac:.2f} |")
    df.unpersist()
    indexed.unpersist()

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
