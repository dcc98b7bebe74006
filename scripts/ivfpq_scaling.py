"""Trained IVF x PQ composite at 1M vectors: what each tier buys.
Prints a SCALING.md section. Run alone:
    python scripts/ivfpq_scaling.py

Four serving paths over the same corpus, same 20 held-out queries:
exact KNN (scan all floats), PQ-only (ADC over stored 4-byte codes,
all rows), IVF-only (probe partitions, exact inside), and IVFPQ
(probe partitions, ADC inside, exact re-rank) — the standard
billion-scale layout. The seeded oracle-checkable twin is the
ann_ivfpq_adc gate; this measures the TRAINED tier.
"""

from __future__ import annotations

import math
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from vectordb_spark import get_spark
from vectordb_spark.operators.ann import IVFIndex
from vectordb_spark.operators.knn import knn
from vectordb_spark.operators.pq import PQIndex, ResidualPQIndex

N = 1_000_000
DIM = 64
BLOBS = 64
NPROBE = 4
QUERIES = 20


def timed_min3(fn) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 2)


def main() -> None:
    spark = get_spark("ivfpq_scaling")
    rng = np.random.RandomState(7)
    centers = rng.uniform(-0.5, 0.5, size=(BLOBS, DIM)).astype(np.float32)
    # JVM-side corpus: blob center + small deterministic jitter
    centers_sql = ", ".join(
        "array(" + ", ".join(f"CAST({v:.6f} AS FLOAT)" for v in c) + ")"
        for c in centers
    )
    df = (
        spark.range(N)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"zip_with(element_at(array({centers_sql}), "
                f"CAST(id % {BLOBS} AS INT) + 1), "
                f"transform(sequence(1, {DIM}), j -> "
                f"CAST(sin(id * {DIM} + j) * 0.2 AS FLOAT)), "
                "(c, e) -> CAST(c + e AS FLOAT))"
            ).alias("embedding"),
        )
        .cache()
    )
    df.count()

    ivf = IVFIndex(k=BLOBS, seed=42, metric="EUCLIDEAN")
    t0 = time.time()
    indexed = ivf.build(df, "embedding").cache()
    indexed.count()
    t_ivf = round(time.time() - t0, 1)
    pq = PQIndex(seed=42)
    t0 = time.time()
    pq.fit(df, "embedding")
    coded = pq.codes(indexed, "embedding").cache()
    coded.count()
    t_pq = round(time.time() - t0, 1)
    rpq = ResidualPQIndex(seed=42)
    t0 = time.time()
    rpq.fit_residual(ivf, indexed, "embedding")
    rcoded = rpq.codes_residual(indexed, "embedding").cache()
    rcoded.count()
    t_rpq = round(time.time() - t0, 1)

    qids = [rng.randint(0, N) for _ in range(QUERIES)]
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in df.where(F.col("vec_id").isin([int(q) for q in qids])).collect()
    }

    def exact(q):
        return knn(df, "embedding", q, 10, metric="EUCLIDEAN", id_col="vec_id")

    def ivf_only(q):
        cl = ivf.probe_clusters(q, NPROBE)
        return knn(
            indexed.where(F.col("_cluster").isin(cl)),
            "embedding", q, 10, metric="EUCLIDEAN", id_col="vec_id",
        )

    q0 = next(iter(qvecs.values()))
    paths = {
        "exact KNN (all floats)": exact,
        f"IVF-only (nprobe={NPROBE}, exact inside)": ivf_only,
    }
    for refine in (64, 512, 4096):
        paths[f"IVFPQ raw codes (nprobe={NPROBE}, refine={refine})"] = (
            lambda q, r=refine: pq.search_ivfpq(
                ivf, coded, "embedding", q, 10, nprobe=NPROBE, refine=r
            )
        )
        paths[f"IVFPQ residual codes (nprobe={NPROBE}, refine={refine})"] = (
            lambda q, r=refine: rpq.search(
                ivf, rcoded, "embedding", q, 10, nprobe=NPROBE, refine=r
            )
        )
    times = {name: timed_min3(lambda f=fn: f(q0).collect())
             for name, fn in paths.items()}

    truth = {}
    for qid, q in qvecs.items():
        truth[qid] = {r["vec_id"] for r in exact(q).collect()}
    recalls = {}
    for name, fn in paths.items():
        hit = tot = 0
        for qid, q in qvecs.items():
            got = {r["vec_id"] for r in fn(q).collect()}
            hit += len(got & truth[qid])
            tot += len(truth[qid])
        recalls[name] = hit / tot

    probe_rows = indexed.where(
        F.col("_cluster").isin(ivf.probe_clusters(q0, NPROBE))
    ).count()
    print("## Trained IVFPQ composite at 1M x 64-d (what each tier buys)")
    print()
    print(f"{N:,} vectors in {BLOBS} Gaussian blobs; IVF build (k={BLOBS} "
          f"KMeans + full assignment) {t_ivf}s, raw PQ fit+encode (M=8 x K=16, "
          f"4 B/vec codes) {t_pq}s, residual PQ fit+encode {t_rpq}s — "
          f"one-time batch jobs. Probe scans "
          f"{probe_rows:,} rows ({probe_rows / N:.1%}). recall@10 = mean "
          f"over {QUERIES} queries vs exact.")
    print()
    print("| serving path | top-10 (min-of-3) | recall@10 |")
    print("|---|---|---|")
    for name in paths:
        print(f"| {name} | {times[name]}s | {recalls[name]:.3f} |")


if __name__ == "__main__":
    main()
