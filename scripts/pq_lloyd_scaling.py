"""Replayable seeded-Lloyd trainers at 1M x 64-d: what oracle-grade
determinism costs at scale. Prints a SCALING.md section. Run alone:
    python scripts/pq_lloyd_scaling.py

The round-9 trained-IVFPQ gate serves from trainers a SQL oracle can
replay bit-exactly (IVFIndex.build_lloyd + ResidualPQIndex.
fit_residual_lloyd). Their per-round cost model is: one corpus scan
with k (coarse) or M*K (fine) broadcast-literal integer distance folds
+ one small shuffle for the grid means. This measures that against the
quality-first numpy trainers (MLlib KMeans coarse / sampled-numpy PQ)
on the ivfpq_scaling corpus, and checks recall parity of the full
residual-IVFPQ serving stack under both trainer pairs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from vectordb_spark import get_spark
from vectordb_spark.operators.ann import IVFIndex
from vectordb_spark.operators.knn import knn
from vectordb_spark.operators.pq import ResidualPQIndex

N = 1_000_000
DIM = 64
BLOBS = 64
K_COARSE = 16  # lloyd coarse k: 16 literal folds/row (the gate's shape)
NPROBE = 2     # 2/16 cells ~ 12.5% scan, comparable to 4/64
REFINE = 512
QUERIES = 20


def main() -> None:
    spark = get_spark("pq_lloyd_scaling")
    rng = np.random.RandomState(7)
    centers = rng.uniform(-0.5, 0.5, size=(BLOBS, DIM)).astype(np.float32)
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

    rows = []
    # --- replayable pair: seeded-Lloyd coarse + seeded-Lloyd fine ----
    ivf_l = IVFIndex(k=K_COARSE, seed=42, metric="EUCLIDEAN")
    t0 = time.time()
    idx_l = ivf_l.build_lloyd(df, "embedding", rounds=2, id_col="vec_id")
    idx_l = idx_l.cache()
    idx_l.count()
    t_coarse_l = round(time.time() - t0, 1)
    rpq_l = ResidualPQIndex(seed=42)
    t0 = time.time()
    rpq_l.fit_residual_lloyd(ivf_l, idx_l, "embedding", rounds=2, id_col="vec_id")
    t_fit_l = round(time.time() - t0, 1)
    t0 = time.time()
    coded_l = rpq_l.codes_residual(idx_l, "embedding").cache()
    coded_l.count()
    t_enc_l = round(time.time() - t0, 1)
    rows.append(("seeded-Lloyd (oracle-replayable)", t_coarse_l, t_fit_l, t_enc_l))

    # --- quality-first pair: MLlib KMeans coarse + sampled-numpy fine -
    ivf_k = IVFIndex(k=K_COARSE, seed=42, metric="EUCLIDEAN")
    t0 = time.time()
    idx_k = ivf_k.build(df, "embedding").cache()
    idx_k.count()
    t_coarse_k = round(time.time() - t0, 1)
    rpq_k = ResidualPQIndex(seed=42)
    t0 = time.time()
    rpq_k.fit_residual(ivf_k, idx_k, "embedding")
    t_fit_k = round(time.time() - t0, 1)
    t0 = time.time()
    coded_k = rpq_k.codes_residual(idx_k, "embedding").cache()
    coded_k.count()
    t_enc_k = round(time.time() - t0, 1)
    rows.append(("MLlib KMeans + sampled numpy", t_coarse_k, t_fit_k, t_enc_k))

    # --- recall parity of the served stack under both trainer pairs --
    qids = [int(rng.randint(0, N)) for _ in range(QUERIES)]
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in df.where(F.col("vec_id").isin(qids)).collect()
    }

    def recall(rpq, ivf, coded) -> float:
        hits = 0
        for qid, q in qvecs.items():
            truth = {
                r["vec_id"]
                for r in knn(
                    df, "embedding", q, 10, metric="EUCLIDEAN", id_col="vec_id"
                ).collect()
            }
            got = {
                r["vec_id"]
                for r in rpq.search(
                    ivf, coded, "embedding", q, 10,
                    nprobe=NPROBE, refine=REFINE,
                ).collect()
            }
            hits += len(truth & got)
        return round(hits / (10 * len(qvecs)), 3)

    rec_l = recall(rpq_l, ivf_l, coded_l)
    rec_k = recall(rpq_k, ivf_k, coded_k)

    print(f"\n## Replayable seeded-Lloyd trainers at {N:,} x {DIM}-d "
          f"(k={K_COARSE} coarse, M=8 x K=16 fine, 2 rounds each)\n")
    print("| trainer pair | coarse s | fine fit s | encode s | "
          f"recall@10 (nprobe={NPROBE}, refine={REFINE}) |")
    print("|---|---|---|---|---|")
    for (name, a, b, c), rec in zip(rows, (rec_l, rec_k)):
        print(f"| {name} | {a} | {b} | {c} | {rec} |")


if __name__ == "__main__":
    main()
