"""Sampled seeded-Lloyd at 1M x 64-d: how much of the replayability
premium hash-sampled training buys back. Prints a SCALING.md section.
Run alone (idle machine — see verify-skill gotchas):
    python scripts/sampled_lloyd_scaling.py

Round 9 measured the full-corpus oracle-replayable coarse trainer at
~14x MLlib KMeans (SCALING.md "Replayable seeded-Lloyd trainers");
round 10 added train_mod/train_keep (operators/ann.py build_lloyd): a
deterministic prime-mod hash filter restricts seeds and the per-round mean
aggregates to ~keep/mod of the corpus while the final assignment still
covers every row — and the filter is plain int64 arithmetic, so the
table_ivfpq/ivf gate oracles replay the SAMPLED trainer bit-exactly
too (table_ivf_sampled_train_search). This measures the coarse-trainer
cost ladder (full / 1/16 / 1/64 / MLlib) and serving recall parity of
probe-pruned IVF search under each centroid set, same corpus recipe as
scripts/pq_lloyd_scaling.py.
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

N = 1_000_000
DIM = 64
BLOBS = 64
K_COARSE = 16
NPROBE = 2
QUERIES = 20

VARIANTS = (
    ("full-corpus Lloyd (r9 baseline)", None, None),
    ("sampled Lloyd 1/16", 16, 1),
    ("sampled Lloyd 1/64", 64, 1),
)


def main() -> None:
    spark = get_spark("sampled_lloyd_scaling")
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

    qids = [int(rng.randint(0, N)) for _ in range(QUERIES)]
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in df.where(F.col("vec_id").isin(qids)).collect()
    }
    truths = {
        qid: {
            r["vec_id"]
            for r in knn(
                df, "embedding", q, 10, metric="EUCLIDEAN", id_col="vec_id"
            ).collect()
        }
        for qid, q in qvecs.items()
    }

    def recall(ivf, indexed) -> float:
        hits = 0
        for qid, q in qvecs.items():
            got = {
                r["vec_id"]
                for r in ivf.search(
                    indexed, "embedding", q, 10, nprobe=NPROBE, id_col="vec_id"
                ).collect()
            }
            hits += len(truths[qid] & got)
        return round(hits / (10 * len(qvecs)), 3)

    rows = []
    for name, mod, keep in VARIANTS:
        ivf = IVFIndex(k=K_COARSE, seed=42, metric="EUCLIDEAN")
        t0 = time.time()
        indexed = ivf.build_lloyd(
            df, "embedding", rounds=2, id_col="vec_id",
            train_mod=mod, train_keep=keep,
        ).cache()
        indexed.count()
        t_build = round(time.time() - t0, 1)
        n_train = (
            N
            if mod is None
            else df.where(
                F.expr(IVFIndex.train_hash_sql("vec_id")) % F.lit(mod)
                < F.lit(keep)
            ).count()
        )
        rows.append((name, n_train, t_build, recall(ivf, indexed)))
        indexed.unpersist()

    ivf_k = IVFIndex(k=K_COARSE, seed=42, metric="EUCLIDEAN")
    t0 = time.time()
    idx_k = ivf_k.build(df, "embedding").cache()
    idx_k.count()
    t_k = round(time.time() - t0, 1)
    rows.append(
        ("MLlib KMeans (not oracle-replayable)", "(sampled)", t_k,
         recall(ivf_k, idx_k))
    )

    print(f"\n## Sampled seeded-Lloyd at {N:,} x {DIM}-d "
          f"(k={K_COARSE}, 2 rounds; round 10)\n")
    print(f"| coarse trainer | train rows | build s | "
          f"recall@10 (nprobe={NPROBE}) |")
    print("|---|---|---|---|")
    for name, ntr, t, rec in rows:
        print(f"| {name} | {ntr} | {t} | {rec} |")


if __name__ == "__main__":
    main()
