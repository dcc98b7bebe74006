"""Phase/hypothesis profiling for the trained-quantizer rebuild chain
(VERDICT r12 item 3): where do trained_ivf_rebuild's ~10 s go, and does
parameterizing the per-round centroid literals (one array-typed Literal
per centroid instead of CreateArray(64 double literals)) make the
per-round plan cheap?

Hypotheses, each measured on the real embeddings table (sf dir):
  H1 baseline round:  groupBy(_assign(cents)).agg(129 long sums).collect
     with vector_literal (CreateArray of per-dim double lits) — r12 form.
  H2 same round, same cents, run TWICE — if run 2 is much faster the
     cost is compile/plan caching, not execution.
  H3 array-literal round: vector_literal replaced by F.lit(list) (one
     ArrayType literal — a codegen reference object, so the generated
     source is value-independent).
  H4 transform-form: distances via transform(lit(2-D array), c -> fold)
     — single constant-shaped expression tree.
Each hypothesis also checks the assignment column is IDENTICAL to H1's
(exact integer comparison) on a changed-centroid round.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectordb_spark import get_spark
from vectordb_spark.functions.distance import l2_squared, vector_literal
from vectordb_spark.sources.readers import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 8


def _aggs(vec_col: str, dim: int):
    aggs = []
    for p in range(dim):
        e = F.element_at(F.col(vec_col), p + 1)
        g = F.floor(e.cast("double") * F.lit(1e12) + F.lit(0.5)).cast("bigint")
        hi = F.shiftright(g, 20)
        aggs.append(F.sum(hi).alias(f"h{p}"))
        aggs.append(F.sum(g - hi * F.lit(1 << 20)).alias(f"l{p}"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    return aggs


def assign_v1(vec_col, cents):
    dists = F.array(*[l2_squared(F.col(vec_col), vector_literal(c)) for c in cents])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def assign_v2(vec_col, cents):
    dists = F.array(
        *[l2_squared(F.col(vec_col), F.lit([float(x) for x in c])) for c in cents]
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def assign_v3(vec_col, cents):
    cc = F.lit([[float(x) for x in c] for c in cents])
    dists = F.transform(cc, lambda c: l2_squared(F.col(vec_col), c))
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def main() -> None:
    spark = get_spark("profile_lloyd_r13")
    df = load_table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id").alias("_row_id"), "embedding"
    )
    df.count()  # warm scan
    seeds = [
        [float(x) for x in r[0]]
        for r in df.orderBy("_row_id").select("embedding").limit(K).collect()
    ]
    dim = len(seeds[0])
    print(f"rows={df.count()} dim={dim} k={K}", flush=True)

    def round_once(assign_fn, cents, label):
        t0 = time.time()
        rows = (
            df.groupBy(assign_fn("embedding", cents).alias("_cluster"))
            .agg(*_aggs("embedding", dim))
            .collect()
        )
        dt = time.time() - t0
        print(f"  {label}: {dt:.3f}s ({len(rows)} clusters)", flush=True)
        return dt, rows

    def perturb(cents, eps):
        return [[x + eps for x in c] for c in cents]

    # Warm up codegen/janino generally
    round_once(assign_v1, seeds, "warmup v1")

    print("H1/H2: v1 fresh-literals round, then identical repeat")
    c1 = perturb(seeds, 0.001)
    round_once(assign_v1, c1, "v1 fresh cents (run 1)")
    round_once(assign_v1, c1, "v1 same cents  (run 2)")
    c2 = perturb(seeds, 0.002)
    round_once(assign_v1, c2, "v1 fresh cents again")

    print("H3: v2 array-literal rounds (fresh values each)")
    round_once(assign_v2, perturb(seeds, 0.003), "v2 fresh (warm)")
    round_once(assign_v2, perturb(seeds, 0.004), "v2 fresh")
    round_once(assign_v2, perturb(seeds, 0.005), "v2 fresh")

    print("H4: v3 transform-2D-literal rounds (fresh values each)")
    round_once(assign_v3, perturb(seeds, 0.003), "v3 fresh (warm)")
    round_once(assign_v3, perturb(seeds, 0.004), "v3 fresh")
    round_once(assign_v3, perturb(seeds, 0.005), "v3 fresh")

    print("equivalence check on a shared perturbed centroid set:")
    cx = perturb(seeds, 0.0042)
    base = (
        df.select("_row_id", assign_v1("embedding", cx).alias("a"))
        .orderBy("_row_id")
        .collect()
    )
    for name, fn in (("v2", assign_v2), ("v3", assign_v3)):
        other = (
            df.select("_row_id", fn("embedding", cx).alias("a"))
            .orderBy("_row_id")
            .collect()
        )
        same = all(x["a"] == y["a"] for x, y in zip(base, other))
        print(f"  {name} assignments identical to v1: {same}")
        assert same


if __name__ == "__main__":
    main()
