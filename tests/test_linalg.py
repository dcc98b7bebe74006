"""power_iteration_top_pc (wide-aggregate form) vs the tall-plan gate:
same integer-grid algebra, bit-identical loadings, no explode/join."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(17)
    # planted direction + noise, 300 rows x 8 dims
    d = rng.normal(size=8)
    rows = [
        (
            int(i),
            [
                float(x)
                for x in (rng.normal() * d + 0.1 * rng.normal(size=8))
            ],
        )
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_wide_form_matches_tall_gate_bitwise(spark, corpus):
    """The operator's loadings == the gate's tall-plan loadings, every
    bit: both quantize identically, so the only difference is plan
    shape (scan+wide-agg vs posexplode+join)."""
    from vectordb_spark.operators.linalg import (
        MU_GRID,
        S_GRID,
        W_GRID,
        power_iteration_top_pc,
    )

    v_wide = power_iteration_top_pc(corpus, "embedding", iters=2)

    # tall-plan replay (the gate's exact algebra, queries/vector.py)
    n = corpus.count()
    tall = corpus.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    mu_rows = tall.groupBy("pos").agg(
        F.sum(F.floor(F.col("val") * MU_GRID + F.lit(0.5)).cast("bigint")).alias("g")
    ).collect()
    dim = len(mu_rows)
    mu = {int(r["pos"]): (int(r["g"]) / MU_GRID) / n for r in mu_rows}
    mu_lit = F.array(*[F.lit(mu[p]) for p in range(dim)])
    m_col = F.element_at(mu_lit, F.col("pos") + 1)
    v = [1.0] * dim
    for _ in range(2):
        v_lit = F.array(*[F.lit(x) for x in v])
        s_df = (
            tall.withColumn(
                "_t",
                F.floor(
                    (F.col("val") - m_col)
                    * F.element_at(v_lit, F.col("pos") + 1)
                    * S_GRID
                    + F.lit(0.5)
                ).cast("bigint"),
            )
            .groupBy("vec_id")
            .agg(F.sum("_t").alias("sint"))
        )
        w_rows = (
            tall.join(s_df, "vec_id")
            .groupBy("pos")
            .agg(
                F.sum(
                    F.floor(
                        (F.col("val") - m_col)
                        * (F.col("sint").cast("double") / S_GRID)
                        * W_GRID
                        + F.lit(0.5)
                    ).cast("bigint")
                ).alias("wint")
            )
            .collect()
        )
        w = {int(r["pos"]): int(r["wint"]) / W_GRID for r in w_rows}
        wmax = max(abs(x) for x in w.values())
        v = [w[p] / wmax for p in range(dim)]

    assert v_wide == v  # bitwise float equality, not approx


def test_wide_form_recovers_planted_direction(spark, corpus):
    from vectordb_spark.operators.linalg import power_iteration_top_pc

    v = power_iteration_top_pc(corpus, "embedding", iters=4)
    # the planted direction dominates: loadings correlate strongly
    rows = corpus.select("embedding").collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    Xc = X - X.mean(axis=0)
    top = np.linalg.svd(Xc, full_matrices=False)[2][0]
    cos = abs(
        float(np.dot(top, v) / (np.linalg.norm(top) * np.linalg.norm(v)))
    )
    assert cos > 0.99


def test_wide_form_plan_has_no_join_or_explode(spark, corpus):
    """The 100 TB property itself: the per-iteration plan is scan +
    partial agg — no Generate (posexplode), no join."""
    from vectordb_spark.operators import linalg as L

    dim = 8
    first = corpus.agg(
        *[
            F.sum(
                F.floor(
                    F.element_at(F.col("embedding"), p + 1).cast("double")
                    * L.MU_GRID
                    + F.lit(0.5)
                ).cast("bigint")
            ).alias(f"g{p}")
            for p in range(dim)
        ]
    )
    plan = first._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan and "Join" not in plan


def test_power_iteration_degenerate_corpus_no_zero_division(spark):
    """ADVICE r11: every row equal to the mean → the iterate is the
    zero vector; the operator must return a vector, not divide by
    zero. (The direction is undefined, so any unit-normalized v is
    acceptable — the contract is 'no crash, stable output'.)"""
    from vectordb_spark.operators.linalg import power_iteration_top_pc

    rows = [(int(i), [1.5, -2.0, 0.25]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    v = power_iteration_top_pc(df, "embedding", iters=2)
    assert len(v) == 3
    assert all(abs(x) <= 1.0 for x in v)
