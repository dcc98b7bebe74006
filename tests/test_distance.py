"""Distance Column expressions vs a NumPy reference (sequential fold)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vectordb_spark.functions.distance import (
    cosine_distance,
    dot_product_distance,
    l2_normalize,
    l2_squared,
    sparse_dot,
    sparse_l2_squared,
    vector_literal,
)

VECS = [
    [0.05, 0.61, 0.76, 0.74],
    [0.19, 0.81, 0.75, 0.11],
    [0.36, 0.55, 0.47, 0.94],
    [0.18, 0.01, 0.85, 0.80],
    [0.24, 0.18, 0.22, 0.44],
]
Q = [0.35, 0.55, 0.47, 0.94]


def _seq_l2(a, q):
    # stored vectors are float32; the query literal stays double
    acc = 0.0
    for x, y in zip(a, q):
        d = float(np.float32(x)) - float(y)
        acc += d * d
    return acc


@pytest.fixture(scope="module")
def vec_df(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("v", T.ArrayType(T.FloatType()), False),
        ]
    )
    return spark.createDataFrame([(i, v) for i, v in enumerate(VECS)], schema)


def test_l2_squared_matches_sequential_fold(vec_df):
    rows = vec_df.select(
        "id", l2_squared("v", vector_literal(Q)).alias("d")
    ).collect()
    for r in rows:
        assert r.d == _seq_l2(VECS[r.id], Q)


def test_dot_distance_sign(vec_df):
    rows = vec_df.select(
        "id", dot_product_distance("v", vector_literal(Q)).alias("d")
    ).collect()
    for r in rows:
        ref = -sum(float(np.float32(x)) * y for x, y in zip(VECS[r.id], Q))
        assert r.d == pytest.approx(ref, abs=1e-12)


def test_cosine_unnormalized(vec_df):
    rows = vec_df.select(
        "id", cosine_distance("v", vector_literal(Q), normalized=False).alias("d")
    ).collect()
    for r in rows:
        a = np.array(VECS[r.id], dtype=np.float32).astype(np.float64)
        q = np.array(Q, dtype=np.float64)
        ref = 1.0 - float(a @ q) / (math.sqrt(float(a @ a)) * math.sqrt(float(q @ q)))
        assert r.d == pytest.approx(ref, rel=1e-12)


def test_l2_normalize_unit_norm(vec_df):
    rows = vec_df.select("id", l2_normalize("v").alias("n")).collect()
    for r in rows:
        norm = math.sqrt(sum(float(x) * float(x) for x in r.n))
        assert norm == pytest.approx(1.0, rel=1e-6)


def test_sparse_dot_and_l2(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField(
                "v",
                T.StructType(
                    [
                        T.StructField("indices", T.ArrayType(T.IntegerType()), False),
                        T.StructField("values", T.ArrayType(T.FloatType()), False),
                    ]
                ),
                False,
            ),
        ]
    )
    data = [
        (0, ([0, 2, 5], [1.0, 2.0, 3.0])),
        (1, ([1, 2], [4.0, 5.0])),
    ]
    df = spark.createDataFrame(data, schema)
    q = F.struct(
        F.array(F.lit(0), F.lit(2)).alias("indices"),
        F.array(F.lit(2.0), F.lit(1.0)).cast("array<float>").alias("values"),
    )
    rows = {
        r.id: (r.dot, r.l2)
        for r in df.select(
            "id",
            sparse_dot("v", q).alias("dot"),
            sparse_l2_squared("v", q).alias("l2"),
        ).collect()
    }
    # id 0: shared indices {0,2}: 1*2 + 2*1 = 4
    assert rows[0][0] == pytest.approx(4.0)
    # ||a||^2=14, ||q||^2=5, l2 = 14 - 2*4 + 5 = 11
    assert rows[0][1] == pytest.approx(11.0)
    # id 1: shared {2}: 5*1 = 5 ; l2 = 41 - 10 + 5 = 36
    assert rows[1][0] == pytest.approx(5.0)
    assert rows[1][1] == pytest.approx(36.0)
