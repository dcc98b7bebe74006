"""The unrolled literal-query distance forms are bit-interchangeable
with the aggregate/zip_with folds (the property that lets a deployment
flip serving to the codegen forms at large row counts — see the
adoption note in functions/distance.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_spark.functions.distance import (
    UNROLL_MAX_DIM,
    distance_for_metric,
    distance_for_metric_lit,
    vector_literal,
)


@pytest.mark.parametrize("metric", ["EUCLIDEAN", "COSINE", "DOT_PRODUCT"])
def test_unrolled_bit_identical_to_fold(spark, metric):
    rng = np.random.default_rng(17)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=16)]) for i in range(500)
    ]
    # adversarial extras: zeros (exercises the leading +0.0 fold seed),
    # exact negations, denormal-ish smalls
    rows += [
        (500, [0.0] * 16),
        (501, [-v for v in rows[0][1]]),
        (502, [1e-300] * 16),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<float>")
    q = [float(x) for x in rng.normal(size=16)]
    fold = df.select(
        "vec_id", distance_for_metric(metric, F.col("v"), vector_literal(q)).alias("d")
    ).orderBy("vec_id").collect()
    unrolled = df.select(
        "vec_id", distance_for_metric_lit(metric, F.col("v"), q).alias("d")
    ).orderBy("vec_id").collect()
    for a, b in zip(fold, unrolled):
        assert struct.pack("d", a["d"]) == struct.pack("d", b["d"]), a["vec_id"]


def test_unrolled_falls_back_above_dim_cap(spark):
    dim = UNROLL_MAX_DIM + 8
    rng = np.random.default_rng(3)
    rows = [(0, [float(x) for x in rng.normal(size=dim)])]
    df = spark.createDataFrame(rows, "vec_id long, v array<float>")
    q = [float(x) for x in rng.normal(size=dim)]
    a = df.select(distance_for_metric("EUCLIDEAN", F.col("v"), vector_literal(q)).alias("d")).collect()[0]["d"]
    b = df.select(distance_for_metric_lit("EUCLIDEAN", F.col("v"), q).alias("d")).collect()[0]["d"]
    assert struct.pack("d", a) == struct.pack("d", b)


@pytest.mark.parametrize("metric", ["EUCLIDEAN", "COSINE", "DOT_PRODUCT"])
def test_unrolled_null_parity_on_short_and_null_arrays(spark, metric):
    """ADVICE r9: bit-interchangeability must hold on MALFORMED rows
    too — an array shorter than the query (or a NULL array) yields a
    NULL distance from the zip_with fold, and the unrolled form must
    do the same (try_element_at), not raise INVALID_ARRAY_INDEX under
    ANSI mode."""
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0]),   # conformant
        (1, [1.0, 2.0]),             # short
        (2, []),                     # empty
        (3, None),                   # null array
        (4, [1.0, 2.0, 3.0, 4.0, 5.0]),  # OVER-length: fold pads the
        # query side with NULL -> NULL; the unrolled form's size guard
        # must match instead of summing the first len(q) dims
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<float>")
    q = [0.5, -1.5, 2.5, 0.25]
    fold = {
        r["vec_id"]: r["d"]
        for r in df.select(
            "vec_id",
            distance_for_metric(metric, F.col("v"), vector_literal(q)).alias("d"),
        ).collect()
    }
    unrolled = {
        r["vec_id"]: r["d"]
        for r in df.select(
            "vec_id",
            distance_for_metric_lit(metric, F.col("v"), q).alias("d"),
        ).collect()
    }
    assert fold[1] is None and fold[2] is None and fold[3] is None
    assert fold[4] is None
    for k in fold:
        if fold[k] is None:
            assert unrolled[k] is None, (k, unrolled[k])
        else:
            assert struct.pack("d", fold[k]) == struct.pack("d", unrolled[k])
