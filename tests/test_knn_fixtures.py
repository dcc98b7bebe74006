"""Reference test-suite parity: the cities fixture orderings (FIXTURES.md
F1/F2, transcribed from reference engine/test/engine/db/db_server.cpp).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vectordb_spark.functions.distance import l2_normalize, sparse_l2_normalize
from vectordb_spark.operators.knn import knn

CITIES = [
    (1, "Berlin", [0.05, 0.61, 0.76, 0.74]),
    (2, "London", [0.19, 0.81, 0.75, 0.11]),
    (3, "Moscow", [0.36, 0.55, 0.47, 0.94]),
    (4, "San Francisco", [0.18, 0.01, 0.85, 0.80]),
    (5, "Shanghai", [0.24, 0.18, 0.22, 0.44]),
]
QV = [0.35, 0.55, 0.47, 0.94]

EXPECTED = {
    # reference db_server.cpp:281-291 / FIXTURES.md F1
    "EUCLIDEAN": ["Moscow", "Berlin", "Shanghai", "San Francisco", "London"],
    "DOT_PRODUCT": ["Moscow", "Berlin", "San Francisco", "London", "Shanghai"],
    "COSINE": ["Moscow", "Shanghai", "Berlin", "San Francisco", "London"],
}


@pytest.fixture(scope="module")
def cities(spark):
    schema = T.StructType(
        [
            T.StructField("ID", T.IntegerType(), False),
            T.StructField("Doc", T.StringType(), False),
            T.StructField("Embedding", T.ArrayType(T.FloatType()), False),
        ]
    )
    return spark.createDataFrame(CITIES, schema)


@pytest.mark.parametrize("metric", ["EUCLIDEAN", "DOT_PRODUCT", "COSINE"])
def test_city_ordering(cities, metric):
    df = cities
    if metric == "COSINE":
        # engine normalizes COSINE fields at ingest; query normalized at
        # search time (reference table_mvp.cpp:334-349)
        df = df.withColumn("Embedding", l2_normalize("Embedding"))
        import math

        n = math.sqrt(sum(x * x for x in QV))
        q = [x / n for x in QV]
    else:
        q = QV
    res = knn(df, "Embedding", q, 6, metric=metric, id_col="ID")
    docs = [r.Doc for r in res.select("Doc").collect()]
    assert docs == EXPECTED[metric]


def test_filter_restricts_results(cities):
    # reference DenseVectorFilter: filter "ID <= 2" → exactly 2 rows
    res = knn(cities, "Embedding", QV, 6, metric="EUCLIDEAN",
              filter=F.col("ID") <= 2, id_col="ID")
    rows = res.select("ID").collect()
    assert len(rows) == 2
    assert all(r.ID <= 2 for r in rows)


def test_sparse_city_ordering(spark):
    # F2: same vectors as sparse {indices:[0,1,2,3], values:...} — same
    # expected ordering as dense (db_server.cpp:481-484), EUCLIDEAN.
    schema = T.StructType(
        [
            T.StructField("ID", T.IntegerType(), False),
            T.StructField("Doc", T.StringType(), False),
            T.StructField(
                "Embedding",
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
    data = [(i, d, ([0, 1, 2, 3], v)) for i, d, v in CITIES]
    df = spark.createDataFrame(data, schema)
    q = F.struct(
        F.array(*[F.lit(i) for i in range(4)]).alias("indices"),
        F.array(*[F.lit(float(x)) for x in QV]).cast("array<float>").alias("values"),
    )
    res = knn(df, "Embedding", q, 6, metric="EUCLIDEAN", id_col="ID", sparse=True)
    docs = [r.Doc for r in res.select("Doc").collect()]
    assert docs == EXPECTED["EUCLIDEAN"]
