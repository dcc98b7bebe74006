"""Exact top-K vector search — the engine's default execution path.

The reference brute-forces every live row below 512 indexed vectors and
uses an NSG graph above (SURVEY.md §2.6); in Spark the exact scan IS the
scalable path: distance is a codegen'd Column, the filter is pushed below
the sort by Catalyst, and ``orderBy(...).limit(k)`` plans as
TakeOrderedAndProject — per-partition top-K heaps + a driver merge, no
global shuffle sort. ANN (IVF/LSH, operators/ann.py) is the opt-in index
path, validated by agreement with this oracle (reference pattern: tests
assert identical ordering before/after Rebuild, db_server.cpp:1606-1612).

Tie-breaking: (distance, row_id) ascending, matching the reference's
stable Candidate ordering (SURVEY.md §7.4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_spark.functions.distance import (
    distance_for_metric,
    sparse_distance_for_metric,
    vector_literal,
)


def knn(
    df: DataFrame,
    vector_col: str,
    query_vector: Sequence[float] | Column,
    k: int,
    *,
    metric: str = "EUCLIDEAN",
    filter: Column | str | None = None,
    post_filter: Column | str | None = None,
    id_col: str | None = None,
    distance_col: str = "_distance",
    sparse: bool = False,
) -> DataFrame:
    """Exact top-K by distance.

    ``filter`` runs before scoring (reference PreFilter mode,
    vec_search_executor.cpp:770-831); ``post_filter`` may reference the
    distance column (the reference's ``@distance``-in-filter path, which
    only the post-filter mode supports — vec_search_executor.cpp:785-786).
    Both orders give identical results for exact search; Catalyst pushes
    the pre-filter into the scan.
    """
    if isinstance(query_vector, Column):
        q = query_vector
    else:
        q = vector_literal(query_vector)
    dist_fn = sparse_distance_for_metric if sparse else distance_for_metric
    out = df
    if filter is not None:
        out = out.where(F.expr(filter) if isinstance(filter, str) else filter)
    out = out.withColumn(distance_col, dist_fn(metric, F.col(vector_col), q))
    if post_filter is not None:
        out = out.where(
            F.expr(post_filter) if isinstance(post_filter, str) else post_filter
        )
    order = [F.col(distance_col).asc()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    return out.orderBy(*order).limit(k)


def batch_knn(
    df: DataFrame,
    vector_col: str,
    queries: DataFrame,
    k: int,
    *,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    distance_col: str = "_distance",
) -> DataFrame:
    """Multi-query exact KNN in ONE corpus pass (the batch-serving
    shape; the reference scores one query per request,
    vec_search_executor.cpp:717-935 — amortizing the scan across Q
    queries is the Spark-native win). Broadcast the Q query vectors,
    score Q distances per row (codegen'd fold), rank per query.

    The rank is a window over (query, distance): shuffle volume is
    rows×Q scored pairs, acceptable to ~10⁷×Q. For the 100 TB serving
    path use :func:`batch_knn_gemm`, which collapses each scan
    partition to ≤ Q·k rows BEFORE any shuffle.
    """
    from pyspark.sql import Window as W

    from vectordb_spark.functions.distance import l2_squared

    scored = df.crossJoin(F.broadcast(queries)).withColumn(
        distance_col, l2_squared(F.col(vector_col), F.col(query_vec_col))
    )
    w = W.partitionBy(query_id_col).orderBy(distance_col, id_col)
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn", query_vec_col)
    )


def batch_knn_gemm(
    df: DataFrame,
    vector_col: str,
    queries: list[tuple[int, list[float]]],
    k: int,
    *,
    id_col: str = "vec_id",
    distance_col: str = "_distance",
) -> DataFrame:
    """Scale path for multi-query KNN: per Arrow batch, one float64
    GEMM scores all Q queries at once (‖x−q‖² = ‖x‖² − 2x·q + ‖q‖²),
    a partial top-k per query leaves each partition as ≤ Q·k rows, and
    the driver-side final rank runs over the tiny union — the Faiss
    batch-scoring layout expressed as ``mapInPandas``. Python is
    justified here exactly like the multimodal codec: a dense GEMM is
    not expressible as a fused Column op, and Arrow batching keeps it
    vectorized (no per-row Python).

    Numeric note: GEMM accumulates in a different order than the
    sequential Column fold, so distances can differ in the last ulp —
    agreement with :func:`knn` is asserted in tests (exact on this
    data), but the ORACLE-grade deterministic path stays `batch_knn`.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    qids = [int(q) for q, _ in queries]
    Q = np.array([v for _, v in queries], dtype=np.float64)  # Q×D
    qn = (Q * Q).sum(axis=1)  # ‖q‖²

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField(distance_col, T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vector_col]])
            ids = pdf[id_col].to_numpy()
            d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ Q.T) + qn[None, :]
            rows = []
            for qi in range(len(qids)):
                col = d2[:, qi]
                # lexsort keys run minor→major: sorts by (distance, id),
                # so the id tie-break participates in the k-truncation
                # itself — a tied row with a smaller id past position k
                # would be dropped by a distance-only argsort, diverging
                # from knn()'s deterministic (distance, id) order on
                # duplicate vectors
                top = np.lexsort((ids, col))[:k]
                rows += [(qids[qi], int(ids[i]), float(col[i])) for i in top]
            yield pd.DataFrame(rows, columns=["query_id", id_col, distance_col])

    partial = df.select(id_col, vector_col).mapInPandas(score, out_schema)
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(distance_col, id_col)
    return (
        partial.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
