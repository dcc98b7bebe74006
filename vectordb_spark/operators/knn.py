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
