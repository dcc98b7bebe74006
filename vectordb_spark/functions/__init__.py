from vectordb_spark.functions.distance import (
    cosine_distance,
    dot_product_distance,
    l2_squared,
    distance_for_metric,
    sparse_cosine_distance,
    sparse_dot_product_distance,
    sparse_l2_squared,
    l2_normalize,
    sparse_l2_normalize,
)
from vectordb_spark.functions.geo import haversine_km, nearby

__all__ = [
    "cosine_distance",
    "dot_product_distance",
    "l2_squared",
    "distance_for_metric",
    "sparse_cosine_distance",
    "sparse_dot_product_distance",
    "sparse_l2_squared",
    "l2_normalize",
    "sparse_l2_normalize",
    "haversine_km",
    "nearby",
]
