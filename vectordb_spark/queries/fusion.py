"""Hybrid-search fusion (reference E3: the engine searches one vector
field per request and fusion is client-side — here it is a first-class
operator): Reciprocal Rank Fusion across two rankings of the same
candidate set, plus a mock-embedder semantic search entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vectordb_spark.plans import oracle as O
from vectordb_spark.queries import query
from vectordb_spark.sources.readers import load_table

_QV = "(SELECT embedding FROM embeddings WHERE vec_id = 0)"
_RRF_K = 60

_FUSION_ORACLE = f"""
WITH scored AS (
    SELECT vec_id, label,
           {O.duck_l2_sq("embedding", _QV)} AS d_l2,
           {O.duck_neg_dot("embedding", _QV)} AS d_dot
    FROM embeddings
),
ranked AS (
    SELECT vec_id, label,
           row_number() OVER (ORDER BY d_l2, vec_id)  AS r_l2,
           row_number() OVER (ORDER BY d_dot, vec_id) AS r_dot
    FROM scored
)
SELECT vec_id, label, r_l2, r_dot,
       1.0 / ({_RRF_K} + r_l2) + 1.0 / ({_RRF_K} + r_dot) AS rrf
FROM ranked
ORDER BY rrf DESC, vec_id
LIMIT 10
"""


@query("fusion_rrf", oracle=_FUSION_ORACLE)
def fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of L2 and dot-product rankings: score both metrics in
    one scan, rank with two windows, fuse as Σ 1/(k+rank). The fused
    sum has a fixed two-term evaluation order → bit-exact vs the
    oracle."""
    from vectordb_spark.functions.distance import (
        dot_product_distance,
        l2_squared,
        vector_literal,
    )

    from vectordb_spark.queries.vector import _query_vector

    emb = load_table(spark, sf_dir, "embeddings")
    q = vector_literal(_query_vector(spark, sf_dir))
    scored = emb.select(
        "vec_id",
        "label",
        l2_squared("embedding", q).alias("d_l2"),
        dot_product_distance("embedding", q).alias("d_dot"),
    )
    ranked = scored.select(
        "vec_id",
        "label",
        F.row_number().over(W.orderBy("d_l2", "vec_id")).cast("long").alias("r_l2"),
        F.row_number().over(W.orderBy("d_dot", "vec_id")).cast("long").alias("r_dot"),
    )
    rrf = (F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_l2"))) + (
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_dot"))
    )
    return (
        ranked.withColumn("rrf", rrf)
        .orderBy(F.col("rrf").desc(), F.col("vec_id"))
        .limit(10)
    )


@query("semantic_text_search")  # no oracle: blake2b embedder is not SQL-expressible
def semantic_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/E2 in the registry: embed documents with the deterministic
    mock embedder (Arrow-batched pandas UDF), embed a query string the
    same way, exact cosine KNN. Rows-only check; determinism is
    asserted in tests/test_table_api.py::test_auto_embedding_text_search."""
    from vectordb_spark.embedding import MockEmbedder, embed_column
    from vectordb_spark.functions.distance import cosine_distance, vector_literal

    embedder = MockEmbedder(dimension=16)
    d = load_table(spark, sf_dir, "documents")
    embedded = d.select(
        "doc_id", "lang", embed_column(embedder, "text").alias("emb")
    )
    q = embedder.embed_batch(["the fast key order sort table scan"])[0]
    out = embedded.withColumn(
        "distance",
        cosine_distance(F.col("emb"), vector_literal(q), normalized=True),
    )
    return (
        out.orderBy(F.col("distance").asc(), F.col("doc_id").asc())
        .limit(10)
        .select("doc_id", "lang", "distance")
    )
