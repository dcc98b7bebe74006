"""vectordb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of epsilla-cloud/vectordb.

Spark-first re-expression of the reference's surface (see SURVEY.md):
typed tables with dense/sparse vector, geo-point and JSON field types;
exact and approximate top-K vector search with a scalar filter language;
projections, skip/limit scans, PK upsert/delete, facet aggregations —
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the reference lacks.
"""

from vectordb_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
