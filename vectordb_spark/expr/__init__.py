from vectordb_spark.expr.parser import parse_filter, ValueType
from vectordb_spark.expr.compile import to_spark_column, to_duckdb_sql, references_distance

__all__ = [
    "parse_filter",
    "ValueType",
    "to_spark_column",
    "to_duckdb_sql",
    "references_distance",
]
