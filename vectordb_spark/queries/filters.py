"""Filter-language queries — each one parses a reference-syntax filter
string with vectordb_spark.expr and compiles it to BOTH backends: the
Spark Column the engine executes and the DuckDB SQL the oracle replays.
This is the end-to-end proof of SURVEY.md §2.2 (P2-P11): one AST, two
bit-identical executions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vectordb_spark.expr import parse_filter, to_duckdb_sql, to_spark_column
from vectordb_spark.queries import query
from vectordb_spark.schema import field_map_from_spark
from vectordb_spark.sources.readers import load_table


def _run_filter(
    spark: SparkSession, sf_dir: str, table: str, filter_str: str, columns: list[str]
) -> DataFrame:
    df = load_table(spark, sf_dir, table)
    ast = parse_filter(filter_str, field_map_from_spark(df.schema))
    return df.where(to_spark_column(ast)).select(*columns)


def _oracle_for(table: str, filter_str: str, columns: list[str], schema_hint: dict) -> str:
    ast = parse_filter(filter_str, schema_hint)
    return f"SELECT {', '.join(columns)} FROM {table} WHERE {to_duckdb_sql(ast)}"


# Static field maps for oracle generation at import time (match the
# parquet schemas; the Spark side re-derives them from the live schema).
from vectordb_spark.schema import FieldType as FT

_CUSTOMER = {
    "c_custkey": FT.INT8,
    "c_name": FT.STRING,
    "c_nationkey": FT.INT4,
    "c_acctbal": FT.DOUBLE,
    "c_mktsegment": FT.STRING,
}
_ORDERS = {
    "o_orderkey": FT.INT8,
    "o_custkey": FT.INT8,
    "o_orderstatus": FT.STRING,
    "o_totalprice": FT.DOUBLE,
    "o_orderpriority": FT.STRING,
}
_PART = {
    "p_partkey": FT.INT8,
    "p_name": FT.STRING,
    "p_brand": FT.STRING,
    "p_type": FT.STRING,
    "p_size": FT.INT4,
    "p_retailprice": FT.DOUBLE,
}

_F1 = "c_acctbal * 2.0 + 100.0 > 10000.0 AND c_mktsegment = 'BUILDING'"
_C1 = ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"]


@query("p2_lang_arith", oracle=_oracle_for("customer", _F1, _C1, _CUSTOMER))
def p2_lang_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic + comparison + AND through the parser (P3/P4/P5)."""
    return _run_filter(spark, sf_dir, "customer", _F1, _C1)


_F2 = "NOT (o_orderstatus = 'O' OR o_totalprice <= 150000.0)"
_C2 = ["o_orderkey", "o_orderstatus", "o_totalprice"]


@query("p5_lang_not_or", oracle=_oracle_for("orders", _F2, _C2, _ORDERS))
def p5_lang_not_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT / OR / parentheses through the parser (P5)."""
    return _run_filter(spark, sf_dir, "orders", _F2, _C2)


_F3 = "p_name LIKE '%widget' AND p_brand IN ('Brand#2', 'Brand#10', 'Brand#23')"
_C3 = ["p_partkey", "p_name", "p_brand"]


@query("p6_lang_like_in", oracle=_oracle_for("part", _F3, _C3, _PART))
def p6_lang_like_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + string-only IN through the parser (P6/P7)."""
    return _run_filter(spark, sf_dir, "part", _F3, _C3)


_F4 = "c_name = 'Customer' + '#000000042'"
_C4 = ["c_custkey", "c_name"]


@query("p3_lang_concat", oracle=_oracle_for("customer", _F4, _C4, _CUSTOMER))
def p3_lang_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + string concatenation (P3, expr.cpp:417-440)."""
    return _run_filter(spark, sf_dir, "customer", _F4, _C4)


_F5 = "p_size % 7 = 3.0 AND -10 < p_size - 20"
_C5 = ["p_partkey", "p_size"]


@query("p3_lang_fmod_unary", oracle=_oracle_for("part", _F5, _C5, _PART))
def p3_lang_fmod_unary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """% as fmod (INT%INT still evaluates in double, reference
    NumEvaluate), unary minus literal, INT↔DOUBLE implicit compare."""
    return _run_filter(spark, sf_dir, "part", _F5, _C5)


_F6 = "o_totalprice / 3 > 50000.0 AND o_orderkey < 1000000000"
_C6 = ["o_orderkey", "o_totalprice"]


@query("p3_lang_div_double", oracle=_oracle_for("orders", _F6, _C6, _ORDERS))
def p3_lang_div_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Division is double division even on INT operands (reference
    expr_evaluator.cpp:127-164: all numeric eval in double)."""
    return _run_filter(spark, sf_dir, "orders", _F6, _C6)
