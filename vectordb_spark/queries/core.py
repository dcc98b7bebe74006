"""Core relational surface: scans, filters, projections, pagination,
PK lookups, statistics, facet aggregations (SURVEY.md §2.1, §2.2, §2.4,
§2.6 T7).

Each query maps to a reference operator (cited) and carries a DuckDB
oracle. Filters/projections are plain Catalyst expressions → predicate
pushdown + column pruning reach the parquet scan for free; aggregates on
doubles go through decimal accumulation (functions/agg.py) so results
are order-independent at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_spark.functions.agg import dec_sum
from vectordb_spark.plans import oracle as O
from vectordb_spark.queries import query
from vectordb_spark.sources.readers import load_table


@query(
    "s4_full_scan_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def s4_full_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table scan + filter + projection (reference S4:
    vec_search_executor.cpp:1016-1029; projection table_mvp.cpp:462-594)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )


@query(
    "p3_arith_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) AS net_price
    FROM lineitem
    WHERE l_extendedprice * (1.0 - l_discount) > 90000.0
    """,
)
def p3_arith_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic in filters/projections (reference P3/P4:
    expr_evaluator.cpp:127-164,196-255). Per-row double math is
    order-independent, so raw doubles are safe here."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.withColumn("net_price", net)
        .where(F.col("net_price") > 90000.0)
        .select("l_orderkey", "l_linenumber", "net_price")
    )


@query(
    "p3_fmod_filter",
    oracle="""
    SELECT o_orderkey, o_totalprice % 7.0 AS price_mod
    FROM orders
    WHERE o_totalprice % 7.0 < 1.5
    """,
)
def p3_fmod_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`%` is C fmod in the reference (expr_evaluator.cpp:156-160):
    result takes the dividend's sign. Spark's `%` and DuckDB's `%` on
    doubles both match; DuckDB's fmod() does NOT (it is floored-mod,
    sign of divisor) — never use it in oracles."""
    o = load_table(spark, sf_dir, "orders")
    m = F.col("o_totalprice") % F.lit(7.0)
    return (
        o.withColumn("price_mod", m).where(F.col("price_mod") < 1.5)
        .select("o_orderkey", "price_mod")
    )


@query(
    "p6_like_filter",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_name LIKE '%1%' AND c_mktsegment LIKE 'B_ILDING'
    """,
)
def p6_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE with % and _ wildcards (reference P6:
    expr_evaluator.cpp:14-35)."""
    c = load_table(spark, sf_dir, "customer")
    return c.where(
        F.col("c_name").like("%1%") & F.col("c_mktsegment").like("B_ILDING")
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "p7_in_filter",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation
    WHERE n_name IN ('NATION_1', 'NATION_5', 'NATION_12', 'NATION_21')
    """,
)
def p7_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN over string literals (reference P7: expr.cpp:483-509 —
    string attributes only)."""
    n = load_table(spark, sf_dir, "nation")
    return n.where(
        F.col("n_name").isin("NATION_1", "NATION_5", "NATION_12", "NATION_21")
    ).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "s5_pk_point_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    WHERE c_custkey IN (1, 5, 10, 42, 99)
    """,
)
def s5_pk_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-list point lookup (reference S5: PK2ID,
    table_segment_mvp.cpp:408-427). An isin over the PK column; the
    predicate is pushed into the parquet scan."""
    c = load_table(spark, sf_dir, "customer")
    return c.where(F.col("c_custkey").isin(1, 5, 10, 42, 99)).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


@query(
    "t7_pagination",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders
    ORDER BY o_orderkey
    LIMIT 50 OFFSET 100
    """,
)
def t7_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skip/limit pagination in key order (reference T7:
    vec_search_executor.cpp:958-1029, web_controller.hpp:904-911).
    Timestamp formatted to string on both sides (oracle-hash safety).

    Scale note: offset+limit plans as a global TakeOrdered of
    offset+limit rows — fine at the top of the table (the reference's
    use), but a deep offset materializes the whole prefix; the 100 TB
    form is keyset pagination (``t7_keyset_pagination``), which turns
    the page boundary into a pushed-down range predicate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .offset(100)
        .limit(50)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


@query(
    "t7_keyset_pagination",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders
    WHERE o_orderkey > 400
    ORDER BY o_orderkey
    LIMIT 50
    """,
)
def t7_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) pagination: the page after key 400. The
    boundary is a range predicate that pushes into the parquet scan
    (PushedFilters: GreaterThan), so page N costs the same as page 1 —
    the deep-pagination form that survives 100 TB, unlike OFFSET."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey") > 400)
        .orderBy("o_orderkey")
        .limit(50)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


@query(
    "s11_statistics",
    oracle="SELECT COUNT(*) AS total_records FROM lineitem",
)
def s11_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table statistics (reference S11: db_server.cpp:105-119)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("total_records"))


@query(
    "a4_facet_group_sum",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS count_rows,
           {O.dec_sum("value")} AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def a4_facet_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-key facet with SUM/MIN/MAX/COUNT (reference A1-A4:
    aggregation.hpp:21-122, db_server.cpp:362-456)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("count_rows"),
        dec_sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@query(
    "a4_global_agg",
    oracle=f"""
    SELECT COUNT(*) AS count_rows,
           {O.dec_sum("l_quantity")} AS sum_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    """,
)
def a4_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (group-less) facet (reference: empty group list = key "1",
    db_server.cpp:395-397)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("count_rows"),
        dec_sum("l_quantity").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@query(
    "a2_facet_expr_key",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS count_rows,
           {O.dec_sum("o_totalprice * 0.5")} AS sum_half_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def a2_facet_expr_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet whose aggregate argument is an expression (reference A2:
    aggregates evaluate full filter-language expressions,
    aggregation.hpp:272-295)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderstatus") == "O")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("count_rows"),
            dec_sum(F.col("o_totalprice") * 0.5).alias("sum_half_price"),
        )
    )
