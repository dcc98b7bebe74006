"""Join queries — the reference has NO joins (SURVEY.md §2.3); the
engine needs them internally (upsert, dedup pair verification) and as a
pipeline surface. These demonstrate the join discipline that matters at
100 TB: broadcast for small dims (region/nation/customer/supplier fit
in memory at any SF — they grow with SF but stay dim-sized), shuffle
join only where both sides are fact-sized, semi/anti instead of
join+distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_spark.functions.agg import dec_sum
from vectordb_spark.plans import oracle as O
from vectordb_spark.queries import query
from vectordb_spark.sources.readers import load_table


@query(
    "j1_broadcast_enrich",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {O.dec_sum("o.o_totalprice")} AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus <> 'F'
    GROUP BY c.c_mktsegment
    """,
)
def j1_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dim + rollup: the filter prunes at the orders
    scan; customer broadcasts (no shuffle of the fact side on the
    join key — only the final small groupBy shuffles)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.where(F.col("o_orderstatus") != "F")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "j2_star_join_revenue",
    oracle=f"""
    SELECT n.n_name,
           COUNT(*) AS n_lines,
           {O.dec_sum("l.l_extendedprice * (1.0 - l.l_discount)", 6)} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY n.n_name
    """,
)
def j2_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join (lineitem ⋈ orders ⋈ customer ⋈ nation) with revenue
    rollup by nation — the TPC-H shape. lineitem⋈orders is the one
    genuine shuffle join (both fact-sized); customer and nation
    broadcast; Catalyst+AQE order the rest."""
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.join(o.where(F.col("o_orderstatus") == "O"), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dec_sum(rev, 6).alias("revenue"),
        )
    )


@query(
    "j3_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders — left-anti join (NOT EXISTS), not
    join+filter+distinct; the anti join never materializes matches."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "j4_semi_join",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part p
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49
    )
    """,
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts that ever shipped in near-max quantity — left-semi join
    (EXISTS); the filter pushes into the lineitem scan first."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")  # noqa: E741
    return p.join(
        l.where(F.col("l_quantity") >= 49), p.p_partkey == l.l_partkey, "left_semi"
    ).select("p_partkey", "p_name", "p_retailprice")
