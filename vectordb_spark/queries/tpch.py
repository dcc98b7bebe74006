"""TPC-H-analog headline queries over the testdata star schema — the
classic analytics shapes (Q1/Q3/Q6 equivalents) that anchor the bench:
wide aggregation, join + top-K by computed measure, selective filter +
product sum. All float sums go through decimal accumulation so results
are partition-order-independent (functions/agg.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_spark.functions.agg import dec_avg, dec_sum
from vectordb_spark.plans import oracle as O
from vectordb_spark.queries import query
from vectordb_spark.sources.readers import load_table


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {O.dec_sum("l_quantity")} AS sum_qty,
           {O.dec_sum("l_extendedprice")} AS sum_base_price,
           {O.dec_sum("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
           {O.dec_sum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 8)} AS sum_charge,
           {O.dec_avg("l_quantity")} AS avg_qty,
           {O.dec_avg("l_discount", 6)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-09-03 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: wide pricing-summary aggregation — one pass, partial
    aggregation map-side, six decimal-exact measures."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        # a date_format()-string compare would run a per-row formatter
        # and hide the predicate from parquet; the timestamp compare is
        # codegen'd AND pushed to row-group stats (shipdate <= day D ≡
        # shipdate < D+1 at any time precision)
        li.where(
            F.col("l_shipdate")
            < F.lit("1998-09-03 00:00:00").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price, 6).alias("sum_disc_price"),
            dec_sum(charge, 8).alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_discount", 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3_top_orders",
    oracle=f"""
    SELECT o.o_orderkey,
           {O.dec_sum("l.l_extendedprice * (1.0 - l.l_discount)", 6)} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
    GROUP BY o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def tpch_q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: segment filter → star join → revenue rollup → top-10 by
    computed measure (TakeOrdered over the aggregate)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(
            o.where(F.col("o_orderstatus") != "F"), li.l_orderkey == o.o_orderkey
        )
        .join(
            F.broadcast(c.where(F.col("c_mktsegment") == "BUILDING")),
            o.o_custkey == c.c_custkey,
        )
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(dec_sum(rev, 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {O.dec_sum("l_extendedprice * l_discount", 6)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: selective scan (all three predicates pushed to parquet) +
    single product-sum — the pure scan-throughput probe."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {O.dec_sum("l.l_extendedprice * (1.0 - l.l_discount)", 6)} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: the six-way local-supplier-volume join — the deepest join
    chain in the bench. Scale shape: the two fact tables (lineitem,
    orders) hash-join on orderkey; supplier / nation / region are
    broadcast dims (explicit hints — they are O(SF·10k) rows at most);
    customer is SF-proportional (150k·SF rows), so it carries NO hint —
    AQE picks broadcast vs shuffle from its actual runtime size, which
    at 100 TB is a shuffle join on o_custkey, not a driver-OOM
    broadcast. The customer-nation = supplier-nation equality rides the
    supplier join as a second key, so no post-join filter re-shuffles.
    Revenue accumulates in decimal (partition-order-independent)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    asia = (
        n.join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
               n["n_regionkey"] == r["r_regionkey"])
        .select("n_nationkey", "n_name")
    )
    sup = s.join(F.broadcast(asia), s["s_nationkey"] == asia["n_nationkey"]).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    cust = c.select("c_custkey", "c_nationkey")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust, o["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(sup),
            (li["l_suppkey"] == sup["s_suppkey"])
            & (F.col("c_nationkey") == sup["s_nationkey"]),
        )
        .groupBy("n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6
            ).alias("revenue")
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {O.dec_sum("l.l_extendedprice * (1.0 - l.l_discount)", 6)} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: returned-item reporting — lost revenue per customer for one
    quarter, top-20. The canonical fact-fact-dim shape: lineitem
    (filtered to returns, predicate pushed to parquet) shuffle-joins
    date-filtered orders on orderkey; the customer join carries NO
    broadcast hint — customer is SF-proportional, so AQE picks
    broadcast vs shuffle from runtime size (at 100 TB: shuffle on
    o_custkey); nation (25 rows) broadcasts. Revenue in decimal,
    top-20 as TakeOrderedAndProject — no global sort."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    o_q = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(o_q, li["l_orderkey"] == o_q["o_orderkey"])
        .join(c, o_q["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(rev, 6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           DATEDIFF('day', DATE '1970-01-01', o.o_orderdate) AS o_orderdate_day,
           o.o_totalprice,
           SUM(l.l_quantity) AS sum_qty
    FROM customer c, orders o, lineitem l
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
      AND c.c_custkey = o.o_custkey
      AND o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o.o_totalprice DESC, o_orderdate_day, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: large-volume customers — the canonical agg-driven semi-join
    (HAVING subquery feeding an IN). The qualifying-order set is one
    hash aggregate over lineitem (SUM(l_quantity) is exact in a double:
    integral values, far under 2^53) reduced to keys; lineitem re-joins
    it LEFT SEMI — Catalyst keeps the tiny key set on the build side
    and AQE broadcasts it, so the fact table never shuffles for the
    qualification step. Orders then customer join only the surviving
    rows (at 100 TB: the semi-join prunes ~99.8% of orders before any
    fact-fact shuffle). Top-100 is TakeOrderedAndProject on the fully
    deterministic (totalprice DESC, day, orderkey) ordering; the date
    is emitted as epoch days so both engines hash an integer."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 300)
        .select("l_orderkey")
    )
    sel = li.join(big, "l_orderkey", "left_semi")
    return (
        sel.join(o, sel["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            .cast("long")
            .alias("o_orderdate_day"),
            "o_totalprice",
        )
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate_day"),
            F.col("o_orderkey"),
        )
        .limit(100)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            "o_orderdate_day", "o_totalprice", "sum_qty",
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 analog: order-priority checking — EXISTS becomes a LEFT SEMI
    hash join whose condition mixes the equi key (orderkey) with an
    inequality that references BOTH sides (l_shipdate > o_orderdate +
    60d; the testdata has no commit/receipt dates, so "late" = shipped
    >60 days after order). Catalyst hashes on the equi part and applies
    the inequality as a residual inside the same join — no cartesian,
    no second pass. The date-range filter prunes orders at the parquet
    scan BEFORE the join, so at 100 TB the semi-join's probe side is
    the 9-month slice, not the full table, and lineitem never
    aggregates or deduplicates: semi-join semantics give the
    at-least-one quantifier for free (vs an EXISTS-via-groupBy rewrite,
    which would shuffle the whole fact table to count matches it then
    throws away)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o_win = o.where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp_ntz"))
    )
    late = o_win.join(
        li,
        (o_win["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o_win["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
    WITH j AS (
        SELECT CASE WHEN p.p_type = 'PROMO'
                    THEN l.l_extendedprice * (1.0 - l.l_discount)
                    ELSE 0.0 END AS promo_rev,
               l.l_extendedprice * (1.0 - l.l_discount) AS total_rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    )
    SELECT CAST(SUM(CAST(promo_rev AS DECIMAL(28,6))) * 1000000 AS BIGINT)
               AS promo_micro,
           CAST(SUM(CAST(total_rev AS DECIMAL(28,6))) * 1000000 AS BIGINT)
               AS total_micro,
           CAST(CAST(SUM(CAST(promo_rev AS DECIMAL(28,6))) * 1000000 AS BIGINT)
                AS DOUBLE) * 100.0 /
           CAST(CAST(SUM(CAST(total_rev AS DECIMAL(28,6))) * 1000000 AS BIGINT)
                AS DOUBLE) AS promo_pct
    FROM j
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 analog: promo revenue ratio — conditional aggregation over a
    dimension join. part broadcasts (O(SF·2k) rows); the CASE folds the
    p_type predicate into the aggregate so one pass produces both the
    conditional and unconditional sum — no second scan, no pivot. The
    ratio is emitted THREE ways deterministic at any partition count:
    both sums as exact integer micro-units (decimal(28,6) accumulation
    → ×1e6 → BIGINT, associative), and the percentage as one IEEE
    double division of those two integers — both engines divide the
    SAME two longs, so the quotient is bit-identical, unlike dividing
    two independently-rounded doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    agg = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            (F.sum(promo.cast("decimal(28,6)")) * 1000000)
            .cast("long")
            .alias("promo_micro"),
            (F.sum(rev.cast("decimal(28,6)")) * 1000000)
            .cast("long")
            .alias("total_micro"),
        )
    )
    return agg.select(
        "promo_micro",
        "total_micro",
        (
            F.col("promo_micro").cast("double")
            * F.lit(100.0)
            / F.col("total_micro").cast("double")
        ).alias("promo_pct"),
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    WITH pk AS (
        SELECT p_partkey FROM part
        WHERE p_brand = 'Brand#4' AND p_type = 'MEDIUM'
    ),
    thresh AS (
        SELECT l_partkey,
               0.2 * ({O.dec_avg("l_quantity")}) AS qty_cut
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM pk)
        GROUP BY l_partkey
    )
    SELECT {O.dec_sum("l.l_extendedprice", 2)} / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN thresh t ON l.l_partkey = t.l_partkey
    WHERE l.l_quantity < t.qty_cut
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 analog: small-quantity-order revenue — the correlated scalar
    aggregate subquery (per-part AVG compared against each line of the
    same part), decorrelated the way Catalyst itself would: semi-join
    lineitem to the qualifying parts FIRST (Brand#4/MEDIUM — parquet
    scans part once, broadcasts ~70 keys), aggregate the per-part
    average over that pruned slice, then join the threshold back and
    filter. The naive correlated form re-scans lineitem per outer row;
    this shape scans it twice total, and at 100 TB both scans carry the
    broadcast partkey prune down to the row-group level. Determinism:
    the threshold is dec-decimal avg → one double multiply by 0.2, so
    both engines compare against the bit-identical cut; revenue is
    decimal-accumulated and the /7.0 is a single IEEE division."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pk = p.where(
        (F.col("p_brand") == "Brand#4") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    pruned = li.join(
        F.broadcast(pk), li["l_partkey"] == pk["p_partkey"], "left_semi"
    )
    thresh = pruned.groupBy("l_partkey").agg(
        (F.lit(0.2) * dec_avg("l_quantity")).alias("qty_cut")
    )
    t = thresh.withColumnRenamed("l_partkey", "t_partkey")
    return (
        pruned.join(
            F.broadcast(t),
            (pruned["l_partkey"] == t["t_partkey"])
            & (pruned["l_quantity"] < t["qty_cut"]),
        )
        .agg(
            (dec_sum("l_extendedprice", 2) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
