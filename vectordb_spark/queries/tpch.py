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


@query(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           {O.dec_sum("l.l_extendedprice * (1.0 - l.l_discount)", 6)} AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 analog: volume shipping between two nations — the two-ROLE
    dimension join (nation joined twice under different roles, supplier
    side and customer side) plus a cross-side disjunction. Scale shape:
    both nation joins ride broadcasts of a 25-row dim; the suppliers of
    the two nations reduce to a broadcast semi-filter on lineitem
    BEFORE the fact-fact shuffle, so the orderkey shuffle carries only
    the two nations' line traffic (~8%% of lineitem), and the
    (n1,n2)|(n2,n1) disjunction is evaluated as a residual on the
    already-joined row, never as a cartesian. The year extraction
    groups 24 months into 2 buckets; revenue accumulates in decimal.
    Reference parity: joins are beyond the reference engine
    (SURVEY §2.3 "None"); this carries the multi-role-dim pattern of
    its catalog queries instead."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    two = n.where(F.col("n_name").isin("NATION_3", "NATION_7"))
    sup = s.join(
        F.broadcast(two), s["s_nationkey"] == two["n_nationkey"]
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = c.join(
        F.broadcast(two), c["c_nationkey"] == two["n_nationkey"]
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust, o["o_custkey"] == cust["c_custkey"])
        .where(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dec_sum(rev, 6).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q13_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Q13 analog: customer order-count distribution — the outer-join
    count pattern whose whole point is PRESERVING the zero group
    (customers with no qualifying orders must appear as c_count=0, so
    an inner join is wrong and COUNT must count the join's right side,
    not rows). The join predicate carries the non-equi residual
    (priority <> '1-URGENT') INSIDE the outer join — filtering orders
    before the join is the correct decorrelation, filtering after it
    would turn matched-but-excluded customers into NULL-mismatches.
    Scale shape: two shuffles (custkey join, c_count regroup), the
    second over at most a few hundred distinct counts → the classic
    two-level aggregation funnel. COUNT of a key column skips NULLs by
    SQL semantics — that IS the zero-preservation mechanism, in both
    engines identically."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.where(F.col("o_orderpriority") != "1-URGENT"),
            c["c_custkey"] == o["o_custkey"],
            "left",
        )
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {O.dec_sum("l_extendedprice * (1.0 - l_discount)", 6)}
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 analog: top supplier by quarterly revenue — the scalar
    aggregate over an aggregated view (the reference's CREATE VIEW +
    correlated MAX). Spark shape: the revenue view materializes ONCE
    via localCheckpoint — without it the lineitem aggregation lineage
    runs twice, once under the MAX and once under the equality probe —
    then the scalar max rides a 1-row broadcast cross-join (Catalyst
    folds it to BroadcastNestedLoopJoin with a single build row: no
    shuffle, no collect-to-driver). Equality on the max is safe only
    because revenue is decimal-accumulated — exact, so the view row
    that produced the max compares bit-equal to it in both engines.
    Ties all surface (ORDER BY suppkey), matching the SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dec_sum(rev, 6).alias("total_revenue"))
        .localCheckpoint()
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == s["s_suppkey"])
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT {O.dec_sum("l.l_extendedprice * (1.0 - l.l_discount)", 6)}
               AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 analog: discounted revenue under an OR-of-ANDs predicate —
    the disjunctive-pushdown stress test. Each disjunct mixes
    part-side (brand, size) and lineitem-side (quantity) conjuncts, so
    the optimizer must FACTOR the single-side implications out of the
    OR rather than evaluate it only post-join: the derived
    `brand IN (12,23,34) AND size BETWEEN 1 AND 15` prunes part before
    its broadcast build, and `quantity BETWEEN 1 AND 30` reaches the
    lineitem parquet scan as a pushed row-group filter. Catalyst does
    both via constraint propagation from the explicit pre-filters
    below (written once on each side — exactly the implied hull, so
    semantics are unchanged); the full OR stays as the join residual.
    At 100 TB the broadcast carries ~2%% of part and the scan skips
    every row group whose quantity stats miss [1,30]."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    p_hull = p.where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    )
    li_hull = li.where((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30))
    disj = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li_hull.join(F.broadcast(p_hull), li["l_partkey"] == p["p_partkey"])
        .where(disj)
        .agg(
            dec_sum(rev, 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q21_sole_late_supplier",
    oracle="""
    WITH lines AS (
        SELECT l.l_orderkey, l.l_suppkey,
               l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS is_late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    ),
    waiting AS (
        SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        FROM lines l1
        WHERE l1.is_late
          AND EXISTS (SELECT 1 FROM lines l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lines l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.is_late)
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM waiting w
    JOIN supplier s ON s.s_suppkey = w.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def tpch_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 analog: suppliers who kept orders waiting — the hardest
    relational shape in the suite: a self-joined EXISTS (another
    supplier participated in the order) AND NOT EXISTS (no OTHER
    supplier was late) over the same fact table. "Late" = shipped >60
    days after the order date (the testdata has no commit/receipt
    dates). Scale shape: the annotated lines view is ONE orderkey
    shuffle (lineitem⋈orders, status-filtered at the scan), after
    which BOTH quantifiers collapse into a single per-order aggregate
    — count of distinct suppliers and count of distinct LATE suppliers
    — broadcast-joined back to the late lines. That replaces the two
    self-joins of the literal SQL with one reduce: EXISTS(other supp)
    ≡ n_supp > 1, NOT EXISTS(other late supp) ≡ n_late_supp = 1 for a
    row that is itself late. At 100 TB this is one fact shuffle + one
    tiny agg instead of three fact-fact joins; the oracle runs the
    literal quantifier form, proving the rewrite."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    lines = (
        li.join(
            o.where(F.col("o_orderstatus") == "F"),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late"),
        )
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    waiting = (
        lines.where(F.col("is_late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.where(
                (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
            ),
            "l_orderkey",
            "left_semi",
        )
    )
    return (
        waiting.join(F.broadcast(s), waiting["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


@query(
    "tpch_q22_dormant_customers",
    oracle=f"""
    WITH cutoff AS (
        SELECT {O.dec_avg("c_acctbal", 2)} AS avg_bal
        FROM customer
        WHERE c_acctbal > 0.0
          AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
    )
    SELECT c.c_mktsegment, COUNT(*) AS numcust,
           {O.dec_sum("c.c_acctbal", 2)} AS totacctbal
    FROM customer c, cutoff
    WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
      AND c.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 analog: dormant high-balance customers — uncorrelated scalar
    subquery (the positive-balance average over three segments, the
    analog of q22's phone-prefix cohort) feeding a filter, then NOT
    EXISTS against RECENT orders (every testdata customer has *some*
    order, so q22's "never ordered" is re-keyed as "no order since
    2000-01-01" — same anti-join pattern, non-degenerate population).
    Scale shape: the scalar average is a 1-row broadcast nested-loop
    join (never a collect); the NOT EXISTS is a LEFT ANTI hash join on
    custkey whose right side is date-pruned AT THE SCAN — at 100 TB
    that is the one shuffle, and AQE converts it to broadcast when the
    recent-order set is small. The avg cut accumulates in decimal so
    both engines threshold on the bit-identical double; per-segment
    totals likewise."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    seg = c.where(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
    )
    cutoff = seg.where(F.col("c_acctbal") > 0.0).agg(
        dec_avg("c_acctbal", 2).alias("avg_bal")
    )
    return (
        seg.join(F.broadcast(cutoff))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.where(
                F.col("o_orderdate")
                >= F.lit("2000-01-01").cast("timestamp_ntz")
            ),
            seg["c_custkey"] == o["o_custkey"],
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec_sum("c_acctbal", 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
        -- partsupp surrogate: the testdata ships no partsupp table, so
        -- the supply relation is derived from observed lineitems; cost
        -- = best unit price this supplier ever quoted for the part
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(l_extendedprice / l_quantity) AS ps_cost
        FROM lineitem GROUP BY 1, 2
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
           ps.ps_cost
    FROM part p
    JOIN supply ps  ON ps.ps_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_type = 'SMALL' AND p.p_size >= 25
      AND r.r_name = 'EUROPE'
      AND ps.ps_cost = (
          SELECT MIN(ps2.ps_cost)
          FROM supply ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
          WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 20
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analog: minimum-cost supplier per part — the correlated
    scalar-MIN subquery shape. The supply relation is derived from
    lineitem (no partsupp in the testdata): per (part, supplier) the
    best observed unit price; MIN is order-independent so the derived
    cost is deterministic. The Spark plan replaces the correlated
    subquery with a window MIN over the region-filtered supply rows —
    one shuffle keyed by part, no re-scan per outer row — and keeps
    rows whose cost equals their partition minimum (exact double
    equality: both sides are the same stored value, not re-derived
    arithmetic). The oracle runs the literal correlated form, proving
    the decorrelation. At 100 TB the region/nation/supplier dims
    broadcast; the supply aggregation and the window share one
    partkey-hash shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    from pyspark.sql import Window as W

    supply = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_cost")
    )
    euro_supp = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(
            F.broadcast(r.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = supply.join(
        F.broadcast(euro_supp),
        supply["ps_suppkey"] == euro_supp["s_suppkey"],
    ).join(
        F.broadcast(
            p.where((F.col("p_type") == "SMALL") & (F.col("p_size") >= 25))
        ),
        F.col("ps_partkey") == F.col("p_partkey"),
    )
    w = W.partitionBy("ps_partkey")
    return (
        cand.withColumn("_min_cost", F.min("ps_cost").over(w))
        .where(F.col("ps_cost") == F.col("_min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "ps_cost",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(20)
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH volumes AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
               l.l_extendedprice * (1.0 - l.l_discount) AS volume,
               ns.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o    ON o.o_orderkey = l.l_orderkey
        JOIN customer c  ON c.c_custkey = o.o_custkey
        JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
        JOIN region rc   ON rc.r_regionkey = nc.n_regionkey
        JOIN supplier s  ON s.s_suppkey = l.l_suppkey
        JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
        JOIN part p      ON p.p_partkey = l.l_partkey
        WHERE rc.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT o_year,
           {O.dec_sum("CASE WHEN supp_nation = 'NATION_9' THEN volume ELSE 0.0 END", 6)}
               / {O.dec_sum("volume", 6)} AS mkt_share
    FROM volumes
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 analog: national market share — the CASE-conditional share
    aggregation over a two-sided dimension tree (customer side fixes
    the MARKET region, supplier side provides the nation whose share
    is measured). Both decimal sums accumulate in one grouped
    aggregate (numerator is the CASE-masked twin of the denominator),
    then one deterministic double division per year row. Scale shape:
    every dimension (customer, nation x2, region, supplier, part)
    broadcasts; the only fact shuffle is lineitem->orders on orderkey,
    then a 2-row aggregate. The oracle is the literal 8-table join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    asia_cust = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(
            F.broadcast(r.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = (
        li.join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            ),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li["l_suppkey"] == F.col("s_suppkey"))
        .join(
            F.broadcast(p.where(F.col("p_type") == "ECONOMY")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    masked = F.when(F.col("supp_nation") == "NATION_9", F.col("volume")).otherwise(F.lit(0.0))
    return (
        vol.groupBy("o_year")
        .agg((dec_sum(masked, 6) / dec_sum(F.col("volume"), 6)).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_type_profit",
    oracle=f"""
    SELECT ns.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           {O.dec_sum(
               "l.l_extendedprice * (1.0 - l.l_discount)"
               " - 0.5 * p.p_retailprice * l.l_quantity", 6)} AS sum_profit
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY ns.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 analog: product-type profit by nation and year. Profit uses
    0.5 * p_retailprice as the supply-cost surrogate (no partsupp
    table): amount = extprice * (1 - disc) - 0.5 * retail * qty, a
    per-row deterministic expression decimal-summed per (nation,
    year). Scale shape: part (name-filtered at the broadcast build),
    supplier->nation, all broadcast; lineitem->orders is the one fact
    shuffle, then a k*years-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")

    supp_nation = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(p.where(F.col("p_name").like("%widget%"))),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .join(F.broadcast(supp_nation), li["l_suppkey"] == F.col("s_suppkey"))
        .select(
            "nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dec_sum(F.col("amount"), 6).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q20_excess_share_suppliers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND EXISTS (
          SELECT 1
          FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
          JOIN part p ON p.p_partkey = ps.l_partkey
          WHERE ps.l_suppkey = s.s_suppkey
            AND p.p_name LIKE 'small%'
            AND (SELECT CAST(COALESCE(SUM(CAST(l1.l_quantity
                            AS DECIMAL(28,4))), 0) AS DOUBLE)
                 FROM lineitem l1
                 WHERE l1.l_partkey = ps.l_partkey
                   AND l1.l_suppkey = ps.l_suppkey
                   AND l1.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
                   AND l1.l_shipdate <  TIMESTAMP '1996-01-01 00:00:00')
                > 0.3 * (SELECT CAST(SUM(CAST(l2.l_quantity
                              AS DECIMAL(28,4))) AS DOUBLE)
                         FROM lineitem l2
                         WHERE l2.l_partkey = ps.l_partkey
                           AND l2.l_suppkey = ps.l_suppkey)
      )
    ORDER BY s.s_name
    """,
)
def tpch_q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 analog: the two-level correlated-aggregate semi-join — the
    part/supplier availability pattern. A supplier qualifies when, for
    some 'small%' part it supplies, its 1995 shipped quantity exceeds
    30% of its all-time shipped quantity of that part (the testdata
    has no partsupp.availqty; the windowed-share condition preserves
    the correlated inner-aggregate-vs-outer-aggregate comparison).
    The Spark plan collapses BOTH correlated aggregates into one
    grouped pass over lineitem — a conditional decimal sum (1995 mask)
    next to the total decimal sum, keyed by (part, supplier) — then a
    broadcast part-name filter, then a semi-join into the
    region-filtered supplier dim. The oracle runs the literal
    twice-correlated EXISTS, proving the rewrite. At 100 TB: one fact
    shuffle on (partkey, suppkey), dims broadcast — versus the
    oracle's per-row re-scans."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    in95 = (
        F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.coalesce(
            F.sum(
                F.when(in95, F.col("l_quantity"))
                .otherwise(F.lit(None))
                .cast("decimal(28,4)")
            ),
            F.lit(0).cast("decimal(28,4)"),
        )
        .cast("double")
        .alias("qty_95"),
        F.sum(F.col("l_quantity").cast("decimal(28,4)"))
        .cast("double")
        .alias("qty_all"),
    )
    qualifying = (
        per_ps.where(F.col("qty_95") > F.lit(0.3) * F.col("qty_all"))
        .join(
            F.broadcast(p.where(F.col("p_name").like("small%"))),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(
            F.broadcast(r.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(qualifying, s["s_suppkey"] == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH good_supp AS (
        SELECT s_suppkey FROM supplier WHERE s_acctbal > 3000
    ),
    v AS (
        SELECT l_partkey AS p_partkey,
               CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                             AS DECIMAL(28,6))) * 1000000 AS BIGINT)
                   AS value_micro
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM good_supp)
        GROUP BY l_partkey
    )
    SELECT p_partkey, value_micro
    FROM v
    WHERE value_micro > (SELECT SUM(value_micro) FROM v) * 0.0008
    ORDER BY value_micro DESC, p_partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 analog: important-stock identification — a grouped value
    rollup HAVING-filtered against an uncorrelated scalar subquery
    (value > fraction of the GLOBAL total). The testdata has no
    partsupp, so the supply-value relation derives from lineitem
    restricted to well-capitalized suppliers (the nation filter's
    stand-in — supplier is 10 rows/SF-unit, broadcast either way).
    Scale shape: ONE partkey-hash shuffle builds the per-part values,
    which are then localCheckpoint-ed — both consumers (the rows and
    their global total) read the materialized |parts|-row result, so
    the fact table is scanned ONCE (without the checkpoint Catalyst
    inlines `v` twice and the plan re-scans lineitem for the scalar
    total — verified via explain during the round-9 plan audit). The
    total collapses to a 1-row broadcast joined into the filter, and
    the value is carried as exact integer micro-units so the threshold
    compare (long * double literal) is bit-identical in both engines.
    The oracle runs the literal subquery form, proving the
    decorrelation."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    good = s.where(F.col("s_acctbal") > 3000).select("s_suppkey")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    v = (
        li.join(F.broadcast(good), li["l_suppkey"] == good["s_suppkey"], "left_semi")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            (F.sum(rev.cast("decimal(28,6)")) * 1000000)
            .cast("long")
            .alias("value_micro")
        )
        .localCheckpoint()  # one fact scan for both consumers below
    )
    total = v.agg(F.sum("value_micro").alias("_total"))
    return (
        v.join(F.broadcast(total))
        .where(F.col("value_micro") > F.col("_total") * F.lit(0.0008))
        .select("p_partkey", "value_micro")
        .orderBy(F.col("value_micro").desc(), "p_partkey")
    )


@query(
    "tpch_q12_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus AS ship_class,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 analog: late-shipment priority classes — the conditional
    two-way count pivot over an order join. The testdata has no
    shipmode/commit/receipt columns, so the class is l_linestatus and
    "late" = shipped >60 days after order date (the suite's standing
    lateness idiom, q4/q21). Scale shape: the single-side year filter
    (l_shipdate) pushes to the lineitem parquet scan; the join is one
    orderkey-hash shuffle with the cross-side lateness inequality as a
    join residual (never a post-join filter over a wider result); both
    priority counts fold into ONE aggregate pass via CASE — the
    classic conditional-pivot discipline, no second scan, no pivot
    operator."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    li_win = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    j = li_win.join(
        o,
        (li_win["l_orderkey"] == o["o_orderkey"])
        & (li_win["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@query(
    "tpch_q16_part_supplier_counts",
    oracle="""
    WITH supply AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT sp.l_suppkey) AS supplier_cnt
    FROM supply sp
    JOIN part p ON sp.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND sp.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
      )
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
)
def tpch_q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 analog: supplier diversity per part attribute — DISTINCT
    supplier counts over a NOT-IN-excluded supply relation. The
    testdata has no partsupp, so the supply relation is the DISTINCT
    (partkey, suppkey) projection of lineitem; the "complaint
    suppliers" NOT IN becomes a LEFT ANTI broadcast join against the
    (tiny) low-balance supplier list. Scale shape: the part attribute
    filter broadcasts into the supply build so non-qualifying parts
    never reach the distinct; the one real shuffle is the
    (brand, size, suppkey)-hash DISTINCT of the fact projection with
    map-side partial dedup; the follow-on countDistinct re-shuffles
    only the ALREADY-DEDUPED relation (≤ |parts|·|suppliers| rows) on
    the group key — two exchanges by key necessity, but only the first
    ever sees fact-table volume. The oracle runs the literal NOT IN
    form."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    p_sel = p.where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_size")
    bad = s.where(F.col("s_acctbal") < 1000).select("s_suppkey")
    supply = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p_sel), li["l_partkey"] == p_sel["p_partkey"])
        .join(F.broadcast(bad), F.col("l_suppkey") == bad["s_suppkey"], "left_anti")
        .select("p_brand", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        supply.groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )
