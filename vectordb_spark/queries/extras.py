"""Remaining surface queries: NEARBY geo predicate through the real
filter-language parser (P8), set operations and CUBE (absent from the
reference — §2.7 — but free on Spark, included as exceed-parity
surface), AVG/DISTINCT (reference A6 "missing"), and the
insert-prepare PK bitmask (S2) as a relational query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_spark.expr import parse_filter, to_duckdb_sql, to_spark_column
from vectordb_spark.functions.agg import dec_avg, dec_sum
from vectordb_spark.plans import oracle as O
from vectordb_spark.queries import query
from vectordb_spark.schema import FieldType as FT
from vectordb_spark.sources.readers import load_table

# --------------------------------------------------------------- geo (P8)

# Deterministic synthetic coordinates derived from the customer key:
# lat in [-90, 90), lon in [-180, 180), exact double arithmetic.
_LAT_S = "CAST(c_custkey % 180 AS DOUBLE) - 90.0 + 0.25"
_LON_S = "CAST((c_custkey * 7) % 360 AS DOUBLE) - 180.0 + 0.25"
# target = the derived coordinates of c_custkey 42, so the disc is
# populated at every scale factor
_NEARBY_FILTER = "NEARBY(Location, -47.75, 114.25, 2000)"

_GEO_AST = parse_filter(_NEARBY_FILTER, {"Location": FT.GEO_POINT})


@query(
    "p8_nearby_geo",
    oracle=f"""
    SELECT c_custkey, Location.latitude AS lat, Location.longitude AS lon FROM (
        SELECT c_custkey,
               struct_pack(latitude := {_LAT_S}, longitude := {_LON_S}) AS Location
        FROM customer
    )
    WHERE {to_duckdb_sql(_GEO_AST)}
    """,
)
def p8_nearby_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEARBY(geo, lat, lon, km) through the parser (reference P8:
    expr.cpp:532-608, haversine R=6371 geoindex.cpp:41-59) over
    deterministically derived coordinates. The Spark side includes the
    bounding-box prefilter (pure optimization — result-identical)."""
    c = load_table(spark, sf_dir, "customer")
    geo = c.select(
        "c_custkey",
        F.struct(
            F.expr(_LAT_S).alias("latitude"), F.expr(_LON_S).alias("longitude")
        ).alias("Location"),
    )
    return geo.where(to_spark_column(_GEO_AST)).select(
        "c_custkey",
        F.col("Location.latitude").alias("lat"),
        F.col("Location.longitude").alias("lon"),
    )


# ------------------------------------------------------- set operations


@query(
    "so1_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def so1_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations with both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "so2_except",
    oracle="""
    SELECT p_size AS size FROM part
    EXCEPT
    SELECT CAST(l_linenumber AS INT) FROM lineitem
    """,
)
def so2_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): part sizes that never appear as a line
    number. subtract == EXCEPT DISTINCT; exceptAll would be bag
    difference and leave multiplicity leftovers."""
    p = load_table(spark, sf_dir, "part").select(F.col("p_size").alias("size"))
    l = load_table(spark, sf_dir, "lineitem").select(  # noqa: E741
        F.col("l_linenumber").cast("int").alias("size")
    )
    return p.subtract(l)


@query(
    "so3_union_counts",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey FROM supplier
    )
    GROUP BY nationkey
    """,
)
def so3_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + rollup of combined key frequencies."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------- beyond-parity aggs


@query(
    "a6_avg_distinct",
    oracle=f"""
    SELECT c_mktsegment,
           {O.dec_avg("c_acctbal")} AS avg_acctbal,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def a6_avg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG (decimal-exact) + COUNT(DISTINCT) — the aggregations the
    reference lacks (A6: AVG commented out, DISTINCT absent)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        dec_avg("c_acctbal").alias("avg_acctbal"),
        F.count_distinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "a6_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {O.dec_sum("l_quantity")} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a6_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — partial-aggregate sharing across the 4
    grouping combinations in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dec_sum("l_quantity").alias("sum_qty")
    )


# ------------------------------------------------------------ JSON field


@query(
    "json_props_extract",
    oracle=f"""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
           COUNT(*) AS n,
           {O.dec_sum("value")} AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field addressing — the reference stores JSON opaquely and
    rejects it in filters (expr.cpp:672-673); Spark's get_json_object
    makes it queryable (beyond-parity, like A6). Buckets events by the
    numeric props.k."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.expr("CAST(get_json_object(props, '$.k') AS BIGINT) div 10").alias(
            "k_bucket"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value").alias("sum_value"),
    )


# ------------------------------------------------- insert-prepare masks


@query(
    "s2_insert_prepare_mask",
    oracle="""
    SELECT pos // 32 AS mask_idx,
           CAST(SUM(CASE WHEN EXISTS (
                   SELECT 1 FROM customer c WHERE c.c_custkey = p.pos
               ) THEN 1 << (pos % 32) ELSE 0 END) AS BIGINT) AS mask
    FROM (SELECT unnest(generate_series(0, 199)) AS pos) p
    GROUP BY 1
    """,
)
def s2_insert_prepare_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert-prepare PK-existence bitmasks (reference S2:
    table_segment_mvp.cpp:816-876): probe PKs 0..199 against customer,
    pack 32 bits per mask — as a pure relational query (left-semi join
    + bit math), the distributed form of the API in table.py."""
    probe = spark.range(0, 200).select(F.col("id").alias("pos"))
    c = load_table(spark, sf_dir, "customer")
    exists = probe.join(
        c.select(F.col("c_custkey").alias("pos")), "pos", "left_semi"
    ).withColumn("bit", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"))
    all_pos = probe.join(exists.select("pos", "bit"), "pos", "left").fillna(
        {"bit": 0}
    )
    return all_pos.groupBy(
        F.expr("pos div 32").alias("mask_idx")
    ).agg(F.sum("bit").alias("mask"))


@query(
    "a7_percentile_facets",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def a7_percentile_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per facet (beyond-ref A-series:
    the latency/quality-score distribution summary every data pipeline
    dashboard needs). Spark's sort-based ``percentile`` and DuckDB's
    ``quantile_cont`` share the (n-1)·p interpolation — verified
    bit-exact. At 100 TB swap in ``approx_percentile`` (t-digest,
    mergeable map-side) — same plan shape, bounded memory; the exact
    form here doubles as its accuracy oracle."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


_HIST_BUCKET = (
    "CAST(CASE WHEN value < 0.0 THEN 0 "
    "WHEN value >= 100.0 THEN 21 "
    "ELSE floor(CAST(value AS DOUBLE) / 5.0) + 1 END AS BIGINT)"
)


@query(
    "a8_value_histogram",
    oracle=f"""
    SELECT event_type, {_HIST_BUCKET} AS bucket, COUNT(*) AS n
    FROM events
    GROUP BY event_type, bucket
    """,
)
def a8_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram per event type: 20 bins of width 5 over
    [0, 100) with under/overflow buckets 0 and 21 (the explicit
    floor-division formula — DuckDB has no width_bucket, and one
    shared formula beats two builtins with different edge rules).
    Map-side partial agg; output is types × 22 buckets regardless of
    scale."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "event_type", F.expr(_HIST_BUCKET).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
