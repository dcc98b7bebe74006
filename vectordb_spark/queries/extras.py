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


# ------------------------------------------------------ geo radius JOIN

# Deterministic coordinates packed into a ±15°/±30° band so the
# 300 km discs actually contain cross-table points at every scale
# factor (the p8 derivation spreads over the whole globe — fine for a
# single 2000 km disc, empty for pairwise 300 km discs at small SF)
_GJ_CLAT_S = "CAST(c_custkey % 30 AS DOUBLE) - 15.0 + 0.25"
_GJ_CLON_S = "CAST((c_custkey * 7) % 60 AS DOUBLE) - 30.0 + 0.25"
_SLAT_S = "CAST(s_suppkey % 30 AS DOUBLE) - 15.0 + 0.75"
_SLON_S = "CAST((s_suppkey * 11) % 60 AS DOUBLE) - 30.0 + 0.75"

_GJ_R_KM = 300.0
_GJ_CELL_DEG = 6  # 360/6 = 60 lon cells
# Completeness bound: restricted to |lat| <= 60 deg, one lon degree is
# >= 55.5 km, so a 300 km radius spans <= 5.41 lon degrees <= one
# 6-degree cell — the 3x3 neighbor probe provably covers the disc.
_GJ_LAT_MAX = 60.0

_GJ_ORACLE = f"""
WITH c AS (
    SELECT c_custkey, {_GJ_CLAT_S} AS lat, {_GJ_CLON_S} AS lon FROM customer
    WHERE abs({_GJ_CLAT_S}) <= {_GJ_LAT_MAX}
),
s AS (
    SELECT s_suppkey, {_SLAT_S} AS lat, {_SLON_S} AS lon,
           CAST(floor((({_SLAT_S}) + 90.0) / {_GJ_CELL_DEG}) AS BIGINT) AS cla,
           CAST(floor((({_SLON_S}) + 180.0) / {_GJ_CELL_DEG}) AS BIGINT) % 60 AS clo
    FROM supplier
    WHERE abs({_SLAT_S}) <= {_GJ_LAT_MAX}
),
probes AS (
    SELECT c.*,
           CAST(floor((lat + 90.0) / {_GJ_CELL_DEG}) AS BIGINT) + d.dla AS cla,
           ((CAST(floor((lon + 180.0) / {_GJ_CELL_DEG}) AS BIGINT) + d.dlo) % 60 + 60) % 60 AS clo
    FROM c, (SELECT a.dla, b.dlo
             FROM (VALUES (-1), (0), (1)) a(dla),
                  (VALUES (-1), (0), (1)) b(dlo)) d
),
pairs AS (
    SELECT p.c_custkey, s.s_suppkey,
           2.0 * 6371.0 * atan2(
               sqrt(pow(sin(radians(s.lat - p.lat) / 2), 2)
                    + cos(radians(p.lat)) * cos(radians(s.lat))
                      * pow(sin(radians(s.lon - p.lon) / 2), 2)),
               sqrt(1 - (pow(sin(radians(s.lat - p.lat) / 2), 2)
                         + cos(radians(p.lat)) * cos(radians(s.lat))
                           * pow(sin(radians(s.lon - p.lon) / 2), 2)))
           ) AS km
    FROM probes p JOIN s ON p.cla = s.cla AND p.clo = s.clo
)
SELECT c_custkey, s_suppkey, CAST(floor(km) AS BIGINT) AS km_floor
FROM pairs WHERE km <= {_GJ_R_KM}
"""


@query("geo_join_radius_pairs", oracle=_GJ_ORACLE)
def geo_join_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo-radius JOIN: every (customer, supplier) pair within
    {_GJ_R_KM} km, via grid-cell bucketing — the scale shape the
    reference's single-point NEARBY (P8/X4 R-tree) cannot express.
    Both sides land in {_GJ_CELL_DEG}°×{_GJ_CELL_DEG}° cells; the left
    side probes its 3×3 neighborhood (9-row explode), the join is an
    equi-join on (cell_lat, cell_lon) with lon cells wrapping mod 60,
    and haversine verifies candidates. Restricted to |lat| ≤
    {_GJ_LAT_MAX}° where one lon degree ≥ 55.5 km makes the 3×3 probe
    provably complete for this radius (polar caps need
    latitude-adaptive lon spans — out of scope). Never all-pairs:
    candidates are bounded by cell occupancy, the spatial analogue of
    the LSH band join."""
    from vectordb_spark.functions.geo import haversine_km

    c = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", F.expr(_GJ_CLAT_S).alias("lat"), F.expr(_GJ_CLON_S).alias("lon"))
        .where(F.abs(F.col("lat")) <= _GJ_LAT_MAX)
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .select(
            "s_suppkey", F.expr(_SLAT_S).alias("lat"), F.expr(_SLON_S).alias("lon")
        )
        .where(F.abs(F.col("lat")) <= _GJ_LAT_MAX)
    )
    cell_la = lambda col: F.floor((F.col(col) + 90.0) / _GJ_CELL_DEG)  # noqa: E731
    cell_lo = lambda col: F.floor((F.col(col) + 180.0) / _GJ_CELL_DEG)  # noqa: E731
    s_cells = s.select(
        "s_suppkey",
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
        cell_la("lat").alias("cla"),
        (cell_lo("lon") % 60).alias("clo"),
    )
    d = F.explode(
        F.array(*[F.struct(F.lit(i).alias("dla"), F.lit(j).alias("dlo"))
                  for i in (-1, 0, 1) for j in (-1, 0, 1)])
    )
    probes = c.select("c_custkey", "lat", "lon", d.alias("d")).select(
        "c_custkey",
        "lat",
        "lon",
        (cell_la("lat") + F.col("d.dla")).alias("cla"),
        (((cell_lo("lon") + F.col("d.dlo")) % 60 + 60) % 60).alias("clo"),
    )
    km = haversine_km(F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon"))
    return (
        probes.join(s_cells, ["cla", "clo"])
        .withColumn("km", km)
        .where(F.col("km") <= _GJ_R_KM)
        .select(
            "c_custkey",
            "s_suppkey",
            F.floor("km").cast("long").alias("km_floor"),
        )
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


# ------------------------------------------------- z-order range scan


def _zorder_oracle() -> str:
    """The oracle runs the PLAIN rectangle predicate — it never sees a
    z-value. If the engine's z-range bound were wrong in either
    direction (excluding true rows, or the residual failing to cut
    false positives) the row sets diverge and the gate fails."""
    return """
    SELECT l_returnflag,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
               AS sum_price
    FROM lineitem
    WHERE (l_partkey % 256) BETWEEN 32 AND 95
      AND (l_suppkey % 8) BETWEEN 2 AND 5
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """


@query("zorder_range_scan", oracle=_zorder_oracle())
def zorder_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) rectangle scan: the two-column range predicate
    (partkey-bucket x suppkey-bucket) is served as ONE z-interval plus
    the exact rectangle residual. Because the spread function is
    strictly monotone per axis, z(lo_a, lo_b)..z(hi_a, hi_b) is a
    provably correct SUPERSET interval — the oracle runs the plain
    rectangle with no z anywhere, so the gate certifies the interval
    bound and the bit-interleave arithmetic at once.

    100 TB shape: on a table laid out with operators/zorder.zorder_by,
    `_z BETWEEN lo AND hi` is a single parquet min/max byte-range prune
    over files that are tight in BOTH columns (the one-sort-order
    limitation this exists to break; pruning measured in
    tests/test_zorder.py). All z math is shifts+adds — codegen, no UDF,
    bit-identical in DuckDB. Reference parity: the reference has no
    layout clustering at all (single in-memory segment,
    table_segment_mvp.cpp); beyond-reference scale surface."""
    from vectordb_spark.operators.zorder import z_value_sql

    li = load_table(spark, sf_dir, "lineitem")
    z = z_value_sql("l_partkey % 256", "l_suppkey % 8", 8)
    z_lo = _z_of(32, 2, 8)
    z_hi = _z_of(95, 5, 8)
    return (
        li.withColumn("_z", F.expr(z))
        .where(F.col("_z").between(z_lo, z_hi))  # the index interval
        .where(
            (F.col("l_partkey") % 256).between(32, 95)
            & ((F.col("l_suppkey") % 8).between(2, 5))
        )  # exact residual
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dec_sum("l_extendedprice").alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


def _z_of(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for j in range(bits):
        z |= ((a >> j) & 1) << (2 * j)
        z |= ((b >> j) & 1) << (2 * j + 1)
    return z
