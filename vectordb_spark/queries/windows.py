"""Window-function and time-series queries — capabilities the reference
lacks entirely (SURVEY.md §2.5 "Window functions: none", §2.9
"Streaming: none") but a 100 TB events pipeline needs: tumbling-window
rollups, sessionization, top-N per key, latest-row-wins (the engine's
own upsert internals, exposed as a query).

The events table's nanosecond timestamps are read as epoch-ns BIGINT
(sources/readers.py), so all bucket math is exact integer arithmetic —
no float time anywhere; the DuckDB oracle uses epoch_ns(ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vectordb_spark.functions.agg import dec_sum
from vectordb_spark.plans import oracle as O
from vectordb_spark.queries import query
from vectordb_spark.sources.readers import load_table

_HOUR_NS = 3_600_000_000_000


@query(
    "w1_tumbling_window",
    oracle=f"""
    SELECT (epoch_ns(ts) // {_HOUR_NS}) * {_HOUR_NS} AS window_start_ns,
           event_type,
           COUNT(*) AS n_events,
           {O.dec_sum("value")} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def w1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour rollup by event type. In Structured Streaming
    the identical plan runs incrementally with a watermark
    (streaming/ingest.py); batch and stream share the bucket math."""
    e = load_table(spark, sf_dir, "events")
    # integer div: ts (~1.7e18) exceeds double's 2^53 mantissa, so
    # float division would mis-bucket events near window edges
    wstart = F.expr(f"(ts div {_HOUR_NS}) * {_HOUR_NS}")
    return e.groupBy(
        wstart.alias("window_start_ns"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("sum_value"),
    )


_GAP_US = 1_800_000_000  # 30 min in microseconds


@query(
    "w2_sessionize",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                    > {_GAP_US} OR lag(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                    IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
    ),
    sessions AS (
        SELECT user_id, event_id, tus,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(tus) AS session_start_us,
           MAX(tus) AS session_end_us, COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def w2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a 30-min inactivity gap starts a new session;
    lag → flag → running sum → per-session rollup. One shuffle on
    user_id serves every window in the chain (same partition key)."""
    # microsecond domain: DuckDB reads the parquet nano-timestamps at
    # microsecond precision, so the oracle can only see epoch_us —
    # truncate FIRST and run every comparison in us on both sides.
    e = load_table(spark, sf_dir, "events").withColumn(
        "tus", F.expr("ts div 1000")
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    prev = F.lag("tus").over(w)
    flagged = e.select(
        "user_id",
        "event_id",
        "tus",
        F.when(prev.isNull() | ((F.col("tus") - prev) > _GAP_US), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    wsum = (
        W.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sessions = flagged.withColumn("session_id", F.sum("is_start").over(wsum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("tus").alias("session_start_us"),
        F.max("tus").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "w3_topn_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY c.c_custkey
                                  ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def w3_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per customer: ranking window over a
    broadcast join (customer is the small dim side)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    w = W.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("c_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "w4_latest_per_key",
    oracle="""
    SELECT user_id, event_id AS latest_event_id, value AS latest_value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def w4_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user — the engine's upsert last-wins internal
    (SURVEY.md §1.5: row_number over pk ordered by _row_id desc),
    exposed over the events table."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("value").alias("latest_value"),
        )
    )


@query(
    "w5_running_total",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS tus,
           CAST(SUM(CAST(value AS DECIMAL(28,4)))
                OVER (PARTITION BY user_id
                      ORDER BY epoch_us(ts), event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
    FROM events
    """,
)
def w5_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user total (frame-bounded analytic window) —
    decimal accumulation keeps the prefix sums order-exact."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "tus", F.expr("ts div 1000")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        "tus",
        F.sum(F.col("value").cast("decimal(28,4)")).over(w).cast("double")
        .alias("running_value"),
    )


@query(
    "w6_gapfill_hourly",
    oracle=f"""
    WITH counts AS (
        SELECT event_type, epoch_ns(ts) // {_HOUR_NS} AS bucket,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
        FROM counts GROUP BY event_type
    ),
    spine AS (
        SELECT event_type, unnest(generate_series(lo, hi)) AS bucket
        FROM bounds
    )
    SELECT s.event_type, s.bucket * {_HOUR_NS} AS window_start_ns,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN counts c
      ON s.event_type = c.event_type AND s.bucket = c.bucket
    """,
)
def w6_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample per event type: empty hours appear as
    zero rows (the time-series densification every rollup/forecast
    pipeline needs; absent in the reference). The spine is
    ``sequence(min, max)`` per group — one row per series, exploded —
    so spine size is output-bound, never a cross join; the left join
    broadcasts nothing and shuffles only (type, bucket) pairs. Integer
    ns bucket math throughout (ts > 2^53 — float would mis-bucket)."""
    e = load_table(spark, sf_dir, "events")
    counts = (
        e.groupBy(
            "event_type", F.expr(f"ts div {_HOUR_NS}").alias("bucket")
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    spine = (
        counts.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi)")).alias("bucket"),
        )
    )
    return (
        spine.join(counts, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            (F.col("bucket") * _HOUR_NS).alias("window_start_ns"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


_SLIDE_NS = 1_800_000_000_000  # 30 min slide, 1 h length = 2 windows/event


@query(
    "w7_sliding_window",
    oracle=f"""
    WITH assigned AS (
        SELECT event_type, value,
               unnest([ (epoch_ns(ts) // {_SLIDE_NS}) * {_SLIDE_NS},
                        (epoch_ns(ts) // {_SLIDE_NS}) * {_SLIDE_NS} - {_SLIDE_NS} ])
                   AS window_start_ns
        FROM events
    )
    SELECT window_start_ns, event_type,
           COUNT(*) AS n_events,
           {O.dec_sum("value")} AS sum_value
    FROM assigned
    GROUP BY 1, 2
    """,
)
def w7_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rollup (1 h windows every 30 min): each event
    lands in exactly len/slide = 2 windows, materialized by a
    2-element explode before the aggregate — the batch twin of
    ``F.window(ts, '1 hour', '30 minutes')`` with the same integer-ns
    bucket discipline as w1 (no float time). Shuffle volume is
    2× rows of narrow (bucket, type, value) triples; partial
    aggregation still combines map-side."""
    e = load_table(spark, sf_dir, "events")
    s0 = F.expr(f"(ts div {_SLIDE_NS}) * {_SLIDE_NS}")
    assigned = e.select(
        "event_type",
        "value",
        F.explode(F.array(s0, s0 - _SLIDE_NS)).alias("window_start_ns"),
    )
    return assigned.groupBy("window_start_ns", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("sum_value"),
    )


_DAY_NS = 24 * _HOUR_NS


@query(
    "w8_rollup_grains",
    oracle=f"""
    SELECT (epoch_ns(ts) // {_DAY_NS}) * {_DAY_NS} AS day_ns,
           (epoch_ns(ts) // {_HOUR_NS}) * {_HOUR_NS} AS hour_ns,
           COUNT(*) AS n_events,
           {O.dec_sum("value")} AS sum_value
    FROM events
    GROUP BY ROLLUP(1, 2)
    """,
)
def w8_rollup_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup (the hypertable/continuous-aggregate
    shape): hourly, daily, and grand-total rows from ONE pass via
    ROLLUP grouping sets — Spark computes all three grains in a single
    shuffle with map-side partial aggregation instead of three jobs.
    NULL grain columns mark the aggregated-out levels (data buckets are
    never null, so the marker is unambiguous); integer-ns bucket math
    as in w1."""
    e = load_table(spark, sf_dir, "events")
    day = F.expr(f"(ts div {_DAY_NS}) * {_DAY_NS}")
    hour = F.expr(f"(ts div {_HOUR_NS}) * {_HOUR_NS}")
    return e.rollup(day.alias("day_ns"), hour.alias("hour_ns")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("sum_value"),
    )


@query(
    "w9_ntile_length_deciles",
    oracle="""
    SELECT lang, decile, COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM (
        SELECT lang, n_chars,
               ntile(10) OVER (PARTITION BY lang
                               ORDER BY n_chars, doc_id) AS decile
        FROM documents
    )
    GROUP BY lang, decile
    """,
)
def w9_ntile_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length deciles via ntile — the
    distribution-profiling pass before length-based curation cuts.
    Partitioned by lang so every window is parallel (a GLOBAL ntile
    would be a single-partition window — the known scale trap; at
    100 TB global quantiles come from approx_percentile boundaries +
    a bucket join instead)."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    return (
        d.select("lang", "n_chars", F.ntile(10).over(w).cast("long").alias("decile"))
        .groupBy("lang", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@query(
    "w10_interarrival_stats",
    oracle="""
    WITH g AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id, event_type
                         ORDER BY epoch_us(ts), event_id) AS gap
        FROM events
    )
    SELECT event_type, COUNT(gap) AS n_gaps,
           CAST(SUM(gap) AS BIGINT) AS sum_gap_us,
           CAST(SUM(gap) AS DOUBLE) / COUNT(gap) AS avg_gap_us,
           MAX(gap) AS max_gap_us
    FROM g WHERE gap IS NOT NULL
    GROUP BY event_type
    """,
)
def w10_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per event type (lag window over
    (user, type) — parallel partitions — then one agg): the
    session-gap calibration query that picks sessionization thresholds
    like w2's 30 min. Integer-µs gaps summed exactly; the average is
    one double division in both engines."""
    e = load_table(spark, sf_dir, "events")
    tus = F.expr("ts div 1000")
    w = W.partitionBy("user_id", "event_type").orderBy(tus, "event_id")
    g = e.select(
        "event_type", (tus - F.lag(tus).over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    return g.groupBy("event_type").agg(
        F.count("gap").alias("n_gaps"),
        F.sum("gap").alias("sum_gap_us"),
        (F.sum("gap").cast("double") / F.count("gap")).alias("avg_gap_us"),
        F.max("gap").alias("max_gap_us"),
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
    ),
    v AS (
        SELECT user_id, MIN(tus) AS tv FROM e
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.tus) AS tc
        FROM e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.tus > v.tv
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.tus) AS tp
        FROM e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.tus > c.tc
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_view_click_purchase
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that click — the
    strictly-ordered step semantics (a purchase before the click does
    not count). Three stage aggregates, each a shuffle on user_id that
    AQE coalesces; the per-stage frames carry one (user, ts) row per
    user, so every join after stage 1 is tiny. Integer-µs comparisons
    throughout."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("tus")
    )
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tus").alias("tv"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("tus") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("tc"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("tus") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("tp"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(
            p.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
        )
    )


_WEEK_NS = 7 * _DAY_NS


@query(
    "cohort_retention",
    oracle=f"""
    WITH f AS (
        SELECT user_id, MIN(epoch_ns(ts) // {_WEEK_NS}) AS w0
        FROM events GROUP BY user_id
    ),
    a AS (
        SELECT DISTINCT user_id, epoch_ns(ts) // {_WEEK_NS} AS w FROM events
    )
    SELECT f.w0 * {_WEEK_NS} AS cohort_week_ns,
           CAST(a.w - f.w0 AS BIGINT) AS week_offset,
           COUNT(*) AS n_active
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week,
    counted in each later week they were active — the
    (cohort, offset) triangle every growth dashboard draws. Two
    aggregates sharing the user_id shuffle + one join on the
    per-user frames (rows = users, not events, after stage 1); the
    distinct-week projection bounds the active set at users × weeks.
    Integer-ns week buckets as everywhere (COUNT(*) is per
    (user, week) distinct row, so no COUNT DISTINCT shuffle)."""
    e = load_table(spark, sf_dir, "events")
    w = F.expr(f"ts div {_WEEK_NS}")
    f = (
        e.select("user_id", w.alias("w"))
        .groupBy("user_id")
        .agg(F.min("w").alias("w0"))
    )
    a = e.select("user_id", w.alias("w")).distinct()
    return (
        a.join(f, "user_id")
        .groupBy(
            (F.col("w0") * _WEEK_NS).alias("cohort_week_ns"),
            (F.col("w") - F.col("w0")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
