"""Sketch gates: HyperLogLog distinct counting and Count-Min frequency
estimation over the events table, oracle-checked EXACTLY (the
cross-engine-deterministic hash discipline of operators/sketch.py).

These are the fixed-state alternatives to the unbounded-state
aggregations a 100 TB pipeline cannot afford: COUNT(DISTINCT user)
per slice shuffles every distinct key; the HLL register table
shuffles 64 integers per slice per partition. Both gates also emit
the exact value next to the estimate, so the oracle verifies the
sketch math AND the accuracy claim in one row set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_spark.operators.sketch import (
    CMS_D,
    HLL_ALPHA,
    HLL_M,
    cms_slot_py,
    cms_slot_sql,
    hll_bucket_sql,
    hll_rank_sql,
)
from vectordb_spark.queries import query
from vectordb_spark.sources.readers import load_table

_EST_Q = 1_000_000  # estimate quantization grid (quantized-ln discipline)

# ----------------------------------------------------------------- HLL

# estimate from (Σ 2^-R over present buckets, #present buckets):
# absent buckets contribute 2^0 = 1 each; zeros == absent (present
# buckets always have rank ≥ 1). The Σ is a sum of dyadic rationals —
# exact in a double in any order — so the raw estimate is one
# correctly-rounded divide; the linear-counting branch has a single ln
# whose 1-ulp cross-engine risk is absorbed by the 1e-6 floor grid.
_HLL_EST = (
    f"CASE WHEN ({HLL_M} - nb) > 0 "
    f"AND ({HLL_ALPHA} * {HLL_M} * {HLL_M} / (spart + ({HLL_M} - nb))) "
    f"< 2.5 * {HLL_M} "
    f"THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - nb)) "
    f"ELSE {HLL_ALPHA} * {HLL_M} * {HLL_M} / (spart + ({HLL_M} - nb)) END"
)

_HLL_ORACLE = f"""
WITH regs AS (
    SELECT event_type,
           {hll_bucket_sql("user_id")} AS b,
           MAX({hll_rank_sql("user_id")}) AS r
    FROM events GROUP BY event_type, {hll_bucket_sql("user_id")}
),
agg AS (
    SELECT event_type,
           SUM(pow(2.0, -r)) AS spart,
           COUNT(*) AS nb
    FROM regs GROUP BY event_type
),
exact AS (
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
    FROM events GROUP BY event_type
)
SELECT agg.event_type, CAST(nb AS BIGINT) AS n_buckets,
       CAST(floor(({_HLL_EST}) * {_EST_Q}) AS BIGINT) AS est_q,
       exact_distinct
FROM agg JOIN exact ON agg.event_type = exact.event_type
ORDER BY agg.event_type
"""


@query("sketch_hll_distinct_users", oracle=_HLL_ORACLE)
def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct users per event type. The register build is an
    ordinary partial-then-final MAX aggregate — map-side combine
    reduces each partition to ≤ |types|·64 rows before the shuffle,
    the fixed-state property that makes this the 100 TB shape. The
    exact COUNT(DISTINCT) rides along for the accuracy row."""
    e = load_table(spark, sf_dir, "events")
    regs = (
        e.select(
            "event_type",
            F.expr(hll_bucket_sql("user_id")).alias("b"),
            F.expr(hll_rank_sql("user_id")).alias("r"),
        )
        .groupBy("event_type", "b")
        .agg(F.max("r").alias("r"))
    )
    agg = regs.groupBy("event_type").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("spart"),
        F.count(F.lit(1)).alias("nb"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        agg.join(exact, "event_type")
        .select(
            "event_type",
            F.col("nb").cast("long").alias("n_buckets"),
            F.expr(f"CAST(floor(({_HLL_EST}) * {_EST_Q}) AS BIGINT)").alias(
                "est_q"
            ),
            "exact_distinct",
        )
        .orderBy("event_type")
    )


# ----------------------------------------------------------- Count-Min

_CMS_PROBES = (1, 2, 3, 5, 8)


def _cms_oracle() -> str:
    probe_rows = ", ".join(
        f"({k}, {row}, {cms_slot_py(k, row)})"
        for k in _CMS_PROBES
        for row in range(CMS_D)
    )
    counter_selects = " UNION ALL ".join(
        f"SELECT {row} AS row, {cms_slot_sql('user_id', row)} AS slot, "
        f"COUNT(*) AS c FROM events GROUP BY 2"
        for row in range(CMS_D)
    )
    probes_sql = ", ".join(str(k) for k in _CMS_PROBES)
    return f"""
WITH counters AS ({counter_selects}),
probes(key, row, slot) AS (VALUES {probe_rows}),
est AS (
    SELECT key, CAST(MIN(COALESCE(c, 0)) AS BIGINT) AS est_count
    FROM probes LEFT JOIN counters USING (row, slot)
    GROUP BY key
),
exact AS (
    SELECT user_id AS key, COUNT(*) AS exact_count
    FROM events WHERE user_id IN ({probes_sql}) GROUP BY user_id
)
SELECT CAST(est.key AS BIGINT) AS key, est_count,
       COALESCE(exact_count, 0) AS exact_count
FROM est LEFT JOIN exact USING (key)
ORDER BY key
"""


@query("sketch_cms_user_frequency", oracle=_cms_oracle())
def sketch_cms_user_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates for probe users: d=3 salted-hash
    rows × w=512 counters, each row an independent map-side-combined
    aggregate (the shuffle carries ≤ d·w counter rows per partition,
    never the events); probes broadcast-join the counter table and
    take the min over rows. est ≥ exact always (one-sided error) —
    the oracle pins both columns."""
    e = load_table(spark, sf_dir, "events")
    counters = None
    for row in range(CMS_D):
        c = (
            e.select(F.expr(cms_slot_sql("user_id", row)).alias("slot"))
            .groupBy("slot")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.lit(row).alias("row"), "slot", "c")
        )
        counters = c if counters is None else counters.unionByName(c)
    probes = spark.createDataFrame(
        [(k, row, cms_slot_py(k, row)) for k in _CMS_PROBES for row in range(CMS_D)],
        "key long, row int, slot long",
    )
    est = (
        probes.join(F.broadcast(counters), ["row", "slot"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est_count"))
    )
    exact = (
        e.where(F.col("user_id").isin(*_CMS_PROBES))
        .groupBy(F.col("user_id").alias("key"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        est.join(exact, "key", "left")
        .select(
            "key",
            "est_count",
            F.coalesce("exact_count", F.lit(0)).alias("exact_count"),
        )
        .orderBy("key")
    )
