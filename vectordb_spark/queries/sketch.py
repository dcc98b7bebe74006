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

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_spark.operators.dedup import portable_hash64
from vectordb_spark.operators.sketch import (
    BLOOM_K,
    CMS_D,
    HLL_ALPHA,
    HLL_M,
    bloom_pos_sql,
    cms_slot_py,
    cms_slot_sql,
    hdr_bucket_lb_sql,
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


# -------------------------------------------------------------- Bloom

# fingerprint = the 5-token document prefix hash, the same signal
# dedup_cross_source_overlap joins on — here the reference source's
# fingerprint set becomes a bloom filter that prunes other sources
_PFX_KEY_S, _PFX_KEY_D = portable_hash64(
    "concat_ws(' ', slice(split(text, ' '), 1, 5))",
    "array_to_string(string_split(text, ' ')[1:5], ' ')",
)

_BLOOM_POS_D = [bloom_pos_sql("key", i) for i in range(BLOOM_K)]

_BLOOM_ORACLE = f"""
WITH bk AS (
    SELECT DISTINCT {_PFX_KEY_D} AS key FROM documents WHERE source = 'src0'
),
bits AS (
    SELECT {_BLOOM_POS_D[0]} AS pos FROM bk
    UNION SELECT {_BLOOM_POS_D[1]} FROM bk
    UNION SELECT {_BLOOM_POS_D[2]} FROM bk
),
probe AS (
    SELECT doc_id, source, {_PFX_KEY_D} AS key
    FROM documents WHERE source <> 'src0'
),
flags AS (
    SELECT source,
           (({_BLOOM_POS_D[0]}) IN (SELECT pos FROM bits)
            AND ({_BLOOM_POS_D[1]}) IN (SELECT pos FROM bits)
            AND ({_BLOOM_POS_D[2]}) IN (SELECT pos FROM bits)) AS is_cand,
           (key IN (SELECT key FROM bk)) AS is_true
    FROM probe
)
SELECT source,
       COUNT(*) AS n_probe,
       CAST(SUM(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true
FROM flags GROUP BY source ORDER BY source
"""


@query("sketch_bloom_prune_join", oracle=_BLOOM_ORACLE)
def sketch_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning, the cross-source dedup primitive at
    100 TB: src0's document-prefix fingerprints compress to ≤ m = 8192
    distinct bit positions (k = 3 salted lcg2 hashes per key, a few KB
    broadcast — constant regardless of the build side's row count);
    every other source's documents are candidates iff ALL k of their
    positions are set. The gate emits per-source (n_probe,
    n_candidates, n_true): n_true ≤ n_candidates on every row is the
    no-false-negative guarantee that makes bloom-prune-then-verify
    sound (the pytest pins it), and candidates − true is the measured
    false-positive cost. Spark's own runtime bloom join pruning is the
    same idea intra-query; this explicit form persists across jobs —
    build once from the corpus, prune every future ingest — and the
    cross-engine hash keeps the whole filter oracle-checkable.

    Plan shape: the filter materializes as a PACKED BITMAP — one
    aggregation folds the build side's bit positions into m/64 BIGINT
    words, map_from_entries packs them into a single broadcast row —
    and the probe-side membership test is pure codegen arithmetic:
    ``(word(pos/64) >> pos%64) & 1`` per hash, O(1) per probe row with
    no join at all (a bits-as-relation formulation needs k broadcast
    joins or, worse, an explode that re-shuffles the probe corpus).
    The probe side is map-only up to the one groupBy(source) whose
    shuffle carries |sources| partial rows.

    Sizing note (measured, scripts/bloom_scaling.py): the one-row map
    form is right up to ~2^16 bits; far beyond that a single giant map
    value goes pathological per-row, and the at-scale form keeps the
    bitmap as a (word_idx, word) relation bit-tested after k broadcast
    hash joins — same state size, same map-only probe."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select("doc_id", "source", F.expr(_PFX_KEY_S).alias("key"))
    bk = keyed.where(F.col("source") == "src0").select("key").distinct()
    bitmap = (
        bk.select(
            F.explode(F.array(*[F.expr(p) for p in _BLOOM_POS_D])).alias("pos")
        )
        .distinct()
        .groupBy((F.col("pos") / 64).cast("int").alias("w"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))"
            ).alias("word")
        )
        .agg(F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("bm"))
    )
    hit_cols = [
        F.expr(
            f"(shiftright(coalesce(element_at(bm, CAST(({p}) / 64 AS INT)),"
            f" CAST(0 AS BIGINT)), CAST(({p}) % 64 AS INT)) & 1) = 1"
        )
        for p in _BLOOM_POS_D
    ]
    truth = bk.withColumn("in_build", F.lit(1))
    flags = (
        keyed.where(F.col("source") != "src0")
        .crossJoin(F.broadcast(bitmap))
        .join(F.broadcast(truth), "key", "left")
        .select(
            "source",
            functools.reduce(lambda a, b: a & b, hit_cols).alias("is_cand"),
            F.col("in_build").isNotNull().alias("is_true"),
        )
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_probe"),
            F.sum(F.when(F.col("is_cand"), 1).otherwise(0))
            .cast("long")
            .alias("n_candidates"),
            F.sum(F.when(F.col("is_true"), 1).otherwise(0))
            .cast("long")
            .alias("n_true"),
        )
        .orderBy("source")
    )


# ------------------------------------------- HDR quantile histogram

_HDR_X = "CAST(floor(value * 100.0 + 0.5) AS BIGINT)"
_HDR_B, _HDR_LB = hdr_bucket_lb_sql("x")

_HDR_ORACLE = f"""
WITH iv AS (
    SELECT event_type, {_HDR_X} AS x FROM events
),
b AS (
    SELECT event_type, {_HDR_B} AS bucket, MIN({_HDR_LB}) AS lb,
           COUNT(*) AS c
    FROM iv GROUP BY event_type, {_HDR_B}
),
cum AS (
    SELECT event_type, bucket, lb, c,
           SUM(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
           SUM(c) OVER (PARTITION BY event_type) AS n
    FROM b
)
SELECT c1.event_type,
       MIN(CASE WHEN cum >= CAST(ceil(0.50 * n) AS BIGINT) THEN lb END)
           AS est_p50_grid,
       MIN(CASE WHEN cum >= CAST(ceil(0.99 * n) AS BIGINT) THEN lb END)
           AS est_p99_grid,
       CAST(MAX(n) AS BIGINT) AS n,
       MAX(e.p50) AS exact_p50,
       MAX(e.p99) AS exact_p99
FROM cum c1 JOIN (
    SELECT event_type, quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type
) e ON c1.event_type = e.event_type
GROUP BY c1.event_type
ORDER BY c1.event_type
"""


@query("sketch_hdr_quantiles", oracle=_HDR_ORACLE)
def sketch_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram quantiles per event type — the fixed-state
    alternative to sort-based exact percentiles at 100 TB. Values
    quantize to a 0.01 grid, bucket into exponent ranges × 16 linear
    sub-buckets (pure integer compares + exact dyadic floor-division —
    operators/sketch.py hdr_bucket_lb_sql), and the p50/p99 estimates
    read off the cumulative bucket counts at the nearest-rank
    positions: state is ≤ ~790 buckets per group FOREVER, built as an
    ordinary partial-then-final count aggregate (map-side combined,
    mergeable by addition — the property t-digest buys with float
    centroids, here with exact integers and ≤ 1/16 relative error by
    construction). The exact interpolated quantiles ride along in the
    same row set, so the driver hash pins the sketch math AND the
    accuracy claim; tests/test_sketch.py pins the error bound and
    half-merge associativity."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    iv = e.select("event_type", F.expr(_HDR_X).alias("x"))
    b = iv.groupBy("event_type", F.expr(_HDR_B).alias("bucket")).agg(
        F.expr(f"MIN({_HDR_LB})").alias("lb"), F.count(F.lit(1)).alias("c")
    )
    wc = W.partitionBy("event_type").orderBy("bucket")
    wn = W.partitionBy("event_type")
    cum = (
        b.withColumn("cum", F.sum("c").over(wc))
        .withColumn("n", F.sum("c").over(wn))
    )
    est = cum.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("cum") >= F.expr("CAST(ceil(0.50 * n) AS BIGINT)"),
                F.col("lb"),
            )
        ).alias("est_p50_grid"),
        F.min(
            F.when(
                F.col("cum") >= F.expr("CAST(ceil(0.99 * n) AS BIGINT)"),
                F.col("lb"),
            )
        ).alias("est_p99_grid"),
        F.max("n").cast("long").alias("n"),
    )
    exact = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("percentile(value, 0.99)").alias("exact_p99"),
    )
    return est.join(exact, "event_type").orderBy("event_type")
