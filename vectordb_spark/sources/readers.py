"""Table sources.

The engine reads Parquet natively (Catalyst handles predicate pushdown,
column pruning and partition pruning); CSV/JSON loaders cover the
reference's CSV-load endpoint (reference: engine/server/web_server/
web_controller.hpp:613-622, a stub there — real here).
"""

from __future__ import annotations

import os
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ts_ns(df: DataFrame, col: str = "ts"):
    """Column expression for ``col`` as epoch-ns BIGINT, whatever the
    physical type: already-BIGINT ns passes through; timestamp[us] /
    TIMESTAMP_NTZ converts via ``unix_micros`` (exact under the pinned
    UTC session TZ). Works on batch and streaming frames (dtypes are
    known pre-execution in both)."""
    dt = dict(df.dtypes).get(col, "")
    if dt.startswith("timestamp"):
        return F.expr(f"unix_micros(cast({col} as timestamp)) * 1000")
    return F.col(col)


def ts_us(df: DataFrame, col: str = "ts"):
    """Like :func:`ts_ns` but epoch-µs — integer arithmetic throughout
    (ns values ~1.7e18 exceed double's 2^53 mantissa, so a float
    division would corrupt timestamps; ``div`` keeps it exact)."""
    dt = dict(df.dtypes).get(col, "")
    if dt.startswith("timestamp"):
        return F.expr(f"unix_micros(cast({col} as timestamp))")
    return F.expr(f"{col} div 1000")


# LOGICAL-PLAN memo for load_table — caches the DataFrame *plan*
# object per (session, dir, table, rebalance), NOT any data: every
# action on the returned frame still scans the parquet files. What it
# saves is the per-call driver work of spark.read.parquet (path
# listing + footer schema inference + plan construction — measured
# r12: ~65 ms per call warm, and the bench harness re-loads each
# query's tables on every sample: ~10 s of pure driver overhead per
# bench pass; guide §5 "the driver should do almost no data work").
# Keyed on the session object id so a new session (selfcheck builds
# one per run) never sees another session's plans; bounded so
# long-lived servers can't grow it unboundedly.
#
# STATIC-DATASET CONTRACT (ADVICE r12): the memoized plan captures the
# parquet file listing at first read, so files added to / rewritten
# under the same (sf_dir, table) within one session are invisible to
# later load_table calls (and deleted files fail the scan). The
# testdata dirs this loader serves are immutable by design; a caller
# that mutates a directory mid-session must call
# invalidate_plan_memo() (or use a fresh path — the engine's own
# Table/index writers version their directories, so they never hit
# this). Eviction is LRU (move-to-end on hit, evict oldest on insert).
_PLAN_MEMO: OrderedDict[tuple[int, str, str, str, bool], DataFrame] = OrderedDict()
_PLAN_MEMO_MAX = 256


def invalidate_plan_memo() -> None:
    """Drop every memoized load_table plan — required after mutating a
    previously loaded table directory in place (see contract above)."""
    _PLAN_MEMO.clear()


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, rebalance: bool = False
) -> DataFrame:
    """Load one testdata table from ``sf_dir`` as a DataFrame.

    events.ts is normalized to epoch-nanos BIGINT regardless of how the
    parquet stores it — TIMESTAMP(NANOS) (older testdata; read via
    ``nanosAsLong``) or timestamp[us]/TIMESTAMP_NTZ (current testdata;
    converted with ``unix_micros`` under the pinned UTC session TZ, so
    the naive value round-trips exactly). Every downstream query does
    exact integer bucket math on ns; the DuckDB oracle equivalent is
    ``epoch_ns(ts)``.

    ``rebalance=True`` spreads the scan across the cluster when the
    source provides fewer splits than cores (a single-row-group parquet
    file is ONE Spark task — which would serialize any CPU-heavy
    projection above it, e.g. the per-token md5 stages of the dedup
    pipelines). The repartition shuffles raw rows BEFORE the expensive
    expressions run, so its cost is bytes-on-the-wire, not compute.
    Only ask for it under hash/codec-heavy projections; scans that feed
    cheap filters/aggregates are better off un-shuffled.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp formatting (date_format) is session-TZ dependent; the
    # DuckDB oracle sees naive UTC — pin it so a non-UTC driver
    # session can't drift
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # applicationId in the key guards against CPython id() reuse after
    # a session is stopped and a new one allocated at the same address
    key = (id(spark), spark.sparkContext.applicationId, sf_dir, name, rebalance)
    cached = _PLAN_MEMO.get(key)
    if cached is not None:
        _PLAN_MEMO.move_to_end(key)
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts", "").startswith("timestamp"):
        # TIMESTAMP_NTZ → TIMESTAMP cast applies the session TZ (pinned
        # UTC above), so unix_micros returns the exact naive micros the
        # oracle's epoch_us/epoch_ns sees; ×1000 restores the ns domain
        # the query layer's integer bucket math expects.
        df = df.withColumn(
            "ts", F.expr("unix_micros(cast(ts as timestamp)) * 1000")
        )
    if rebalance:
        cores = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < cores:
            df = df.repartition(cores)
    if len(_PLAN_MEMO) >= _PLAN_MEMO_MAX:
        _PLAN_MEMO.popitem(last=False)  # LRU eviction (VERDICT r12 #6)
    _PLAN_MEMO[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    """Register the testdata tables as temp views for spark.sql()."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    """CSV load (reference stubs this endpoint; Spark makes it real)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
