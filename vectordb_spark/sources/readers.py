"""Table sources.

The engine reads Parquet natively (Catalyst handles predicate pushdown,
column pruning and partition pruning); CSV/JSON loaders cover the
reference's CSV-load endpoint (reference: engine/server/web_server/
web_controller.hpp:613-622, a stub there — real here).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, rebalance: bool = False
) -> DataFrame:
    """Load one testdata table from ``sf_dir`` as a DataFrame.

    events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    rejects by default; read it as epoch-nanos BIGINT (exact) and derive
    calendar values per-query. DuckDB oracle equivalent:
    ``CAST(epoch_ns(ts) AS BIGINT)``.

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
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if rebalance:
        cores = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < cores:
            df = df.repartition(cores)
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
