"""Streaming-ingest correctness gate: the one query whose Spark side
runs the REAL Structured Streaming ingest path (readStream →
foreachBatch → Table manifest commits) before answering, while the
DuckDB oracle reads the raw source rows. Equality proves the
stream→table path preserves every row and value — the S8/WAL surface
(streaming/ingest.py) stops being pytest-only.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vectordb_spark.functions.agg import dec_sum
from vectordb_spark.plans import oracle as O
from vectordb_spark.queries import query

_GATE_ORACLE = f"""
SELECT event_type,
       COUNT(*) AS n,
       MIN(event_id) AS min_id,
       MAX(event_id) AS max_id,
       {O.dec_sum("value")} AS sum_value
FROM events
GROUP BY event_type
"""


@query("stream_ingest_count_by_type", oracle=_GATE_ORACLE)
def stream_ingest_count_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet → file STREAM → foreachBatch inserts into an
    engine Table (one manifest version per micro-batch, the WAL-replay
    guarantee as micro-batch ordering) → aggregate the INGESTED table.
    The oracle aggregates the raw source; a hash match means zero rows
    lost or duplicated through the streaming path. Each run ingests
    into a fresh temp warehouse — the stream, checkpoint, and table
    machinery are all real."""
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.sources.readers import load_table
    from vectordb_spark.streaming.ingest import stream_insert
    from vectordb_spark.table import Table

    # load_table pins the session configs (nanosAsLong for the ns
    # timestamps) the stream schema below relies on
    load_table(spark, sf_dir, "events")

    stream_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) as long
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table_schema = TableSchema(
        name="ingested_events",
        fields=[
            FieldSchema(name="event_id", field_type=FieldType.INT8),
            FieldSchema(name="ts", field_type=FieldType.INT8),
            FieldSchema(name="user_id", field_type=FieldType.INT8),
            FieldSchema(name="event_type", field_type=FieldType.STRING),
            FieldSchema(name="value", field_type=FieldType.DOUBLE),
            FieldSchema(name="props", field_type=FieldType.STRING),
            # engine tables require a vector field (reference
            # basic_meta_impl.cpp:456-458); a constant 2-dim filler
            # satisfies the schema without touching the aggregates
            FieldSchema(
                name="Emb", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )

    work = tempfile.mkdtemp(prefix="vdb_stream_gate_")
    t = Table(spark, table_schema, os.path.join(work, "ingested_events"))
    t._init_storage()

    stream = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", 1)
        # the file source needs a directory; glob-filter to the one table
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("Emb", F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>"))
    )
    q = stream_insert(t, stream, os.path.join(work, "_checkpoint"))
    q.awaitTermination()

    out = t.df().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        dec_sum("value").alias("sum_value"),
    )
    # materialize before deleting the temp warehouse the lazy plan
    # reads — repeated gate runs must not accumulate table copies
    out = out.localCheckpoint()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out
