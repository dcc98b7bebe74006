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
from vectordb_spark.operators.sketch import hdr_bucket_lb_sql as _hdr_sql
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


_HOUR_US = 3_600_000_000

_LATE_ORACLE = f"""
SELECT (epoch_us(ts) // {_HOUR_US}) * {_HOUR_US} AS window_start_us,
       event_type,
       COUNT(*) AS n_events,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY 1, 2
"""


@query("stream_late_window_upsert", oracle=_LATE_ORACLE)
def stream_late_window_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data gate: events split into TWO stream files by event_id
    parity — the second micro-batch therefore delivers rows with
    timestamps far EARLIER than the first batch's maximum (a genuine
    out-of-order tail, not in-order replay). The stream runs the
    watermarked tumbling-window aggregate (streaming/ingest.py
    windowed_event_counts: F.window is pure epoch arithmetic, so the
    buckets are timezone-independent) in UPDATE mode; each micro-batch
    emits the windows it changed and foreachBatch PK-upserts them into
    an engine Table — late rows UPDATE the window rows batch 1 already
    committed. The oracle is the plain batch GROUP BY over all events:
    equality proves every late row merged into its window (dropped or
    double-counted late data cannot hash-match). The watermark delay
    exceeds the data span, so state eviction never races the finite
    replay — eviction semantics are covered by
    tests/test_streaming.py::test_watermark_evicts_late_rows."""
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.sources.readers import load_table
    from vectordb_spark.streaming.ingest import stream_insert, windowed_event_counts
    from vectordb_spark.table import Table

    ev = load_table(spark, sf_dir, "events")

    work = tempfile.mkdtemp(prefix="vdb_stream_late_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    # two single-file halves; mtimes force batch order (FileStreamSource
    # orders by modification time): evens first, odds = the late tail
    for i, pred in enumerate(["event_id % 2 = 0", "event_id % 2 = 1"]):
        half_dir = os.path.join(work, f"half{i}")
        ev.where(pred).coalesce(1).write.parquet(half_dir)
        part = next(
            n for n in os.listdir(half_dir)
            if n.endswith(".parquet") and not n.startswith("_")
        )
        dst = os.path.join(src, f"b{i}.parquet")
        os.rename(os.path.join(half_dir, part), dst)
        os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    stream_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    windows = windowed_event_counts(
        stream, window="1 hour", watermark="3650 days"
    ).select(
        F.unix_micros("window_start").alias("window_start_us"),
        "event_type",
        "n_events",
        "min_value",
        "max_value",
    )
    upserts = windows.withColumn(
        "pk", F.concat_ws("|", F.col("window_start_us"), F.col("event_type"))
    ).withColumn("Emb", F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>"))

    table_schema = TableSchema(
        name="window_counts",
        fields=[
            FieldSchema(name="pk", field_type=FieldType.STRING, primary_key=True),
            FieldSchema(name="window_start_us", field_type=FieldType.INT8),
            FieldSchema(name="event_type", field_type=FieldType.STRING),
            FieldSchema(name="n_events", field_type=FieldType.INT8),
            FieldSchema(name="min_value", field_type=FieldType.DOUBLE),
            FieldSchema(name="max_value", field_type=FieldType.DOUBLE),
            FieldSchema(
                name="Emb", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, table_schema, os.path.join(work, "window_counts"))
    t._init_storage()
    q = stream_insert(
        t,
        upserts,
        os.path.join(work, "_checkpoint"),
        upsert=True,
        output_mode="update",
    )
    q.awaitTermination()

    out = t.df().select(
        "window_start_us", "event_type", "n_events", "min_value", "max_value"
    )
    out = out.localCheckpoint()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


_SDD_ORACLE = """
WITH keep AS (
    SELECT lang, n_chars, doc_id,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
)
SELECT lang, COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM keep WHERE rn = 1
GROUP BY lang
"""


@query("stream_dedup_incremental", oracle=_SDD_ORACLE)
def stream_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental dedup: documents split into two id-ordered
    stream files; each micro-batch keeps its own first copy per
    md5(text) (groupBy min doc_id), anti-joins against the hashes
    already COMMITTED to the table (the cross-batch state — exactly the
    per-batch ingest shape of a production dedup pipeline, where the
    table's hash column IS the dedup index), and inserts the
    survivors. The oracle is global keep-first (min doc_id per text):
    id-ordered batches make incremental-keep-first equal global
    keep-first, so a hash match proves no duplicate slipped through a
    batch boundary and no unique doc was dropped."""
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.sources.readers import load_table
    from vectordb_spark.table import Table

    d = load_table(spark, sf_dir, "documents")
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (int(lo) + int(hi)) // 2

    work = tempfile.mkdtemp(prefix="vdb_stream_dedup_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    for i, pred in enumerate([F.col("doc_id") <= mid, F.col("doc_id") > mid]):
        half_dir = os.path.join(work, f"half{i}")
        d.where(pred).select("doc_id", "lang", "n_chars", "text").coalesce(
            1
        ).write.parquet(half_dir)
        part = next(
            n for n in os.listdir(half_dir)
            if n.endswith(".parquet") and not n.startswith("_")
        )
        dst = os.path.join(src, f"b{i}.parquet")
        os.rename(os.path.join(half_dir, part), dst)
        os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    table_schema = TableSchema(
        name="deduped_docs",
        fields=[
            FieldSchema(name="doc_id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="lang", field_type=FieldType.STRING),
            FieldSchema(name="n_chars", field_type=FieldType.INT8),
            FieldSchema(name="h", field_type=FieldType.STRING),
            FieldSchema(
                name="Emb", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, table_schema, os.path.join(work, "deduped_docs"))
    t._init_storage()

    stream_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def _dedup_sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hashed = batch_df.withColumn("h", F.md5("text"))
        # within-batch keep-first: min doc_id per hash
        firsts = hashed.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
        batch_kept = hashed.join(
            firsts, ["h", "doc_id"], "left_semi"
        )
        # cross-batch state: hashes already committed to the table
        fresh = batch_kept.join(t.df().select("h"), "h", "left_anti")
        t.insert_df(
            fresh.select(
                "doc_id",
                "lang",
                "n_chars",
                "h",
                F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("Emb"),
            )
        )

    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(work, "_checkpoint"))
        .foreachBatch(_dedup_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = t.df().groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("sum_chars"),
    )
    out = out.localCheckpoint()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


_ENRICH_ORACLE = f"""
SELECT c.c_mktsegment, e.event_type,
       COUNT(*) AS n,
       {O.dec_sum("e.value")} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


@query("stream_enrich_join", oracle=_ENRICH_ORACLE)
def stream_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC join gate: the standard streaming-enrichment shape
    (clickstream joined to a dimension at ingest). Events replay as two
    mtime-ordered micro-batches; INSIDE the stream each batch
    broadcast-joins the static customer dim (stream-static joins are
    stateless per micro-batch — the dim is re-resolved each batch, so
    dim updates between batches are picked up, and nothing accumulates
    in state), and foreachBatch appends the enriched rows to an engine
    Table. The oracle runs the equivalent batch join over the raw
    sources: a hash match proves the per-batch join dropped/duplicated
    nothing across the batch boundary. At 100 TB the dim side stays a
    broadcast (or a bucketed shuffle when it outgrows one executor);
    the stream side never shuffles before the join."""
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.sources.readers import load_table
    from vectordb_spark.streaming.ingest import stream_insert
    from vectordb_spark.table import Table

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )

    work = tempfile.mkdtemp(prefix="vdb_stream_enrich_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    for i, pred in enumerate(["event_id % 2 = 0", "event_id % 2 = 1"]):
        half_dir = os.path.join(work, f"half{i}")
        ev.where(pred).coalesce(1).write.parquet(half_dir)
        part = next(
            n for n in os.listdir(half_dir)
            if n.endswith(".parquet") and not n.startswith("_")
        )
        dst = os.path.join(src, f"b{i}.parquet")
        os.rename(os.path.join(half_dir, part), dst)
        os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    stream_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    enriched = (
        stream.join(F.broadcast(cust), stream["user_id"] == cust["c_custkey"])
        .select("event_id", "event_type", "value", "c_mktsegment")
        .withColumn("Emb", F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>"))
    )

    table_schema = TableSchema(
        name="enriched_events",
        fields=[
            FieldSchema(name="event_id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="event_type", field_type=FieldType.STRING),
            FieldSchema(name="value", field_type=FieldType.DOUBLE),
            FieldSchema(name="c_mktsegment", field_type=FieldType.STRING),
            FieldSchema(
                name="Emb", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, table_schema, os.path.join(work, "enriched_events"))
    t._init_storage()
    q = stream_insert(t, enriched, os.path.join(work, "_checkpoint"))
    q.awaitTermination()

    out = t.df().groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value").alias("sum_value"),
    )
    out = out.localCheckpoint()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


# ------------------------------------------------- changefeed (CDC) gate

_CDC_ORACLE = """
WITH mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
ordered AS (
    SELECT doc_id FROM documents, mid WHERE doc_id <= m
    ORDER BY doc_id LIMIT 6
),
dels AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3),
upds AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3 OFFSET 3)
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
       'insert' AS change_type
FROM documents d, mid WHERE d.doc_id > mid.m
UNION ALL
SELECT doc_id, lang, CAST(n_chars AS BIGINT), 'delete'
FROM documents WHERE doc_id IN (SELECT doc_id FROM dels)
UNION ALL
SELECT doc_id, lang, CAST(n_chars + 1000 AS BIGINT), 'update'
FROM documents WHERE doc_id IN (SELECT doc_id FROM upds)
"""


@query("cdc_changefeed_diff", oracle=_CDC_ORACLE)
def cdc_changefeed_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changefeed gate: the full table lifecycle — bulk ingest (v1),
    append the second half, delete 3 rows, upsert-modify 3 more — then
    ``Table.changes(v1)`` must reconstruct exactly the appended rows as
    inserts, the deleted rows as pre-images, and the upserted rows as
    post-images, with every untouched row absent. The oracle recomputes
    the same diff declaratively from the raw parquet, so a hash match
    proves the manifest-history diff (file-level pruning + PK
    full-outer join + content-equality cancellation of rewrites)
    against an implementation that never saw the table format."""
    work = tempfile.mkdtemp(prefix="vdb_cdc_")
    t, v1 = build_cdc_gate_table(spark, sf_dir, work)

    out = t.changes(v1).select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("_change_type").alias("change_type"),
    )
    out = out.localCheckpoint()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


def build_cdc_gate_table(spark: SparkSession, sf_dir: str, work: str):
    """Run the changefeed gate's mutation lifecycle (bulk ingest v1 →
    append → delete ×3 → upsert ×3) on a table under ``work`` and
    return ``(table, v1)``. Split out of the gate so bench.py can
    amortize the 4-mutation build and time only ``changes(v1)`` — the
    manifest-diff operation the gate exists to measure."""
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.sources.readers import load_table
    from vectordb_spark.table import Table

    d = load_table(spark, sf_dir, "documents")
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (int(lo) + int(hi)) // 2
    first = d.where(F.col("doc_id") <= mid)
    ids = [
        r[0]
        for r in first.select("doc_id").orderBy("doc_id").limit(6).collect()
    ]
    dels, upds = ids[:3], ids[3:6]
    table_schema = TableSchema(
        name="cdc_docs",
        fields=[
            FieldSchema(name="doc_id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="lang", field_type=FieldType.STRING),
            FieldSchema(name="n_chars", field_type=FieldType.INT8),
            FieldSchema(
                name="Emb", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, table_schema, os.path.join(work, "cdc_docs"))
    t._init_storage()

    def _proj(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            "lang",
            "n_chars",
            F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("Emb"),
        )

    t.insert_df(_proj(first))
    v1 = t.versions()[-1]
    t.insert_df(_proj(d.where(F.col("doc_id") > mid)))
    t.delete(primary_keys=dels)
    upd_recs = [
        {
            "doc_id": r["doc_id"],
            "lang": r["lang"],
            "n_chars": r["n_chars"] + 1000,
            "Emb": [0.0, 0.0],
        }
        for r in d.where(F.col("doc_id").isin(upds))
        .select("doc_id", "lang", "n_chars")
        .collect()
    ]
    t.insert(upd_recs, upsert=True)
    return t, v1


# --------------------------------------------- stream-STREAM join gate

_3D_NS = 3 * 86400 * 1_000_000_000

_SSJ_ORACLE = f"""
WITH c AS (
    SELECT user_id, event_id AS click_id, epoch_ns(ts) AS cts
    FROM events WHERE event_type = 'click'
),
p AS (
    SELECT user_id, event_id AS purchase_id, epoch_ns(ts) AS pts,
           value AS purchase_value
    FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id,
       COUNT(*) AS n_pairs,
       COUNT(DISTINCT p.purchase_id) AS n_attributed,
       {O.dec_sum("p.purchase_value")} AS sum_purchase_value
FROM c JOIN p
  ON c.user_id = p.user_id
 AND p.pts >= c.cts
 AND p.pts - c.cts <= {_3D_NS}
GROUP BY c.user_id
ORDER BY c.user_id
"""


@query("stream_stream_join_attribution", oracle=_SSJ_ORACLE)
def stream_stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join — the attribution shape (purchase
    joined to every click by the same user in the prior 3 days) run on
    TWO live file streams through Spark's symmetric-hash stream-stream
    join, with event-time watermarks on both sides and the time-range
    constraint that lets the state store evict expired rows. Each side
    replays as two mtime-ordered micro-batches, deliberately
    interleaved so pairs MUST match across batch boundaries (click
    batch 1 x purchase batch 2 and vice versa) — exactly what the
    join state exists for; a stream-static join cannot express this.
    The watermark delay (90 days) exceeds the events table's 30-day
    span, so completeness is exact and the DuckDB batch interval join
    is the oracle; state EVICTION under short watermarks is pinned in
    tests/test_streaming.py. Precision discipline: the range residual
    compares raw epoch-ns BIGINTs (exact); the watermark columns are
    us-truncated twins used only for the (superset) time constraint.
    100 TB shape: both sides shuffle once on user_id and state holds
    only the watermark horizon — the unbounded-backlog alternative
    (periodic batch re-joins) rescans history every run."""
    from vectordb_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")

    work = tempfile.mkdtemp(prefix="vdb_ssj_")
    stream_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )

    def _spill(kind: str) -> str:
        src = os.path.join(work, kind)
        os.makedirs(src)
        for i, pred in enumerate(["event_id % 2 = 0", "event_id % 2 = 1"]):
            half = os.path.join(work, f"{kind}_half{i}")
            ev.where(f"event_type = '{kind}'").where(pred).coalesce(1)\
                .write.parquet(half)
            part = next(
                n for n in os.listdir(half)
                if n.endswith(".parquet") and not n.startswith("_")
            )
            dst = os.path.join(src, f"b{i}.parquet")
            os.rename(os.path.join(half, part), dst)
            os.utime(dst, (1_000_000_000 + i * 100,) * 2)
        return src

    def _read(src: str):
        s = (
            spark.readStream.schema(stream_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return s.withColumn(
            "wts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        ).withWatermark("wts", "90 days")

    clicks = _read(_spill("click")).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
        F.col("wts").alias("c_wts"),
    )
    purchases = _read(_spill("purchase")).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
        F.col("value").alias("purchase_value"),
        F.col("wts").alias("p_wts"),
    )
    # JOIN condition = equi key + the watermarked time range ONLY:
    # StreamingJoinHelper can then extract the state-eviction
    # constraint (mixing the raw-ns residual into the join condition
    # defeats the extractor — it logs per-batch errors and the state
    # never evicts). The exact ns residual runs as a post-join filter.
    pairs = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_wts") >= F.col("c_wts"))
        & (F.col("p_wts") <= F.col("c_wts") + F.expr("INTERVAL 4 DAYS")),
    ).where(
        (F.col("pts") >= F.col("cts"))
        & (F.col("pts") - F.col("cts") <= F.lit(_3D_NS))
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "purchase_value",
    )
    # sink = Spark's native exactly-once parquet sink (checkpointed
    # file-commit log). The stream->engine-Table path is already gated
    # three ways (stream_ingest/late_window/dedup_incremental); this
    # gate isolates the stream-STREAM join. The symmetric-hash join
    # keeps one state-store instance per shuffle partition per side,
    # so the stream runs at a state-sized partition count (the join
    # key space here is 15 users), restored after.
    out_dir = os.path.join(work, "pairs_out")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            pairs.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(work, "_checkpoint"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    out = (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("purchase_id").alias("n_attributed"),
            dec_sum("purchase_value").alias("sum_purchase_value"),
        )
        .orderBy("user_id")
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


# ------------------------------------- incremental materialized view

_MV_ORACLE = """
WITH mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
ordered AS (
    SELECT doc_id FROM documents, mid WHERE doc_id <= m
    ORDER BY doc_id LIMIT 6
),
dels AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3),
upds AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3 OFFSET 3),
final AS (
    SELECT d.doc_id, d.lang,
           CASE WHEN d.doc_id IN (SELECT doc_id FROM upds)
                THEN d.n_chars + 1000 ELSE d.n_chars END AS n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM dels)
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS DECIMAL(28,4))) AS DOUBLE) AS sum_chars
FROM final GROUP BY lang ORDER BY lang
"""


@query("mv_incremental_refresh", oracle=_MV_ORACLE)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance composed from the
    engine's own changefeed: a per-language COUNT/SUM view is
    full-built at the table's FIRST version, the table then lives
    through the full mutation lifecycle (bulk append, 3 deletes, 3
    upserts), and ONE refresh advances the view by merging the
    retractable delta stream (``changes(v1, update_preimages=True)`` —
    insert/update_post add, delete/update_pre subtract). The oracle
    recomputes the final aggregate from raw parquet + the same mutation
    plan, so equality proves the delta algebra (including the upsert
    pre-image retractions) reproduces the from-scratch answer. 100 TB
    shape: refresh cost is the changefeed (file-pruned manifest diff)
    plus a merge keyed by ≤|groups| rows — never a base-table rescan;
    mid-lifecycle correctness and no-op refresh are pinned in
    tests/test_matview.py."""
    from vectordb_spark.operators.matview import IncrementalAggView

    work = tempfile.mkdtemp(prefix="vdb_mv_")
    t, v1 = build_cdc_gate_table(spark, sf_dir, work)
    mv = IncrementalAggView(t, os.path.join(work, "mv"), ["lang"], "n_chars")
    # rebuild the view AT v1 (full_build reads the current snapshot, so
    # time-travel the build through the table's own history): compute
    # from df(v1) then refresh the rest of the lifecycle incrementally
    mv._commit(mv._agg(t.df(version=v1)), v1)
    mv.refresh(force_incremental=True)
    out = (
        mv.df()
        .select(
            "lang",
            F.col("n_rows").alias("n_docs"),
            F.col("_sum_dec").cast("double").alias("sum_chars"),
        )
        .orderBy("lang")
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


_MV_MINMAX_ORACLE = """
WITH mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
ordered AS (
    SELECT doc_id FROM documents, mid WHERE doc_id <= m
    ORDER BY doc_id LIMIT 6
),
dels AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3),
upds AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3 OFFSET 3),
final AS (
    SELECT d.doc_id, d.lang,
           CASE WHEN d.doc_id IN (SELECT doc_id FROM upds)
                THEN d.n_chars + 1000 ELSE d.n_chars END AS n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM dels)
)
SELECT lang, COUNT(*) AS n_docs,
       MIN(n_chars)::BIGINT AS min_chars,
       MAX(n_chars)::BIGINT AS max_chars
FROM final GROUP BY lang ORDER BY lang
"""


@query("mv_minmax_refresh", oracle=_MV_MINMAX_ORACLE)
def mv_minmax_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX materialized-view maintenance — the NON-invertible
    aggregate class (round 9): the same changefeed lifecycle as
    mv_incremental_refresh (bulk append, 3 deletes, 3 upserts with
    pre-image retractions), but the view tracks per-language MIN and
    MAX of n_chars, which cannot be maintained by delta subtraction.
    IncrementalAggView routes groups whose retractions tie-or-beat the
    stored extremum through a GROUP-SCOPED rescan (one broadcast
    semi-join against the base snapshot, bounded by the delta's group
    count) and merges everything else incrementally via least/greatest.
    The oracle recomputes from raw parquet + the same mutation plan, so
    equality proves the dirtiness test and the rescan reproduce the
    from-scratch extrema; both maintenance paths (clean merge, dirty
    rescan incl. ties) are pinned individually in tests/test_matview.py.
    100 TB shape: insert-only refreshes stay delta-proportional; a
    delete hitting an extremum adds one semi-join prunable to the
    dirtied groups' partitions — never an unconditional base rescan."""
    from vectordb_spark.operators.matview import IncrementalAggView

    work = tempfile.mkdtemp(prefix="vdb_mv_mm_")
    t, v1 = build_cdc_gate_table(spark, sf_dir, work)
    mv = IncrementalAggView(
        t, os.path.join(work, "mv"), ["lang"], "n_chars",
        aggs=("count", "min", "max"),
    )
    mv._commit(mv._agg(t.df(version=v1)), v1)
    mv.refresh(force_incremental=True)
    out = (
        mv.df()
        .select(
            "lang",
            F.col("n_rows").alias("n_docs"),
            F.col("_min").cast("long").alias("min_chars"),
            F.col("_max").cast("long").alias("max_chars"),
        )
        .orderBy("lang")
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


# --------------------------------- incremental JOIN view (delta-join)

_MV_JOIN_ORACLE = f"""
WITH cust4 AS (
    SELECT ck FROM (SELECT DISTINCT o_custkey AS ck FROM orders)
    ORDER BY ck LIMIT 4
),
dels_c AS (SELECT ck FROM cust4 ORDER BY ck LIMIT 2),
upds_c AS (SELECT ck FROM cust4 ORDER BY ck LIMIT 2 OFFSET 2),
dels_o AS (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5),
upds_o AS (
    SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5 OFFSET 5
),
new_cust AS (
    SELECT ck, ROW_NUMBER() OVER (ORDER BY ck) AS rn
    FROM (SELECT ck FROM cust4 ORDER BY ck LIMIT 3)
),
maxk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
final_orders AS (
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey IN (SELECT o_orderkey FROM upds_o)
                THEN o_totalprice + 1000 ELSE o_totalprice END AS price
    FROM orders
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM dels_o)
    UNION ALL
    SELECT mk + rn, ck, CAST(11111 AS DOUBLE) FROM new_cust, maxk
),
final_cust AS (
    SELECT c_custkey,
           CASE WHEN c_custkey IN (SELECT ck FROM upds_c)
                THEN (c_nationkey + 1) % 25 ELSE c_nationkey END AS nation
    FROM customer WHERE c_custkey NOT IN (SELECT ck FROM dels_c)
)
SELECT CAST(nation AS INT) AS nation,
       COUNT(*) AS n_orders,
       {O.dec_sum("price")} AS sum_price
FROM final_orders o JOIN final_cust c ON o.o_custkey = c.c_custkey
GROUP BY nation ORDER BY nation
"""


@query("mv_join_refresh", oracle=_MV_JOIN_ORACLE)
def mv_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance from TWO engine changefeeds
    (operators/matview.py IncrementalJoinAggView): a revenue-per-nation
    view over orders JOIN customer is full-built, then BOTH tables
    mutate — orders: 5 deletes, 5 price upserts, 3 new orders (one for
    a customer deleted in the same window: the contribution must die
    with the dim row); customer: 2 deletes and 2 nation-moving upserts
    (group migration through pre-image retraction) — and ONE refresh
    applies the delta-join rule dA JOIN D1 + A0 JOIN dD. The oracle
    replays the whole mutation plan from raw parquet and computes the
    join-aggregate from scratch, so a hash match proves the two-sided
    algebra, the version-pinned snapshots, and the exact-decimal sum
    merge in one row. 100 TB shape: refresh reads the two changefeeds
    plus one key-pruned scan of the old fact snapshot under a broadcast
    of the dim delta — never re-joins the full tables (see the operator
    docstring's term-by-term cost)."""
    from vectordb_spark.operators.matview import IncrementalJoinAggView
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.sources.readers import load_table
    from vectordb_spark.table import Table

    work = tempfile.mkdtemp(prefix="vdb_mv_join_")
    cust = load_table(spark, sf_dir, "customer")
    ords = load_table(spark, sf_dir, "orders")

    fschema = TableSchema(
        name="jv_orders",
        fields=[
            FieldSchema(
                name="o_orderkey", field_type=FieldType.INT8, primary_key=True
            ),
            FieldSchema(name="o_custkey", field_type=FieldType.INT8),
            FieldSchema(name="o_totalprice", field_type=FieldType.DOUBLE),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    dschema = TableSchema(
        name="jv_customer",
        fields=[
            FieldSchema(
                name="c_custkey", field_type=FieldType.INT8, primary_key=True
            ),
            FieldSchema(name="c_nationkey", field_type=FieldType.INT4),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    zv = F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v")
    fact = Table(spark, fschema, os.path.join(work, "jv_orders"))
    fact._init_storage()
    fact.insert_df(ords.select("o_orderkey", "o_custkey", "o_totalprice", zv))
    dim = Table(spark, dschema, os.path.join(work, "jv_customer"))
    dim._init_storage()
    dim.insert_df(cust.select("c_custkey", "c_nationkey", zv))

    mv = IncrementalJoinAggView(
        fact, dim, os.path.join(work, "mv"),
        fact_key="o_custkey", dim_key="c_custkey",
        group_cols=["c_nationkey"], value_col="o_totalprice",
    )
    mv.full_build()

    # ---- the scripted mutation plan the oracle replays ----
    okeys = [
        r[0]
        for r in ords.select("o_orderkey").orderBy("o_orderkey").limit(10).collect()
    ]
    upd_rows = (
        ords.where(F.col("o_orderkey").isin(okeys[5:10]))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .collect()
    )
    max_ok = ords.agg(F.max("o_orderkey")).first()[0]
    cust4 = [
        r[0]
        for r in ords.select("o_custkey").distinct()
        .orderBy("o_custkey").limit(4).collect()
    ]
    crows = (
        cust.where(F.col("c_custkey").isin(cust4[2:4]))
        .select("c_custkey", "c_nationkey")
        .collect()
    )
    fact.delete(primary_keys=okeys[:5])
    fact.insert(
        [
            {
                "o_orderkey": r["o_orderkey"],
                "o_custkey": r["o_custkey"],
                "o_totalprice": r["o_totalprice"] + 1000,
                "v": [0.0, 0.0],
            }
            for r in upd_rows
        ],
        upsert=True,
    )
    fact.insert(
        [
            {
                "o_orderkey": int(max_ok) + i + 1,
                "o_custkey": int(ck),
                "o_totalprice": float(11111),
                "v": [0.0, 0.0],
            }
            for i, ck in enumerate(cust4[:3])
        ]
    )
    dim.delete(primary_keys=[int(c) for c in cust4[:2]])
    dim.insert(
        [
            {
                "c_custkey": r["c_custkey"],
                "c_nationkey": (int(r["c_nationkey"]) + 1) % 25,
                "v": [0.0, 0.0],
            }
            for r in crows
        ],
        upsert=True,
    )
    mv.refresh(force_incremental=True)
    out = (
        mv.df()
        .select(
            F.col("c_nationkey").cast("int").alias("nation"),
            F.col("n_rows").alias("n_orders"),
            F.col("_sum_dec").cast("double").alias("sum_price"),
        )
        .orderBy("nation")
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


# ------------------------- streaming materialized-view maintenance

_SMV_ORACLE = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       {O.dec_sum("value")} AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("stream_matview_maintenance", oracle=_SMV_ORACLE)
def stream_matview_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized-view maintenance — the Materialize/
    ksqlDB capability class composed from two certified pieces: events
    stream into an engine table in THREE micro-batches (foreachBatch →
    manifest commit per batch, the S8 ingest path), and the SAME sink
    advances a per-type COUNT/SUM IncrementalAggView by one
    force-incremental refresh per batch — so the view is maintained
    from each batch's changefeed as data lands, never rebuilt. The
    gate asserts the view version advanced once per micro-batch (the
    incrementality pin); the oracle aggregates the raw source, so the
    hash match proves three chained delta merges reproduce the
    from-scratch answer through the full stream→table→changefeed→view
    path. 100 TB shape: per batch, refresh reads that batch's segment
    (file-pruned manifest diff) + the |groups|-row stored view — view
    freshness cost tracks batch size, not table size (the SCALING.md
    matview-rehearsal bytes discipline, now driven by a live stream)."""
    from vectordb_spark.operators.matview import IncrementalAggView
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.sources.readers import load_table
    from vectordb_spark.table import Table

    load_table(spark, sf_dir, "events")  # pins nanosAsLong

    stream_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table_schema = TableSchema(
        name="smv_events",
        fields=[
            FieldSchema(
                name="event_id", field_type=FieldType.INT8, primary_key=True
            ),
            FieldSchema(name="event_type", field_type=FieldType.STRING),
            FieldSchema(name="value", field_type=FieldType.DOUBLE),
            FieldSchema(
                name="Emb", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    work = tempfile.mkdtemp(prefix="vdb_smv_")
    ev = spark.read.schema(stream_schema).parquet(
        os.path.join(sf_dir, "events.parquet")
    )

    # three stream files by event_id % 3, mtimes pinned so the file
    # source delivers them as three ordered micro-batches
    src = os.path.join(work, "stream_src")
    os.makedirs(src)
    for i in range(3):
        part_dir = os.path.join(work, f"third{i}")
        ev.where(f"event_id % 3 = {i}").coalesce(1).write.parquet(part_dir)
        part = next(
            n for n in os.listdir(part_dir)
            if n.endswith(".parquet") and not n.startswith("_")
        )
        dst = os.path.join(src, f"b{i}.parquet")
        os.rename(os.path.join(part_dir, part), dst)
        os.utime(dst, (1_000_000_000 + i * 100,) * 2)

    t = Table(spark, table_schema, os.path.join(work, "smv_events"))
    t._init_storage()
    mv = IncrementalAggView(
        t, os.path.join(work, "mv"), ["event_type"], "value"
    )
    mv.full_build()  # view exists BEFORE any data: v0, empty groups
    versions: list[int] = []

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        t.insert_df(
            batch_df.select(
                "event_id",
                "event_type",
                "value",
                F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("Emb"),
            )
        )
        versions.append(mv.refresh(force_incremental=True))

    q = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(work, "_checkpoint"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # incrementality pin: one view advance per micro-batch, strictly
    # increasing — the view was never rebuilt from the full table
    assert len(versions) == 3 and versions == sorted(set(versions)), versions
    assert mv.version() == t._load_meta()["version"]

    out = (
        mv.df()
        .select(
            "event_type",
            F.col("n_rows").alias("n_events"),
            F.col("_sum_dec").cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


# ------------------------------------------- time-travel snapshot read

_TT_ORACLE = f"""
WITH mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS DECIMAL(28,4))) AS DOUBLE) AS sum_chars
FROM documents, mid
WHERE doc_id <= m
GROUP BY lang
ORDER BY lang
"""


@query("table_time_travel_read", oracle=_TT_ORACLE)
def table_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolation read certified as a driver row: the table
    lives through the full cdc mutation lifecycle (bulk ingest v1 →
    second-half append → 3 deletes → 3 upserts — four manifest
    versions), and the gate aggregates ``df(version=v1)`` — the
    time-travel read. The oracle aggregates ONLY the first-half
    documents from raw parquet, so a hash match proves the versioned
    manifest reconstructs the exact historical snapshot with zero
    leakage from any later commit: appended rows invisible, deleted
    rows still present, upserted rows at their PRE-update values. This
    is the storage property the matview/changefeed machinery builds on
    (their gates pin the deltas; this one pins the snapshots), and a
    capability the reference has no equivalent for — its segments
    mutate in place. 100 TB shape: a time-travel read lists the old
    manifest's file set and scans only it — pure metadata, no data
    rewritten or copied."""
    from vectordb_spark.sources.readers import load_table as _lt  # noqa: F401

    work = tempfile.mkdtemp(prefix="vdb_tt_")
    t, v1 = build_cdc_gate_table(spark, sf_dir, work)
    assert int(t._load_meta()["version"]) > v1  # history really exists
    out = (
        t.df(version=v1)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("decimal(28,4)"))
            .cast("double")
            .alias("sum_chars"),
        )
        .orderBy("lang")
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


# ------------------------------------ incremental DISTINCT-count view

_MV_DISTINCT_ORACLE = """
WITH mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
ordered AS (
    SELECT doc_id FROM documents, mid WHERE doc_id <= m
    ORDER BY doc_id LIMIT 6
),
dels AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3),
upds AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3 OFFSET 3),
final AS (
    SELECT d.doc_id, d.lang,
           CASE WHEN d.doc_id IN (SELECT doc_id FROM upds)
                THEN d.n_chars + 1000 ELSE d.n_chars END AS n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM dels)
)
SELECT lang,
       COUNT(DISTINCT n_chars) AS n_distinct,
       COUNT(*) AS n_docs
FROM final GROUP BY lang ORDER BY lang
"""


@query("mv_distinct_refresh", oracle=_MV_DISTINCT_ORACLE)
def mv_distinct_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact incremental COUNT(DISTINCT) view — the aggregate that is
    NOT invertible from per-group state, maintained by keying the
    state on (group, value) multiset counts
    (operators/matview.py IncrementalDistinctCountView): the view is
    built at the table's first version, the table lives through the
    full cdc mutation lifecycle (bulk append, 3 deletes, 3 value-
    shifting upserts), and ONE refresh merges the retractable
    changefeed into the pair-multiset — a delete only removes a
    distinct value when its LAST copy retracts, an upsert moves a
    count between value keys. The oracle recomputes per-language
    COUNT(DISTINCT n_chars) from raw parquet + the same mutation plan.
    100 TB shape: refresh cost tracks the changefeed and the touched
    (group, value) pairs; state size is the live distinct-pair count —
    the honest price of exactness (HLL in operators/sketch.py is the
    fixed-state estimate when deletes are absent)."""
    from vectordb_spark.operators.matview import IncrementalDistinctCountView

    work = tempfile.mkdtemp(prefix="vdb_mv_dc_")
    t, v1 = build_cdc_gate_table(spark, sf_dir, work)
    dv = IncrementalDistinctCountView(
        t, os.path.join(work, "dv"), ["lang"], "n_chars"
    )
    # build the pair-multiset state AT v1 through the table's history,
    # then advance the rest of the lifecycle with one incremental merge
    dv._inner._commit(dv._inner._agg(t.df(version=v1)), v1)
    dv.refresh(force_incremental=True)
    out = (
        dv.df()
        .select("lang", "n_distinct", F.col("n_rows").alias("n_docs"))
        .orderBy("lang")
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


# --------------------------------------- incremental TOP-K view

_MV_TOPK_ORACLE = """
WITH mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
ordered AS (
    SELECT doc_id FROM documents, mid WHERE doc_id <= m
    ORDER BY doc_id LIMIT 6
),
dels AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3),
upds AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3 OFFSET 3),
state1 AS (
    SELECT d.doc_id, d.lang,
           CASE WHEN d.doc_id IN (SELECT doc_id FROM upds)
                THEN d.n_chars + 1000 ELSE d.n_chars END AS n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM dels)
),
lowered AS (
    SELECT doc_id FROM state1 ORDER BY n_chars DESC, doc_id ASC LIMIT 1
),
final AS (
    SELECT doc_id, lang,
           CASE WHEN doc_id IN (SELECT doc_id FROM lowered)
                THEN -1 ELSE n_chars END AS n_chars
    FROM state1
),
ranked AS (
    SELECT lang, doc_id, n_chars,
           ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC
           ) AS rnk
    FROM final
)
SELECT lang, CAST(rnk AS BIGINT) AS rank, doc_id, n_chars
FROM ranked WHERE rnk <= 3 ORDER BY lang, rank
"""


@query("mv_topk_refresh", oracle=_MV_TOPK_ORACLE)
def mv_topk_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental TOP-K view maintenance — the ORDER BY/LIMIT view
    class (leaderboards, freshest-n-per-entity) no scalar-aggregate
    view can express, maintained with BOUNDED state
    (operators/matview.py IncrementalTopKView): per-language top-3
    docs by n_chars, k+slack candidates per group plus a cut-time
    floor marker. Lifecycle: view built at the table's first version;
    the full cdc mutation plan runs (bulk append, 3 deletes, 3
    value-raising upserts) and ONE refresh merges the changefeed into
    the candidate state; then the GLOBAL LEADER is upserted down to
    n_chars=-1 — the floor-regression shape: the post-image re-enters
    below the group's cut-time floor, where a naive survivor count
    would serve it while a state-absent row outranks it — and a second
    refresh must notice (fewer than k at-or-above-floor candidates)
    and refill via the group-scoped rescan. The oracle replays the
    whole plan from raw parquet and ranks from scratch, so a hash
    match proves cut, floor algebra, retraction, and rescan in one
    row. 100 TB shape: refresh shuffles only state ∪ delta
    (|groups|×(k+slack) rows); the base is touched solely for dirtied
    groups under a broadcast semi-join, prunable when the base is
    clustered on the group key."""
    from vectordb_spark.operators.matview import IncrementalTopKView

    work = tempfile.mkdtemp(prefix="vdb_mv_topk_")
    t, v1 = build_cdc_gate_table(spark, sf_dir, work)
    mv = IncrementalTopKView(
        t, os.path.join(work, "mv"), ["lang"], "n_chars", k=3, slack=2
    )
    # build the candidate state AT v1 through the table's history, then
    # advance the rest of the lifecycle with one incremental merge
    mv._commit(mv._cut(t.df(version=v1)), v1)
    mv.refresh(force_incremental=True)
    # lower the global leader below every group's floor (deterministic
    # in both engines: max n_chars, doc_id ascending tiebreak)
    top = (
        t.df()
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .select("doc_id", "lang")
        .first()
    )
    t.insert(
        [
            {
                "doc_id": top["doc_id"],
                "lang": top["lang"],
                "n_chars": -1,
                "Emb": [0.0, 0.0],
            }
        ],
        upsert=True,
    )
    mv.refresh(force_incremental=True)
    out = (
        mv.df()
        .select(
            "lang",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            "n_chars",
        )
        .orderBy("lang", "rank")
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


# ------------------------------------ incremental QUANTILE view

# The engine's HDR bucket/lower-bound ladder, shared verbatim with the
# oracle (operators/sketch.py hdr_bucket_lb_sql — pure integer
# compares + exact dyadic floor-division, identical in Spark SQL and
# DuckDB).
_MVQ_B, _MVQ_LB = _hdr_sql("x")

_MV_QUANTILE_ORACLE = f"""
WITH mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
ordered AS (
    SELECT doc_id FROM documents, mid WHERE doc_id <= m
    ORDER BY doc_id LIMIT 6
),
dels AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3),
upds AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3 OFFSET 3),
neg AS (SELECT MIN(doc_id) AS d FROM upds),
final AS (
    SELECT d.doc_id, d.lang,
           CASE WHEN d.doc_id = (SELECT d FROM neg) THEN -7
                WHEN d.doc_id IN (SELECT doc_id FROM upds)
                THEN d.n_chars + 1000 ELSE d.n_chars END AS n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM dels)
),
iv AS (
    SELECT lang, CAST(n_chars AS BIGINT) AS x FROM final WHERE n_chars >= 0
),
b AS (
    SELECT lang, {_MVQ_B} AS bucket, MIN({_MVQ_LB}) AS lb, COUNT(*) AS c
    FROM iv GROUP BY lang, {_MVQ_B}
),
cum AS (
    SELECT lang, bucket, lb, c,
           SUM(c) OVER (PARTITION BY lang ORDER BY bucket) AS cum,
           SUM(c) OVER (PARTITION BY lang) AS n
    FROM b
)
SELECT lang,
       CAST(MAX(n) AS BIGINT) AS n,
       MIN(CASE WHEN cum >= CAST(ceil(0.50 * n) AS BIGINT) THEN lb END)
           AS est_p50,
       MIN(CASE WHEN cum >= CAST(ceil(0.99 * n) AS BIGINT) THEN lb END)
           AS est_p99
FROM cum GROUP BY lang ORDER BY lang
"""


@query("mv_quantile_refresh", oracle=_MV_QUANTILE_ORACLE)
def mv_quantile_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental QUANTILE view maintenance — the percentile
    dashboard kept fresh under inserts AND deletes with fixed state
    (operators/matview.py IncrementalQuantileView): HDR-histogram
    bucket counts are plain linear aggregates (unlike t-digest
    centroids they retract exactly), so per-language p50/p99 of
    n_chars reduces to the gate-certified COUNT merge keyed by
    (lang, derived _hdr_bucket). Lifecycle: view built at the table's
    first version; the full cdc mutation plan runs (bulk append, 3
    deletes, 3 value-shifting upserts) and ONE refresh merges the
    changefeed into the bucket state; then one survivor is upserted to
    n_chars = -7 — OUT of the HDR domain — and a second refresh must
    retract its old bucket and park the post-image in the NULL bucket
    (tracked so retractions balance, EXCLUDED from ranks, exactly like
    SQL percentiles ignore NULLs). The oracle replays the whole
    mutation plan from raw parquet and recomputes the nearest-rank
    bucket lower bounds through the SAME integer ladder
    (operators/sketch.py hdr_bucket_lb_sql — shared verbatim), so the
    hash match pins bucket algebra, retraction, domain handling, and
    the serve-time cumulative read in one row. 100 TB shape: state is
    ≤ ~790 live buckets per group FOREVER; a refresh reads the
    changefeed and merges only the (group, bucket) pairs it touches —
    COUNT is invertible, so the dirty-rescan machinery never engages;
    the serve-time window runs over state, not data."""
    from vectordb_spark.operators.matview import IncrementalQuantileView

    work = tempfile.mkdtemp(prefix="vdb_mv_q_")
    t, v1 = build_cdc_gate_table(spark, sf_dir, work)
    mv = IncrementalQuantileView(
        t, os.path.join(work, "mv"), ["lang"], "n_chars",
        quantiles=(0.5, 0.99),
    )
    # build the bucket state AT v1 through the table's history, then
    # advance the rest of the lifecycle with one incremental merge
    inner = mv._inner
    inner._commit(inner._agg(inner._prepare(t.df(version=v1))), v1)
    mv.refresh(force_incremental=True)
    # push one survivor OUT of the HDR domain (deterministic in both
    # engines: the smallest UPSERTED doc_id, i.e. the 4th-smallest id
    # in the first half — the same selection build_cdc_gate_table and
    # the oracle's `upds` CTE make) — its +1000 bucket must retract
    # and the post-image must ride state as the NULL bucket
    from vectordb_spark.sources.readers import load_table as _lt

    d = _lt(spark, sf_dir, "documents")
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (int(lo) + int(hi)) // 2
    neg_id = [
        r[0]
        for r in d.where(F.col("doc_id") <= mid)
        .select("doc_id")
        .orderBy("doc_id")
        .limit(6)
        .collect()
    ][3]
    neg = (
        t.df()
        .where(F.col("doc_id") == neg_id)
        .select("doc_id", "lang")
        .first()
    )
    t.insert(
        [
            {
                "doc_id": neg["doc_id"],
                "lang": neg["lang"],
                "n_chars": -7,
                "Emb": [0.0, 0.0],
            }
        ],
        upsert=True,
    )
    mv.refresh(force_incremental=True)
    out = (
        mv.df()
        .select(
            "lang",
            F.col("n").cast("long").alias("n"),
            "est_p50",
            "est_p99",
        )
        .orderBy("lang")
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


# ------------------------------ incremental AVG/VAR/STDDEV view

_MV_STATS_ORACLE = """
WITH mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
ordered AS (
    SELECT doc_id FROM documents, mid WHERE doc_id <= m
    ORDER BY doc_id LIMIT 6
),
dels AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3),
upds AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3 OFFSET 3),
nv AS (SELECT MIN(doc_id) AS d FROM upds),
final AS (
    SELECT d.doc_id, d.lang,
           CASE WHEN d.doc_id = (SELECT d FROM nv) THEN NULL
                WHEN d.doc_id IN (SELECT doc_id FROM upds)
                THEN d.n_chars + 1000 ELSE d.n_chars END AS n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM dels)
),
s AS (
    SELECT lang,
           COUNT(*) AS n_rows,
           COUNT(n_chars) AS n_val,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE) AS s,
           CAST(SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT))
                AS DOUBLE) AS ss
    FROM final GROUP BY lang
),
v AS (
    SELECT lang, n_rows, n_val, s,
           CASE WHEN n_val > 0
                THEN GREATEST(ss / CAST(n_val AS DOUBLE)
                              - (s / CAST(n_val AS DOUBLE))
                                * (s / CAST(n_val AS DOUBLE)), 0.0)
           END AS var_pop
    FROM s
)
SELECT lang,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_val AS BIGINT) AS n_val,
       CASE WHEN n_val > 0 THEN s / CAST(n_val AS DOUBLE) END AS avg,
       var_pop,
       SQRT(var_pop) AS stddev_pop
FROM v ORDER BY lang
"""


@query("mv_stats_refresh", oracle=_MV_STATS_ORACLE)
def mv_stats_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental AVG/VAR/STDDEV view maintenance — the second-moment
    dashboard class (operators/matview.py sumsq state + _derive_stats):
    per-language mean/variance/stddev of n_chars kept fresh under the
    full cdc mutation plan with (count, sum, sumsq) state only. Both
    moments accumulate as EXACT decimals (value → decimal(18,4),
    square → decimal(38,8)) so retraction is exact and the serve-time
    doubles are deterministic: the oracle recomputes the same moments
    as exact BIGINT sums and applies the identical double arithmetic
    (s/n, greatest(ss/n − (s/n)², 0), sqrt — every operand an exact
    integer < 2^53, every op IEEE-deterministic), so the hash match is
    bit-for-bit. Lifecycle: view built at the table's first version;
    the mutation plan runs (bulk append, 3 deletes, 3 value-shifting
    upserts) and ONE refresh merges the changefeed; then one upserted
    survivor's value is set to NULL — the SQL-semantics shape: the
    update_pre retracts its +1000 value from both moments, the
    post-image raises n_rows but NOT n_val (AVG divides by
    COUNT(value), not COUNT(*)) — and a second refresh must leave the
    group's n_rows ≠ n_val with the value fully retracted. 100 TB
    shape: state is one row per group forever; refresh shuffles only
    the changefeed delta (the signed merge is pure linear algebra —
    no rescan machinery exists to engage); serve derives stats off
    state, not data. Reference: stats surface parity with S11
    (table_mvp.cpp statistics endpoint) lifted to maintained views."""
    from vectordb_spark.operators.matview import IncrementalAggView

    work = tempfile.mkdtemp(prefix="vdb_mv_stats_")
    t, v1 = build_cdc_gate_table(spark, sf_dir, work)
    mv = IncrementalAggView(
        t, os.path.join(work, "mv"), ["lang"], "n_chars",
        aggs=("count", "sum", "sumsq"),
    )
    # build the moment state AT v1 through the table's history, then
    # advance the rest of the lifecycle with one incremental merge
    mv._commit(mv._agg(mv._prepare(t.df(version=v1))), v1)
    mv.refresh(force_incremental=True)
    # NULL out the smallest UPSERTED doc's value (deterministic in
    # both engines: the 4th-smallest id in the first half — the same
    # selection build_cdc_gate_table and the oracle's `upds` CTE make);
    # its +1000 moments must retract while n_rows keeps counting it
    from vectordb_spark.sources.readers import load_table as _lt

    d = _lt(spark, sf_dir, "documents")
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (int(lo) + int(hi)) // 2
    null_id = [
        r[0]
        for r in d.where(F.col("doc_id") <= mid)
        .select("doc_id")
        .orderBy("doc_id")
        .limit(6)
        .collect()
    ][3]
    lang = (
        t.df().where(F.col("doc_id") == null_id).select("lang").first()[0]
    )
    # insert() enforces the reference's every-field-required JSON rule,
    # so the NULL value rides the DataFrame ingest path
    t.insert_df(
        spark.createDataFrame(
            [(null_id, lang, None, [0.0, 0.0])],
            "doc_id long, lang string, n_chars long, Emb array<float>",
        ),
        upsert=True,
    )
    mv.refresh(force_incremental=True)
    out = (
        mv.stats_df()
        .select(
            "lang",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_val").cast("long").alias("n_val"),
            "avg",
            "var_pop",
            "stddev_pop",
        )
        .orderBy("lang")
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


# ------------------------------------ partial (filtered) view

_MV_FILTERED_ORACLE = """
WITH mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
ordered AS (
    SELECT doc_id FROM documents, mid WHERE doc_id <= m
    ORDER BY doc_id LIMIT 6
),
dels AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3),
upds AS (SELECT doc_id FROM ordered ORDER BY doc_id LIMIT 3 OFFSET 3),
xid AS (SELECT MIN(doc_id) AS d FROM upds),
final AS (
    SELECT d.doc_id, d.lang,
           CASE WHEN d.doc_id = (SELECT d FROM xid) THEN 7
                WHEN d.doc_id IN (SELECT doc_id FROM upds)
                THEN d.n_chars + 1000 ELSE d.n_chars END AS n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM dels)
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS DECIMAL(28,4))) AS DOUBLE) AS sum_chars
FROM final
WHERE n_chars >= 200 AND lang <> 'de'
GROUP BY lang ORDER BY lang
"""


@query("mv_filtered_refresh", oracle=_MV_FILTERED_ORACLE)
def mv_filtered_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTIAL materialized-view maintenance — the view is defined
    over a σ(table) in the TABLE'S OWN filter-expression language (the
    reference grammar, expr/: comparisons + AND + <> here — the
    grammar's own quirk that NOT cannot be an AND operand included),
    compiled once and applied to every frame the
    delta algebra sees: full-build scan, signed changefeed, dirty
    rescan. Selection commutes with signed-multiset semantics, so the
    classic partial-view hazard — an upsert whose images straddle the
    boundary — needs no special casing: the in-filter image
    contributes, the out-of-filter image doesn't (retract-only /
    add-only). Lifecycle: view built at v1 under
    ``n_chars >= 200 AND lang <> 'de'``; the full mutation plan
    runs (bulk append, 3 deletes, 3 upserts that shift rows INTO the
    filter) and ONE refresh merges the filtered changefeed; then the
    smallest upserted doc CROSSES OUT (n_chars → 7) and a second
    refresh must retract it from its group while n_rows elsewhere
    stand. The oracle replays the plan from raw parquet and applies
    the same WHERE from scratch. 100 TB shape: the filter PRUNES the
    changefeed before the shuffle (and the base scan it replaces
    entirely) — a partial view over a 1% slice pays 1% of the merge,
    which is the point of declaring the filter in the view instead of
    filtering at read time. Reference parity: the same grammar drives
    scan filters (P2–P7) and, via this class, standing views."""
    from vectordb_spark.operators.matview import IncrementalAggView

    work = tempfile.mkdtemp(prefix="vdb_mv_flt_")
    t, v1 = build_cdc_gate_table(spark, sf_dir, work)
    mv = IncrementalAggView(
        t, os.path.join(work, "mv"), ["lang"], "n_chars",
        filter="n_chars >= 200 AND lang <> 'de'",
    )
    # build the filtered state AT v1 through the table's history, then
    # advance the rest of the lifecycle with one incremental merge
    mv._commit(mv._agg(mv._prepare(t.df(version=v1))), v1)
    mv.refresh(force_incremental=True)
    # cross OUT of the filter: the smallest UPSERTED doc (the same
    # deterministic selection the oracle's `upds`/`xid` CTEs make)
    # drops from n_chars+1000 to 7 — its pre-image retracts, its
    # post-image contributes nothing
    from vectordb_spark.sources.readers import load_table as _lt

    d = _lt(spark, sf_dir, "documents")
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (int(lo) + int(hi)) // 2
    x_id = [
        r[0]
        for r in d.where(F.col("doc_id") <= mid)
        .select("doc_id")
        .orderBy("doc_id")
        .limit(6)
        .collect()
    ][3]
    lang = t.df().where(F.col("doc_id") == x_id).select("lang").first()[0]
    t.insert(
        [{"doc_id": x_id, "lang": lang, "n_chars": 7, "Emb": [0.0, 0.0]}],
        upsert=True,
    )
    mv.refresh(force_incremental=True)
    out = (
        mv.df()
        .select(
            "lang",
            F.col("n_rows").alias("n_docs"),
            F.col("_sum_dec").cast("double").alias("sum_chars"),
        )
        .orderBy("lang")
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


# ------------------- incremental time-bucketed rollup (hypertable)

_DAY_NS = 86_400_000_000_000

_MV_ROLLUP_ORACLE = f"""
WITH mid AS (SELECT (MIN(event_id) + MAX(event_id)) // 2 AS m FROM events),
ordered AS (
    SELECT event_id FROM events, mid WHERE event_id <= m
    ORDER BY event_id LIMIT 6
),
dels AS (SELECT event_id FROM ordered ORDER BY event_id LIMIT 3),
upds AS (SELECT event_id FROM ordered ORDER BY event_id LIMIT 3 OFFSET 3),
mvd AS (SELECT MIN(event_id) AS d FROM upds),
final AS (
    SELECT e.event_id, e.event_type,
           epoch_ns(e.ts)
             + CASE WHEN e.event_id = (SELECT d FROM mvd)
                    THEN {_DAY_NS} ELSE 0 END AS tns,
           CASE WHEN e.event_id IN (SELECT event_id FROM upds)
                THEN e.value + 100 ELSE e.value END AS value
    FROM events e
    WHERE e.event_id NOT IN (SELECT event_id FROM dels)
)
SELECT (tns // {_DAY_NS}) * {_DAY_NS} AS bucket_start_ns,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
FROM final GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("mv_rollup_refresh", oracle=_MV_ROLLUP_ORACLE)
def mv_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental TIME-BUCKETED rollup maintenance — the TimescaleDB
    continuous-aggregate / hypertable-rollup class
    (operators/matview.py IncrementalRollupView): per (day bucket,
    event_type) COUNT + exact-decimal SUM(value) kept fresh from the
    changefeed, the bucket DERIVED from the epoch-ns time column by
    pure integer floor arithmetic (epoch-ns exceeds 2^53 — float
    bucket math would corrupt it; both engines run the same t − t mod
    D ladder). Lifecycle: view built at the table's first version; the
    mutation plan runs (bulk append, 3 deletes, 3 value-shifting
    upserts) and ONE refresh merges the changefeed; then one upserted
    event's TIMESTAMP moves forward a day — the late-data-correction
    shape: the pre-image must retract from the OLD bucket's group and
    the post-image must land in the NEW one, which the signed merge
    gets for free because the bucket is stamped on every changefeed
    row, pre- and post-images alike — and a second refresh advances
    the view. The oracle replays the whole plan from raw parquet and
    re-buckets from scratch, so the hash pins bucket derivation,
    cross-bucket migration, and the retraction algebra in one row.
    100 TB shape: state is |live buckets × types| rows regardless of
    event count; refresh shuffles only the changefeed delta; serving
    reads state, never events."""
    from vectordb_spark.operators.matview import IncrementalRollupView
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.sources.readers import load_table as _lt
    from vectordb_spark.table import Table

    work = tempfile.mkdtemp(prefix="vdb_mv_rollup_")
    e = _lt(spark, sf_dir, "events")
    lo, hi = e.agg(F.min("event_id"), F.max("event_id")).first()
    mid = (int(lo) + int(hi)) // 2
    first = e.where(F.col("event_id") <= mid)
    ids = [
        r[0]
        for r in first.select("event_id").orderBy("event_id").limit(6).collect()
    ]
    dels, upds = ids[:3], ids[3:6]
    table_schema = TableSchema(
        name="rollup_events",
        fields=[
            FieldSchema(
                name="event_id", field_type=FieldType.INT8, primary_key=True
            ),
            FieldSchema(name="ts", field_type=FieldType.INT8),
            FieldSchema(name="event_type", field_type=FieldType.STRING),
            FieldSchema(name="value", field_type=FieldType.DOUBLE),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, table_schema, os.path.join(work, "rollup_events"))
    t._init_storage()

    def _proj(df: DataFrame) -> DataFrame:
        return df.select(
            "event_id",
            "ts",
            "event_type",
            "value",
            F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
        )

    t.insert_df(_proj(first))
    v1 = t.versions()[-1]
    t.insert_df(_proj(e.where(F.col("event_id") > mid)))
    t.delete(primary_keys=dels)
    upd_rows = (
        e.where(F.col("event_id").isin(upds))
        .select("event_id", "ts", "event_type", "value")
        .collect()
    )
    t.insert(
        [
            {
                "event_id": r["event_id"],
                "ts": r["ts"],
                "event_type": r["event_type"],
                "value": r["value"] + 100,
                "v": [0.0, 0.0],
            }
            for r in upd_rows
        ],
        upsert=True,
    )
    mv = IncrementalRollupView(
        t, os.path.join(work, "mv"), "ts", _DAY_NS, ["event_type"], "value"
    )
    # build the bucket state AT v1 through the table's history, then
    # advance the rest of the lifecycle with one incremental merge
    mv._commit(mv._agg(mv._prepare(t.df(version=v1))), v1)
    mv.refresh(force_incremental=True)
    # the late-data correction: move the smallest UPSERTED event one
    # day forward (value keeps its +100) — old bucket retracts, new
    # bucket gains, across the bucket boundary by construction
    moved = min(r["event_id"] for r in upd_rows)
    mrow = next(r for r in upd_rows if r["event_id"] == moved)
    t.insert(
        [
            {
                "event_id": moved,
                "ts": mrow["ts"] + _DAY_NS,
                "event_type": mrow["event_type"],
                "value": mrow["value"] + 100,
                "v": [0.0, 0.0],
            }
        ],
        upsert=True,
    )
    mv.refresh(force_incremental=True)
    out = (
        mv.df()
        .select(
            F.col("_bucket_start_ns").alias("bucket_start_ns"),
            "event_type",
            F.col("n_rows").alias("n_events"),
            F.col("_sum_dec").cast("double").alias("sum_value"),
        )
        .orderBy("bucket_start_ns", "event_type")
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


# --------------------- streaming JOIN-view maintenance (fact stream)

_SJV_ORACLE = f"""
WITH tgt AS (SELECT MIN(o_custkey) AS k FROM orders),
dim1 AS (
    SELECT c_custkey,
           CASE WHEN c_custkey = (SELECT k FROM tgt)
                THEN (c_nationkey + 1) % 25 ELSE c_nationkey END AS nation
    FROM customer
)
SELECT CAST(nation AS INT) AS nation,
       COUNT(*) AS n_orders,
       {O.dec_sum("o_totalprice")} AS sum_price
FROM orders o JOIN dim1 d ON o.o_custkey = d.c_custkey
GROUP BY nation
ORDER BY nation
"""


@query("stream_join_matview_maintenance", oracle=_SJV_ORACLE)
def stream_join_matview_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming JOIN-view maintenance (VERDICT r10 #7) — the
    Materialize class at its real shape: orders stream into the FACT
    table in THREE micro-batches (foreachBatch → manifest commit per
    batch) while the SAME sink advances a revenue-per-nation
    IncrementalJoinAggView over orders JOIN customer by one
    delta-join refresh per batch; between batches 1 and 2 the DIM
    mutates too (the busiest customer's nation moves), so the mid-
    stream refresh exercises BOTH delta terms — ΔA⋈D1 for the landed
    batch and A0⋈ΔD for the nation move — against snapshots that keep
    changing underneath. The gate asserts one view advance per
    micro-batch with exactly one dim-version step; the oracle computes
    the final join-aggregate from raw parquet, so the hash match
    proves three chained two-sided delta merges reproduce the
    from-scratch answer through stream→table→changefeed→join-view.
    100 TB shape: per batch the refresh reads that batch's segment +
    the broadcast dim delta + the |groups|-row view — freshness cost
    tracks batch size (the single-table streaming gate's discipline,
    now across a join)."""
    from vectordb_spark.operators.matview import IncrementalJoinAggView
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.sources.readers import load_table
    from vectordb_spark.table import Table

    cust = load_table(spark, sf_dir, "customer")
    ords = load_table(spark, sf_dir, "orders")

    stream_schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    fschema = TableSchema(
        name="sjv_orders",
        fields=[
            FieldSchema(
                name="o_orderkey", field_type=FieldType.INT8, primary_key=True
            ),
            FieldSchema(name="o_custkey", field_type=FieldType.INT8),
            FieldSchema(name="o_totalprice", field_type=FieldType.DOUBLE),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    dschema = TableSchema(
        name="sjv_customer",
        fields=[
            FieldSchema(
                name="c_custkey", field_type=FieldType.INT8, primary_key=True
            ),
            FieldSchema(name="c_nationkey", field_type=FieldType.INT4),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    zv = F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v")
    work = tempfile.mkdtemp(prefix="vdb_sjv_")

    # three fact stream files by o_orderkey % 3, mtimes pinned so the
    # file source delivers them as three ordered micro-batches
    src = os.path.join(work, "stream_src")
    os.makedirs(src)
    for i in range(3):
        part_dir = os.path.join(work, f"third{i}")
        (
            ords.where(f"o_orderkey % 3 = {i}")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .coalesce(1)
            .write.parquet(part_dir)
        )
        part = next(
            n for n in os.listdir(part_dir)
            if n.endswith(".parquet") and not n.startswith("_")
        )
        dst = os.path.join(src, f"b{i}.parquet")
        os.rename(os.path.join(part_dir, part), dst)
        os.utime(dst, (1_000_000_000 + i * 100,) * 2)

    fact = Table(spark, fschema, os.path.join(work, "sjv_orders"))
    fact._init_storage()
    dim = Table(spark, dschema, os.path.join(work, "sjv_customer"))
    dim._init_storage()
    dim.insert_df(cust.select("c_custkey", "c_nationkey", zv))
    mv = IncrementalJoinAggView(
        fact, dim, os.path.join(work, "mv"),
        fact_key="o_custkey", dim_key="c_custkey",
        group_cols=["c_nationkey"], value_col="o_totalprice",
    )
    mv.full_build()  # view exists BEFORE any fact rows: empty groups

    # the mid-stream dim mutation, resolved up front from the raw
    # source (the same choice the oracle makes)
    tgt_ck = int(ords.agg(F.min("o_custkey")).first()[0])
    tgt_nat = int(
        cust.where(F.col("c_custkey") == tgt_ck)
        .select("c_nationkey")
        .first()[0]
    )
    versions: list[tuple[int, int]] = []

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fact.insert_df(
            batch_df.select("o_orderkey", "o_custkey", "o_totalprice", zv)
        )
        if len(versions) == 1:
            dim.insert(
                [
                    {
                        "c_custkey": tgt_ck,
                        "c_nationkey": (tgt_nat + 1) % 25,
                        "v": [0.0, 0.0],
                    }
                ],
                upsert=True,
            )
        versions.append(mv.refresh(force_incremental=True))

    q = (
        spark.readStream.schema(stream_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(work, "_checkpoint"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # one two-sided view advance per micro-batch; the dim version
    # stepped exactly once (the mid-stream nation move)
    assert len(versions) == 3 and versions == sorted(set(versions)), versions
    assert versions[-1][1] == versions[0][1] + 1, versions
    assert mv.versions() == (
        fact._load_meta()["version"], dim._load_meta()["version"]
    )

    out = (
        mv.df()
        .select(
            F.col("c_nationkey").cast("int").alias("nation"),
            F.col("n_rows").alias("n_orders"),
            F.col("_sum_dec").cast("double").alias("sum_price"),
        )
        .orderBy("nation")
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out


# -------------------------------------- string-PK changefeed (CDC) gate
#
# Round-13 queue (r12): the cdc_changefeed_diff lifecycle on a table
# whose PRIMARY KEY is a STRING — the reference's PK domain includes
# STRING (basic_meta_impl.cpp:370-378), and r12's exact write-time
# string stats route these tables through the segment-granular COW
# path (1/N segments rewritten; pinned structurally in
# tests/test_table_api.py::test_string_pk_cow_rewrites_only_matched_segments).
# This gate makes the string-keyed mutation surface HASH-CHECKED:
# append + delete + upsert on zero-padded doc keys, then changes(v1)
# must reconstruct exactly the same logical diff the oracle computes
# from raw parquet. Zero-padded keys sort identically as strings and
# integers, so both engines pick the same 6 mutation targets.

_CDC_STR_ORACLE = """
WITH base AS (
    SELECT printf('doc-%09d', doc_id) AS dockey, doc_id, lang, n_chars
    FROM documents
),
mid AS (SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS m FROM documents),
ordered AS (
    SELECT dockey FROM base, mid WHERE doc_id <= m
    ORDER BY dockey LIMIT 6
),
dels AS (SELECT dockey FROM ordered ORDER BY dockey LIMIT 3),
upds AS (SELECT dockey FROM ordered ORDER BY dockey LIMIT 3 OFFSET 3)
SELECT b.dockey, b.lang, CAST(b.n_chars AS BIGINT) AS n_chars,
       'insert' AS change_type
FROM base b, mid WHERE b.doc_id > mid.m
UNION ALL
SELECT dockey, lang, CAST(n_chars AS BIGINT), 'delete'
FROM base WHERE dockey IN (SELECT dockey FROM dels)
UNION ALL
SELECT dockey, lang, CAST(n_chars + 1000 AS BIGINT), 'update'
FROM base WHERE dockey IN (SELECT dockey FROM upds)
"""


def build_cdc_string_gate_table(spark: SparkSession, sf_dir: str, work: str):
    """The cdc lifecycle (bulk ingest v1 → append → delete ×3 →
    upsert ×3) on a STRING-keyed table under ``work``; returns
    ``(table, v1)``. Every mutation rides the string-PK COW path."""
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.sources.readers import load_table
    from vectordb_spark.table import Table

    d = load_table(spark, sf_dir, "documents").withColumn(
        "dockey", F.format_string("doc-%09d", F.col("doc_id"))
    )
    lo, hi = d.agg(F.min("doc_id"), F.max("doc_id")).first()
    mid = (int(lo) + int(hi)) // 2
    first = d.where(F.col("doc_id") <= mid)
    keys = [
        r[0]
        for r in first.select("dockey").orderBy("dockey").limit(6).collect()
    ]
    dels, upds = keys[:3], keys[3:6]
    table_schema = TableSchema(
        name="cdc_sdocs",
        fields=[
            FieldSchema(
                name="dockey", field_type=FieldType.STRING, primary_key=True
            ),
            FieldSchema(name="lang", field_type=FieldType.STRING),
            FieldSchema(name="n_chars", field_type=FieldType.INT8),
            FieldSchema(
                name="Emb", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, table_schema, os.path.join(work, "cdc_sdocs"))
    t._init_storage()

    def _proj(df: DataFrame) -> DataFrame:
        return df.select(
            "dockey",
            "lang",
            "n_chars",
            F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("Emb"),
        )

    t.insert_df(_proj(first))
    v1 = t.versions()[-1]
    t.insert_df(_proj(d.where(F.col("doc_id") > mid)))
    t.delete(primary_keys=dels)
    upd_recs = [
        {
            "dockey": r["dockey"],
            "lang": r["lang"],
            "n_chars": r["n_chars"] + 1000,
            "Emb": [0.0, 0.0],
        }
        for r in d.where(F.col("dockey").isin(upds))
        .select("dockey", "lang", "n_chars")
        .collect()
    ]
    t.insert(upd_recs, upsert=True)
    return t, v1


@query("cdc_string_pk_changefeed", oracle=_CDC_STR_ORACLE)
def cdc_string_pk_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changefeed gate on a STRING primary key (module comment above):
    the same manifest-history diff discipline as cdc_changefeed_diff,
    with every mutation riding the r12 string-PK COW path (exact
    write-time string stats prune the rewrite set). A hash match
    certifies string-keyed delete/upsert semantics end to end against
    an oracle that never saw the table format."""
    work = tempfile.mkdtemp(prefix="vdb_cdcs_")
    t, v1 = build_cdc_string_gate_table(spark, sf_dir, work)
    out = t.changes(v1).select(
        "dockey",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("_change_type").alias("change_type"),
    )
    out = out.localCheckpoint()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return out
