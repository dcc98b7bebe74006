"""Streaming ingest end-to-end: JSON file source → foreachBatch upsert
into a Table; watermarked windowed aggregation on a stream."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vectordb_spark.catalog import Warehouse
from vectordb_spark.streaming.ingest import stream_insert, windowed_event_counts

SCHEMA = {
    "name": "stream_t",
    "fields": [
        {"name": "ID", "dataType": "INT", "primaryKey": True},
        {"name": "Doc", "dataType": "STRING"},
        {
            "name": "Embedding",
            "dataType": "VECTOR_FLOAT",
            "dimensions": 2,
            "metricType": "EUCLIDEAN",
        },
    ],
}

READ_SCHEMA = T.StructType(
    [
        T.StructField("ID", T.IntegerType()),
        T.StructField("Doc", T.StringType()),
        T.StructField("Embedding", T.ArrayType(T.FloatType())),
    ]
)


def _write_batch(d: str, name: str, records: list[dict]) -> None:
    with open(os.path.join(d, name), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def test_stream_insert_upsert(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(
        str(src), "b1.json",
        [{"ID": i, "Doc": f"d{i}", "Embedding": [float(i), 0.0]} for i in range(5)],
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    table = wh.load_db("sdb").create_table(SCHEMA)

    stream = spark.readStream.schema(READ_SCHEMA).json(str(src))
    q = stream_insert(table, stream, str(tmp_path / "ckpt"), upsert=True)
    q.awaitTermination(120)
    assert table.statistics() == {"totalRecords": 5}

    # second file: 2 updates + 2 new rows; availableNow restart drains it
    _write_batch(
        str(src), "b2.json",
        [
            {"ID": 1, "Doc": "d1-v2", "Embedding": [9.0, 9.0]},
            {"ID": 4, "Doc": "d4-v2", "Embedding": [8.0, 8.0]},
            {"ID": 10, "Doc": "d10", "Embedding": [1.0, 1.0]},
            {"ID": 11, "Doc": "d11", "Embedding": [2.0, 2.0]},
        ],
    )
    q2 = stream_insert(
        table,
        spark.readStream.schema(READ_SCHEMA).json(str(src)),
        str(tmp_path / "ckpt"),
        upsert=True,
    )
    q2.awaitTermination(120)
    assert table.statistics() == {"totalRecords": 7}
    got = table.get(primary_keys=[1])
    assert got["result"][0]["Doc"] == "d1-v2"


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessions over a streamed events file must
    match the batch sessionization for every CLOSED session (open
    sessions stay in state until timeout)."""
    import shutil

    from vectordb_spark.queries.windows import w2_sessionize
    from vectordb_spark.streaming.ingest import stateful_sessionize

    batch_sessions = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in w2_sessionize(spark, "/root/testdata/sf0.001").collect()
    }

    d = tmp_path / "events_dir"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "events.parquet")
    schema = spark.read.parquet(str(d)).schema
    stream = spark.readStream.schema(schema).parquet(str(d))
    out = stateful_sessionize(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # every emitted (closed) session appears in the batch result
    assert got, "no sessions closed in stream"
    assert got <= batch_sessions
    # and most sessions close within the single batch (only the last
    # session per user remains open in state)
    users = {u for u, *_ in batch_sessions}
    assert len(got) >= len(batch_sessions) - len(users)


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    expected = {
        (r.window_start, r.event_type): r.n_events
        for r in windowed_event_counts(batch).collect()
    }
    assert expected  # non-trivial

    # same aggregation as a stream over the parquet file
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet("/root/testdata/sf0.001")
    )
    # restrict to the events file via the schema match (events.parquet
    # is the only file with this schema in a fresh dir read) — instead,
    # just stream the single file's directory by copying it
    import shutil

    d = tmp_path / "events_dir"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "events.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(str(d))
    out = windowed_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == expected
