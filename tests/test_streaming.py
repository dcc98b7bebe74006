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


def test_watermark_evicts_late_rows(spark, tmp_path):
    # the eviction side of the watermark contract (the oracle gate
    # stream_late_window_upsert proves the MERGE side with a
    # span-exceeding delay). Spark guarantees the drop only once the
    # window's state has been cleaned up ("data later than the
    # watermark may or may not be included" — Structured Streaming
    # guide), so the sequence is: create the hour-0 window, advance the
    # watermark past it (evicts its state), THEN deliver a late row for
    # it — which must be dropped, not re-emitted as a fresh count
    HOUR_NS = 3_600_000_000_000
    b0 = [(i, i * 1_000_000_000, 7, "click", 1.0, "{}") for i in range(5)] + [
        (50, 10 * HOUR_NS, 7, "click", 1.0, "{}")
    ]
    b1 = [(60, 10 * HOUR_NS + 1_000_000_000, 7, "click", 1.0, "{}")]
    b2 = [(200, 30 * 1_000_000_000, 7, "click", 1.0, "{}")]  # 9h late
    schema = "event_id long, ts long, user_id long, event_type string, value double, props string"
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate([b0, b1, b2]):
        half = tmp_path / f"half{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(half))
        part = next(
            n for n in os.listdir(half)
            if n.endswith(".parquet") and not n.startswith("_")
        )
        dst = src / f"b{i}.parquet"
        os.rename(half / part, dst)
        os.utime(dst, (1_000_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = windowed_event_counts(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("late_evict")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM late_evict").collect()
    by_hour = {}
    for r in rows:
        by_hour.setdefault(int(r.window_start.timestamp()) // 3600, []).append(
            r.n_events
        )
    # hour-0 emitted once (count 5) before eviction; the late row must
    # NOT have re-emitted it as a fresh count-1 window
    assert by_hour[0] == [5]
    assert max(by_hour[10]) == 2
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1


def test_stateful_sessionize_timeout_flush(spark, tmp_path):
    """The state-timeout path end-to-end: a user who goes quiet must
    have their OPEN session flushed by the processing-time timeout when
    a later microbatch arrives — not only when their own events close
    it (streaming/ingest.py stateful_sessionize hasTimedOut branch)."""
    import time

    from vectordb_spark.streaming.ingest import stateful_sessionize

    d = tmp_path / "ev"
    d.mkdir()
    sch = "user_id long, ts long"
    us = 1_000  # ns per µs
    # user 1: three events 1µs apart, then silence forever
    spark.createDataFrame(
        [(1, 1_000_000 * us), (1, 2_000_000 * us), (1, 3_000_000 * us)], sch
    ).coalesce(1).write.mode("append").parquet(str(d))

    stream = spark.readStream.schema(
        spark.read.parquet(str(d)).schema
    ).parquet(str(d))
    out = stateful_sessionize(stream, gap_seconds=2)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_timeout")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # wait past the 2s processing-time timeout, then land a second
        # file (a different user) so another microbatch runs and fires
        # the timeout for user 1
        deadline = time.time() + 60
        flushed = []
        wrote_second = False
        while time.time() < deadline and not flushed:
            if not wrote_second and q.lastProgress is not None:
                time.sleep(3)  # > gap_seconds after batch 1 processed
                spark.createDataFrame(
                    [(2, 100_000_000 * us)], sch
                ).coalesce(1).write.mode("append").parquet(str(d))
                wrote_second = True
            flushed = spark.sql(
                "SELECT * FROM sessions_timeout WHERE user_id = 1"
            ).collect()
            time.sleep(1)
        assert flushed, "user 1's open session was never timeout-flushed"
        r = flushed[0]
        assert (r.session_start_us, r.session_end_us, r.n_events) == (
            1_000_000,
            3_000_000,
            3,
        )
    finally:
        q.stop()


def test_sliding_counts_stream_matches_batch(spark, tmp_path):
    """Sliding (hopping) windows agree between the batch frame and the
    streamed frame — the w7 shape on the stream surface."""
    import shutil

    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    want = {
        (r.window_start, r.event_type): r.n_events
        for r in windowed_event_counts(
            batch, window="1 hour", slide="30 minutes"
        ).collect()
    }
    assert len({k[0] for k in want}) > len(
        {k[0] for k in (
            (r.window_start, r.event_type)
            for r in windowed_event_counts(batch).collect()
        )}
    ), "slide should produce more distinct window starts than tumbling"

    d = tmp_path / "events_dir"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "events.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(str(d))
    out = windowed_event_counts(stream, window="1 hour", slide="30 minutes")
    q = (
        out.writeStream.format("memory")
        .outputMode("complete")
        .queryName("slide_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM slide_counts").collect()
    }
    assert got == want


def test_stream_stream_join_evicts_expired_click_state(spark, tmp_path):
    """The eviction half of the stream-STREAM join contract (the gate
    stream_stream_join_attribution proves completeness with a
    span-exceeding watermark). A click whose join window [c, c+4d] has
    fallen fully behind the watermark must leave the state store, so a
    later purchase inside that window finds nothing — the pair a batch
    rejoin WOULD produce is absent, by design."""
    DAY_NS = 86_400_000_000_000
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )

    def spill(name, batches):
        src = tmp_path / name
        src.mkdir()
        for i, rows in enumerate(batches):
            half = tmp_path / f"{name}_h{i}"
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(half))
            part = next(
                n for n in os.listdir(half)
                if n.endswith(".parquet") and not n.startswith("_")
            )
            dst = src / f"b{i}.parquet"
            os.rename(half / part, dst)
            os.utime(dst, (1_000_000_000 + i * 100,) * 2)
        return str(src)

    # click at day 0; batch 1 purchases at day 20 push the watermark to
    # day 19 >> day 0 + 4d, evicting the click's state; batch 2 then
    # delivers a purchase at day 1 that WOULD match in a batch join
    clicks_src = spill(
        "clicks",
        [
            [(1, 0, 7, "click", 1.0, "{}"),
             (2, 18 * DAY_NS, 7, "click", 1.0, "{}")],
            [],
        ],
    )
    purch_src = spill(
        "purch",
        [
            [(100, 20 * DAY_NS, 7, "purchase", 5.0, "{}")],
            [(101, 1 * DAY_NS, 7, "purchase", 9.0, "{}")],  # late
        ],
    )

    def rd(src, side):
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return s.withColumn(
            "wts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        ).withWatermark("wts", "1 day")

    c = rd(clicks_src, "c").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("wts").alias("c_wts"),
    )
    p = rd(purch_src, "p").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("wts").alias("p_wts"),
    )
    pairs = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_wts") >= F.col("c_wts"))
        & (F.col("p_wts") <= F.col("c_wts") + F.expr("INTERVAL 4 DAYS")),
    )
    q = (
        pairs.writeStream.format("memory")
        .queryName("ssj_evict")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT click_id, purchase_id FROM ssj_evict").collect()
    }
    # day-18 click x day-20 purchase joins; the day-1 purchase finds
    # the day-0 click GONE (a batch join would emit (1, 101))
    assert (2, 100) in got
    assert (1, 101) not in got


def test_stream_topk_view_advances_per_batch(spark, tmp_path):
    """Streaming LEADERBOARD maintenance: three micro-batches upsert
    into an engine table while the SAME foreachBatch sink advances an
    IncrementalTopKView per batch — including a mid-stream batch that
    LOWERS a current group leader below its cut-time floor, the shape
    that forces the group-scoped refill rescan. One view advance per
    micro-batch, and the final state equals a from-scratch re-rank."""
    from vectordb_spark.operators.matview import IncrementalTopKView
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.table import Table

    schema = TableSchema(
        name="st_topk",
        fields=[
            FieldSchema(name="id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="grp", field_type=FieldType.STRING),
            FieldSchema(name="val", field_type=FieldType.INT8),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, str(tmp_path / "st_topk"))
    t._init_storage()
    mv = IncrementalTopKView(
        t, str(tmp_path / "mv"), ["grp"], "val", k=2, slack=1
    )
    mv.full_build()  # leaderboard exists BEFORE any data lands

    def rows(i):
        return [
            {"id": i, "grp": f"g{i % 3}", "val": i * 10, "v": [0.0, 0.0]}
        ]

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [r for i in range(10) for r in rows(i)],
        [r for i in range(10, 20) for r in rows(i)],
        # id 19 leads g1 with val 190 after batch 1; lower it below
        # every floor (plus one fresh row so the batch also inserts)
        [
            {"id": 19, "grp": "g1", "val": -5, "v": [0.0, 0.0]},
            {"id": 100, "grp": "g2", "val": 55, "v": [0.0, 0.0]},
        ],
    ]
    for i, recs in enumerate(batches):
        p = str(src / f"b{i}.json")
        _write_batch(str(src), f"b{i}.json", recs)
        os.utime(p, (1_000_000_000 + i * 100,) * 2)

    read_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("grp", T.StringType()),
            T.StructField("val", T.LongType()),
            T.StructField("v", T.ArrayType(T.FloatType())),
        ]
    )
    versions: list[int] = []

    def _sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        t.insert_df(batch_df, upsert=True)
        versions.append(mv.refresh(force_incremental=True))

    q = (
        spark.readStream.schema(read_schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(versions) == 3 and versions == sorted(set(versions)), versions
    assert mv.version() == t._load_meta()["version"]

    twin = IncrementalTopKView(
        t, str(tmp_path / "twin"), ["grp"], "val", k=2, slack=1
    )
    twin.full_build()

    def served(m):
        return {
            (r["grp"], r["rank"]): (r["id"], r["val"])
            for r in m.df().collect()
        }

    got = served(mv)
    assert got == served(twin)
    # the lowered leader really left the board: g1's top-2 after the
    # final batch is (16, 160), (13, 130) — id 19 demoted
    assert got[("g1", 1)] == (16, 160)
    assert got[("g1", 2)] == (13, 130)


def test_stream_quantile_and_stats_views_advance_per_batch(spark, tmp_path):
    """Streaming percentile + mean/variance dashboards: three
    micro-batches upsert into an engine table while ONE foreachBatch
    sink advances an IncrementalQuantileView AND a second-moment
    IncrementalAggView per batch — including a final batch that pushes
    one value OUT of the HDR domain (negative → NULL bucket) and NULLs
    another (n_rows keeps counting it, n_val and both moments
    retract). Final state must equal from-scratch twins, bitwise."""
    from vectordb_spark.operators.matview import (
        IncrementalAggView,
        IncrementalQuantileView,
    )
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.table import Table

    schema = TableSchema(
        name="st_qs",
        fields=[
            FieldSchema(name="id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="grp", field_type=FieldType.STRING),
            FieldSchema(name="val", field_type=FieldType.INT8),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, str(tmp_path / "st_qs"))
    t._init_storage()
    qv = IncrementalQuantileView(
        t, str(tmp_path / "qv"), ["grp"], "val", quantiles=(0.5, 0.9)
    )
    qv.full_build()
    sv = IncrementalAggView(
        t, str(tmp_path / "sv"), ["grp"], "val",
        aggs=("count", "sum", "sumsq"),
    )
    sv.full_build()

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [
            {"id": i, "grp": f"g{i % 2}", "val": 100 + 7 * i, "v": [0.0, 0.0]}
            for i in range(12)
        ],
        [
            {"id": i, "grp": f"g{i % 2}", "val": 5000 + i, "v": [0.0, 0.0]}
            for i in range(12, 20)
        ],
        # id 0 leaves the HDR domain (NULL bucket, rank-excluded);
        # id 1's value becomes NULL (moments retract, n_rows stays)
        [
            {"id": 0, "grp": "g0", "val": -3, "v": [0.0, 0.0]},
            {"id": 1, "grp": "g1", "val": None, "v": [0.0, 0.0]},
        ],
    ]
    for i, recs in enumerate(batches):
        p = str(src / f"b{i}.json")
        _write_batch(str(src), f"b{i}.json", recs)
        os.utime(p, (1_000_000_000 + i * 100,) * 2)

    read_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("grp", T.StringType()),
            T.StructField("val", T.LongType()),
            T.StructField("v", T.ArrayType(T.FloatType())),
        ]
    )
    advances: list[tuple] = []

    def _sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        t.insert_df(batch_df, upsert=True)
        advances.append(
            (qv.refresh(force_incremental=True),
             sv.refresh(force_incremental=True))
        )

    q = (
        spark.readStream.schema(read_schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(advances) == 3 and advances == sorted(set(advances)), advances
    live = t._load_meta()["version"]
    assert qv.version() == live and sv.version() == live

    qtwin = IncrementalQuantileView(
        t, str(tmp_path / "qtwin"), ["grp"], "val", quantiles=(0.5, 0.9)
    )
    qtwin.full_build()
    stwin = IncrementalAggView(
        t, str(tmp_path / "stwin"), ["grp"], "val",
        aggs=("count", "sum", "sumsq"),
    )
    stwin.full_build()

    def qserved(m):
        return {
            r["grp"]: (r["n"], r["est_p50"], r["est_p90"])
            for r in m.df().collect()
        }

    def sserved(m):
        return {
            r["grp"]: (
                r["n_rows"], r["n_val"], r["avg"],
                r["var_pop"], r["stddev_pop"],
            )
            for r in m.stats_df().collect()
        }

    assert qserved(qv) == qserved(qtwin)
    got = sserved(sv)
    assert got == sserved(stwin)
    # g1 still counts id 1's row (10 rows) but only 9 live values
    assert got["g1"][0] == 10 and got["g1"][1] == 9
    # ranks exclude id 0's out-of-domain value but its row is counted
    qg0 = qserved(qv)["g0"]
    assert qg0[0] == 9


def test_stream_rollup_view_advances_per_batch(spark, tmp_path):
    """Streaming continuous aggregate: micro-batches upsert into an
    engine table while the foreachBatch sink advances an
    IncrementalRollupView per batch — batch 2 is LATE DATA into an old
    bucket, batch 3 is a timestamp CORRECTION that moves an event
    across a bucket boundary. Final state equals a from-scratch twin."""
    from vectordb_spark.operators.matview import IncrementalRollupView
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.table import Table

    schema = TableSchema(
        name="st_rollup",
        fields=[
            FieldSchema(name="id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="ts", field_type=FieldType.INT8),
            FieldSchema(name="typ", field_type=FieldType.STRING),
            FieldSchema(name="val", field_type=FieldType.INT8),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, str(tmp_path / "st_rollup"))
    t._init_storage()
    hour = 3_600_000_000_000
    base = 500_000 * hour  # 1.8e18 ns, hour-aligned
    mv = IncrementalRollupView(
        t, str(tmp_path / "mv"), "ts", hour, ["typ"], "val"
    )
    mv.full_build()

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [
            {"id": i, "ts": base + (i % 2) * hour + i, "typ": "a",
             "val": i, "v": [0.0, 0.0]}
            for i in range(8)
        ],
        # late data: lands in the FIRST bucket long after batch 0
        [
            {"id": 100, "ts": base + 99, "typ": "a", "val": 50,
             "v": [0.0, 0.0]}
        ],
        # correction: id 0 moves up two buckets (pre-image retracts)
        [
            {"id": 0, "ts": base + 2 * hour, "typ": "a", "val": 7,
             "v": [0.0, 0.0]}
        ],
    ]
    for i, recs in enumerate(batches):
        p = str(src / f"b{i}.json")
        _write_batch(str(src), f"b{i}.json", recs)
        os.utime(p, (1_000_000_000 + i * 100,) * 2)

    read_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("typ", T.StringType()),
            T.StructField("val", T.LongType()),
            T.StructField("v", T.ArrayType(T.FloatType())),
        ]
    )
    versions: list[int] = []

    def _sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        t.insert_df(batch_df, upsert=True)
        versions.append(mv.refresh(force_incremental=True))

    q = (
        spark.readStream.schema(read_schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(versions) == 3 and versions == sorted(set(versions)), versions
    assert mv.version() == t._load_meta()["version"]

    twin = IncrementalRollupView(
        t, str(tmp_path / "twin"), "ts", hour, ["typ"], "val"
    )
    twin.full_build()

    def served(m):
        return {
            r["_bucket_start_ns"]: (r["n_rows"], float(r["_sum_dec"]))
            for r in m.df().collect()
        }

    got = served(mv)
    assert got == served(twin)
    # bucket 0: ids 2,4,6 + late id 100 (id 0 moved away)
    assert got[base] == (4, 2.0 + 4 + 6 + 50)
    # bucket 2 exists only through the correction
    assert got[base + 2 * hour] == (1, 7.0)
