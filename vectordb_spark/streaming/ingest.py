"""Structured Streaming ingestion (SURVEY.md §2.9, S8).

The reference's WAL is durability infrastructure (append log + replay,
wal/write_ahead_log.hpp); in this engine the table manifest subsumes
replay, and *streaming ingest* is the user-facing equivalent: a
``readStream`` source feeding ``foreachBatch`` upserts into a Table.
Each micro-batch commits one manifest version — exactly-once per batch
because the manifest write is atomic and the checkpoint tracks batch
ids.

Also provides the streaming form of the tumbling rollup (w1) with a
watermark for late data — the batch and streaming queries share the
same aggregation shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vectordb_spark.table import Table


def stream_insert(
    table: Table,
    stream_df: DataFrame,
    checkpoint_dir: str,
    *,
    upsert: bool = False,
    trigger_available_now: bool = True,
    output_mode: str = "append",
) -> StreamingQuery:
    """Pipe a streaming DataFrame into a Table via foreachBatch.

    Per-batch semantics match the batch API exactly (PK dedup / upsert
    last-wins inside each micro-batch, then against the table) — the
    reference's WAL-replay ordering guarantee, expressed as micro-batch
    ordering.

    ``output_mode="update"`` + ``upsert=True`` is the aggregated-stream
    merge sink: each micro-batch emits the (key, aggregate) rows it
    changed and the PK upsert folds them into the table — late
    (out-of-order) events update the windows they belong to instead of
    being appended as duplicates.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.insert_df(batch_df, upsert=upsert)

    writer = (
        stream_df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_sink)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_sessionize(
    events: "DataFrame",
    *,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
):
    """Custom stateful streaming operator: per-user session tracking
    via ``applyInPandasWithState`` — the streaming twin of the batch
    sessionization query (queries/windows.py w2_sessionize).

    State per user: (open session start, last event time, event count).
    An event later than ``gap_seconds`` after the last one closes the
    open session and emits it; state timeout (watermark-driven) flushes
    sessions for users that went quiet. Emits rows
    (user_id, session_start_us, session_end_us, n_events).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_start_us", T.LongType()),
            T.StructField("session_end_us", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("count", T.LongType()),
        ]
    )
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        closed: list[tuple[int, int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                s, e, c = state.get
                closed.append((user_id, s, e, c))
                state.remove()
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_us", "session_end_us", "n_events"],
            )
            return
        times: list[int] = []
        for pdf in pdfs:
            times.extend(int(t) for t in pdf["tus"])
        times.sort()
        if state.exists:
            start, last, count = state.get
        else:
            start = last = times[0]
            count = 0
        for t in times:
            if t - last > gap_us:
                closed.append((user_id, start, last, count))
                start, count = t, 0
            last = t
            count += 1
        state.update((start, last, count))
        state.setTimeoutDuration(gap_us // 1000)
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events"],
        )

    from vectordb_spark.sources.readers import ts_us

    with_ts = events.withColumn("tus", ts_us(events))
    if with_ts.isStreaming:
        with_ts = with_ts.withColumn(
            "_event_time", F.timestamp_micros(F.col("tus"))
        ).withWatermark("_event_time", watermark)
    return with_ts.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling (or, with ``slide``, sliding/hopping)
    window counts — works on a streaming OR batch events frame (ts in
    epoch-ns). ``F.window`` assigns each event to window/slide
    overlapping windows; the watermark bounds state for late data on
    streams; on batch frames it is a no-op. Batch twin of the w1/w7
    queries (queries/windows.py)."""
    from vectordb_spark.sources.readers import ts_us

    with_ts = events.withColumn(
        "_event_time", F.timestamp_micros(ts_us(events, ts_col))
    )
    if with_ts.isStreaming:
        with_ts = with_ts.withWatermark("_event_time", watermark)
    win = (
        F.window("_event_time", window, slide)
        if slide
        else F.window("_event_time", window)
    )
    return with_ts.groupBy(win.alias("w"), F.col(key_col)).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        key_col,
        "n_events",
        "min_value",
        "max_value",
    )
