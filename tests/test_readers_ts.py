"""events.ts physical-type compatibility (the round-3 regression):
testdata has shipped the column both as TIMESTAMP(NANOS) (read as
epoch-ns BIGINT via nanosAsLong) and as timestamp[us]/TIMESTAMP_NTZ.
load_table and the ts_ns/ts_us helpers must yield the identical
epoch-ns/µs integers for either storage."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from vectordb_spark.sources.readers import load_table, ts_ns, ts_us

US = [1_700_000_000_000_001, 1_700_000_123_456_789, 1_704_067_199_999_999]


def _write(dirpath, arr, typ):
    os.makedirs(dirpath, exist_ok=True)
    t = pa.table({"event_id": pa.array([1, 2, 3], pa.int64()), "ts": pa.array(arr, typ)})
    pq.write_table(t, os.path.join(dirpath, "events.parquet"))


def test_load_table_normalizes_timestamp_us(spark, tmp_path):
    d = str(tmp_path / "sf_ts")
    _write(d, US, pa.timestamp("us"))
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    got = [r.ts for r in df.orderBy("event_id").collect()]
    assert got == [u * 1000 for u in US]


def test_load_table_passes_through_bigint_ns(spark, tmp_path):
    d = str(tmp_path / "sf_ns")
    _write(d, [u * 1000 for u in US], pa.int64())
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "bigint"
    got = [r.ts for r in df.orderBy("event_id").collect()]
    assert got == [u * 1000 for u in US]


def test_ts_helpers_agree_across_storage(spark, tmp_path):
    d_us = str(tmp_path / "a"); _write(d_us, US, pa.timestamp("us"))
    d_ns = str(tmp_path / "b"); _write(d_ns, [u * 1000 for u in US], pa.int64())
    raw_us = spark.read.parquet(os.path.join(d_us, "events.parquet"))
    raw_ns = spark.read.parquet(os.path.join(d_ns, "events.parquet"))
    for raw in (raw_us, raw_ns):
        ns = [r.v for r in raw.select(ts_ns(raw).alias("v")).orderBy("v").collect()]
        us = [r.v for r in raw.select(ts_us(raw).alias("v")).orderBy("v").collect()]
        assert ns == [u * 1000 for u in US]
        assert us == US


def test_timezone_independence(spark, tmp_path):
    # the NTZ conversion must not shift under a non-UTC session TZ:
    # load_table pins UTC itself
    d = str(tmp_path / "tz"); _write(d, US, pa.timestamp("us"))
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        df = load_table(spark, d, "events")
        got = [r.ts for r in df.orderBy("event_id").collect()]
        assert got == [u * 1000 for u in US]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
