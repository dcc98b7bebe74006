"""Z-order clustering: interleave math, interval bounds, and the
payoff — manifest-level segment skipping on BOTH columns of a
two-column rectangle predicate, which no single-column sort order can
deliver."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vectordb_spark.operators.zorder import z_value_sql, zorder_by
from vectordb_spark.queries.extras import _z_of
from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
from vectordb_spark.table import Table


def test_z_value_matches_python_twin(spark):
    df = spark.range(0, 300).select(
        (F.col("id") % 17).alias("a"),
        (F.col("id") % 13).alias("b"),
        F.expr(z_value_sql("id % 17", "id % 13", 10)).alias("z"),
    )
    for r in df.collect():
        assert r["z"] == _z_of(r["a"], r["b"], 10)


def test_z_monotone_per_axis(spark):
    # spread() is strictly increasing per axis → corner z-values bound
    # every rectangle; spot-check the property the range scan relies on
    for a in range(0, 64, 7):
        for b in range(0, 64, 7):
            assert _z_of(a, b) <= _z_of(a + 1, b)
            assert _z_of(a, b) <= _z_of(a, b + 1)


def test_zorder_by_clusters_both_columns(spark, tmp_path):
    df = spark.range(0, 4000).select(
        F.col("id").alias("rid"),
        (F.col("id") * 37 % 256).alias("a"),
        (F.col("id") * 91 % 256).alias("b"),
    )
    path = str(tmp_path / "zlay")
    zorder_by(df, "a", "b", bits=8, num_files=8).write.parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 4000
    # per-file spans: z-clustered files are tight in BOTH columns —
    # every file's (a, b) bounding box is far smaller than the domain
    import os

    spans = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        part = spark.read.parquet(os.path.join(path, f))
        row = part.agg(
            F.min("a"), F.max("a"), F.min("b"), F.max("b")
        ).head()
        spans.append((row[1] - row[0]) * (row[3] - row[2]))
    assert len(spans) >= 4
    # mean bounding-box area well under the full 256x256 domain
    assert sum(spans) / len(spans) < 256 * 256 / 2


def test_rewrite_zorder_prunes_rectangle(spark, tmp_path):
    """Table.rewrite_zorder: z-clustered segments make the ORDINARY
    per-column min/max stats tight in BOTH columns, so a plain
    two-column rectangle filter skips segment dirs driver-side —
    no z column stored, no query-side change."""
    schema = TableSchema(
        name="zseg",
        fields=[
            FieldSchema(name="rid", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="a", field_type=FieldType.INT8),
            FieldSchema(name="b", field_type=FieldType.INT8),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, str(tmp_path / "zseg"))
    t._init_storage()
    rows = [
        {
            "rid": rid,
            # decoupled axes: rid mod 256 x a bit-shuffled high part —
            # the image covers the plane, not a 1-D line through it
            "a": rid % 256,
            "b": ((rid * 7919) // 128) % 256,
            "v": [float(rid % 7), 0.0],
        }
        for rid in range(2000)
    ]
    # ingest in rid order (worst case: every segment spans both domains)
    for i in range(0, len(rows), 250):
        t.insert(rows[i : i + 250])

    rect = "a >= 32 AND a <= 63 AND b >= 96 AND b <= 127"
    from tests.test_pruning import _seg_files

    before = _seg_files(t, t.scan_df(rect))
    assert len(before) == 8  # rid-ordered layout: nothing prunes

    res = t.rewrite_zorder(("a", "b"), segments=8, bits=8)
    assert res["segmentsAfter"] >= 4

    df = t.scan_df(rect)
    touched = _seg_files(t, df)
    assert len(touched) < res["segmentsAfter"], touched
    got = sorted(r["rid"] for r in df.collect())
    want = sorted(
        r["rid"] for r in rows if 32 <= r["a"] <= 63 and 96 <= r["b"] <= 127
    )
    assert got == want and len(want) > 0
    # the rewrite is row-preserving and time-travel keeps the old layout
    assert t.df().count() == 2000


def test_z_value_column_matches_sql_expr(spark):
    """The Column-composed z_value (no private JVM handles) must agree
    with the SQL-string twin the oracle runs."""
    from pyspark.sql import functions as F

    from vectordb_spark.operators.zorder import z_value, z_value_sql

    df = spark.range(500).select(
        (F.col("id") % 37).alias("a"), ((F.col("id") * 13) % 53).alias("b")
    )
    out = df.select(
        z_value("a", "b", bits=8).alias("zc"),
        F.expr(z_value_sql("a", "b", bits=8)).alias("zs"),
    )
    assert out.where(F.col("zc") != F.col("zs")).count() == 0
