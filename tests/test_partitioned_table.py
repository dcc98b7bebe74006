"""Partitioned table storage: hive-style segment layout so filters on
the partition column prune whole directories (PartitionFilters in the
scan) — the table-level data-skipping lever at 100 TB."""

from __future__ import annotations

import pytest

from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
from vectordb_spark.table import Table


@pytest.fixture()
def ptable(spark, tmp_path):
    schema = TableSchema(
        name="events_p",
        fields=[
            FieldSchema(name="id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="etype", field_type=FieldType.STRING),
            FieldSchema(
                name="vec",
                field_type=FieldType.VECTOR_FLOAT,
                dimension=2,
                metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, str(tmp_path / "events_p"), partition_by="etype")
    t._init_storage()
    recs = [
        {"id": i, "etype": ("click" if i % 2 else "view"), "vec": [float(i), 0.0]}
        for i in range(20)
    ]
    t.insert(recs)
    return t


def test_partition_pruning_in_plan(ptable):
    df = ptable.df().where("etype = 'click'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "etype" in plan.split("PartitionFilters", 1)[1][:200]
    assert df.count() == 10


def test_partitioned_roundtrip_and_append(ptable, spark):
    assert ptable.df().count() == 20
    ptable.insert([{"id": 100, "etype": "click", "vec": [1.0, 1.0]}])
    assert ptable.df().count() == 21
    assert ptable.df().where("etype = 'click'").count() == 11
    # layout survives reopen via the manifest
    t2 = Table(spark, ptable.schema, ptable.path)
    assert t2.partition_by == "etype"
    assert t2.df().count() == 21


def test_partitioned_compact_preserves_layout(ptable):
    ptable.insert([{"id": 200, "etype": "view", "vec": [2.0, 2.0]}])
    ptable.compact()
    df = ptable.df().where("etype = 'view'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert df.count() == 11
