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


def test_numeric_partition_values_keep_declared_type(spark, tmp_path):
    # hive partition values are directory names; Spark's partition type
    # inference would read numeric-looking STRING values back as INT,
    # drifting from the declared schema (and two segments could even
    # infer different types and break the unionByName read)
    schema = TableSchema(
        name="docs_p",
        fields=[
            FieldSchema(name="id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="shard", field_type=FieldType.STRING),
            FieldSchema(
                name="vec",
                field_type=FieldType.VECTOR_FLOAT,
                dimension=2,
                metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, str(tmp_path / "docs_p"), partition_by="shard")
    t._init_storage()
    t.insert(
        [
            {"id": 1, "shard": "001", "vec": [0.0, 0.0]},
            {"id": 2, "shard": "2", "vec": [0.0, 0.0]},
        ]
    )
    t.insert([{"id": 3, "shard": "0042", "vec": [0.0, 0.0]}])  # second segment
    df = t.df()
    assert dict(df.dtypes)["shard"] == "string"
    got = {r.id: r.shard for r in df.collect()}
    # the explicit-schema read (_read_segments) makes Spark parse the
    # partition directory value AS the declared string type — no lossy
    # int inference in between — so '001' and '0042' round-trip intact
    assert got == {1: "001", 2: "2", 3: "0042"}


def test_reopen_without_manifest_key_stays_unpartitioned(spark, tmp_path):
    # an existing manifest that lacks partition_by means the table IS
    # unpartitioned — a constructor argument on reopen must not
    # introduce a mixed flat/hive layout
    schema = TableSchema(
        name="plain",
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
    t = Table(spark, schema, str(tmp_path / "plain"))
    t._init_storage()
    meta = t._load_meta()
    meta.pop("partition_by", None)  # simulate an older-format manifest
    t._save_meta(meta)
    t.insert([{"id": 1, "etype": "a", "vec": [0.0, 0.0]}])
    t2 = Table(spark, schema, str(tmp_path / "plain"), partition_by="etype")
    assert t2.partition_by is None
    t2.insert([{"id": 2, "etype": "b", "vec": [0.0, 0.0]}])
    assert t2.df().count() == 2


def test_clustered_compact_probe_prunes_partitions(spark, tmp_path):
    # compact(cluster_by=vec): the OPTIMIZE-style rewrite — IVF probe
    # lists become PartitionFilters on the BASE scan (file pruning, no
    # index dir join-back), appends self-assign their cluster from the
    # persisted centroids, and probe search agrees with exact
    import numpy as np

    from pyspark.sql import functions as F

    rng = np.random.RandomState(0)
    centers = rng.standard_normal((8, 8)) * 10.0
    schema = TableSchema(
        name="clustered",
        fields=[
            FieldSchema(name="id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(
                name="vec",
                field_type=FieldType.VECTOR_FLOAT,
                dimension=8,
                metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, str(tmp_path / "clustered"))
    t._init_storage()
    recs = []
    rid = 0
    for c in range(8):
        for p in centers[c] + rng.standard_normal((40, 8)) * 0.3:
            recs.append({"id": rid, "vec": [float(x) for x in p]})
            rid += 1
    t.insert(recs)
    res = t.compact(cluster_by="vec", k=8, seed=42)
    assert res["segmentsAfter"] == 1
    assert t.partition_by == "_cluster"

    qv = [float(x) for x in centers[3] + rng.standard_normal(8) * 0.3]
    probed = t.search_clustered_df(qv, limit=5, nprobe=2)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "_cluster" in plan.split("PartitionFilters", 1)[1][:200]
    exact = t.search_df(qv, limit=5)
    got = [r.id for r in probed.collect()]
    want = [r.id for r in exact.collect()]
    assert got == want  # well-separated blobs: probe recall is exact

    # appended rows self-assign: the segment lands partitioned and a
    # reopened handle still probes them
    t.insert([{"id": 9000, "vec": [float(x) for x in centers[3]]}])
    t2 = Table(spark, schema, t.path)
    assert t2.partition_by == "_cluster"
    hit = t2.search_clustered_df([float(x) for x in centers[3]], limit=1, nprobe=1)
    assert [r.id for r in hit.collect()] == [9000]
    # every segment carries the hive _cluster layout
    assert t2.df().where(F.col("_cluster").isNull()).count() == 0


def test_partitioned_compact_preserves_layout(ptable):
    ptable.insert([{"id": 200, "etype": "view", "vec": [2.0, 2.0]}])
    ptable.compact()
    df = ptable.df().where("etype = 'view'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert df.count() == 11


def test_time_travel_across_clustered_compact(spark, tmp_path):
    # versions before a compact(cluster_by=...) reference FLAT segment
    # dirs; the partitioned-read path must not try to read them as
    # hive roots (and their schema has no _cluster column)
    import numpy as np

    rng = np.random.RandomState(1)
    schema = TableSchema(
        name="ttc",
        fields=[
            FieldSchema(name="id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(
                name="vec",
                field_type=FieldType.VECTOR_FLOAT,
                dimension=4,
                metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, str(tmp_path / "ttc"))
    t._init_storage()
    t.insert(
        [
            {"id": i, "vec": [float(x) for x in rng.standard_normal(4)]}
            for i in range(50)
        ]
    )
    v_flat = t.versions()[-1]
    t.insert([{"id": 100, "vec": [0.0, 0.0, 0.0, 0.0]}])  # second flat segment
    v_flat2 = t.versions()[-1]
    t.compact(cluster_by="vec", k=4, seed=1)
    assert t.partition_by == "_cluster"
    # current clustered snapshot
    assert t.df().count() == 51
    # pre-compact versions read back flat, without _cluster, full counts
    old1 = t.df(version=v_flat)
    assert old1.count() == 50 and "_cluster" not in old1.columns
    old2 = t.df(version=v_flat2)
    assert old2.count() == 51 and "_cluster" not in old2.columns
    # appends after the clustered compact still merge with time travel
    t.insert([{"id": 200, "vec": [1.0, 1.0, 1.0, 1.0]}])
    assert t.df().count() == 52
    assert t.df(version=v_flat).count() == 50


def test_clustered_compact_lloyd_trainer(spark, tmp_path):
    """compact(cluster_by=..., train='lloyd'): the replayable trainer
    drives the BASE layout — manifest records the trainer, probe search
    still prunes partitions and agrees with exact, and an appended row
    self-assigns against the Lloyd centroids."""
    import numpy as np

    rng = np.random.RandomState(5)
    centers = rng.standard_normal((4, 8)) * 10.0
    schema = TableSchema(
        name="cl_lloyd",
        fields=[
            FieldSchema(name="id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(
                name="vec", field_type=FieldType.VECTOR_FLOAT,
                dimension=8, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, str(tmp_path / "cl_lloyd"))
    t._init_storage()
    recs = []
    rid = 0
    for c in range(4):
        for p in centers[c] + rng.standard_normal((30, 8)) * 0.3:
            recs.append({"id": rid, "vec": [float(x) for x in p]})
            rid += 1
    t.insert(recs)
    t.compact(cluster_by="vec", k=4, train="lloyd", rounds=2)
    layout = t._load_meta()["cluster_layout"]
    assert layout["train"] == "lloyd" and layout["rounds"] == 2
    qv = [float(x) for x in centers[2]]
    probed = t.search_clustered_df(qv, limit=5, nprobe=2)
    exact = t.search_df(qv, limit=5)
    assert [r.id for r in probed.collect()] == [r.id for r in exact.collect()]
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # bad trainer name is a typed error
    import pytest as _pytest

    from vectordb_spark.schema import VectorDBError
    with _pytest.raises(VectorDBError, match="trainer"):
        t.compact(cluster_by="vec", train="adam")
