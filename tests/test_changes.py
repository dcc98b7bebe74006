"""Version-diff changefeed (Table.changes) — the Delta-CDF-style
incremental surface over the manifest history: inserts/deletes/updates
between two committed versions, rewrite-noise-free across compaction."""

from __future__ import annotations

import pytest

from test_table_api import CITIES_SCHEMA, QV, city_records

from vectordb_spark.catalog import Warehouse
from vectordb_spark.schema import VectorDBError


@pytest.fixture
def cities(spark, tmp_path):
    db = Warehouse(spark, str(tmp_path / "wh")).load_db("cdc")
    table = db.create_table(CITIES_SCHEMA)
    table.insert(city_records())  # v1
    return table


def _by_type(rows):
    out: dict[str, list] = {}
    for r in rows:
        out.setdefault(r["_change_type"], []).append(r)
    return out


def test_append_only_changes_are_inserts(cities):
    recs = city_records()
    cities.insert(
        [{**recs[0], "ID": 10, "Doc": "Tokyo"}, {**recs[1], "ID": 11, "Doc": "Paris"}]
    )  # v2
    ch = cities.changes(1, 2)
    rows = ch.collect()
    assert {r["_change_type"] for r in rows} == {"insert"}
    assert sorted(r["ID"] for r in rows) == [10, 11]
    # file-level pruning: the shared v1 segment never enters the scan
    v1_files = set(cities.df(version=1).inputFiles())
    assert not (set(ch.inputFiles()) & v1_files)


def test_delete_and_update_changes(cities):
    cities.delete(primary_keys=[2])  # v2
    recs = city_records()
    cities.insert([{**recs[0], "Doc": "Berlin-renamed"}], upsert=True)  # v3+
    v_now = cities.versions()[-1]
    by = _by_type(cities.changes(1, v_now).collect())
    assert [r["ID"] for r in by["delete"]] == [2]
    assert by["delete"][0]["Doc"] == "London"  # pre-image
    assert [r["ID"] for r in by["update"]] == [1]
    assert by["update"][0]["Doc"] == "Berlin-renamed"  # post-image
    assert "insert" not in by  # other rows unchanged → absent


def test_same_version_and_compaction_are_empty(cities):
    assert cities.changes(1, 1).count() == 0
    v_pre = cities.versions()[-1]
    cities.compact()
    v_post = cities.versions()[-1]
    assert v_post > v_pre
    # compaction rewrites every row into new dirs; content equality
    # (excluding the reassigned _row_id) must cancel all of it
    assert cities.changes(v_pre, v_post).count() == 0


def test_changes_default_to_current_and_unknown_version(cities):
    recs = city_records()
    cities.insert([{**recs[0], "ID": 42, "Doc": "Oslo"}])
    rows = cities.changes(1).collect()  # v_to defaults to current
    assert [r["ID"] for r in rows] == [42]
    with pytest.raises(VectorDBError):
        cities.changes(99)


def test_changes_on_partitioned_table(spark, tmp_path):
    """Changefeed over a hive-partitioned table exercises the
    per-segment multi-path read route (each dir its own partitioned
    root) on both sides of the diff."""
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.table import Table

    schema = TableSchema(
        name="pcdc",
        fields=[
            FieldSchema(name="id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="etype", field_type=FieldType.STRING),
            FieldSchema(
                name="vec", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, str(tmp_path / "pcdc"), partition_by="etype")
    t._init_storage()
    t.insert(
        [
            {"id": i, "etype": ("click" if i % 2 else "view"), "vec": [float(i), 0.0]}
            for i in range(10)
        ]
    )
    v1 = t.versions()[-1]
    t.insert([{"id": 100, "etype": "click", "vec": [9.0, 9.0]}])
    t.delete(primary_keys=[0])
    by = _by_type(t.changes(v1).collect())
    assert [r["id"] for r in by["insert"]] == [100]
    assert [r["id"] for r in by["delete"]] == [0]
    assert by["delete"][0]["etype"] == "view"
    assert "update" not in by


def test_changes_after_vacuum_raises_cleanly(cities):
    """vacuum() trims manifest history, so a changefeed from a
    reclaimed version must fail as VERSION_NOT_FOUND — never a raw
    path-missing read error (the Delta-CDF retention-bound contract)."""
    cities.delete(primary_keys=[1])  # v2
    cities.vacuum(grace_seconds=0)
    with pytest.raises(VectorDBError):
        cities.changes(1)
