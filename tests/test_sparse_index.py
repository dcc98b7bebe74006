"""Sparse inverted index: dim-pruned postings + norms sidecar must give
EXACT KNN (the index prunes, never approximates) — equality against the
brute-force search_df for all three metrics, including the void-doc
edge cases (docs sharing no query dim that still belong in the top-k).
"""

from __future__ import annotations

import pytest

from vectordb_spark.catalog import Warehouse


def _schema(metric: str) -> dict:
    return {
        "name": f"sv_{metric.lower()}",
        "fields": [
            {"name": "ID", "dataType": "INT", "primaryKey": True},
            {
                "name": "Vec",
                "dataType": "SPARSE_VECTOR_FLOAT",
                "dimensions": 1000,
                "metricType": metric,
            },
        ],
    }


def _vec(i: int) -> dict:
    # 3 nonzero dims spread over the 1000-dim space; values vary, and
    # every 7th doc uses a disjoint dim range (void candidates for
    # most queries). Doc 13 gets a tiny norm (the L2 void winner).
    if i == 13:
        return {"indices": [990], "values": [0.01]}
    base = (i * 37) % 500 if i % 7 else 500 + (i % 90)
    return {
        "indices": [base, base + 101, base + 303],
        "values": [1.0 + (i % 5) * 0.25, 0.5 + (i % 3) * 0.5, 0.25 + (i % 4)],
    }


@pytest.fixture(params=["EUCLIDEAN", "DOT_PRODUCT", "COSINE"])
def table(spark, tmp_path, request):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = wh.load_db("svdb").create_table(_schema(request.param))
    t.insert([{"ID": i, "Vec": _vec(i)} for i in range(150)])
    return t


Q = {"indices": [45, 146, 348, 700], "values": [1.0, 0.5, 0.25, 2.0]}


def _ids(df):
    return [(r["ID"], r["_distance"]) for r in df.collect()]


def test_indexed_equals_bruteforce(table):
    table.rebuild_sparse_index("Vec", buckets=16)
    for q in (Q, {"indices": [990], "values": [1.0]},
              {"indices": [999], "values": [1.0]}):  # 999: PURE void query
        exact = _ids(table.search_df(q, limit=10))
        got = _ids(table.search_sparse_indexed_df(q, limit=10))
        assert got == exact, q


def test_indexed_tail_and_filter(table):
    table.rebuild_sparse_index("Vec", buckets=16)
    table.insert([{"ID": 900 + i, "Vec": _vec(i)} for i in range(20)])
    exact = _ids(table.search_df(Q, limit=12))
    got = _ids(table.search_sparse_indexed_df(Q, limit=12))
    assert got == exact
    exact_f = _ids(table.search_df(Q, limit=12, filter="ID % 2 = 0"))
    got_f = _ids(table.search_sparse_indexed_df(Q, limit=12, filter="ID % 2 = 0"))
    assert got_f == exact_f


def test_indexed_after_delete(table):
    table.rebuild_sparse_index("Vec", buckets=16)
    table.delete(primary_keys=[13] + list(range(0, 60, 3)))
    exact = _ids(table.search_df(Q, limit=10))
    got = _ids(table.search_sparse_indexed_df(Q, limit=10))
    assert got == exact


def test_posting_pruning_in_plan(table):
    table.rebuild_sparse_index("Vec", buckets=16)
    plan = (
        table.search_sparse_indexed_df(Q, limit=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_db" in plan  # PartitionFilters on the dim bucket


def test_vacuum_reclaims_sparse_versions(table):
    import os

    table.rebuild_sparse_index("Vec", buckets=16)
    table.rebuild_sparse_index("Vec", buckets=16)
    table.vacuum(grace_seconds=0)
    left = {d for d in os.listdir(table.path) if d.startswith("sparseindex_")}
    assert left == {"sparseindex_Vec_v2", "sparseindex_Vec_v2_norms"}
    assert table.search_sparse_indexed_df(Q, limit=3).count() == 3


def test_delta_refresh_exact_and_lifecycle(table):
    """r12 refresh_sparse_index: the tail lands in immutable delta
    postings + norms dirs (indexed_up_to advances, search reads main +
    deltas), results stay EXACT through a delete + a second tail, and
    vacuum keeps live delta dirs while a full rebuild supersedes
    them."""
    import os

    table.rebuild_sparse_index("Vec", buckets=16)
    table.insert([{"ID": 900 + i, "Vec": _vec(i)} for i in range(20)])
    res = table.refresh_sparse_index("Vec")
    assert res["appendedRecords"] == 20
    info = table._load_meta()["sparse_indexes"]["Vec"]
    assert len(info["deltas"]) == 1 and len(info["norms_deltas"]) == 1
    # refreshed tail is postings-served AND exact (incl. void docs)
    for q in (Q, {"indices": [999], "values": [1.0]}):
        assert _ids(table.search_sparse_indexed_df(q, limit=12)) == _ids(
            table.search_df(q, limit=12)
        )
    # idempotent when nothing new
    assert table.refresh_sparse_index("Vec")["appendedRecords"] == 0
    # delete rows covered by main AND delta dirs, then a live tail
    table.delete(primary_keys=[13, 902, 905])
    table.insert([{"ID": 950 + i, "Vec": _vec(i + 3)} for i in range(5)])
    assert _ids(table.search_sparse_indexed_df(Q, limit=12)) == _ids(
        table.search_df(Q, limit=12)
    )
    # vacuum keeps the live delta dirs...
    table.vacuum(grace_seconds=0)
    left = {d for d in os.listdir(table.path) if d.startswith("sparseindex_")}
    assert {
        "sparseindex_Vec_v1_delta1",
        "sparseindex_Vec_v1_delta1_norms",
    } <= left
    # ...and a full rebuild supersedes them
    table.rebuild_sparse_index("Vec", buckets=16)
    table.vacuum(grace_seconds=0)
    left = {d for d in os.listdir(table.path) if d.startswith("sparseindex_")}
    assert left == {"sparseindex_Vec_v2", "sparseindex_Vec_v2_norms"}
    assert _ids(table.search_sparse_indexed_df(Q, limit=10)) == _ids(
        table.search_df(Q, limit=10)
    )
