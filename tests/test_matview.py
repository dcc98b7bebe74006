"""Incremental materialized views: delta algebra (insert/delete/
update retraction), group drop-out, no-op refresh, multi-step refresh
chains, and the changefeed pre-image form they consume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_spark.operators.matview import IncrementalAggView
from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
from vectordb_spark.table import Table


@pytest.fixture
def t(spark, tmp_path):
    schema = TableSchema(
        name="mv_src",
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
    t = Table(spark, schema, str(tmp_path / "mv_src"))
    t._init_storage()
    t.insert(
        [
            {"id": i, "grp": "ab"[i % 2], "val": 10 * i, "v": [0.0, 0.0]}
            for i in range(10)
        ]
    )
    return t


def _rows(mv):
    return {
        r["grp"]: (r["n_rows"], float(r["_sum_dec"]))
        for r in mv.df().collect()
    }


def test_changes_update_preimages(t):
    v1 = t._load_meta()["version"]
    t.insert([{"id": 3, "grp": "b", "val": 999, "v": [0.0, 0.0]}], upsert=True)
    ch = {
        (r["id"], r["_change_type"]): r["val"]
        for r in t.changes(v1, update_preimages=True).collect()
    }
    assert ch == {(3, "update_pre"): 30, (3, "update_post"): 999}
    # default form unchanged: single post-image 'update' row
    default = t.changes(v1).collect()
    assert [(r["id"], r["_change_type"], r["val"]) for r in default] == [
        (3, "update", 999)
    ]


def test_refresh_matches_full_rebuild(t, tmp_path):
    mv = IncrementalAggView(t, str(tmp_path / "mv"), ["grp"], "val")
    mv.full_build()
    base = _rows(mv)
    assert base == {"a": (5, 200.0), "b": (5, 250.0)}

    t.insert([{"id": 100, "grp": "a", "val": 7, "v": [0.0, 0.0]}])
    t.delete(primary_keys=[1, 3])  # grp b, vals 10 + 30
    t.insert([{"id": 5, "grp": "b", "val": 1000, "v": [0.0, 0.0]}], upsert=True)
    v = mv.refresh(force_incremental=True)
    assert v == t._load_meta()["version"]
    got = _rows(mv)
    # full rebuild twin
    mv2 = IncrementalAggView(t, str(tmp_path / "mv2"), ["grp"], "val")
    mv2.full_build()
    assert got == _rows(mv2)
    assert got["a"] == (6, 207.0)
    assert got["b"] == (3, 1160.0)  # 5 - 2 deletes; 250 - 10 - 30 - 50 + 1000


def test_group_drops_at_zero_and_noop_refresh(t, tmp_path):
    mv = IncrementalAggView(t, str(tmp_path / "mv"), ["grp"], "val")
    mv.full_build()
    t.delete(primary_keys=[1, 3, 5, 7, 9])  # all of grp b
    mv.refresh(force_incremental=True)
    assert set(_rows(mv)) == {"a"}
    v = mv.refresh(force_incremental=True)  # no source change: version unchanged, no write
    assert v == t._load_meta()["version"]
    assert set(_rows(mv)) == {"a"}


def test_refresh_chain_across_compact(t, tmp_path):
    mv = IncrementalAggView(t, str(tmp_path / "mv"), ["grp"], "val")
    mv.full_build()
    t.insert([{"id": 200, "grp": "a", "val": 1, "v": [0.0, 0.0]}])
    mv.refresh(force_incremental=True)
    t.compact()  # row-preserving rewrite: empty changefeed
    t.delete(primary_keys=[0])
    mv.refresh(force_incremental=True)
    mv2 = IncrementalAggView(t, str(tmp_path / "mv2"), ["grp"], "val")
    mv2.full_build()
    assert _rows(mv) == _rows(mv2)


def test_refresh_chain_across_compact_and_vacuum(t, tmp_path):
    """compact() + vacuum() between refreshes: the changefeed retention
    contract composes with view maintenance — deltas read only from
    still-live manifest versions (VERDICT r7 #6)."""
    mv = IncrementalAggView(t, str(tmp_path / "mv"), ["grp"], "val")
    mv.full_build()
    t.insert([{"id": 300, "grp": "b", "val": 3, "v": [0.0, 0.0]}])
    mv.refresh(force_incremental=True)
    t.compact()
    t.vacuum(keep_history=1)  # drop pre-compact segment files
    t.insert([{"id": 301, "grp": "a", "val": 5, "v": [0.0, 0.0]}])
    t.delete(primary_keys=[2])
    mv.refresh(force_incremental=True)
    mv2 = IncrementalAggView(t, str(tmp_path / "mv2"), ["grp"], "val")
    mv2.full_build()
    assert _rows(mv) == _rows(mv2)


def test_old_view_dirs_vacuumed(t, tmp_path):
    """Superseded v{N} view dirs are GC'd at commit, keeping
    KEEP_HISTORY=1 (ADVICE r7: dirs accumulated forever)."""
    import os

    mv = IncrementalAggView(t, str(tmp_path / "mv"), ["grp"], "val")
    mv.full_build()
    for i in range(4):
        t.insert([{"id": 400 + i, "grp": "a", "val": i, "v": [0.0, 0.0]}])
        mv.refresh(force_incremental=True)
    dirs = [
        d for d in os.listdir(str(tmp_path / "mv"))
        if d.startswith("v") and d[1:].isdigit()
    ]
    assert len(dirs) <= 1 + IncrementalAggView.KEEP_HISTORY
    # current view still readable and correct
    mv2 = IncrementalAggView(t, str(tmp_path / "mv2"), ["grp"], "val")
    mv2.full_build()
    assert _rows(mv) == _rows(mv2)


def test_null_group_key_merges_not_duplicates(spark, tmp_path):
    """NULL group keys must merge/retract through refresh (the
    name-list full_outer join used null-unsafe equality and duplicated
    the NULL group — ADVICE r7 medium)."""
    schema = TableSchema(
        name="mv_null",
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
    t = Table(spark, schema, str(tmp_path / "mv_null"))
    t._init_storage()
    # NULL group keys enter via the distributed ingest path (the JSON
    # insert validator rejects nulls by reference parity)
    t.insert_df(
        spark.createDataFrame(
            [
                (0, None, 10, [0.0, 0.0]),
                (1, "a", 1, [0.0, 0.0]),
                (2, None, 20, [0.0, 0.0]),
            ],
            "id long, grp string, val long, v array<float>",
        )
    )
    mv = IncrementalAggView(t, str(tmp_path / "mv"), ["grp"], "val")
    mv.full_build()
    t.insert_df(
        spark.createDataFrame(
            [(3, None, 5, [0.0, 0.0])],
            "id long, grp string, val long, v array<float>",
        )
    )
    t.delete(primary_keys=[0])
    mv.refresh(force_incremental=True)
    rows = mv.df().collect()
    null_rows = [r for r in rows if r["grp"] is None]
    assert len(null_rows) == 1, rows  # merged, not duplicated
    assert (null_rows[0]["n_rows"], float(null_rows[0]["_sum_dec"])) == (2, 25.0)
    mv2 = IncrementalAggView(t, str(tmp_path / "mv2"), ["grp"], "val")
    mv2.full_build()
    assert {
        r["grp"]: (r["n_rows"], float(r["_sum_dec"])) for r in rows
    } == {
        r["grp"]: (r["n_rows"], float(r["_sum_dec"])) for r in mv2.df().collect()
    }


# ---------------------------------------------------------------- min/max


def _mm_rows(mv):
    return {
        r["grp"]: (r["n_rows"], r["_min"], r["_max"])
        for r in mv.df().collect()
    }


def test_minmax_insert_only_refresh_is_incremental(t, tmp_path):
    """Insert-only deltas never rescan: extremes merge via
    least/greatest on the delta alone."""
    mv = IncrementalAggView(
        t, str(tmp_path / "mv"), ["grp"], "val", aggs=("count", "min", "max")
    )
    mv.full_build()
    assert _mm_rows(mv) == {"a": (5, 0, 80), "b": (5, 10, 90)}
    t.insert([
        {"id": 500, "grp": "a", "val": -7, "v": [0.0, 0.0]},
        {"id": 501, "grp": "b", "val": 999, "v": [0.0, 0.0]},
    ])
    mv.refresh(force_incremental=True)
    assert _mm_rows(mv) == {"a": (6, -7, 80), "b": (6, 10, 999)}


def test_minmax_delete_inside_range_stays_clean(t, tmp_path):
    """Retracting a value strictly inside (min, max) cannot displace
    either extremum — no rescan, values unchanged."""
    mv = IncrementalAggView(
        t, str(tmp_path / "mv"), ["grp"], "val", aggs=("count", "min", "max")
    )
    mv.full_build()
    t.delete(primary_keys=[4])  # grp a, val 40: 0 < 40 < 80
    mv.refresh(force_incremental=True)
    assert _mm_rows(mv)["a"] == (4, 0, 80)


def test_minmax_delete_of_extremum_rescans_group(t, tmp_path):
    """Deleting the current min (and separately the max) forces the
    group-scoped rescan and surfaces the runner-up."""
    mv = IncrementalAggView(
        t, str(tmp_path / "mv"), ["grp"], "val", aggs=("count", "min", "max")
    )
    mv.full_build()
    t.delete(primary_keys=[0])  # grp a val 0 == min
    mv.refresh(force_incremental=True)
    assert _mm_rows(mv)["a"] == (4, 20, 80)
    t.delete(primary_keys=[8])  # grp a val 80 == max
    mv.refresh(force_incremental=True)
    assert _mm_rows(mv)["a"] == (3, 20, 60)
    # untouched group kept its incremental values throughout
    assert _mm_rows(mv)["b"] == (5, 10, 90)


def test_minmax_tie_on_extremum_rescans_not_stales(t, tmp_path):
    """Two rows share the min; deleting one must KEEP the min (the
    view stores no multiplicity, so ties trigger the rescan)."""
    mv = IncrementalAggView(
        t, str(tmp_path / "mv"), ["grp"], "val", aggs=("count", "min")
    )
    t.insert([{"id": 600, "grp": "a", "val": 0, "v": [0.0, 0.0]}])  # 2nd val=0
    mv.full_build()
    t.delete(primary_keys=[0])  # one of the two val=0 rows
    mv.refresh(force_incremental=True)
    assert {r["grp"]: r["_min"] for r in mv.df().collect()}["a"] == 0


def test_minmax_refresh_matches_full_rebuild_mixed_workload(t, tmp_path):
    """Property twin: inserts + upsert + extremum deletes + a fully
    emptied group, refreshed view == from-scratch rebuild."""
    mv = IncrementalAggView(
        t, str(tmp_path / "mv"), ["grp"], "val",
        aggs=("count", "sum", "min", "max"),
    )
    mv.full_build()
    t.insert([{"id": 700, "grp": "c", "val": 5, "v": [0.0, 0.0]}])
    t.insert([{"id": 9, "grp": "b", "val": -1, "v": [0.0, 0.0]}], upsert=True)
    t.delete(primary_keys=[0, 8])         # grp a min AND max
    t.delete(primary_keys=[700])          # grp c emptied in-window
    mv.refresh(force_incremental=True)
    mv2 = IncrementalAggView(
        t, str(tmp_path / "mv2"), ["grp"], "val",
        aggs=("count", "sum", "min", "max"),
    )
    mv2.full_build()
    def rows(m):
        return {
            r["grp"]: (r["n_rows"], float(r["_sum_dec"]), r["_min"], r["_max"])
            for r in m.df().collect()
        }
    assert rows(mv) == rows(mv2)
    assert "c" not in rows(mv)
    assert rows(mv)["b"][2] == -1  # upsert pre-image 90 retracted, -1 in


def test_refresh_delegates_to_full_build_past_crossover(spark, tmp_path):
    """VERDICT r9 #2: the measured delta≈base/4 wall-clock crossover
    (SCALING.md matview rehearsal) is ENFORCED — a refresh whose
    changefeed bytes reach REBUILD_THRESHOLD of the base delegates to
    full_build(); a small delta stays incremental; force_incremental
    opts out. Pinned by spying on full_build, with a base large enough
    (5k rows) that parquet per-file overhead doesn't distort the byte
    ratio the policy reads."""
    schema = TableSchema(
        name="mv_xover",
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
    t = Table(spark, schema, str(tmp_path / "mv_xover"))
    t._init_storage()
    t.insert_df(
        spark.range(5000).select(
            F.col("id"),
            (F.col("id") % 7).cast("string").alias("grp"),
            (F.col("id") * 3).alias("val"),
            F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("v"),
        )
    )
    mv = IncrementalAggView(t, str(tmp_path / "mv"), ["grp"], "val")
    mv.full_build()
    calls = []
    orig = mv.full_build
    mv.full_build = lambda: (calls.append(1), orig())[1]

    # small delta (3 rows vs 5000): incremental path
    t.insert([
        {"id": 9000 + i, "grp": "0", "val": i, "v": [0.0, 0.0]}
        for i in range(3)
    ])
    mv.refresh()
    assert calls == []

    # massive delta (delete ~half the table → old+new rewritten
    # segments both count toward changefeed bytes): delegates
    t.delete(filter="id < 2500")
    mv.refresh()
    assert calls == [1]

    # same shape with force_incremental: stays on the delta path
    t.delete(filter="id < 4000")
    mv.refresh(force_incremental=True)
    assert calls == [1]

    # and either way the state matches a from-scratch twin
    mv2 = IncrementalAggView(t, str(tmp_path / "mv2"), ["grp"], "val")
    mv2.full_build()
    assert _rows(mv) == _rows(mv2)


def test_unsupported_aggregate_raises_typed_error(t, tmp_path):
    """VERDICT r8 #6: the API enforces the documented boundary — a
    typed error at construction, never a silent wrong answer."""
    from vectordb_spark.operators.matview import UnsupportedAggregateError

    with pytest.raises(UnsupportedAggregateError, match="avg"):
        IncrementalAggView(
            t, str(tmp_path / "mv"), ["grp"], "val", aggs=("count", "avg")
        )
    with pytest.raises(UnsupportedAggregateError):
        IncrementalAggView(
            t, str(tmp_path / "mv"), ["grp"], "val", aggs=("median",)
        )


def test_minmax_null_values_and_null_group_key(spark, tmp_path):
    """MIN/MAX maintenance with NULL VALUES in the tracked column and a
    NULL group key: min/max skip NULLs (so an all-NULL group stores
    NULL extrema), deleting a NULL-valued row is never 'dirty', and
    the NULL group merges null-safely — refreshed view == rebuild."""
    schema = TableSchema(
        name="mv_nv",
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
    t = Table(spark, schema, str(tmp_path / "mv_nv"))
    t._init_storage()
    t.insert_df(
        spark.createDataFrame(
            [
                (0, None, None, [0.0, 0.0]),   # NULL key, NULL value
                (1, "a", 5, [0.0, 0.0]),
                (2, "a", None, [0.0, 0.0]),    # NULL value inside 'a'
                (3, None, 9, [0.0, 0.0]),
            ],
            "id long, grp string, val long, v array<float>",
        )
    )
    mv = IncrementalAggView(
        t, str(tmp_path / "mv"), ["grp"], "val",
        aggs=("count", "min", "max"),
    )
    mv.full_build()
    got0 = {r["grp"]: (r["n_rows"], r["_min"], r["_max"]) for r in mv.df().collect()}
    assert got0 == {None: (2, 9, 9), "a": (2, 5, 5)}
    t.delete(primary_keys=[2])   # NULL-valued row: clean path, extrema keep
    t.delete(primary_keys=[3])   # the NULL group's only real value: rescan
    t.insert_df(
        spark.createDataFrame(
            [(4, None, 1, [0.0, 0.0])],
            "id long, grp string, val long, v array<float>",
        )
    )
    mv.refresh(force_incremental=True)
    mv2 = IncrementalAggView(
        t, str(tmp_path / "mv2"), ["grp"], "val",
        aggs=("count", "min", "max"),
    )
    mv2.full_build()
    def rows(m):
        return {
            r["grp"]: (r["n_rows"], r["_min"], r["_max"])
            for r in m.df().collect()
        }
    assert rows(mv) == rows(mv2) == {None: (2, 1, 1), "a": (1, 5, 5)}


# --------------------------------------------------- join views (r10)


@pytest.fixture
def fact_dim(spark, tmp_path):
    from vectordb_spark.operators.matview import IncrementalJoinAggView

    fschema = TableSchema(
        name="jv_fact",
        fields=[
            FieldSchema(name="oid", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="cid", field_type=FieldType.INT8),
            FieldSchema(name="amount", field_type=FieldType.INT8),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    dschema = TableSchema(
        name="jv_dim",
        fields=[
            FieldSchema(name="ckey", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="region", field_type=FieldType.STRING),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    fact = Table(spark, fschema, str(tmp_path / "jv_fact"))
    fact._init_storage()
    dim = Table(spark, dschema, str(tmp_path / "jv_dim"))
    dim._init_storage()
    # 4 customers over 2 regions, 12 orders (customer 3 has none yet)
    dim.insert(
        [
            {"ckey": c, "region": "ew"[c % 2], "v": [0.0, 0.0]}
            for c in range(4)
        ]
    )
    fact.insert(
        [
            {"oid": i, "cid": i % 3, "amount": 100 + i, "v": [0.0, 0.0]}
            for i in range(12)
        ]
    )
    mv = IncrementalJoinAggView(
        fact, dim, str(tmp_path / "jv_mv"),
        fact_key="cid", dim_key="ckey",
        group_cols=["region"], value_col="amount",
    )
    return fact, dim, mv


def _jrows(mv):
    return {
        r["region"]: (r["n_rows"], float(r["_sum_dec"]))
        for r in mv.df().collect()
    }


def _join_truth(fact, dim):
    f, d = fact.df(), dim.df()
    j = f.join(d, f["cid"] == d["ckey"], "inner")
    return {
        r["region"]: (r["n"], float(r["s"]))
        for r in j.groupBy("region")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s"))
        .collect()
    }


def test_join_view_full_build_and_noop_refresh(fact_dim):
    fact, dim, mv = fact_dim
    vf, vd = mv.full_build()
    assert _jrows(mv) == _join_truth(fact, dim)
    assert mv.refresh() == (vf, vd)  # nothing changed -> no-op


def test_join_view_fact_delta_only(fact_dim):
    fact, dim, mv = fact_dim
    mv.full_build()
    fact.insert([{"oid": 50, "cid": 3, "amount": 1000, "v": [0.0, 0.0]}])
    fact.delete(primary_keys=[0, 4])
    fact.insert([{"oid": 1, "cid": 1, "amount": 9, "v": [0.0, 0.0]}], upsert=True)
    mv.refresh(force_incremental=True)
    assert _jrows(mv) == _join_truth(fact, dim)


def test_join_view_dim_delta_group_migration_and_dropout(fact_dim):
    fact, dim, mv = fact_dim
    mv.full_build()
    # customer 1 moves region e -> w: every one of its orders must
    # migrate groups via the pre-image retraction
    dim.insert([{"ckey": 1, "region": "w", "v": [0.0, 0.0]}], upsert=True)
    # customer 0 disappears entirely: its orders leave the join
    dim.delete(primary_keys=[0])
    mv.refresh(force_incremental=True)
    assert _jrows(mv) == _join_truth(fact, dim)


def test_join_view_both_sides_change_cross_term(fact_dim):
    fact, dim, mv = fact_dim
    mv.full_build()
    # new orders FOR a customer whose dim row also changes in the same
    # window — the DeltaA x DeltaD cross term the algebra folds into
    # DeltaA x D1
    fact.insert(
        [
            {"oid": 60, "cid": 2, "amount": 500, "v": [0.0, 0.0]},
            {"oid": 61, "cid": 0, "amount": 600, "v": [0.0, 0.0]},
        ]
    )
    dim.insert([{"ckey": 2, "region": "e", "v": [0.0, 0.0]}], upsert=True)
    dim.delete(primary_keys=[0])
    fact.delete(primary_keys=[2])
    mv.refresh(force_incremental=True)
    assert _jrows(mv) == _join_truth(fact, dim)
    # refresh chains: mutate again on top of the refreshed state
    fact.insert([{"oid": 70, "cid": 3, "amount": 50, "v": [0.0, 0.0]}])
    dim.insert([{"ckey": 3, "region": "w", "v": [0.0, 0.0]}], upsert=True)
    mv.refresh(force_incremental=True)
    assert _jrows(mv) == _join_truth(fact, dim)


def test_join_view_rejects_minmax(fact_dim):
    from vectordb_spark.operators.matview import (
        IncrementalJoinAggView,
        UnsupportedAggregateError,
    )

    fact, dim, _ = fact_dim
    with pytest.raises(UnsupportedAggregateError):
        IncrementalJoinAggView(
            fact, dim, "/tmp/nope",
            fact_key="cid", dim_key="ckey",
            group_cols=["region"], value_col="amount",
            aggs=("count", "min"),
        )


def test_join_view_small_base_delegates_to_rebuild(fact_dim, monkeypatch):
    # SCALING.md r10: on a small (page-cache-sized) base, rebuild wins
    # wall-clock at EVERY delta size; refresh() self-applies that
    # unless force_incremental opts out.
    fact, dim, mv = fact_dim
    mv.full_build()
    fact.insert([{"oid": 99, "cid": 1, "amount": 5, "v": [0.0, 0.0]}])
    calls = []
    orig = type(mv).full_build

    def _spy(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(type(mv), "full_build", _spy)
    mv.refresh()  # tiny base -> delegation
    assert calls, "small-base refresh must delegate to full_build"
    assert _jrows(mv) == _join_truth(fact, dim)
    # opt-out takes the incremental path
    fact.insert([{"oid": 98, "cid": 2, "amount": 6, "v": [0.0, 0.0]}])
    calls.clear()
    mv.refresh(force_incremental=True)
    assert not calls
    assert _jrows(mv) == _join_truth(fact, dim)


def test_join_view_dir_pruning_is_numeric(fact_dim, spark):
    # version tags must prune by numeric (vf, vd), not string order:
    # lexicographically "v9_3" > "v10_3", which deleted the
    # just-superseded dir (breaking the in-flight-reader guarantee)
    # and leaked the truly old one forever
    import os

    fact, dim, mv = fact_dim
    df = spark.createDataFrame([("e", 1, 1.0)], "region string, n_rows long, _sum_dec double")
    for vf in (9, 10, 11):
        mv._commit(df, vf, 3)
    dirs = sorted(d for d in os.listdir(mv.path) if d.startswith("v"))
    assert dirs == ["v10_3", "v11_3"], dirs


def test_join_view_delta_ratio_crossover(fact_dim, monkeypatch):
    # with the small-base floor disabled, the shared delta>=threshold*
    # base crossover still delegates (threshold 0 -> any delta rebuilds)
    # and stays incremental when the threshold is out of reach
    fact, dim, mv = fact_dim
    mv.full_build()
    monkeypatch.setattr(type(mv), "SMALL_BASE_BYTES", 0)
    calls = []
    orig = type(mv).full_build

    def _spy(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(type(mv), "full_build", _spy)
    monkeypatch.setattr(type(mv), "REBUILD_THRESHOLD", 0.0)
    fact.insert([{"oid": 80, "cid": 1, "amount": 1, "v": [0.0, 0.0]}])
    mv.refresh()
    assert calls, "zero threshold must delegate on any delta"
    calls.clear()
    monkeypatch.setattr(type(mv), "REBUILD_THRESHOLD", 1e9)
    fact.insert([{"oid": 81, "cid": 2, "amount": 2, "v": [0.0, 0.0]}])
    mv.refresh()
    assert not calls, "unreachable threshold must stay incremental"
    assert _jrows(mv) == _join_truth(fact, dim)


# ------------------------------------------- distinct-count views (r10)


def test_distinct_view_exact_under_full_lifecycle(t, tmp_path):
    """COUNT(DISTINCT val) per grp maintained through insert / delete /
    upsert, checked against from-scratch truth after every refresh.
    The fixture's vals are 10*i so deletes remove distinct values and
    the upsert collapses one value onto an existing one."""
    from vectordb_spark.operators.matview import IncrementalDistinctCountView

    dv = IncrementalDistinctCountView(t, str(tmp_path / "dv"), ["grp"], "val")
    dv.full_build()

    def truth():
        return {
            r["grp"]: r["n"]
            for r in t.df()
            .groupBy("grp")
            .agg(F.countDistinct("val").alias("n"))
            .collect()
        }

    def got():
        return {r["grp"]: r["n_distinct"] for r in dv.df().collect()}

    assert got() == truth() == {"a": 5, "b": 5}
    # duplicate value lands in grp a: n_rows grows, distinct does not
    t.insert([{"id": 100, "grp": "a", "val": 20, "v": [0.0, 0.0]}])
    dv.refresh(force_incremental=True)
    assert got() == truth()
    assert got()["a"] == 5
    # delete one of the two val=20 rows: distinct STILL holds (the
    # multiset state knows a copy survives) — the case (group, count)
    # state cannot answer
    t.delete(primary_keys=[2])
    dv.refresh(force_incremental=True)
    assert got() == truth()
    assert got()["a"] == 5
    # delete the second copy too: the value finally leaves
    t.delete(primary_keys=[100])
    dv.refresh(force_incremental=True)
    assert got() == truth()
    assert got()["a"] == 4
    # upsert collapses val 30 onto 50: distinct shrinks by one
    t.insert([{"id": 3, "grp": "b", "val": 50, "v": [0.0, 0.0]}], upsert=True)
    dv.refresh(force_incremental=True)
    assert got() == truth()
    assert dv.version() == t._load_meta()["version"]


def test_distinct_view_null_values_follow_sql_semantics(spark, tmp_path):
    """SQL COUNT(DISTINCT x) excludes NULLs: a NULL value's rows count
    toward n_rows but never toward n_distinct — including through a
    refresh that inserts and then deletes NULL-value rows."""
    from vectordb_spark.operators.matview import IncrementalDistinctCountView

    schema = TableSchema(
        name="dv_null",
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
    t = Table(spark, schema, str(tmp_path / "dv_null"))
    t._init_storage()
    t.insert_df(
        spark.createDataFrame(
            [(0, "a", 1, [0.0, 0.0]), (1, "a", None, [0.0, 0.0]),
             (2, "a", None, [0.0, 0.0]), (3, "b", 5, [0.0, 0.0])],
            "id long, grp string, val long, v array<float>",
        )
    )
    dv = IncrementalDistinctCountView(t, str(tmp_path / "dv"), ["grp"], "val")
    dv.full_build()
    got = {r["grp"]: (r["n_distinct"], r["n_rows"]) for r in dv.df().collect()}
    assert got == {"a": (1, 3), "b": (1, 1)}
    t.delete(primary_keys=[1])  # one NULL copy retracts; one survives
    t.insert_df(
        spark.createDataFrame(
            [(4, "b", None, [0.0, 0.0])],
            "id long, grp string, val long, v array<float>",
        )
    )
    dv.refresh(force_incremental=True)
    got = {r["grp"]: (r["n_distinct"], r["n_rows"]) for r in dv.df().collect()}
    assert got == {"a": (1, 2), "b": (1, 2)}


def test_join_view_binding_validation(fact_dim, tmp_path):
    """r11 (ADVICE r10): group/value columns bind to exactly one side
    at CONSTRUCTION — ambiguous (both schemas) and unknown names raise
    a typed error up front instead of an AMBIGUOUS_REFERENCE deep in
    refresh(), and the one sanctioned both-sides name is the shared
    equi-join key (equal on both sides under the inner join)."""
    from vectordb_spark.operators.matview import (
        IncrementalJoinAggView,
        JoinViewSchemaError,
    )

    fact, dim, _ = fact_dim
    # 'v' exists in BOTH schemas -> ambiguous group col
    with pytest.raises(JoinViewSchemaError, match="BOTH"):
        IncrementalJoinAggView(
            fact, dim, str(tmp_path / "nope1"),
            fact_key="cid", dim_key="ckey",
            group_cols=["v"], value_col="amount",
        )
    # unknown value col
    with pytest.raises(JoinViewSchemaError, match="neither"):
        IncrementalJoinAggView(
            fact, dim, str(tmp_path / "nope2"),
            fact_key="cid", dim_key="ckey",
            group_cols=["region"], value_col="revenue",
        )
    # bad join keys
    with pytest.raises(JoinViewSchemaError, match="fact_key"):
        IncrementalJoinAggView(
            fact, dim, str(tmp_path / "nope3"),
            fact_key="ckey", dim_key="ckey",
            group_cols=["region"], value_col="amount",
        )
    # bindings recorded per declared side
    mv = IncrementalJoinAggView(
        fact, dim, str(tmp_path / "ok"),
        fact_key="cid", dim_key="ckey",
        group_cols=["region"], value_col="amount",
    )
    assert mv._side == {"region": "dim", "amount": "fact"}


def test_join_view_shared_key_name_groups_ok(spark, tmp_path):
    """The shared-name equi-join key is groupable: both sides are equal
    under the inner join, so it binds to the fact and the full
    lifecycle (build -> two-sided mutations -> refresh) stays exact."""
    from vectordb_spark.operators.matview import IncrementalJoinAggView
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.table import Table

    fschema = TableSchema(
        name="sk_fact",
        fields=[
            FieldSchema(name="oid", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="cust", field_type=FieldType.INT8),
            FieldSchema(name="amount", field_type=FieldType.INT8),
            FieldSchema(
                name="fv", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    dschema = TableSchema(
        name="sk_dim",
        fields=[
            FieldSchema(name="cust", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="tier", field_type=FieldType.STRING),
            FieldSchema(
                name="dv", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    fact = Table(spark, fschema, str(tmp_path / "sk_fact"))
    fact._init_storage()
    dim = Table(spark, dschema, str(tmp_path / "sk_dim"))
    dim._init_storage()
    dim.insert([{"cust": c, "tier": "ab"[c % 2], "dv": [0.0, 0.0]} for c in range(3)])
    fact.insert(
        [{"oid": i, "cust": i % 3, "amount": 10 + i, "fv": [0.0, 0.0]}
         for i in range(9)]
    )
    mv = IncrementalJoinAggView(
        fact, dim, str(tmp_path / "sk_mv"),
        fact_key="cust", dim_key="cust",
        group_cols=["cust"], value_col="amount",
    )
    assert mv._side["cust"] == "fact"
    mv.full_build()
    fact.insert([{"oid": 100, "cust": 1, "amount": 500, "fv": [0.0, 0.0]}])
    dim.delete(primary_keys=[0])
    mv.refresh(force_incremental=True)
    f, d = fact.df(), dim.df()
    truth = {
        r["cust"]: (r["n"], float(r["s"]))
        for r in f.join(d, f["cust"] == d["cust"], "inner")
        .groupBy(f["cust"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s"))
        .collect()
    }
    got = {
        r["cust"]: (r["n_rows"], float(r["_sum_dec"]))
        for r in mv.df().collect()
    }
    assert got == truth


def test_join_view_prunes_clustered_fact_segments(spark, tmp_path):
    """r11 (VERDICT r10 #5): on a join-key-clustered fact, the
    A0 JOIN dD term's old-snapshot scan drops every segment whose
    fact_key min/max contains none of the changed dim keys — and the
    pruned refresh stays exact against the from-scratch truth."""
    from vectordb_spark.operators.matview import IncrementalJoinAggView
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.table import Table

    fschema = TableSchema(
        name="pr_fact",
        fields=[
            FieldSchema(name="oid", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="cid", field_type=FieldType.INT8),
            FieldSchema(name="amount", field_type=FieldType.INT8),
            FieldSchema(
                name="fv", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    dschema = TableSchema(
        name="pr_dim",
        fields=[
            FieldSchema(name="ckey", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="region", field_type=FieldType.STRING),
            FieldSchema(
                name="dv", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    fact = Table(spark, fschema, str(tmp_path / "pr_fact"))
    fact._init_storage()
    dim = Table(spark, dschema, str(tmp_path / "pr_dim"))
    dim._init_storage()
    n_keys = 64
    dim.insert(
        [
            {"ckey": c, "region": "nsew"[c % 4], "dv": [0.0, 0.0]}
            for c in range(n_keys)
        ]
    )
    fact.insert(
        [
            {"oid": i, "cid": i % n_keys, "amount": 100 + i,
             "fv": [0.0, 0.0]}
            for i in range(512)
        ]
    )
    # key-clustered layout: the degenerate z-curve over (cid, cid) is
    # a plain cid sort, so the 8 segments carry tight disjoint cid
    # ranges — the "fact clustered on the join key" premise
    fact.rewrite_zorder(("cid", "cid"), segments=8)
    meta = fact._load_meta()
    assert len(meta["files"]) > 2  # genuinely multi-segment
    mv = IncrementalJoinAggView(
        fact, dim, str(tmp_path / "pr_mv"),
        fact_key="cid", dim_key="ckey",
        group_cols=["region"], value_col="amount",
    )
    mv.full_build()
    # one dim key migrates region: the only fact rows the dD term can
    # touch live in the segment(s) covering cid == 5
    dim.insert([{"ckey": 5, "region": "x", "dv": [0.0, 0.0]}], upsert=True)
    mv.refresh(force_incremental=True)
    st = mv.last_refresh_stats
    assert st is not None, "pruned path did not engage"
    assert st["fact0_segments_scanned"] < st["fact0_segments_total"]
    f, d = fact.df(), dim.df()
    truth = {
        r["region"]: (r["n"], float(r["s"]))
        for r in f.join(d, f["cid"] == d["ckey"], "inner")
        .groupBy("region")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s"))
        .collect()
    }
    got = {
        r["region"]: (r["n_rows"], float(r["_sum_dec"]))
        for r in mv.df().collect()
    }
    assert got == truth


def test_join_view_stats_reset_on_fact_only_refresh(spark, tmp_path):
    """ADVICE r11: last_refresh_stats describes THIS refresh only. A
    fact-only refresh never runs the A0 JOIN dD term, so stats left by
    an earlier dim-moving refresh must be cleared, not reported."""
    from vectordb_spark.operators.matview import IncrementalJoinAggView
    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.table import Table

    fschema = TableSchema(
        name="rs_fact",
        fields=[
            FieldSchema(name="oid", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="cid", field_type=FieldType.INT8),
            FieldSchema(name="amount", field_type=FieldType.INT8),
            FieldSchema(
                name="fv", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    dschema = TableSchema(
        name="rs_dim",
        fields=[
            FieldSchema(name="ckey", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="region", field_type=FieldType.STRING),
            FieldSchema(
                name="dv", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    fact = Table(spark, fschema, str(tmp_path / "rs_fact"))
    fact._init_storage()
    dim = Table(spark, dschema, str(tmp_path / "rs_dim"))
    dim._init_storage()
    dim.insert(
        [{"ckey": c, "region": "ns"[c % 2], "dv": [0.0, 0.0]} for c in range(8)]
    )
    fact.insert(
        [
            {"oid": i, "cid": i % 8, "amount": 100 + i, "fv": [0.0, 0.0]}
            for i in range(64)
        ]
    )
    fact.rewrite_zorder(("cid", "cid"), segments=4)
    mv = IncrementalJoinAggView(
        fact, dim, str(tmp_path / "rs_mv"),
        fact_key="cid", dim_key="ckey",
        group_cols=["region"], value_col="amount",
    )
    mv.full_build()
    # dim-moving refresh populates the stats
    dim.insert([{"ckey": 3, "region": "x", "dv": [0.0, 0.0]}], upsert=True)
    mv.refresh(force_incremental=True)
    assert mv.last_refresh_stats is not None
    # fact-only refresh must clear them (pre-fix: stale counts linger)
    fact.insert([{"oid": 900, "cid": 1, "amount": 7, "fv": [0.0, 0.0]}])
    mv.refresh(force_incremental=True)
    assert mv.last_refresh_stats is None


# --------------------------------------------------- incremental TOP-K


def _topk_truth(t, group_cols, order_col, pk_col, k):
    """From-scratch per-group top-k of the CURRENT snapshot."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.col(order_col).desc(), F.col(pk_col).asc()
    )
    rows = (
        t.df()
        .where(F.col(order_col).isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*group_cols, pk_col, order_col, "rank")
        .collect()
    )
    return {
        tuple(r[c] for c in group_cols) + (r["rank"],): (r[pk_col], r[order_col])
        for r in rows
    }


def _topk_rows(mv):
    return {
        tuple(r[c] for c in mv.group_cols) + (r["rank"],): (
            r[mv.pk_col],
            r[mv.order_col],
        )
        for r in mv.df().collect()
    }


@pytest.fixture
def topk(t, tmp_path):
    from vectordb_spark.operators.matview import IncrementalTopKView

    mv = IncrementalTopKView(
        t, str(tmp_path / "mv_topk"), ["grp"], "val", k=2, slack=1
    )
    mv.full_build()
    return t, mv


def test_topk_full_build_matches_from_scratch(topk):
    t, mv = topk
    assert _topk_rows(mv) == _topk_truth(t, ["grp"], "val", "id", 2)
    # 5 rows per group, limit 3 -> state is cut and marked truncated
    st = mv._state_df()
    assert st.count() == 6
    assert st.where(~F.col("_truncated")).count() == 0


def test_topk_insert_only_refresh(topk, monkeypatch):
    t, mv = topk
    from vectordb_spark.table import Table

    rescans = []
    orig = Table.df

    def _spy(self, version=None):
        if version is not None:
            rescans.append(version)
        return orig(self, version)

    monkeypatch.setattr(Table, "df", _spy)
    # one new leader, one below-floor insert (cut, group stays truncated)
    t.insert(
        [
            {"id": 100, "grp": "a", "val": 10_000, "v": [0.0, 0.0]},
            {"id": 101, "grp": "b", "val": -5, "v": [0.0, 0.0]},
        ]
    )
    mv.refresh(force_incremental=True)
    assert not rescans, "insert-only refresh must never read the base"
    assert _topk_rows(mv) == _topk_truth(t, ["grp"], "val", "id", 2)


def test_topk_delete_below_floor_is_free(topk, monkeypatch):
    t, mv = topk
    from vectordb_spark.table import Table

    rescans = []
    orig = Table.df

    def _spy(self, version=None):
        if version is not None:
            rescans.append(version)
        return orig(self, version)

    monkeypatch.setattr(Table, "df", _spy)
    # id=0 (val 0) and id=1 (val 10) are the group minima — far below
    # the kept floor (state keeps vals {40,60,80} / {50,70,90})
    t.delete(primary_keys=[0, 1])
    mv.refresh(force_incremental=True)
    assert not rescans
    assert _topk_rows(mv) == _topk_truth(t, ["grp"], "val", "id", 2)


def test_topk_slack_absorbs_one_delete_then_rescans(topk, monkeypatch):
    t, mv = topk
    from vectordb_spark.table import Table

    rescans = []
    orig = Table.df

    def _spy(self, version=None):
        if version is not None:
            rescans.append(version)
        return orig(self, version)

    monkeypatch.setattr(Table, "df", _spy)
    # group a candidates: ids 8(80) 6(60) 4(40). Killing the leader
    # leaves 2 >= k alive -> slack absorbs it, no base read.
    t.delete(primary_keys=[8])
    mv.refresh(force_incremental=True)
    assert not rescans
    assert _topk_rows(mv) == _topk_truth(t, ["grp"], "val", "id", 2)
    # killing two more drops survivors below k -> dirty -> one rescan
    # that REFILLS from below-floor rows (ids 2, 0)
    t.delete(primary_keys=[6, 4])
    mv.refresh(force_incremental=True)
    assert rescans, "under-k truncated group must rescan the base"
    assert _topk_rows(mv) == _topk_truth(t, ["grp"], "val", "id", 2)


def test_topk_upsert_moves_row_across_groups(topk):
    t, mv = topk
    # id=9 was group b's leader (val 90); it moves to group a with a
    # mid value — b must refill, a must re-rank
    t.insert(
        [{"id": 9, "grp": "a", "val": 55, "v": [0.0, 0.0]}], upsert=True
    )
    mv.refresh(force_incremental=True)
    assert _topk_rows(mv) == _topk_truth(t, ["grp"], "val", "id", 2)


def test_topk_group_dropout_and_noop_refresh(topk):
    t, mv = topk
    t.delete(primary_keys=[1, 3, 5, 7, 9])  # all of group b
    mv.refresh(force_incremental=True)
    got = _topk_rows(mv)
    assert got == _topk_truth(t, ["grp"], "val", "id", 2)
    assert {k[0] for k in got} == {"a"}
    v = mv.version()
    assert mv.refresh(force_incremental=True) == v  # no-op


def test_topk_refresh_chain_matches_rebuild(t, tmp_path):
    from vectordb_spark.operators.matview import IncrementalTopKView

    mv = IncrementalTopKView(
        t, str(tmp_path / "mv_topk_chain"), ["grp"], "val", k=3, slack=2
    )
    mv.full_build()
    t.insert(
        [
            {"id": 20 + i, "grp": "ab"[i % 2], "val": 35 + i, "v": [0.0, 0.0]}
            for i in range(6)
        ]
    )
    mv.refresh(force_incremental=True)
    t.delete(primary_keys=[8, 9, 24])
    mv.refresh(force_incremental=True)
    t.insert([{"id": 4, "grp": "a", "val": -1, "v": [0.0, 0.0]}], upsert=True)
    mv.refresh(force_incremental=True)
    truth = IncrementalTopKView(
        t, str(tmp_path / "mv_topk_truth"), ["grp"], "val", k=3, slack=2
    )
    truth.full_build()
    assert _topk_rows(mv) == _topk_rows(truth)
    assert _topk_rows(mv) == _topk_truth(t, ["grp"], "val", "id", 3)


def test_topk_null_order_and_null_group(spark, tmp_path):
    from vectordb_spark.operators.matview import IncrementalTopKView

    schema = TableSchema(
        name="mv_topk_nulls",
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
    t = Table(spark, schema, str(tmp_path / "mv_topk_nulls"))
    t._init_storage()
    # NULLs enter via the distributed ingest path (the JSON insert
    # validator rejects nulls by reference parity)
    t.insert_df(
        spark.createDataFrame(
            [
                (0, None, 5, [0.0, 0.0]),
                (1, None, 7, [0.0, 0.0]),
                (2, "a", None, [0.0, 0.0]),
                (3, "a", 1, [0.0, 0.0]),
            ],
            "id long, grp string, val long, v array<float>",
        )
    )
    mv = IncrementalTopKView(
        t, str(tmp_path / "mv_topk_nulls_v"), ["grp"], "val", k=1, slack=0
    )
    mv.full_build()
    got = _topk_rows(mv)
    # NULL group is a real group (leader id=1); NULL val never ranks
    assert got == {(None, 1): (1, 7), ("a", 1): (3, 1)}
    # NULL-val row deleted + NULL-group leader deleted: both handled
    t.delete(primary_keys=[1, 2])
    mv.refresh(force_incremental=True)
    assert _topk_rows(mv) == {(None, 1): (0, 5), ("a", 1): (3, 1)}


def test_topk_rejects_bad_construction(t, tmp_path):
    from vectordb_spark.operators.matview import (
        IncrementalTopKView,
        JoinViewSchemaError,
    )

    with pytest.raises(ValueError):
        IncrementalTopKView(t, str(tmp_path / "x1"), ["grp"], "val", k=0)
    with pytest.raises(JoinViewSchemaError):
        IncrementalTopKView(t, str(tmp_path / "x2"), ["grp"], "id", k=2)


def test_topk_crossover_delegates_to_full_build(topk, monkeypatch):
    from vectordb_spark.operators.matview import IncrementalTopKView

    t, mv = topk
    calls = []
    orig = IncrementalTopKView.full_build

    def _spy(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(IncrementalTopKView, "full_build", _spy)
    # fixture-sized delta vs fixture-sized base -> ratio over threshold
    t.insert(
        [
            {"id": 200 + i, "grp": "ab"[i % 2], "val": i, "v": [0.0, 0.0]}
            for i in range(10)
        ]
    )
    mv.refresh()
    assert calls, "large delta must delegate to full_build"
    assert _topk_rows(mv) == _topk_truth(t, ["grp"], "val", "id", 2)


def test_topk_lowering_upsert_below_floor_rescans(topk, monkeypatch):
    """The floor-tracking regression (found building the operator): a
    value-LOWERING upsert re-admits its post-image below the cut-time
    floor. With k=2/slack=1 the group still has k alive candidates, so
    a survivor-count dirty test would serve the lowered row — but the
    state-absent row id=2 (val 20) outranks it. The floor-aware test
    must flag the group dirty and refill from base."""
    t, mv = topk
    from vectordb_spark.table import Table

    rescans = []
    orig = Table.df

    def _spy(self, version=None):
        if version is not None:
            rescans.append(version)
        return orig(self, version)

    monkeypatch.setattr(Table, "df", _spy)
    # group a candidates: ids 8(80) 6(60) 4(40), floor = (40, pk 4).
    # kill the leader (slack absorbs), then lower id=6 below the floor
    t.delete(primary_keys=[8])
    mv.refresh(force_incremental=True)
    assert not rescans
    t.insert([{"id": 6, "grp": "a", "val": 5, "v": [0.0, 0.0]}], upsert=True)
    mv.refresh(force_incremental=True)
    assert rescans, "below-floor survivors must not satisfy the k quota"
    got = _topk_rows(mv)
    assert got == _topk_truth(t, ["grp"], "val", "id", 2)
    assert got[("a", 2)] == (2, 20), "absent row must refill rank 2"


def test_topk_cut_plans_map_side_group_limit(topk):
    """full_build's ranking pass must plan WindowGroupLimit BEFORE the
    exchange (map-side partial top-(limit+1)) — the property that
    keeps the rebuild path linear at 100 TB. A count() in the same
    window would silence the rule; the two-stage _cut exists to keep
    it firing."""
    t, mv = topk
    plan = mv._cut(t.df())._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    exch = next(i for i, l in enumerate(lines) if "Exchange" in l)
    assert any("WindowGroupLimit" in l for l in lines[exch:]), plan


# ------------------------------------------------ incremental quantiles


def _q_truth_py(pairs, quantiles):
    """Nearest-rank HDR-grid quantiles computed in pure Python from
    (grp, val) pairs — the absolute semantics the view must serve."""
    import math
    from collections import defaultdict

    from vectordb_spark.operators.sketch import hdr_bucket_lb_py

    by_grp = defaultdict(list)
    for g, v in pairs:
        if v is not None and 0 <= v < (1 << 53):
            by_grp[g].append(hdr_bucket_lb_py(int(v))[1])
    out = {}
    for g, lbs in by_grp.items():
        lbs.sort()
        n = len(lbs)
        row = {"n": n}
        for q in quantiles:
            name = "est_p" + ("%g" % (q * 100)).replace(".", "_")
            row[name] = lbs[math.ceil(q * n) - 1]
        out[g] = row
    return out


def _q_rows(qv):
    return {
        r["grp"]: {k: r[k] for k in r.asDict() if k != "grp"}
        for r in qv.df().collect()
    }


def test_quantile_view_full_build_matches_python_truth(t, tmp_path):
    from vectordb_spark.operators.matview import IncrementalQuantileView

    qv = IncrementalQuantileView(
        t, str(tmp_path / "qv"), ["grp"], "val", quantiles=(0.5, 0.99)
    )
    qv.full_build()
    pairs = [(r["grp"], r["val"]) for r in t.df().select("grp", "val").collect()]
    assert _q_rows(qv) == _q_truth_py(pairs, (0.5, 0.99))


def test_quantile_view_lifecycle_refresh_matches_rebuild(t, tmp_path):
    from vectordb_spark.operators.matview import IncrementalQuantileView

    qv = IncrementalQuantileView(
        t, str(tmp_path / "qv"), ["grp"], "val", quantiles=(0.5, 0.9, 0.99)
    )
    qv.full_build()
    t.insert(
        [
            {"id": 50 + i, "grp": "ab"[i % 2], "val": 7 * i, "v": [0.0, 0.0]}
            for i in range(20)
        ]
    )
    t.delete(primary_keys=[0, 2, 51])
    t.insert([{"id": 4, "grp": "a", "val": 123456, "v": [0.0, 0.0]}], upsert=True)
    qv.refresh(force_incremental=True)
    twin = IncrementalQuantileView(
        t, str(tmp_path / "qv2"), ["grp"], "val", quantiles=(0.5, 0.9, 0.99)
    )
    twin.full_build()
    assert _q_rows(qv) == _q_rows(twin)
    pairs = [(r["grp"], r["val"]) for r in t.df().select("grp", "val").collect()]
    assert _q_rows(qv) == _q_truth_py(pairs, (0.5, 0.9, 0.99))


def test_quantile_view_retraction_empties_bucket(t, tmp_path):
    from vectordb_spark.operators.matview import IncrementalQuantileView

    qv = IncrementalQuantileView(t, str(tmp_path / "qv"), ["grp"], "val")
    qv.full_build()
    # delete ALL of group b: the group must drop from the served view
    t.delete(primary_keys=[1, 3, 5, 7, 9])
    qv.refresh(force_incremental=True)
    got = _q_rows(qv)
    assert set(got) == {"a"}
    # and the surviving group's ranks re-read exactly
    pairs = [(r["grp"], r["val"]) for r in t.df().select("grp", "val").collect()]
    assert got == _q_truth_py(pairs, (0.5, 0.99))


def test_quantile_view_out_of_domain_values(spark, tmp_path):
    from vectordb_spark.operators.matview import IncrementalQuantileView

    schema = TableSchema(
        name="qv_dom",
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
    t = Table(spark, schema, str(tmp_path / "qv_dom"))
    t._init_storage()
    t.insert_df(
        spark.createDataFrame(
            [
                (0, "a", -5, [0.0, 0.0]),   # negative: excluded
                (1, "a", None, [0.0, 0.0]),  # NULL: excluded
                (2, "a", 100, [0.0, 0.0]),
                (3, "a", 200, [0.0, 0.0]),
            ],
            "id long, grp string, val long, v array<float>",
        )
    )
    qv = IncrementalQuantileView(t, str(tmp_path / "qv"), ["grp"], "val")
    qv.full_build()
    got = _q_rows(qv)
    assert got["a"]["n"] == 2  # ranks over the valid domain only
    # retracting an out-of-domain row must stay balanced (NULL-bucket
    # state pair retracts; served ranks unchanged)
    t.delete(primary_keys=[0])
    qv.refresh(force_incremental=True)
    assert _q_rows(qv) == got


def test_quantile_view_state_is_bounded(t, tmp_path):
    from vectordb_spark.operators.matview import IncrementalQuantileView

    qv = IncrementalQuantileView(t, str(tmp_path / "qv"), ["grp"], "val")
    qv.full_build()
    # 10 rows, vals 0..90 -> well under the ~790-bucket ceiling, and
    # never more than one state row per live (group, bucket) pair
    st = qv._inner.df()
    assert st.count() == st.select("grp", "_hdr_bucket").distinct().count()
    assert qv.version() == qv._inner.version()


def test_quantile_view_rejects_bad_quantiles(t, tmp_path):
    from vectordb_spark.operators.matview import IncrementalQuantileView

    with pytest.raises(ValueError):
        IncrementalQuantileView(
            t, str(tmp_path / "x"), ["grp"], "val", quantiles=(0.0,)
        )
    with pytest.raises(ValueError):
        IncrementalQuantileView(
            t, str(tmp_path / "y"), ["grp"], "val", quantiles=()
        )


# ------------------------ sumsq state → AVG/VAR/STDDEV serving (r12)


def _sumsq_rows(mv):
    f = lambda x: None if x is None else float(x)  # noqa: E731
    return {
        r["grp"]: (
            r["n_rows"], r["_n_val"],
            f(r["_sum_dec"]), f(r["_sumsq_dec"]),
        )
        for r in mv.df().collect()
    }


def test_sumsq_refresh_matches_full_rebuild(t, tmp_path):
    """sumsq is linear/invertible like SUM: a mixed insert + delete +
    upsert lifecycle merged from the changefeed must equal the
    from-scratch twin exactly (decimal state, no float drift)."""
    mv = IncrementalAggView(
        t, str(tmp_path / "mv"), ["grp"], "val",
        aggs=("count", "sum", "sumsq"),
    )
    mv.full_build()
    assert _sumsq_rows(mv)["a"] == (
        5, 5, 200.0, float(sum(v * v for v in (0, 20, 40, 60, 80))),
    )
    t.insert([{"id": 100, "grp": "a", "val": 7, "v": [0.0, 0.0]}])
    t.delete(primary_keys=[1, 3])  # grp b, vals 10 + 30
    t.insert([{"id": 5, "grp": "b", "val": 1000, "v": [0.0, 0.0]}], upsert=True)
    mv.refresh(force_incremental=True)
    mv2 = IncrementalAggView(
        t, str(tmp_path / "mv2"), ["grp"], "val",
        aggs=("count", "sum", "sumsq"),
    )
    mv2.full_build()
    assert _sumsq_rows(mv) == _sumsq_rows(mv2)
    # vals now: a = {0,20,40,60,80,7}, b = {1000,70,90}
    assert _sumsq_rows(mv)["b"] == (3, 3, 1160.0, 1000000.0 + 4900.0 + 8100.0)


def test_stats_df_matches_sql_avg_var(t, tmp_path):
    """stats_df serves AVG/VAR_POP/STDDEV_POP off the exact-decimal
    state; Spark's own avg/var_pop over the live snapshot must agree
    to fp tolerance (different summation orders, same math)."""
    mv = IncrementalAggView(
        t, str(tmp_path / "mv"), ["grp"], "val",
        aggs=("count", "sum", "sumsq"),
    )
    mv.full_build()
    t.delete(primary_keys=[2])
    t.insert([{"id": 7, "grp": "b", "val": 123, "v": [0.0, 0.0]}], upsert=True)
    mv.refresh(force_incremental=True)
    got = {
        r["grp"]: (r["n_val"], r["avg"], r["var_pop"], r["stddev_pop"])
        for r in mv.stats_df().collect()
    }
    truth = {
        r["grp"]: (r["n"], r["avg"], r["var"], r["sd"])
        for r in t.df()
        .groupBy("grp")
        .agg(
            F.count("val").alias("n"),
            F.avg("val").alias("avg"),
            F.var_pop("val").alias("var"),
            F.stddev_pop("val").alias("sd"),
        )
        .collect()
    }
    assert set(got) == set(truth)
    for g in got:
        assert got[g][0] == truth[g][0]
        for a, b in zip(got[g][1:], truth[g][1:]):
            assert a == pytest.approx(b, rel=1e-9, abs=1e-9)


def test_sumsq_null_values_follow_sql_semantics(spark, tmp_path):
    """NULL values: sum/sumsq skip them, _n_val counts only non-NULL
    (SQL AVG divides by COUNT(value), not COUNT(*)); retracting a
    NULL-valued row must not decrement _n_val; an all-NULL group
    serves NULL avg/var/stddev like SQL."""
    schema = TableSchema(
        name="mv_sq_nv",
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
    t = Table(spark, schema, str(tmp_path / "mv_sq_nv"))
    t._init_storage()
    t.insert_df(
        spark.createDataFrame(
            [
                (0, "a", 4, [0.0, 0.0]),
                (1, "a", None, [0.0, 0.0]),
                (2, "a", 8, [0.0, 0.0]),
                (3, "z", None, [0.0, 0.0]),  # all-NULL group
            ],
            "id long, grp string, val long, v array<float>",
        )
    )
    mv = IncrementalAggView(
        t, str(tmp_path / "mv"), ["grp"], "val",
        aggs=("count", "sum", "sumsq"),
    )
    mv.full_build()
    t.delete(primary_keys=[1])  # retract the NULL value inside 'a'
    mv.refresh(force_incremental=True)
    rows = {
        r["grp"]: (r["n_rows"], r["n_val"], r["avg"], r["var_pop"])
        for r in mv.stats_df().collect()
    }
    assert rows["a"] == (2, 2, 6.0, 4.0)
    assert rows["z"] == (1, 0, None, None)
    # twin check: merged state == from-scratch state
    mv2 = IncrementalAggView(
        t, str(tmp_path / "mv2"), ["grp"], "val",
        aggs=("count", "sum", "sumsq"),
    )
    mv2.full_build()
    assert _sumsq_rows(mv) == _sumsq_rows(mv2)


def test_stats_df_requires_sumsq_state(t, tmp_path):
    from vectordb_spark.operators.matview import UnsupportedAggregateError

    mv = IncrementalAggView(
        t, str(tmp_path / "mv"), ["grp"], "val", aggs=("count", "sum")
    )
    mv.full_build()
    with pytest.raises(UnsupportedAggregateError, match="sumsq"):
        mv.stats_df()


def test_join_view_sumsq_both_sides_change(fact_dim, tmp_path):
    """sumsq join-maintains by the same delta-join algebra as SUM:
    fact delta + dim group migration in one refresh must equal the
    from-scratch twin, and stats_df must match Spark's var_pop over
    the live join."""
    from vectordb_spark.operators.matview import IncrementalJoinAggView

    fact, dim, _ = fact_dim
    mv = IncrementalJoinAggView(
        fact, dim, str(tmp_path / "jv_sq"),
        fact_key="cid", dim_key="ckey",
        group_cols=["region"], value_col="amount",
        aggs=("count", "sum", "sumsq"),
    )
    mv.full_build()
    fact.insert([{"oid": 60, "cid": 2, "amount": 500, "v": [0.0, 0.0]}])
    fact.delete(primary_keys=[3])
    dim.insert([{"ckey": 1, "region": "w", "v": [0.0, 0.0]}], upsert=True)
    mv.refresh(force_incremental=True)
    mv2 = IncrementalJoinAggView(
        fact, dim, str(tmp_path / "jv_sq2"),
        fact_key="cid", dim_key="ckey",
        group_cols=["region"], value_col="amount",
        aggs=("count", "sum", "sumsq"),
    )
    mv2.full_build()

    def rows(m):
        return {
            r["region"]: (
                r["n_rows"], r["_n_val"],
                float(r["_sum_dec"]), float(r["_sumsq_dec"]),
            )
            for r in m.df().collect()
        }

    assert rows(mv) == rows(mv2)
    f, d = fact.df(), dim.df()
    j = f.join(d, f["cid"] == d["ckey"], "inner")
    truth = {
        r["region"]: (r["avg"], r["var"])
        for r in j.groupBy("region")
        .agg(F.avg("amount").alias("avg"), F.var_pop("amount").alias("var"))
        .collect()
    }
    got = {
        r["region"]: (r["avg"], r["var_pop"])
        for r in mv.stats_df().collect()
    }
    assert set(got) == set(truth)
    for g in got:
        for a, b in zip(got[g], truth[g]):
            assert a == pytest.approx(b, rel=1e-9)


# ------------------------------------------ time-bucketed rollup view


@pytest.fixture
def rt(spark, tmp_path):
    """Events-shaped table: PK + epoch-ns timestamp + type + value."""
    schema = TableSchema(
        name="rollup_src",
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
    t = Table(spark, schema, str(tmp_path / "rollup_src"))
    t._init_storage()
    # epoch-ns-scale timestamps (≫ 2^53: float bucket math would
    # break), hour-aligned so the fixture's bucket keys are literal
    hour = 3_600_000_000_000
    base = 500_000 * hour  # 1.8e18 ns
    t.insert(
        [
            {
                "id": i,
                "ts": base + (i % 3) * hour + i,  # 3 live hour buckets
                "typ": "xy"[i % 2],
                "val": 10 * i,
                "v": [0.0, 0.0],
            }
            for i in range(12)
        ]
    )
    return t, base, hour


def _rollup_rows(mv):
    return {
        (r["_bucket_start_ns"], r["typ"]): (r["n_rows"], float(r["_sum_dec"]))
        for r in mv.df().collect()
    }


def test_rollup_view_timestamp_move_migrates_buckets(rt, tmp_path):
    """The late-data-correction shape: an upsert that MOVES an event's
    timestamp must retract from the old bucket's group and land in the
    new one via the signed merge alone (the bucket is stamped on pre-
    and post-images alike). Exact integer bucketing at epoch-ns scale."""
    from vectordb_spark.operators.matview import IncrementalRollupView

    t, base, hour = rt
    mv = IncrementalRollupView(
        t, str(tmp_path / "mv"), "ts", hour, ["typ"], "val"
    )
    mv.full_build()
    before = _rollup_rows(mv)
    assert before[(base, "x")] == (2, 60.0)  # ids 0 (val 0) and 6 (60)
    # move id 0 two hours forward AND change its value
    t.insert(
        [
            {
                "id": 0,
                "ts": base + 2 * hour,
                "typ": "x",
                "val": 5,
                "v": [0.0, 0.0],
            }
        ],
        upsert=True,
    )
    # plus a late arrival into the OLDEST bucket
    t.insert(
        [
            {
                "id": 100,
                "ts": base + 50,
                "typ": "y",
                "val": 3,
                "v": [0.0, 0.0],
            }
        ]
    )
    mv.refresh(force_incremental=True)
    got = _rollup_rows(mv)
    mv2 = IncrementalRollupView(
        t, str(tmp_path / "mv2"), "ts", hour, ["typ"], "val"
    )
    mv2.full_build()
    assert got == _rollup_rows(mv2)
    assert got[(base, "x")] == (1, 60.0)  # id 0 left its old bucket
    assert got[(base + 2 * hour, "x")][0] == 3  # ids 2, 8 + moved id 0
    assert got[(base, "y")] == (3, 3.0 + 30 + 90)  # late id 100 joined


def test_rollup_view_minmax_rescan_is_bucket_scoped(rt, tmp_path):
    """MIN/MAX rollups rescan dirtied (bucket, group) keys through
    _prepare, so deleting a bucket's max rescans THAT bucket only and
    still matches the from-scratch twin."""
    from vectordb_spark.operators.matview import IncrementalRollupView

    t, base, hour = rt
    mv = IncrementalRollupView(
        t, str(tmp_path / "mv"), "ts", hour, ["typ"], "val",
        aggs=("count", "sum", "min", "max"),
    )
    mv.full_build()
    # id 6 is bucket-0 x's max (val 60): non-invertible retraction
    t.delete(primary_keys=[6])
    mv.refresh(force_incremental=True)
    mv2 = IncrementalRollupView(
        t, str(tmp_path / "mv2"), "ts", hour, ["typ"], "val",
        aggs=("count", "sum", "min", "max"),
    )
    mv2.full_build()

    def full(m):
        return {
            (r["_bucket_start_ns"], r["typ"]): (
                r["n_rows"], float(r["_sum_dec"]), r["_min"], r["_max"]
            )
            for r in m.df().collect()
        }

    assert full(mv) == full(mv2)
    assert full(mv)[(base, "x")][3] == 0  # new max is id 0's val


def test_rollup_view_rejects_bad_bucket(rt, tmp_path):
    from vectordb_spark.operators.matview import IncrementalRollupView

    t, _, _ = rt
    with pytest.raises(ValueError, match="bucket_ns"):
        IncrementalRollupView(t, str(tmp_path / "mv"), "ts", 0, ["typ"], "val")


def test_invertible_refresh_never_scans_base(t, tmp_path, monkeypatch):
    """The COUNT/SUM (and rollup) refresh contract is 'changefeed +
    state, never the base': pin it by making every base-snapshot read
    explode after the build. Only the MIN/MAX dirty rescan is allowed
    to touch the base — verified by the companion test below."""
    mv = IncrementalAggView(t, str(tmp_path / "mv"), ["grp"], "val")
    mv.full_build()
    t.insert([{"id": 50, "grp": "a", "val": 5, "v": [0.0, 0.0]}])
    t.delete(primary_keys=[1])
    t.insert([{"id": 2, "grp": "a", "val": 999, "v": [0.0, 0.0]}], upsert=True)

    def boom(*a, **k):
        raise AssertionError("invertible refresh must not scan the base")

    monkeypatch.setattr(t, "df", boom)
    mv.refresh(force_incremental=True)
    got = _rows(mv)
    monkeypatch.undo()
    mv2 = IncrementalAggView(t, str(tmp_path / "mv2"), ["grp"], "val")
    mv2.full_build()
    assert got == _rows(mv2)


def test_minmax_refresh_scans_base_only_when_dirtied(t, tmp_path, monkeypatch):
    """MIN/MAX refresh touches the base ONLY for dirtied groups: an
    insert that cannot lower/raise any extremum (new max arriving) must
    merge without a rescan; deleting a group's max must rescan."""
    mv = IncrementalAggView(
        t, str(tmp_path / "mv"), ["grp"], "val", aggs=("count", "max")
    )
    mv.full_build()
    # a new global max: monotone merge, no rescan needed
    t.insert([{"id": 50, "grp": "a", "val": 10_000, "v": [0.0, 0.0]}])

    def boom(*a, **k):
        raise AssertionError("monotone MAX merge must not rescan the base")

    monkeypatch.setattr(t, "df", boom)
    mv.refresh(force_incremental=True)
    monkeypatch.undo()
    rows = {r["grp"]: r["_max"] for r in mv.df().collect()}
    assert rows["a"] == 10_000
    # now delete it: the group is dirtied and MUST rescan
    t.delete(primary_keys=[50])
    called = {}
    real_df = t.df

    def spy(*a, **k):
        called["yes"] = True
        return real_df(*a, **k)

    monkeypatch.setattr(t, "df", spy)
    mv.refresh(force_incremental=True)
    assert called.get("yes"), "deleting the max must trigger the rescan"
    rows = {r["grp"]: r["_max"] for r in mv.df().collect()}
    assert rows["a"] == 80  # ids 0..9 grp a: vals 0,20,...,80


def test_rollup_view_coarsen_serves_day_grain_off_state(rt, tmp_path):
    """Hierarchical continuous aggregates: coarsen(day) re-aggregated
    from HOUR state must equal a from-scratch day-grain view, and it
    must be a pure state query (base reads explode after the build)."""
    from vectordb_spark.operators.matview import IncrementalRollupView

    t, base, hour = rt
    day = 24 * hour
    mv = IncrementalRollupView(
        t, str(tmp_path / "mv"), "ts", hour, ["typ"], "val",
        aggs=("count", "sum", "min", "max"),
    )
    mv.full_build()
    day_twin = IncrementalRollupView(
        t, str(tmp_path / "day"), "ts", day, ["typ"], "val",
        aggs=("count", "sum", "min", "max"),
    )
    day_twin.full_build()

    def rows(df):
        return {
            (r["_bucket_start_ns"], r["typ"]): (
                r["n_rows"], float(r["_sum_dec"]), r["_min"], r["_max"]
            )
            for r in df.collect()
        }

    import pytest as _pytest

    real_df = t.df
    t.df = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("coarsen must serve off state")
    )
    try:
        got = rows(mv.coarsen(day))
    finally:
        t.df = real_df
    assert got == rows(day_twin.df())
    with _pytest.raises(ValueError, match="multiple"):
        mv.coarsen(hour + 1)


def test_rollup_view_retention_bounds_state(rt, tmp_path):
    """retention_ns expires buckets trailing the view's max bucket at
    every commit — physically, so state is bounded on an unbounded
    horizon — while buckets inside the window keep maintaining
    exactly (watermark semantics)."""
    from vectordb_spark.operators.matview import IncrementalRollupView

    t, base, hour = rt
    mv = IncrementalRollupView(
        t, str(tmp_path / "mv"), "ts", hour, ["typ"], "val",
        retention_ns=2 * hour,
    )
    mv.full_build()
    # fixture spans buckets 0,1,2; retention 2h from max (bucket 2)
    # keeps buckets 1 and 2 only
    buckets = {r["_bucket_start_ns"] for r in mv.df().collect()}
    assert buckets == {base + hour, base + 2 * hour}
    # an in-window mutation maintains exactly: move id 1 (bucket 1)
    # value 10 -> 77
    t.insert(
        [
            {
                "id": 1, "ts": base + hour + 1, "typ": "y", "val": 77,
                "v": [0.0, 0.0],
            }
        ],
        upsert=True,
    )
    # and a new max bucket advances the horizon, expiring bucket 1
    t.insert(
        [
            {
                "id": 200, "ts": base + 3 * hour, "typ": "x", "val": 1,
                "v": [0.0, 0.0],
            }
        ]
    )
    mv.refresh(force_incremental=True)
    got = {
        (r["_bucket_start_ns"], r["typ"]): (r["n_rows"], float(r["_sum_dec"]))
        for r in mv.df().collect()
    }
    assert {b for b, _ in got} == {base + 2 * hour, base + 3 * hour}
    assert got[(base + 3 * hour, "x")] == (1, 1.0)
    with pytest.raises(ValueError, match="retention_ns"):
        IncrementalRollupView(
            t, str(tmp_path / "bad"), "ts", hour, ["typ"], "val",
            retention_ns=hour // 2,
        )


# --------------------------------------------- partial (filtered) views


def test_filtered_view_boundary_crossing_upserts(t, tmp_path):
    """Partial view: the filter is the table's own expression language,
    applied to every frame the algebra sees. The hard shape is an
    upsert CROSSING the boundary — entering rows add-only, leaving
    rows retract-only — which must fall out of filtering the signed
    changefeed with no special casing."""
    mv = IncrementalAggView(
        t, str(tmp_path / "mv"), ["grp"], "val", filter="val >= 40"
    )
    mv.full_build()
    assert _rows(mv) == {"a": (3, 180.0), "b": (3, 210.0)}
    # id 1 (grp b, val 10) ENTERS the view; id 4 (grp a, val 40) LEAVES;
    # id 6 (grp a, val 60) moves WITHIN; id 8 (grp a, val 80) deleted
    t.insert([{"id": 1, "grp": "b", "val": 500, "v": [0.0, 0.0]}], upsert=True)
    t.insert([{"id": 4, "grp": "a", "val": 5, "v": [0.0, 0.0]}], upsert=True)
    t.insert([{"id": 6, "grp": "a", "val": 61, "v": [0.0, 0.0]}], upsert=True)
    t.delete(primary_keys=[8])
    mv.refresh(force_incremental=True)
    got = _rows(mv)
    mv2 = IncrementalAggView(
        t, str(tmp_path / "mv2"), ["grp"], "val", filter="val >= 40"
    )
    mv2.full_build()
    assert got == _rows(mv2)
    assert got == {"a": (1, 61.0), "b": (4, 710.0)}


def test_filtered_rollup_and_quantile_compose(rt, tmp_path):
    """Filter and derived-key hooks compose through super()._prepare:
    a filtered rollup and a filtered quantile view must both equal
    their from-scratch twins after mutations."""
    from vectordb_spark.operators.matview import (
        IncrementalQuantileView,
        IncrementalRollupView,
    )

    t, base, hour = rt
    flt = "typ = 'x'"
    rv = IncrementalRollupView(
        t, str(tmp_path / "rv"), "ts", hour, ["typ"], "val", filter=flt
    )
    rv.full_build()
    qv = IncrementalQuantileView(
        t, str(tmp_path / "qv"), ["typ"], "val",
        quantiles=(0.5,), filter=flt,
    )
    qv.full_build()
    # only x rows in state
    assert {r["typ"] for r in rv.df().collect()} == {"x"}
    # a y row enters x (crosses the filter), an x row leaves to y
    t.insert([{"id": 1, "ts": base + 1, "typ": "x", "val": 11,
               "v": [0.0, 0.0]}], upsert=True)
    t.insert([{"id": 2, "ts": base + 2 * hour + 2, "typ": "y", "val": 20,
               "v": [0.0, 0.0]}], upsert=True)
    rv.refresh(force_incremental=True)
    qv.refresh(force_incremental=True)
    rv2 = IncrementalRollupView(
        t, str(tmp_path / "rv2"), "ts", hour, ["typ"], "val", filter=flt
    )
    rv2.full_build()
    qv2 = IncrementalQuantileView(
        t, str(tmp_path / "qv2"), ["typ"], "val",
        quantiles=(0.5,), filter=flt,
    )
    qv2.full_build()
    assert _rollup_rows(rv) == _rollup_rows(rv2)
    qrows = {r["typ"]: (r["n"], r["est_p50"]) for r in qv.df().collect()}
    assert qrows == {
        r["typ"]: (r["n"], r["est_p50"]) for r in qv2.df().collect()
    }
    assert set(qrows) == {"x"}


def test_filtered_view_rejects_distance(t, tmp_path):
    with pytest.raises(ValueError, match="@distance"):
        IncrementalAggView(
            t, str(tmp_path / "mv"), ["grp"], "val",
            filter="@distance < 0.5",
        )
