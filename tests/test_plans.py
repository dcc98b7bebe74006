"""Plan audits for the headline queries: the physical strategies that
make these operators survive a 100×  scale-up, asserted as tests."""

from __future__ import annotations

import pytest

from vectordb_spark.plans.audit import (
    plan_of,
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_take_ordered,
    assert_read_schema_pruned,
)
from vectordb_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def test_scan_filter_pushdown(spark, qs):
    # the quantity/returnflag predicates must reach the parquet scan
    plan = assert_pushed_filters(
        qs["s4_full_scan_filter"](spark, SF),
        "GreaterThan(l_quantity,45.0)",
        "EqualTo(l_returnflag,R)",
    )
    assert_read_schema_pruned(
        qs["s4_full_scan_filter"](spark, SF), max_cols=5
    )


def test_pk_lookup_pushdown(spark, qs):
    assert_pushed_filters(qs["s5_pk_point_lookup"](spark, SF), "In(c_custkey")


def test_knn_is_take_ordered(spark, qs):
    # exact KNN must plan as per-partition top-K, not a global sort
    for name in ("t1_knn_l2", "t2_knn_prefilter", "t6_knn_postfilter_distance"):
        assert_take_ordered(qs[name](spark, SF))


def test_knn_prefilter_pushdown(spark, qs):
    # the label<5 pre-filter belongs in the scan, below the distance calc
    assert_pushed_filters(qs["t2_knn_prefilter"](spark, SF), "LessThan(label,5)")


def test_joins_broadcast_and_no_cartesian(spark, qs):
    for name in ("j1_broadcast_enrich", "j2_star_join_revenue", "w3_topn_per_group"):
        df = qs[name](spark, SF)
        assert_broadcast_join(df)
        assert_no_cartesian(df)


def test_dedup_joins_are_hash_joins(spark, qs):
    # banded self-joins must be equi (hash) joins, never nested-loop
    for name in ("dedup_minhash_lsh", "dedup_simhash_nearmiss", "dedup_token_jaccard"):
        assert_no_cartesian(qs[name](spark, SF))


def test_keyset_pagination_pushes_boundary(spark, qs):
    # the page boundary must reach the parquet scan (deep pages cost
    # the same as page 1) and the page fetch must be a TakeOrdered,
    # never a global sort
    df = qs["t7_keyset_pagination"](spark, SF)
    assert_pushed_filters(df, "GreaterThan(o_orderkey,400)")
    assert_take_ordered(df)


def test_fusion_rrf_truncates_before_ranking(spark, qs):
    # RRF must rank per-metric TOP-N candidates (TakeOrderedAndProject),
    # never window over the whole table in one partition
    df = qs["fusion_rrf"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject(limit=100") == 2, plan
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" not in line:
            # physical Window node: partition spec bracket must be non-empty
            assert ", [], [" not in line.replace(" ", ""), (
                f"unpartitioned window in fusion_rrf plan: {line}"
            )


def test_tfidf_plan_build_runs_no_jobs(spark, qs):
    # N(docs) must fold into the plan (cross-joined 1-row agg), not run
    # as a separate count() action while the DataFrame is being built
    from vectordb_spark.sources.readers import load_table

    sc = spark.sparkContext
    try:
        # baseline: a bare load_table launches one parquet schema-read job
        sc.setJobGroup("tfidf-probe-base", "")
        load_table(spark, SF, "documents")
        base = sc.statusTracker().getJobIdsForGroup("tfidf-probe-base")
        sc.setJobGroup("tfidf-probe-build", "plan construction must be lazy")
        qs["sparse_tfidf_weights"](spark, SF)
        jobs = sc.statusTracker().getJobIdsForGroup("tfidf-probe-build")
        assert len(jobs) <= len(base), (
            f"plan construction launched extra jobs beyond the schema read: "
            f"base={base} build={jobs}"
        )
    finally:
        sc.setJobGroup("", "")


def test_engine_table_scan_pushdown(spark, tmp_path):
    # the Table API's filter language also reaches the parquet scan
    from vectordb_spark.catalog import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = wh.load_db("plandb").create_table(
        {
            "name": "t",
            "fields": [
                {"name": "ID", "dataType": "INT", "primaryKey": True},
                {"name": "Doc", "dataType": "STRING"},
                {
                    "name": "v",
                    "dataType": "VECTOR_FLOAT",
                    "dimensions": 2,
                    "metricType": "EUCLIDEAN",
                },
            ],
        }
    )
    t.insert([{"ID": i, "Doc": f"d{i}", "v": [float(i), 0.0]} for i in range(10)])
    topk = t.search_df([0.0, 0.0], limit=3, filter="ID <= 5")
    assert_pushed_filters(topk, "LessThanOrEqual(ID,5)")
    assert_take_ordered(topk)


def test_facets_batch_in_single_action(spark, monkeypatch):
    # N facet specs must run as ONE action (union of tagged branches
    # over a cached input), not N sequential collects on the serving
    # path. AQE splits even a single action into per-shuffle-stage
    # jobs, so the assertion counts DataFrame.collect calls, which is
    # what "one job per serving request" means at the API boundary.
    from vectordb_spark.operators.facets import compute_facets, parse_facets
    from vectordb_spark.schema import FieldType

    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(100)], "ID long, grp int, val double"
    )
    fm = {"ID": FieldType.INT8, "grp": FieldType.INT4, "val": FieldType.DOUBLE}
    specs4 = parse_facets(
        [
            {"group": ["grp"], "aggregate": ["COUNT(*)", "SUM(val)"]},
            {"group": [], "aggregate": ["MIN(ID)", "MAX(val)"]},
            {"group": ["ID % 2"], "aggregate": ["SUM(ID)"]},
            {"group": ["grp + 1"], "aggregate": ["COUNT(*)"]},
        ],
        fm,
    )
    calls = []
    cls = type(df)  # pyspark.sql.classic.DataFrame in Spark 4
    real_collect = cls.collect
    monkeypatch.setattr(
        cls, "collect", lambda self: (calls.append(1), real_collect(self))[1]
    )
    out4 = compute_facets(df, specs4, fm)
    assert len(calls) == 1, f"facets ran {len(calls)} actions, want 1"

    # demultiplexed results are per-spec and typed
    assert len(out4) == 4
    assert {r["grp"] for r in out4[0]} == {0, 1, 2}
    assert out4[1] == [{"MIN(ID)": 0.0, "MAX(val)": 99.0}]
    by_key = {r["ID % 2"]: r["SUM(ID)"] for r in out4[2]}
    assert by_key == {0.0: 2450.0, 1.0: 2500.0}


def test_source_cap_prunes_map_side(spark, qs):
    # rank <= N over a window must plan WindowGroupLimit BEFORE the
    # exchange (partial top-N per map task) — the property that keeps
    # per-source caps linear at 100 TB
    plan = plan_of(qs["source_cap_top_quality"](spark, SF))
    lines = plan.splitlines()
    exch = next(i for i, l in enumerate(lines) if "Exchange" in l)
    assert any("WindowGroupLimit" in l for l in lines[exch:]), plan


def test_pack_sequences_single_shuffle(spark, qs):
    # the per-shard running sum needs exactly ONE exchange (on shard)
    plan = plan_of(qs["pack_sequences"](spark, SF))
    assert plan.count("+- Exchange") == 1, plan


def test_range_join_is_hash_join(spark, qs):
    # binned formulation: the interval join must be a shuffled hash
    # join on (user_id, bin) — a BroadcastNestedLoopJoin here means the
    # plan degraded to the naive inequality form
    from vectordb_spark.plans.audit import assert_no_cartesian, plan_of

    df = qs["rj_follow_on_events"](spark, SF)
    assert_no_cartesian(df)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_tpch_q1_shipdate_pushed(spark, qs):
    from vectordb_spark.plans.audit import assert_pushed_filters

    df = qs["tpch_q1_pricing_summary"](spark, SF)
    assert_pushed_filters(df, "LessThan(l_shipdate")


def test_repetition_is_map_only(spark, qs):
    # no Exchange anywhere: the duplicate-ngram fraction is map-side
    from vectordb_spark.plans.audit import plan_of

    plan = plan_of(qs["text_repetition_ngrams"](spark, SF))
    assert "Exchange" not in plan


def test_geo_join_is_hash_join(spark, qs):
    # cell-bucketed spatial join must be an equi (hash) join on the
    # grid cells, never a nested-loop over the haversine predicate
    assert_no_cartesian(qs["geo_join_radius_pairs"](spark, SF))


def test_substring_fingerprint_join_is_hash_join(spark, qs):
    # the fingerprint pair stage must join on fp equality only
    assert_no_cartesian(qs["dedup_substring_fingerprint"](spark, SF))


def test_tpch_q10_returnflag_pushed_and_hash_joined(spark, qs):
    # the returned-items filter must reach the lineitem scan; every
    # join is an equi (hash/sort-merge) join — never nested-loop; the
    # 25-row nation dim broadcasts
    from vectordb_spark.plans.audit import assert_pushed_filters, plan_of

    df = qs["tpch_q10_returned_items"](spark, SF)
    assert_pushed_filters(df, "EqualTo(l_returnflag,R)")
    assert_broadcast_join(df)
    assert_no_cartesian(df)
    assert_take_ordered(df)


def test_semantic_search_is_take_ordered_single_scan(spark, qs):
    # embed→score→top-K must be ONE pass: per-partition top-K heaps
    # (TakeOrderedAndProject), no global sort, and exactly one scan of
    # documents (a WHERE on the embed output used to re-inline the
    # whole interpreted expression chain into a pushed filter)
    from vectordb_spark.plans.audit import plan_of

    df = qs["semantic_text_search"](spark, SF)
    assert_take_ordered(df)
    plan = plan_of(df)
    # one scan: formatted plans print each node in the tree AND the
    # details list, so one physical scan == one "Location:" line
    assert plan.count("Location:") == 1
    # each staged expression evaluates once: a pushed-down filter would
    # duplicate the normalize stage into the scan's filter condition
    assert plan.count("regexp_replace") == 1


def test_maxsim_single_scan_single_shuffle(spark, qs):
    # late-interaction MaxSim: chunk-explode + embed are map-side; the
    # ONLY shuffle is the per-doc max/sum aggregation (partial-agg
    # map-side), and the top-10 is a TakeOrdered, not a global sort
    from vectordb_spark.plans.audit import plan_of

    df = qs["semantic_maxsim_search"](spark, SF)
    assert_take_ordered(df)
    plan = plan_of(df)
    assert plan.count("Location:") == 1  # one scan of documents
    # formatted plans print each node in the tree AND the details list:
    # 2 physical exchanges (scan rebalance + the groupBy) = 4 mentions,
    # and the partial HashAggregate must sit BELOW the groupBy exchange
    assert plan.count("Exchange") <= 4
    lines = plan.splitlines()
    gb_exch = max(i for i, l in enumerate(lines) if "+- Exchange" in l)
    assert any("HashAggregate" in l for l in lines[gb_exch:]), plan
    assert plan.count("regexp_replace") == 1  # embed stages not duplicated


def test_tpch_q19_hull_factored_to_both_scans(spark, qs):
    # the OR-of-ANDs must NOT block pushdown: the single-side hulls
    # (quantity BETWEEN 1 AND 30 on lineitem; brand IN (...) on part)
    # reach their respective parquet scans, the part side broadcasts,
    # and no nested-loop appears
    df = qs["tpch_q19_disjunctive_revenue"](spark, SF)
    assert_pushed_filters(df, "GreaterThanOrEqual(l_quantity,1.0)")
    assert_pushed_filters(df, "LessThanOrEqual(l_quantity,30.0)")
    assert_pushed_filters(df, "In(p_brand")
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_tpch_q13_outer_join_preserved(spark, qs):
    # the priority exclusion must ride INSIDE the left outer join (a
    # post-join filter would drop the zero-order customers); the
    # orders-side filter still reaches the scan
    df = qs["tpch_q13_customer_order_distribution"](spark, SF)
    plan = plan_of(df)
    assert "LeftOuter" in plan
    assert_pushed_filters(df, "Not(EqualTo(o_orderpriority,1-URGENT))")
    assert_no_cartesian(df)


def test_tpch_q15_scalar_max_is_broadcast_not_collect(spark, qs):
    # the MAX(total_revenue) probe must be a 1-row broadcast join —
    # plan shows BroadcastNestedLoopJoin over the scalar, and the
    # revenue view is checkpointed so lineitem is scanned once
    df = qs["tpch_q15_top_supplier"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # checkpointed view: both the MAX and the equality probe feed from
    # the materialized RDD — lineitem appears in NO scan (the only
    # parquet scan left is the supplier dim)
    assert "lineitem" not in plan
    # formatted plans print each node twice (tree + detail section):
    # 2 hits = exactly one scan node (the supplier dim)
    assert plan.count("Scan parquet") == 2


def test_tpch_q21_single_fact_shuffle(spark, qs):
    # the two quantifiers must come from ONE per-order aggregate, not
    # self-joins: exactly one join of lineitem with orders (status
    # filter pushed), no cartesian, semi-join back on orderkey
    df = qs["tpch_q21_sole_late_supplier"](spark, SF)
    assert_pushed_filters(df, "EqualTo(o_orderstatus,F)")
    assert_no_cartesian(df)
    plan = plan_of(df)
    assert "LeftSemi" in plan


def test_tpch_q22_anti_join_and_scalar_broadcast(spark, qs):
    # dormancy = LEFT ANTI on date-pruned orders; the avg cut is a
    # 1-row broadcast; segment IN-filter reaches the customer scan
    df = qs["tpch_q22_dormant_customers"](spark, SF)
    assert_pushed_filters(df, "In(c_mktsegment")
    assert_pushed_filters(df, "GreaterThanOrEqual(o_orderdate")
    plan = plan_of(df)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # exactly ONE nested-loop join is allowed: the 1-row scalar-avg
    # broadcast (joining a single aggregate row needs no key); the
    # anti join itself must be a hash join on custkey
    # formatted plans print each node twice: 2 hits = one node
    assert plan.count("BroadcastNestedLoopJoin") == 2
    assert "BroadcastNestedLoopJoin LeftAnti" not in plan


def test_tpch_q7_semi_prune_before_fact_shuffle(spark, qs):
    # the two-nation supplier set must broadcast onto lineitem BEFORE
    # the orderkey shuffle; the shipdate window reaches the scan
    df = qs["tpch_q7_nation_volume"](spark, SF)
    assert_pushed_filters(df, "GreaterThanOrEqual(l_shipdate")
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_ahash_near_dup_is_banded_hash_join(spark, qs):
    # candidate generation must be an equi-join on (band, value) —
    # never an all-pairs nested loop; Hamming runs only on candidates
    df = qs["media_ahash_near_dup"](spark, SF)
    assert_no_cartesian(df)


def test_matryoshka_both_stages_take_ordered(spark, qs):
    # prefix rank and exact rerank must both be per-partition top-K
    df = qs["ann_matryoshka_rerank"](spark, SF)
    plan = plan_of(df)
    assert plan.count("TakeOrderedAndProject") >= 2, plan


def test_ivfpq_prunes_before_adc(spark, qs):
    # the probe filter must sit below the ADC projection and the
    # ranking must be TakeOrdered; cells are a Filter on the scan
    # column here (at scale: a hive partition key → partition pruning)
    df = qs["ann_ivfpq_adc"](spark, SF)
    assert_take_ordered(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    # the cell-assignment Filter (argmin over centroid literals) must
    # sit DIRECTLY on the scan, below the ADC Projects (tree prints
    # top-down, so the Filter index is greater)
    fil = next(i for i, l in enumerate(lines) if "Filter array_position" in l)
    prj = next(i for i, l in enumerate(lines) if "Project" in l)
    assert fil > prj, plan[:2000]
    assert any("FileScan" in l for l in lines[fil:]), plan[:2000]


def test_cow_rewrite_scan_has_no_shuffle(spark, tmp_path):
    """r12 COW: the single rewrite pass tags kept rows with their
    source segment and writes via partitionBy — the tag derives from
    input_file_name, so each scan task already holds one source
    segment's rows and the plan must contain NO Exchange (the write
    job is scan → filter → sort-within-partition → write; a shuffle
    here would re-introduce the all-to-all cost COW exists to avoid)."""
    from pyspark.sql import functions as F

    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.table import Table

    schema = TableSchema(
        name="cowplan",
        fields=[
            FieldSchema(name="id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(
                name="v", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    t = Table(spark, schema, str(tmp_path / "cowplan"))
    t._init_storage()
    for s in range(4):
        t.insert(
            [
                {"id": s * 100 + i, "v": [0.0, 0.0]}
                for i in range(20)
            ]
        )
    tagged = t._df_for_files(list(t._load_meta()["files"])).withColumn(
        t._COW_TAG,
        F.regexp_extract(F.input_file_name(), r"/([^/]+)/[^/]*$", 1),
    )
    kept = tagged.where(~F.col("id").isin(5, 105))
    plan = plan_of(kept)
    assert "Exchange" not in plan, plan[:2000]
