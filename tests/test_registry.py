"""Registry-ordering invariants.

The grading driver records oracle evidence for at most the first 50
registered queries; ``ORACLE_WINDOW`` pins which those are. These tests
catch the silent failure mode of round 1 (core KNN/window queries
registering after slot 50 and never getting an oracle row).
"""

from vectordb_spark.queries import ORACLE_WINDOW, all_oracles, all_queries

DRIVER_WINDOW = 50

# The reference's identity: vector search + the window surface. These
# must never fall out of the checked window.
# t1_knn_dot rotated off-window in round 4 (green r1+r2+r3; same
# compile path as the two metrics that stay); w1/w3/w4/w5 rotated
# off-window in round 5 (green r2+r3+r4; window-function path held by
# w2 + w6 + the four w7-w10 newcomers).
CORE = [
    "t1_knn_l2",
    "t1_knn_cosine",
    "t2_knn_prefilter",
    "t6_knn_postfilter_distance",
    "a5_facets_over_search",
    "w2_sessionize",
]


def test_window_names_exist():
    qs = all_queries()
    missing = [n for n in ORACLE_WINDOW if n not in qs]
    assert not missing, f"ORACLE_WINDOW references unknown queries: {missing}"


def test_window_fits_driver_cap():
    # exactly 50: every driver slot spends evidence on a chosen query
    assert len(ORACLE_WINDOW) == DRIVER_WINDOW
    assert len(set(ORACLE_WINDOW)) == DRIVER_WINDOW


def test_round5_additions_rotated_in():
    # the fifteen round-4 queries that had never had a driver row
    # (VERDICT r4, "Next round" #1) must hold window slots this round
    for name in [
        "w7_sliding_window",
        "w8_rollup_grains",
        "w9_ntile_length_deciles",
        "w10_interarrival_stats",
        "funnel_conversion",
        "cohort_retention",
        "a8_value_histogram",
        "dedup_keep_best",
        "dedup_incremental_newdocs",
        "dedup_cross_source_overlap",
        "sparse_knn_l2",
        "t9_knn_batch",
        "vec_centroid_per_label",
        "text_fuzzy_match",
        "text_bigram_familiarity",
    ]:
        assert name in ORACLE_WINDOW, name


def test_registration_order_honors_window():
    order = list(all_queries())
    assert order[: len(ORACLE_WINDOW)] == list(ORACLE_WINDOW)


def test_core_queries_inside_window():
    order = list(all_queries())
    for name in CORE:
        assert order.index(name) < DRIVER_WINDOW, f"{name} fell off the window"


def test_windowed_queries_have_oracles():
    # everything in the window should carry an oracle except the two
    # documented rows-only operators (iterative kmeans, mock embedder)
    oracles = all_oracles()
    rows_only = {n for n in ORACLE_WINDOW if n not in oracles}
    assert rows_only == {"ann_ivf_kmeans", "semantic_text_search"}, rows_only
