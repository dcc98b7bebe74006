"""connected_components: correctness on known graphs, determinism,
convergence guard."""

from __future__ import annotations

import pytest

from vectordb_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.comp for r in connected_components(df, **kw).collect()
    }


def test_two_components_min_label(spark):
    # {1,2,3,4} chained + {10,11}; component = min reachable id
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_chain_converges_logarithmically(spark):
    # a 24-node path: propagation alone would need ~24 rounds; with
    # pointer doubling the label reaches the far end in O(log d)
    edges = [(i, i + 1) for i in range(24)]
    got = _cc(spark, edges, max_iter=8)
    assert set(got.values()) == {0}
    assert len(got) == 25


def test_triangle_plus_pair_matches_clusters(spark):
    # A~B, B~C without A~C is ONE cluster — the over-delete case pairs
    # alone get wrong (operators/graph.py module doc)
    got = _cc(spark, [(5, 7), (7, 9), (20, 21), (21, 20)])
    assert got == {5: 5, 7: 5, 9: 5, 20: 20, 21: 20}


def test_convergence_cap_raises(spark):
    edges = [(i, i + 1) for i in range(16)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, edges, max_iter=1)


def test_stats_estimate_stays_bounded_across_rounds(spark):
    # localCheckpoint propagates the checkpointed plan's size estimate,
    # and the size-only join estimator multiplies children — without a
    # stats reset at each round boundary the estimate's DIGIT COUNT
    # doubles per round and high-round-count graphs (long cycles) hang
    # the driver in BigInt multiplication during planning. A 100-node
    # path needs ~7 doubling rounds; the returned frame's estimate must
    # stay at the default-leaf scale, not 2^rounds digits.
    edges = [(i, i + 1) for i in range(100)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, max_iter=15)
    assert out.groupBy("comp").count().count() == 1
    size = int(
        str(out._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    assert size < 10**25, f"stats estimate exploded: {size:.3e}"


def test_two_driver_actions_per_round(spark, monkeypatch):
    # The iteration loop must stay at 2 driver actions per round: one
    # eager checkpoint that materializes prop+new in a single job (prop
    # is lazily checkpointed into it) and one count over the cached
    # blocks for convergence. A regression to the old 3-action shape
    # (separate prop checkpoint, or a join-based convergence count)
    # shows up here as extra eager checkpoints or counts.
    # patch the concrete class (Spark 4 splits classic/connect; the
    # abstract pyspark.sql.DataFrame's methods are overridden)
    from pyspark.sql.classic.dataframe import DataFrame

    calls = {"eager_checkpoint": 0, "count": 0}
    orig_lc, orig_count = DataFrame.localCheckpoint, DataFrame.count

    def lc(self, eager=True):
        if eager:
            calls["eager_checkpoint"] += 1
        return orig_lc(self, eager=eager)

    def cnt(self):
        calls["count"] += 1
        return orig_count(self)

    monkeypatch.setattr(DataFrame, "localCheckpoint", lc)
    monkeypatch.setattr(DataFrame, "count", cnt)

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    connected_components(df)
    # setup: 3 eager checkpoints (edge list — so an expensive edge
    # pipeline runs once, not twice in the sym union —, sym, initial
    # labels); the single edge converges in 2 rounds (change, then
    # no-change) at 2 actions each
    assert calls == {"eager_checkpoint": 3 + 2, "count": 2}
