"""asof_join operator: input validation + point-in-time semantics."""

from __future__ import annotations

import pytest

from vectordb_spark.operators.asof import asof_join


def _sides(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 15)], "k int, lt long"
    )
    right = spark.createDataFrame(
        [(1, 5, 100, "a"), (1, 20, 101, "b"), (2, 30, 102, "c")],
        "k int, rt long, rid long, val string",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _sides(spark)
    out = {
        (r.k, r.lt): r.val
        for r in asof_join(
            left, right, key="k", left_ts="lt", right_ts="rt",
            payload=["val"], right_tiebreak="rid",
        ).collect()
    }
    # k=1 @10 sees rt=5; @20 sees the exactly-simultaneous rt=20;
    # k=2 @15 has no preceding right row → null
    assert out == {(1, 10): "a", (1, 20): "b", (2, 15): None}


def test_asof_rejects_payload_collision(spark):
    left, right = _sides(spark)
    left2 = left.withColumnRenamed("lt", "val")  # collides with payload
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left2, right, key="k", left_ts="val", right_ts="rt",
            payload=["val"], right_tiebreak="rid",
        )


def test_asof_rejects_missing_columns(spark):
    left, right = _sides(spark)
    with pytest.raises(ValueError, match="left side missing"):
        asof_join(
            left, right, key="nope", left_ts="lt", right_ts="rt",
            payload=["val"], right_tiebreak="rid",
        )
    with pytest.raises(ValueError, match="right side missing"):
        asof_join(
            left, right, key="k", left_ts="lt", right_ts="rt",
            payload=["val", "ghost"], right_tiebreak="rid",
        )
