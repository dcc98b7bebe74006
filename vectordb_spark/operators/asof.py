"""Distributed as-of join — "for each left row, the latest right row
at or before it" (point-in-time lookup).

The reference engine has no join at all (SURVEY.md §2.3); this is a
pipeline extension in the spirit of kdb's ``aj`` / pandas
``merge_asof`` / DuckDB's ``ASOF JOIN``, built the way it scales on
Spark: NOT as an inequality join (Catalyst would plan
BroadcastNestedLoopJoin — O(n·m) and a single-executor bottleneck),
but as the union-and-window formulation:

1. union both sides into one relation tagged ``_side`` (0 = right,
   1 = left), with right-side payload columns null on left rows;
2. one shuffle: partition by the equality key, sort by
   (timestamp, _side, tiebreak);
3. ``last(payload, ignorenulls=True)`` over rows UNBOUNDED
   PRECEDING..CURRENT carries the most recent right payload forward
   onto every left row;
4. keep the left rows.

Cost is one shuffle of |L|+|R| narrow rows — the same price as a plain
equi-join on the key — and skew follows the key distribution, not the
time range. Ordering (ts, _side, tiebreak) makes the semantics exact:
a right row at exactly the left timestamp IS visible (asof ≤), and
ties among right rows resolve to the greatest tiebreak value,
deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    right_tiebreak: str,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``payload`` columns
    from the latest ``right`` row with the same ``key`` and
    ``right_ts`` <= ``left_ts`` (nulls when none precedes it).

    ``left_ts`` / ``right_ts`` must be mutually comparable (use one
    integer epoch domain — µs — for mixed ns/µs sources).
    ``right_tiebreak`` breaks equal-timestamp ties (max wins) and makes
    the result deterministic.

    Raises ``ValueError`` on column-name collisions or missing columns
    instead of silently nulling out left data (the union formulation
    would otherwise overwrite a left column that shares a payload name).
    """
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"payload columns collide with left columns: {sorted(clash)}"
        )
    missing_l = [c for c in (key, left_ts) if c not in left.columns]
    if missing_l:
        raise ValueError(f"left side missing columns: {missing_l}")
    missing_r = [
        c
        for c in (key, right_ts, right_tiebreak, *payload)
        if c not in right.columns
    ]
    if missing_r:
        raise ValueError(f"right side missing columns: {missing_r}")
    lcols = left.columns
    l = (
        left.withColumn("_t", F.col(left_ts))
        .withColumn("_side", F.lit(1))
        .withColumn("_tb", F.lit(None).cast(right.schema[right_tiebreak].dataType))
    )
    for p in payload:
        l = l.withColumn(p, F.lit(None).cast(right.schema[p].dataType))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_tiebreak).alias("_tb"),
        *[F.col(p) for p in payload],
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.select(*lcols, "_t", "_side", "_tb", *[p for p in payload if p not in lcols]).unionByName(
        r.select(*lcols, "_t", "_side", "_tb", *[p for p in payload if p not in lcols])
    )
    # right rows (side 0) sort before left rows at the same timestamp →
    # an exactly-simultaneous right row is matched; among right ties the
    # largest tiebreak lands last → last() picks it
    w = (
        W.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select(
        *lcols,
        "_side",
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
    )
    return filled.where(F.col("_side") == 1).drop("_side")
