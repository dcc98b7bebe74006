"""Physical-plan assertions — the ".explain and iterate" discipline as
code. A query that silently loses its pushdown or broadcasts a fact
table fails CI, not a 100 TB run."""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_of(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> str:
    plan = plan_of(df)
    assert "PushedFilters: [" in plan, f"no pushed filters in plan:\n{plan}"
    for frag in fragments:
        assert frag in plan, f"expected pushed filter {frag!r} in plan:\n{plan}"
    return plan


def assert_take_ordered(df: DataFrame) -> str:
    """orderBy+limit must plan as TakeOrderedAndProject (per-partition
    top-K heaps + driver merge), never a global Sort + Limit."""
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan, f"no TakeOrderedAndProject:\n{plan}"
    return plan


def assert_broadcast_join(df: DataFrame) -> str:
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan, f"no broadcast join:\n{plan}"
    return plan


def assert_no_cartesian(df: DataFrame) -> str:
    plan = plan_of(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"nested-loop join in plan:\n{plan}"
    )
    return plan


def assert_read_schema_pruned(df: DataFrame, max_cols: int, table_hint: str = "") -> str:
    """Column pruning reached the scan: ReadSchema lists at most
    ``max_cols`` fields."""
    plan = plan_of(df)
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:") and (not table_hint or table_hint in plan):
            schema_part = line.split("struct<", 1)
            if len(schema_part) == 2:
                ncols = schema_part[1].count(":")
                assert ncols <= max_cols, (
                    f"scan reads {ncols} columns (> {max_cols}):\n{line}"
                )
    return plan
