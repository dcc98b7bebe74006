"""Property-based cross-engine equivalence: random filter expressions
from the reference grammar must select identical row sets when compiled
to a Catalyst Column and to DuckDB oracle SQL. This is the fuzzing arm
of the dual-compilation design."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from vectordb_spark.expr import parse_filter, to_duckdb_sql, to_spark_column
from vectordb_spark.schema import FieldType as FT, VectorDBError

FIELDS = {"i32": FT.INT4, "f64": FT.DOUBLE, "name": FT.STRING, "flag": FT.BOOL}

ROWS = [
    (i, i - 8, (i * 7 % 23) * 0.5 - 3.0, n, i % 3 == 0)
    for i, n in enumerate(
        ["Berlin", "London", "Moscow", "", "O'Brien", "san jose", "SAN", "x_y",
         "a%b", "zz", "Berlin", "lon"] * 2
    )
]
PDF = pd.DataFrame(ROWS, columns=["rid", "i32", "f64", "name", "flag"])

# ---------------------------------------------------- expression grammar

_num_atom = st.one_of(
    st.integers(min_value=-9, max_value=99).map(str),
    st.sampled_from(["0.5", "2.25", "-1.5", "3.0", "10.125"]),
    st.sampled_from(["i32", "f64"]),
)
_arith_op = st.sampled_from(["+", "-", "*", "/", "%"])


@st.composite
def _num_expr(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        return draw(_num_atom)
    a = draw(_num_expr(depth=depth - 1))
    b = draw(_num_expr(depth=depth - 1))
    op = draw(_arith_op)
    return f"({a} {op} {b})"


_str_lit = st.sampled_from(
    ["'Berlin'", "'lon'", "''", "'O\\'Brien'", "'san%'", "'_AN'", "'a%b'"]
)


@st.composite
def _bool_expr(draw, depth=2):
    choice = draw(st.integers(min_value=0, max_value=6))
    if choice == 0:
        a, b = draw(_num_expr()), draw(_num_expr())
        op = draw(st.sampled_from(["<", "<=", "=", ">=", ">", "<>"]))
        return f"({a} {op} {b})"
    if choice == 1:
        lit = draw(_str_lit)
        op = draw(st.sampled_from(["=", "<>"]))
        return f"(name {op} {lit})"
    if choice == 2:
        return f"(name LIKE {draw(_str_lit)})"
    if choice == 3:
        lits = draw(st.lists(_str_lit, min_size=1, max_size=3))
        return f"name IN ({', '.join(lits)})"
    if choice == 4:
        return "flag"
    if depth == 0:
        return "flag"
    if choice == 5:
        return f"(NOT {draw(_bool_expr(depth=depth - 1))})"
    a = draw(_bool_expr(depth=depth - 1))
    b = draw(_bool_expr(depth=depth - 1))
    return f"({a} {draw(st.sampled_from(['AND', 'OR']))} {b})"


@pytest.fixture(scope="module")
def sdf(spark):
    df = spark.createDataFrame(
        PDF, "rid long, i32 long, f64 double, name string, flag boolean"
    )
    df = df.cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("t", PDF)
    return con


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=_num_expr())
def test_random_numeric_projections_agree(sdf, duck, expr):
    """Numeric expressions (not just booleans) must produce
    bit-identical doubles through both compilers — this is what the
    facet-aggregate path evaluates."""
    try:
        ast = parse_filter(expr, FIELDS, check_bool=False)
    except VectorDBError:
        return
    from pyspark.sql import functions as F

    spark_vals = {
        r.rid: r.v
        for r in sdf.select(
            "rid", to_spark_column(ast).cast("double").alias("v")
        ).collect()
    }
    sql = to_duckdb_sql(ast)
    duck_vals = {
        r[0]: r[1]
        for r in duck.execute(
            f"SELECT rid, CAST({sql} AS DOUBLE) FROM t"
        ).fetchall()
    }
    for rid, sv in spark_vals.items():
        dv = duck_vals[rid]
        assert (sv is None and dv is None) or sv == dv, (
            f"expr={expr!r} rid={rid}: spark={sv!r} duck={dv!r}"
        )


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(expr=_bool_expr())
def test_random_filters_agree(sdf, duck, expr):
    try:
        ast = parse_filter(expr, FIELDS)
    except VectorDBError:
        return  # grammar corner the reference rejects too — fine
    spark_ids = {
        r.rid for r in sdf.where(to_spark_column(ast)).select("rid").collect()
    }
    sql = to_duckdb_sql(ast)
    duck_ids = {
        r[0] for r in duck.execute(f"SELECT rid FROM t WHERE {sql}").fetchall()
    }
    assert spark_ids == duck_ids, f"expr={expr!r}\nsql={sql}"
