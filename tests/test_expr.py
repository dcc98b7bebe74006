"""Filter-language unit tests — grammar, typing, and error parity
(FIXTURES.md F6; reference engine/query/expr)."""

from __future__ import annotations

import pytest

from vectordb_spark.expr.lexer import tokenize
from vectordb_spark.expr.parser import parse_filter, Binary, Const, InList, Unary, ValueType
from vectordb_spark.expr.compile import references_distance, to_duckdb_sql
from vectordb_spark.schema import FieldType as FT, VectorDBError

FIELDS = {
    "id": FT.INT8,
    "tiny": FT.INT1,
    "i32": FT.INT4,
    "f32": FT.FLOAT,
    "f64": FT.DOUBLE,
    "flag": FT.BOOL,
    "name": FT.STRING,
    "meta": FT.JSON,
    "vec": FT.VECTOR_FLOAT,
    "loc": FT.GEO_POINT,
}


def test_tokenize_basics():
    assert tokenize("i32 + 5 * 2 > 20") == ["i32", "+", "5", "*", "2", ">", "20"]
    assert tokenize("name = 'O\\'Brien'") == ["name", "=", "'O'Brien'"]
    assert tokenize("-3 < i32") == ["-3", "<", "i32"]
    assert tokenize("i32 - 3") == ["i32", "-", "3"]
    assert tokenize("name IN ('a','b')") == ["name", "IN", "(", "'a'", "'b'", ")"]
    assert tokenize("not flag") == ["NOT", "flag"]


def test_tokenize_scientific():
    assert tokenize("f64 > 1.5e-2") == ["f64", ">", "1.5e-2"]


def test_precedence_mul_over_add():
    ast = parse_filter("i32 + 5 * 2 > 20", FIELDS)
    assert isinstance(ast, Binary) and ast.op == ">"
    left = ast.left
    assert isinstance(left, Binary) and left.op == "+"
    assert isinstance(left.right, Binary) and left.right.op == "*"


def test_not_precedence():
    ast = parse_filter("NOT flag AND i32 <> 3", FIELDS)
    # NOT binds at logical precedence → (NOT flag) AND (i32 <> 3)
    assert isinstance(ast, Binary) and ast.op == "AND"
    assert isinstance(ast.left, Unary) and ast.left.op == "NOT"


def test_type_results():
    assert parse_filter("i32 / 2 > 1", FIELDS).vtype == ValueType.BOOL
    assert parse_filter("i32 + 1.5 > 0", FIELDS) is not None
    assert parse_filter("name = 'a' + 'b'", FIELDS) is not None


@pytest.mark.parametrize(
    "expr,code",
    [
        ("i32 & 1", "NOT_IMPLEMENTED_ERROR"),        # bitwise
        ("i32 += 1", "NOT_IMPLEMENTED_ERROR"),       # compound
        ("id BETWEEN 1 AND 2", "NOT_IMPLEMENTED_ERROR"),
        ("EXISTS (name)", "NOT_IMPLEMENTED_ERROR"),
        ("unknown_col = 1", "INVALID_EXPR"),         # unknown field
        ("meta = 'x'", "INVALID_EXPR"),              # JSON opaque
        ("vec = 1", "INVALID_EXPR"),                 # vector not addressable
        ("flag + 1 > 0", "INVALID_EXPR"),            # bool arithmetic
        ("name > 'a'", "INVALID_EXPR"),              # string ordering compare
        ("name = 1", "INVALID_EXPR"),                # string vs int equality
        ("i32 - 'a' > 0", "INVALID_EXPR"),           # string arith (non-+)
        ("i32 IN ('a')", "INVALID_EXPR"),            # IN on non-string attr
        ("i32", "INVALID_EXPR"),                     # filter must be bool
        ("NOT i32", "INVALID_EXPR"),                 # NOT needs bool
        ("NEARBY(loc, 95.0, 0.0, 10)", "INVALID_EXPR"),   # lat out of range
        ("NEARBY(loc, 0.0, 181.0, 10)", "INVALID_EXPR"),  # lon out of range
        ("NEARBY(name, 0.0, 0.0, 10)", "INVALID_EXPR"),   # not a GEO_POINT
        ("NEARBY(loc, 1, 2)", "INVALID_EXPR"),            # arity
    ],
)
def test_error_parity(expr, code):
    with pytest.raises(VectorDBError) as ei:
        parse_filter(expr, FIELDS)
    assert ei.value.code == code


def test_in_list_numeric_rejected_at_tokenizer():
    with pytest.raises(VectorDBError) as ei:
        parse_filter("name IN (1, 2)", FIELDS)
    assert ei.value.code == "INVALID_EXPR"


def test_empty_filter_is_none():
    assert parse_filter("", FIELDS) is None


def test_references_distance():
    assert references_distance(parse_filter("@distance < 0.5", FIELDS))
    assert not references_distance(parse_filter("i32 > 0", FIELDS))
    assert references_distance(
        parse_filter("i32 > 0 AND @distance + 1.0 < 2.0", FIELDS)
    )


def test_duckdb_sql_shape():
    sql = to_duckdb_sql(parse_filter("name LIKE 'San%' AND i32 % 3 = 0", FIELDS))
    assert "LIKE 'San%'" in sql
    # % stays the operator (C-fmod in DuckDB); fmod() there is
    # floored-mod and would diverge on negative operands
    assert "% nullif" in sql


def test_nearby_parses():
    ast = parse_filter("NEARBY(loc, 34.0522, -118.2437, 150)", FIELDS)
    from vectordb_spark.expr.parser import Nearby

    assert isinstance(ast, Nearby)
    assert ast.radius_km == 150.0


def test_in_items_order():
    ast = parse_filter("name IN ('x', 'y', 'z')", FIELDS)
    assert isinstance(ast, InList)
    assert ast.items == ["x", "y", "z"]


def test_spark_column_eval(spark):
    """End-to-end: parsed filter actually executes on a DataFrame."""
    from vectordb_spark.expr.compile import to_spark_column

    df = spark.createDataFrame(
        [(1, "Berlin", 1.0, True), (2, "London", 2.5, False), (3, "O'Brien", -3.0, True)],
        "id long, name string, score double, flag boolean",
    )
    fm = {"id": FT.INT8, "name": FT.STRING, "score": FT.DOUBLE, "flag": FT.BOOL}

    def run(f):
        return sorted(
            r.id for r in df.where(to_spark_column(parse_filter(f, fm))).collect()
        )

    assert run("id <= 2") == [1, 2]
    assert run("name LIKE '%ondon'") == [2]
    assert run("name = 'O\\'Brien'") == [3]
    # fmod keeps the dividend's sign: fmod(-3,2) = -1 < 1; fmod(1,2) = 1
    assert run("score % 2.0 < 1.0 AND flag") == [3]
    assert run("NOT flag OR score < 0") == [2, 3]
    assert run("name IN ('Berlin', 'London')") == [1, 2]
    assert run("id / 2 > 1") == [3]  # double division: 3/2=1.5>1
    assert run("-2 < score") == [1, 2]
