"""Shunting-yard parser + typed AST for the filter language.

Mirrors reference semantics (engine/query/expr/expr.cpp:295-726):
precedence (logical < compare < LIKE/IN < add < mul), NOT as a unary
operator at logical precedence, type compatibility per CheckCompatible
(expr.cpp:387-450), IN restricted to string attributes, NEARBY argument
validation with lat/lon range checks, JSON/vector fields rejected in
expressions.
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass, field

from vectordb_spark.expr.lexer import (
    is_operator_token,
    precedence,
    tokenize,
)
from vectordb_spark.schema import FieldType, invalid_expr, not_implemented

_UNSUPPORTED = {"ALL", "ANY", "BETWEEN", "EXISTS", "SOME"}
_INT_RE = re.compile(r"^[-+]?\d+$")
_DOUBLE_RE = re.compile(r"^[-+]?\d+\.\d+(?:[eE][-+]?\d+)?$|^[-+]?\d+[eE][-+]?\d+$")


class ValueType(enum.Enum):
    INT = "INT"
    DOUBLE = "DOUBLE"
    STRING = "STRING"
    BOOL = "BOOL"
    GEO_POINT = "GEO_POINT"


@dataclass
class Node:
    vtype: ValueType


@dataclass
class Const(Node):
    value: object  # int | float | str | bool


@dataclass
class Attr(Node):
    name: str
    ftype: FieldType | None = None  # None for @distance


@dataclass
class Unary(Node):
    op: str
    child: Node = None  # type: ignore[assignment]


@dataclass
class Binary(Node):
    op: str
    left: Node = None  # type: ignore[assignment]
    right: Node = None  # type: ignore[assignment]


@dataclass
class InList(Node):
    attr: Attr = None  # type: ignore[assignment]
    items: list[str] = field(default_factory=list)


@dataclass
class Nearby(Node):
    field_name: str = ""
    lat: float = 0.0
    lon: float = 0.0
    radius_km: float = 0.0


_ATTR_VALUE_TYPES = {
    FieldType.INT1: ValueType.INT,
    FieldType.INT2: ValueType.INT,
    FieldType.INT4: ValueType.INT,
    FieldType.INT8: ValueType.INT,
    FieldType.FLOAT: ValueType.DOUBLE,
    FieldType.DOUBLE: ValueType.DOUBLE,
    FieldType.BOOL: ValueType.BOOL,
    FieldType.STRING: ValueType.STRING,
}

_COMPARE_OPS = {">", ">=", "=", "<=", "<", "<>"}
_ARITH_OPS = set("+-*/%")


def _shunting_yard(tokens: list[str]) -> list[str]:
    out: list[str] = []
    stack: list[str] = []
    for tok in tokens:
        if tok == "(":
            stack.append(tok)
        elif tok == ")":
            while stack and stack[-1] != "(":
                out.append(stack.pop())
            if not stack:
                raise invalid_expr("Filter expression is invalid.")
            stack.pop()
        elif is_operator_token(tok):
            while stack and precedence(stack[-1]) >= precedence(tok):
                out.append(stack.pop())
            stack.append(tok)
        else:
            out.append(tok)
    while stack:
        tok = stack.pop()
        if tok == "(":
            raise invalid_expr("Filter expression is invalid.")
        out.append(tok)
    return out


def _check_compatible(op: str, left: ValueType, right: ValueType) -> ValueType:
    """Type-compat rules, reference CheckCompatible expr.cpp:387-450."""
    if op in ("AND", "OR"):
        if left != ValueType.BOOL or right != ValueType.BOOL:
            raise invalid_expr(f"{op} statement is invalid.")
        return ValueType.BOOL
    if op in _COMPARE_OPS:
        if op not in ("=", "<>"):
            if ValueType.STRING in (left, right) or ValueType.BOOL in (left, right):
                raise invalid_expr(f"{op} statement is invalid.")
        else:
            if left != right:
                numeric = {ValueType.INT, ValueType.DOUBLE}
                if not (left in numeric and right in numeric):
                    raise invalid_expr(f"{op} statement is invalid.")
        return ValueType.BOOL
    if op in _ARITH_OPS:
        if ValueType.BOOL in (left, right):
            raise invalid_expr(f"Boolean value is not compatible with {op} operation.")
        if op != "+":
            if ValueType.STRING in (left, right):
                raise invalid_expr(
                    f"String value is not compatible with {op} operation."
                )
            return (
                ValueType.DOUBLE
                if ValueType.DOUBLE in (left, right)
                else ValueType.INT
            )
        if left == ValueType.STRING and right == ValueType.STRING:
            return ValueType.STRING
        if ValueType.STRING in (left, right):
            raise invalid_expr(f"{op} statement is invalid.")
        return ValueType.DOUBLE if ValueType.DOUBLE in (left, right) else ValueType.INT
    if op == "LIKE":
        if left != ValueType.STRING or right != ValueType.STRING:
            raise invalid_expr("LIKE statement is invalid.")
        return ValueType.BOOL
    raise invalid_expr(f"'{op}' is an invalid operator.")


def _leaf(token: str, field_map: dict[str, FieldType]) -> Node:
    if token in ("TRUE", "FALSE"):
        return Const(ValueType.BOOL, token == "TRUE")
    if token.startswith("'"):
        return Const(ValueType.STRING, token[1:-1])
    if _INT_RE.match(token):
        return Const(ValueType.INT, int(token))
    if _DOUBLE_RE.match(token):
        return Const(ValueType.DOUBLE, float(token))
    if token == "@distance":
        return Attr(ValueType.DOUBLE, "@distance", None)
    if token not in field_map:
        raise invalid_expr(
            f"Invalid filter expression: field name '{token}' not found."
        )
    ftype = field_map[token]
    if ftype not in _ATTR_VALUE_TYPES:
        # JSON / vectors / geo not addressable (reference expr.cpp:672-673)
        raise invalid_expr(
            f"Type of field '{token}' is not supported in filter expression."
        )
    return Attr(_ATTR_VALUE_TYPES[ftype], token, ftype)


def _parse_nearby(token: str, field_map: dict[str, FieldType]) -> Nearby:
    args_str = token[len("NEARBY("):-1]
    args = [a.strip() for a in args_str.split(",")]
    if len(args) != 4:
        raise invalid_expr("Wrong number of arguments in NEARBY function.")
    geo_attr, lat_s, lon_s, dist_s = args
    if geo_attr not in field_map:
        raise invalid_expr(
            f"Invalid filter expression: field name '{geo_attr}' not found."
        )
    if field_map[geo_attr] != FieldType.GEO_POINT:
        raise invalid_expr(f"Type of field '{geo_attr}' is not a GEO_POINT.")
    for idx, a in enumerate((lat_s, lon_s, dist_s), start=2):
        if not (_INT_RE.match(a) or _DOUBLE_RE.match(a)):
            raise invalid_expr(
                f"Invalid filter expression: argument {idx} is not a valid number."
            )
    lat, lon, radius = float(lat_s), float(lon_s), float(dist_s)
    if not -90.0 <= lat <= 90.0:
        raise invalid_expr(
            "Invalid filter expression: latitude should be in the range of [-90, 90]."
        )
    if not -180.0 <= lon <= 180.0:
        raise invalid_expr(
            "Invalid filter expression: longitude should be in the range of [-180, 180]."
        )
    return Nearby(ValueType.BOOL, geo_attr, lat, lon, radius)


def parse_filter(
    expression: str,
    field_map: dict[str, FieldType],
    *,
    check_bool: bool = True,
) -> Node | None:
    """Parse a filter expression into a typed AST.

    Returns None for the empty expression (means "no filter", reference
    expr.cpp:700-703).
    """
    if expression == "":
        return None
    tokens = tokenize(expression)
    postfix = _shunting_yard(tokens)

    stack: list[Node] = []
    for tok in postfix:
        if tok in _UNSUPPORTED:
            raise not_implemented(f"Epsilla does not support {tok} yet.")
        if tok == "NOT":
            if not stack:
                raise invalid_expr("Filter expression is invalid.")
            child = stack.pop()
            if child.vtype != ValueType.BOOL:
                raise invalid_expr("NOT statement is invalid.")
            stack.append(Unary(ValueType.BOOL, "NOT", child))
        elif tok == "IN":
            if len(stack) < 2:
                raise invalid_expr("Not enough operands for IN operator.")
            items: list[str] = []
            while stack and not (
                isinstance(stack[-1], Attr) and stack[-1].vtype == ValueType.STRING
            ):
                node = stack.pop()
                if not (isinstance(node, Const) and node.vtype == ValueType.STRING):
                    raise invalid_expr(
                        "IN operation is only supported for string attributes."
                    )
                items.append(node.value)  # type: ignore[arg-type]
            if not stack:
                raise invalid_expr(
                    "IN operation is only supported for string attributes."
                )
            attr = stack.pop()
            items.reverse()
            stack.append(InList(ValueType.BOOL, attr, items))
        elif is_operator_token(tok):
            if len(stack) < 2:
                raise invalid_expr("Filter expression is invalid.")
            right = stack.pop()
            left = stack.pop()
            vtype = _check_compatible(tok, left.vtype, right.vtype)
            stack.append(Binary(vtype, tok, left, right))
        elif tok.startswith("NEARBY(") or tok.startswith("NEARBY ("):
            stack.append(_parse_nearby(tok, field_map))
        else:
            stack.append(_leaf(tok, field_map))

    if len(stack) != 1:
        raise invalid_expr("Filter expression is invalid.")
    root = stack[0]
    if check_bool and root.vtype != ValueType.BOOL:
        raise invalid_expr("Filter should be a boolean expression,")
    return root
