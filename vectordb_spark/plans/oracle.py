"""DuckDB oracle SQL fragments that reproduce the engine's Spark
expressions bit-for-bit.

The driver compares every ``queries()`` result against ``oracle_sql()``
via DuckDB (row count + schema + order-insensitive value hash), so any
float math must be *identical*, not just close. Rules used throughout:

- Dense distances: Spark ``aggregate(zip_with(...), 0.0, acc+x)`` is a
  sequential left fold in double; DuckDB
  ``list_reduce(list_transform(list_zip(a,b), ...), (acc,x) -> acc+x)``
  folds in the same order → bit-identical (verified empirically).
- Order-dependent float aggregates (SUM/AVG over doubles) are computed
  on DECIMAL-cast inputs in both engines: decimal addition is exact and
  associative, so partition order stops mattering; the final cast back
  to DOUBLE is a single deterministic rounding.
- Timestamps never leave as raw timestamps — formatted to strings with
  matching patterns on both sides.
"""

from __future__ import annotations

from collections.abc import Sequence


def duck_l2_sq(a: str, b: str) -> str:
    """Squared L2 over two list columns, matching functions.distance.l2_squared."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
        f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x)"
    )


def duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)"
    )


def duck_neg_dot(a: str, b: str) -> str:
    """DOT_PRODUCT distance = -dot (reference vector.cpp:7-9)."""
    return f"-({duck_dot(a, b)})"


def duck_cosine_distance(a: str, b: str, *, normalized: bool = True) -> str:
    if normalized:
        return f"1.0 - ({duck_dot(a, b)})"
    return (
        f"1.0 - ({duck_dot(a, b)}) / "
        f"(sqrt({duck_dot(a, a)}) * sqrt({duck_dot(b, b)}))"
    )


def duck_vector_literal(values: Sequence[float]) -> str:
    return "[" + ", ".join(repr(float(v)) for v in values) + "]::DOUBLE[]"


def dec_sum(expr: str, scale: int = 4) -> str:
    """Order-independent SUM of a double expression via exact decimal
    accumulation; result cast back to DOUBLE."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"


def dec_avg(expr: str, scale: int = 4) -> str:
    """AVG as exact-decimal sum / count — one deterministic division."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE) "
        f"/ COUNT(*)"
    )
