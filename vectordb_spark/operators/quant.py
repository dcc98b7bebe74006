"""Int8 scalar quantization (SQ8) for embedding columns — the
storage/bandwidth tier of vector search at 100 TB.

A float32 embedding column dominates scan cost; symmetric per-vector
int8 quantization cuts the scanned bytes 4× at a small ranking-accuracy
cost, and the standard answer to that cost is QUANTIZED SCAN → EXACT
RE-RANK: rank everything by the int8 approximation, keep a small
candidate multiple of k, re-rank only those with the true float
distance. (The reference keeps full float32 vectors and SIMD kernels —
distance_simd.cpp; SQ8-with-re-rank is how IVF/Faiss-style engines
spend that memory budget instead, and it maps onto Spark as two
TakeOrderedAndProject passes, the second over ≤ refine·k rows.)

Quantization: scale = max|x| / 127 per vector; q_i = floor(x_i/scale
+ 0.5) (half-toward-+inf — identical in Spark and DuckDB, unlike
round-half-even). Dequantized x ≈ q_i · scale, so
dot(a, b) ≈ int_dot(qa, qb) · scale_a · scale_b — the int dot is exact
64-bit integer arithmetic, making the approximate score bit-identical
across engines and the whole operator oracle-checkable.
"""

from __future__ import annotations

import math

_EPS = 1e-30  # zero-vector guard


def quant_scale_exprs(vec_col: str) -> tuple[str, str]:
    """(spark, duck) expression for the per-vector scale = max|x|/127."""
    return (
        f"greatest(array_max(transform({vec_col}, x -> abs(CAST(x AS DOUBLE)))), {_EPS}) / 127.0",
        f"greatest(list_max(list_transform({vec_col}, x -> abs(CAST(x AS DOUBLE)))), {_EPS}) / 127.0",
    )


def quantize_exprs(vec_col: str, scale_col: str) -> tuple[str, str]:
    """(spark, duck) expression for the int8 code array (as BIGINT
    elements — the arithmetic domain; storage casts to tinyint)."""
    return (
        f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) / {scale_col} + 0.5) AS BIGINT))",
        f"list_transform({vec_col}, x -> floor(CAST(x AS DOUBLE) / {scale_col} + 0.5)::BIGINT)",
    )


def int_dot_exprs(q_col: str, q_literal: list[int]) -> tuple[str, str]:
    """(spark, duck) exact integer dot of a code column with a
    quantized query literal."""
    lit_s = "array(" + ", ".join(f"CAST({v} AS BIGINT)" for v in q_literal) + ")"
    lit_d = "[" + ", ".join(str(v) for v in q_literal) + "]::BIGINT[]"
    return (
        f"aggregate(zip_with({q_col}, {lit_s}, (x, y) -> x * y), CAST(0 AS BIGINT), (a, b) -> a + b)",
        f"list_reduce(list_transform(list_zip({q_col}, {lit_d}), p -> p[1] * p[2]), (a, b) -> a + b)",
    )


def quantize_vector(vec: list[float]) -> tuple[list[int], float]:
    """Driver-side twin of quantize_exprs for the query vector."""
    scale = max(max(abs(float(x)) for x in vec), _EPS) / 127.0
    return [int(math.floor(float(x) / scale + 0.5)) for x in vec], scale
