"""Lexical (BM25) ranking expressions shared by the query layer and the
Table text index.

BM25 parameters are carried as exact rationals: k1 = 1.2 = 12/10,
b = 0.75 = 3/4, so k1*(1-b) = 3/10, k1*b = 9/10, k1+1 = 22/10. With
avgdl = S/N (S = corpus token count, N = doc count) the per-term
normalization

    tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)

multiplies through by 10*S into an EXACT integer ratio

    (22*tf*S) / (10*tf*S + 3*S + 9*dl*N)

whose one double division is correctly rounded — identical in Spark,
DuckDB, and Python. idf = ln(1 + (N-df+0.5)/(df+0.5)) = ln((2N+2)/(2df+1))
— again an exact integer ratio — is floored onto a 1e-6 grid (the
text_lm_perplexity discipline: engines disagree about ln only in the
last ulp, and a 1-ulp flip crosses a 1e-6 bucket with probability
~2e-10), so the per-doc score is an order-free BIGINT sum and the
oracle gate hashes exactly. A 100 TB production deployment would use
the plain double avgdl form; the rationalization exists for the gate.
"""

from __future__ import annotations

BM25_Q = 1_000_000  # idf quantization grid (1e-6 nats)


def bm25_sq_expr(tf: str, df: str, dl: str, n: str, s: str) -> str:
    """Quantized per-(doc, term) BM25 contribution — valid as both
    Spark SQL and DuckDB SQL. All five inputs must be integer-typed
    expressions; the result is a BIGINT safe to SUM in any order."""
    idf_q = (
        f"floor(ln(CAST(2 * {n} + 2 AS DOUBLE) / "
        f"CAST(2 * {df} + 1 AS DOUBLE)) * {BM25_Q})"
    )
    ratio = (
        f"(CAST(22 * {tf} * {s} AS DOUBLE) / "
        f"CAST(10 * {tf} * {s} + 3 * {s} + 9 * {dl} * {n} AS DOUBLE))"
    )
    return f"CAST(floor({idf_q} * {ratio}) AS BIGINT)"
