"""BM25 lexical retrieval + hybrid-fusion semantics.

Oracle parity (vs DuckDB) is covered by selfcheck / the driver gate;
these tests pin the *semantics*: score monotonicity in tf, document
length normalization, and the hybrid query's fusion arithmetic.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectordb_spark.queries.fusion import (
    _BM25_Q,
    _BM25_TERMS,
    _bm25_scored,
    _bm25_sq_expr,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    from vectordb_spark.queries import all_queries

    return all_queries()


def _py_bm25_sq(tf: int, df: int, dl: int, n: int, s: int) -> int:
    """Python mirror of _bm25_sq_expr — same op order, same rounding."""
    idf_q = math.floor(math.log((2 * n + 2) / (2 * df + 1)) * _BM25_Q)
    ratio = (22 * tf * s) / (10 * tf * s + 3 * s + 9 * dl * n)
    return math.floor(idf_q * ratio)


def test_sq_expr_matches_python_mirror(spark):
    cases = [
        (1, 10, 50, 100, 5000),
        (7, 3, 120, 500, 30000),
        (2, 499, 64, 500, 31000),  # near-stopword: tiny but positive idf
    ]
    rows = spark.createDataFrame(
        cases, "tf long, df long, dl long, n long, s long"
    ).select(F.expr(_bm25_sq_expr("tf", "df", "dl", "n", "s")).alias("sq"))
    got = [r.sq for r in rows.collect()]
    assert got == [_py_bm25_sq(*c) for c in cases]


def test_bm25_tf_monotone_and_length_normalized():
    # fixed corpus stats: more occurrences → higher score ...
    lo = _py_bm25_sq(1, 10, 50, 100, 5000)
    hi = _py_bm25_sq(5, 10, 50, 100, 5000)
    assert hi > lo > 0
    # ... and the same tf in a longer doc scores lower (b=0.75)
    short = _py_bm25_sq(3, 10, 30, 100, 5000)
    long_ = _py_bm25_sq(3, 10, 300, 100, 5000)
    assert short > long_
    # saturation: tf 1→2 gains more than tf 10→11
    assert (_py_bm25_sq(2, 10, 50, 100, 5000) - _py_bm25_sq(1, 10, 50, 100, 5000)) > (
        _py_bm25_sq(11, 10, 50, 100, 5000) - _py_bm25_sq(10, 10, 50, 100, 5000)
    )


def test_bm25_scored_matches_naive_python(spark):
    """Recompute BM25 for every doc driver-side from raw text and
    compare exactly — the whole distributed plan vs a 500-doc loop."""
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    n = len(docs)
    s = sum(len(w) for w in docs.values())
    df = {
        t: sum(1 for w in docs.values() if t in w) for t in _BM25_TERMS
    }
    expected = {}
    for doc_id, w in docs.items():
        total, terms = 0, 0
        for t in _BM25_TERMS:
            tf = w.count(t)
            if tf:
                total += _py_bm25_sq(tf, df[t], len(w), n, s)
                terms += 1
        if terms:
            expected[doc_id] = (total, terms)

    got = {
        r.doc_id: (r.bm25_q, r.n_terms)
        for r in _bm25_scored(spark, SF).collect()
    }
    assert got == expected


def test_hybrid_fuses_both_rankings(spark, qs):
    out = qs["hybrid_bm25_vector_rrf"](spark, SF).collect()
    assert len(out) == 10
    # fused score strictly equals the two-term RRF recomputation
    for r in out:
        want = (1.0 / (60 + r.r_lex) if r.r_lex is not None else 0.0) + (
            1.0 / (60 + r.r_sem) if r.r_sem is not None else 0.0
        )
        assert r.rrf == pytest.approx(want, abs=0.0)
    # descending, tie-broken by doc_id
    keys = [(-r.rrf, r.doc_id) for r in out]
    assert keys == sorted(keys)
