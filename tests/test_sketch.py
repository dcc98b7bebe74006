"""Sketch operators: cross-engine hash parity, HLL accuracy across
scales, CMS one-sided error — the properties the oracle gate's single
corpus can't cover."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from vectordb_spark.operators.sketch import (
    BLOOM_K,
    CMS_D,
    HLL_M,
    HLL_W,
    bloom_pos_py,
    cms_slot_py,
    cms_slot_sql,
    hll_bucket_sql,
    hll_estimate_py,
    hll_rank_py,
    hll_rank_sql,
    lcg2_py,
    lcg2_sql,
)


def test_sql_hash_matches_python(spark):
    """The SQL expressions and the Python mirror are the same
    function — on negatives, zero, and large ids too."""
    xs = [0, 1, -1, 5, 149, 2**31 - 2, 2**40 + 7, -(2**35)] + [
        random.Random(3).randrange(-(2**45), 2**45) for _ in range(50)
    ]
    rows = (
        spark.createDataFrame([(x,) for x in xs], "x long")
        .select(
            F.expr(lcg2_sql("x")).alias("h"),
            F.expr(lcg2_sql("x", salt=1_000_003)).alias("hs"),
            F.expr(hll_bucket_sql("x")).alias("b"),
            F.expr(hll_rank_sql("x")).alias("r"),
            F.expr(cms_slot_sql("x", 2)).alias("s2"),
        )
        .collect()
    )
    for x, row in zip(xs, rows):
        assert row.h == lcg2_py(x), x
        assert row.hs == lcg2_py(x, salt=1_000_003), x
        assert row.b == lcg2_py(x) % HLL_M, x
        assert row.r == hll_rank_py(x), x
        assert row.s2 == cms_slot_py(x, 2), x


def test_hll_accuracy_across_scales():
    """Relative error within ~3 standard errors (1.04/sqrt(64) = 13%)
    across 3 decades — the quadratic mixer's scatter is real (a linear
    map measured +68% here)."""
    for n in (100, 1_000, 10_000, 100_000):
        regs: dict[int, int] = {}
        for x in range(n):
            h = lcg2_py(x)
            b = h % HLL_M
            r = hll_rank_py(x)
            regs[b] = max(regs.get(b, 0), r)
        est = hll_estimate_py(regs)
        assert abs(est - n) / n < 0.40, (n, est)


def test_hll_register_merge_is_associative():
    """Fixed-state claim: registers from two disjoint halves merge by
    elementwise max into exactly the full-data registers — the
    property that makes the build an ordinary partial aggregate."""
    n = 5_000
    full: dict[int, int] = {}
    a: dict[int, int] = {}
    b: dict[int, int] = {}
    for x in range(n):
        tgt = a if x % 2 else b
        bkt, r = lcg2_py(x) % HLL_M, hll_rank_py(x)
        tgt[bkt] = max(tgt.get(bkt, 0), r)
        full[bkt] = max(full.get(bkt, 0), r)
    merged = {
        k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)
    }
    assert merged == full
    assert hll_estimate_py(merged) == hll_estimate_py(full)


def test_cms_one_sided_error():
    """est >= exact always; equality for keys with no collisions."""
    rng = random.Random(11)
    stream = [rng.randrange(200) for _ in range(20_000)]
    counters = [[0] * 512 for _ in range(CMS_D)]
    for x in stream:
        for row in range(CMS_D):
            counters[row][cms_slot_py(x, row)] += 1
    exact: dict[int, int] = {}
    for x in stream:
        exact[x] = exact.get(x, 0) + 1
    for k, c in exact.items():
        est = min(counters[row][cms_slot_py(k, row)] for row in range(CMS_D))
        assert est >= c, k
        # CMS guarantee: err <= eps * N with eps = e/w, here generous
        assert est - c <= math.e / 512 * len(stream) * 3, k


def _bloom_member(bits: set[int], key: int) -> bool:
    return all(bloom_pos_py(key, i) in bits for i in range(BLOOM_K))


def test_bloom_never_false_negative_and_fp_bounded():
    """Soundness of bloom-prune-then-verify: every build key passes
    membership (zero false negatives, by construction — asserted over
    a dense filter where false POSITIVES do occur), and the FP rate on
    non-members stays near the classical (1 - e^{-kn/m})^k bound."""
    rng = random.Random(7)
    build = {rng.randrange(1 << 50) for _ in range(4_000)}  # dense: n/m ≈ 0.5
    bits = {bloom_pos_py(k, i) for k in build for i in range(BLOOM_K)}
    for k in build:
        assert _bloom_member(bits, k)
    probes = [rng.randrange(1 << 50) for _ in range(20_000)]
    fp = sum(1 for p in probes if p not in build and _bloom_member(bits, p))
    n_neg = sum(1 for p in probes if p not in build)
    # k=3, n=4000, m=8192 → theoretical fp ≈ 0.35; demand < 2x of it
    assert 0 < fp / n_neg < 0.70, fp / n_neg


def test_bloom_gate_true_subset_of_candidates(spark):
    """Per-source n_true <= n_candidates on the gate query — the
    no-false-negative guarantee surfaced by the driver row."""
    from vectordb_spark.queries.sketch import sketch_bloom_prune_join

    rows = sketch_bloom_prune_join(spark, "/root/testdata/sf0.001").collect()
    assert rows, "gate returned no per-source rows"
    for r in rows:
        assert r["n_true"] <= r["n_candidates"] <= r["n_probe"], r


def test_hdr_bucket_error_bound_and_monotonicity():
    """Bucket lower bounds are monotone in bucket id and the relative
    bucket width never exceeds 1/16 (the by-construction accuracy of
    the quantile estimate)."""
    from vectordb_spark.operators.sketch import hdr_bucket_lb_py

    prev_bucket, prev_lb = -1, -1
    rng = random.Random(3)
    xs = sorted({rng.randrange(1, 1 << 40) for _ in range(5_000)} | set(range(64)))
    for x in xs:
        b, lb = hdr_bucket_lb_py(x)
        assert lb <= x
        if b != prev_bucket:
            assert b > prev_bucket and lb > prev_lb
            prev_bucket, prev_lb = b, lb
        if x >= 16:
            # width of x's bucket relative to its lower bound
            assert (x - lb) / lb <= 1 / 16 + 1e-12


def test_hdr_merge_is_count_addition():
    """Half-corpus histograms merge by bucket-count addition into the
    full-corpus histogram — the partial-aggregate property."""
    from vectordb_spark.operators.sketch import hdr_bucket_lb_py

    rng = random.Random(9)
    xs = [rng.randrange(0, 1 << 30) for _ in range(20_000)]
    full: dict[int, int] = {}
    halves = [{}, {}]
    for i, x in enumerate(xs):
        b, _ = hdr_bucket_lb_py(x)
        full[b] = full.get(b, 0) + 1
        h = halves[i % 2]
        h[b] = h.get(b, 0) + 1
    merged = {
        k: halves[0].get(k, 0) + halves[1].get(k, 0)
        for k in set(halves[0]) | set(halves[1])
    }
    assert merged == full


def test_hdr_gate_estimate_within_bound(spark):
    """est grid value vs exact quantile: nearest-rank vs interpolated
    conventions differ by at most one observation, so the sketch's
    1/16 bucket-width bound holds with a small rank slack."""
    from vectordb_spark.queries.sketch import sketch_hdr_quantiles

    rows = sketch_hdr_quantiles(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        est50 = r["est_p50_grid"] / 100.0
        assert est50 <= r["exact_p50"] * (1 + 1e-9) + 0.01
        assert est50 >= r["exact_p50"] * (1 - 1 / 16) - 0.02, r
        est99 = r["est_p99_grid"] / 100.0
        assert est99 <= r["exact_p99"] + 0.01
        assert est99 >= r["exact_p99"] * (1 - 1 / 16) - 0.02, r
