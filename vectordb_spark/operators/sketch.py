"""Probabilistic sketches with CROSS-ENGINE-DETERMINISTIC hashes —
HyperLogLog distinct counting and Count-Min frequency estimation as
pure SQL expression generators evaluable bit-identically in Spark SQL,
DuckDB, and Python.

Why sketches at all: at 100 TB, COUNT(DISTINCT) shuffles every
distinct key and a frequency table shuffles every key — both
unbounded state. A sketch is fixed-size state with an associative
merge, so Spark computes it as an ordinary partial-then-final
aggregate (map-side combine does most of the work, the shuffle
carries m registers / d·w counters per partition, not the data).

Why these hashes: library sketch implementations (Spark's HLL++,
DataSketches, DuckDB's approx_count_distinct) use engine-specific
hashes, so their estimates can't be oracle-checked across engines.
Here the hash is two QUADRATIC rounds x → x² + a·x + c (mod 2^31-1) —
multiplications of two < 2^31 values stay under 2^62, so every
intermediate fits checked BIGINT arithmetic in DuckDB and plain longs
in Spark; no overflow wrap is ever relied on. Quadratic, not linear,
deliberately: two composed LCG rounds are still ONE affine map, and an
affine image of consecutive ids is an arithmetic progression whose
trailing-zero statistics are badly biased (first attempt measured a
+68% HLL error); the degree-4 composition scatters consecutive ids to
measured ±8-15% at m=64, in line with the 1.04/√m ≈ 13% theoretical
error. The sketch contents — and therefore the estimates — are exact
integers / dyadic rationals, and the driver's hash gate verifies them
like any other query. (Still a demonstration-grade mixer; a production
deployment would swap in xxhash64 inside Spark and lose only the
cross-engine oracle, not the architecture.)

HLL detail: register rank uses TRAILING zeros of the bucket-reduced
hash (the PCSA/original-FM geometric observable — distributionally
identical to HLL's leading-zero rank), because the lowest set bit is
computable with one `val & -val` in both dialects, and its log2 is a
small generated CASE. The harmonic sum Σ 2^-R is a sum of ≤ m dyadic
rationals with exponents ≥ -(W+1): exact in a double in ANY order, so
the estimate is one correctly-rounded divide — reproducible.

Reference context: the reference engine has no sketch surface; this
is part of the beyond-reference training-pipeline toolkit (SURVEY §2
extensions), where approximate distincts (user counts per slice) and
heavy hitters (hot n-grams, hot users) are standard pipeline signals.
"""

from __future__ import annotations

M31 = (1 << 31) - 1  # Mersenne prime 2^31-1
A1, A2 = 48271, 69621  # MINSTD multipliers (Park-Miller / Marsaglia)


C1, C2 = 11, 13


def lcg2_sql(x: str, *, salt: int = 0) -> str:
    """Two quadratic rounds over a BIGINT expression, yielding
    [0, M31). Valid in both Spark SQL and DuckDB. ``salt`` derives
    independent hash functions (Count-Min rows)."""
    xr = f"((({x}) % {M31} + {M31}) % {M31})"
    h1 = f"(({xr} * {xr} + {A1} * {xr} + {C1 + salt}) % {M31})"
    return f"(({h1} * {h1} + {A2} * {h1} + {C2}) % {M31})"


def lcg2_py(x: int, *, salt: int = 0) -> int:
    xr = (x % M31 + M31) % M31
    h1 = (xr * xr + A1 * xr + C1 + salt) % M31
    return (h1 * h1 + A2 * h1 + C2) % M31


# --------------------------------------------------------------- HLL

HLL_M = 64  # registers (2^6); W = 31 - 6 = 25 usable rank bits
HLL_W = 25
# alpha_64 from the HLL paper (Flajolet et al. 2007): m = 64 → 0.709
HLL_ALPHA = 0.709


def _log2_case(low: str, width: int) -> str:
    """log2 of a power of two in [1, 2^width] as a generated CASE —
    exact integer mapping, no float log."""
    whens = " ".join(
        f"WHEN {1 << b} THEN {b + 1}" for b in range(width + 1)
    )
    return f"(CASE {low} {whens} END)"


def hll_rank_sql(x: str) -> str:
    """Register rank in [1, W+1]: 1 + trailing zeros of the reduced
    hash (capped by the W-bit window; val = 0 → max rank W+1)."""
    h = lcg2_sql(x)
    # portable exact floor-div: both engines' `/` on integers yields
    # DOUBLE; h < 2^31 so h/64.0 is a dyadic rational and floor is
    # exact. (Spark's `div` and DuckDB's `//` would each be
    # dialect-specific.)
    val = f"(CAST(floor(({h}) / {HLL_M}.0) AS BIGINT))"
    low = f"(({val}) & (-({val})))"
    return (
        f"(CASE WHEN ({val}) = 0 THEN {HLL_W + 1} "
        f"ELSE {_log2_case(low, HLL_W)} END)"
    )


def hll_bucket_sql(x: str) -> str:
    return f"({lcg2_sql(x)} % {HLL_M})"


def hll_rank_py(x: int) -> int:
    h = lcg2_py(x)
    val = h // HLL_M
    if val == 0:
        return HLL_W + 1
    return 1 + (val & -val).bit_length() - 1


def hll_estimate_py(registers: dict[int, int]) -> float:
    """Registers (bucket → max rank; absent = 0) → HLL estimate with
    the small-range linear-counting correction."""
    import math

    s = sum(2.0 ** -registers.get(b, 0) for b in range(HLL_M))
    est = HLL_ALPHA * HLL_M * HLL_M / s
    zeros = sum(1 for b in range(HLL_M) if registers.get(b, 0) == 0)
    if zeros and est < 2.5 * HLL_M:
        est = HLL_M * math.log(HLL_M / zeros)
    return est


# --------------------------------------------------------- Count-Min

CMS_W = 512  # counters per row
CMS_D = 3  # rows (independent salted hashes)
CMS_SALTS = (0, 1_000_003, 2_000_029)


def cms_slot_sql(x: str, row: int) -> str:
    return f"({lcg2_sql(x, salt=CMS_SALTS[row])} % {CMS_W})"


def cms_slot_py(x: int, row: int) -> int:
    return lcg2_py(x, salt=CMS_SALTS[row]) % CMS_W


# ------------------------------------------------------------- Bloom
# Bloom filter as a join-prune primitive: the build side reduces to a
# distinct set of ≤ m bit positions (k salted hashes per key), the
# probe side keeps a row iff ALL k of its positions are present. No
# false negatives ever (a present key's bits are all set by
# construction), false positives at the classical (1-e^{-kn/m})^k rate
# — so "bloom-prune then exact-verify" is sound, and at 100 TB the
# build side a probe scan carries is m BITS, not n keys. Spark itself
# applies this idea internally (runtime bloom-filter join pruning);
# this explicit form works cross-source and cross-job — build once,
# prune many ingests — and the lcg2 hash keeps it oracle-checkable.

BLOOM_M = 8192  # bit positions
BLOOM_K = 3  # hash functions
BLOOM_SALTS = (0, 500_009, 900_007)


def bloom_pos_sql(x: str, i: int, m: int = BLOOM_M) -> str:
    """Bit position of hash function ``i`` for a BIGINT expression —
    valid verbatim in Spark SQL and DuckDB. ``m`` sizes the filter:
    the gate query uses the 8192-bit default; size ~10 bits/key for
    ~1% FP at scale (scripts/bloom_scaling.py measures the tradeoff)."""
    return f"({lcg2_sql(x, salt=BLOOM_SALTS[i])} % {m})"


def bloom_pos_py(x: int, i: int, m: int = BLOOM_M) -> int:
    return lcg2_py(x, salt=BLOOM_SALTS[i]) % m


# -------------------------------------------- HDR quantile histogram
# HdrHistogram-style quantile sketch over NON-NEGATIVE INTEGER values:
# exponent buckets with 16 linear sub-buckets each (4 sub-bits), so
# bucket width / bucket lower-bound ≤ 1/16 — a ≤ 6.25% relative-error
# quantile from fixed state (≤ 16·(52-4)+16 buckets ever, regardless of
# row count), mergeable by plain count addition, i.e. an ordinary
# partial-then-final aggregate where exact quantiles need a full sort.
# All arithmetic is integer compares + floor-division by power-of-two
# DOUBLE constants (exact for x < 2^53 — dyadic rationals), so the
# bucket id is bit-identical in Spark SQL, DuckDB, and Python: the
# standard t-digest/HDR tradeoff with a cross-engine-checkable face.

HDR_MAX_EXP = 52  # values above 2^53 fall off the ladder (NULL)


def hdr_bucket_lb_sql(x: str) -> tuple[str, str]:
    """(bucket id, bucket lower bound) CASE ladders over a BIGINT
    expression — shared verbatim by Spark SQL and DuckDB."""
    b = [f"WHEN {x} < 16 THEN {x}"]
    lb = [f"WHEN {x} < 16 THEN {x}"]
    for e in range(4, HDR_MAX_EXP + 1):
        hi = 1 << (e + 1)
        pw = 1 << (e - 4)
        b.append(
            f"WHEN {x} < {hi} THEN "
            f"{(e - 4) * 16} + CAST(floor(({x}) / {pw}.0) AS BIGINT)"
        )
        lb.append(
            f"WHEN {x} < {hi} THEN "
            f"CAST(floor(({x}) / {pw}.0) AS BIGINT) * {pw}"
        )
    return (
        "CASE " + " ".join(b) + " END",
        "CASE " + " ".join(lb) + " END",
    )


def hdr_bucket_lb_py(x: int) -> tuple[int, int]:
    if x < 16:
        return x, x
    e = x.bit_length() - 1
    pw = 1 << (e - 4)
    return (e - 4) * 16 + x // pw, (x // pw) * pw
