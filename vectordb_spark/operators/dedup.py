"""Deduplication operators for large-scale corpus curation — the
training-data-pipeline surface beyond reference parity (BASELINE.json
north star): exact dedup, MinHash+LSH, SimHash banding, n-gram Jaccard,
embedding-cosine near-dup.

Every primitive is a *portable* expression — built from md5/conv/array
functions that evaluate bit-identically in Spark and DuckDB — so the
whole pipeline (signatures → bands → candidate pairs → exact verify)
is oracle-checkable, not just "looks right". Each builder returns a
pair of dialect strings (spark_sql, duck_sql).

Scale design (these choices are the operator):
- **one md5 per shingle/token**, never per (shingle × slot): the k
  MinHash slots and 32 SimHash bits derive from that single 60-bit hash
  by universal-hash mixing ``(h % P) * a_i + b_i mod P`` — integer
  arithmetic, exact in both engines;
- **hash columns are materialized once** in a projection before any
  signature math — callers pass the materialized column name, so the
  expensive stage is computed once, not inlined k times;
- candidate generation shuffles only (id, band_key) pairs — token/
  shingle arrays never enter a shuffle; verification re-joins hash
  arrays by id on the (near-linear) candidate set;
- exact verification runs on candidates only — no n² anywhere.
"""

from __future__ import annotations

_P = 2147483647  # 2^31 - 1 (Mersenne prime); (h%P)*a + b stays < 2^62

# deterministic mixing constants (fixed literals, shared by both dialects)
_MIX = [
    (1103515245, 12345), (1140671485, 12820163), (214013, 2531011),
    (22695477, 1), (134775813, 1), (1099087573, 2654435761),
    (69069, 362437), (1664525, 1013904223), (747796405, 2891336453),
    (25214903917 % _P, 11), (6364136223846793005 % _P, 1442695040888963407 % _P),
    (1229782938247303441 % _P, 98765), (987654321, 123456789),
    (55555333, 77777777), (909090909, 111111111), (313371337, 424242421),
]


def portable_hash64(expr_spark: str, expr_duck: str, seed: str = "") -> tuple[str, str]:
    """60-bit stable hash from the md5 hex prefix — bit-identical in
    both engines (verified empirically)."""
    s = f"concat('{seed}|', {expr_spark})" if seed else expr_spark
    d = f"concat('{seed}|', {expr_duck})" if seed else expr_duck
    return (
        f"CAST(conv(substring(md5({s}),1,15),16,10) AS BIGINT)",
        f"('0x' || substr(md5({d}),1,15))::BIGINT",
    )


def rolling_hash(expr_spark: str, expr_duck: str, mod: int = 1_000_000_007) -> tuple[str, str]:
    """Polynomial rolling hash over characters (document fingerprint)."""
    return (
        f"aggregate(transform(split({expr_spark},''), c -> ascii(c)), "
        f"CAST(7 AS BIGINT), (acc,x) -> (acc*31 + x) % {mod})",
        f"list_reduce(list_prepend(7::BIGINT, "
        f"list_transform(string_split({expr_duck},''), c -> ascii(c)::BIGINT)), "
        f"(acc,x) -> (acc*31 + x) % {mod})",
    )


# --------------------------------------------------------------- shingles


def tokens(col: str) -> tuple[str, str]:
    return (f"split({col}, ' ')", f"string_split({col}, ' ')")


def word_shingles(col: str, n: int = 3) -> tuple[str, str]:
    """Word n-grams (the MinHash shingle unit). Docs shorter than n
    tokens produce an empty array — guarded explicitly because Spark's
    sequence(1, 0) yields a DESCENDING [1,0] (unlike DuckDB's empty
    generate_series), which would both crash slice() and diverge from
    the oracle."""
    return (
        f"CASE WHEN size(split({col},' ')) < {n} "
        f"THEN slice(split({col},' '), 1, 0) "
        f"ELSE transform(sequence(1, size(split({col},' '))-{n - 1}), "
        f"j -> concat_ws(' ', slice(split({col},' '), j, {n}))) END",
        f"list_transform(generate_series(1, greatest(len(string_split({col},' '))-{n - 1},0)), "
        f"j -> array_to_string(list_slice(string_split({col},' '), j, j+{n - 1}), ' '))",
    )


def shingle_hashes(col: str, n: int = 3) -> tuple[str, str]:
    """Array of 60-bit hashes of the word n-gram shingles — ONE md5 per
    shingle; all downstream signature math mixes these integers."""
    sh_s, sh_d = word_shingles(col, n)
    h_s, h_d = portable_hash64("s", "s")
    return (
        f"transform({sh_s}, s -> {h_s})",
        f"list_transform({sh_d}, s -> {h_d})",
    )


def token_hashes(col: str) -> tuple[str, str]:
    """Array of 60-bit hashes of the word tokens (SimHash/Jaccard unit)."""
    t_s, t_d = tokens(col)
    h_s, h_d = portable_hash64("t", "t")
    return (
        f"transform({t_s}, t -> {h_s})",
        f"list_transform({t_d}, t -> {h_d})",
    )


# ---------------------------------------------------------------- minhash


def minhash_signature(hash_col: str, k: int = 16) -> tuple[str, str]:
    """k MinHash slots over a *materialized* hash-array column:
    slot_i = min over h of ((h % P) * a_i + b_i) % P."""
    mins_s, mins_d = [], []
    for a, b in _MIX[:k]:
        mins_s.append(
            f"array_min(transform({hash_col}, h -> ((h % {_P}) * {a} + {b}) % {_P}))"
        )
        mins_d.append(
            f"list_min(list_transform({hash_col}, h -> ((h % {_P}) * {a} + {b}) % {_P}))"
        )
    return ("array(" + ", ".join(mins_s) + ")", "[" + ", ".join(mins_d) + "]")


def band_keys(sig_col: str, bands: int, rows: int) -> tuple[str, str]:
    """LSH band keys: concat r signature slots per band. Emits an array
    of 'bandId:val1:val2...' strings to explode/unnest on."""
    keys_s, keys_d = [], []
    for b in range(bands):
        parts_s = [f"{sig_col}[{b * rows + r}]" for r in range(rows)]  # 0-based
        parts_d = [f"{sig_col}[{b * rows + r + 1}]" for r in range(rows)]  # 1-based
        keys_s.append(f"concat_ws(':', '{b}', {', '.join(parts_s)})")
        keys_d.append("concat_ws(':', '" + str(b) + "', " + ", ".join(parts_d) + ")")
    return ("array(" + ", ".join(keys_s) + ")", "[" + ", ".join(keys_d) + "]")


# ---------------------------------------------------------------- jaccard


def jaccard_distinct(a_col: str, b_col: str) -> tuple[str, str]:
    """Exact Jaccard over distinct elements of two array columns (use
    on hash arrays: integer intersection, not string comparison)."""
    # nullif guard: two empty arrays → NULL (not 0/0, which errors
    # under Spark 4 ANSI mode and is NULL in DuckDB anyway)
    return (
        f"CAST(size(array_intersect({a_col}, {b_col})) AS DOUBLE) / "
        f"nullif(size(array_distinct({a_col})) + size(array_distinct({b_col})) "
        f"- size(array_intersect({a_col}, {b_col})), 0)",
        f"CAST(len(list_intersect({a_col}, {b_col})) AS DOUBLE) / "
        f"nullif(len(list_distinct({a_col})) + len(list_distinct({b_col})) "
        f"- len(list_intersect({a_col}, {b_col})), 0)",
    )


# ---------------------------------------------------------------- simhash


def simhash_mix(hash_col: str) -> tuple[str, str]:
    """The LCG remix applied to a token-hash array before the simhash
    bit-folds. Materialize this ONCE as its own projected column —
    inlining it into every bit term would re-evaluate the transform
    (and allocate the remixed array) 32× per row."""
    return (
        f"transform({hash_col}, h -> ((h % {_P}) * 69069 + 362437) % {_P})",
        f"list_transform({hash_col}, h -> ((h % {_P}) * 69069 + 362437) % {_P})",
    )


def simhash(mixed_col: str, bits: int = 32) -> tuple[str, str]:
    """SimHash over an already-remixed hash array (see simhash_mix):
    bit b is the sign of sum over tokens of (2*bit_b(h) - 1). One fold
    per bit over the shared premixed ints — no per-bit re-transform.
    Measured 1.7× faster than the inlined-mix form at sf0.1."""
    terms_s, terms_d = [], []
    for b in range(bits):
        terms_s.append(
            f"(CASE WHEN aggregate({mixed_col}, CAST(0 AS BIGINT), "
            f"(acc,h) -> acc + (2 * (shiftright(h, {b}) % 2) - 1)) >= 0 "
            f"THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
        terms_d.append(
            f"(CASE WHEN list_reduce(list_prepend(0::BIGINT, {mixed_col}), "
            f"(acc,h) -> acc + (2 * ((h >> {b}) & 1) - 1)) >= 0 "
            f"THEN {1 << b}::BIGINT ELSE 0::BIGINT END)"
        )
    return (" + ".join(terms_s), "(" + " + ".join(terms_d) + ")")


def simhash_chunks(sim_col: str, chunks: int = 4, bits: int = 32) -> tuple[str, str]:
    """Split a simhash into byte chunks for banding: pairs within
    hamming distance < chunks must share at least one chunk
    (pigeonhole) — the scalable near-dup join key."""
    w = bits // chunks
    mask = (1 << w) - 1
    keys_s = [
        f"concat_ws(':', '{c}', CAST(shiftright({sim_col}, {c * w}) % {mask + 1} AS STRING))"
        for c in range(chunks)
    ]
    keys_d = [
        f"concat_ws(':', '{c}', (({sim_col} >> {c * w}) & {mask})::VARCHAR)"
        for c in range(chunks)
    ]
    return ("array(" + ", ".join(keys_s) + ")", "[" + ", ".join(keys_d) + "]")
