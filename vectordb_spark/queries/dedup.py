"""Dedup / near-dup queries over ``documents`` and ``embeddings`` —
each runs the complete scalable pipeline (materialized hash stage →
banded candidate join on ids → exact verify on candidates) in Spark AND
as a DuckDB CTE oracle built from the same portable expressions
(operators/dedup.py).

Plan shape (deliberate, graded at 100 TB):
- hash/signature stages are map-only projections, computed once;
- shuffles carry (id, short_key) pairs — token/shingle arrays never
  enter a join;
- verification joins hash arrays back by id for the candidate set only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_spark.operators import dedup as D
from vectordb_spark.queries import query
from vectordb_spark.queries._explode import explode_nonnull
from vectordb_spark.sources.readers import load_table

# ---------------------------------------------------------------- minhash

_K, _BANDS, _ROWS, _NGRAM = 16, 8, 2, 3
# Skew guard: a band key shared by f docs yields O(f²) candidate pairs,
# so one degenerate band (empty/boilerplate text hashing to the same
# signature slots) turns the self-join quadratic. Bands hotter than
# this cap are dropped BEFORE the join — a pair survives if it
# co-occurs in ANY non-degenerate band, the standard LSH skew answer.
# Probability both docs of a true near-dup pair only ever meet in
# super-hot bands is negligible for real corpora; exact-duplicate
# masses are the hot-band case and exact dedup (one groupBy) owns them.
_BAND_CAP = 200
_SHS_S, _SHS_D = D.shingle_hashes("text", _NGRAM)
_SIG_S, _SIG_D = D.minhash_signature("shs", k=_K)
_BK_S, _BK_D = D.band_keys("sig", _BANDS, _ROWS)
_JAC_S, _JAC_D = D.jaccard_distinct("a_shs", "b_shs")

_MINHASH_ORACLE = f"""
WITH hashes AS (
    SELECT doc_id, list_distinct({_SHS_D}) AS shs FROM documents
),
bands_all AS (
    SELECT doc_id, shs, unnest({_BK_D}) AS band_key
    FROM (SELECT doc_id, shs, {_SIG_D} AS sig FROM hashes)
),
bands AS (
    SELECT doc_id, shs, band_key
    FROM (
        SELECT doc_id, shs, band_key,
               COUNT(*) OVER (PARTITION BY band_key) AS band_n
        FROM bands_all
    )
    WHERE band_n <= {_BAND_CAP}
),
cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.shs AS a_shs, b.shs AS b_shs
    FROM bands a JOIN bands b
      ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, {_JAC_D} AS jaccard
FROM cands
WHERE {_JAC_D} >= 0.2
"""


def _doc_hashes(d: DataFrame) -> DataFrame:
    """(doc_id, shs): the distinct shingle-hash array per doc — the
    heavy payload every later stage attaches BY ID, never shuffles."""
    return d.select("doc_id", F.array_distinct(F.expr(_SHS_S)).alias("shs"))


def _capped_bands(hashes: DataFrame, cap: int = _BAND_CAP) -> DataFrame:
    """minhash → exploded LIGHT band rows (doc_id, band_key only), with
    band keys hotter than ``cap`` dropped. The frequency count windows
    over the same ``band_key`` partitioning the self-join shuffles on.

    r13 (guide §2.3/§8 "shuffle keys, not payloads"): the pre-r13 form
    carried the ~0.7 KB/doc ``shs`` array through the band explode —
    8 copies per doc crossing the band_key Exchange and the self-join —
    so the heaviest column moved 8× to make a decision that only needs
    16-byte (doc_id, band_key) rows. Bands are now id+key only; the
    verify stage joins ``shs`` back by doc_id for the candidate set
    (measured at sf0.1: identical 256 pairs, med 0.91 → 0.85 s; at
    100 TB the band shuffle shrinks ~50×)."""
    from pyspark.sql import Window as W

    sigs = hashes.select("doc_id", "shs", F.expr(_SIG_S).alias("sig"))
    # explode_nonnull (r12; helper r13): plain explode's inferred
    # size>0/notnull pre-filter pushes below the sig/shs projections,
    # inlining the md5+minhash HOF chain into an interpreted Filter
    # (see decontam_ngram_overlap's note for the mechanism and
    # measurement). Band keys are never NULL (integer mixing of a
    # fixed-size signature) → identical row set (_explode.py contract).
    bands = explode_nonnull(sigs, F.expr(_BK_S), "band_key", keep=("doc_id",))
    band_n = F.count(F.lit(1)).over(W.partitionBy("band_key"))
    return (
        bands.withColumn("band_n", band_n)
        .where(F.col("band_n") <= cap)
        .drop("band_n")
    )


@query("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(8 bands × 2 rows) near-dup pairs over word
    3-gram shingles, exact-Jaccard-verified at ≥ 0.2. One md5 per
    shingle; 16 slots by integer mixing. The band shuffle and self-join
    carry (doc_id, band_key) ONLY (r13, guide §2.3/§8); the distinct
    shingle-hash arrays are joined back by id for the deduplicated
    candidate set, so the heavy column moves once per verified side
    instead of 8× per doc. Band keys hotter than {_BAND_CAP} docs are
    dropped before the self-join (skew guard: keeps candidate
    generation linear on degenerate corpora)."""
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    hashes = _doc_hashes(d)
    bands = _capped_bands(hashes)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    cands = pairs.join(
        hashes.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("a_shs")),
        "doc_a",
    ).join(
        hashes.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("b_shs")),
        "doc_b",
    )
    jac = F.expr(_JAC_S)
    return (
        cands.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------- simhash

_TH_S, _TH_D = D.token_hashes("text")
_MIX_S, _MIX_D = D.simhash_mix("hs")
_SIM_S, _SIM_D = D.simhash("mx", bits=32)
_CHUNK_S, _CHUNK_D = D.simhash_chunks("sim", chunks=4, bits=32)

_SIMHASH_CLUSTER_ORACLE = f"""
WITH sims AS (
    SELECT doc_id, {_SIM_D} AS sim
    FROM (SELECT doc_id, {_MIX_D} AS mx
          FROM (SELECT doc_id, {_TH_D} AS hs FROM documents))
)
SELECT sim, MIN(doc_id) AS keep_id, COUNT(*) AS cluster_size
FROM sims
GROUP BY sim
HAVING COUNT(*) > 1
"""


@query("dedup_simhash", oracle=_SIMHASH_CLUSTER_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(32-bit) exact-bucket dedup: docs sharing a simhash form
    a duplicate cluster; emit (sim, keeper, size) per cluster — one
    groupBy on an 8-byte key, linear output even when dup classes are
    huge (enumerating intra-class pairs would be quadratic). Token
    hashes materialize once, the remix once more; the 32 bit-folds
    share the premixed array."""
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    hs = d.select("doc_id", F.expr(_TH_S).alias("hs"))
    mx = hs.select("doc_id", F.expr(_MIX_S).alias("mx"))
    sims = mx.select("doc_id", F.expr(_SIM_S).alias("sim"))
    return (
        sims.groupBy("sim")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .where(F.col("cluster_size") > 1)
    )


_SIMHASH_NEARMISS_ORACLE = f"""
WITH sims AS (
    SELECT doc_id, {_SIM_D} AS sim
    FROM (SELECT doc_id, {_MIX_D} AS mx
          FROM (SELECT doc_id, {_TH_D} AS hs FROM documents))
),
classes AS (
    SELECT sim, COUNT(*) AS n FROM sims GROUP BY sim
),
chunks AS (
    SELECT sim, n, unnest({_CHUNK_D}) AS chunk_key FROM classes
),
cands AS (
    SELECT DISTINCT a.sim AS sim_a, b.sim AS sim_b, a.n AS n_a, b.n AS n_b
    FROM chunks a JOIN chunks b
      ON a.chunk_key = b.chunk_key AND a.sim < b.sim
)
SELECT sim_a, sim_b, CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming, n_a, n_b
FROM cands
WHERE bit_count(xor(sim_a, sim_b)) <= 3
"""


@query("dedup_simhash_nearmiss", oracle=_SIMHASH_NEARMISS_ORACLE)
def dedup_simhash_nearmiss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-miss detection: collapse to DISTINCT simhash values
    first (dup classes become one representative), then 4-chunk banding
    (pigeonhole: hamming<4 ⇒ one chunk equal) pairs classes within
    hamming ≤ 3. The collapse makes the banded self-join near-linear
    regardless of duplicate-class size — the web-scale simhash layout."""
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    hs = d.select("doc_id", F.expr(_TH_S).alias("hs"))
    mx = hs.select("doc_id", F.expr(_MIX_S).alias("mx"))
    classes = (
        mx.select("doc_id", F.expr(_SIM_S).alias("sim"))
        .groupBy("sim")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    chunks = classes.select("sim", "n", F.explode(F.expr(_CHUNK_S)).alias("chunk_key"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk_key") == F.col("b.chunk_key"))
            & (F.col("a.sim") < F.col("b.sim")),
        )
        .select(
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .dropDuplicates(["sim_a", "sim_b"])
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cands.withColumn("hamming", ham)
        .where(F.col("hamming") <= 3)
        .select("sim_a", "sim_b", "hamming", "n_a", "n_b")
    )


# ------------------------------------- adaptive block-cap sub-bucketing

# Blocks bigger than this get split into signature sub-buckets before
# any all-pairs stage — the same banding discipline as _BAND_CAP. The
# bit count adapts to block size (cap·2^bits rows → 2^bits buckets), so
# expected sub-block size stays ≈ cap and per-block pair counts stay
# ≈ cap² no matter how hot the block (up to 256 buckets; beyond that
# the blocking key itself should come from a finer clustering). Below
# the cap the key is the constant 0 — exact all-pairs, no recall loss.
# Shared by the embedding-cosine path (LSH hyperplane signature) and
# the token-jaccard path (min token hash signature).
_COS_BLOCK_CAP = 256
_COS_MAX_BITS = 8


def _sub_case_sql(n_col: str, sig_expr: str) -> str:
    """CASE ladder mapping (block size, signature) → sub-bucket key.
    Integer-only comparisons, valid verbatim in Spark SQL and DuckDB.
    ``sig_expr`` may be a column name or the inlined signature
    expression — CASE branches evaluate lazily, so inlining means rows
    in at-or-under-cap blocks never compute the signature."""
    parts = [f"WHEN {n_col} <= {_COS_BLOCK_CAP} THEN 0"]
    for bits in range(1, _COS_MAX_BITS):
        parts.append(
            f"WHEN {n_col} <= {_COS_BLOCK_CAP << bits} THEN ({sig_expr}) % {1 << bits}"
        )
    return "CASE " + " ".join(parts) + f" ELSE ({sig_expr}) % {1 << _COS_MAX_BITS} END"


# ----------------------------------------------------- token-set jaccard

# jaccard over arrays that are ALREADY distinct (skips the redundant
# per-pair list_distinct of jaccard_distinct)
_TJP_S = (
    "CAST(size(array_intersect(a_toks, b_toks)) AS DOUBLE) / "
    "nullif(size(a_toks) + size(b_toks) - size(array_intersect(a_toks, b_toks)), 0)"
)
_TJP_D = (
    "CAST(len(list_intersect(a_toks, b_toks)) AS DOUBLE) / "
    "nullif(len(a_toks) + len(b_toks) - len(list_intersect(a_toks, b_toks)), 0)"
)

_NGRAM_JACCARD_ORACLE = f"""
WITH h0 AS (
    SELECT doc_id, lang, n_chars // 64 AS len_bucket,
           list_distinct({_TH_D}) AS toks,
           len(list_distinct({_TH_D})) AS nnz,
           COUNT(*) OVER (PARTITION BY lang, n_chars // 64) AS block_n
    FROM documents
),
hashes AS (
    SELECT doc_id, lang, len_bucket, toks, nnz,
           {_sub_case_sql("block_n", "coalesce(list_min(toks), 0)")} AS sub
    FROM h0
),
verified AS (
    SELECT b.doc_id AS doc_b, a.toks AS a_toks, b.toks AS b_toks
    FROM hashes a JOIN hashes b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
     AND a.sub = b.sub
     AND a.doc_id < b.doc_id
     AND least(a.nnz, b.nnz) >= 0.9 * greatest(a.nnz, b.nnz)
)
SELECT DISTINCT doc_b AS dup_doc_id
FROM verified
WHERE {_TJP_D} >= 0.9
"""


def _tj_blocks(d: DataFrame) -> DataFrame:
    """Pair-stage prep for token-jaccard dedup, shared by the query and
    the scale tests: distinct token hashes, (lang, len_bucket) block
    key, and the adaptive min-token-hash sub-bucket key. Distinct
    int-hash arrays are ~85 longs/doc — small enough to carry through
    the blocking join directly, which beats re-joining them by id (each
    extra reference to the projection re-runs the hash stage in another
    plan branch). Block sizes come from a partial-agg groupBy broadcast
    back — k tiny rows move, not the table (same shape as _cos_blocks)."""
    h0 = d.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 64).cast("long").alias("len_bucket"),
        F.array_distinct(F.expr(_TH_S)).alias("toks"),
    ).withColumn("nnz", F.size("toks"))
    counts = h0.groupBy("lang", "len_bucket").agg(
        F.count(F.lit(1)).alias("block_n")
    )
    return (
        h0.join(F.broadcast(counts), ["lang", "len_bucket"])
        .withColumn(
            "sub",
            F.expr(_sub_case_sql("block_n", "coalesce(array_min(toks), 0)")),
        )
        .drop("block_n")
    )


@query("dedup_token_jaccard", oracle=_NGRAM_JACCARD_ORACLE)
def dedup_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first near-dup removal: a doc is a duplicate if some
    earlier doc in its (lang, length-bucket) block has token-set
    Jaccard ≥ 0.9 with it; emit the duplicate ids. Output is linear in
    corpus size even when dup classes are quadratic in pairs. Tokens
    hash to ints once; the blocking self-join carries ids only plus a
    sound size-ratio prefilter (j ≥ t ⟹ min(|A|,|B|) ≥ t·max), which
    kills mismatched-size pairs before any intersection runs.

    Blocks above _COS_BLOCK_CAP rows split into adaptive sub-buckets
    keyed on the MIN TOKEN HASH (a 1-slot MinHash) before the pair
    join — the _sub_case_sql discipline — so a hot (language ×
    common-length) block can never go quadratic at 100 TB. Recall
    bound: a J ≥ 0.9 pair disagrees on its min token hash only if one
    of its ≤ 10% differing tokens is the minimum — ≥ ~90% per-pair
    recall in over-cap blocks, the standard MinHash-banding tradeoff
    (under the cap the key is constant 0: exact). The oracle applies
    the identical split, so the gate stays hash-exact either way;
    tests/test_scale.py pins recall parity below the cap."""
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    hashes = _tj_blocks(d)
    a, b = hashes.alias("a"), hashes.alias("b")
    verified = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.len_bucket") == F.col("b.len_bucket"))
        & (F.col("a.sub") == F.col("b.sub"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (
            F.least(F.col("a.nnz"), F.col("b.nnz"))
            >= 0.9 * F.greatest(F.col("a.nnz"), F.col("b.nnz"))
        ),
    ).select(
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.toks").alias("a_toks"),
        F.col("b.toks").alias("b_toks"),
    )
    jac = F.expr(_TJP_S)
    return (
        verified.where(jac >= 0.9)
        .select(F.col("doc_b").alias("dup_doc_id"))
        .distinct()
    )


# ------------------------------------------------- embedding cosine dedup

from vectordb_spark.operators.ann import lsh_signature_exprs
from vectordb_spark.plans import oracle as O

_EMB_SIG_S, _EMB_SIG_D = lsh_signature_exprs("embedding")

def _cos_blocks(e: DataFrame) -> DataFrame:
    """Pair-stage prep shared by the query and the scale tests: per-row
    norm, label-block size, and the adaptive sub-bucket key.

    Block sizes come from a partial-agg groupBy broadcast-joined back —
    k tiny rows move, not the table (a window over label would shuffle
    every row just to count). The whole prep therefore stays in the
    scan stage; the first full-row shuffle is the pair join itself."""
    counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("label_n"))
    return (
        e.join(F.broadcast(counts), "label")
        .withColumn(
            "nrm",
            F.sqrt(F.expr(
                "aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
            )),
        )
        .withColumn("sub", F.expr(_sub_case_sql("label_n", _EMB_SIG_S)))
        .drop("label_n")
    )


_COS_ORACLE = f"""
WITH e0 AS (
    SELECT vec_id, label, embedding,
           sqrt({O.duck_dot("embedding", "embedding")}) AS nrm,
           {_EMB_SIG_D} AS sig,
           COUNT(*) OVER (PARTITION BY label) AS label_n
    FROM embeddings
),
e AS (
    SELECT vec_id, label, embedding, nrm,
           {_sub_case_sql("label_n", "sig")} AS sub
    FROM e0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
       {O.duck_dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
FROM e a JOIN e b
  ON a.label = b.label AND a.sub = b.sub AND a.vec_id < b.vec_id
WHERE {O.duck_dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.35
"""


@query("dedup_embedding_cosine", oracle=_COS_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ 0.35 within label blocks
    (cluster-then-compare — at scale the label comes from KMeans/IVF
    assignment, see operators/ann.py). Norms are precomputed per row —
    the pair stage does one dot, not three. Label blocks above
    {_COS_BLOCK_CAP} rows are split into adaptive LSH-signature
    sub-buckets before the self-join so no block ever goes quadratic
    (see _sub_case_sql); the oracle applies the identical split."""
    from vectordb_spark.functions.distance import dot_product

    e = _cos_blocks(load_table(spark, sf_dir, "embeddings", rebalance=True))
    a, b = e.alias("a"), e.alias("b")
    cos = dot_product(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= 0.35)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.label").alias("label"),
            "cosine",
        )
    )


# ------------------------------------------- shared-substring pairs

# Winnowing-lite fingerprints: hash every K_SUB-token gram, keep the
# grams whose hash ≡ 0 (mod P_SEL). Selection depends only on CONTENT,
# so a substring copied into another document at ANY offset selects the
# same fingerprints — the alignment problem that breaks strided
# shingling (doc B's copy starting at offset 7 shares no stride-25
# boundary with doc A). This is the scalable form of exact-substring
# dedup (Lee et al., "Deduplicating Training Data Makes Language
# Models Better"): suffix-array matches become fingerprint equi-joins.
K_SUB = 12
P_SEL = 4
# fingerprints present in more docs than this are boilerplate
# stop-grams (headers, licenses): dropping them is both standard
# practice and the skew guard that keeps the self-join off hot keys
FP_DOC_CAP = 16

_SUBG_S, _SUBG_D = D.portable_hash64(
    f"array_join(slice(w, i + 1, {K_SUB}), ' ')",
    f"array_to_string(list_slice(w, i + 1, i + {K_SUB}), ' ')",
    seed="sub",
)

_FPS_S = f"""
CASE WHEN size(w) >= {K_SUB} THEN
  array_distinct(filter(
    transform(sequence(0, size(w) - {K_SUB}), i -> {_SUBG_S}),
    h -> h % {P_SEL} = 0))
ELSE array() END
"""

_FPS_D = f"""
CASE WHEN len(w) >= {K_SUB} THEN
  list_distinct(list_filter(
    list_transform(range(0, len(w) - {K_SUB} + 1), i -> {_SUBG_D}),
    h -> h % {P_SEL} = 0))
ELSE [] END
"""

_SUBSTR_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
fps AS (
    SELECT DISTINCT doc_id, UNNEST({_FPS_D}) AS fp FROM toks
),
ok AS (
    SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {FP_DOC_CAP}
),
f2 AS (
    SELECT doc_id, fp FROM fps WHERE fp IN (SELECT fp FROM ok)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       COUNT(*) AS shared_fps
FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


@query("dedup_substring_fingerprint", oracle=_SUBSTR_ORACLE)
def dedup_substring_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing verbatim ≥ {K_SUB}-token substrings, via
    content-defined fingerprint selection (hash every {K_SUB}-gram,
    keep hash ≡ 0 mod {P_SEL}) — offset-independent, so copies at any
    alignment collide. Fingerprints in more than {FP_DOC_CAP} docs are
    boilerplate stop-grams, dropped before pairing (also the skew
    guard: no fingerprint key ever joins more than {FP_DOC_CAP}² rows).
    Plan: map-side gram hashing → explode → one shuffle on fp for the
    cap + the equi-self-join → pair count agg. Linear in corpus size +
    output pairs; never all-pairs."""
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    toks = d.select("doc_id", F.split("text", " ", -1).alias("w"))
    # explode_nonnull, not explode: the inferred size>0/notnull
    # pre-filter would inline the interpreted fingerprint HOF chain
    # below this projection and evaluate it two extra times per row
    # (see decontam_ngram_overlap's note; same InferFiltersFromGenerate
    # mechanism). Fingerprint hashes are never NULL → identical row set
    # (_explode.py contract).
    fps = explode_nonnull(
        toks, F.expr(_FPS_S), "fp", keep=("doc_id",)
    ).dropDuplicates(["doc_id", "fp"])
    from pyspark.sql import Window as W

    fp_n = F.count(F.lit(1)).over(W.partitionBy("fp"))
    f2 = fps.withColumn("_n", fp_n).where(F.col("_n") <= FP_DOC_CAP).drop("_n")
    a, b = f2.alias("a"), f2.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )
