"""Hybrid-search fusion (reference E3: the engine searches one vector
field per request and fusion is client-side — here it is a first-class
operator): Reciprocal Rank Fusion across two rankings of the same
candidate set, plus a mock-embedder semantic search entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from vectordb_spark.plans import oracle as O
from vectordb_spark.queries import query
from vectordb_spark.queries._explode import explode_nonnull
from vectordb_spark.sources.readers import load_table

_QV = "(SELECT embedding FROM embeddings WHERE vec_id = 0)"
_RRF_K = 60
# RRF is defined over TRUNCATED per-metric rank lists (the fusion input
# a real hybrid search has: each searcher returns its top-N). Ranking
# happens AFTER an orderBy().limit(N) — Spark plans that scan as
# per-partition TakeOrderedAndProject, so no global sort and no
# whole-table single-partition window ever exists. At 100 TB the only
# full-data pass is the distance scan; everything downstream sees ≤ N
# rows.
_RRF_N = 100

_FUSION_ORACLE = f"""
WITH scored AS (
    SELECT vec_id, label,
           {O.duck_l2_sq("embedding", _QV)} AS d_l2,
           {O.duck_neg_dot("embedding", _QV)} AS d_dot
    FROM embeddings
),
l2_top AS (
    SELECT vec_id, label, d_l2 FROM scored ORDER BY d_l2, vec_id LIMIT {_RRF_N}
),
dot_top AS (
    SELECT vec_id, label, d_dot FROM scored ORDER BY d_dot, vec_id LIMIT {_RRF_N}
),
l2_rank AS (
    SELECT vec_id, label,
           row_number() OVER (ORDER BY d_l2, vec_id) AS r_l2
    FROM l2_top
),
dot_rank AS (
    SELECT vec_id, label,
           row_number() OVER (ORDER BY d_dot, vec_id) AS r_dot
    FROM dot_top
)
SELECT coalesce(a.vec_id, b.vec_id) AS vec_id,
       coalesce(a.label, b.label) AS label,
       a.r_l2, b.r_dot,
       coalesce(1.0 / ({_RRF_K} + a.r_l2), 0.0)
         + coalesce(1.0 / ({_RRF_K} + b.r_dot), 0.0) AS rrf
FROM l2_rank a FULL OUTER JOIN dot_rank b USING (vec_id)
ORDER BY rrf DESC, vec_id
LIMIT 10
"""


@query("fusion_rrf", oracle=_FUSION_ORACLE)
def fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of L2 and dot-product rankings: score both metrics in
    one scan, truncate each metric to its top-N candidates (planned as
    TakeOrderedAndProject — per-partition heaps, no global sort), rank
    the ≤N-row candidate sets, full-outer join on vec_id and fuse as
    Σ 1/(k+rank) with absent ranks contributing 0. The fused sum has a
    fixed two-term evaluation order → bit-exact vs the oracle. The
    candidate windows carry an explicit constant partition key: one
    partition of ≤N rows is the *intended* plan, independent of table
    size."""
    from vectordb_spark.functions.distance import (
        dot_product_distance,
        l2_squared,
        vector_literal,
    )

    from vectordb_spark.queries.vector import _query_vector

    emb = load_table(spark, sf_dir, "embeddings")
    q = vector_literal(_query_vector(spark, sf_dir))
    scored = emb.select(
        "vec_id",
        "label",
        l2_squared("embedding", q).alias("d_l2"),
        dot_product_distance("embedding", q).alias("d_dot"),
    )

    def top_ranked(dist: str, rank: str) -> DataFrame:
        cand = scored.select("vec_id", "label", dist).orderBy(dist, "vec_id").limit(
            _RRF_N
        )
        # constant-but-non-foldable partition key: a plain lit(0) gets
        # constant-folded out of the partition spec and WindowExec then
        # warns about the (here intended — input is ≤ N rows) single
        # partition
        w = W.partitionBy(F.col("vec_id") * F.lit(0)).orderBy(dist, "vec_id")
        return cand.select(
            "vec_id", "label", F.row_number().over(w).cast("long").alias(rank)
        )

    l2_rank = top_ranked("d_l2", "r_l2")
    dot_rank = top_ranked("d_dot", "r_dot")
    fused = l2_rank.withColumnRenamed("label", "label_a").join(
        dot_rank.withColumnRenamed("label", "label_b"), "vec_id", "full_outer"
    )
    term = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(_RRF_K) + F.col(r)), F.lit(0.0)
    )
    return (
        fused.select(
            "vec_id",
            F.coalesce("label_a", "label_b").alias("label"),
            "r_l2",
            "r_dot",
            (term("r_l2") + term("r_dot")).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col("vec_id"))
        .limit(10)
    )


_SEM_QUERY_TEXT = "the fast key order sort table scan"
_SEM_K = 10


def _sem_oracle() -> str:
    """Build the DuckDB oracle for semantic_text_search at import time:
    the query text is embedded by the Python mirror (bit-identical to
    both SQL paths) and inlined as integer constants — only exact
    integers cross the Python/SQL boundary."""
    from vectordb_spark.embedding import SqlMockEmbedder

    e = SqlMockEmbedder(dimension=16)
    qv = [int(x) for x in e._one(_SEM_QUERY_TEXT)]
    bb = sum(x * x for x in qv)
    qlist = "[" + ", ".join(str(x) for x in qv) + "]"
    return f"""
    WITH vec AS (
        SELECT doc_id, lang, {e.duck_expr("text")} AS v FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               CAST(list_sum(list_transform(v, x -> x*x)) AS BIGINT) AS aa,
               CAST(list_sum(list_transform(list_zip(v, {qlist}),
                    p -> p[1]*p[2])) AS BIGINT) AS ab
        FROM vec
    )
    SELECT doc_id, lang,
           CASE WHEN aa = 0 THEN NULL
                ELSE 1.0 - CAST(ab AS DOUBLE)
                    / (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST({bb} AS DOUBLE)))
           END AS distance
    FROM scored
    ORDER BY distance NULLS LAST, doc_id LIMIT {_SEM_K}
    """


@query("semantic_text_search", oracle=_sem_oracle())
def semantic_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/E2 through the full gate: embed every document AND the query
    string with the SQL-expressible mock embedder, exact cosine top-K
    (reference db_server.cpp:512-600 — the query is embedded with the
    index's model and enters the ordinary KNN path;
    embedding_service.cpp:216-369 for the embed call itself).

    The embedder runs as a pure Catalyst expression (SqlMockEmbedder.
    spark_expr — whole-stage codegen, zero Python in the scan), the
    vectors stay integer so every dot product is exact, and cosine's
    scale-invariance stands in for the reference's ingest-time L2
    normalization (table_mvp.cpp:334-349) — same ranking, one sqrt +
    one divide of float work per row, bit-identical to the DuckDB
    oracle. orderBy+limit plans as TakeOrderedAndProject: per-partition
    top-K heaps, no global sort at 100 TB. The Arrow-pandas-UDF path
    (embed_column) stays the Table API's ingest route; tri-parity of
    the three implementations is pinned in tests/test_embedding.py."""
    from vectordb_spark.embedding import SqlMockEmbedder

    e = SqlMockEmbedder(dimension=16)
    qv = [int(x) for x in e._one(_SEM_QUERY_TEXT)]
    bb = sum(x * x for x in qv)
    # rebalance: documents.parquet is one file → one task; the embed
    # kernel must spread across cores — at cluster scale the scan has
    # many splits anyway
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    # r13 (guide §4.2): the interpreted HOF hash/bucket/dot stages —
    # ~10.5 core-seconds at sf0.1, the dominant parallel compute of
    # this query — now run as ONE numpy pass per Arrow batch
    # (SqlMockEmbedder.embed_dots_df; normalization stays the same JVM
    # expression). aa/ab are exact int64 either way → bit-identical
    # distances; noop-sunk warm min 0.70 → 0.56 s at 32 cores,
    # 1.41 → 0.52 s at 8 (compute was the scaling term).
    scored = e.embed_dots_df(
        d.select("doc_id", "lang", "text"), "text", [qv],
        keep=("doc_id", "lang"),
    ).withColumnRenamed("ab0", "ab")
    # NO WHERE clause: a filter on aa would be predicate-pushed below
    # the staged embedding projections, transitively inlining the whole
    # (interpreted, non-codegen) higher-order-function expression into
    # the filter condition — observed as a >100× slowdown. Empty
    # vectors (aa=0, only possible for empty/symbol-only text) get a
    # NULL distance and explicit NULLS LAST ordering on both engines.
    return (
        scored.select(
            "doc_id",
            "lang",
            F.when(
                F.col("aa") == 0, F.lit(None).cast("double")
            ).otherwise(
                F.lit(1.0)
                - F.col("ab").cast("double")
                / (F.sqrt(F.col("aa").cast("double")) * F.sqrt(F.lit(float(bb))))
            ).alias("distance"),
        )
        .orderBy(F.col("distance").asc_nulls_last(), F.col("doc_id").asc())
        .limit(_SEM_K)
    )


# ------------------------------------------------------- BM25 lexical
#
# Scoring math (exact-rational tf-norm + quantized-idf, bit-identical
# across Spark/DuckDB/Python) lives in functions.text_rank — shared
# with Table.rebuild_text_index / search_text_df, whose indexed path
# must reproduce these corpus-scan scores exactly.
from vectordb_spark.functions.text_rank import (  # noqa: E402
    BM25_Q as _BM25_Q,
    bm25_sq_expr as _bm25_sq_expr,
)

_BM25_TERMS = ("spark", "merge", "window")
_BM25_K = 10


def _bm25_cte(
    terms: tuple[str, ...],
    *,
    toks_sql: str = "string_split(text, ' ')",
    prefix: str = "",
) -> str:
    """Corpus-scan BM25 as a DuckDB CTE chain, parameterized on the
    query terms — shared by the bm25_topk oracle and the persisted
    text-index gates (whose indexed paths must reproduce these exact
    quantized scores). ``toks_sql``/``prefix`` let the BM25F gate
    instantiate the chain once per FIELD (each keeping its own doc
    lengths, corpus stats, and document frequencies)."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    p = prefix
    return f"""
{p}toks AS (
    SELECT doc_id, unnest({toks_sql}) AS w FROM documents
),
{p}dl AS (
    SELECT doc_id, len({toks_sql}) AS dl FROM documents
),
{p}stats AS (
    SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS s FROM {p}dl
),
{p}tf AS (
    SELECT doc_id, w, COUNT(*) AS tf FROM {p}toks
    WHERE w IN ({terms_sql}) GROUP BY doc_id, w
),
{p}dfreq AS (
    SELECT w, COUNT(DISTINCT doc_id) AS df FROM {p}toks
    WHERE w IN ({terms_sql}) GROUP BY w
),
{p}contrib AS (
    SELECT {p}tf.doc_id,
           {_bm25_sq_expr(f"{p}tf.tf", f"{p}dfreq.df", f"{p}dl.dl", f"{p}stats.n", f"{p}stats.s")} AS sq
    FROM {p}tf
    JOIN {p}dfreq USING (w)
    JOIN {p}dl ON {p}tf.doc_id = {p}dl.doc_id
    CROSS JOIN {p}stats
),
{p}bm25 AS (
    SELECT doc_id, CAST(SUM(sq) AS BIGINT) AS bm25_q,
           COUNT(*) AS n_terms
    FROM {p}contrib GROUP BY doc_id
)
"""


_BM25_CTE = _bm25_cte(_BM25_TERMS)

_BM25_ORACLE = f"""
WITH {_BM25_CTE}
SELECT doc_id, bm25_q, n_terms FROM bm25
ORDER BY bm25_q DESC, doc_id LIMIT {_BM25_K}
"""


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quantized BM25 score over the fixed query terms.

    Distributed shape: one corpus pass explodes tokens (generator, no
    shuffle) and the term filter prunes it to query-term hits BEFORE
    any shuffle — at 100 TB what aggregates is |docs containing a query
    term| rows, not the corpus. Doc lengths and the (N, S) corpus
    stats come from the unexploded table (map-side agg to ONE row,
    broadcast by AQE); df is a 3-row broadcast. No driver-side
    collect anywhere — the stats ride as a crossJoin of a 1-row frame."""
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    words = F.split("text", " ", -1)
    toks = d.select("doc_id", F.explode(words).alias("w"))
    dl = d.select("doc_id", F.size(words).cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").cast("long").alias("s")
    )
    hits = toks.where(F.col("w").isin(*_BM25_TERMS))
    tf = hits.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = hits.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    contrib = (
        tf.join(F.broadcast(dfreq), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(_bm25_sq_expr("tf", "df", "dl", "n", "s")).alias("sq"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.sum("sq").cast("long").alias("bm25_q"),
        F.count(F.lit(1)).alias("n_terms"),
    )


@query("bm25_topk", oracle=_BM25_ORACLE)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (Robertson/Sparck-Jones probabilistic
    ranking) as a pure DataFrame plan — the lexical half of hybrid
    search the reference delegates to clients (E3; the engine itself
    is vector-only, db_server.cpp hybrid handling is fusion of caller
    rankings). k1=1.2, b=0.75; scores land on an integer 1e-6 grid so
    the gate hash is exact (see _bm25_sq_expr). orderBy+limit plans as
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25_q").desc(), F.col("doc_id"))
        .limit(_BM25_K)
    )


_HYB_N = 100  # per-ranker candidate truncation feeding the fusion

_HYB_ORACLE = f"""
WITH {_BM25_CTE},
lex_top AS (
    SELECT doc_id, bm25_q FROM bm25
    ORDER BY bm25_q DESC, doc_id LIMIT {_HYB_N}
),
lex_rank AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY bm25_q DESC, doc_id) AS r_lex
    FROM lex_top
),
sem AS (
    SELECT vec_id AS doc_id,
           {O.duck_cosine_distance("embedding", _QV, normalized=False)} AS d_cos
    FROM embeddings
),
sem_top AS (
    SELECT doc_id, d_cos FROM sem ORDER BY d_cos, doc_id LIMIT {_HYB_N}
),
sem_rank AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY d_cos, doc_id) AS r_sem
    FROM sem_top
)
SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       a.r_lex, b.r_sem,
       coalesce(1.0 / ({_RRF_K} + a.r_lex), 0.0)
         + coalesce(1.0 / ({_RRF_K} + b.r_sem), 0.0) AS rrf
FROM lex_rank a FULL OUTER JOIN sem_rank b USING (doc_id)
ORDER BY rrf DESC, doc_id
LIMIT 10
"""


@query("hybrid_bm25_vector_rrf", oracle=_HYB_ORACLE)
def hybrid_bm25_vector_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE hybrid search — lexical BM25 over documents fused with
    dense cosine KNN over the aligned embeddings table (doc_id ≡
    vec_id) by Reciprocal Rank Fusion. This is the full shape the
    reference's E3 leaves to clients: two independent retrievers, each
    truncated to its top-{_HYB_N} (TakeOrderedAndProject heaps — the
    only corpus-scale passes), ranked within the candidate sets on a
    constant-key single partition of ≤{_HYB_N} rows, full-outer joined
    and fused as Σ 1/(k+rank) with a fixed two-term evaluation order
    (bit-exact vs the oracle). At 100 TB the fusion join touches 200
    rows; everything expensive is in the two scans, each independently
    prunable/indexable (IVF for the dense side, the term pre-filter
    for the lexical side)."""
    from vectordb_spark.functions.distance import cosine_distance, vector_literal
    from vectordb_spark.queries.vector import _query_vector

    def ranked(cand: DataFrame, order, rank_name: str) -> DataFrame:
        w = W.partitionBy(F.col("doc_id") * F.lit(0)).orderBy(*order)
        return cand.select(
            "doc_id", F.row_number().over(w).cast("long").alias(rank_name)
        )

    lex_top = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("bm25_q").desc(), F.col("doc_id"))
        .limit(_HYB_N)
    )
    lex_rank = ranked(lex_top, [F.col("bm25_q").desc(), F.col("doc_id")], "r_lex")

    emb = load_table(spark, sf_dir, "embeddings")
    q = vector_literal(_query_vector(spark, sf_dir))
    sem_top = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            cosine_distance("embedding", q, normalized=False).alias("d_cos"),
        )
        .orderBy("d_cos", "doc_id")
        .limit(_HYB_N)
    )
    sem_rank = ranked(sem_top, [F.col("d_cos"), F.col("doc_id")], "r_sem")

    fused = lex_rank.join(sem_rank, "doc_id", "full_outer")
    term = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(_RRF_K) + F.col(r)), F.lit(0.0)
    )
    return (
        fused.select(
            "doc_id",
            "r_lex",
            "r_sem",
            (term("r_lex") + term("r_sem")).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col("doc_id"))
        .limit(10)
    )


_MAXSIM_PHRASES = (
    "fast key order sort",
    "stream batch window merge",
    "customer line join value",
)
_MAXSIM_W = 8  # words per chunk
_MAXSIM_K = 10


def _maxsim_parts():
    from vectordb_spark.embedding import SqlMockEmbedder

    e = SqlMockEmbedder(dimension=16)
    qvs = [[int(x) for x in e._one(p)] for p in _MAXSIM_PHRASES]
    bbs = [sum(x * x for x in qv) for qv in qvs]
    return e, qvs, bbs


def _maxsim_oracle() -> str:
    e, qvs, bbs = _maxsim_parts()
    cos_cols = []
    for k, (qv, bb) in enumerate(zip(qvs, bbs)):
        qlist = "[" + ", ".join(str(x) for x in qv) + "]"
        cos_cols.append(
            f"CASE WHEN aa = 0 THEN NULL ELSE "
            f"CAST(list_sum(list_transform(list_zip(v, {qlist}), p -> p[1]*p[2])) AS DOUBLE)"
            f" / (sqrt(CAST(aa AS DOUBLE)) * sqrt(CAST({bb} AS DOUBLE))) END AS cos{k}"
        )
    w = _MAXSIM_W
    return f"""
    WITH chunks AS (
        SELECT doc_id, t.i AS chunk_id,
               array_to_string(words[(t.i*{w}+1):(t.i*{w}+{w})], ' ') AS chunk_text
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
             unnest(range(0, CAST(ceil(len(words)/{w}.0) AS INT))) AS t(i)
    ),
    vec AS (
        SELECT doc_id, {e.duck_expr("chunk_text")} AS v FROM chunks
    ),
    scored AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(v, x -> x*x)) AS BIGINT) AS aa,
               v
        FROM vec
    ),
    cosed AS (
        SELECT doc_id, {", ".join(cos_cols)} FROM scored
    ),
    agged AS (
        SELECT doc_id, MAX(cos0) AS s0, MAX(cos1) AS s1, MAX(cos2) AS s2
        FROM cosed GROUP BY doc_id
    )
    SELECT doc_id, (s0 + s1) + s2 AS score
    FROM agged
    WHERE s0 IS NOT NULL AND s1 IS NOT NULL AND s2 IS NOT NULL
    ORDER BY score DESC, doc_id LIMIT {_MAXSIM_K}
    """


@query("semantic_maxsim_search", oracle=_maxsim_oracle())
def semantic_maxsim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval (the ColBERT MaxSim idea) as a plain
    Spark plan — BEYOND the reference, which scores one vector per row:
    documents split into {_MAXSIM_W}-word chunks, every chunk embedded
    with the oracle-checkable SqlMockEmbedder (staged Catalyst
    expressions, integer vectors ⇒ exact dots), and a multi-phrase
    query scores each doc as Σ_phrases max_chunks cosine — fine-grained
    phrase-to-passage matching that single-vector search averages away.

    Scale shape: chunking is a generator explode (no shuffle), the
    embed stage is map-side codegen'd arithmetic, and the ONLY shuffle
    is the groupBy(doc_id) max/sum — partial-aggregated map-side, so
    what moves is one row per (doc × 3 phrases), not per chunk. MAX
    over doubles is order-exact; the 3-term final sum has a fixed
    parenthesization mirrored in the oracle. NULL handling: empty
    chunks (aa=0) contribute NULL, MAX ignores them in both engines,
    and docs with no scorable chunk for some phrase are excluded by an
    IS NOT NULL filter ON THE AGGREGATE (which cannot be pushed below
    the groupBy — the embed chain stays single-evaluation)."""
    e, qvs, bbs = _maxsim_parts()
    w = _MAXSIM_W
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    # explode_nonnull positional form (r12): plain posexplode's
    # inferred size>0/notnull pre-filter inlines the transform-HOF
    # chunk build below the projection and evaluates it two extra
    # times per row (see decontam_ngram_overlap's mechanism note).
    # Every doc yields ≥1 chunk and chunk strings are never NULL, so
    # the filter removes nothing (_explode.py contract).
    chunks = explode_nonnull(
        d,
        F.expr(
            f"transform(sequence(0, "
            f"CAST(ceil(size(split(text, ' '))/{w}.0) AS INT) - 1), "
            f"i -> array_join(slice(split(text, ' '), i*{w}+1, {w}), ' '))"
        ),
        "chunk_text",
        keep=("doc_id",),
        pos_alias="chunk_id",
    )
    # r13 (guide §4.2): per-chunk aa + the three phrase dots now come
    # from ONE numpy pass per Arrow batch (embed_dots_df — chunking
    # stays a JVM generator, normalization the same JVM expression);
    # only (doc_id, aa, ab0..ab2) cross back instead of the dim-wide
    # integer vector. Exact int64 both ways → identical cosines;
    # noop-sunk warm min 0.83 → 0.68 s at 32 cores, 1.81 → 0.48 s at 8
    # (compute was the scaling term).
    emb = e.embed_dots_df(chunks, "chunk_text", qvs, keep=("doc_id",))
    cos_cols = []
    for k, bb in enumerate(bbs):
        cos_cols.append(
            F.when(F.col("aa") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.col(f"ab{k}").cast("double")
                / (F.sqrt(F.col("aa").cast("double")) * F.sqrt(F.lit(float(bb))))
            )
            .alias(f"cos{k}")
        )
    cosed = emb.select("doc_id", *cos_cols)
    agged = cosed.groupBy("doc_id").agg(
        F.max("cos0").alias("s0"),
        F.max("cos1").alias("s1"),
        F.max("cos2").alias("s2"),
    )
    return (
        agged.where(
            F.col("s0").isNotNull()
            & F.col("s1").isNotNull()
            & F.col("s2").isNotNull()
        )
        .select(
            "doc_id",
            ((F.col("s0") + F.col("s1")) + F.col("s2")).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(_MAXSIM_K)
    )


# ------------------------------------------- persisted text index gate
#
# The ONLY gate query whose Spark side runs the full Table lexical-
# index lifecycle — insert_df → rebuild_text_index → post-build
# inserts → search_text_df — before answering, while the DuckDB
# oracle recomputes BM25 from the raw corpus. Equality proves the
# persisted-index path (bucket-pruned posting scan + unindexed-tail
# merge + manifest corpus stats) reproduces a corpus scan exactly:
# the same pre/post-rebuild agreement the reference tests for its
# vector index (db_server.cpp QueryDenseVectorDuringRebuild), on the
# lexical surface.
_TIDX_TERMS = ("scan", "filter", "stream")
_TIDX_K = 12

_TIDX_ORACLE = f"""
WITH {_bm25_cte(_TIDX_TERMS)}
SELECT doc_id, bm25_q, n_terms FROM bm25
ORDER BY bm25_q DESC, doc_id LIMIT {_TIDX_K}
"""


@query("text_index_bm25_search", oracle=_TIDX_ORACLE)
def text_index_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → engine Table in a fresh temp warehouse: 80% of the
    corpus bulk-inserted, text index built (postings hash-partitioned
    on token bucket), the remaining 20% inserted AFTER the build so
    the search must merge the pruned index scan with a live tail scan
    (T5's hybrid shape) and extend the manifest's (N, Σdl) stats with
    a tail aggregate — every moving part of the lexical index engaged
    in one query. Top-k is re-cut on (score, doc_id) because _row_id
    assignment order is an ingest artifact the oracle can't see."""
    import os
    import shutil
    import tempfile

    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.table import Table

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "Emb", F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>")
    )
    table_schema = TableSchema(
        name="tidx_docs",
        fields=[
            FieldSchema(name="doc_id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="text", field_type=FieldType.STRING),
            # engine tables require >= 1 vector field (reference
            # basic_meta_impl.cpp:456-458); constant 2-dim filler
            FieldSchema(
                name="Emb", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    work = tempfile.mkdtemp(prefix="vdb_tidx_gate_")
    t = Table(spark, table_schema, os.path.join(work, "tidx_docs"))
    t._init_storage()
    t.insert_df(docs.where(F.col("doc_id") % 5 != 4))
    t.rebuild_text_index("text", buckets=16)
    t.insert_df(docs.where(F.col("doc_id") % 5 == 4))  # unindexed tail
    hits = t.search_text_df(" ".join(_TIDX_TERMS), limit=1 << 30).select(
        "doc_id",
        F.col("_score").alias("bm25_q"),
        F.col("_terms").alias("n_terms"),
    )
    out = (
        hits.orderBy(F.col("bm25_q").desc(), F.col("doc_id"))
        .limit(_TIDX_K)
        .localCheckpoint()  # materialize before the temp warehouse dies
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


# ------------------------------------------------------ phrase BM25
#
# Exact-phrase retrieval: the query is an ORDERED adjacency of
# whitespace tokens; tf counts (possibly overlapping) start positions,
# df counts docs containing the phrase, and the phrase ranks as one
# BM25 pseudo-term on the same quantized grid. The corpus-scan shape
# below verifies positions with a start-position filter inside codegen
# (no explode — one pass, map-side); the Table's positional inverted
# index answers the same query from pruned postings alone
# (search_text_df(phrase=True), exactness pinned in
# tests/test_text_index.py against this definition).
_PHRASE = ("window", "merge")
_PHRASE_K = 15

_PHRASE_ORACLE = f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
hits AS (
    SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
           CAST(len(list_filter(range(1, len(toks)),
                i -> toks[i] = '{_PHRASE[0]}' AND toks[i+1] = '{_PHRASE[1]}'))
                AS BIGINT) AS tf
    FROM t
),
stats AS (
    SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS s FROM hits
),
m AS (SELECT * FROM hits WHERE tf > 0),
dfreq AS (SELECT COUNT(*) AS df FROM m)
SELECT m.doc_id, m.tf AS phrase_tf,
       {_bm25_sq_expr("m.tf", "dfreq.df", "m.dl", "stats.n", "stats.s")} AS bm25_q
FROM m CROSS JOIN dfreq CROSS JOIN stats
ORDER BY bm25_q DESC, doc_id LIMIT {_PHRASE_K}
"""


@query("phrase_bm25_topk", oracle=_PHRASE_ORACLE)
def phrase_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scan exact-phrase BM25. The start-position filter runs
    as a higher-order filter over the token array — one map-side pass,
    no explode, no shuffle until the (tiny) matching set aggregates;
    at 100 TB the only full-data work is the per-row array scan. The
    Spark sequence() guard matters: sequence(1, 0) is DESCENDING
    [1, 0], not empty, so single-token docs need the CASE."""
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    toks = "split(text, ' ', -1)"
    tf_expr = (
        f"CAST(CASE WHEN size({toks}) < 2 THEN 0 ELSE "
        f"size(filter(sequence(1, size({toks}) - 1), "
        f"i -> element_at({toks}, i) = '{_PHRASE[0]}' "
        f"AND element_at({toks}, i + 1) = '{_PHRASE[1]}' )) END AS BIGINT)"
    )
    hits = d.select(
        "doc_id",
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("dl"),
        F.expr(tf_expr).alias("tf"),
    )
    # ONE global aggregate computes corpus stats AND the phrase df
    # (count of tf>0 docs) — previously two separate branches each
    # re-ran the scan + tokenize + position filter (3 full passes per
    # query incl. the matching branch; guide §2.4); now 2 passes and
    # ONE broadcast build instead of two.
    stats = hits.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").cast("long").alias("s"),
        F.count_if(F.col("tf") > 0).alias("df"),
    )
    m = hits.where(F.col("tf") > 0)
    return (
        m.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.col("tf").alias("phrase_tf"),
            F.expr(_bm25_sq_expr("tf", "df", "dl", "n", "s")).alias("bm25_q"),
        )
        .orderBy(F.col("bm25_q").desc(), "doc_id")
        .limit(_PHRASE_K)
    )


# ---------------------------------------------------- batch lexical
#
# Q queries scored in ONE corpus pass — the lexical analog of
# t9_knn_batch (training-data pipelines score thousands of probe
# queries against a corpus; re-scanning per query is the naive O(Q)
# mistake). The token explode prunes to the UNION of all queries'
# terms before any shuffle; a broadcast (term → qid) map fans each
# per-(doc, term) contribution out to its queries; per-qid top-k is a
# rank window that Spark plans as WindowGroupLimit (per-partition
# partial top-k before the qid shuffle — no global sort, and the
# Q-partition window only ever sees ≤ Q·k·partitions rows).
_BATCH_QUERIES = (
    ("q0", ("spark", "merge")),
    ("q1", ("window", "scan")),
    ("q2", ("join", "the", "fast")),
)
_BATCH_K = 5


def _batch_oracle() -> str:
    all_terms = sorted({t for _, ts in _BATCH_QUERIES for t in ts})
    terms_sql = ", ".join(f"'{t}'" for t in all_terms)
    qmap = ", ".join(
        f"('{qid}', '{t}')" for qid, ts in _BATCH_QUERIES for t in ts
    )
    return f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
dl AS (
    SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
),
stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS s FROM dl),
tf AS (
    SELECT doc_id, w, COUNT(*) AS tf FROM toks
    WHERE w IN ({terms_sql}) GROUP BY doc_id, w
),
dfreq AS (
    SELECT w, COUNT(DISTINCT doc_id) AS df FROM toks
    WHERE w IN ({terms_sql}) GROUP BY w
),
qmap(qid, w) AS (VALUES {qmap}),
contrib AS (
    SELECT qmap.qid, tf.doc_id,
           {_bm25_sq_expr("tf.tf", "dfreq.df", "dl.dl", "stats.n", "stats.s")} AS sq
    FROM tf
    JOIN dfreq USING (w)
    JOIN qmap USING (w)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats
),
scored AS (
    SELECT qid, doc_id, CAST(SUM(sq) AS BIGINT) AS bm25_q,
           COUNT(*) AS n_terms
    FROM contrib GROUP BY qid, doc_id
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY bm25_q DESC, doc_id) AS rnk
    FROM scored
)
SELECT qid, doc_id, bm25_q, n_terms, rnk FROM ranked
WHERE rnk <= {_BATCH_K}
ORDER BY qid, rnk
"""


@query("bm25_multiquery_batch", oracle=_batch_oracle())
def bm25_multiquery_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch BM25: one corpus scan serves every query. df/tf/corpus
    stats compute once over the union of terms (all broadcasts except
    the single (doc, term) hit aggregation), the per-query fan-out is
    a broadcast join against the Q·|terms| mapping, and the per-query
    cut is a rank window (WindowGroupLimit, plan-asserted in
    tests/test_plans.py discipline)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents", rebalance=True)
    all_terms = sorted({t for _, ts in _BATCH_QUERIES for t in ts})
    qmap = spark.createDataFrame(
        [(qid, t) for qid, ts in _BATCH_QUERIES for t in ts], "qid string, w string"
    )
    words = F.split("text", " ", -1)
    toks = d.select("doc_id", F.explode(words).alias("w"))
    dl = d.select("doc_id", F.size(words).cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").cast("long").alias("s")
    )
    hits = toks.where(F.col("w").isin(*all_terms))
    tf = hits.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = hits.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    contrib = (
        tf.join(F.broadcast(dfreq), "w")
        .join(F.broadcast(qmap), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "qid",
            "doc_id",
            F.expr(_bm25_sq_expr("tf", "df", "dl", "n", "s")).alias("sq"),
        )
    )
    scored = contrib.groupBy("qid", "doc_id").agg(
        F.sum("sq").cast("long").alias("bm25_q"),
        F.count(F.lit(1)).alias("n_terms"),
    )
    w = W.partitionBy("qid").orderBy(F.col("bm25_q").desc(), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= _BATCH_K)
        .orderBy("qid", "rnk")
    )


# -------------------------------------- text index DELTA-REFRESH gate
#
# Round-13 queue (r12): the Lucene segment-commit discipline as a
# hash-checked row. text_index_bm25_search certifies build + live
# tail; this gate inserts a REFRESH in the middle — 60% build → 20%
# tail → refresh_text_index (tail postings land in an immutable delta
# dir and the manifest's (N, Σdl) corpus stats EXTEND atomically) →
# another 20% live tail → search. The oracle recomputes BM25 from the
# raw corpus, so a hash match proves delta postings + extended stats +
# the remaining live-tail merge reproduce a corpus scan exactly.
_TREF_TERMS = ("merge", "window", "scan")
_TREF_K = 10

_TREF_ORACLE = f"""
WITH {{cte}}
SELECT doc_id, bm25_q, n_terms FROM bm25
ORDER BY bm25_q DESC, doc_id LIMIT {_TREF_K}
"""


@query(
    "text_index_refresh_search",
    oracle=_TREF_ORACLE.format(cte=_bm25_cte(_TREF_TERMS)),
)
def text_index_refresh_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental text-index refresh lifecycle (module comment above):
    the searched corpus spans the main postings dir, one refresh DELTA
    dir (refresh_text_index, the Lucene segment-commit discipline),
    and an unindexed live tail — with the manifest's (N, Σdl) BM25
    stats extended by the refresh and again by the tail aggregate.
    Cited parity: the reference re-serves queries during/after index
    rebuilds (db_server.cpp QueryDenseVectorDuringRebuild); this is
    the incremental-commit analog on the lexical surface."""
    import os
    import shutil
    import tempfile

    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.table import Table

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "Emb", F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>")
    )
    table_schema = TableSchema(
        name="tref_docs",
        fields=[
            FieldSchema(name="doc_id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="text", field_type=FieldType.STRING),
            FieldSchema(
                name="Emb", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    work = tempfile.mkdtemp(prefix="vdb_tref_gate_")
    t = Table(spark, table_schema, os.path.join(work, "tref_docs"))
    t._init_storage()
    five = F.col("doc_id") % 5
    t.insert_df(docs.where(five.isin(0, 1, 2)))      # 60% bulk
    t.rebuild_text_index("text", buckets=16)
    t.insert_df(docs.where(five == 3))               # 20% tail
    t.refresh_text_index("text")                     # -> delta dir
    t.insert_df(docs.where(five == 4))               # 20% live tail
    hits = t.search_text_df(" ".join(_TREF_TERMS), limit=1 << 30).select(
        "doc_id",
        F.col("_score").alias("bm25_q"),
        F.col("_terms").alias("n_terms"),
    )
    out = (
        hits.orderBy(F.col("bm25_q").desc(), F.col("doc_id"))
        .limit(_TREF_K)
        .localCheckpoint()
    )
    shutil.rmtree(work, ignore_errors=True)
    return out


# ----------------------------------------------- multi-field BM25F gate
#
# Round-13 queue (r12): search_text_multi_df — per-field quantized
# BM25 combined with INTEGER weights (each field keeps its own length
# normalization, corpus stats, and document frequencies; the Lucene
# query-time field-boost shape) — was pytest-only. This gate makes it
# hash-checked: Title = the first 8 whitespace tokens of each doc
# (both engines slice identically), Body = the full text, both
# text-indexed, score = 3·bm25_title + 1·bm25_body over docs matching
# in ≥ 1 field. Top-k re-cut on (score, doc_id) because the engine
# tie-breaks on _row_id, an ingest artifact the oracle can't see.
_BMF_TERMS = ("scan", "merge")
_BMF_K = 12
_BMF_TITLE_TOKS = "list_slice(string_split(text, ' '), 1, 8)"

_BMF_ORACLE = f"""
WITH {_bm25_cte(_BMF_TERMS, toks_sql=_BMF_TITLE_TOKS, prefix="t_")},
{_bm25_cte(_BMF_TERMS, prefix="b_")}
SELECT COALESCE(t.doc_id, b.doc_id) AS doc_id,
       3 * COALESCE(t.bm25_q, 0) + COALESCE(b.bm25_q, 0) AS score,
       COALESCE(t.n_terms, 0) + COALESCE(b.n_terms, 0) AS n_terms
FROM t_bm25 t FULL OUTER JOIN b_bm25 b ON t.doc_id = b.doc_id
ORDER BY score DESC, doc_id LIMIT {_BMF_K}
"""


@query("text_bm25f_multifield", oracle=_BMF_ORACLE)
def text_bm25f_multifield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted multi-field lexical search (module comment above)
    through the engine's persisted per-field text indexes
    (Table.search_text_multi_df): integer weights scale the quantized
    per-field scores, so the combination stays exact BIGINT
    arithmetic and the oracle replays it from the raw corpus with two
    independent BM25 chains. One hash match certifies per-field
    stats isolation (Title's 8-token dl vs Body's full dl), the
    ≥1-field candidate rule, and the weighted combine."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
    from vectordb_spark.table import Table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(
            F.slice(F.split(F.col("text"), " ", -1), 1, 8), " "
        ).alias("Title"),
        F.col("text").alias("Body"),
        F.array(F.lit(0.0), F.lit(0.0)).cast("array<float>").alias("Emb"),
    )
    table_schema = TableSchema(
        name="bmf_docs",
        fields=[
            FieldSchema(name="doc_id", field_type=FieldType.INT8, primary_key=True),
            FieldSchema(name="Title", field_type=FieldType.STRING),
            FieldSchema(name="Body", field_type=FieldType.STRING),
            FieldSchema(
                name="Emb", field_type=FieldType.VECTOR_FLOAT,
                dimension=2, metric="EUCLIDEAN",
            ),
        ],
    )
    work = _tempfile.mkdtemp(prefix="vdb_bmf_gate_")
    t = Table(spark, table_schema, _os.path.join(work, "bmf_docs"))
    t._init_storage()
    t.insert_df(docs)
    t.rebuild_text_index("Title", buckets=16)
    t.rebuild_text_index("Body", buckets=16)
    hits = t.search_text_multi_df(
        " ".join(_BMF_TERMS), {"Title": 3, "Body": 1}, limit=1 << 30
    ).select(
        "doc_id",
        F.col("_score").alias("score"),
        F.col("_terms").alias("n_terms"),
    )
    out = (
        hits.orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(_BMF_K)
        .localCheckpoint()
    )
    _shutil.rmtree(work, ignore_errors=True)
    return out
