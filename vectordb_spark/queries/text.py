"""Text-analysis + dedup surface over the ``documents`` table — the
training-data-pipeline operators beyond reference parity (tokens, exact
dedup, fingerprints). All pure Column expressions; no Python in the row
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_spark.queries import query
from vectordb_spark.queries._explode import explode_nonnull
from vectordb_spark.sources.readers import load_table


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS text_len
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + length stats."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ", -1)).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("text_len"),
    )


@query(
    "dedup_exact_stats",
    oracle="""
    SELECT COUNT(*) AS total_docs,
           COUNT(DISTINCT text) AS distinct_texts,
           COUNT(*) - COUNT(DISTINCT text) AS exact_dups
    FROM documents
    """,
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate statistics (hash-groupBy dedup)."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.count_distinct("text").alias("distinct_texts"),
        (F.count(F.lit(1)) - F.count_distinct("text")).alias("exact_dups"),
    )


@query(
    "dedup_exact_keep_first",
    oracle="""
    SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the lowest doc_id per content hash — the
    scalable pattern: one shuffle on a 128-bit hash, never on the full
    text payload."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("copies")
    )


from vectordb_spark.operators import dedup as D

_RH_S, _RH_D = D.rolling_hash("text", "text")


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id, {_RH_D} AS fingerprint,
           ('0x' || substr(md5(text),1,15))::BIGINT AS content_hash
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: polynomial rolling hash over characters
    + a 60-bit content hash — both portable expressions evaluated
    identically by the oracle (operators/dedup.py)."""
    d = load_table(spark, sf_dir, "documents")
    ch_s, _ = D.portable_hash64("text", "text")
    return d.select(
        "doc_id",
        F.expr(_RH_S).alias("fingerprint"),
        F.expr(ch_s).alias("content_hash"),
    )


_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "de", "que", "y", "un"],
    "fr": ["le", "la", "de", "et", "un", "est"],
}


def _lang_score_exprs() -> tuple[list[str], list[str]]:
    spark_cols, duck_cols = [], []
    for lang, words in _STOPWORDS.items():
        arr = ", ".join(f"'{w}'" for w in words)
        spark_cols.append(
            f"size(filter(split(text,' '), t -> array_contains(array({arr}), t))) "
            f"AS hits_{lang}"
        )
        duck_cols.append(
            f"len(list_filter(string_split(text,' '), t -> list_contains([{arr}], t))) "
            f"AS hits_{lang}"
        )
    return spark_cols, duck_cols


_LS_S, _LS_D = _lang_score_exprs()


@query(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang, {", ".join(_LS_D)},
           len(string_split(text,' ')) AS n_tokens
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID features: per-language stopword hit counts (the
    n-gram-heuristic classifier's scoring stage; argmax/normalize is a
    trivial projection on top). Pure codegen'd array ops."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[F.expr(e.split(" AS ")[0]).cast("long").alias(e.split(" AS ")[1]) for e in _LS_S],
        F.size(F.split("text", " ", -1)).cast("long").alias("n_tokens"),
    )


@query(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_actual,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
               / length(text) AS space_ratio,
           CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
               / length(text) AS digit_ratio,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(string_split(text, ' ')) AS mean_token_len,
           len(list_distinct(string_split(text, ' '))) AS distinct_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS type_token_ratio
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features: length, whitespace/digit ratios, mean
    token length, type-token ratio — the standard cheap heuristics of a
    corpus-quality filter, all JVM-side expressions."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ", -1)
    nospace = F.regexp_replace("text", " ", "")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(toks).cast("long").alias("n_tokens"),
        (
            (F.length("text") - F.length(nospace)).cast("double") / F.length("text")
        ).alias("space_ratio"),
        (
            F.length(F.regexp_replace("text", "[^0-9]", "")).cast("double")
            / F.length("text")
        ).alias("digit_ratio"),
        (F.length(nospace).cast("double") / F.size(toks)).alias("mean_token_len"),
        F.size(F.array_distinct(toks)).cast("long").alias("distinct_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "type_token_ratio"
        ),
    )


@query(
    "text_bpe_token_estimate",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_words,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bytes_div4,
           greatest(
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')),
               CAST(ceil(length(text) / 4.0) AS BIGINT)
           ) AS est_tokens
    FROM documents
    """,
)
def text_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token count estimate: regex word/number/symbol pieces,
    floored by the bytes/4 rule of thumb — the standard pre-tokenizer
    approximation when the real BPE vocab isn't in the data plane."""
    d = load_table(spark, sf_dir, "documents")
    pieces = F.size(
        F.expr(r"regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)")
    )
    div4 = F.ceil(F.length("text") / 4.0).cast("long")
    return d.select(
        "doc_id",
        pieces.cast("long").alias("n_words"),
        div4.alias("n_bytes_div4"),
        F.greatest(pieces.cast("long"), div4).alias("est_tokens"),
    )


@query(
    "text_lang_profile",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile by language/source (integer sums are exact —
    no decimal trick needed)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("sum_chars"),
    )


_TOP_NGRAMS_K = 10


@query(
    "text_top_bigrams_per_lang",
    oracle=f"""
    SELECT lang, bigram, n, rank
    FROM (
        SELECT lang, bigram, n,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY n DESC, bigram
               ) AS rank
        FROM (
            SELECT lang, bigram, COUNT(*) AS n
            FROM (
                SELECT lang,
                       unnest(list_transform(
                           generate_series(1, greatest(len(string_split(text, ' ')) - 1, 0)),
                           j -> array_to_string(list_slice(string_split(text, ' '), j, j + 1), ' ')
                       )) AS bigram
                FROM documents
            )
            GROUP BY lang, bigram
        )
    )
    WHERE rank <= {_TOP_NGRAMS_K}
    """,
)
def text_top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOP_NGRAMS_K} word bigrams per language — the n-gram
    statistics pass of corpus analysis. Explode → count (partial agg
    map-side combines the heavy hitters) → per-lang rank with a
    deterministic (count DESC, bigram) order. At web scale the exact
    count stays tractable because counting shuffles (lang, bigram,
    partial_count), never documents; a count-min sketch is the
    documented swap-in if the bigram vocabulary itself outgrows the
    shuffle."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(toks) < 2, F.slice(toks, 1, 0)
    ).otherwise(
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 1), "
            "j -> concat_ws(' ', slice(split(text, ' '), j, 2)))"
        )
    )
    # explode_nonnull (r12): plain explode's inferred size>0/notnull
    # filter inlines the transform-HOF bigram build below the
    # projection and evaluates it two extra times per row
    # (decontam_ngram_overlap's note has the mechanism + measurement).
    # Bigram strings are never NULL → identical row set (_explode.py
    # contract).
    counts = (
        explode_nonnull(d, bigrams, "bigram", keep=("lang",))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _TOP_NGRAMS_K)
        .select("lang", "bigram", "n", "rank")
    )


# ------------------------------------------- repetition / quality rules

_REP_N = 3  # word n-gram size for the duplicate-fraction signal


@query(
    "text_repetition_ngrams",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, lang, len(t) AS n_tokens,
               CASE WHEN len(t) < {_REP_N} THEN []::VARCHAR[]
                    ELSE list_transform(
                        generate_series(1, len(t) - {_REP_N - 1}),
                        i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
               END AS g
        FROM toks
    )
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(len(g) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
           CASE WHEN len(g) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
           END AS rep_ratio,
           (CASE WHEN len(g) = 0 THEN 0.0
                 ELSE 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
            END) <= 0.5 AS keep
    FROM grams
    """,
)
def text_repetition_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: the fraction of duplicate word
    {_REP_N}-grams (the Gopher/C4 'duplicate n-gram fraction' filter —
    boilerplate and looped generations score high). Pure Column ops:
    the gram list is a ``transform`` over an index ``sequence`` (no
    explode, no shuffle — map-side at any scale); ratio is one double
    division, identical in DuckDB.

    The token array is aliased in its OWN Project (``w``) before the
    gram build references it 3× per index: Catalyst's CollapseProject
    keeps expensive multi-referenced aliases materialized, so the
    split runs once per row; the gram build zips three SLICES of the
    array instead of indexing per gram (element_at-in-a-lambda runs
    interpreted — no codegen subexpression elimination — so an inlined
    split would re-run per access, O(tokens²); measured 20s vs 0.4s at
    sf0.1)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.split(F.col("text"), " ", -1).alias("w")
    )
    grams = F.when(
        F.size("w") < _REP_N, F.array().cast("array<string>")
    ).otherwise(
        F.expr("zip_with(zip_with(slice(w, 1, size(w) - 2), slice(w, 2, size(w) - 2), (x, y) -> concat(x, ' ', y)), slice(w, 3, size(w) - 2), (xy, z) -> concat(xy, ' ', z))")
    )
    withg = toks.select(
        "doc_id",
        "lang",
        F.size("w").cast("long").alias("n_tokens"),
        grams.alias("g"),
    )
    n_g = F.size("g").cast("long")
    n_d = F.size(F.array_distinct("g")).cast("long")
    ratio = F.when(n_g == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - n_d.cast("double") / n_g
    )
    return withg.select(
        "doc_id",
        "lang",
        "n_tokens",
        n_g.alias("n_grams"),
        n_d.alias("n_distinct"),
        ratio.alias("rep_ratio"),
        (ratio <= 0.5).alias("keep"),
    )


# Gopher-style rule thresholds (Rae et al. 2021, table A1 — adapted to
# the synthetic corpus' 10-99 token docs)
_GO_MIN_WORDS, _GO_MAX_WORDS = 20, 100_000
_GO_MIN_MWL, _GO_MAX_MWL = 2.0, 10.0
_GO_STOPS = ("the", "a", "key", "row", "data")
_GO_MIN_STOPS = 2


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH m AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_words,
               CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                   / len(string_split(text, ' ')) AS mean_word_len,
               {" + ".join(f"(list_contains(string_split(text, ' '), '{w}'))::INT" for w in _GO_STOPS)}
                   AS n_stops
        FROM documents
    )
    SELECT doc_id, lang, CAST(n_words AS BIGINT) AS n_words,
           mean_word_len, CAST(n_stops AS BIGINT) AS n_stops,
           n_words BETWEEN {_GO_MIN_WORDS} AND {_GO_MAX_WORDS} AS ok_words,
           mean_word_len BETWEEN {_GO_MIN_MWL} AND {_GO_MAX_MWL} AS ok_mwl,
           n_stops >= {_GO_MIN_STOPS} AS ok_stops,
           (n_words BETWEEN {_GO_MIN_WORDS} AND {_GO_MAX_WORDS})
               AND (mean_word_len BETWEEN {_GO_MIN_MWL} AND {_GO_MAX_MWL})
               AND n_stops >= {_GO_MIN_STOPS} AS keep
    FROM m
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules: word-count bounds, mean
    word length bounds, minimum stop-word hits — the rule battery run
    before any model-based quality scoring. Map-only Column
    arithmetic; mean word length exploits the single-space tokenization
    (chars - spaces) / words so both engines compute one identical
    division."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ", -1)
    n_words = F.size(words).cast("long")
    mwl = (F.length("text") - (n_words - 1)).cast("double") / n_words
    n_stops = sum(
        F.array_contains(words, w).cast("int") for w in _GO_STOPS
    ).cast("long")
    ok_w = (n_words >= _GO_MIN_WORDS) & (n_words <= _GO_MAX_WORDS)
    ok_m = (mwl >= _GO_MIN_MWL) & (mwl <= _GO_MAX_MWL)
    ok_s = n_stops >= _GO_MIN_STOPS
    return d.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        mwl.alias("mean_word_len"),
        n_stops.alias("n_stops"),
        ok_w.alias("ok_words"),
        ok_m.alias("ok_mwl"),
        ok_s.alias("ok_stops"),
        (ok_w & ok_m & ok_s).alias("keep"),
    )


# --------------------------------------------------- fuzzy matching

# misspelled probes → nearest corpus token (vocab normalization for
# noisy text; OCR/typo cleanup). Probes chosen to hit distinct corpus
# words at edit distance 1-2.
_FUZZY_PROBES = ("tabel", "window", "qery", "merg", "colum")


@query(
    "text_fuzzy_match",
    oracle=f"""
    WITH vocab AS (
        SELECT DISTINCT unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    probes AS (
        SELECT unnest(ARRAY[{", ".join(repr(p) for p in _FUZZY_PROBES)}]) AS probe
    ),
    scored AS (
        SELECT p.probe, v.token,
               CAST(levenshtein(p.probe, v.token) AS BIGINT) AS dist
        FROM probes p CROSS JOIN vocab v
    )
    SELECT probe, token AS best_token, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY probe
                                     ORDER BY dist, token) AS rn
        FROM scored
    ) WHERE rn = 1
    """,
)
def text_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy vocabulary match: each probe term finds its nearest corpus
    token by Levenshtein distance (typo/OCR normalization). Distinct
    corpus tokens (one shuffle, vocabulary-sized) × a broadcast probe
    list, integer edit-distance (identical DP in both engines), then a
    per-probe argmin window over the tiny scored set. At 100 TB the
    vocab distinct is the only data-sized stage; everything after is
    vocabulary-sized."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.col("text"), " ", -1)).alias("token"))
        .distinct()
    )
    probes = spark.createDataFrame(
        [(p,) for p in _FUZZY_PROBES], "probe string"
    )
    scored = vocab.crossJoin(F.broadcast(probes)).select(
        "probe",
        "token",
        F.levenshtein("probe", "token").cast("long").alias("dist"),
    )
    # per-probe argmin as MIN over (dist, token) structs: struct
    # comparison is lexicographic, so min(struct) ≡ the row_number()=1
    # row of ORDER BY dist, token — but the aggregate gets map-side
    # partial aggregation (each partition reduces to ≤ |probes| rows
    # before the exchange), where the previous window shuffled ALL
    # |probes|×|vocab| scored rows into ≤ |probes| window partitions
    # and sorted them there — a guaranteed skew funnel at any scale
    # (guide §2.3/§2.5). Output identical.
    best = scored.groupBy("probe").agg(
        F.min(F.struct("dist", "token")).alias("b")
    )
    return best.select(
        "probe", F.col("b.token").alias("best_token"), F.col("b.dist")
    )


# ------------------------------------------- incremental / cross-source


_INCR_SPLIT = 400  # doc_id < 400 = existing corpus, >= 400 = incoming


@query(
    "dedup_incremental_newdocs",
    oracle=f"""
    SELECT n.doc_id, n.lang, n.source
    FROM documents n
    WHERE n.doc_id >= {_INCR_SPLIT}
      AND NOT EXISTS (
          SELECT 1 FROM documents e
          WHERE e.doc_id < {_INCR_SPLIT} AND md5(e.text) = md5(n.text)
      )
    ORDER BY n.doc_id
    """,
)
def dedup_incremental_newdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: an incoming batch keeps only docs
    whose content hash is NOT already in the existing corpus — the
    anti-join every append-only corpus pipeline runs per batch. At
    100 TB the existing side is a pre-computed hash index (one narrow
    md5 column, bucketed by hash); the anti-join shuffles hashes only,
    never text."""
    d = load_table(spark, sf_dir, "documents")
    existing = d.where(F.col("doc_id") < _INCR_SPLIT).select(
        F.md5("text").alias("h")
    )
    incoming = d.where(F.col("doc_id") >= _INCR_SPLIT).select(
        "doc_id", "lang", "source", F.md5("text").alias("h")
    )
    return (
        incoming.join(existing, "h", "left_anti")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@query(
    "dedup_cross_source_overlap",
    oracle="""
    WITH h AS (
        SELECT source,
               md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS hash
        FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS n_shared
    FROM h a JOIN h b ON a.hash = b.hash AND a.source < b.source
    GROUP BY 1, 2
    ORDER BY source_a, source_b
    """,
)
def dedup_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: shared 5-token document
    prefixes between source pairs (the boilerplate-overlap signal —
    which crawls/vendors copy each other's headers; full-content
    overlap is the same plan with md5(text)). Self-join on the 128-bit
    prefix hash with source_a < source_b: shuffle carries
    (hash, source) pairs only; a boilerplate prefix shared by many
    sources fans out to source-pair counts, bounded by sources², not
    the corpus."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        "source",
        F.md5(
            F.concat_ws(" ", F.slice(F.split(F.col("text"), " ", -1), 1, 5))
        ).alias("hash"),
    )
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(
            b,
            (F.col("a.hash") == F.col("b.hash"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy("source_a", "source_b")
    )


# --------------------------------------------- LM-style fluency score


@query(
    "text_bigram_familiarity",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
        SELECT doc_id, w[i] || ' ' || w[i + 1] AS g
        FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
    ),
    model AS (
        SELECT g, COUNT(*) AS freq FROM grams GROUP BY g
    )
    SELECT d.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(m.freq) AS BIGINT) AS familiarity_mass,
           CAST(SUM(m.freq) AS DOUBLE) / COUNT(*) AS mean_bigram_freq
    FROM grams d JOIN model m ON d.g = m.g
    GROUP BY d.doc_id
    """,
)
def text_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-style fluency proxy: the corpus is its own bigram language
    model; each document scores the mean corpus-frequency of its
    bigrams (repetitive/boilerplate text scores high, rare-vocabulary
    text low — the shape of a perplexity filter WITHOUT ln(), whose
    last-ulp differs between libm and the JVM and would break the
    oracle hash; a monotone transform applied client-side reorders
    nothing). Two shuffles: the model groupBy and the score join —
    both on the bigram string; at 100 TB the model side is
    vocabulary², not corpus, sized, and broadcastable once counted.
    Gram arrays by slice-zip (never per-index split re-evaluation —
    see text_repetition_ngrams)."""
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    toks = d.select("doc_id", F.split(F.col("text"), " ", -1).alias("w"))
    # explode_nonnull (r12): plain explode's inferred size>0/notnull
    # pre-filter inlines the zip_with-HOF gram build below the
    # projection — two extra interpreted evaluations per row (see
    # decontam_ngram_overlap). concat of tokens is never NULL →
    # identical row set (_explode.py contract).
    grams = explode_nonnull(
        toks,
        F.expr(
            "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), "
            "(x, y) -> concat(x, ' ', y))"
        ),
        "g",
        keep=("doc_id",),
    )
    model = grams.groupBy("g").agg(F.count(F.lit(1)).alias("freq"))
    return (
        grams.join(model, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("freq").alias("familiarity_mass"),
            (F.sum("freq").cast("double") / F.count(F.lit(1))).alias(
                "mean_bigram_freq"
            ),
        )
    )


# ----------------------------------------- boilerplate span removal

_BP_SPAN = 8  # tokens per span (the "line" unit; corpus has no newlines)
_BP_MAX_DOCS = 4  # spans verbatim in more docs than this are boilerplate

_BP_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
spans AS (
    SELECT doc_id, j.j AS pos,
           array_to_string(
               list_slice(w, j.j * {_BP_SPAN} + 1, j.j * {_BP_SPAN} + {_BP_SPAN}),
               ' ') AS span
    FROM toks,
         UNNEST(range(0, CAST(ceil(len(w) / {_BP_SPAN}.0) AS BIGINT))) AS j(j)
),
ok AS (
    SELECT span FROM spans GROUP BY span
    HAVING COUNT(DISTINCT doc_id) <= {_BP_MAX_DOCS}
)
SELECT s.doc_id,
       COUNT(*) AS n_spans_kept,
       string_agg(s.span, ' ' ORDER BY s.pos) AS cleaned_text
FROM spans s
WHERE s.span IN (SELECT span FROM ok)
GROUP BY s.doc_id
"""


@query("text_boilerplate_span_removal", oracle=_BP_ORACLE)
def text_boilerplate_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate removal at span granularity: tokenize, cut
    fixed {_BP_SPAN}-token spans (the corpus has no newlines — with
    real documents the split is on line breaks, same machinery), count
    each span's distinct-document frequency, drop spans verbatim in
    more than {_BP_MAX_DOCS} docs (headers/licenses/navigation — C4
    removes any line occurring 3+ times), and reconstruct each
    document from its surviving spans in order. Plan: map-side span
    cut → one shuffle on span for the frequency filter (also the skew
    key — a hot boilerplate span groups to ONE count row, never a
    fan-out) → semi-join back → ordered rebuild via sort_array over
    (pos, span) structs. Docs whose every span was boilerplate drop
    out entirely — the intended semantics."""
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    toks = d.select("doc_id", F.split("text", " ", -1).alias("w"))
    # explode_nonnull positional form (r12): the inferred
    # size>0/notnull pre-filter of plain posexplode inlines the
    # transform-HOF span build below the projection — two extra
    # interpreted evaluations per row (see decontam_ngram_overlap).
    # Span strings are never NULL, so filtering the NULL rows of
    # span-less docs leaves the row set identical (_explode.py
    # contract).
    spans = explode_nonnull(
        toks,
        F.expr(
            f"transform(sequence(0, CAST(ceil(size(w) / {_BP_SPAN}.0) AS INT) - 1), "
            f"j -> array_join(slice(w, j * {_BP_SPAN} + 1, {_BP_SPAN}), ' '))"
        ),
        "span",
        keep=("doc_id",),
        pos_alias="pos",
    )
    ok = (
        spans.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") <= _BP_MAX_DOCS)
        .select("span")
    )
    kept = spans.join(ok, "span", "left_semi")
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "span"))),
                lambda s: s.getField("span"),
            ),
            " ",
        ).alias("cleaned_text"),
    )


# ---------------------------------------------- corpus-LM perplexity

_PPL_Q = 1_000_000  # ln quantization grid (1e-6 nats)

_PPL_ORACLE = f"""
WITH bg AS (
    SELECT doc_id, w[t.i] AS w1, w[t.i + 1] AS w2
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         unnest(range(1, greatest(len(w), 1))) AS t(i)
),
c12 AS (
    SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2
),
c1 AS (
    SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1
),
lm AS (
    SELECT c12.w1, c12.w2,
           CAST(floor(ln(CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
                      * {_PPL_Q}) AS BIGINT) AS qln
    FROM c12 JOIN c1 ON c12.w1 = c1.w1
)
SELECT bg.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(-lm.qln) AS BIGINT) AS nll_q
FROM bg JOIN lm ON bg.w1 = lm.w1 AND bg.w2 = lm.w2
GROUP BY bg.doc_id
"""


@query("text_lm_perplexity", oracle=_PPL_ORACLE)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM perplexity scoring — the CCNet/Gopher quality signal
    (docs whose token transitions surprise a language model are noise):
    fit a bigram LM on the corpus itself and score every document's
    negative log-likelihood under it, entirely as joins + aggregates.

    Distributed LM shape: bigram explode is a generator (no shuffle);
    the LM is two hash aggregations (bigram counts, then unigram
    totals as a SUM over them — never a second pass over the corpus);
    scoring is an equi-join of doc-bigrams against the LM on (w1, w2)
    and a per-doc sum. Conditional probability c12/c1 is an exact
    integer ratio; its ln is quantized to a {_PPL_Q}-per-nat integer
    grid BEFORE any aggregation because ln differs between engines in
    the last ulp on ~10% of inputs (measured JVM vs libm) — a 1-ulp
    input flip crosses a 1e-6 bucket with probability ~2e-10, so the
    quantized NLL sums to the same BIGINT in both engines. Consumers
    bucket docs by nll_q / n_bigrams (mean nats × 1e6); the exp() for
    true perplexity is presentation, not pipeline."""
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    # explode_nonnull positional form (r12): plain posexplode's
    # inferred size>0/notnull pre-filter inlines the transform-HOF
    # bigram-struct build below the projection — two extra interpreted
    # evaluations per row (see decontam_ngram_overlap). The struct
    # elements are never NULL, so dropping the NULL rows of
    # single-token docs leaves the row set identical (_explode.py
    # contract).
    bg = explode_nonnull(
        d,
        F.expr(
            "CASE WHEN size(split(text, ' ', -1)) >= 2 THEN "
            "transform(sequence(1, size(split(text, ' ', -1)) - 1), "
            "i -> struct(element_at(split(text, ' ', -1), i) AS w1, "
            "element_at(split(text, ' ', -1), i + 1) AS w2)) "
            "ELSE array() END"
        ),
        "p",
        keep=("doc_id",),
        pos_alias="_pos",
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    lm = c12.join(c1, "w1").select(
        "w1",
        "w2",
        F.expr(
            f"CAST(floor(ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)) "
            f"* {_PPL_Q}) AS BIGINT)"
        ).alias("qln"),
    )
    return (
        bg.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(-F.col("qln")).cast("long").alias("nll_q"),
        )
    )
