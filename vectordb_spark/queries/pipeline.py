"""Training-data pipeline queries beyond dedup: point-in-time (as-of)
enrichment, benchmark decontamination, document chunking, deterministic
dataset splits, and PII redaction.

These are the operations a 100 TB corpus-curation pipeline runs after
dedup (queries/dedup.py) and quality scoring (queries/text.py); the
reference engine has none of them (its surface stops at vector search,
SURVEY.md §2.6), so like joins/windows they are pipeline extensions —
each still oracle-checked against DuckDB from the same portable
expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_spark.operators import dedup as D
from vectordb_spark.operators.asof import asof_join
from vectordb_spark.queries import query
from vectordb_spark.queries._explode import explode_nonnull
from vectordb_spark.sources.readers import load_table

# ------------------------------------------------------------ as-of join

_ASOF_ORACLE = """
WITH u AS (
    SELECT user_id AS k, epoch_us(ts) AS t, 1 AS side,
           event_id, event_type,
           NULL::BIGINT AS tb, NULL::BIGINT AS o_key, NULL::DOUBLE AS o_total
    FROM events
    UNION ALL
    SELECT o_custkey, epoch_us(o_orderdate), 0,
           NULL, NULL, o_orderkey, o_orderkey, o_totalprice
    FROM orders
),
w AS (
    SELECT event_id, event_type, side,
           last_value(o_key IGNORE NULLS) OVER win AS asof_orderkey,
           last_value(o_total IGNORE NULLS) OVER win AS asof_totalprice
    FROM u
    WINDOW win AS (
        PARTITION BY k ORDER BY t ASC, side ASC, tb ASC NULLS FIRST
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
)
SELECT event_id, event_type, asof_orderkey, asof_totalprice
FROM w WHERE side = 1
"""


@query("asof_join_latest_order", oracle=_ASOF_ORACLE)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every event with the user's latest order at-or-before the
    event time — the point-in-time-correct feature lookup (no
    future leakage) every training pipeline needs.

    Plan: union + one shuffle on user_id + running last() — NOT an
    inequality join (operators/asof.py has the scale argument). Times
    compare in the integer µs domain: events carry ns (read as BIGINT,
    ``div 1000``), orders carry µs timestamps (``unix_micros``).
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("user_id"),
        F.expr("ts div 1000").alias("t_us"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        # o_orderdate is TIMESTAMP_NTZ; session tz is pinned UTC so the
        # cast is a pure reinterpretation, matching DuckDB epoch_us
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").alias("t_us"),
        F.col("o_orderkey"),
        F.col("o_totalprice"),
    )
    out = asof_join(
        e,
        o,
        key="user_id",
        left_ts="t_us",
        right_ts="t_us",
        payload=["o_orderkey", "o_totalprice"],
        right_tiebreak="o_orderkey",
    )
    return out.select(
        "event_id",
        "event_type",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )


# ------------------------------------------------- benchmark decontamination

_DECON_N = 5  # word n-gram size (13 is the LLM norm; 5 fits the synthetic docs)
_SHS_S, _SHS_D = D.shingle_hashes("text", _DECON_N)

_DECON_ORACLE = f"""
WITH g AS (
    SELECT doc_id, list_distinct({_SHS_D}) AS g FROM documents
),
bench AS (
    SELECT DISTINCT unnest(g) AS h FROM g WHERE doc_id % 25 = 0
),
corpus AS (
    SELECT doc_id, len(g)::BIGINT AS n_grams, unnest(g) AS h
    FROM g WHERE doc_id % 25 <> 0
)
SELECT doc_id, n_grams, COUNT(*)::BIGINT AS n_hit,
       COUNT(*) / n_grams AS contamination
FROM corpus JOIN bench USING (h)
GROUP BY doc_id, n_grams
"""


@query("decontam_ngram_overlap", oracle=_DECON_ORACLE)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing word
    {_DECON_N}-grams with a benchmark set (held-out docs, here
    ``doc_id % 25 = 0`` standing in for an eval suite).

    Scale shape: the benchmark side collapses to DISTINCT gram hashes —
    tiny next to the corpus — and is broadcast, so the corpus-side
    explode joins map-side with no shuffle of corpus grams; one
    aggregation by doc_id follows. One md5 per shingle, shared with the
    minhash/simhash stages (operators/dedup.py).
    """
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    g = d.select("doc_id", F.array_distinct(F.expr(_SHS_S)).alias("g"))
    # explode_nonnull, NOT explode (r12, guide §2.4/§7.2): plain
    # explode triggers InferFiltersFromGenerate, which pushes a
    # `size(g) > 0 AND isnotnull(g)` filter below this projection —
    # inlining the whole interpreted md5-HOF shingle pipeline into the
    # Filter and evaluating it two extra times per row (measured on
    # this branch: 1.78 s → 0.19 s noop-sunk at sf0.1, rows identical).
    # Gram hashes are never NULL → identical row set (_explode.py
    # contract).
    bench = explode_nonnull(
        g.where(F.col("doc_id") % 25 == 0), "g", "h"
    ).distinct()
    corpus = explode_nonnull(
        g.where(F.col("doc_id") % 25 != 0),
        "g",
        "h",
        keep=("doc_id", F.size("g").cast("long").alias("n_grams")),
    )
    hits = corpus.join(F.broadcast(bench), "h").groupBy("doc_id", "n_grams").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return hits.select(
        "doc_id",
        "n_grams",
        "n_hit",
        (F.col("n_hit") / F.col("n_grams")).alias("contamination"),
    )


# ---------------------------------------------------------- chunking

_CHUNK, _STRIDE = 120, 90  # chars; overlap = 30


def _chunk_duck() -> str:
    n = f"greatest(1, (length(text) - {_CHUNK - _STRIDE} + {_STRIDE - 1}) // {_STRIDE})"
    return f"""
    WITH c AS (
        SELECT doc_id, text,
               unnest(generate_series(0, {n} - 1)) AS chunk_id
        FROM documents
    )
    SELECT doc_id, chunk_id::BIGINT AS chunk_id,
           length(substring(text, chunk_id * {_STRIDE} + 1, {_CHUNK}))::BIGINT AS chunk_chars,
           md5(substring(text, chunk_id * {_STRIDE} + 1, {_CHUNK})) AS chunk_md5
    FROM c
    """


@query("chunk_documents_overlap", oracle=_chunk_duck())
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into fixed-width overlapping windows ({_CHUNK}
    chars, stride {_STRIDE}) — the context-window packing step before
    tokenization. Pure codegen: integer chunk-count arithmetic (no
    float), sequence + posexplode, substring; emits a digest per chunk
    (the driver canonicalizer rejects raw long text / arrays).

    Every doc yields >=1 chunk (empty docs produce one empty chunk)
    so the output is a total partition of the corpus.
    """
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    # ceil((len - overlap) / stride) in exact integer math; numerator
    # stays positive for len >= 0 so trunc-div == floor-div
    n = F.expr(
        f"greatest(1L, (length(text) - {_CHUNK - _STRIDE} + {_STRIDE - 1}) div {_STRIDE})"
    )
    c = d.select(
        "doc_id", "text", F.explode(F.sequence(F.lit(0).cast("long"), n - 1)).alias("chunk_id")
    )
    chunk = F.substring(F.col("text"), F.col("chunk_id").cast("int") * _STRIDE + 1, _CHUNK)
    return c.select(
        "doc_id",
        "chunk_id",
        F.length(chunk).cast("long").alias("chunk_chars"),
        F.md5(chunk).alias("chunk_md5"),
    )


# ------------------------------------------------------ deterministic split

_H_S, _H_D = D.portable_hash64("CAST(doc_id AS STRING)", "CAST(doc_id AS VARCHAR)", seed="split42")

_SPLIT_ORACLE = f"""
WITH b AS (
    SELECT lang, n_chars, ({_H_D}) % 100 AS bucket FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
       lang, COUNT(*)::BIGINT AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY 1, 2
"""


@query("split_hash_assign", oracle=_SPLIT_ORACLE)
def split_hash_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test assignment by seeded
    content-stable hash of the primary key — reproducible across runs,
    cluster sizes, and partitionings (never ``rand()``: re-executed
    tasks would re-draw and leak rows across splits). Reported per
    language to expose distribution skew.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(f"({_H_S}) % 100")
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return d.groupBy(split.alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# ----------------------------------------------------------- PII redaction

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"
# Spark SQL string literals process backslash escapes; double them for
# the F.expr() path (the DataFrame-API patterns are passed verbatim)
_EMAIL_RE_SQL = _EMAIL_RE.replace("\\", "\\\\")
_PHONE_RE_SQL = _PHONE_RE.replace("\\", "\\\\")

# deterministic augmentation: plant one email + one phone per doc so the
# redaction path is exercised on every row regardless of corpus content
_AUG_S = (
    "concat(text, ' contact user', CAST(doc_id AS STRING), "
    "'@mail.example.com or +1-555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))"
)
_AUG_D = (
    "concat(text, ' contact user', CAST(doc_id AS VARCHAR), "
    "'@mail.example.com or +1-555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))"
)

_PII_ORACLE = f"""
WITH a AS (SELECT doc_id, {_AUG_D} AS aug FROM documents),
r AS (
    SELECT doc_id,
           len(regexp_extract_all(aug, '{_EMAIL_RE}'))::BIGINT AS n_emails,
           len(regexp_extract_all(aug, '{_PHONE_RE}'))::BIGINT AS n_phones,
           regexp_replace(regexp_replace(aug, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS red
    FROM a
)
SELECT doc_id, n_emails, n_phones,
       length(red)::BIGINT AS red_chars, md5(red) AS red_md5
FROM r
"""


@query("pii_redact", oracle=_PII_ORACLE)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub emails / phone numbers from document text before training.
    Patterns are deliberately dialect-portable (no lookaround, no \\d
    class shorthand inside char classes) so Java regex (Spark, codegen)
    and RE2 (DuckDB) agree byte-for-byte; a deterministic email+phone
    is planted per doc so every row exercises both rules.

    Map-only — no shuffle at any scale; emits counts + digest (driver
    canonicalizer can't sort multi-KB redacted text).
    """
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    aug = F.expr(_AUG_S)
    red = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all({_AUG_S}, '{_EMAIL_RE_SQL}', 0)"))
        .cast("long")
        .alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all({_AUG_S}, '{_PHONE_RE_SQL}', 0)"))
        .cast("long")
        .alias("n_phones"),
        F.length(red).cast("long").alias("red_chars"),
        F.md5(red).alias("red_md5"),
    )


# ------------------------------------------------- binned range join

_RJ_W_US = 300_000_000  # 5-minute follow-on window, µs


_RJ_ORACLE = f"""
WITH e AS (
    SELECT event_id, user_id, event_type, value, epoch_us(ts) AS t
    FROM events
),
anchors AS (SELECT * FROM e WHERE event_type = 'purchase')
SELECT a.event_id, a.user_id, a.t AS t_us,
       COUNT(f.event_id) AS n_follow,
       CAST(COALESCE(SUM(CAST(f.value AS DECIMAL(28,4))), 0) AS DOUBLE)
           AS follow_value
FROM anchors a
LEFT JOIN e f
  ON f.user_id = a.user_id
 AND f.t > a.t AND f.t <= a.t + {_RJ_W_US}
GROUP BY a.event_id, a.user_id, a.t
"""


@query("rj_follow_on_events", oracle=_RJ_ORACLE)
def rj_follow_on_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: for every purchase event, count + sum the
    same user's events in the following 5 minutes — the
    conversion-window / feature-window join.

    Spark has no native band-join physical operator, and the naive
    formulation (equi-join on user then ``f.t BETWEEN ...``) degrades
    to per-user cross products. The scale shape used here is BINNED
    range join: both sides bucket time into window-width bins, anchors
    probe their own bin and the next (an exploded 2-element array), and
    the join becomes a pure equi-join on (user_id, bin) — shuffle
    volume O(rows·2), per-task work bounded by bin population, and AQE
    can split a hot (user, bin). The exact interval predicate filters
    the in-bin candidates. DuckDB oracle: the plain inequality join
    (correct at sf0.01; the binned plan is the 100 TB formulation).
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.expr("ts div 1000").alias("t"),
    )
    follows = e.select(
        "user_id",
        F.col("event_id").alias("f_id"),
        F.col("value").alias("f_value"),
        F.col("t").alias("f_t"),
        F.expr(f"t div {_RJ_W_US}").alias("bin"),
    )
    anchors = (
        e.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("t_us"),
            F.explode(
                F.array(
                    F.expr(f"t div {_RJ_W_US}"),
                    F.expr(f"t div {_RJ_W_US}") + 1,
                )
            ).alias("bin"),
        )
    )
    # left join keeps every anchor probe; the interval predicate lives
    # INSIDE the aggregates (a where-filter would delete an anchor
    # whose in-bin candidates all fail the interval — no null row
    # exists for it, the join matched). count/sum over the CASE keeps
    # zero-anchors as 0-rows: one shuffle-join + one agg total.
    in_window = (F.col("f_t") > F.col("t_us")) & (
        F.col("f_t") <= F.col("t_us") + _RJ_W_US
    )
    joined = anchors.join(follows, ["user_id", "bin"], "left")
    return joined.groupBy("event_id", "user_id", "t_us").agg(
        F.count(F.when(in_window, F.col("f_id"))).alias("n_follow"),
        F.coalesce(
            F.sum(
                F.when(in_window, F.col("f_value").cast("decimal(28,4)"))
            ).cast("double"),
            F.lit(0.0),
        ).alias("follow_value"),
    )


# --------------------------------------------- end-to-end curation

_CUR_STOPS = ("the", "a", "key", "row", "data")


_CURATE_ORACLE = f"""
WITH t AS (
    SELECT doc_id, lang, n_chars, text, string_split(text, ' ') AS w
    FROM documents
),
q AS (
    SELECT doc_id, lang, n_chars, text,
           len(w) AS n_words,
           CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w) AS mwl,
           {" + ".join(f"(list_contains(w, '{s}'))::INT" for s in _CUR_STOPS)} AS n_stops,
           CASE WHEN len(w) < 3 THEN []::VARCHAR[]
                ELSE list_transform(generate_series(1, len(w) - 2),
                                    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])
           END AS g
    FROM t
),
kept AS (
    SELECT doc_id, lang, n_chars, text FROM q
    WHERE n_words BETWEEN 20 AND 100000
      AND mwl BETWEEN 2.0 AND 10.0
      AND n_stops >= 2
      AND (CASE WHEN len(g) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
           END) <= 0.5
),
keepers AS (
    SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)
),
final AS (
    SELECT k.doc_id, k.lang, k.n_chars FROM kept k
    JOIN keepers s ON k.doc_id = s.doc_id
)
SELECT CASE WHEN ({_H_D.replace("doc_id", "final.doc_id")}) % 100 < 80 THEN 'train'
            WHEN ({_H_D.replace("doc_id", "final.doc_id")}) % 100 < 90 THEN 'valid'
            ELSE 'test' END AS split,
       lang, COUNT(*)::BIGINT AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM final GROUP BY 1, 2
"""


@query("curate_end_to_end", oracle=_CURATE_ORACLE)
def curate_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline as ONE declarative plan: quality
    rules (Gopher battery + duplicate-3-gram repetition cap) → exact
    dedup keep-first → deterministic hash split → per-(split, lang)
    accounting. Demonstrates that each stage is a composable DataFrame
    transform — Catalyst fuses the quality filters into the scan
    projection, the dedup is one hash shuffle, the split adds none.
    100 TB shape: filter (map) → shuffle on text-hash → broadcast-free
    self-semi-join on keeper ids → map split → final agg.
    """
    d = load_table(spark, sf_dir, "documents", rebalance=True)
    # token array aliased in its own Project (CollapseProject keeps
    # non-cheap multi-referenced aliases) and grams built by zipping
    # slices, never element_at-in-a-lambda — predicate pushdown inlines
    # these expressions into the filter, where a per-access split would
    # be O(tokens²) interpreted (see text_repetition_ngrams)
    toks = d.select(
        "doc_id",
        "lang",
        "n_chars",
        "text",
        F.split(F.col("text"), " ", -1).alias("w"),
    )
    grams = F.when(F.size("w") < 3, F.array().cast("array<string>")).otherwise(
        F.expr("zip_with(zip_with(slice(w, 1, size(w) - 2), slice(w, 2, size(w) - 2), (x, y) -> concat(x, ' ', y)), slice(w, 3, size(w) - 2), (xy, z) -> concat(xy, ' ', z))")
    )
    staged = toks.select(
        "doc_id", "lang", "n_chars", "text", "w", grams.alias("g")
    )
    n_words = F.size("w").cast("long")
    mwl = (F.length("text") - (n_words - 1)).cast("double") / n_words
    n_stops = sum(F.array_contains("w", s).cast("int") for s in _CUR_STOPS)
    n_g = F.size("g")
    rep = F.when(n_g == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct("g")).cast("double") / n_g
    )
    kept = staged.where(
        (n_words >= 20)
        & (n_words <= 100_000)
        & (mwl >= 2.0)
        & (mwl <= 10.0)
        & (n_stops >= 2)
        & (rep <= 0.5)
    ).select("doc_id", "lang", "n_chars", "text")
    # keep-first = row_number()==1 over the text-hash class, ONE window
    # over ONE exchange on md5(text) — the previous groupBy(md5) +
    # left-semi-join shape evaluated the whole scan + quality battery
    # TWICE (once per join branch) and paid two exchanges (hash agg +
    # semi join). Same keeper set: min(doc_id) per hash class ≡ the
    # rank-1 row ordered by doc_id (guide §2.4 — two operations keyed
    # the same way share one exchange).
    from pyspark.sql import Window as _W

    _kw = _W.partitionBy(F.md5("text")).orderBy("doc_id")
    final = (
        kept.withColumn("_rn", F.row_number().over(_kw))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    bucket = F.expr(f"({_H_S}) % 100")
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return final.groupBy(split.alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
