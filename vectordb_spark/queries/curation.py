"""Corpus-curation queries: the operators a training-data pipeline
runs AFTER candidate generation — cluster the near-dup pair graph,
sample deterministically per stratum, cap per-source volume, pack
token streams into training sequences.

All run the real scale shape in Spark AND replay in DuckDB (oracle):
- clustering = iterative min-label propagation (operators/graph.py),
  oracle = recursive CTE;
- sampling/caps/packing = hash thresholds and windows — no collected
  driver state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_spark.operators import dedup as D
from vectordb_spark.operators.graph import (
    connected_components,
    duck_connected_components,
)
from vectordb_spark.queries import query
from vectordb_spark.queries.dedup import _MINHASH_ORACLE, dedup_minhash_lsh
from vectordb_spark.sources.readers import load_table

# ------------------------------------------------ near-dup clusters


_CC_ORACLE = (
    duck_connected_components(_MINHASH_ORACLE, "doc_a", "doc_b")
    .strip()
    .replace("SELECT node, MIN(r) AS comp", "SELECT node AS doc_id, MIN(r) AS comp")
)


@query("dedup_cluster_components", oracle=_CC_ORACLE)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from near-dup pairs: connected components over
    the verified MinHash pair graph, component id = min doc_id (the
    canonical keeper). Pairs alone over-delete (A~B, B~C with A,B,C one
    cluster must keep exactly one doc, not resolve two pairs
    independently); this is the step that turns candidate pairs into a
    dedup decision. Iterative join+agg with lineage checkpoints — the
    Spark shape that survives 100 TB pair graphs."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    cc = connected_components(pairs, "doc_a", "doc_b")
    return cc.select(F.col("node").alias("doc_id"), "comp")


# -------------------------------------------- deterministic sampling

# per-language keep rates: the domain-mixing knob of corpus assembly
_RATES = {"en": 0.10, "zh": 0.50}
_DEFAULT_RATE = 0.25
_H_S, _H_D = D.portable_hash64("CAST(doc_id AS STRING)", "doc_id::VARCHAR", seed="strat")


def _rate_case() -> str:
    """Per-lang threshold CASE — valid verbatim in both dialects."""
    parts = ["CASE lang"]
    for lang, rate in sorted(_RATES.items()):
        parts.append(f"WHEN '{lang}' THEN {int(rate * 10000)}")
    parts.append(f"ELSE {int(_DEFAULT_RATE * 10000)} END")
    return " ".join(parts)


_STRAT_ORACLE = f"""
SELECT doc_id, lang
FROM documents
WHERE ({_H_D}) % 10000 < ({_rate_case()})
"""


@query("sample_stratified", oracle=_STRAT_ORACLE)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling by hash threshold: keep a doc iff
    hash(doc_id) mod 10000 falls under its language's rate. Fully
    deterministic (reruns and retries pick identical rows — `rand()`
    cannot), needs NO per-stratum counts or shuffles (a pure map-side
    filter over the scan), and composes: a later rate increase keeps
    every previously sampled doc (threshold grows monotonically)."""
    d = load_table(spark, sf_dir, "documents")
    keep = F.expr(f"({_H_S}) % 10000") < F.expr(_rate_case())
    return d.where(keep).select("doc_id", "lang")


# ------------------------------------------------- per-source caps

_CAP_PER_SOURCE = 5
# type-token ratio: the cheap quality proxy (queries/text.py scores)
_TTR_S = "CAST(size(array_distinct(split(text, ' '))) AS DOUBLE) / size(split(text, ' '))"
_TTR_D = (
    "len(list_distinct(string_split(text, ' ')))::DOUBLE / len(string_split(text, ' '))"
)

_CAP_ORACLE = f"""
SELECT doc_id, source, rank
FROM (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY {_TTR_D} DESC, doc_id
           ) AS rank
    FROM documents
)
WHERE rank <= {_CAP_PER_SOURCE}
"""


@query("source_cap_top_quality", oracle=_CAP_ORACLE)
def source_cap_top_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source volume cap: keep the top-{_CAP_PER_SOURCE} docs per
    source by quality (type-token ratio, ties broken by doc_id — fully
    deterministic). The anti-domination guard of corpus assembly: one
    crawler dump cannot swamp the mix. One window keyed on source —
    shuffles by the cap key only, and at scale rank ≤ N prunes
    map-side via WindowGroupLimit."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.expr(_TTR_S).desc(), F.col("doc_id"))
    return (
        d.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _CAP_PER_SOURCE)
        .select("doc_id", "source", "rank")
    )


# ---------------------------------------------- sequence packing

_SEQ_LEN = 2048
_N_SHARDS = 8

_PACK_ORACLE = f"""
SELECT doc_id, shard, n_tok,
       ((cum - n_tok) // {_SEQ_LEN})::BIGINT AS pack_id,
       ((cum - n_tok) % {_SEQ_LEN})::BIGINT AS pack_offset
FROM (
    SELECT doc_id, shard, n_tok,
           (SUM(n_tok) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ))::BIGINT AS cum
    FROM (
        SELECT doc_id, doc_id % {_N_SHARDS} AS shard,
               len(string_split(text, ' '))::BIGINT AS n_tok
        FROM documents
    )
)
"""


@query("pack_sequences", oracle=_PACK_ORACLE)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-stream packing: concatenate each shard's docs (doc_id
    order) into one virtual token stream and place every doc at its
    (pack_id, offset) in fixed {_SEQ_LEN}-token training sequences —
    the layout step before tensorization. Packing is PER SHARD
    (doc_id mod {_N_SHARDS}): a single global stream would serialize
    into one partition, and sharded packing is what a distributed
    trainer consumes anyway (one stream per data-loader worker). The
    cumulative sum is a running window within shards — Spark plans one
    shuffle keyed on shard."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        (F.col("doc_id") % _N_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tok").over(w)
    start = cum - F.col("n_tok")
    # floor division on non-negative longs: floor(x/y) == x // y exactly
    # (values ≪ 2^53, so the double round-trip is lossless)
    return base.select(
        "doc_id",
        "shard",
        "n_tok",
        F.floor(start / _SEQ_LEN).cast("long").alias("pack_id"),
        (start % _SEQ_LEN).alias("pack_offset"),
    )


# ------------------------------------------- source mixing weights

_MIX_ALPHA = 0.5  # temperature: 1 = proportional, 0 = uniform


@query(
    "source_mixing_weights",
    oracle=f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n,
               (SUM(len(string_split(text, ' '))))::BIGINT AS n_tokens
        FROM documents GROUP BY source
    ),
    powed AS (
        SELECT source, n, n_tokens, pow(CAST(n AS DOUBLE), {_MIX_ALPHA}) AS p
        FROM counts
    )
    SELECT source, n, n_tokens,
           p / (SELECT CAST(SUM(CAST(p AS DECIMAL(28,12))) AS DOUBLE) FROM powed)
               AS weight
    FROM powed
    """,
)
def source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights — the mixture knob of
    multi-source training sets: weight_s ∝ n_s^{_MIX_ALPHA} (α < 1
    upweights small sources so one giant crawl doesn't drown the mix).
    One groupBy over (source) plus a broadcastable scalar normalizer —
    the weights table is k rows however big the corpus. Emits doc and
    token counts so the consumer can convert weights to epochs."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long")).alias("n_tokens"),
    )
    powed = counts.withColumn("p", F.pow(F.col("n").cast("double"), F.lit(_MIX_ALPHA)))
    # decimal-exact normalizer: a plain double SUM is partition-order-
    # dependent in its low bits and would flake the oracle hash
    total = powed.agg(
        F.sum(F.col("p").cast("decimal(28,12)")).cast("double").alias("tp")
    )
    return (
        powed.crossJoin(F.broadcast(total))
        .withColumn("weight", F.col("p") / F.col("tp"))
        .select("source", "n", "n_tokens", "weight")
    )


# ------------------------------------------- keep-best dedup decision


_KEEP_BEST_ORACLE = f"""
WITH cc AS ({_CC_ORACLE}),
j AS (
    SELECT d.doc_id, d.lang, d.n_chars, COALESCE(c.comp, d.doc_id) AS comp
    FROM documents d LEFT JOIN cc c ON d.doc_id = c.doc_id
)
SELECT doc_id, lang, CAST(comp AS BIGINT) AS comp,
       CAST(n_chars AS BIGINT) AS n_chars,
       (row_number() OVER (PARTITION BY comp ORDER BY n_chars DESC, doc_id) = 1)
           AS keep
FROM j
"""


@query("dedup_keep_best", oracle=_KEEP_BEST_ORACLE)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup END STATE: every document gets a keep/drop decision.
    Near-dup clusters (connected components over verified MinHash
    pairs) elect one keeper each — the longest member, ties to the
    smallest doc_id (content-keeps-the-most heuristic; swap the ORDER
    BY for any quality score); docs in no cluster keep themselves
    (comp = own id via the left join + coalesce). One extra shuffle on
    comp over the components output — the pair graph is tiny relative
    to the corpus, so the window partitions are near-singleton at any
    scale.

    As a GATE query this recomputes the MinHash→CC pipeline so it
    stands alone; a production run that needs both the cluster map and
    the decisions should materialize `dedup_cluster_components` once
    (`cc.localCheckpoint()` or persist to parquet — its output is the
    natural pipeline checkpoint) and feed this election from it."""
    docs = load_table(spark, sf_dir, "documents")
    # Materialize the CC map once (the prescription above): without
    # this the iterative pointer-doubling lineage is recomputed for
    # BOTH downstream actions, doubling the gate's wall time.
    cc = dedup_cluster_components(spark, sf_dir).localCheckpoint()
    from pyspark.sql import Window as W

    j = docs.join(cc, "doc_id", "left").select(
        "doc_id",
        "lang",
        "n_chars",
        F.coalesce(F.col("comp"), F.col("doc_id")).alias("comp"),
    )
    w = W.partitionBy("comp").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return j.select(
        "doc_id",
        "lang",
        "comp",
        "n_chars",
        (F.row_number().over(w) == 1).alias("keep"),
    )
