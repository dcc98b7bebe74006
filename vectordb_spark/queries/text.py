"""Text-analysis + dedup surface over the ``documents`` table — the
training-data-pipeline operators beyond reference parity (tokens, exact
dedup, fingerprints). All pure Column expressions; no Python in the row
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_spark.queries import query
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
        F.size(F.split(F.col("text"), " ", -1)).alias("n_tokens"),
        F.length("text").alias("text_len"),
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


@query(
    "text_lang_profile",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           SUM(n_chars) AS sum_chars
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
