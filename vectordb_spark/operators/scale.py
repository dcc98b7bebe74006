"""Scale-out helpers: bucketing for shuffle-free co-located joins and
salting for skewed keys — the knobs that keep the engine's joins and
aggregations flat at 100 TB (SURVEY.md §7; guide: partitioning &
shuffle).

- **Bucketing**: write both join sides bucketed+sorted on the key; a
  later sort-merge join reads co-located buckets with NO Exchange on
  either side. At 1000 executors this converts the biggest shuffle in
  a pipeline (fact ⋈ fact) into a local merge.
- **Salting**: a deterministic salt column splits a hot key across N
  reducers; aggregations run partial-per-salt then final (both phases
  decomposable), skewed joins explode the small side N ways. AQE's
  skew-join handles moderate skew automatically; salting is for the
  pathological keys AQE can't split (single-key hot spots).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    path: str,
    table_name: str,
    key: str,
    buckets: int,
    *,
    mode: str = "overwrite",
) -> None:
    """Persist bucketed+sorted by ``key`` as an external table (data at
    ``path``). Joins between tables bucketed on the same key with the
    same bucket count skip the shuffle entirely."""
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table_name)
    )


def salt_column(unique_col: str | Column, n: int) -> Column:
    """Deterministic salt in [0, n): stable hash of a per-row unique
    column (never rand() — resumable, oracle-friendly)."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(n)).cast("int")


def salted_agg(
    df: DataFrame,
    key: str,
    unique_col: str,
    aggs: dict[str, str],
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for decomposable measures
    (sum/count/min/max): partial per (key, salt), final per key. The
    hot key's rows spread over ``n_salts`` reducers in phase one.

    ``aggs`` maps output column name -> 'sum:col' | 'count' |
    'min:col' | 'max:col'.
    """
    partial_cols, final_cols = [], []
    for out, spec in aggs.items():
        if spec == "count":
            partial_cols.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            final_cols.append(F.sum(f"_p_{out}").alias(out))
        else:
            op, col = spec.split(":", 1)
            partial_cols.append(getattr(F, op)(col).alias(f"_p_{out}"))
            final = {"sum": F.sum, "min": F.min, "max": F.max}[op]
            final_cols.append(final(f"_p_{out}").alias(out))
    partial = df.withColumn("_salt", salt_column(unique_col, n_salts)).groupBy(
        key, "_salt"
    ).agg(*partial_cols)
    return partial.groupBy(key).agg(*final_cols)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    *,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe inner equi-join: the large (skewed) side salts
    deterministically; the small side replicates n_salts ways; the join
    key becomes (key, salt) so a hot key spreads over n_salts tasks.
    Result equals ``large.join(small, key)``."""
    salted_large = large.withColumn("_salt", salt_column(unique_col, n_salts))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_large.join(replicated, [key, "_salt"]).drop("_salt")
