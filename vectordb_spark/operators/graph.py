"""Distributed graph operators for corpus curation.

The one that matters for dedup at 100 TB is connected components:
near-dup PAIRS (minhash/simhash band joins) must become near-dup
CLUSTERS before you can keep one representative per cluster — pairs
alone over-delete (A~B, B~C: deleting both B and C loses a unique doc
if A~C is false but they're all one cluster).

``connected_components`` alternates min-label propagation:
  label(x) ← min(label(x), min over neighbors of label(neighbor))
with pointer doubling:
  label(x) ← label(label(x))
to fixpoint. Propagation alone needs O(diameter) rounds — fatal on an
adversarial chain; the doubling step halves the remaining distance to
the component minimum each round, giving O(log diameter) total. Each
round is two joins + one groupBy (shuffles keyed on node id); lineage
is cut every round with localCheckpoint — the standard Spark pattern
for iterative algorithms (without it the plan doubles per iteration
and the driver ooms on analysis long before the executors do any
work). The iteration cap raises if hit rather than returning a wrong
partial answer.

The reference engine has no graph surface; this is a pipeline
extension (BASELINE.json north star). The DuckDB oracle replays the
same fixpoint as a recursive CTE (min over all reachable nodes), so
the operator is hash-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _reset_stats(df: DataFrame) -> DataFrame:
    """Rebuild the frame from its (already materialized) RDD with fresh
    leaf statistics. ``localCheckpoint`` truncates LINEAGE but carries
    the checkpointed plan's estimated sizeInBytes into the new leaf,
    and Catalyst's size-only join estimate is the cartesian PRODUCT of
    its children — so the estimate's digit count doubles every round
    and by round ~20 the driver spends minutes multiplying
    million-digit BigInts inside stats estimation (the loop looks
    hung; observed live on a 100k-node cycle graph). Re-wrapping the
    RDD resets the leaf to the default size estimate, making per-round
    planning cost constant. JVM-side Row conversion only — rows never
    cross into Python."""
    try:  # PySpark >= 4.0 moved the concrete class under sql.classic
        from pyspark.sql.classic.dataframe import DataFrame as _CDF
    except ImportError:  # PySpark 3.x (pyproject declares >= 3.5)
        from pyspark.sql.dataframe import DataFrame as _CDF

    spark = df.sparkSession
    jdf = spark._jsparkSession.createDataFrame(df._jdf.javaRDD(), df._jdf.schema())
    return _CDF(jdf, spark)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``
    (undirected); component = the minimum node id reachable, a
    deterministic canonical representative."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # Materialize the edge list BEFORE symmetrizing: ``e`` appears
    # twice in the union (forward + swapped), and when the edge input
    # is itself an expensive pipeline (the MinHash→verify candidate
    # join in dedup_cluster_components / dedup_keep_best) the single
    # sym plan would run that pipeline twice. The pair list is tiny
    # relative to the corpus, so the checkpoint is cheap and the
    # upstream pipeline runs exactly once.
    e = _reset_stats(e.localCheckpoint())
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = _reset_stats(sym.localCheckpoint())
    labels = _reset_stats(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_min"))
        )
        # ``ocomp`` threads the start-of-round label through the round
        # so convergence is a column comparison on the round's output —
        # no extra join against ``labels`` and no third job.
        prop = (
            labels.alias("l")
            .join(nbr, F.col("l.node") == nbr["a"], "left")
            .select(
                F.col("l.node").alias("node"),
                F.least(
                    F.col("l.comp"), F.coalesce(F.col("nbr_min"), F.col("l.comp"))
                ).alias("comp"),
                F.col("l.comp").alias("ocomp"),
            )
        )
        # pointer doubling: follow the label chain one hop — halves the
        # remaining distance to the component minimum every round.
        # prop is LAZILY checkpointed: lineage is cut and the RDD is
        # persisted, but materialization folds into the eager
        # checkpoint of ``new`` below (block-manager locking computes
        # each partition once even though the self-join reads it from
        # two stages) — one job instead of two.
        prop = prop.localCheckpoint(eager=False)
        new = (
            prop.alias("x")
            .join(
                prop.select(
                    F.col("node").alias("pnode"), F.col("comp").alias("pcomp")
                ),
                F.col("x.comp") == F.col("pnode"),
                "left",
            )
            .select(
                F.col("x.node").alias("node"),
                F.least(
                    F.col("x.comp"), F.coalesce(F.col("pcomp"), F.col("x.comp"))
                ).alias("comp"),
                F.col("x.ocomp").alias("ocomp"),
            )
            .localCheckpoint()  # round action 1: materialize prop + new
        )
        new = _reset_stats(new)
        # round action 2: a scan of the cached checkpoint blocks — the
        # per-round driver cost is now 2 jobs, not 3 (and no shuffle).
        changed = new.where(F.col("comp") != F.col("ocomp")).count()
        labels = new.select("node", "comp")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds the cap — raise max_iter)"
    )


def duck_connected_components(pairs_sql: str, a_col: str, b_col: str) -> str:
    """DuckDB recursive-CTE oracle for ``connected_components`` over a
    pair-producing subquery: component = MIN over all reachable nodes.
    Exponential-state-free because UNION (not UNION ALL) dedups the
    (node, reached) frontier each step."""
    return f"""
WITH RECURSIVE
_pairs AS ({pairs_sql}),
_edges AS (
    SELECT {a_col} AS a, {b_col} AS b FROM _pairs
    UNION
    SELECT {b_col} AS a, {a_col} AS b FROM _pairs
),
_reach(node, r) AS (
    SELECT a, a FROM _edges
    UNION
    SELECT w.node, e.b FROM _reach w JOIN _edges e ON w.r = e.a
)
SELECT node, MIN(r) AS comp FROM _reach GROUP BY node
"""
