"""Z-order (Morton-curve) multi-column clustering.

The scan-pruning story for ONE column is free: sort by the column,
parquet row-group min/max stats skip everything outside the predicate
range. But a table can only be sorted one way — a layout sorted by
`l_partkey` gives `l_suppkey` predicates nothing. Interleaving the
bits of both keys onto a Morton curve gives BOTH predicates locality:
any axis-aligned rectangle in (a, b) space touches a bounded number of
z-contiguous runs, so files written in z-order carry tight min/max
ranges for BOTH columns at once (the Delta Lake / Databricks OPTIMIZE
ZORDER layout discipline, here as a plain repartitionByRange + sort).

Everything is integer bit arithmetic (shifts, masks, adds) expressed
as Spark SQL / DuckDB expressions — bit-identical across engines, no
UDF, fully codegen'd. Reference parity: the reference clusters nothing
(one in-memory segment, brute scans — table_segment_mvp.cpp); this is
a beyond-reference operator for the 100 TB layout problem.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def _interleave_terms(a: str, b: str, bits: int, *, cast: str) -> str:
    """Shared Spark/DuckDB arithmetic: z = Σ_j (((a>>j)&1) << 2j) +
    (((b>>j)&1) << (2j+1)). Plain shifts and adds — both engines fold
    it into codegen / vectorized integer ops."""
    terms = []
    for j in range(bits):
        terms.append(f"((({a} >> {j}) & 1) << {2 * j})")
        terms.append(f"((({b} >> {j}) & 1) << {2 * j + 1})")
    return "(" + " + ".join(terms) + ")"


def z_value_sql(a: str, b: str, bits: int = DEFAULT_BITS) -> str:
    """Spark SQL expression for the Morton z-value of two non-negative
    integer expressions (each truncated to ``bits`` low bits by the
    interleave itself). Valid DuckDB SQL too — the arithmetic subset is
    shared, which is what makes the gate query oracle-checkable."""
    return _interleave_terms(
        f"CAST({a} AS BIGINT)", f"CAST({b} AS BIGINT)", bits, cast="BIGINT"
    )


def z_value(a: Column | str, b: Column | str, bits: int = DEFAULT_BITS) -> Column:
    """Morton z-value Column, composed from Column ops only (no SQL
    string round-trip, no private JVM handles — Spark Connect safe)."""
    if isinstance(a, str):
        a = F.col(a)
    if isinstance(b, str):
        b = F.col(b)
    a = a.cast("bigint")
    b = b.cast("bigint")
    z: Column = F.lit(0).cast("bigint")
    for j in range(bits):
        z = z + F.shiftleft(F.shiftright(a, j).bitwiseAND(F.lit(1)), 2 * j)
        z = z + F.shiftleft(
            F.shiftright(b, j).bitwiseAND(F.lit(1)), 2 * j + 1
        )
    return z


def zorder_by(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    bits: int = DEFAULT_BITS,
    num_files: int | None = None,
) -> DataFrame:
    """Cluster ``df`` on the Morton curve of (col_a, col_b): range-
    partition by z (equal-depth file boundaries via Spark's range
    sampler — no driver-side histogram), sort within partitions, drop
    the helper column. Write the result with ``.write.parquet`` and
    every file carries tight min/max on BOTH columns; a conjunctive
    range predicate then prunes at file AND row-group granularity.

    100 TB shape: repartitionByRange is one shuffle with a sampled
    boundary plan — the same cost as any global sort-for-layout, paid
    once at write time, amortized over every subsequent scan."""
    z = z_value(F.col(col_a), F.col(col_b), bits).alias("_z")
    out = df.withColumn("_z", z)
    if num_files:
        out = out.repartitionByRange(num_files, "_z")
    else:
        out = out.repartitionByRange("_z")
    return out.sortWithinPartitions("_z").drop("_z")
