"""Deterministic aggregate helpers.

Float SUM/AVG are order-dependent; at scale, partition order is
arbitrary, so a plain ``sum(double)`` is non-reproducible run-to-run
(and can never hash-match an oracle). These helpers accumulate in
DECIMAL — exact, associative, order-independent — then cast back to
DOUBLE once. Pair with vectordb_spark.plans.oracle.dec_sum / dec_avg.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(col: Column | str, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


def dec_avg(col: Column | str, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double") / F.count(F.lit(1))
