"""Incremental materialized aggregate views, maintained from the
table's own changefeed.

The 100 TB problem this solves: a dashboard aggregate (rows per
language, revenue per day) over an ingest-heavy table is either
recomputed from the full snapshot on every refresh (rescans history
forever) or kept fresh from DELTAS. ``Table.changes(v, update_preimages
=True)`` already produces exactly the retractable delta stream —
insert/update_post rows add their contribution, delete/update_pre rows
subtract it — so view maintenance is one file-pruned changefeed scan
plus a merge keyed by the group columns, never a base-table scan.

Supported aggregate shape: COUNT(*) plus SUM(expr) per group — the
self-maintainable class (associative, invertible). MIN/MAX are
deliberately out: they are not invertible under deletes without
per-group value multisets, which is a different (and far heavier)
maintenance strategy.

Reference parity: the reference has no derived views at all; its
closest shape is the periodic full index rebuild (X3). This is the
beyond-reference generalization: rebuild = full_build(), periodic
refresh = refresh(), both versioned by the source table's manifest.
"""

from __future__ import annotations

import json
import os
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_spark.table import Table


class IncrementalAggView:
    """COUNT(*) + SUM(value_col) per group_cols, stored as parquet next
    to a tiny JSON state file recording the source version it reflects.

    ``full_build()`` computes from the current snapshot;  ``refresh()``
    advances the view to the source's current version by merging the
    changefeed since the view's version. Both are atomic via
    write-new-dir + state swap; old view dirs are rewritten in place
    only after the new one is committed."""

    def __init__(
        self,
        table: Table,
        path: str,
        group_cols: list[str],
        value_col: str,
    ) -> None:
        self.table = table
        self.path = path
        self.group_cols = list(group_cols)
        self.value_col = value_col
        os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------ state

    @property
    def _state_file(self) -> str:
        return os.path.join(self.path, "_mv_state.json")

    def version(self) -> int | None:
        if not os.path.exists(self._state_file):
            return None
        with open(self._state_file) as fh:
            return int(json.load(fh)["source_version"])

    # superseded v{N} dirs kept after a commit: 1 (the previous view)
    # so an in-flight reader holding the old state never loses its
    # files mid-scan; older dirs are GC'd at the next commit
    KEEP_HISTORY = 1

    def _commit(self, df: DataFrame, version: int) -> None:
        import shutil

        data_dir = os.path.join(self.path, f"v{version}")
        df.write.mode("overwrite").parquet(data_dir)
        tmp = self._state_file + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"source_version": version, "dir": f"v{version}"}, fh)
        os.replace(tmp, self._state_file)
        # vacuum superseded view dirs (ADVICE r7: v{N} accumulated
        # forever), keeping KEEP_HISTORY below the committed version
        old = sorted(
            int(d[1:])
            for d in os.listdir(self.path)
            if d.startswith("v") and d[1:].isdigit() and int(d[1:]) < version
        )
        for v in old[: max(0, len(old) - self.KEEP_HISTORY)]:
            shutil.rmtree(os.path.join(self.path, f"v{v}"), ignore_errors=True)

    def df(self) -> DataFrame:
        with open(self._state_file) as fh:
            st = json.load(fh)
        return self.table.spark.read.parquet(
            os.path.join(self.path, st["dir"])
        )

    # ------------------------------------------------------------ build

    def _agg(self, src: DataFrame) -> DataFrame:
        return src.groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(self.value_col).cast("decimal(28,4)")).alias("_sum_dec"),
        )

    def full_build(self) -> int:
        meta = self.table._load_meta()
        v = int(meta["version"])
        self._commit(self._agg(self.table.df()), v)
        return v

    # ---------------------------------------------------------- refresh

    def refresh(self) -> int:
        """Advance to the source's current version using ONLY the
        changefeed — signed contributions merged into the stored
        aggregates; groups whose count reaches zero drop out."""
        v0 = self.version()
        if v0 is None:
            return self.full_build()
        meta = self.table._load_meta()
        v1 = int(meta["version"])
        if v1 == v0:
            return v0
        ch = self.table.changes(v0, v1, update_preimages=True)
        sign: Column = F.when(
            F.col("_change_type").isin("insert", "update_post"), F.lit(1)
        ).otherwise(F.lit(-1))
        delta = (
            ch.withColumn("_sign", sign)
            .groupBy(*self.group_cols)
            .agg(
                F.sum("_sign").alias("d_rows"),
                F.sum(
                    F.col(self.value_col).cast("decimal(28,4)") * F.col("_sign")
                ).alias("d_sum"),
            )
        )
        # Null-SAFE key equality: a name-list full_outer join uses
        # null-unsafe `=`, so a NULL group key present on both sides
        # would duplicate instead of merging/retracting — silent view
        # corruption for nullable group columns. eqNullSafe (`<=>`)
        # treats NULL as a joinable value; keys are coalesced back out.
        cur = self.df()
        cond = reduce(
            lambda a, b: a & b,
            [cur[c].eqNullSafe(delta[c]) for c in self.group_cols],
        )
        merged = (
            cur
            .join(delta, cond, "full_outer")
            .select(
                *[
                    F.coalesce(cur[c], delta[c]).alias(c)
                    for c in self.group_cols
                ],
                (
                    F.coalesce(F.col("n_rows"), F.lit(0))
                    + F.coalesce(F.col("d_rows"), F.lit(0))
                ).alias("n_rows"),
                (
                    F.coalesce(F.col("_sum_dec"), F.lit(0).cast("decimal(28,4)"))
                    + F.coalesce(F.col("d_sum"), F.lit(0).cast("decimal(28,4)"))
                ).cast("decimal(28,4)").alias("_sum_dec"),
            )
            .where(F.col("n_rows") > 0)
            # freeze before the overwrite: the plan reads the CURRENT
            # view dir, which stays in place until _commit swaps state
            .localCheckpoint()
        )
        self._commit(merged, v1)
        return v1
