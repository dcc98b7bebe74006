"""Mimic the driver's correctness gate locally.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given scale factor, then compares row count, column
names, and values (exact for ints/strings, bitwise-with-report for
floats). Stricter than the driver's hash — if this passes, the hash
matches.

Usage:
    python scripts/selfcheck.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from pyspark.sql import types as T
from vectordb_spark import get_spark
from vectordb_spark.queries import ORACLE_WINDOW
from vectordb_spark.sources.readers import TESTDATA_TABLES


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # array-valued cells (Spark arrays / DuckDB lists) → tuples so they
    # compare and sort deterministically
    for col in df.columns:
        if len(df) and isinstance(df[col].iloc[0], (list, np.ndarray)):
            df[col] = df[col].map(lambda v: tuple(v.tolist() if isinstance(v, np.ndarray) else v))
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(spark_df) != len(duck_df):
        errs.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    scols, dcols = sorted(spark_df.columns), sorted(duck_df.columns)
    if scols != dcols:
        errs.append(f"columns: spark={scols} duck={dcols}")
    if errs:
        return errs
    # dtype parity: the driver's "schema" check may include types, so
    # int32-vs-int64 style drift between engines is treated as a failure
    for col in scols:
        sd, dd = str(spark_df[col].dtype), str(duck_df[col].dtype)
        if sd != dd:
            errs.append(f"dtype {col}: spark={sd} duck={dd}")
    s, d = _normalize(spark_df), _normalize(duck_df)
    for col in s.columns:
        sv, dv = s[col].to_numpy(), d[col].to_numpy()
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
            sv = sv.astype(np.float64)
            dv = dv.astype(np.float64)
            if not np.array_equal(sv, dv, equal_nan=True):
                diff = np.abs(sv - dv)
                bad = int((~np.isclose(sv, dv, rtol=0, atol=0, equal_nan=True)).sum())
                errs.append(
                    f"col {col}: {bad} float mismatches, max_abs_diff="
                    f"{np.nanmax(diff):.3e}"
                )
        else:
            # scalar-safe NULL sentinel (fillna on object series emits a
            # pandas FutureWarning about silent downcasting; map doesn't)
            def _sentinel(v):
                try:
                    if pd.isna(v):
                        return "\0NULL"
                except (TypeError, ValueError):
                    pass  # tuples/arrays: pd.isna is non-scalar — keep as-is
                return v

            eq = pd.Series(sv).astype(object).map(_sentinel) == pd.Series(
                dv
            ).astype(object).map(_sentinel)
            if not bool(eq.all()):
                bad = int((~eq).sum())
                i = int(np.argmax(~eq.to_numpy()))
                errs.append(
                    f"col {col}: {bad} mismatches, first at row {i}: "
                    f"spark={sv[i]!r} duck={dv[i]!r}"
                )
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SELFCHECK_SF", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)
    n_pass = n_fail = n_noracle = 0
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown query names: {unknown}; known: {sorted(qs)}")
        return 2
    for name in names:
        t0 = time.time()
        try:
            spark_df = qs[name](spark, args.sf)
            # Driver-canonicalizer rule (VERDICT r5/r6, three strikes):
            # in-window gate outputs must be scalar-only — the driver's
            # pandas sort over all columns crashes on list cells. Catch
            # it HERE, where every future gate query passes, instead of
            # re-diagnosing it one round after each regression.
            if name in ORACLE_WINDOW:
                complex_cols = [
                    f.name
                    for f in spark_df.schema.fields
                    if isinstance(
                        f.dataType, (T.ArrayType, T.MapType, T.StructType)
                    )
                ]
                if complex_cols:
                    print(
                        f"FAIL {name}: non-scalar output columns "
                        f"{complex_cols} would crash the driver "
                        "canonicalizer — flatten to scalar columns"
                    )
                    n_fail += 1
                    continue
            sdf = spark_df.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only check) rows={len(sdf)}")
            n_noracle += 1
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        errs = _compare(name, sdf, ddf)
        dt = time.time() - t0
        if errs:
            n_fail += 1
            print(f"FAIL {name} ({dt:.1f}s):")
            for e in errs:
                print(f"  - {e}")
        else:
            n_pass += 1
            print(f"PASS {name} ({dt:.1f}s, rows={len(sdf)})")
    print(f"\n{n_pass} passed, {n_fail} failed, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
