"""HISTORICAL (r13): this harness predates the light-bands rewrite
of _capped_bands (which now takes the hashes frame and no longer
carries shs); its recorded conclusion stands but it no longer runs
against current signatures without adaptation.

Paired interleaved A/B for the r12 `_capped_bands` explode_outer
change (VERDICT r12 "Next round" item 1): settle whether the bands
rewrite regressed dedup_cluster_components / dedup_keep_best.

Method: one warm session; OLD (plain explode, no output filter) vs NEW
(explode_outer + IS NOT NULL, the committed form) alternate
sample-by-sample (O,N,O,N...) so a throttle burst poisons both arms
equally.  dedup_embedding_cosine (code untouched in r12) rides along as
the contention CONTROL: if it moves between arms, the window was dirty.

Usage: python scripts/ab_bands_r13.py [pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectordb_spark import get_spark
from vectordb_spark.queries import dedup as QD
from vectordb_spark.queries import curation as QC

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _capped_bands_old(d, cap=QD._BAND_CAP):
    """The pre-r12 form: plain explode, no output filter."""
    from pyspark.sql import Window as W

    hashes = d.select("doc_id", F.array_distinct(F.expr(QD._SHS_S)).alias("shs"))
    sigs = hashes.select("doc_id", "shs", F.expr(QD._SIG_S).alias("sig"))
    bands = sigs.select(
        "doc_id", "shs", F.explode(F.expr(QD._BK_S)).alias("band_key")
    )
    band_n = F.count(F.lit(1)).over(W.partitionBy("band_key"))
    return (
        bands.withColumn("band_n", band_n)
        .where(F.col("band_n") <= cap)
        .drop("band_n")
    )


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("ab_bands_r13")
    new_impl = QD._capped_bands

    def timed(fn, impl):
        QD._capped_bands = impl
        t0 = time.time()
        n = len(fn(spark, SF_DIR).collect())
        dt = time.time() - t0
        QD._capped_bands = new_impl
        return dt, n

    targets = {
        "cluster_components": QC.dedup_cluster_components,
        "keep_best": QC.dedup_keep_best,
        "minhash_lsh": QD.dedup_minhash_lsh,
    }
    # warmup both arms once (JIT, parquet footers)
    for fn in targets.values():
        timed(fn, _capped_bands_old)
        timed(fn, new_impl)
    timed(QD.dedup_embedding_cosine, new_impl)

    results: dict[str, dict[str, list[float]]] = {
        q: {"old": [], "new": []} for q in targets
    }
    control: list[float] = []
    rows_seen: dict[str, set[int]] = {q: set() for q in targets}
    for i in range(pairs):
        load1 = open("/proc/loadavg").read().split()[0]
        for q, fn in targets.items():
            dt_o, n_o = timed(fn, _capped_bands_old)
            dt_n, n_n = timed(fn, new_impl)
            results[q]["old"].append(dt_o)
            results[q]["new"].append(dt_n)
            rows_seen[q] |= {n_o, n_n}
        t0 = time.time()
        len(QD.dedup_embedding_cosine(spark, SF_DIR).collect())
        control.append(time.time() - t0)
        print(f"pair {i}: loadavg={load1} " + " ".join(
            f"{q}: O={results[q]['old'][-1]:.2f} N={results[q]['new'][-1]:.2f}"
            for q in targets
        ) + f" ctrl={control[-1]:.2f}", flush=True)

    print("\n=== summary (min / median over", pairs, "pairs) ===")
    import statistics as st

    for q in targets:
        o, n = results[q]["old"], results[q]["new"]
        print(
            f"{q:20s} old min={min(o):.3f} med={st.median(o):.3f} | "
            f"new min={min(n):.3f} med={st.median(n):.3f} | "
            f"rowcounts={sorted(rows_seen[q])}"
        )
    print(
        f"{'ctrl embedding_cos':20s} min={min(control):.3f} "
        f"med={st.median(control):.3f} (untouched code — variance floor)"
    )


if __name__ == "__main__":
    main()
