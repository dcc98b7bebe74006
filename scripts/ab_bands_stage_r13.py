"""HISTORICAL (r13): this harness predates the light-bands rewrite
of _capped_bands (which now takes the hashes frame and no longer
carries shs); its recorded conclusion stands but it no longer runs
against current signatures without adaptation.

Stage-isolated A/B of the `_capped_bands` explode form (VERDICT r12
item 1): noop-sink ONLY the bands subplan (hash → sig → explode →
window cap) old-vs-new, interleaved, plus a plan dump of each variant
so the InferFiltersFromGenerate claim is checkable for THIS site.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectordb_spark import get_spark
from vectordb_spark.queries import dedup as QD
from vectordb_spark.sources.readers import load_table
from scripts.ab_bands_r13 import _capped_bands_old

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("ab_bands_stage_r13")
    d = load_table(spark, SF_DIR, "documents", rebalance=True)

    old_df = _capped_bands_old(d)
    new_df = QD._capped_bands(d)

    with open("/tmp/bands_old_plan.txt", "w") as fh:
        fh.write(old_df._sc._jvm.PythonSQLUtils.explainString(
            old_df._jdf.queryExecution(), "formatted"))
    with open("/tmp/bands_new_plan.txt", "w") as fh:
        fh.write(new_df._sc._jvm.PythonSQLUtils.explainString(
            new_df._jdf.queryExecution(), "formatted"))

    def sink(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    sink(old_df)
    sink(new_df)  # warmups
    o_s, n_s, loads = [], [], []
    for i in range(pairs):
        loads.append(open("/proc/loadavg").read().split()[0])
        o_s.append(sink(old_df))
        n_s.append(sink(new_df))
        print(
            f"pair {i}: load={loads[-1]} old={o_s[-1]:.3f} new={n_s[-1]:.3f}",
            flush=True,
        )
    import statistics as st

    print(f"\nbands-only noop-sunk over {pairs} pairs:")
    print(f"  old min={min(o_s):.3f} med={st.median(o_s):.3f}")
    print(f"  new min={min(n_s):.3f} med={st.median(n_s):.3f}")
    rows_o = old_df.count()
    rows_n = new_df.count()
    print(f"  rowcounts old={rows_o} new={rows_n} equal={rows_o == rows_n}")


if __name__ == "__main__":
    main()
