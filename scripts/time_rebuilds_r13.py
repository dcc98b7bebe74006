"""Warm-session timing of the trained-quantizer rebuild chain (VERDICT
r12 item 3). Runs each lifecycle build REPEATS times in one session
(round 1 discarded as cold-start per the verify recipe) and prints the
min/median of the rest. Run once on the old code and once on the new
(git stash toggling) — idle machine only.

Usage: python scripts/time_rebuilds_r13.py [repeats]
"""

from __future__ import annotations

import os
import statistics as st
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectordb_spark import get_spark
from vectordb_spark.schema import FieldSchema, FieldType, TableSchema
from vectordb_spark.sources.readers import load_table
from vectordb_spark.table import Table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("time_rebuilds_r13")
    emb = load_table(spark, SF_DIR, "embeddings")
    from vectordb_spark.queries.vector import _query_vector

    qv = _query_vector(spark, SF_DIR)

    def schema(name):
        return TableSchema(
            name=name,
            fields=[
                FieldSchema(name="vec_id", field_type=FieldType.INT8, primary_key=True),
                FieldSchema(name="label", field_type=FieldType.STRING),
                FieldSchema(
                    name="embedding",
                    field_type=FieldType.VECTOR_FLOAT,
                    dimension=len(qv),
                    metric="EUCLIDEAN",
                ),
            ],
        )

    cases = {
        "trained_ivf": dict(index_type="IVF", k=8, train="lloyd", rounds=2),
        "trained_ivfpq": dict(index_type="IVF_PQ", k=8, train="lloyd", rounds=2),
        "sampled_ivf": dict(
            index_type="IVF", k=8, train="lloyd", rounds=2, train_mod=4, train_keep=1
        ),
    }
    results: dict[str, list[float]] = {c: [] for c in cases}
    for rep in range(repeats):
        for cname, kw in cases.items():
            with tempfile.TemporaryDirectory(prefix=f"vdb_tr_{cname}_") as work:
                t = Table(spark, schema(f"{cname}_emb"), os.path.join(work, "t"))
                t._init_storage()
                t.insert_df(emb.orderBy("vec_id").coalesce(1))
                spark.sparkContext.setJobDescription(f"rebuild:{cname}:{rep}")
                t0 = time.time()
                t.rebuild("embedding", **kw)
                dt = time.time() - t0
                spark.sparkContext.setJobDescription(None)
                results[cname].append(dt)
                print(f"rep {rep} {cname}: {dt:.3f}s "
                      f"load={open('/proc/loadavg').read().split()[0]}",
                      flush=True)
    print("\n=== rebuild-only timings (rep 0 = cold, excluded) ===")
    for cname, ts in results.items():
        warm = ts[1:] if len(ts) > 1 else ts
        print(f"{cname:15s} cold={ts[0]:.3f} warm min={min(warm):.3f} "
              f"med={st.median(warm):.3f} all={[round(x, 2) for x in ts]}")


if __name__ == "__main__":
    main()
