"""Demo of the opt-in bench scale probe (VERDICT r12 item 5): run
`bench._scale_probe` alone (no headline suite) at two core counts and
print the per-query c8/c32 ratios. Subprocess per core count so each
session's master/shuffle-partitions derive from $SPARK_GRAFT_CPUS.

Usage: python scripts/scale_probe_demo_r13.py [mult]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 10

_CHILD = r'''
import json, os, sys
sys.path.insert(0, "/root/repo")
import bench
from vectordb_spark import get_spark
from vectordb_spark.queries import all_queries

spark = get_spark("scale_probe_demo")
qs = dict(all_queries())
probe = bench._scale_probe(spark, qs, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), int(sys.argv[1]))
print("PROBE_JSON " + json.dumps(probe))
'''


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, str(MULT)],
        capture_output=True, text=True, env=env,
    )
    for line in r.stdout.splitlines():
        if line.startswith("PROBE_JSON "):
            return json.loads(line[len("PROBE_JSON "):])
    print(r.stdout[-2000:], r.stderr[-2000:])
    raise SystemExit(f"no probe output at cpus={cpus}")


def main() -> None:
    p32 = run(32)
    print("c32:", json.dumps(p32), flush=True)
    p8 = run(8)
    print("c8: ", json.dumps(p8), flush=True)
    print(f"\n=== scale probe ratios (mult={MULT}) ===")
    for q in sorted(set(p32) | set(p8)):
        if q.startswith("_"):
            continue
        a, b = p32.get(q), p8.get(q)
        if a and b:
            print(f"{q:32s} c32={a:7.2f}s c8={b:7.2f}s ratio={b / a:.2f}")


if __name__ == "__main__":
    main()
