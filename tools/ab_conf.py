"""Interleaved A/B of a runtime-settable Spark conf over headline queries.

The sandbox has heavy run-to-run noise, so cross-run bench deltas are
untrustworthy; this alternates variant A (baseline conf) and variant B
(candidate conf) within ONE Spark session, N reps each, and reports the
median per variant (guide §1.2: interleave, median, same session).

Usage:
  python tools/ab_conf.py KEY=VALA KEY=VALB [N] [query ...]
e.g.
  python tools/ab_conf.py \
    spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=0b \
    spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=128m \
    5 q3_shipping_priority
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as _bench
import __spark_entry__ as contract
from fiveg_spark.session import get_spark


def main() -> None:
    conf_a = sys.argv[1].split("=", 1)
    conf_b = sys.argv[2].split("=", 1)
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    names = sys.argv[4:] or list(_bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("ab_conf")
    spark.range(1).count()
    queries = contract.queries()

    out = {}
    for name in names:
        # one warm-up under A so page-cache/JIT warmth is shared
        spark.conf.set(*conf_a)
        queries[name](spark, sf_dir).count()
        t = {"A": [], "B": []}
        for _ in range(n):
            for tag, (k, v) in (("A", conf_a), ("B", conf_b)):
                spark.conf.set(k, v)
                spark.sparkContext.setJobDescription(f"ab:{name}:{tag}")
                t0 = time.time()
                queries[name](spark, sf_dir).count()
                t[tag].append(round(time.time() - t0, 3))
        out[name] = {
            "A_med": round(statistics.median(t["A"]), 3),
            "B_med": round(statistics.median(t["B"]), 3),
            "A": t["A"],
            "B": t["B"],
        }
        print(f"# {name}: A={out[name]['A_med']} B={out[name]['B_med']}",
              file=sys.stderr)
    print(json.dumps({"conf_a": conf_a, "conf_b": conf_b, "n": n,
                      "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
