"""Time a named subset of contract queries at an arbitrary sf_dir —
the content-scaling companion to bench.py (which owns the fixed sf0.1
headline set).  Prints one JSON line like bench.py.

Usage:
  python tools/bench_scale.py <sf_dir> [query ...]
Defaults to the 5 corpus-heavy queries the r12 verdict asked to measure
at sf1 (tools/gen_scale_docs.py builds that corpus).
"""

from __future__ import annotations

import json
import sys
import time

DEFAULT = [
    "minhash_lsh_pairs",
    "theta_sketch_overlap",
    "substring_dedup",
    "chunk_dedup_census",
    "bm25_retrieval",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    names = sys.argv[2:] or DEFAULT

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    from fiveg_spark.session import get_spark

    spark = get_spark("bench-scale")
    qs = entry.queries()
    times: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        print(f"# {name}: {n} rows in {best:.3f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "scale_subset_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf_dir": sf_dir,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
