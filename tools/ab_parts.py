"""Interleaved A/B of the two materialized_backed part execution modes
(registry.parts_mode): eager localCheckpoint ('checkpoint', the
r13-and-earlier shape) vs lazy persist ('persist', r14) — guide §5:
persist computes each part once inside the tail's first job, with no
separate job barrier and no checkpoint write.

Alternates the modes within ONE Spark session (the only A/B the
sandbox's co-tenant noise permits), REPS times per query, bench action
(`.count()`), reports per-mode medians.

Usage: python tools/ab_parts.py [reps] [query ...]
  queries default to the headline queries that still carry >=2-consumer
  parts (the s4 decomposition's part-job bucket).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract
from fiveg_spark.session import get_spark

DEFAULT = [
    "theta_sketch_overlap",
    "watermark_lateness_profile",
    "user_transfer_entropy",
    "dsir_importance",
    "substring_dedup",
    "bm25_retrieval",
    "vocab_jaccard_matrix",
    "minhash_lsh_pairs",
]


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("ab_parts")
    spark.range(1).count()
    qs = contract.queries()

    out: dict[str, dict] = {}
    for name in names:
        raw = {"checkpoint": [], "persist": []}
        # one untimed warm-up per query (page cache, codegen)
        os.environ["SPARK_GRAFT_PARTS"] = "checkpoint"
        qs[name](spark, sf_dir).count()
        for _ in range(reps):
            for mode in ("checkpoint", "persist"):
                os.environ["SPARK_GRAFT_PARTS"] = mode
                spark.sparkContext.setJobDescription(f"ab:{name}:{mode}")
                t0 = time.monotonic()
                qs[name](spark, sf_dir).count()
                raw[mode].append(round(time.monotonic() - t0, 3))
        out[name] = {
            "checkpoint_med": round(statistics.median(raw["checkpoint"]), 3),
            "persist_med": round(statistics.median(raw["persist"]), 3),
            "raw": raw,
        }
        print(
            f"# {name}: checkpoint {out[name]['checkpoint_med']}s "
            f"persist {out[name]['persist_med']}s",
            file=sys.stderr,
        )
    os.environ.pop("SPARK_GRAFT_PARTS", None)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
