"""Regenerate driver_certified.json from the CORRECTNESS_r*.json files.

Run at the START of each round (the round-4 postmortem: the certified
set was maintained by hand, nobody appended the round's 50 new names,
and the next window would have re-stamped the same queries).  This
makes the merge mechanical:

    python tools/update_certified.py        # rewrite + report
    python tools/update_certified.py --check  # exit 1 if stale

`__spark_entry__.queries()` reads the JSON to sort never-certified
oracle-backed queries into the driver's 50-slot window.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "driver_certified.json")


def _round_of(path: str) -> int:
    m = re.search(r"_r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def certified_names() -> set[str]:
    """Latest-round-wins: a query's status is taken from the HIGHEST round
    whose CORRECTNESS file mentions it (r12 advice: an any-round union kept
    a regressed query certified forever, sinking it to the back of the
    driver window instead of re-verifying the known regression)."""
    latest: dict[str, bool] = {}
    for path in sorted(
        glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")), key=_round_of
    ):
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            if isinstance(res, dict) and "hash_match" in res:
                latest[name] = bool(res.get("hash_match"))
    return {name for name, ok in latest.items() if ok}


def main() -> int:
    fresh = certified_names()
    try:
        with open(OUT) as f:
            current = set(json.load(f))
    except FileNotFoundError:
        current = set()
    missing = sorted(fresh - current)
    regressed = sorted(current - fresh)
    if "--check" in sys.argv:
        if missing or regressed:
            if missing:
                print(f"STALE: {len(missing)} certified names not in {OUT}: {missing}")
            if regressed:
                print(
                    f"STALE: {len(regressed)} names in {OUT} are not certified "
                    f"at their latest round: {regressed}"
                )
            return 1
        print(f"up to date ({len(current)} certified)")
        return 0
    with open(OUT, "w") as f:
        json.dump(sorted(fresh), f, indent=0)
        f.write("\n")
    print(f"{OUT}: {len(current)} -> {len(fresh)} (+{len(missing)} -{len(regressed)})")
    for name in missing:
        print(f"  + {name}")
    for name in regressed:
        print(f"  - {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
