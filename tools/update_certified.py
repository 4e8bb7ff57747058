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
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "driver_certified.json")


def certified_names() -> set[str]:
    names: set[str] = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            if isinstance(res, dict) and res.get("hash_match"):
                names.add(name)
    return names


def main() -> int:
    fresh = certified_names()
    try:
        with open(OUT) as f:
            current = set(json.load(f))
    except FileNotFoundError:
        current = set()
    missing = sorted(fresh - current)
    if "--check" in sys.argv:
        if missing:
            print(f"STALE: {len(missing)} certified names not in {OUT}: {missing}")
            return 1
        print(f"up to date ({len(current)} certified)")
        return 0
    with open(OUT, "w") as f:
        json.dump(sorted(fresh | current), f, indent=0)
        f.write("\n")
    print(f"{OUT}: {len(current)} -> {len(fresh | current)} (+{len(missing)})")
    for name in missing:
        print(f"  + {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
