"""Command-line entry point: drive any registered query the way the
reference repo's jobs are driven (spark-submit a script / python
train.py), without writing code.

    python -m fiveg_spark list [--oracle-only]
    python -m fiveg_spark run  <query> [--sf-dir DIR] [--limit N] [--json]
    python -m fiveg_spark explain <query> [--sf-dir DIR]
    python -m fiveg_spark lint <query> [--sf-dir DIR]
    python -m fiveg_spark bench [--sf-dir DIR]
    python -m fiveg_spark ledger <out.json> [--sf-dir DIR] [--diff OLD]

``run`` prints the result as a table (or JSON lines with --json),
``explain`` prints the formatted physical plan (the 100 TB sanity
check: pushed filters, pruned schemas, exchange count), ``lint`` runs
the plan advisor, ``bench`` delegates to bench.py's headline loop,
``ledger`` fingerprints every registered query's plan shape into a
JSON artifact and (with --diff) prints the shape regressions vs an
older ledger (plans/plan_ledger.py).

Session sizing follows the same env knobs as everything else
(SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE / SPARK_GRAFT_MASTER).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _contract():
    # __spark_entry__ lives at the repo root, next to this package — the
    # CLI is repo tooling (run it from a checkout), not a wheel feature
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        import __spark_entry__ as contract
    except ModuleNotFoundError as exc:
        if exc.name != "__spark_entry__":
            raise  # a real missing dependency (pyspark, numpy, ...)
        raise SystemExit(
            "the fiveg_spark CLI needs the repo-level query registry "
            "(__spark_entry__.py); run it from a repository checkout"
        ) from exc

    return contract


def main(argv: list[str] | None = None, spark=None) -> int:
    """Parse and execute one CLI command.  ``spark`` is injectable so
    tests reuse the session fixture instead of paying a JVM start."""
    parser = argparse.ArgumentParser(prog="python -m fiveg_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--oracle-only", action="store_true")

    for name in ("run", "explain", "lint"):
        p = sub.add_parser(name)
        p.add_argument("query")
        p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
        if name == "run":
            p.add_argument("--limit", type=int, default=20)
            p.add_argument("--json", action="store_true")

    p_bench = sub.add_parser("bench", help="run the headline benchmark")
    p_bench.add_argument("--sf-dir", default=None)

    p_ledger = sub.add_parser(
        "ledger", help="record / diff plan-shape fingerprints"
    )
    p_ledger.add_argument("out")
    p_ledger.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_ledger.add_argument("--diff", default=None,
                          help="older ledger to diff against")

    args = parser.parse_args(argv)
    contract = _contract()

    if args.cmd == "bench":
        if args.sf_dir:
            os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
        import bench

        bench.main()
        return 0

    queries = contract.queries()
    oracles = contract.oracle_sql()

    if args.cmd == "ledger":
        from fiveg_spark.plans.plan_ledger import (
            diff_ledgers,
            load_ledger,
            record_ledger,
        )

        if spark is None:
            from fiveg_spark.session import get_spark

            spark = get_spark("cli-ledger")
        # load the baseline FIRST: recording may overwrite args.diff
        # (update-in-place is the natural usage for a tracked artifact)
        old_ledger = load_ledger(args.diff) if args.diff else None
        ledger = record_ledger(queries, spark, args.sf_dir, args.out)
        print(f"recorded {len(ledger['queries'])} fingerprints -> {args.out}")
        if old_ledger is not None:
            findings = diff_ledgers(old_ledger, ledger)
            for f in findings:
                print(json.dumps(f, sort_keys=True))
            if not findings:
                print("no shape changes")
            return 1 if any(
                f["kind"] in ("regressed", "broken") for f in findings
            ) else 0
        return 0

    if args.cmd == "list":
        for name in sorted(queries):
            if args.oracle_only and name not in oracles:
                continue
            tag = "oracle" if name in oracles else "rows-only"
            print(f"{name}\t{tag}")
        return 0

    if args.query not in queries:
        print(f"unknown query {args.query!r} — see `list`", file=sys.stderr)
        return 2

    if spark is None:
        from fiveg_spark.session import get_spark

        spark = get_spark(f"cli-{args.cmd}")
    df = queries[args.query](spark, args.sf_dir)

    if args.cmd == "explain":
        from fiveg_spark.plans.explain import formatted_plan

        print(formatted_plan(df))
        return 0

    if args.cmd == "lint":
        from fiveg_spark.plans.advisor import lint_plan

        findings = lint_plan(df)
        for f in findings:
            print(f"{f.severity}\t{f.rule}\t{f.detail}")
        if not findings:
            print("clean")
        return 1 if any(f.severity == "error" for f in findings) else 0

    # run
    if args.json:
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
