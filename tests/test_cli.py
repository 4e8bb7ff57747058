"""CLI entry point: the commands users actually type, run in-process
against the session fixture (no per-test JVM start)."""

from __future__ import annotations

import json

from fiveg_spark.__main__ import main
from tests.conftest import SF_DIR


def test_cli_list_and_run_and_lint(spark, capsys):
    assert main(["list", "--oracle-only"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    names = {line.split("\t")[0] for line in lines}
    assert "kpi36" in names and "minhash_lsh_pairs" in names
    assert all(line.endswith("oracle") for line in lines)

    assert main(["run", "q6_revenue_filter", "--sf-dir", SF_DIR, "--json"], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and "revenue" in json.loads(out[0])

    assert main(["lint", "q6_revenue_filter", "--sf-dir", SF_DIR], spark=spark) == 0

    assert main(["explain", "q6_revenue_filter", "--sf-dir", SF_DIR], spark=spark) == 0
    plan = capsys.readouterr().out
    assert "PushedFilters" in plan or "Physical Plan" in plan


def test_cli_rejects_unknown_query(spark, capsys):
    assert main(["run", "no_such_query", "--sf-dir", SF_DIR], spark=spark) == 2
    assert "unknown query" in capsys.readouterr().err
