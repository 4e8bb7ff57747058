"""Physical-plan inspection helpers (SURVEY §7 step 8).

Programmatic access to the properties that matter at 100 TB: did the
filter reach the parquet scan, is the projection pruned, did the small
side broadcast, how many exchanges (shuffles) does the plan contain,
and how much of it runs inside WholeStageCodegen.

Used by tests to LOCK IN plan shape — a regression that turns a
broadcast join into a sort-merge join or drops a pushed filter fails
CI, not the cluster.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    """Executed-plan tree: one line per operator, with codegen stars,
    exchange partitionings, and full FileScan details."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass(frozen=True)
class PlanFacts:
    n_exchanges: int          # shuffle boundaries
    n_broadcasts: int         # broadcast exchanges / joins
    pushed_filters: list[str]  # parquet PushedFilters entries
    read_schemas: list[str]   # parquet ReadSchema projections
    codegen_spans: int        # WholeStageCodegen regions
    python_ops: int           # ArrowEvalPython / MapInPandas / FlatMap* ops
    n_scans: int              # FileScan operators (source re-read count)


def plan_facts(df: DataFrame, execute: bool = False) -> PlanFacts:
    """Parse plan properties.  With ``execute=True`` the query runs first
    so AQE's final plan (with WholeStageCodegen stars and runtime join
    choices) is inspected instead of the initial one."""
    if execute:
        # collect() (not count()) so THIS DataFrame's queryExecution runs
        # and AQE finalizes it; count() would execute a different plan
        df.collect()
    # keep only the final plan: adaptive toString appends the initial
    # plan as a second section, which would double-count every operator
    text = simple_plan(df).split("== Initial Plan ==")[0]
    return PlanFacts(
        n_exchanges=len(re.findall(r"Exchange (?:hash|range)partitioning|Exchange SinglePartition", text)),
        n_broadcasts=len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", text)),
        # toString truncates long lines ("...") so don't demand the close bracket
        pushed_filters=[m for m in re.findall(r"PushedFilters: \[([^\]\n]*)", text) if m],
        read_schemas=re.findall(r"ReadSchema: (struct<[^\n]*)", text),
        codegen_spans=len(set(re.findall(r"\*\((\d+)\)", text))),
        python_ops=len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|BatchEvalPython", text)),
        n_scans=len(re.findall(r"FileScan ", text)),
    )


def assert_scan_pruned(df: DataFrame, required: set[str], forbidden: set[str]) -> None:
    """Check the parquet ReadSchema keeps `required` and drops `forbidden`."""
    schemas = " ".join(plan_facts(df).read_schemas)
    for col in required:
        assert col in schemas, f"column {col} missing from ReadSchema: {schemas}"
    for col in forbidden:
        assert col not in schemas, f"column {col} NOT pruned from ReadSchema: {schemas}"
