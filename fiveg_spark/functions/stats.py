"""Cross-engine statistical aggregate expressions.

Spark's builtin ``skewness``/``kurtosis`` are population-based while
DuckDB's are sample-based (bias-corrected), so for oracle parity we compute
both from raw power sums with ONE shared SQL text that parses identically
in Spark SQL and DuckDB.  (Reference KPI semantics:
KafkaKpiPipeline.scala:118-119,133-134 uses Spark's population versions —
we reproduce exactly that formula.)

All formulas are plain ``sum``/``count``/``power`` arithmetic, so in Spark
they stay inside WholeStageCodegen with map-side partial aggregation — one
shuffle, no Python.
"""

from __future__ import annotations


def moment_exprs(col: str) -> dict[str, str]:
    """Central-moment building blocks for ``col`` as SQL snippets."""
    n = f"count({col})"
    s1 = f"sum({col})"
    s2 = f"sum(power({col}, 2))"
    s3 = f"sum(power({col}, 3))"
    s4 = f"sum(power({col}, 4))"
    mean = f"({s1} / {n})"
    m2 = f"({s2} / {n} - power({mean}, 2))"
    m3 = f"({s3} / {n} - 3 * {mean} * {s2} / {n} + 2 * power({mean}, 3))"
    m4 = (
        f"({s4} / {n} - 4 * {mean} * {s3} / {n}"
        f" + 6 * power({mean}, 2) * {s2} / {n} - 3 * power({mean}, 4))"
    )
    return {"n": n, "mean": mean, "m2": m2, "m3": m3, "m4": m4}


def pop_skewness_sql(col: str) -> str:
    """Population skewness m3 / m2^1.5 (Spark-builtin semantics), 0 when
    variance is ~0 (constant group) — matches the reference's na.fill(0)."""
    m = moment_exprs(col)
    return (
        f"(CASE WHEN {m['m2']} <= 1e-12 THEN 0.0 "
        f"ELSE {m['m3']} / power({m['m2']}, 1.5) END)"
    )


def pop_kurtosis_sql(col: str) -> str:
    """Population excess kurtosis m4 / m2^2 - 3 (Spark-builtin semantics)."""
    m = moment_exprs(col)
    return (
        f"(CASE WHEN {m['m2']} <= 1e-12 THEN 0.0 "
        f"ELSE {m['m4']} / power({m['m2']}, 2) - 3.0 END)"
    )
