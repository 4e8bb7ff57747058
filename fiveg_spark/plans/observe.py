"""Zero-extra-pass pipeline observability (SURVEY §2 A11).

A 100 TB write cannot afford a second scan just to know what it wrote.
`Dataset.observe` attaches aggregate metrics to the EXISTING action —
they ride the same pass, cost a few accumulators, and surface:

- batch: via `pyspark.sql.Observation` right after the action;
- streaming: per micro-batch in `StreamingQuery.lastProgress
  ["observedMetrics"]` — the feed for a circuit breaker that halts a
  backfill when null rates or volume drift outside tolerance.

This is the production half of the data-quality story: `dq_checks`
(C20) audits at rest, these audit IN FLIGHT.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def audit_metrics(value_col: str = "value") -> list[Column]:
    """The standard write-audit set: volume, null rate, value spread."""
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(value_col).isNull(), 1).otherwise(0)).alias("n_null"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
        F.sum(value_col).alias("v_sum"),
    ]


def observed(df: DataFrame, name: str = "audit", value_col: str = "value"):
    """Attach audit metrics; returns (df, observation).

    Batch: run any action on the returned df, then read
    `observation.get`.  Streaming: `Observation` objects are batch-only,
    so the metrics attach by NAME and surface per micro-batch in
    `query.lastProgress["observedMetrics"][name]` (observation returns
    None)."""
    if df.isStreaming:
        return df.observe(name, *audit_metrics(value_col)), None
    obs = Observation(name)
    return df.observe(obs, *audit_metrics(value_col)), obs


@dataclass(frozen=True)
class StreamProgress:
    """One micro-batch progress snapshot — the fields the reference's
    monitor loop prints (KafkaKpiPipeline.scala:315-333: batch id, input
    rows, rate, duration, state rows/memory), lifted from
    ``StreamingQuery.lastProgress`` into a typed record."""

    batch_id: int
    num_input_rows: int
    input_rows_per_second: float
    batch_duration_ms: int
    # summed across ALL stateful operators (a query can carry several —
    # e.g. stream-stream join + windowed agg — and unbounded growth in
    # ANY of them is what an ops loop must see); None when stateless
    state_rows: int | None
    state_memory_bytes: int | None


def progress_report(query) -> StreamProgress | None:
    """Typed snapshot of a streaming query's last progress (None before
    the first micro-batch completes).  Poll this from an ops loop the
    way the reference monitors its Kafka pipeline — no extra query
    work, the numbers are already collected by the engine."""
    p = query.lastProgress
    if p is None:
        return None
    state = p.get("stateOperators") or []
    return StreamProgress(
        batch_id=p.get("batchId", -1),
        num_input_rows=p.get("numInputRows", 0),
        input_rows_per_second=float(p.get("inputRowsPerSecond") or 0.0),
        batch_duration_ms=int(p.get("batchDuration") or 0),
        state_rows=sum(s.get("numRowsTotal", 0) for s in state) if state else None,
        state_memory_bytes=(
            sum(s.get("memoryUsedBytes", 0) for s in state) if state else None
        ),
    )


@dataclass(frozen=True)
class AuditVerdict:
    ok: bool
    reasons: list[str]


def check_audit(
    metrics: dict,
    min_rows: int = 1,
    max_null_frac: float = 0.01,
    value_range: tuple[float, float] | None = None,
) -> AuditVerdict:
    """Circuit-breaker judgment over one audit-metric dict (batch get or
    one streaming observedMetrics row)."""
    reasons = []
    n = metrics["n_rows"]
    if n < min_rows:
        reasons.append(f"row count {n} < {min_rows}")
    if n > 0 and metrics["n_null"] / n > max_null_frac:
        reasons.append(f"null fraction {metrics['n_null'] / n:.4f} > {max_null_frac}")
    if value_range is not None and n > 0:
        lo, hi = value_range
        v_min, v_max = metrics["v_min"], metrics["v_max"]
        if v_min is None or v_max is None:
            # min/max of an all-NULL value column — the degenerate batch a
            # breaker exists to catch; fail it, never TypeError.
            reasons.append("value column entirely NULL; range check failed")
        elif v_min < lo or v_max > hi:
            reasons.append(f"values [{v_min}, {v_max}] outside [{lo}, {hi}]")
    return AuditVerdict(ok=not reasons, reasons=reasons)
