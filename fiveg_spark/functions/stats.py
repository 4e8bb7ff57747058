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


def normal_cdf_sql(x: str) -> str:
    """Standard normal CDF Φ(x) without ``erf`` — Abramowitz & Stegun
    26.2.17 (|error| < 7.5e-8), as ONE SQL text valid in both Spark SQL
    and DuckDB (only ``exp``/``power``/``abs``/``CASE``), so p-value
    columns get oracle parity by construction like every other formula
    here.  The polynomial evaluates Φ(|x|) and the CASE mirrors the
    negative half; 7.5e-8 absolute error is three orders below the
    1e-4 rounding grid every certified float rides on."""
    # every constant in E-notation: Spark parses a bare decimal literal
    # as DECIMAL and folds the polynomial in decimal arithmetic (the
    # DECIMAL-fold lesson), blowing the 7.5e-8 bound; `1.0e0` parses as
    # DOUBLE in both engines
    ax = f"abs({x})"
    t = f"(1.0e0 / (1.0e0 + 0.2316419e0 * {ax}))"
    phi = f"(exp(-({ax} * {ax}) / 2.0e0) / 2.5066282746310002e0)"
    poly = (
        f"({t} * (0.319381530e0 + {t} * (-0.356563782e0 + {t} * (1.781477937e0"
        f" + {t} * (-1.821255978e0 + {t} * 1.330274429e0)))))"
    )
    upper = f"(1.0e0 - {phi} * {poly})"
    return f"(CASE WHEN {x} >= 0.0e0 THEN {upper} ELSE 1.0e0 - {upper} END)"


def two_sided_p_sql(z: str) -> str:
    """Two-sided normal p-value 2·(1 − Φ(|z|)) from the same shared
    text (clamped to [0, 1] against approximation underflow)."""
    p = f"(2.0e0 * (1.0e0 - {normal_cdf_sql(f'abs({z})')}))"
    return f"least(1.0e0, greatest(0.0e0, {p}))"


def chi2_sf_sql(x: str, dof: int) -> str:
    """Exact chi-square survival function P(X > x) for EVEN dof — the
    closed form exp(-x/2)·Σ_{k=0}^{dof/2-1} (x/2)^k / k! (the Erlang
    tail; no erf, no incomplete gamma), as one SQL text valid in both
    engines.  Clamped to [0, 1]; x < 0 reads as survival 1 (a guarded
    statistic reporting 0 stays a non-discovery).  Odd dof has no
    polynomial-exponential closed form — callers wanting dof 23 should
    use a different statistic or the normal approximation explicitly.
    """
    if dof <= 0 or dof % 2:
        raise ValueError(f"chi2_sf_sql needs positive EVEN dof, got {dof}")
    m = dof // 2
    half = f"(greatest({x}, 0.0e0) / 2.0e0)"
    import math

    terms = " + ".join(
        f"power({half}, {k}) / {float(math.factorial(k))!r}"
        for k in range(m)
    )
    return (
        f"least(1.0e0, greatest(0.0e0, exp(-{half}) * ({terms})))"
    )


def chi2_sf_wh_sql(x: str, dof: str) -> str:
    """Wilson-Hilferty chi-square survival approximation (Wilson &
    Hilferty 1931): (X/k)^(1/3) is approximately normal with mean
    1 − 2/(9k) and variance 2/(9k), so P(X > x) ≈ 1 − Φ(z).  Unlocks
    the dof cases ``chi2_sf_sql`` refuses — ODD dof (no Erlang closed
    form) and RUNTIME dof (``dof`` here is a SQL expression, not a
    compile-time constant).  Accuracy ~1e-3 relative for k ≥ 3 —
    coarser than the exact even-dof path, but the p-value's only
    certified consumer compares ROUNDED p to ROUNDED critical with the
    SAME SQL text on both engines, so parity is by construction and
    the approximation error shifts a decision threshold, never an
    engine agreement.  Guards: x ≤ 0 or k < 1 read as survival 1 (a
    degenerate statistic stays a non-discovery)."""
    k = f"(CAST({dof} AS DOUBLE))"
    v = f"(2.0e0 / (9.0e0 * {k}))"
    z = (
        f"((power(greatest({x}, 0.0e0) / {k}, 0.3333333333333333e0)"
        f" - (1.0e0 - {v})) / sqrt({v}))"
    )
    sf = f"(1.0e0 - {normal_cdf_sql(z)})"
    return (
        f"(CASE WHEN {k} < 1.0e0 OR {x} <= 0.0e0 THEN 1.0e0 "
        f"ELSE least(1.0e0, greatest(0.0e0, {sf})) END)"
    )
