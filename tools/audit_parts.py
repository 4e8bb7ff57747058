"""Audit materialized_backed queries: EXPANSION-WEIGHTED reference count
per _mz_ CTE.

Spark inlines every non-materialized CTE per reference, so a frame's
subtree runs once per *expanded* reference.  A materialized CTE whose
expanded reference count is exactly 1 pays an eager localCheckpoint job
for nothing — folding it into its consumer removes a job barrier AND
re-enables Catalyst column pruning across the boundary.  Conversely a
count >= 2 justifies the materialization.

The parser handles the top-level WITH chain of each SQL text (the house
style); nested WITHs inside derived tables are treated as opaque text
(their references still count, unexpanded — an undercount, so FOLD
flags stay trustworthy only after reading the SQL).

Usage: python tools/audit_parts.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402


def parts_fn_of(q):
    """Extract the parts_fn captured by materialized_backed's run closure."""
    run = q
    seen = set()
    while callable(run) and id(run) not in seen:
        seen.add(id(run))
        cl = getattr(run, "__closure__", None)
        if not cl:
            return None
        cells = [c.cell_contents for c in cl if callable(c.cell_contents)]
        for c in cells:
            name = getattr(c, "__name__", "")
            if name.endswith("_parts") or "parts" in name:
                return c
        run = cells[0] if cells else None
    return None


def split_with_chain(sql: str) -> tuple[list[tuple[str, str]], str]:
    """Parse a top-level `WITH a AS (...), b AS (...) SELECT ...` chain.
    Returns ([(name, body)...], final_select).  If the text doesn't open
    with WITH, returns ([], sql)."""
    s = sql.lstrip()
    if not re.match(r"(?is)^WITH\b", s):
        return [], sql
    i = len("WITH")
    ctes: list[tuple[str, str]] = []
    n = len(s)
    while True:
        m = re.compile(r"\s*([A-Za-z_][A-Za-z_0-9]*)\s+AS\s*\(", re.I).match(s, i)
        if not m:
            break
        name = m.group(1)
        j = m.end()  # position right after the opening paren
        depth = 1
        k = j
        while k < n and depth:
            if s[k] == "(":
                depth += 1
            elif s[k] == ")":
                depth -= 1
            k += 1
        ctes.append((name, s[j:k - 1]))
        i = k
        m2 = re.compile(r"\s*,").match(s, i)
        if m2:
            i = m2.end()
            continue
        break
    return ctes, s[i:]


def expanded_refs(sql: str, targets: set[str]) -> dict[str, float]:
    """Count how many times each target relation's subtree would run if
    it were inlined into ``sql``, accounting for sql's own top-level CTE
    chain being re-inlined per reference."""
    ctes, final = split_with_chain(sql)
    # expansion factor of each internal CTE, computed back-to-front:
    # factor = refs in final + sum(refs in later cte * that cte's factor)
    factors: dict[str, float] = {}
    for idx in range(len(ctes) - 1, -1, -1):
        name, _body = ctes[idx]
        pat = re.compile(rf"\b{re.escape(name)}\b")
        f = len(pat.findall(final))
        for later_name, later_body in ctes[idx + 1:]:
            f += len(pat.findall(later_body)) * factors.get(later_name, 1)
        factors[name] = f
    out: dict[str, float] = {t: 0.0 for t in targets}
    for t in targets:
        pat = re.compile(rf"\b{re.escape(t)}\b")
        c = len(pat.findall(final))
        for name, body in ctes:
            c += len(pat.findall(body)) * factors.get(name, 1)
        out[t] = c
    return out


def main() -> None:
    qs = contract.queries()
    for name in sorted(qs):
        fn = parts_fn_of(qs[name])
        if fn is None:
            continue
        try:
            ctes, tail = fn("spark")
        except Exception as e:  # pragma: no cover
            print(f"# {name}: parts call failed: {e}", file=sys.stderr)
            continue
        if not ctes:
            continue
        rels = [rel for rel, _ in ctes]
        totals: dict[str, float] = {rel: 0.0 for rel in rels}
        # later materialized CTEs run exactly once -> weight 1 each;
        # the tail runs once
        for i, (rel, _sql) in enumerate(ctes):
            for _later_rel, later_sql in ctes[i + 1:]:
                totals[rel] += expanded_refs(later_sql, {rel})[rel]
            totals[rel] += expanded_refs(tail, {rel})[rel]
        flat = {rel: int(c) for rel, c in totals.items()}
        singles = [rel for rel, c in flat.items() if c <= 1]
        mark = "  <== FOLD " + ",".join(singles) if singles else ""
        print(f"{name}: {flat}{mark}")


if __name__ == "__main__":
    main()
