"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``fiveg_spark/``; every query here is declared
in SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fiveg_spark.ml import certify as _ml_cert
from fiveg_spark.operators import tdigest as _tdigest
from fiveg_spark.ml import mllib_models as _mllib
from fiveg_spark.ml import queries as _ml
from fiveg_spark.operators import ann_lsh as _ann
from fiveg_spark.operators import asof as _asof
from fiveg_spark.operators import dedup as _dedup
from fiveg_spark.operators import simhash as _simhash
from fiveg_spark.operators import flows as _flows
from fiveg_spark.operators import graph as _graph
from fiveg_spark.operators import kpi as _kpi
from fiveg_spark.operators import quality as _quality
from fiveg_spark.operators import relational_ext as _rel_ext
from fiveg_spark.operators import similarity as _similarity
from fiveg_spark.operators import text as _text
from fiveg_spark.operators import timeseries as _timeseries
from fiveg_spark.operators import tpch as _tpch
from fiveg_spark.operators import tpch_deep as _tpch_deep
from fiveg_spark.operators import analytics_ext as _analytics_ext
from fiveg_spark.operators import curation as _curation
from fiveg_spark.operators import sketches as _sketches
from fiveg_spark.operators import ann_ivf as _ann_ivf
from fiveg_spark.operators import ann_pq as _ann_pq
from fiveg_spark.operators import ann_recall as _ann_recall
from fiveg_spark.operators import ann_retrieval as _ann_retrieval
from fiveg_spark.operators import ts_diagnostics as _ts_diag
from fiveg_spark.operators import ts_advanced as _ts_adv
from fiveg_spark.operators import llm_curation as _llm_cur
from fiveg_spark.operators import text_stats as _text_stats
from fiveg_spark.operators import stats_assoc as _stats_assoc
from fiveg_spark.operators import behavior as _behavior
from fiveg_spark.operators import rollup_stats as _rollup_stats
from fiveg_spark.operators import semdedup as _semdedup
from fiveg_spark.operators import lateness as _lateness
from fiveg_spark.operators import stream_parity as _stream_parity
from fiveg_spark.operators import artifacts as _artifacts
from fiveg_spark.operators import supply_fulfillment as _supply
from fiveg_spark.operators import engagement_ext as _engage
from fiveg_spark.operators import stats_tests as _stats_tests
from fiveg_spark.operators import embedding_geometry as _emb_geo
from fiveg_spark.operators import pcap_parity as _pcap_parity
from fiveg_spark.operators import media_parity as _media_parity
from fiveg_spark.operators import engine_native as _engine_native
from fiveg_spark.operators import chunk_dedup as _chunk_dedup

_MODULES = (_flows, _timeseries, _ts_diag, _ts_adv, _llm_cur, _tpch, _tpch_deep, _analytics_ext, _curation, _sketches, _tdigest, _rel_ext, _asof, _quality, _dedup, _text, _text_stats, _stats_assoc, _behavior, _rollup_stats, _semdedup, _similarity, _ml, _ml_cert, _mllib, _simhash, _ann, _ann_ivf, _ann_pq, _ann_recall, _ann_retrieval, _graph, _lateness, _stream_parity, _artifacts, _supply, _engage, _stats_tests, _emb_geo, _pcap_parity, _media_parity, _engine_native, _chunk_dedup)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 36 KPIs per (slice, hour) on sf0.001 (SURVEY §2 B2)."""
    return _kpi.kpi36(spark, "/root/testdata/sf0.001")


# Queries the driver has already hash-certified green, merged from the
# CORRECTNESS_r*.json files by tools/update_certified.py — run it at the
# start of each round (the r4 postmortem: a hand-maintained set went
# stale and the window would have re-stamped the same 50 queries).  The
# driver samples the FIRST 50 entries of queries() in insertion order,
# so never-certified oracle-backed queries are promoted to the front
# and certified/rows-only ones sink to the back.
def _load_certified() -> frozenset[str]:
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.abspath(__file__))
    json_names: set[str] = set()
    path = os.path.join(root, "driver_certified.json")
    try:
        with open(path) as f:
            json_names.update(json.load(f))
    except (FileNotFoundError, ValueError):
        pass
    # Self-healing live scan (r11 verdict "What's wrong" #1): across the
    # round boundary a fresh CORRECTNESS_r*.json lands before anyone reruns
    # tools/update_certified.py, so the JSON alone goes stale and the
    # window would re-stamp already-green queries.  Scanning the (small)
    # CORRECTNESS files live makes staleness harmless; the JSON stays as
    # the committed record.  Latest-round-wins (r12 advice): a query's
    # status comes from the HIGHEST round that mentions it, so a green-in-r5
    # but regressed-in-r12 query re-enters the window for re-verification
    # instead of hiding behind its old stamp.
    def round_of(p: str) -> int:
        m = re.search(r"_r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    latest: dict[str, bool] = {}
    for cpath in sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")), key=round_of
    ):
        try:
            with open(cpath) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            for name, res in data.items():
                if isinstance(res, dict) and "hash_match" in res:
                    latest[name] = bool(res.get("hash_match"))
    names = {name for name, ok in latest.items() if ok}
    # JSON-only names (never mentioned in a live CORRECTNESS file — e.g.
    # record files trimmed) keep their committed status.
    names |= json_names - set(latest)
    return frozenset(names)


_DRIVER_CERTIFIED = _load_certified()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so the
    driver's 50-query certification window hits never-certified queries."""
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "kpi36": _kpi.kpi36,
    }
    deferred: set[str] = set()
    for mod in _MODULES:
        for query in mod.QUERIES:
            q[query.name] = query.run
            if getattr(query, "deferred", False):
                deferred.add(query.name)
    oracles = oracle_sql()

    def slot(item: tuple[str, Callable]) -> tuple[int, bool]:
        name = item[0]
        if name == "kpi36" and name not in _DRIVER_CERTIFIED:
            return (0, False)  # flagship leads until its first certification
        if name not in oracles:
            return (3, False)  # rows-only: can never hash-match, out of the window
        tier = 2 if name in _DRIVER_CERTIFIED else 1
        # mid-round registrations sort behind the frozen never-certified
        # window so they can't displace a name from its 50 slots
        return (tier, name in deferred)

    return dict(sorted(q.items(), key=lambda item: (*slot(item), item[0])))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column names/aliases)."""
    o: dict[str, str] = {
        "kpi36": _kpi.kpi36_oracle_sql(),
    }
    for mod in _MODULES:
        for query in mod.QUERIES:
            if query.oracle is not None:
                o[query.name] = query.oracle
    return o
