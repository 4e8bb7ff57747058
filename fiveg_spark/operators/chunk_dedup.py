"""Chunk-grain NEAR-dup detection (SURVEY §2 E136/E137) — the fuzzy
twin of E135's exact duplicate-chunk census.

E135 catches byte-identical chunks; the dominant residual is the
NEAR-identical span — boilerplate paragraphs with a date or name swapped
(Lee et al. 2022 measure span-grain duplication as the bulk of what
whole-doc dedup misses).  This module runs the engine's certified
MinHash-LSH machinery (dedup.py's E2 signature + banding chain, reused
verbatim — the r7 lesson: derived pipelines must not re-state the
tokenize/shingle chain by hand) at the E133 chunk grain:

- chunks come from the SAME stride explode as E133/E135 (one corpus
  scan, `sequence(1, len, stride)` + substring — no Python, no joins);
- chunk identity is ``doc_id * 1_000_000 + start`` (a BIGINT key the
  banding chain's ``a.doc_id < b.doc_id`` ordering and the census's
  doc-part extraction both read; starts are stride offsets < 1e6 for
  any document under a megachar — testdata docs are ~1e3 chars);
- EXACT duplicates collapse FIRST: signatures build over one
  representative chunk per distinct content (min key per content).
  That keeps this module orthogonal to E135 (which censuses the exact
  copies) and kills the posting-list quadratic that mass-duplicated
  boilerplate would otherwise feed into both the LSH buckets and the
  exact-Jaccard ground truth — the distinct-content frame is bounded
  by the corpus's VOCABULARY of spans, not its size.

Scale shape (the E2 discipline, one grain down): scan → chunk explode
(map, ~len/stride rows per doc) → content-dedup groupBy (1 shuffle,
partial-agg compacted) → [materialized reps] → shingle+md5 (map) →
min-agg signatures (1 shuffle) → [materialized sigs] → band unpivot
(map) → bucket groupBy (1 shuffle on tiny signatures) → bucket-local
pair explode → bounded census aggregates.  One corpus scan total; the
ground-truth side re-reads only the materialized reps frame.

Reference: the engine's own E2/E57 rows (dedup.py:123,513); no
reference-repo counterpart — the 5G KPI reference has no text corpus
surface, this is the mandated LLM-data-pipeline extension.
"""

from __future__ import annotations

from fiveg_spark.operators.dedup import (
    N_HASHES,
    _banding_pairs_from,
    _parallelism,
)
from fiveg_spark.operators.llm_curation import CHUNK_S, CHUNK_W
from fiveg_spark.plans.registry import (
    cnt,
    dbl,
    materialized_backed,
    split_ws,
)

# key = doc_id * KEY_BASE + start: start < KEY_BASE holds for any doc
# shorter than a megachar (testdata max ~2e3; a longer corpus would
# raise KEY_BASE — the stride arithmetic makes start ≤ len(text))
KEY_BASE = 1_000_000

CHUNK_RECALL_FLOOR = 0.6  # same floor as E57: below this the pipeline
# is broken, not unlucky (chunk shingle sets are ~30 tokens, so the
# 8-lane sketch is noisier than doc grain)


def _rep_chunks_sql(d: str) -> str:
    """One representative chunk per DISTINCT chunk content:
    (ck BIGINT key, chunk text).  Exact copies collapse here — E135
    owns counting them; this module only ranks distinct contents."""
    if d == "spark":
        starts = (
            f"SELECT /*+ REPARTITION({_parallelism()}, doc_id) */ "
            "doc_id, text, "
            f"explode(sequence(1, CAST(greatest(length(text), 1) AS INT),"
            f" {CHUNK_S})) AS start FROM documents"
        )
    else:
        starts = (
            "SELECT doc_id, text, "
            f"unnest(generate_series(1, greatest(length(text), 1),"
            f" {CHUNK_S})) AS start FROM documents"
        )
    return f"""
    SELECT min(ck) AS ck, chunk FROM (
      SELECT CAST(doc_id AS BIGINT) * {KEY_BASE} + start AS ck,
             substring(text, start, {CHUNK_W}) AS chunk
      FROM ({starts}) s
    ) keyed
    GROUP BY chunk
    """


def _chunk_shingles_from(d: str, rel: str) -> str:
    """3-token shingles of each representative chunk — the
    shingled_scan convention (lower → space-run split → index-lambda
    trigrams) applied to the chunk column of ``rel``."""
    toks = split_ws("lower(chunk)", d)
    if d == "spark":
        sh = (
            "explode(transform(sequence(1, size(t) - 2), "
            "i -> concat(element_at(t, i), ' ', element_at(t, i + 1), ' ', "
            "element_at(t, i + 2))))"
        )
        pred = "size(t) >= 3"
        # the _shingles_body rule (dedup.py:64): the rep frame leaves its
        # dedup agg AQE-coalesced to a couple of partitions (it is only a
        # few MB), but the downstream shingle explode + 2×md5 amplifies
        # CPU ~50× per byte — an explicit spread of the tiny rep rows
        # unlocks full-core hashing (guide §2.5 input-skew rule)
        rel = f"(SELECT /*+ REPARTITION({_parallelism()}, ck) */ * FROM {rel})"
    else:
        sh = (
            "unnest(list_transform(generate_series(1, len(t) - 2), "
            "i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2])))"
        )
        pred = "len(t) >= 3"
    return f"""SELECT ck, shingle FROM (
        SELECT ck, {sh} AS shingle
        FROM (SELECT ck, {toks} AS t FROM {rel}) toks
        WHERE {pred}
      ) exploded"""


def _chunk_sigs_sql(d: str, rel: str = "_mz_ckm_reps") -> str:
    """E2's 8-lane md5-minhash signature build over the representative-
    chunk frame ``rel``: (doc_id = ck, mh0..mh7) — the column names the
    shared banding chain expects."""
    mh_aggs = ",\n        ".join(
        f"min(substring(h{i // 4}, {1 + 8 * (i % 4)}, 8)) AS mh{i}"
        for i in range(N_HASHES)
    )
    return f"""
    WITH csh AS (
      {_chunk_shingles_from(d, rel)}
    ),
    hashed AS (
      SELECT ck AS doc_id,
        md5(concat(shingle, '#0')) AS h0,
        md5(concat(shingle, '#1')) AS h1
      FROM csh
    )
    SELECT doc_id, {mh_aggs}
    FROM hashed
    GROUP BY doc_id
    """


def _chunk_cand_sql(d: str, rel: str = "_mz_ckm_sigs") -> str:
    """The shared banding → bucket → candidate-pair chain over the
    chunk signatures in ``rel`` (a standalone query: dedup.py's
    WITH-continuation gets its WITH here)."""
    return f"WITH {_banding_pairs_from(d, rel)}"


def _chunk_cand_from_reps_sql(d: str) -> str:
    """Banding chain with the signature build riding INSIDE the job
    (r13 fold): the Spark banding chain reads the signature frame
    exactly once (one LATERAL VIEW unpivot), so a separate eager
    signature materialization paid a job + checkpoint for nothing.
    (DuckDB's 4-branch band UNION references `sigs` 4× — it
    materializes CTEs, so oracle-side cost is irrelevant.)"""
    return f"""WITH sigs AS (
      {_chunk_sigs_sql(d, "_mz_ckm_reps")}
    ),
    {_banding_pairs_from(d, "sigs")}"""


def _chunk_minhash_parts(d: str) -> tuple[list[tuple[str, str]], str]:
    # E136 — chunk-grain LSH candidate census: the banding chain from
    # dedup.py runs unchanged over chunk signatures; the tail censuses
    # candidates per band-agreement level (≤ N_BANDS rows) split by
    # same-doc (overlapping stride windows agree trivially — the
    # within-doc overlap E133's stride creates by design) vs cross-doc
    # (the boilerplate spans dedup actually hunts).
    #
    # r13 optimization (guide §2.4): every frame here is consumed
    # exactly ONCE (reps → sigs → cand → census), so the old three
    # localCheckpoint materializations bought nothing — the query is a
    # pure chain and runs as ONE lazy plan (zero eager jobs, the
    # corpus still scanned once).  The recall twin below keeps its
    # materializations (there reps and cand really are read twice).
    doc_a = f"CAST(floor(doc_a / {KEY_BASE}.0) AS BIGINT)"
    doc_b = f"CAST(floor(doc_b / {KEY_BASE}.0) AS BIGINT)"
    tail = f"""
    WITH reps AS (
      {_rep_chunks_sql(d)}
    ),
    sigs AS (
      {_chunk_sigs_sql(d, "reps")}
    ),
    cand AS (
      {_chunk_cand_sql(d, "sigs")}
    )
    SELECT
      n_bands,
      {cnt("count(*)", "n_pairs")},
      {cnt(f"sum(CASE WHEN {doc_a} != {doc_b} THEN 1 ELSE 0 END)",
           "n_cross_doc_pairs")},
      {cnt(f"sum(CASE WHEN {doc_a} = {doc_b} THEN 1 ELSE 0 END)",
           "n_same_doc_pairs")},
      {cnt(f"count(DISTINCT {doc_a})", "n_docs_left")},
      {cnt(f"count(DISTINCT {doc_b})", "n_docs_right")}
    FROM cand
    GROUP BY n_bands
    ORDER BY n_bands
    """
    return [], tail


def _chunk_exact_pairs_sql(d: str) -> str:
    """Exact Jaccard ≥ 0.5 over DISTINCT chunk contents — the E3
    posting-list shape (shingle equijoin bounds the quadratic by
    posting length; the content-dedup upstream bounds postings by
    distinct contents, not copies), reading the SAME materialized
    representative frame as the signature build."""
    return f"""
    WITH csh AS (
      SELECT DISTINCT ck, shingle FROM (
        {_chunk_shingles_from(d, "_mz_ckm_reps")}
      ) raw
    ),
    sizes AS (
      SELECT ck, count(*) AS n_sh FROM csh GROUP BY ck
    ),
    inter AS (
      SELECT a.ck AS doc_a, b.ck AS doc_b, count(*) AS n_common
      FROM csh a JOIN csh b
        ON a.shingle = b.shingle AND a.ck < b.ck
      GROUP BY a.ck, b.ck
    )
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.ck
    JOIN sizes sb ON i.doc_b = sb.ck
    WHERE i.n_common / CAST(sa.n_sh + sb.n_sh - i.n_common AS DOUBLE) >= 0.5
    """


def _chunk_recall_parts(d: str) -> tuple[list[tuple[str, str]], str]:
    # E137 — the certification row: chunk-grain LSH candidate recall
    # against the exact chunk-Jaccard ≥ 0.5 ground truth (E57's shape
    # one grain down).  Every input is a materialized frame referenced
    # once per consumer, so the corpus is scanned exactly once (reps);
    # every column is value-certified (shared two-dialect SQL), plus
    # the recall floor boolean.
    tail = f"""
    WITH e AS (SELECT count(*) AS n FROM _mz_ckm_exact),
    c AS (SELECT count(*) AS n FROM _mz_ckm_cand),
    h AS (
      SELECT count(*) AS n
      FROM _mz_ckm_exact x
      JOIN _mz_ckm_cand m ON x.doc_a = m.doc_a AND x.doc_b = m.doc_b
    )
    SELECT
      {cnt("e.n", "n_exact_pairs")},
      {cnt("c.n", "n_candidate_pairs")},
      {cnt("h.n", "n_hits")},
      {dbl("CASE WHEN e.n = 0 THEN 1.0 ELSE h.n / CAST(e.n AS DOUBLE) END",
           "recall")},
      {dbl("CASE WHEN c.n = 0 THEN 1.0 ELSE h.n / CAST(c.n AS DOUBLE) END",
           "precision")},
      CASE WHEN e.n = 0 THEN TRUE
           ELSE h.n / CAST(e.n AS DOUBLE) >= {CHUNK_RECALL_FLOOR}
      END AS recall_ok
    FROM e CROSS JOIN c CROSS JOIN h
    """
    return [
        ("_mz_ckm_reps", _rep_chunks_sql(d)),
        ("_mz_ckm_cand", _chunk_cand_from_reps_sql(d)),
        ("_mz_ckm_exact", _chunk_exact_pairs_sql(d)),
    ], tail


QUERIES = [
    materialized_backed(
        "chunk_minhash_pairs", _chunk_minhash_parts, ("documents",)
    ),
    materialized_backed(
        "chunk_minhash_recall", _chunk_recall_parts, ("documents",)
    ),
]
