"""SimHash 64-bit document fingerprinting (SURVEY §2 E4).

Charikar SimHash over whitespace tokens: each token hashes to 64 bits
(md5 hex prefix — deterministic, engine-independent); the fingerprint's
bit b is 1 iff the sum over tokens of (bit_b ? +1 : -1) is positive.
Near-duplicate candidates are fingerprints within a small Hamming
distance.

Spark-first layout — everything JVM-side, no UDF:
  tokens (explode, map-only)
    → per-token 16 hex nibbles via substring/conv     [map-only]
    → groupBy doc: 64 signed bit-sums as aggregates   [ONE shuffle on doc_id]
    → fingerprint reassembled as a 16-nibble hex string
Band-blocked Hamming pairs then group by fingerprint quarters (a
64-bit fingerprint within Hamming distance ≤3 of another must share at
least one of 4 16-bit bands — pigeonhole), so the pair join never
scans O(n²).

Fully oracle-checked: a DuckDB twin (strpos nibble decode, & bit tests,
xor + bit_count Hamming) rebuilds fingerprints and pairs independently;
pytest additionally checks the Spark fingerprints bit-for-bit against a
pure-Python reference implementation.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fiveg_spark.plans.registry import Query
from fiveg_spark.sources.tables import load_table

N_NIBBLES = 16  # 64 bits as 16 hex nibbles
HAMMING_MAX = 3


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, simhash: 16-char lowercase hex)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("split(lower(text), ' +')")).alias("tok"),
    ).filter(F.col("tok") != "")
    hashed = toks.select("doc_id", F.md5("tok").alias("h"))

    # nibble value (0-15) per position, from the md5 hex prefix
    nib = [F.conv(F.substring("h", i + 1, 1), 16, 10).cast("int") for i in range(N_NIBBLES)]
    # signed bit-sums: for each nibble position, 4 bit counters
    aggs = []
    for i in range(N_NIBBLES):
        for b in (8, 4, 2, 1):
            aggs.append(
                F.sum(
                    F.when((nib[i].bitwiseAND(F.lit(b))) > 0, 1).otherwise(-1)
                ).alias(f"s{i}_{b}")
            )
    sums = hashed.groupBy("doc_id").agg(*aggs)

    # reassemble: nibble_i = Σ_b (sum_{i,b} > 0 ? b : 0), hex-encoded
    nibble_exprs = []
    for i in range(N_NIBBLES):
        v = None
        for b in (8, 4, 2, 1):
            term = F.when(F.col(f"s{i}_{b}") > 0, b).otherwise(0)
            v = term if v is None else v + term
        nibble_exprs.append(F.lower(F.conv(v.cast("string"), 10, 16)))
    return sums.select("doc_id", F.concat(*nibble_exprs).alias("simhash"))


def simhash_py(text: str) -> str:
    """Pure-Python reference (same tokenization + hash), for tests."""
    sums = [0] * 64
    for tok in text.lower().split():
        bits = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
        for i in range(64):
            sums[i] += 1 if (bits >> (63 - i)) & 1 else -1
    out = 0
    for i in range(64):
        out = (out << 1) | (1 if sums[i] > 0 else 0)
    return format(out, "016x")


def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs within Hamming distance ≤ HAMMING_MAX,
    blocked on 16-bit fingerprint bands (pigeonhole guarantee)."""
    fp = simhash_fingerprints(spark, sf_dir)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"), F.substring("simhash", 4 * i + 1, 4).alias("key"))
                for i in range(4)
            ])
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band", "b.key")
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    # exact Hamming distance over the 16 nibbles (bit_count of XOR)
    ham = None
    for i in range(N_NIBBLES):
        d = F.bit_count(
            F.conv(F.substring("sim_a", i + 1, 1), 16, 10)
            .cast("int")
            .bitwiseXOR(F.conv(F.substring("sim_b", i + 1, 1), 16, 10).cast("int"))
        )
        ham = d if ham is None else ham + d
    return (
        pairs.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


# ---- DuckDB oracles ----
# The bit arithmetic IS portable after all: hex nibble → int via strpos
# into a hex alphabet, & for bit tests, xor()+bit_count() for Hamming.
# The oracle rebuilds the exact fingerprint independently, so both
# simhash queries get full value-hash parity instead of rows-only.

_HEX = "0123456789abcdef"


def _duck_nib(col: str, i: int) -> str:
    return f"(strpos('{_HEX}', substring({col}, {i + 1}, 1)) - 1)"


def _duck_fp_cte() -> str:
    aggs = []
    for i in range(N_NIBBLES):
        for b in (8, 4, 2, 1):
            aggs.append(
                f"sum(CASE WHEN ({_duck_nib('h', i)} & {b}) > 0 THEN 1 ELSE -1 END) AS s{i}_{b}"
            )
    nibs = []
    for i in range(N_NIBBLES):
        v = " + ".join(
            f"(CASE WHEN s{i}_{b} > 0 THEN {b} ELSE 0 END)" for b in (8, 4, 2, 1)
        )
        nibs.append(f"substring('{_HEX}', 1 + ({v}), 1)")
    return f"""WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), ' +')) AS tok
      FROM documents
    ),
    hashed AS (SELECT doc_id, md5(tok) AS h FROM toks WHERE tok <> ''),
    sums AS (SELECT doc_id, {", ".join(aggs)} FROM hashed GROUP BY doc_id),
    fp AS (SELECT doc_id, concat({", ".join(nibs)}) AS simhash FROM sums)"""


_FP_ORACLE = f"{_duck_fp_cte()}\nSELECT doc_id, simhash FROM fp"

_HAM = " + ".join(
    f"bit_count(xor({_duck_nib('sim_a', i)}, {_duck_nib('sim_b', i)}))"
    for i in range(N_NIBBLES)
)

_PAIRS_ORACLE = f"""{_duck_fp_cte()},
bands AS (
  SELECT doc_id, simhash, band, substring(simhash, 4 * band + 1, 4) AS key
  FROM fp, (VALUES (0), (1), (2), (3)) b(band)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST({_HAM} AS INT) AS hamming
FROM pairs
WHERE {_HAM} <= {HAMMING_MAX}"""


QUERIES = [
    Query("simhash_fingerprints", simhash_fingerprints, _FP_ORACLE),
    Query("simhash_near_pairs", simhash_near_pairs, _PAIRS_ORACLE),
]
