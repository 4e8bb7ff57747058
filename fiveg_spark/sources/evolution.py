"""Schema-evolution-tolerant parquet ingestion (SURVEY §2 A19).

A 100 TB table is never written by one schema version: producers add
columns, widen int→long, and occasionally break a column's type
outright.  Spark's ``mergeSchema`` handles the ADDITIVE cases but
THROWS on a true conflict ("Failed to merge fields") — taking the
whole read down because one bad producer shipped one bad file.  This
module makes ingestion total:

1. per-file schemas come from PARQUET FOOTERS ONLY (pyarrow metadata
   reads — bytes per file, no data IO; a production deployment lifts
   the same loop into ``binaryFile`` + ``mapInPandas`` when the file
   count itself is huge);
2. each file is classified against the TARGET schema: conformable
   (every shared column's type is equal or safely widenable —
   int8/16/32→long, float→double — missing columns become typed
   NULLs, unknown columns are dropped) or QUARANTINED (any shared
   column with an incompatible type);
3. conformable files read GROUPED BY their footer schema — Spark's
   ``mergeSchema`` is stricter than the widening table (it refuses
   even FLOAT vs DOUBLE), so each schema version reads with its own
   exact schema (full vectorization, no merge pass), ``conform``s to
   the target, and the groups union; quarantined paths are returned
   for the dead-letter flow (the A6 quarantine doctrine: never
   silently drop, never let one file poison the batch).  The group
   count is the number of producer schema VERSIONS — a handful — not
   the file count.

``conform`` is also exported alone — the cheap path when the files
are known-good and only column drift needs normalizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# safe widenings: reading a column written as `from` into a target
# column of type `to` loses nothing
_WIDENS: dict[str, set[str]] = {
    "bigint": {"tinyint", "smallint", "int"},
    "int": {"tinyint", "smallint"},
    "smallint": {"tinyint"},
    "double": {"float", "tinyint", "smallint", "int"},
    "float": {"tinyint", "smallint"},
    "decimal": set(),
}


def _compatible(file_type: str, target_type: str) -> bool:
    if file_type == target_type:
        return True
    return file_type in _WIDENS.get(target_type, set())


def _arrow_to_spark_simple(arrow_type) -> str:
    """Map the arrow types this loader classifies on to Spark simple
    names; anything exotic returns its arrow string (never compatible
    unless equal, which is the safe default)."""
    import pyarrow as pa

    mapping = [
        (pa.types.is_int8, "tinyint"),
        (pa.types.is_int16, "smallint"),
        (pa.types.is_int32, "int"),
        (pa.types.is_int64, "bigint"),
        (pa.types.is_float32, "float"),
        (pa.types.is_float64, "double"),
        (pa.types.is_string, "string"),
        (pa.types.is_large_string, "string"),
        (pa.types.is_boolean, "boolean"),
        (pa.types.is_timestamp, "timestamp"),
        (pa.types.is_date, "date"),
        (pa.types.is_binary, "binary"),
    ]
    for pred, name in mapping:
        if pred(arrow_type):
            return name
    return str(arrow_type)


def classify_files(
    path: str, target: T.StructType
) -> tuple[dict[tuple, list[str]], list[str]]:
    """Bucket the directory's parquet files by footer schema, splitting
    off the quarantine set — metadata reads only.  Returns
    ({schema_key: [files]}, [quarantined files]); each key's files
    share an identical schema and read together without merging."""
    import os

    import pyarrow.parquet as pq

    target_types = {f.name: f.dataType.simpleString() for f in target.fields}
    groups: dict[tuple, list[str]] = {}
    bad: list[str] = []
    for root, _dirs, files in os.walk(path):
        for name in sorted(files):
            if not name.endswith(".parquet"):
                continue
            fpath = os.path.join(root, name)
            schema = pq.read_schema(fpath)
            key = []
            good = True
            for field in schema:
                have = _arrow_to_spark_simple(field.type)
                key.append((field.name, have))
                want = target_types.get(field.name)
                if want is None:
                    continue  # unknown column: dropped at conform time
                if not _compatible(have, want):
                    good = False
            if good:
                groups.setdefault(tuple(sorted(key)), []).append(fpath)
            else:
                bad.append(fpath)
    return groups, bad


def conform(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project onto the target schema: missing columns become typed
    NULLs, unknown columns drop, widenable types cast exactly."""
    cols = []
    have = {f.name: f.dataType for f in df.schema.fields}
    for field in target.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def read_evolved(
    spark: SparkSession, path: str, target: T.StructType
) -> tuple[DataFrame, list[str]]:
    """Read every conformable file in ``path`` as one frame with the
    exact target schema; return the quarantined file list alongside.
    An all-quarantined (or empty) directory yields an empty frame with
    the right schema — ingestion stays total."""
    groups, bad = classify_files(path, target)
    if not groups:
        return spark.createDataFrame([], target), bad
    out = None
    for key in sorted(groups):
        part = conform(spark.read.parquet(*groups[key]), target)
        out = part if out is None else out.unionByName(part)
    return out, bad
