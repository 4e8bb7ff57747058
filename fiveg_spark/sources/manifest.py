"""Write-audit manifest artifact (SURVEY §2 A21): every production
write ships a sidecar the NEXT job can verify before trusting the data
— the poor-man's transaction log that plain-parquet pipelines need and
Delta/Iceberg users get from the format.

``write_with_manifest`` computes, IN THE SAME JOB as the write (one
extra pass over the just-written files' footers, zero data IO):

- row count (footer metadata, cross-checkable against the write),
- schema fingerprint (md5 of the sorted name:type list — the A19
  conform target in hash form),
- per-file listing with sizes and footer row counts,
- optional per-column integer/floating min/max pulled from parquet
  row-group STATISTICS (again footers only) — the cheap freshness /
  range sanity bound a consumer asserts before a scan.

``verify_manifest`` re-derives all of it from the directory and
reports the first discrepancy — a missing file, a foreign file, a
size/row drift, a schema change.  The check costs footer reads, so a
scheduler can run it on every hop of a 100 TB pipeline.  Atomicity:
the manifest writes to a temp name and ``os.replace``s into place
(the A18 recipe), so readers never observe a half-written manifest.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_manifest.json"


def _file_entries(path: str) -> list[dict]:
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for name in sorted(files):
            if not name.endswith(".parquet"):
                continue
            fpath = os.path.join(root, name)
            meta = pq.read_metadata(fpath)
            out.append(
                {
                    "file": os.path.relpath(fpath, path),
                    "bytes": os.path.getsize(fpath),
                    "rows": meta.num_rows,
                }
            )
    return sorted(out, key=lambda e: e["file"])


def _schema_fingerprint(path: str) -> str:
    """md5 over the SORTED SET of per-file schema signatures — every
    file contributes (a first-file-only fingerprint would miss drift
    confined to later files, and os.walk's directory order is not
    deterministic across filesystems)."""
    import pyarrow.parquet as pq

    sigs = set()
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.endswith(".parquet"):
                schema = pq.read_schema(os.path.join(root, name))
                sigs.add(
                    ",".join(
                        f"{f.name}:{f.type}"
                        for f in sorted(schema, key=lambda f: f.name)
                    )
                )
    h = hashlib.md5()
    for sig in sorted(sigs):
        h.update(sig.encode())
        h.update(b";")
    return h.hexdigest()


def _column_ranges(path: str) -> dict:
    """Min/max per primitive column from row-group statistics."""
    import pyarrow.parquet as pq

    ranges: dict = {}
    for root, _dirs, files in os.walk(path):
        for name in sorted(files):
            if not name.endswith(".parquet"):
                continue
            meta = pq.read_metadata(os.path.join(root, name))
            for rg in range(meta.num_row_groups):
                group = meta.row_group(rg)
                for ci in range(group.num_columns):
                    col = group.column(ci)
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        continue
                    lo, hi = st.min, st.max
                    if not isinstance(lo, (int, float)) or isinstance(lo, bool):
                        continue
                    cur = ranges.get(col.path_in_schema)
                    if cur is None:
                        ranges[col.path_in_schema] = [lo, hi]
                    else:
                        cur[0] = min(cur[0], lo)
                        cur[1] = max(cur[1], hi)
    return ranges


def build_manifest(path: str) -> dict:
    entries = _file_entries(path)
    return {
        "n_files": len(entries),
        "n_rows": sum(e["rows"] for e in entries),
        "n_bytes": sum(e["bytes"] for e in entries),
        "schema_md5": _schema_fingerprint(path),
        "column_ranges": _column_ranges(path),
        "files": entries,
    }


def stamp_manifest(path: str) -> dict:
    """(Re-)derive and atomically install the manifest for an existing
    directory — the stamp step shared by write_with_manifest and the
    A22 compaction re-stamp."""
    manifest = build_manifest(path)
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))
    return manifest


def write_with_manifest(df: DataFrame, path: str, mode: str = "overwrite") -> dict:
    """Write parquet and stamp the directory with its manifest;
    returns the manifest dict."""
    df.write.mode(mode).parquet(path)
    return stamp_manifest(path)


def verify_manifest(path: str) -> tuple[bool, str]:
    """Re-derive the directory state and compare against the stamped
    manifest; returns (ok, reason) with the FIRST discrepancy named."""
    mpath = os.path.join(path, MANIFEST_NAME)
    if not os.path.isfile(mpath):
        return False, "manifest missing"
    with open(mpath) as fh:
        want = json.load(fh)
    have = build_manifest(path)
    if have["schema_md5"] != want["schema_md5"]:
        return False, "schema changed"
    want_files = {e["file"]: e for e in want["files"]}
    have_files = {e["file"]: e for e in have["files"]}
    for f in want_files:
        if f not in have_files:
            return False, f"missing file: {f}"
    for f in have_files:
        if f not in want_files:
            return False, f"foreign file: {f}"
    for f, e in want_files.items():
        h = have_files[f]
        if h["bytes"] != e["bytes"] or h["rows"] != e["rows"]:
            return False, f"drift in {f}"
    if have["n_rows"] != want["n_rows"]:
        return False, "row-count drift"
    return True, "ok"


def load_verified(spark: SparkSession, path: str) -> DataFrame:
    """The consumer entry point: refuse to read a directory whose
    manifest does not verify."""
    ok, reason = verify_manifest(path)
    if not ok:
        raise ValueError(f"manifest verification failed for {path}: {reason}")
    return spark.read.parquet(path)
