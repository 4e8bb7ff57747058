"""PCAP as a first-class Spark data source (SURVEY §2 A31): the Spark
4 Python DataSource API wrapped around A2's pure-Python decoder, so
capture files read as ``spark.read.format("pcap").load(dir)`` — no
binaryFile + mapInPandas assembly required at every call site, and the
source itself participates in Catalyst's filter pushdown.

Two pushdowns, each honest about what it saves:

- ``slice_type = 'X'`` prunes WHOLE FILES before a byte is read — the
  slice is inferred from the capture file's path (the reference's HDFS
  layout convention, PcapKpiExtractor.scala's directory scheme), so
  this is partition pruning in the Hive sense: at 100 TB of captures
  the non-matching slices never leave the object store.
- ``protocol = 'X'`` filters during the decode loop — rows are skipped
  before Arrow serialization, saving the Python→JVM transfer (the
  decode itself still walks the file; packet records are not
  splittable or indexed).

Everything else returns to Spark for post-scan evaluation (the
pushFilters contract: returned filters are re-applied, so a partially
wrong pushdown can only cost performance, never correctness — but
these two are exact).

Scale: one InputPartition per capture file — the same file-granular
parallelism A2 documents (a pcap must decode within one task; the unit
of work at 100 TB is the capture file, thousands spread evenly).
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    InputPartition,
)

from fiveg_spark.sources.pcap import (
    PACKET_SCHEMA,
    decode_pcap_bytes,
    infer_slice,
)

# PACKET_SCHEMA column positions the pushdowns act on
_SLICE_IDX = 0
_PROTOCOL_IDX = 6


class PcapFilePartition(InputPartition):
    def __init__(self, path: str, slice_type: str):
        self.path = path
        self.slice_type = slice_type


class PcapReader(DataSourceReader):
    def __init__(self, options: dict):
        root = options.get("path")
        if not root:
            raise ValueError("pcap source requires a path")
        self._root = root
        self._slice_eq: str | None = None
        self._protocol_eq: str | None = None

    def pushFilters(self, filters):  # noqa: N802 — API name
        remaining = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("slice_type",):
                self._slice_eq = str(f.value)
            elif isinstance(f, EqualTo) and f.attribute == ("protocol",):
                self._protocol_eq = str(f.value)
            else:
                remaining.append(f)
        return remaining

    def _files(self) -> list[str]:
        if os.path.isfile(self._root):
            return [self._root]
        out = []
        for dirpath, _dirs, names in os.walk(self._root):
            out.extend(
                os.path.join(dirpath, n)
                for n in names
                if n.endswith((".pcap", ".cap"))
            )
        return sorted(out)

    def partitions(self):
        parts = []
        for path in self._files():
            slice_type = infer_slice(path)
            # file-level pruning: the slice comes from the PATH, so a
            # pushed slice_type equality skips the whole file unread
            if self._slice_eq is not None and slice_type != self._slice_eq:
                continue
            parts.append(PcapFilePartition(path, slice_type))
        return parts

    def read(self, partition: PcapFilePartition) -> Iterator[tuple]:
        with open(partition.path, "rb") as fh:
            data = fh.read()
        proto = self._protocol_eq
        for row in decode_pcap_bytes(
            data, partition.slice_type, os.path.basename(partition.path)
        ):
            if proto is not None and row[_PROTOCOL_IDX] != proto:
                continue
            yield row


class PcapStreamReader(DataSourceStreamReader):
    """Capture-directory tailing (SURVEY §2 A32): offsets are indexes
    into the SORTED file listing — capture files land append-only with
    monotonically named files (the rotation convention the reference's
    HDFS layout follows), so a count-offset is a total order and a
    replayed (start, end) range re-reads exactly the same files
    (exactly-once across checkpointed restarts comes free).  Files
    must not be mutated in place; a rewritten file is a new capture or
    nothing."""

    def __init__(self, options: dict):
        self._batch = PcapReader(options)

    def initialOffset(self) -> dict:  # noqa: N802 — API name
        return {"index": 0}

    def latestOffset(self) -> dict:  # noqa: N802 — API name
        return {"index": len(self._batch._files())}

    def partitions(self, start: dict, end: dict):
        files = self._batch._files()[start["index"]:end["index"]]
        return [PcapFilePartition(p, infer_slice(p)) for p in files]

    def read(self, partition: PcapFilePartition) -> Iterator[tuple]:
        return self._batch.read(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; nothing source-side


class PcapDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pcap"

    def schema(self):
        return PACKET_SCHEMA

    def reader(self, schema) -> PcapReader:
        return PcapReader(self.options)

    def streamReader(self, schema) -> PcapStreamReader:  # noqa: N802
        return PcapStreamReader(self.options)


def register_pcap_source(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format("pcap").load(dir)`` works session-wide.
    Python-source filter pushdown is opt-in (Spark 4.1 default off);
    a reader implementing pushFilters() under the disabled conf is an
    ANALYSIS error, so the conf flips on here, with registration."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PcapDataSource)
