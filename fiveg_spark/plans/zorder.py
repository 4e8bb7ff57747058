"""Z-order (Morton-curve) clustering for MULTI-column data skipping
(SURVEY §2 A9).

`write_sorted` clusters one dimension perfectly and the others not at
all.  Z-ordering interleaves the bits of several columns' rank codes so
each parquet row group covers a small HYPER-RECTANGLE of the key space:
min/max stats become selective on EVERY z-ordered column at once — the
layout Delta/Iceberg OPTIMIZE ZORDER applies, built here from plain
Spark primitives:

  1. per-column equi-depth bucket codes in [0, 2^bits) from SAMPLED
     approx-quantile boundaries (one cheap pass) + a map-only
     Bucketizer — rank-based, so skew and outliers can't crush the
     code space (a linear min-max scale would put 99% of a
     heavy-tailed column into one code), and NO per-column sort;
  2. bit-interleave the codes into one BIGINT z-value
     (shiftleft/bitwise-or, pure JVM codegen);
  3. repartitionByRange(z) + sortWithinPartitions(z): each output file
     owns a contiguous z-range = a small tile of the hyper-rectangle.

Cost at 100 TB: one sampled quantile scan + the same single
global-sort-shaped shuffle an ORDER BY write pays; codes and z are
computed in the map stage of that shuffle's exchange.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(df: DataFrame, cols: tuple[str, ...], bits: int = 8) -> DataFrame:
    """Add a `_z` BIGINT column: bit-interleaved equi-depth codes of
    ``cols`` (bits per column; total bits·len(cols) ≤ 63)."""
    from pyspark.ml.feature import Bucketizer

    assert bits * len(cols) <= 63, "z-value must fit a signed 64-bit long"
    n_buckets = 1 << bits
    out = df
    code_cols: list[str] = []
    widths: list[int] = []
    for c in cols:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = df.select(F.col(c).cast("double").alias(c)).approxQuantile(
            c, probs, 1.0 / (4 * n_buckets)
        )
        splits = [float("-inf")] + sorted(set(bounds)) + [float("inf")]
        code = f"_code_{c}"
        # handleInvalid="keep" routes NULL/NaN to an extra bucket instead
        # of aborting the whole clustered write; clamp that overflow
        # bucket onto the top valid code so widths stay consistent.
        top_code = len(splits) - 2
        out = Bucketizer(
            splits=splits, inputCol=f"_dbl_{c}", outputCol=code,
            handleInvalid="keep",
        ).transform(out.withColumn(f"_dbl_{c}", F.col(c).cast("double")))
        out = out.withColumn(
            code, F.least(F.col(code).cast("long"), F.lit(top_code))
        ).drop(f"_dbl_{c}")
        code_cols.append(code)
        # EFFECTIVE width: a low-cardinality column yields few buckets;
        # interleaving its (always-zero) high bits against a wide
        # column's real bits would let the wide column dominate the
        # ordering and un-cluster the narrow one.
        widths.append(max(1, (len(splits) - 2).bit_length()))
    # MSB-first interleave: level k takes bit (width-1-k) of every
    # column that still has bits at that depth, so the TOP z bits
    # alternate across columns — equal say in the coarse tiling.
    total = sum(widths)
    pieces: list[Column] = []
    dst = total - 1
    for k in range(max(widths)):
        for code, w in zip(code_cols, widths):
            if k < w:
                src_bit = (
                    F.shiftright(F.col(code).cast("long"), w - 1 - k)
                    .bitwiseAND(F.lit(1))
                )
                pieces.append(F.shiftleft(src_bit, dst))
                dst -= 1
    z = reduce(lambda a, b: a.bitwiseOR(b), pieces)
    return out.withColumn("_z", z.cast("long")).drop(*code_cols)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: tuple[str, ...],
    bits: int = 8,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the z-order of ``cols``."""
    zdf = zvalue(df, cols, bits)
    (
        zdf.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def skipping_fraction(path: str, col: str, point) -> float:
    """Fraction of row groups whose [min,max] for ``col`` could contain
    ``point`` — the scan fraction a point-predicate pays on this layout
    (parquet footer stats only; no data read)."""
    import glob

    import pyarrow.parquet as pq

    touched = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(
                next(
                    i
                    for i in range(md.num_columns)
                    if md.schema.column(i).name == col
                )
            ).statistics
            total += 1
            if stats.min <= point <= stats.max:
                touched += 1
    return touched / max(total, 1)
