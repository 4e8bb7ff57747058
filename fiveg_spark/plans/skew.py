"""Salted join for skewed keys (SURVEY §3).

AQE's skew-join handles skew it can SEE (post-shuffle partition sizes),
but a single hot key inside one task can still dominate a sort-merge
join.  Salting splits each hot key into ``salt_buckets`` sub-keys:

- the BIG (skewed) side gets a random-but-deterministic salt in
  [0, buckets) per row — hash of a unique column, so re-runs produce
  identical placement (no ``rand()``: retried tasks must not reshuffle
  rows);
- the SMALL side is exploded ``buckets``× so every salted key still
  finds its match.

Join output is row-for-row identical to the unsalted join; only the
shuffle layout changes.  Cost model: small side grows by the factor,
big side's hot key spreads over ``buckets`` tasks — the right trade
whenever |small| × buckets ≪ |big-hot-key|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on column ``on``, salting the
    key into ``buckets`` sub-keys.  ``salt_from`` is a column of ``big``
    whose hash places each row deterministically."""
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_from)), F.lit(buckets))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted_big.join(salted_small, [on, "_salt"], how)
    return out.drop("_salt")
