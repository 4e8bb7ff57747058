"""t-digest kernel accuracy + mergeability (SURVEY §2 C64).

The contract query certifies band membership on the testdata; here the
kernel is pinned against exact numpy quantiles on adversarial shapes —
uniform, heavy-tailed, heavily tied, tiny — and the defining sketch
property: a digest MERGED from part-digests answers like a digest of
the whole."""

from __future__ import annotations

import numpy as np
import pytest

from fiveg_spark.operators.tdigest import tdigest_compress, tdigest_quantile


def _est(values, q):
    m, w = tdigest_compress(np.asarray(values, float), np.ones(len(values)))
    return tdigest_quantile(m, w, q)


@pytest.mark.parametrize(
    "gen",
    [
        lambda rng: rng.uniform(0, 1000, 5000),
        lambda rng: rng.lognormal(3, 2, 5000),  # heavy tail
        lambda rng: rng.choice([1.0, 2.0, 7.5], 5000),  # heavy ties
        lambda rng: rng.normal(0, 1, 37),  # tiny
    ],
)
def test_quantile_rank_accuracy(gen):
    rng = np.random.default_rng(7)
    x = gen(rng)
    n = len(x)
    xs = np.sort(x)
    for q in (0.05, 0.5, 0.95, 0.99):
        est = _est(x, q)
        # rank error: where the estimate falls in the sorted data
        rank = np.searchsorted(xs, est, side="right") / n
        lo = np.searchsorted(xs, est, side="left") / n
        # with ties the whole tied run is rank-correct
        assert lo - 0.03 <= q <= rank + 0.03, (q, est, lo, rank)


def test_compression_bounds_centroids():
    # the q(1-q) mass ceiling gives O(delta) centroids in the body plus
    # extra resolution at the tails (its divergence there IS the tail
    # accuracy); the load-bearing property is that the size depends on
    # delta, not on n — 10x the data must not mean 10x the sketch
    rng = np.random.default_rng(8)
    sizes = {}
    for n in (10_000, 100_000):
        m, w = tdigest_compress(rng.uniform(0, 1, n), np.ones(n))
        assert np.all(np.diff(m) >= 0)
        assert w.sum() == pytest.approx(n)
        sizes[n] = len(m)
    assert sizes[100_000] <= 800  # ~8*delta worst case, << n
    assert sizes[100_000] <= 1.6 * sizes[10_000]  # sub-linear growth


def test_merge_matches_whole():
    rng = np.random.default_rng(9)
    x = rng.lognormal(0, 1, 20_000)
    halves = [x[:10_000], x[10_000:]]
    parts = [tdigest_compress(h, np.ones(len(h))) for h in halves]
    mm = np.concatenate([p[0] for p in parts])
    ww = np.concatenate([p[1] for p in parts])
    merged = tdigest_compress(mm, ww)
    xs = np.sort(x)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = tdigest_quantile(*merged, q)
        rank = np.searchsorted(xs, est) / len(x)
        assert abs(rank - q) <= 0.03, (q, rank)
