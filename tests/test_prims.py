"""Scan/compaction primitives vs numpy oracles (ops/prims.py).

These are the scatter-free building blocks of the extractor compaction and
the rolling-map merge; each is checked directly against a sequential numpy
reference over randomized inputs (SURVEY §4: per-kernel numeric oracles).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lidarslam_tpu.ops import prims


@pytest.mark.parametrize("shape", [(7,), (128,), (1000,), (3, 50), (16, 256)])
def test_prefix_shift_matches_cumsum(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    x = rng.integers(-5, 6, shape).astype(np.int32)
    got = np.asarray(prims.prefix_shift(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x, axis=-1))


@pytest.mark.parametrize("n", [1, 17, 256, 4097])
def test_rev_segment_scan_matches_grouped_reduce(n):
    rng = np.random.default_rng(n)
    seg = np.sort(rng.integers(0, max(n // 3, 1), n)).astype(np.int32)
    a = rng.uniform(-10, 10, n).astype(np.float32)
    b = rng.integers(0, 100, n).astype(np.int32)
    outs = prims.rev_segment_scan(
        jnp.asarray(seg), [(jnp.asarray(a), jnp.add, 0.0),
                           (jnp.asarray(b), jnp.maximum, 0)])
    got_sum, got_max = (np.asarray(o) for o in outs)
    # oracle: suffix combine within each run
    want_sum = a.copy()
    want_max = b.copy()
    for i in range(n - 2, -1, -1):
        if seg[i] == seg[i + 1]:
            want_sum[i] += want_sum[i + 1]
            want_max[i] = max(want_max[i], want_max[i + 1])
    np.testing.assert_allclose(got_sum, want_sum, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(got_max, want_max)


@pytest.mark.parametrize("shape,capacity", [((300,), 64), ((300,), 512),
                                            ((8, 200), 100), ((16, 256), 4096),
                                            ((5, 128), 1)])
def test_first_k_indices_matches_nonzero(shape, capacity):
    rng = np.random.default_rng(capacity)
    mask = rng.uniform(size=shape) < 0.3
    idx, count = prims.first_k_indices(jnp.asarray(mask), capacity)
    idx, count = np.asarray(idx), int(count)
    want = np.flatnonzero(mask.ravel())
    assert count == len(want)
    k = min(capacity, len(want))
    np.testing.assert_array_equal(idx[:k], want[:k])
    np.testing.assert_array_equal(idx[k:], 0)   # fill value


def test_first_k_indices_empty_and_full():
    idx, count = prims.first_k_indices(jnp.zeros((64,), bool), 16)
    assert int(count) == 0 and np.all(np.asarray(idx) == 0)
    idx, count = prims.first_k_indices(jnp.ones((64,), bool), 64)
    assert int(count) == 64
    np.testing.assert_array_equal(np.asarray(idx), np.arange(64))


@pytest.mark.parametrize("n,capacity", [(1000, 64), (1000, 2000), (4096, 256)])
def test_spread_k_indices_even_coverage(n, capacity):
    rng = np.random.default_rng(n + capacity)
    mask = rng.uniform(size=n) < 0.5
    idx, kept = prims.spread_k_indices(jnp.asarray(mask), capacity)
    idx, kept = np.asarray(idx), int(kept)
    want = np.flatnonzero(mask)
    if len(want) <= capacity:
        # under capacity: identical to first_k_indices (keep everything)
        assert kept == len(want)
        np.testing.assert_array_equal(idx[:kept], want)
    else:
        # saturated: ~capacity bits kept, spread over the WHOLE index range
        assert capacity - 4 <= kept <= capacity
        sel = idx[:kept]
        assert np.all(mask[sel])
        assert np.all(np.diff(sel) > 0)          # still sorted / unique
        # even spread: selections reach the tail of the population, and
        # gaps between consecutive picks stay near the ideal stride
        assert sel[-1] >= want[-int(np.ceil(len(want) / capacity))]
        ranks = np.searchsorted(want, sel)
        gaps = np.diff(ranks)
        ideal = len(want) / capacity
        assert gaps.max() <= np.ceil(ideal) + 1
        assert gaps.min() >= np.floor(ideal) - 1
