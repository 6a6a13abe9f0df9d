"""Small TPU-shaped primitives shared across ops.

These exist because a few innocent-looking jnp idioms lower poorly on the
TPU backend (measured, see docs/PERFORMANCE.md): `jnp.cumsum` becomes an
O(n*window) reduce_window (~0.6 ms at 131k elements), and sized
`jnp.nonzero` becomes a full-length scatter-add (~1 ms). The replacements
here are plain vectorized adds/compares that XLA fuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def prefix_shift(x):
    """Inclusive prefix sum along the last axis via log-shift adds."""
    n = x.shape[-1]
    s = 1
    while s < n:
        x = x + jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(s, 0)])[..., :-s]
        s *= 2
    return x


def rev_segment_scan(seg, xs):
    """Suffix combines within equal-`seg` runs (segments must be contiguous,
    e.g. ids over sort-grouped keys): out[i] = combine(x[i..e)) where e is
    the end of i's run. Read at a run's first element this is the full
    per-segment aggregate — the scatter-free replacement for
    jax.ops.segment_max/sum over sorted segment ids (segment_* lower to
    full-length scatters on this backend).

    Args:
      seg: (N,) int32 run ids (any values, only equality of neighbors used).
      xs: list of (array (N,), combine fn, pad value) triples.

    Returns the list of scanned arrays."""
    n = seg.shape[0]
    res = [x for x, _, _ in xs]
    s = 1
    while s < n:
        same = jnp.pad(seg, (0, s), constant_values=-1)[s:] == seg
        new = []
        for x, (_, op, pad) in zip(res, xs):
            shifted = jnp.pad(x, ((0, s),) + ((0, 0),) * (x.ndim - 1),
                              constant_values=pad)[s:]
            m = same.reshape(same.shape + (1,) * (x.ndim - 1))
            new.append(jnp.where(m, op(x, shifted), x))
        res = new
        s *= 2
    return res


def spread_k_indices(mask, capacity):
    """Flat indices of ~`capacity` EVENLY-SPACED set bits of `mask` (1-D or
    2-D, row-major order), plus the kept count.

    Like first_k_indices but when the population exceeds `capacity` the
    selection subsamples uniformly across the whole mask instead of
    truncating at the first `capacity` bits — truncation spatially biases
    fixed-capacity keypoint sets toward the first rings of the sweep (the
    reference keeps every keypoint and has no such bias; SSKE.cxx keeps all
    labeled points). Bucketing uses an f32 rank ratio, so up to a few slots
    may go unused right at saturation."""
    if mask.ndim == 1:
        flat = mask
        n = mask.shape[0]
        C = 1024 if n >= 1024 else 128 if n >= 128 else n
        pad = (-n) % C
        if pad:
            flat = jnp.pad(flat, (0, pad))
        m2 = flat.reshape(-1, C)
    else:
        m2 = mask
    rows = prefix_shift(m2.astype(jnp.int32))            # in-row inclusive
    rtot = rows[:, -1]
    roff = prefix_shift(rtot[None, :])[0] - rtot         # exclusive row offsets
    count = roff[-1] + rtot[-1]

    def thinned():
        rank = rows + roff[:, None]                      # global inclusive rank
        ratio = jnp.float32(capacity) / jnp.maximum(count, 1)
        bkt = jnp.floor(rank.astype(jnp.float32) * ratio)
        bkt_prev = jnp.floor((rank - 1).astype(jnp.float32) * ratio)
        keep = m2.astype(bool) & (bkt != bkt_prev)
        if mask.ndim == 1:
            return keep.reshape(-1)[:mask.shape[0]]
        return keep

    # under capacity (the common case) skip the thinning pass entirely
    keep = jax.lax.cond(count > capacity, thinned, lambda: mask)
    return first_k_indices(keep, capacity)


def first_k_indices(mask, capacity):
    """Flat indices of the first `capacity` set bits of `mask` (1-D or 2-D,
    row-major order), plus the total set-bit count.

    Equivalent to jnp.nonzero(mask.ravel(), size=capacity, fill_value=0),
    but TPU-shaped: sized nonzero lowers to a full-length scatter-add; this
    uses in-row prefix sums and a rank->position search done as three
    compare-count stages (row, then 128-wide block, then column) — all
    vectorized, no scatters, only small/contiguous gathers.

    Returns (idx (capacity,) int32 — 0-filled past `count`, count ())."""
    if mask.ndim == 1:
        n = mask.shape[0]
        C = 1024 if n >= 1024 else 128 if n >= 128 else n
        pad = (-n) % C
        if pad:
            mask = jnp.pad(mask, (0, pad))
        mask = mask.reshape(-1, C)
    R, C = mask.shape
    B = 128 if C % 128 == 0 else C
    nb = C // B
    rows = prefix_shift(mask.astype(jnp.int32))           # (R, C) in-row inclusive
    rtot = rows[:, -1]                                    # (R,) per-row counts
    roff = prefix_shift(rtot[None, :])[0] - rtot          # (R,) exclusive offsets
    count = roff[-1] + rtot[-1]
    bsum = rows.reshape(R, nb, B)[:, :, -1]               # (R, nb) inclusive block sums
    j = jnp.arange(capacity, dtype=jnp.int32)             # want the (j+1)-th set bit
    # row r owns rank j iff roff[r] <= j < roff[r] + rtot[r]; empty rows
    # repeat their successor's offset and lose the compare-count tie
    row = jnp.sum(j[:, None] >= roff[None, :], axis=1) - 1
    jr = j - roff[row]                                    # 0-based in-row rank
    blk = jnp.sum(bsum[row] <= jr[:, None], axis=1)       # 128-wide block
    # ranks beyond `count` run blk out of range; the gather clamps and the
    # valid mask below zeroes the result, matching nonzero's fill
    seg = rows.reshape(R * nb, B)[row * nb + blk]         # (capacity, B) contiguous
    col = blk * B + jnp.sum(seg <= jr[:, None], axis=1)
    idx = row * C + col
    valid = j < jnp.minimum(count, capacity)
    return jnp.where(valid, idx, 0), count
