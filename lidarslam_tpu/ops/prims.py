"""Small TPU-shaped primitives shared across ops.

These exist because a few innocent-looking jnp idioms lower poorly on the
TPU backend (measured, see docs/PERFORMANCE.md): `jnp.cumsum` becomes an
O(n*window) reduce_window (~0.6 ms at 131k elements), and sized
`jnp.nonzero` becomes a full-length scatter-add (~1 ms). The replacements
here are plain vectorized adds/compares that XLA fuses.
"""

from __future__ import annotations

import jax.numpy as jnp


def prefix_shift(x):
    """Inclusive prefix sum along the last axis via log-shift adds."""
    n = x.shape[-1]
    s = 1
    while s < n:
        x = x + jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(s, 0)])[..., :-s]
        s *= 2
    return x
