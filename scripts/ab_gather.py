#!/usr/bin/env python
"""A/B: random (Q*k,3) row gather vs sorted-gather-unsort on the TPU.

Chained iterations (output feeds input) so the device serializes; the ~1 ms
tunnel-RTT floor applies to both arms equally. Decides whether
matcher._knn's neighbor-coordinate fetch should pre-sort indices.
"""
import time, sys
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M, Q, K = 1 << 16, 8192, 5
rng = np.random.default_rng(0)
xyz = jnp.asarray(rng.uniform(-20, 20, (M, 3)).astype(np.float32))
idx0 = jnp.asarray(rng.integers(0, M, (Q, K)).astype(np.int32))

@jax.jit
def plain(idx, xyz):
    nbr = xyz[idx]                     # (Q, K, 3)
    s = jnp.sum(nbr, axis=(1, 2))
    return (idx + 1) % M, s

@jax.jit
def sorted_gather(idx, xyz):
    flat = idx.reshape(-1)
    n = flat.shape[0]
    sidx, srow = lax.sort((flat, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    g = xyz[sidx]                      # monotone indices
    _, gx, gy, gz = lax.sort((srow, g[:, 0], g[:, 1], g[:, 2]), num_keys=1)
    nbr = jnp.stack([gx, gy, gz], -1).reshape(Q, K, 3)
    s = jnp.sum(nbr, axis=(1, 2))
    return (idx + 1) % M, s

def chain(f, n=30, label=""):
    i = idx0
    i, s = f(i, xyz); jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(n):
        i, s = f(i, xyz)
    jax.block_until_ready(s)
    print(f"{label:22s} {(time.perf_counter()-t0)/n*1000:7.3f} ms")

r1 = plain(idx0, xyz)[1]
r2 = sorted_gather(idx0, xyz)[1]
np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-4, atol=1e-3)
print("results match")
chain(plain, label="plain gather")
chain(sorted_gather, label="sorted gather+unsort")
