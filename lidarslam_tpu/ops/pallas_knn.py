"""Pallas TPU kernel: fused brute-force k-NN with bucketed running-min.

The XLA `brute_knn` path (voxel_map.py) materializes a (Q, chunk) f32
distance matrix in HBM per map chunk and reads it back through
`approx_max_k` — ~1 GB of HBM round-trip per full-capacity query (the two
~168 us ops that dominate the per-frame profile, see docs/PERFORMANCE.md).
This kernel fuses the two: distances are computed tile-by-tile in VMEM and
reduced on the fly into a per-lane-bucket running minimum, so only the
(Q, L) bucket minima ever reach HBM (~250x less traffic).

Algorithm = the same bucketed PartialReduce that backs
`jax.lax.approx_max_k` (TPU kernel of Chern et al., arXiv:2206.14286):
map slot j lands in bucket j mod L; each bucket keeps its running minimum.
Expected recall for k=10 over L=1024 buckets is ~0.995, matching the XLA
path's recall_target=0.99; the 1-NN is always exact.

Two VMEM-bandwidth tricks keep the kernel compute-bound:
- (distance, row) are packed into ONE int32 per bucket — the low
  `row_bits` mantissa bits of the non-negative f32 distance are replaced
  by the row id (IEEE bits of non-negative floats are monotone, so `min`
  on the packed integer is min-by-distance; the <= 2^-12 relative distance
  error only affects tie-breaking, and exact distances are recomputed
  outside). `row_bits` grows with the map (8..11), so capacities up to
  2048 rows x 1024 lanes = 2,097,152 slots (16x the default map capacity)
  stay on the fast path.
- ROW_BLOCK map rows are reduced per loop iteration, so the running-min
  carry is read/written once per 8 rows instead of per row.

Maps larger than one VMEM-resident tile (ROW_GROUP=256 rows = 3 MB of
coords) are streamed as a second sequential grid dimension: each row group
is DMA'd in turn and min-merged into the same (TQ, L) output block
(revisited-output accumulation; TPU grids execute sequentially).

Replaces: nanoflann kd-tree queries (ref KDTreePCLAdaptor.h:46-114) on the
matcher/overlap hot path (ref KeypointsMatcher.cxx:60-70,
ConfidenceEstimators.cxx:39-63).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TQ = 64          # queries per grid step; with TQ=128 the (TQ, RB, L)
                 # loop temps overflow the 16 MB scoped VMEM once the
                 # surrounding program is large (e.g. 64-beam configs)
LANES = 1024     # bucket count = minor dim of the reshaped map
ROW_BLOCK = 8    # map rows reduced per carry update (sublane-aligned:
                 # Mosaic requires the row-slice offset to be a provable
                 # multiple of 8)
ROW_GROUP = 256  # map rows resident in VMEM per grid step (3 MB of coords)
MAX_ROW_BITS = 11  # => max map capacity 2048 * LANES = 2,097,152 slots
BIG = jnp.float32(1e9)  # coordinate sentinel for invalid slots (d2 ~ 3e18)


def _knn_kernel(qx_ref, qy_ref, qz_ref, px_ref, py_ref, pz_ref, best_ref,
                *, rg: int, row_mask: int):
    """One query tile vs one map row group: packed running min over rows.

    qx/qy/qz: (TQ, 1) query coords.  px/py/pz: (rg, L) map coords, row-major
    reshape of the flat slot array (slot = r*L + lane).  Output (TQ, L)
    int32: min packed (distance-bits | global row) per bucket, min-merged
    across the row-group grid dimension.
    """
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        best_ref[...] = jnp.full((TQ, LANES), jnp.int32(0x7FFFFFFF))

    qx = qx_ref[...][:, :, None]   # (TQ, 1, 1)
    qy = qy_ref[...][:, :, None]
    qz = qz_ref[...][:, :, None]
    n_blocks = rg // ROW_BLOCK
    row0 = g * rg
    rb_iota = jax.lax.broadcasted_iota(jnp.int32, (TQ, ROW_BLOCK, LANES), 1)

    def body(b, best):
        r0 = b * ROW_BLOCK
        px = px_ref[pl.ds(r0, ROW_BLOCK), :][None]   # (1, RB, L)
        py = py_ref[pl.ds(r0, ROW_BLOCK), :][None]
        pz = pz_ref[pl.ds(r0, ROW_BLOCK), :][None]
        dx = qx - px
        dy = qy - py
        dz = qz - pz
        d2 = dx * dx + dy * dy + dz * dz             # (TQ, RB, L)
        # d2 >= 0, so its IEEE bits are a non-negative, order-preserving
        # int32 (Mosaic has no unsigned reductions)
        bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
        packed = (bits & jnp.int32(~row_mask)) | (rb_iota + jnp.int32(row0 + r0))
        return jnp.minimum(best, jnp.min(packed, axis=1))

    init = best_ref[...]
    best_ref[...] = jax.lax.fori_loop(0, n_blocks, body, init)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def bucketed_knn(xyz, valid, queries, k: int, interpret: bool = False):
    """k nearest valid map slots per query.

    Same contract as `voxel_map.brute_knn`: returns (sq_dists (Q, k)
    ascending with +inf for missing neighbors, slot rows (Q, k)).
    """
    M = xyz.shape[0]
    Q = queries.shape[0]
    RM = -(-max(M, 1) // LANES)
    RM = -(-RM // ROW_BLOCK) * ROW_BLOCK
    if RM > (1 << MAX_ROW_BITS):
        raise ValueError(f"map capacity {M} exceeds the packed-row budget "
                         f"({(1 << MAX_ROW_BITS) * LANES} slots)")
    # rows the packed id must address, and the VMEM-resident group size
    rg = min(RM, ROW_GROUP)
    RM = -(-RM // rg) * rg
    n_groups = RM // rg
    row_bits = max(8, (RM - 1).bit_length())
    row_mask = (1 << row_bits) - 1
    Mp = RM * LANES
    Qp = -(-Q // TQ) * TQ

    # invalid / padding slots get a BIG coordinate -> huge but finite d2
    def coord(c):
        p = jnp.where(valid, xyz[:, c], BIG)
        return jnp.pad(p, (0, Mp - M), constant_values=BIG).reshape(RM, LANES)

    px, py, pz = coord(0), coord(1), coord(2)
    q = jnp.pad(queries, ((0, Qp - Q), (0, 0)))
    qx, qy, qz = (q[:, 0:1], q[:, 1:2], q[:, 2:3])

    best = pl.pallas_call(
        functools.partial(_knn_kernel, rg=rg, row_mask=row_mask),
        grid=(Qp // TQ, n_groups),
        in_specs=[
            pl.BlockSpec((TQ, 1), lambda i, g: (i, 0)),
            pl.BlockSpec((TQ, 1), lambda i, g: (i, 0)),
            pl.BlockSpec((TQ, 1), lambda i, g: (i, 0)),
            pl.BlockSpec((rg, LANES), lambda i, g: (g, 0)),
            pl.BlockSpec((rg, LANES), lambda i, g: (g, 0)),
            pl.BlockSpec((rg, LANES), lambda i, g: (g, 0)),
        ],
        out_specs=pl.BlockSpec((TQ, LANES), lambda i, g: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Qp, LANES), jnp.int32),
        interpret=interpret,
    )(qx, qy, qz, px, py, pz)
    best = best[:Q]

    # top-k over the L bucket minima via the native PartialReduce — an exact
    # lax.top_k here costs MORE than the kernel itself (1.15 ms vs 0.74 ms on
    # (2048, 1024), see docs/PERFORMANCE.md). Selecting on the PACKED value
    # keeps the row id in the low mantissa bits of the returned values, so no
    # take_along_axis gather is needed either. (Packed bits are valid f32:
    # every bucket holds a finite d2 — real point or the BIG sentinel.)
    packed_f = jax.lax.bitcast_convert_type(best, jnp.float32)
    vals, lane = jax.lax.approx_min_k(packed_f, k, recall_target=0.99)
    bits = jax.lax.bitcast_convert_type(vals, jnp.int32)
    row = bits & jnp.int32(row_mask)
    idx = jnp.minimum(row * LANES + lane, M - 1)
    # exact distances of the selected slots (the packed value dropped the low
    # mantissa bits); missing neighbors keep the +inf convention
    approx_d2 = jax.lax.bitcast_convert_type(bits & jnp.int32(~row_mask),
                                             jnp.float32)
    d2 = jnp.sum((queries[:, None, :] - xyz[idx]) ** 2, axis=-1)
    d2 = jnp.where(approx_d2 > 1e17, jnp.inf, d2)
    return d2, idx.astype(jnp.int32)
