"""Pallas TPU kernel: fused brute-force k-NN with bucketed running-min.

The XLA `brute_knn` path (voxel_map.py) materializes a (Q, chunk) f32
distance matrix in HBM per map chunk and reads it back through
`approx_max_k` — ~1 GB of HBM round-trip per full-capacity query (the two
~168 us ops that dominate the per-frame profile, see docs/PERFORMANCE.md).
This kernel fuses the two: distances are computed tile-by-tile in VMEM and
reduced on the fly into a per-lane-bucket running minimum, so only the
top-k packed results ever reach HBM.

Algorithm = the bucketed PartialReduce that backs `jax.lax.approx_max_k`
(TPU kernel of Chern et al., arXiv:2206.14286): map slot j lands in bucket
j mod L; each bucket keeps its running minimum. The top-k over the L
bucket minima is then extracted EXACTLY inside the kernel (k passes of
min + mask over VMEM — v1 shipped the (Q, L) minima to HBM and paid
~5.5 ms of approx_top_k + gather chains on 64-beam configs). The 1-NN is
always exact at any L.

The lane count L is chosen per map size (`pick_lanes`): a prune block is
ROW_BLOCK x L consecutive sorted slots, so at L=1024 one block (8192
slots) is as large as a typical live map and the AABB pruning has nothing
to skip — measured scan fractions sat at ~1 block/tile regardless of key
order (round-4 analysis). Maps up to 2^18 slots therefore run at L=128
(block = 1024 slots, 8x finer pruning); to keep recall, buckets are then
DEPTH 2 (each bucket carries its two smallest slots): top-k is lost only
when >= 3 of the true k collide in one bucket, P ~ C(k,3)/L^2 ~ 0.7% for
k=10 at L=128 — BETTER than the ~0.957 single-depth recall at L=1024.
Hardware A/B (Q=8192, k=10, 64Ki-slot map, 9k live): L=1024/depth-1
with_coords 2.44 ms -> L=128/depth-2 1.56 ms, identical results.

Spatial pruning (v2): the map slot array is leaf-key sorted (voxel_map),
so ROW_BLOCK-row blocks are key-contiguous, spatially tight slabs. Queries
are Morton-sorted so each TQ-query tile is a compact cloud, and per
(tile, row-group) start/count loop bounds are precomputed in XLA from
tile-AABB-to-block-AABB distances: blocks farther than `prune_radius`
(the matcher's max_neighbors_distance gate — any neighbor beyond it is
rejected anyway, KeypointsMatcher.cxx:217) are never scanned. Box distance
lower-bounds point distance, so pruning is conservative-exact for every
gated match.

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
is DMA'd in turn and min-merged into a persistent VMEM scratch
accumulator; extraction runs on the last group (TPU grids execute
sequentially, minor dimension fastest).

Replaces: nanoflann kd-tree queries (ref KDTreePCLAdaptor.h:46-114) on the
matcher/overlap hot path (ref KeypointsMatcher.cxx:60-70,
ConfidenceEstimators.cxx:39-63).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 64          # queries per grid step; with TQ=128 the (TQ, RB, L)
                 # loop temps overflow the 16 MB scoped VMEM once the
                 # surrounding program is large (e.g. 64-beam configs)
LANES = 1024     # max bucket count = minor dim of the reshaped map
ROW_BLOCK = 8    # map rows reduced per carry update (sublane-aligned:
                 # Mosaic requires the row-slice offset to be a provable
                 # multiple of 8 — hence block-unit loop bounds * 8)
MAX_ROW_BITS = 11  # => max map capacity 2048 * LANES = 2,097,152 slots
KP = 128         # output lane width holding the k extracted results
SENTINEL = 0x7FFFFFFF  # python int: a module-level jnp scalar would be
                       # captured as a pallas closure constant
BIG = jnp.float32(1e9)  # coordinate sentinel for invalid slots (d2 ~ 3e18)


def pick_lanes(M: int) -> int:
    """Bucket count for an M-slot map: small maps get narrow lanes so the
    ROW_BLOCK x L prune blocks are spatially fine — and depth-2 buckets
    then hold recall ABOVE the wide single-depth kernel. L=64 for maps up
    to 2^17 slots (RM then tops out exactly at the 2^11 packed-row
    budget). Round-5 hardware data on a live 64-beam capture: STANDALONE
    (kernel-only chained dispatch) L=64 ran 4.3x faster than L=128 for
    the plane call and 13x for edges, but an interleaved in-process A/B
    of the FULL fused pipeline measured the two as perf-neutral (device
    12.47 vs 12.63 ms/frame, knn 6.08 vs 6.09 — the standalone gap is a
    Mosaic scheduling artifact of the isolated program, not intrinsic).
    L=64 is kept for the standalone-path win, the 2x finer prune blocks,
    and the better depth-2 recall margin at small k (slotwise recall
    measured >= 0.9999 vs exact f64 neighbors for both L). Larger maps
    fall back to L=128 / L=1024 to stay within the packed row-id
    budget."""
    if M <= (1 << 17):
        return 64
    return 128 if M <= (1 << 18) else LANES


def _depth(k: int, lanes: int) -> int:
    """Bucket depth: 1-NN is exact at depth 1; narrow-lane configs carry
    two slots per bucket to hold recall (see module docstring)."""
    return 2 if (k > 1 and lanes <= 512) else 1


def _row_group(RM: int, lanes: int) -> int:
    """Map rows resident in VMEM per grid step (~3 MB of coords)."""
    rows = max(ROW_BLOCK, (3 << 20) // (12 * lanes) // ROW_BLOCK * ROW_BLOCK)
    return min(RM, rows)


def _knn_kernel(nv_ref, lo_ref, nb_ref, qx_ref, qy_ref, qz_ref, px_ref,
                py_ref, pz_ref, vals_ref, lanes_ref, cx_ref, cy_ref, cz_ref,
                b1_ref, b2_ref, ax_ref, ay_ref, az_ref, ax2_ref, ay2_ref,
                az2_ref,
                *, rg: int, row_mask: int, k: int, n_groups: int,
                with_coords: bool, depth: int, L: int):
    """One query tile vs one map row group: packed running min over the
    tile's [lo, lo+nb) row blocks, then exact top-k extraction on the last
    group.

    qx/qy/qz: (TQ, 1) query coords.  px/py/pz: (rg, L) map coords, row-major
    reshape of the flat slot array (slot = r*L + lane).  lo/nb: (T, G) SMEM
    per-(tile, group) block ranges.  nv: (1,) SMEM count of live queries —
    queries are sorted live-first, so tiles past it skip both the scan and
    the k-extraction passes entirely (fill-slot queries are a large
    fraction of the fixed-capacity keypoint arrays).  Outputs (TQ, KP)
    int32: the k smallest packed (distance-bits | global row) values and
    their bucket lanes; SENTINEL for dead tiles.

    `with_coords`: per-bucket coordinate accumulators ride along with the
    packed running min, and extraction ALSO emits the selected neighbors\'
    coordinates (TQ, KP) x3 — the consumers\' post-kernel gather of
    neighbor xyz from HBM/plane tables measured 8.1 ms/frame at 64-beam
    scale (XLA TPU gathers run ~20 ns/row). Packed values embed the unique
    row id in the low bits, so strict `<` never ties across distinct slots
    and every argmin select below is exact.

    `depth` = 2: each bucket carries its TWO smallest slots (b1 <= b2 as
    sorted pairs, merged block-by-block); extraction promotes b2 -> b1 on
    the selected bucket. See module docstring for the recall math.
    """
    i = pl.program_id(0)
    g = pl.program_id(1)
    active = i * TQ < nv_ref[0]
    deep = depth == 2

    @pl.when((g == 0) & active)
    def _init():
        b1_ref[...] = jnp.full((TQ, L), SENTINEL, jnp.int32)
        if deep:
            b2_ref[...] = jnp.full((TQ, L), SENTINEL, jnp.int32)
        if with_coords:
            ax_ref[...] = jnp.zeros((TQ, L), jnp.float32)
            ay_ref[...] = jnp.zeros((TQ, L), jnp.float32)
            az_ref[...] = jnp.zeros((TQ, L), jnp.float32)
            if deep:
                ax2_ref[...] = jnp.zeros((TQ, L), jnp.float32)
                ay2_ref[...] = jnp.zeros((TQ, L), jnp.float32)
                az2_ref[...] = jnp.zeros((TQ, L), jnp.float32)

    @pl.when(active)
    def _scan():
        qx = qx_ref[...][:, :, None]   # (TQ, 1, 1)
        qy = qy_ref[...][:, :, None]
        qz = qz_ref[...][:, :, None]
        row0 = g * rg
        lo = lo_ref[i, g]
        nb = nb_ref[i, g]
        rb_iota = jax.lax.broadcasted_iota(jnp.int32, (TQ, ROW_BLOCK, L), 1)

        def block(b):
            # r0 = (lo + b) * 8: a provable multiple of 8 for the sublane slice
            r0 = (lo + b) * ROW_BLOCK
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
            packed = (bits & jnp.int32(~row_mask)) | (rb_iota + jnp.int32(row0) + r0)
            return packed, (px, py, pz)

        def block_top(b, want_coords):
            """Block\'s smallest (and, if deep, second-smallest) packed value
            per bucket, with the selected rows\' coords (1e10 literals: the
            module-level BIG jnp scalar would be captured as a pallas
            closure constant)."""
            packed, (px, py, pz) = block(b)
            r1 = jnp.min(packed, axis=1)                 # (TQ, L)
            out = [r1, None, None, None, None, None, None, None]
            hit1 = packed == r1[:, None, :] if (want_coords or deep) else None
            if want_coords:
                out[2] = jnp.min(jnp.where(hit1, px, 1e10), axis=1)
                out[3] = jnp.min(jnp.where(hit1, py, 1e10), axis=1)
                out[4] = jnp.min(jnp.where(hit1, pz, 1e10), axis=1)
            if deep:
                masked = jnp.where(hit1, SENTINEL, packed)
                r2 = jnp.min(masked, axis=1)
                out[1] = r2
                if want_coords:
                    hit2 = masked == r2[:, None, :]
                    out[5] = jnp.min(jnp.where(hit2, px, 1e10), axis=1)
                    out[6] = jnp.min(jnp.where(hit2, py, 1e10), axis=1)
                    out[7] = jnp.min(jnp.where(hit2, pz, 1e10), axis=1)
            return out

        if not deep and not with_coords:
            def body(b, best):
                return jnp.minimum(best, block_top(b, False)[0])

            b1_ref[...] = jax.lax.fori_loop(0, nb, body, b1_ref[...])
        elif not deep:
            def body(b, carry):
                best, cx, cy, cz = carry
                r1, _, sx, sy, sz, _, _, _ = block_top(b, True)
                upd = r1 < best
                return (jnp.where(upd, r1, best),
                        jnp.where(upd, sx, cx),
                        jnp.where(upd, sy, cy),
                        jnp.where(upd, sz, cz))

            best, cx, cy, cz = jax.lax.fori_loop(
                0, nb, body,
                (b1_ref[...], ax_ref[...], ay_ref[...], az_ref[...]))
            b1_ref[...] = best
            ax_ref[...] = cx
            ay_ref[...] = cy
            az_ref[...] = cz
        else:
            zc = jnp.zeros((TQ, L), jnp.float32)

            def body(b, carry):
                b1, b2, c1, c2 = carry
                r1, r2, sx, sy, sz, s2x, s2y, s2z = \
                    block_top(b, with_coords)
                # merge two sorted pairs (b1<=b2, r1<=r2); packed values of
                # distinct slots never tie (unique row id in the low bits)
                t1 = r1 < b1
                n1 = jnp.where(t1, r1, b1)
                cand = jnp.where(t1, b1, r1)
                tb = b2 < cand
                m2 = jnp.where(tb, b2, cand)
                tr = r2 < m2
                n2 = jnp.where(tr, r2, m2)
                if not with_coords:
                    return n1, n2, c1, c2
                n1c = tuple(jnp.where(t1, s, c) for s, c in
                            zip((sx, sy, sz), c1))
                candc = tuple(jnp.where(t1, c, s) for s, c in
                              zip((sx, sy, sz), c1))
                m2c = tuple(jnp.where(tb, c, cc) for c, cc in
                            zip(c2, candc))
                n2c = tuple(jnp.where(tr, s, m) for s, m in
                            zip((s2x, s2y, s2z), m2c))
                return n1, n2, n1c, n2c

            c1 = (ax_ref[...], ay_ref[...], az_ref[...]) if with_coords \
                else (zc, zc, zc)
            c2 = (ax2_ref[...], ay2_ref[...], az2_ref[...]) if with_coords \
                else (zc, zc, zc)
            b1, b2, c1, c2 = jax.lax.fori_loop(
                0, nb, body, (b1_ref[...], b2_ref[...], c1, c2))
            b1_ref[...] = b1
            b2_ref[...] = b2
            if with_coords:
                ax_ref[...], ay_ref[...], az_ref[...] = c1
                ax2_ref[...], ay2_ref[...], az2_ref[...] = c2

    @pl.when((g == n_groups - 1) & active)
    def _extract():
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (TQ, L), 1)
        kp_iota = jax.lax.broadcasted_iota(jnp.int32, (TQ, KP), 1)
        zc = jnp.zeros((TQ, L), jnp.float32)
        zs = jnp.full((TQ, L), SENTINEL, jnp.int32)

        def ext(j, carry):
            b1, b2, c1, c2, vals, lanes, ox, oy, oz = carry
            m = jnp.min(b1, axis=1, keepdims=True)              # (TQ, 1)
            is_m = b1 == m
            lane = jnp.min(jnp.where(is_m, lane_iota, L), axis=1,
                           keepdims=True)
            sel = is_m & (lane_iota == lane)                    # one bucket
            vals = jnp.where(kp_iota == j, m, vals)
            lanes = jnp.where(kp_iota == j, lane, lanes)
            if with_coords:
                hx = jnp.max(jnp.where(sel, c1[0], -1e10), axis=1,
                             keepdims=True)
                hy = jnp.max(jnp.where(sel, c1[1], -1e10), axis=1,
                             keepdims=True)
                hz = jnp.max(jnp.where(sel, c1[2], -1e10), axis=1,
                             keepdims=True)
                ox = jnp.where(kp_iota == j, hx, ox)
                oy = jnp.where(kp_iota == j, hy, oy)
                oz = jnp.where(kp_iota == j, hz, oz)
            # pop the selected bucket: depth-2 promotes its second entry,
            # depth-1 empties it; other buckets stay eligible
            if depth == 2:
                b1 = jnp.where(sel, b2, b1)
                b2 = jnp.where(sel, SENTINEL, b2)
                if with_coords:
                    c1 = tuple(jnp.where(sel, b_, a_) for a_, b_ in
                               zip(c1, c2))
            else:
                b1 = jnp.where(sel, SENTINEL, b1)
            return b1, b2, c1, c2, vals, lanes, ox, oy, oz

        zero = jnp.zeros((TQ, KP), jnp.float32)
        c1 = (ax_ref[...], ay_ref[...], az_ref[...]) if with_coords \
            else (zc, zc, zc)
        c2 = (ax2_ref[...], ay2_ref[...], az2_ref[...]) \
            if (with_coords and depth == 2) else (zc, zc, zc)
        init = (b1_ref[...], b2_ref[...] if depth == 2 else zs, c1, c2,
                jnp.full((TQ, KP), SENTINEL, jnp.int32),
                jnp.zeros((TQ, KP), jnp.int32), zero, zero, zero)
        out = jax.lax.fori_loop(0, k, ext, init)
        _, _, _, _, vals, lanes, ox, oy, oz = out
        vals_ref[...] = vals
        lanes_ref[...] = lanes
        if with_coords:
            cx_ref[...] = ox
            cy_ref[...] = oy
            cz_ref[...] = oz

    @pl.when((g == n_groups - 1) & ~active)
    def _dead():
        vals_ref[...] = jnp.full((TQ, KP), SENTINEL, jnp.int32)
        lanes_ref[...] = jnp.zeros((TQ, KP), jnp.int32)
        if with_coords:
            cx_ref[...] = jnp.zeros((TQ, KP), jnp.float32)
            cy_ref[...] = jnp.zeros((TQ, KP), jnp.float32)
            cz_ref[...] = jnp.zeros((TQ, KP), jnp.float32)


def _morton10(x):
    """Spread the low 10 bits of x over every 3rd bit (Morton interleave)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & jnp.int32(0x30000FF)
    x = (x | (x << 8)) & jnp.int32(0x300F00F)
    x = (x | (x << 4)) & jnp.int32(0x30C30C3)
    x = (x | (x << 2)) & jnp.int32(0x9249249)
    return x


def _spatial_order(queries, cell: float, q_valid=None):
    """Morton order of the query cloud at `cell` granularity; dead queries
    (q_valid False) sort to the end so whole tiles of them can be skipped."""
    qmin = jnp.min(queries, axis=0)
    q = jnp.clip(((queries - qmin) / cell).astype(jnp.int32), 0, 1023)
    code = (_morton10(q[:, 0]) | (_morton10(q[:, 1]) << 1)
            | (_morton10(q[:, 2]) << 2))
    if q_valid is not None:
        code = jnp.where(q_valid, code, jnp.int32(2**31 - 1))
    return jnp.argsort(code)


def _geometry(M: int, lanes: int | None = None):
    """Static kernel geometry for an M-slot map at `lanes` buckets."""
    L = pick_lanes(M) if lanes is None else lanes
    RM = -(-max(M, 1) // L)
    RM = -(-RM // ROW_BLOCK) * ROW_BLOCK
    if RM > (1 << MAX_ROW_BITS):
        raise ValueError(f"map capacity {M} exceeds the packed-row budget "
                         f"({(1 << MAX_ROW_BITS) * L} slots at L={L})")
    # rows the packed id must address, and the VMEM-resident group size
    rg = _row_group(RM, L)
    RM = -(-RM // rg) * rg
    n_groups = RM // rg
    nbg = rg // ROW_BLOCK            # row blocks per group
    row_bits = max(8, (RM - 1).bit_length())
    return RM, rg, n_groups, nbg, row_bits, L


class MapPlanes(NamedTuple):
    """Loop-invariant map-side kernel inputs: the (RM, L) coordinate
    planes and per-ROW_BLOCK AABBs. The submap only changes when the map
    is updated (keyframes), but the matcher runs inside the ICP fori_loop —
    computing these per call re-executes them every round (XLA does not
    hoist invariants out of while bodies; see docs/PERFORMANCE.md). Build
    once per frame with `prepare_map` and pass to `bucketed_knn`."""

    px: jax.Array            # (RM, L) f32, BIG where invalid/padding
    py: jax.Array
    pz: jax.Array
    bmin: jax.Array | None   # (RM/ROW_BLOCK, 3) valid-slot block AABBs
    bmax: jax.Array | None

    @property
    def lanes(self) -> int:
        return self.px.shape[1]


def prepare_map(xyz, valid, with_blocks: bool = True,
                lanes: int | None = None) -> MapPlanes:
    """Precompute the map-side kernel inputs (see MapPlanes)."""
    M = xyz.shape[0]
    RM, _, _, _, _, L = _geometry(M, lanes)
    Mp = RM * L

    # invalid / padding slots get a BIG coordinate -> huge but finite d2
    def coord(c):
        p = jnp.where(valid, xyz[:, c], BIG)
        return jnp.pad(p, (0, Mp - M), constant_values=BIG).reshape(RM, L)

    bmin = bmax = None
    if with_blocks:
        # block AABBs over valid slots only (empty blocks -> +inf/-inf)
        def bminmax(sign):
            p = jnp.where(valid[:, None], xyz, sign * jnp.inf)
            p = jnp.pad(p, ((0, Mp - M), (0, 0)),
                        constant_values=sign * jnp.inf)
            p = p.reshape(RM // ROW_BLOCK, ROW_BLOCK * L, 3)
            return jnp.min(p, axis=1) if sign > 0 else jnp.max(p, axis=1)
        bmin = bminmax(+1)                       # (NB, 3)
        bmax = bminmax(-1)
    return MapPlanes(px=coord(0), py=coord(1), pz=coord(2), bmin=bmin, bmax=bmax)


@functools.partial(jax.jit,
                   static_argnames=("k", "prune_radius", "interpret",
                                    "with_coords"))
def bucketed_knn(xyz, valid, queries, k: int, prune_radius: float = None,
                 interpret: bool = False, q_valid=None,
                 prepared: MapPlanes | None = None,
                 with_coords: bool = False):
    """k nearest valid map slots per query.

    Same contract as `voxel_map.brute_knn`: returns (sq_dists (Q, k)
    ascending with +inf for missing neighbors, slot rows (Q, k)) — plus,
    with `with_coords=True`, the neighbor coordinates (Q, k, 3) extracted
    inside the kernel (avoids the consumers' post-kernel xyz gather, which
    measures ~20 ns/row on TPU; missing neighbors come back 0).

    `prune_radius`: when set, row blocks whose AABB is farther than this
    from a query tile's AABB are skipped. Only neighbors within the radius
    are then guaranteed; pass the matcher gate (max_neighbors_distance) so
    every surviving match is unaffected.

    `q_valid` (Q,) bool: dead query slots (fixed-capacity keypoint fill)
    sort to the end and whole dead tiles skip the kernel body; their
    neighbors come back +inf/missing.

    `prepared`: precomputed `prepare_map(xyz, valid)` output — pass it when
    the call sits inside a loop whose body does not change the map.
    """
    if k > KP:
        raise ValueError(f"k={k} exceeds the kernel output width {KP}")
    M = xyz.shape[0]
    Q = queries.shape[0]
    L = prepared.lanes if prepared is not None else pick_lanes(M)
    RM, rg, n_groups, nbg, row_bits = _geometry(M, L)[:5]
    row_mask = (1 << row_bits) - 1
    depth = _depth(k, L)
    Qp = -(-Q // TQ) * TQ
    T = Qp // TQ

    if prepared is None:
        prepared = prepare_map(xyz, valid,
                               with_blocks=prune_radius is not None, lanes=L)
    px, py, pz = prepared.px, prepared.py, prepared.pz
    if px.shape != (RM, L):
        raise ValueError(f"prepared planes {px.shape} do not match the map "
                         f"geometry ({RM}, {L})")

    order = inv = None
    n_valid = jnp.int32(Q)
    if prune_radius is not None and Q > TQ:
        order = _spatial_order(queries, cell=max(float(prune_radius), 1e-3),
                               q_valid=q_valid)
        inv = jnp.argsort(order)
        queries = queries[order]
        if q_valid is not None:
            n_valid = jnp.sum(q_valid).astype(jnp.int32)
    # edge-pad so the last tile's AABB is not inflated toward the origin
    q = queries if Qp == Q else jnp.concatenate(
        [queries, jnp.broadcast_to(queries[-1:], (Qp - Q, 3))])
    qx, qy, qz = (q[:, 0:1], q[:, 1:2], q[:, 2:3])

    if prune_radius is None:
        lo = jnp.zeros((T, n_groups), jnp.int32)
        nb = jnp.full((T, n_groups), nbg, jnp.int32)
    else:
        # tile AABBs over the Morton-sorted queries
        qt = q.reshape(T, TQ, 3)
        tmin = jnp.min(qt, axis=1)               # (T, 3)
        tmax = jnp.max(qt, axis=1)
        bmin, bmax = prepared.bmin, prepared.bmax
        if bmin is None:   # prepared without blocks but pruning requested
            blocks = prepare_map(xyz, valid, with_blocks=True, lanes=L)
            bmin, bmax = blocks.bmin, blocks.bmax
        d = jnp.maximum(bmin[None] - tmax[:, None], tmin[:, None] - bmax[None])
        d = jnp.maximum(d, 0.0)
        boxd2 = jnp.sum(d * d, axis=-1)          # (T, NB)
        hit = boxd2 <= jnp.float32(prune_radius) ** 2
        hit = hit.reshape(T, n_groups, nbg)
        any_hit = jnp.any(hit, axis=2)
        first = jnp.argmax(hit, axis=2).astype(jnp.int32)
        last = (nbg - 1 - jnp.argmax(hit[:, :, ::-1], axis=2)).astype(jnp.int32)
        lo = jnp.where(any_hit, first, 0)
        nb = jnp.where(any_hit, last - first + 1, 0)

    dummy = (8, 128)
    c_scr = (TQ, L) if with_coords else dummy
    c2_scr = (TQ, L) if (with_coords and depth == 2) else dummy
    b2_scr = (TQ, L) if depth == 2 else dummy
    vals, lanes, cx, cy, cz = pl.pallas_call(
        functools.partial(_knn_kernel, rg=rg, row_mask=row_mask, k=k,
                          n_groups=n_groups, with_coords=with_coords,
                          depth=depth, L=L),
        grid=(T, n_groups),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TQ, 1), lambda i, g: (i, 0)),
            pl.BlockSpec((TQ, 1), lambda i, g: (i, 0)),
            pl.BlockSpec((TQ, 1), lambda i, g: (i, 0)),
            pl.BlockSpec((rg, L), lambda i, g: (g, 0)),
            pl.BlockSpec((rg, L), lambda i, g: (g, 0)),
            pl.BlockSpec((rg, L), lambda i, g: (g, 0)),
        ],
        out_specs=(pl.BlockSpec((TQ, KP), lambda i, g: (i, 0)),) * 5,
        out_shape=(jax.ShapeDtypeStruct((Qp, KP), jnp.int32),
                   jax.ShapeDtypeStruct((Qp, KP), jnp.int32),
                   jax.ShapeDtypeStruct((Qp, KP), jnp.float32),
                   jax.ShapeDtypeStruct((Qp, KP), jnp.float32),
                   jax.ShapeDtypeStruct((Qp, KP), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((TQ, L), jnp.int32),
                        pltpu.VMEM(b2_scr, jnp.int32),
                        pltpu.VMEM(c_scr, jnp.float32),
                        pltpu.VMEM(c_scr, jnp.float32),
                        pltpu.VMEM(c_scr, jnp.float32),
                        pltpu.VMEM(c2_scr, jnp.float32),
                        pltpu.VMEM(c2_scr, jnp.float32),
                        pltpu.VMEM(c2_scr, jnp.float32)],
        interpret=interpret,
    )(jnp.reshape(n_valid, (1,)), lo, nb, qx, qy, qz, px, py, pz)
    vals = vals[:Q, :k]
    lanes = lanes[:Q, :k]

    row = vals & jnp.int32(row_mask)
    idx = jnp.minimum(row * L + lanes, M - 1)
    # SENTINEL survives when a bucket was never scanned (pruned tile) or
    # k exceeds the populated buckets; its distance bits decode to NaN, so
    # mask it explicitly
    missing = vals == SENTINEL
    # distances decode straight from the packed value: the low `row_bits`
    # mantissa bits were traded for the row id, so d2 is floor-truncated by
    # at most 2^-12 relative — far inside every consumer's tolerance (the
    # matcher's metre-scale gates, the LCP leaf/3 threshold). The previous
    # exact recompute gathered (Q*k, 3) map rows from HBM at ~1.2 ms/frame
    # at 64-beam scale (profiled top op, round-4), for sub-mm precision
    # nothing used.
    d2 = jax.lax.bitcast_convert_type(vals & jnp.int32(~row_mask),
                                      jnp.float32)
    d2 = jnp.where(missing | (d2 > 1e17), jnp.inf, d2)
    if with_coords:
        nbr = jnp.stack([cx[:Q, :k], cy[:Q, :k], cz[:Q, :k]], axis=-1)
        nbr = jnp.where(jnp.isfinite(d2)[..., None], nbr, 0.0)
        if inv is not None:
            return d2[inv], idx[inv].astype(jnp.int32), nbr[inv]
        return d2, idx.astype(jnp.int32), nbr
    if inv is not None:
        idx = idx[inv]
        d2 = d2[inv]
    return d2, idx.astype(jnp.int32)
