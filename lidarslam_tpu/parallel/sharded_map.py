"""Map-block sharding: the rolling voxel map distributed over a device mesh.

The reference's `RollingGrid` is one host-RAM hash map (RollingGrid.cxx:
117-442); here the map's fixed-capacity point slots shard over the mesh so
both map memory and the per-frame hot loops scale with device count:

- **Ownership** is by contiguous *leaf-key ranges*: the leaf grid's x axis
  splits into `n_shards` equal slabs and device d owns every leaf whose kx
  falls in slab d. Because `voxel_map.add_points` keeps each shard sorted by
  (kx, kyz), the concatenation of the shards IS the globally key-sorted map
  — block ownership by sorted-key range, exactly the layout the round-1
  design doc promised (docs/PARALLELISM.md level 3).
- **Insert** (`shard_add_points`): the new sweep's keypoints are replicated
  (small); each device masks the subset whose kx lands in its slab and runs
  the normal sort-merge insert on its local slots. Zero communication.
- **Query** (`shard_knn`): each device scans ALL queries against its local
  slab (perfect 1/N work split), then the per-device top-k candidate sets
  `all_gather` over ICI and a final top-k merge yields the exact global
  k-NN. Communication: (n, Q, k) distances + coordinates — tiny next to the
  1/N scan saved.
- **Roll** (`shard_roll`): the window shift rebases every shard locally;
  points whose new kx crosses a slab boundary migrate to the neighbor
  device over `ppermute` rings (one hop per slab crossed). By default the
  hop count is data-adaptive (a `lax.while_loop` runs until no emigrant
  remains — exact for any roll magnitude); an explicit `max_hops` unrolls
  a fixed count and drops the leftovers into `overflow`
  (bounded-latency mode). Migrants carry their full attributes (count,
  fixed flag, stamp) — a roll must not reset the moving-object filter.

All functions are designed to run INSIDE `shard_map` with the local
`VoxelMap` shard (leading dim = capacity / n_shards); they compose with the
keypoint-sharded matcher/solver of `parallel/sharded.py` on the same mesh
axis (pipeline `shard_maps` mode).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from lidarslam_tpu.config import MapConfig
from lidarslam_tpu.ops import voxel_map
from lidarslam_tpu.ops.voxel_map import SubmapView, VoxelMap, _BIGKEY, _leaf_keys

AXIS = "kp"  # shared mesh axis with parallel/sharded.py


def n_leaves(cfg: MapConfig) -> int:
    """Leaf-grid extent per axis (static, matches _leaf_keys)."""
    half = voxel_map.half_extent(cfg)
    return int(math.ceil(2.0 * half / cfg.leaf_size)) + 1


def slab_width(cfg: MapConfig, n_shards: int) -> int:
    return -(-n_leaves(cfg) // n_shards)  # ceil div


def local_kx_range(cfg: MapConfig, axis_name, n_shards: int):
    """[lo, hi) leaf-x ownership range of this device (traced)."""
    w = slab_width(cfg, n_shards)
    d = jax.lax.axis_index(axis_name)
    lo = d * w
    return lo, lo + w


def owner_of(kx, cfg: MapConfig, n_shards: int):
    """Owning device of each leaf-x index (n_shards-1 clamps the tail slab)."""
    w = slab_width(cfg, n_shards)
    return jnp.clip(kx // w, 0, n_shards - 1)


def shard_add_points(local: VoxelMap, new_xyz, new_intensity, new_time,
                     new_valid, current_time, cfg: MapConfig, fixed: bool,
                     axis_name, n_shards: int) -> VoxelMap:
    """RollingGrid::Add over the sharded map: mask the (replicated) batch to
    this device's slab, then the normal local sort-merge insert."""
    kx, _, inb = _leaf_keys(new_xyz, new_valid, cfg)
    lo, hi = local_kx_range(cfg, axis_name, n_shards)
    mine = inb & (kx >= lo) & (kx < hi)
    return voxel_map.add_points(local, new_xyz, new_intensity, new_time,
                                mine, current_time, cfg, fixed=fixed)


def shard_knn(view: SubmapView, queries, k: int, axis_name):
    """Exact global k-NN over the sharded map.

    Each device scans its local slab for all Q queries; the per-device
    winners (distance, position, ring) all_gather and a final k-way top-k
    merges them. Returns (d2 (Q, k) ascending with +inf for missing,
    nbr_xyz (Q, k, 3), nbr_ring (Q, k)) — coordinates travel with the
    distances so no cross-device row gather is ever needed."""
    # neighbor coords come straight from the k-NN (in-kernel on TPU — no
    # post-hoc xyz gather), already zeroed where missing
    d2, rows, nbr = voxel_map.brute_knn(view, queries, k, with_coords=True)
    ring = view.ring[rows]                                # (Q, k)

    all_d2 = jax.lax.all_gather(d2, axis_name)            # (n, Q, k)
    all_nbr = jax.lax.all_gather(nbr, axis_name)          # (n, Q, k, 3)
    all_ring = jax.lax.all_gather(ring, axis_name)        # (n, Q, k)
    n = all_d2.shape[0]
    Q = d2.shape[0]
    flat_d2 = jnp.moveaxis(all_d2, 0, 1).reshape(Q, n * k)
    flat_nbr = jnp.moveaxis(all_nbr, 0, 1).reshape(Q, n * k, 3)
    flat_ring = jnp.moveaxis(all_ring, 0, 1).reshape(Q, n * k)
    neg, sel = jax.lax.top_k(-flat_d2, k)
    return (-neg, jnp.take_along_axis(flat_nbr, sel[..., None], axis=1),
            jnp.take_along_axis(flat_ring, sel, axis=1))


def _compact_merge(local: VoxelMap, imm: VoxelMap, cfg: MapConfig) -> VoxelMap:
    """Merge immigrant points into the local shard, preserving every
    attribute (no count bump / stamp touch — migration is not observation).
    Keys cannot collide across shards (a leaf lives on exactly one device),
    so this is a sort-compaction; a collision would keep the resident."""
    M = local.xyz.shape[0]
    xyz = jnp.concatenate([local.xyz, imm.xyz])
    inten = jnp.concatenate([local.intensity, imm.intensity])
    tim = jnp.concatenate([local.time, imm.time])
    cnt = jnp.concatenate([local.count, imm.count])
    fix = jnp.concatenate([local.fixed, imm.fixed])
    val = jnp.concatenate([local.valid, imm.valid])
    prio = jnp.concatenate([jnp.zeros(M, jnp.int32),
                            jnp.ones(imm.xyz.shape[0], jnp.int32)])

    kx, kyz, _ = _leaf_keys(xyz, val, cfg)
    row = jnp.arange(xyz.shape[0], dtype=jnp.int32)
    skx, skyz, _, srow = jax.lax.sort((kx, kyz, prio, row), num_keys=4)
    key_ok = skx != _BIGKEY
    first = key_ok & ~((skx == jnp.roll(skx, 1)) & (skyz == jnp.roll(skyz, 1)))
    first = first.at[0].set(key_ok[0])
    not_winner = (~first).astype(jnp.int32)
    _, crow = jax.lax.sort((not_winner, row), num_keys=1, is_stable=True)
    crow = crow[:M]
    take = srow[crow]
    dropped = jnp.maximum(jnp.sum(first, dtype=jnp.int32) - M, 0)
    return VoxelMap(
        xyz=xyz[take], intensity=inten[take], time=tim[take], count=cnt[take],
        fixed=fix[take], valid=first[crow],
        overflow=local.overflow + imm.overflow + dropped)


def _empty_like(local: VoxelMap) -> VoxelMap:
    return VoxelMap(
        xyz=jnp.zeros_like(local.xyz), intensity=jnp.zeros_like(local.intensity),
        time=jnp.zeros_like(local.time), count=jnp.zeros_like(local.count),
        fixed=jnp.zeros_like(local.fixed), valid=jnp.zeros_like(local.valid),
        overflow=jnp.zeros((), jnp.int32))


def shard_roll(local: VoxelMap, vox_offset, cfg: MapConfig, axis_name,
               n_shards: int, max_hops=None) -> VoxelMap:
    """RollingGrid::Roll over the sharded map: rebase locally, then migrate
    boundary-crossing points over ppermute rings (one hop moves emigrants
    one slab over; passing-through points keep travelling on later hops).

    `max_hops=None` (default): data-adaptive — hops repeat under a
    `lax.while_loop` until no device holds an emigrant (each hop moves
    every emigrant monotonically toward its owner, so <= n_shards - 1
    iterations always suffice), making ANY roll magnitude exact. Rolls are
    re-centerings of the window on the keypoint bbox, whose midpoint moves
    with view content, not just sensor motion — multi-voxel rolls are
    normal, not teleports (a fixed 2-hop unroll dropped 216 points on the
    first roll of the tight-window dryrun). The loop costs one key scan +
    psum when nothing migrates. An explicit int `max_hops` unrolls exactly
    that many hops and drops the leftovers into `overflow`
    (bounded-latency mode)."""
    local = voxel_map.roll_by_offset(local, vox_offset, cfg)
    perm_up = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    perm_dn = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    def emigrants(local):
        kx, _, _ = _leaf_keys(local.xyz, local.valid, cfg)
        lo, hi = local_kx_range(cfg, axis_name, n_shards)
        return local.valid & (kx < lo), local.valid & (kx >= hi)

    def hop(local):
        out_lo, out_hi = emigrants(local)
        local = local._replace(valid=local.valid & ~out_lo & ~out_hi)
        for mask, perm in ((out_lo, perm_dn), (out_hi, perm_up)):
            em = local._replace(valid=mask, overflow=jnp.zeros((), jnp.int32))
            im = jax.tree.map(lambda a: jax.lax.ppermute(a, axis_name, perm), em)
            # ring wrap-around (slab 0 -> n-1 or back) can only carry
            # out-of-window garbage; _leaf_keys re-checks the window so a
            # wrapped point that is genuinely outside every slab is invalid
            local = _compact_merge(local, im, cfg)
        return local

    def n_stray(local):
        lo_m, hi_m = emigrants(local)
        return jax.lax.psum(jnp.sum(lo_m | hi_m, dtype=jnp.int32), axis_name)

    if max_hops is None:
        # the psum lives in the BODY (carried into cond as a plain scalar:
        # collectives inside while_loop conds are backend-fragile)
        def body(st):
            local, _, it = st
            local = hop(local)
            return local, n_stray(local), it + 1

        local, _, _ = jax.lax.while_loop(
            lambda st: (st[1] > 0) & (st[2] < n_shards),
            body, (local, n_stray(local), jnp.zeros((), jnp.int32)))
        return local

    for _ in range(max_hops):
        local = hop(local)
    # anything still out of range after max_hops is dropped, counted
    lo_m, hi_m = emigrants(local)
    stray = lo_m | hi_m
    return local._replace(
        valid=local.valid & ~stray,
        overflow=local.overflow + jnp.sum(stray, dtype=jnp.int32))


# ----------------------------------------------------------------------
# Global-level API: jit(shard_map(...)) wrappers over the local ops.
#
# The map travels as ONE global VoxelMap whose slot arrays shard over the
# mesh (spec `map_spec()`); `overflow` is kept replicated as the psum'd
# global total. These are the standalone entry points (tests, tools); the
# fused pipeline calls the local functions directly inside its own
# shard_map (pipeline shard_maps mode).
# ----------------------------------------------------------------------


def map_spec() -> VoxelMap:
    """PartitionSpec tree of a mesh-sharded VoxelMap."""
    return VoxelMap(xyz=P(AXIS), intensity=P(AXIS), time=P(AXIS),
                    count=P(AXIS), fixed=P(AXIS), valid=P(AXIS), overflow=P())


def reshard_host(m: VoxelMap, cfg: MapConfig, n_shards: int) -> VoxelMap:
    """Repack a host-built (globally key-sorted) map into slab layout: shard
    d's capacity/n segment holds exactly its owned keys, sorted. Used when
    maps enter a shard-maps Slam from outside the sharded pipeline (PCD
    load, PGO rebuild, checkpoint restore). Idempotent; per-slab capacity
    overruns are dropped into `overflow`."""
    import numpy as np

    arrs = jax.tree.map(np.asarray, m)
    M = arrs.xyz.shape[0]
    cap = M // n_shards
    kx, kyz, _ = (np.asarray(a) for a in
                  _leaf_keys(jnp.asarray(arrs.xyz), jnp.asarray(arrs.valid), cfg))
    w = slab_width(cfg, n_shards)
    owner = np.clip(kx // w, 0, n_shards - 1)

    out = {f: np.zeros_like(getattr(arrs, f)) for f in
           ("xyz", "intensity", "time", "count", "fixed", "valid")}
    dropped = 0
    for d in range(n_shards):
        rows = np.nonzero(arrs.valid & (owner == d) & (kx != _BIGKEY))[0]
        rows = rows[np.lexsort((kyz[rows], kx[rows]))]
        if len(rows) > cap:
            dropped += len(rows) - cap
            rows = rows[:cap]
        seg = slice(d * cap, d * cap + len(rows))
        for f in out:
            out[f][seg] = getattr(arrs, f)[rows]
        out["valid"][seg] = True
    return VoxelMap(
        xyz=jnp.asarray(out["xyz"]), intensity=jnp.asarray(out["intensity"]),
        time=jnp.asarray(out["time"]), count=jnp.asarray(out["count"]),
        fixed=jnp.asarray(out["fixed"]), valid=jnp.asarray(out["valid"]),
        overflow=jnp.asarray(int(arrs.overflow) + dropped, jnp.int32))


def _with_global_overflow(fn):
    """Run a local-map op with per-shard overflow, returning the psum'd
    total on top of the prior (replicated) counter."""
    def wrapped(local, *args):
        prior = local.overflow
        out = fn(local._replace(overflow=jnp.zeros((), jnp.int32)), *args)
        return out._replace(overflow=prior + jax.lax.psum(out.overflow, AXIS))
    return wrapped


@partial(jax.jit, static_argnames=("mesh", "cfg", "fixed"))
def add_points_sharded(mesh, gmap: VoxelMap, new_xyz, new_intensity, new_time,
                       new_valid, current_time, cfg: MapConfig,
                       fixed: bool = False) -> VoxelMap:
    """RollingGrid::Add on the mesh-sharded map (replicated point batch)."""
    n = mesh.devices.size

    @_with_global_overflow
    def body(local, x, i, t, v, ct):
        return shard_add_points(local, x, i, t, v, ct, cfg, fixed, AXIS, n)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(map_spec(), P(), P(), P(), P(), P()),
                   out_specs=map_spec(), check_vma=False)
    return fn(gmap, new_xyz, new_intensity, new_time, new_valid,
              jnp.asarray(current_time, jnp.float32))


@partial(jax.jit, static_argnames=("mesh", "cfg", "max_hops"))
def roll_sharded(mesh, gmap: VoxelMap, vox_offset, cfg: MapConfig,
                 max_hops=None) -> VoxelMap:
    """RollingGrid::Roll on the mesh-sharded map with ppermute migration."""
    n = mesh.devices.size

    @_with_global_overflow
    def body(local, off):
        return shard_roll(local, off, cfg, AXIS, n, max_hops=max_hops)

    fn = shard_map(body, mesh=mesh, in_specs=(map_spec(), P()),
                   out_specs=map_spec(), check_vma=False)
    return fn(gmap, jnp.asarray(vox_offset, jnp.int32))


@partial(jax.jit, static_argnames=("mesh", "cfg", "k"))
def knn_sharded(mesh, gmap: VoxelMap, queries, k: int, cfg: MapConfig):
    """Exact global k-NN against the sharded map (replicated queries).

    Returns (d2 (Q, k), nbr_xyz (Q, k, 3), nbr_ring (Q, k)) replicated."""
    def body(local, q):
        view = SubmapView(xyz=local.xyz,
                          ring=jnp.zeros(local.xyz.shape[0], jnp.int32),
                          valid=local.valid)
        return shard_knn(view, q, k, AXIS)

    fn = shard_map(body, mesh=mesh, in_specs=(map_spec(), P()),
                   out_specs=(P(), P(), P()), check_vma=False)
    return fn(gmap, queries)
