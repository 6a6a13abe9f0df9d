"""The fused per-sweep pipeline: one jitted device call per frame.

This is the TPU-first shape of `Slam::AddFrames` (Slam.cxx:230-344): keypoint
extraction, optional scan-to-scan ego-motion ICP, scan-to-map localization
ICP (with undistortion and sensor constraints), LCP overlap, the keyframe
gate, and the rolling-map update all compile into a single XLA program. The
host passes a handful of scalars/poses in and pulls a handful out — one
dispatch and one sync per sweep, which is what keeps per-frame latency flat
when the device sits behind a high-latency link, and lets XLA overlap every
stage. Map buffers are donated by the caller so updates are in-place.

Cross-frame device state (maps + previous keypoints for ego-motion
registration) stays resident; the float64 world bookkeeping stays on the
host (slam.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from lidarslam_tpu import confidence as confidence_mod
from lidarslam_tpu.config import EgoMotionMode, Keypoint, SlamConfig, UndistortionMode
from lidarslam_tpu.core import se3
from lidarslam_tpu.ops import extractor, icp, solver, undistortion, voxel_map
from lidarslam_tpu.ops import frame as frame_mod
from lidarslam_tpu.ops.frame import Keypoints, RangeImage, ensure_range_image


class SubmapCache(NamedTuple):
    """Lazily rebuilt submap selection, the TPU analog of the reference's
    kd-tree validity discipline (Slam.cxx:1008-1035: BuildSubMapKdTree runs
    only when the map update invalidated it). `selected` is the submap mask
    over map slots; `planes` is the Pallas k-NN map prep
    (pallas_knn.MapPlanes) or None off the Pallas path. Rebuilt under
    lax.cond when `cache_stale`, i.e. on the first frame after a keyframe."""

    selected: jax.Array   # (M,) bool
    planes: object        # pallas_knn.MapPlanes or None (static per process)


class FrameInputs(NamedTuple):
    """Per-frame traced scalars/poses (MAP-frame where positional)."""

    trel_prior: jax.Array      # (6,) extrapolated ego-motion prior
    prev_pose: jax.Array       # (6,) previous world pose, MAP frame
    t_prev: jax.Array          # () previous frame stamp
    stamp: jax.Array           # () current frame stamp
    az_resolution: jax.Array   # () extractor azimuthal resolution [rad]
    kf_last_pose: jax.Array    # (6,) last keyframe pose, MAP frame
    kf_counter: jax.Array      # () int32
    extras: tuple = ()         # sensor residual blocks (structure is static)
    # traced map-update switch: SlamCommand DISABLE/ENABLE_SLAM_MAP_UPDATE
    # (LidarSlamNode.cxx:285-301) flips this live with zero recompilation —
    # it is a data input, not part of the static config
    map_update: jax.Array = True  # () bool
    # per-type SubmapCache (None = caching disabled for that type: sharded
    # runs, per-frame decay, or no cache state threaded by the caller)
    submap_cache: tuple = (None, None, None)
    cache_stale: jax.Array = True  # () bool — map changed since last rebuild


class FrameResult(NamedTuple):
    maps: tuple                # updated VoxelMap per type (None when unused)
    keypoints: tuple           # raw Keypoints per type (device-resident)
    pose: jax.Array            # (6,) optimized world pose, MAP frame
    trel: jax.Array            # (6,) refined ego-motion estimate
    failed: jax.Array          # () bool
    total_matches: jax.Array   # () int32
    match_counts: jax.Array    # (3,) int32
    covariance: jax.Array      # (6, 6)
    position_error: jax.Array  # () [m]
    orientation_error: jax.Array  # () [deg]
    roll_offset: jax.Array     # (3,) int32 — shared window shift applied
    is_keyframe: jax.Array     # () bool
    overlap: jax.Array         # () float (-1 when disabled)
    warp: object               # final WarpParams or None
    statuses: tuple            # (Q,) uint8 per used type
    weights: tuple             # (Q,) f32 per used type
    packed: jax.Array = None   # (64,) f32 — all host-bound scalars in one
                               # transfer (pose, trel, counts, flags, cov,
                               # roll, map overflow); the per-frame sync
                               # fetches only this
    submap_cache: tuple = (None, None, None)  # per-type SubmapCache out
    cache_stale: jax.Array = True             # () bool for the next frame

PACKED_LEN = 64


def pack_scalars(pose, trel, failed, total, counts, cov, roll_offset, is_kf,
                 overlap, map_overflow, kp_counts):
    return jnp.concatenate([
        pose, trel, counts.astype(jnp.float32),
        jnp.stack([failed.astype(jnp.float32), total.astype(jnp.float32),
                   is_kf.astype(jnp.float32), overlap]),
        cov.ravel(), roll_offset.astype(jnp.float32),
        map_overflow.astype(jnp.float32), kp_counts.astype(jnp.float32)])


def unpack_scalars(packed):
    """numpy (64,) -> dict mirroring pack_scalars."""
    import numpy as np
    return {
        "pose": np.asarray(packed[0:6], np.float64),
        "trel": np.asarray(packed[6:12], np.float64),
        "counts": packed[12:15].astype(np.int64),
        "failed": bool(packed[15] > 0.5),
        "total": int(packed[16]),
        "is_kf": bool(packed[17] > 0.5),
        "overlap": float(packed[18]),
        "cov": np.asarray(packed[19:55], np.float64).reshape(6, 6),
        "roll_offset": packed[55:58].astype(np.int64),
        "map_overflow": packed[58:61].astype(np.int64),
        "kp_counts": packed[61:64].astype(np.int64),
    }


def _loc_k(cfg: SlamConfig, ti: int) -> int:
    p = cfg.loc_matching
    return (p.edge_nb_neighbors, p.plane_nb_neighbors, p.blob_nb_neighbors)[ti]


def init_submap_cache(cfg: SlamConfig, map_cfgs, sharded: bool = False):
    """Empty per-type SubmapCache tuple with the exact traced structure the
    pipeline produces (stale=True forces a rebuild on first use). `sharded`
    runs get no cache (the slab path recomputes per frame)."""
    caches = [None, None, None]
    if sharded:
        return tuple(caches)
    for t in cfg.used_types:
        ti = int(t)
        mc = map_cfgs[ti]
        if mc.decaying_threshold > 0:   # per-frame decay => per-frame submap
            continue
        M = mc.capacity
        sel = jnp.zeros((M,), bool)
        planes = None
        if voxel_map._pallas_eligible(M, _loc_k(cfg, ti), 0.99, None):
            from lidarslam_tpu.ops import pallas_knn

            planes = pallas_knn.prepare_map(jnp.zeros((M, 3), jnp.float32), sel)
        caches[ti] = SubmapCache(selected=sel, planes=planes)
    return tuple(caches)


def _shard_slice(arr, axis_name, n_shards):
    """This device's contiguous chunk of a keypoint-capacity array."""
    if arr is None:
        return None
    chunk = arr.shape[0] // n_shards
    start = jax.lax.axis_index(axis_name) * chunk
    return jax.lax.dynamic_slice_in_dim(arr, start, chunk, axis=0)


def extract_sharded(ri: RangeImage, az_res, cfg: SlamConfig, axis_name,
                    n_shards: int):
    """Ring-sharded keypoint extraction: every extraction stage is
    per-ring independent (masked stencils along the firing axis, per-ring
    NMS — SURVEY §2.2 P1-P4), so each device extracts its contiguous
    R/n-ring slice of the (replicated) range image with a K/n keypoint
    budget, and the per-type sets all_gather + compact back to the full
    capacity. This removes the replicated-extraction term from the SPMD
    Amdahl ceiling (docs/PARALLELISM.md 'level 3'). Per-shard K/n budgets
    change WHICH keypoints survive only at capacity saturation (the
    even-spread compaction then runs per slice instead of globally)."""
    import dataclasses

    ecfg = cfg.extractor
    R = ecfg.n_rings
    caps = tuple(ecfg.kp_capacity(i) for i in range(3))
    if R % n_shards or any(K % n_shards for K in caps):
        raise ValueError(
            f"shard_extraction needs n_rings ({R}) and every keypoint "
            f"capacity ({caps}) divisible by the mesh size ({n_shards})")
    rows = R // n_shards
    start = jax.lax.axis_index(axis_name) * rows

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, start, rows, axis=0)

    ri_s = RangeImage(xyz=sl(ri.xyz), intensity=sl(ri.intensity),
                      time=sl(ri.time), valid=sl(ri.valid))
    ecfg_s = dataclasses.replace(
        ecfg, n_rings=rows, max_keypoints=ecfg.max_keypoints // n_shards,
        max_edge_keypoints=ecfg.max_edge_keypoints // n_shards,
        max_plane_keypoints=ecfg.max_plane_keypoints // n_shards,
        max_blob_keypoints=ecfg.max_blob_keypoints // n_shards)
    ext = extractor.extract_keypoints(ri_s, az_res, ecfg_s)
    out = []
    for K, kp in zip(caps, (ext.edges, ext.planes, ext.blobs)):
        kp = kp._replace(ring=jnp.where(kp.valid, kp.ring + start, kp.ring))
        g = jax.tree.map(lambda a: jax.lax.all_gather(a, axis_name), kp)
        flat = Keypoints(
            xyz=g.xyz.reshape(K, 3), intensity=g.intensity.reshape(K),
            time=g.time.reshape(K), ring=g.ring.reshape(K),
            valid=g.valid.reshape(K), count=jnp.sum(g.count))
        # compact valid-first so downstream capacity slices stay dense
        out.append(frame_mod.merge_keypoints([flat], K))
    return tuple(out)


def process_frame(
    ri: RangeImage,
    maps: tuple,               # VoxelMap per type (None when unused) — donated
    prev_keypoints: tuple,     # Keypoints per type from the previous sweep (or None)
    inp: FrameInputs,
    cfg: SlamConfig,
    map_cfgs: tuple,           # MapConfig per type (window-resolution snapped)
    first_frame: bool,
    axis_name=None,
    n_shards: int = 1,
    shard_maps: bool = False,
    shard_extraction: bool = False,
) -> FrameResult:
    """Full per-sweep step. `cfg`, `map_cfgs`, `first_frame` are static.

    With `axis_name`/`n_shards` (inside `shard_map` over an SPMD mesh axis),
    the matcher+solver — the per-frame hot path — runs on this device's
    keypoint shard only and the 6x6 normal equations are psum-reduced over
    ICI each LM evaluation, so every chip steps an identical pose
    (parallel/sharded.py). `shard_extraction` additionally splits the
    extractor over rings (see extract_sharded)."""
    ri = ensure_range_image(ri)
    if shard_extraction and axis_name is not None:
        kps = extract_sharded(ri, inp.az_resolution, cfg, axis_name, n_shards)
    else:
        ext = extractor.extract_keypoints(ri, inp.az_resolution, cfg.extractor)
        kps = (ext.edges, ext.planes, ext.blobs)
    return process_keypoints(kps, ri, maps, prev_keypoints, inp, cfg, map_cfgs,
                             first_frame, axis_name=axis_name, n_shards=n_shards,
                             shard_maps=shard_maps)


def process_keypoints(
    kps: tuple,                # pre-extracted Keypoints per type (multi-LiDAR merge)
    ri: Optional[RangeImage],  # optional full sweep for overlap sampling
    maps: tuple,
    prev_keypoints: tuple,
    inp: FrameInputs,
    cfg: SlamConfig,
    map_cfgs: tuple,
    first_frame: bool,
    axis_name=None,
    n_shards: int = 1,
    shard_maps: bool = False,
) -> FrameResult:
    """Per-sweep step starting from already-extracted keypoints. Used
    directly for multi-LiDAR rigs where each device's sweep is extracted
    with its own extractor and the keypoint sets are merged in BASE frame
    (Slam::ExtractKeypoints + AggregateFrames semantics).

    Sharded mode (`axis_name` set): extraction / map bookkeeping are
    replicated (cheap, zero-communication), the matcher+solver run on this
    device's 1/n keypoint slice, counts + normal equations psum-reduce, and
    the per-keypoint debug outputs all_gather back so the result is fully
    replicated — bitwise-stable pose stepping on every chip.

    With `shard_maps` additionally set, `maps` are this device's slabs of
    mesh-sharded rolling maps (parallel/sharded_map.py): the matcher k-NN
    becomes a scan of the local slab + a top-k merge over ICI, inserts mask
    to the local slab, and rolls migrate boundary-crossers over ppermute —
    map memory and the map-side hot loops both scale 1/n."""
    types = cfg.used_types
    if shard_maps and axis_name is None:
        raise ValueError("shard_maps requires axis_name (run under shard_map)")
    # static per-call index geometry for the matcher's k-NN (ops/matcher._knn)
    geoms = (("map_shard", axis_name),) * 3 if shard_maps else (None, None, None)
    if axis_name is not None:
        for t in types:
            if kps[int(t)].xyz.shape[0] % n_shards:
                raise ValueError(
                    f"extractor.max_keypoints ({kps[int(t)].xyz.shape[0]}) must "
                    f"be divisible by the mesh size ({n_shards})")

    # ---------------- ego-motion registration (optional) ----------------
    trel = inp.trel_prior
    if cfg.ego_motion_mode in (EgoMotionMode.REGISTRATION,
                               EgoMotionMode.MOTION_EXTRAPOLATION_AND_REGISTRATION) \
            and prev_keypoints is not None and not first_frame:
        ego_types = tuple(t for t in (Keypoint.EDGE, Keypoint.PLANE)
                          if cfg.use_keypoints(t))
        e_xyz = [None, None, None]
        e_val = [None, None, None]
        e_idx = [None, None, None]
        for t in ego_types:
            ti = int(t)
            pk = prev_keypoints[ti]
            e_xyz[ti] = kps[ti].xyz
            e_val[ti] = kps[ti].valid
            if axis_name is not None:
                e_xyz[ti] = _shard_slice(e_xyz[ti], axis_name, n_shards)
                e_val[ti] = _shard_slice(e_val[ti], axis_name, n_shards)
            e_idx[ti] = voxel_map.SubmapView(xyz=pk.xyz, ring=pk.ring,
                                             valid=pk.valid)
        ego = icp.icp_register(
            icp.ICPInputs(kp_xyz=tuple(e_xyz), kp_valid=tuple(e_val),
                          index=tuple(e_idx)),
            types=ego_types, pose0=trel, params=cfg.ego_matching,
            solver_cfg=cfg.solver, icp_iters=cfg.ego_motion_icp_max_iter,
            lm_max_iter=cfg.ego_motion_lm_max_iter,
            min_matches=cfg.min_nb_matched_keypoints,
            geoms=(None, None, None),  # scan-to-scan: prev kps are replicated
            axis_name=axis_name)
        trel = jnp.where(ego.failed, trel, ego.pose)

    loc_prior = se3.jcompose_pose(inp.prev_pose, trel)

    # ---------------- localization ----------------
    if first_frame:
        pose = loc_prior
        failed = jnp.zeros((), bool)
        total = jnp.zeros((), jnp.int32)
        counts = jnp.zeros((3,), jnp.int32)
        cov = jnp.zeros((6, 6))
        pos_err = jnp.zeros(())
        ori_err = jnp.zeros(())
        warp = None
        statuses = tuple(jnp.zeros(kps[int(t)].xyz.shape[0], jnp.uint8) for t in types)
        wts = tuple(jnp.zeros(kps[int(t)].xyz.shape[0], jnp.float32) for t in types)
        indices = None
        new_cache = list(inp.submap_cache)
    else:
        kp_xyz = [None, None, None]
        kp_valid = [None, None, None]
        kp_time = [None, None, None]
        index = [None, None, None]
        prepared = [None, None, None]
        new_cache = list(inp.submap_cache)
        for t in types:
            ti = int(t)
            mc = map_cfgs[ti]
            m = maps[ti]
            if mc.decaying_threshold > 0:
                m = voxel_map.clear_old_points(m, inp.stamp, mc)
                maps = _set(maps, ti, m)
            kp = kps[ti]
            kp_xyz[ti] = kp.xyz
            kp_valid[ti] = kp.valid
            kp_time[ti] = kp.time
            if axis_name is not None:
                kp_xyz[ti] = _shard_slice(kp.xyz, axis_name, n_shards)
                kp_valid[ti] = _shard_slice(kp.valid, axis_name, n_shards)
                kp_time[ti] = _shard_slice(kp.time, axis_name, n_shards)
            world = se3.japply_pose(loc_prior, kp.xyz)
            big = jnp.float32(3e38)
            bbox_min = jnp.min(jnp.where(kp.valid[:, None], world, big), axis=0)
            bbox_max = jnp.max(jnp.where(kp.valid[:, None], world, -big), axis=0)
            if inp.submap_cache[ti] is not None and axis_name is None:
                # reference kd-tree validity discipline (Slam.cxx:1008-1035):
                # rebuild the submap selection + Pallas map prep only on the
                # first frame after a map update; reuse the carried cache
                # otherwise (the map is unchanged between keyframes)
                def rebuild(m=m, kp=kp, bmin=bbox_min, bmax=bbox_max,
                            mc=mc, ti=ti):
                    view = voxel_map.extract_submap_view(
                        m, bmin, bmax, (kp.count // 2).astype(jnp.int32), mc)
                    planes = voxel_map.prepare_knn_index(view, _loc_k(cfg, ti))
                    return SubmapCache(selected=view.valid, planes=planes)

                cache = jax.lax.cond(inp.cache_stale, rebuild,
                                     lambda ti=ti: inp.submap_cache[ti])
                new_cache[ti] = cache
                index[ti] = voxel_map.SubmapView(
                    xyz=m.xyz, ring=jnp.zeros(m.xyz.shape[0], jnp.int32),
                    valid=cache.selected)
                prepared[ti] = cache.planes
            else:
                index[ti] = voxel_map.extract_submap_view(
                    m, bbox_min, bbox_max, (kp.count // 2).astype(jnp.int32), mc,
                    axis_name=axis_name if shard_maps else None)
        indices = index

        undist_kwargs = {}
        if cfg.undistortion != UndistortionMode.NONE:
            tmin = jnp.float32(3e38)
            tmax = jnp.float32(-3e38)
            for t in types:
                kp = kps[int(t)]
                tmin = jnp.minimum(tmin, jnp.min(jnp.where(kp.valid, kp.time, 3e38)))
                tmax = jnp.maximum(tmax, jnp.max(jnp.where(kp.valid, kp.time, -3e38)))
            undist_kwargs = dict(
                undistort_mode=cfg.undistortion, prev_pose=inp.prev_pose,
                t_prev=inp.t_prev, t_cur=inp.stamp, time_range=(tmin, tmax),
                max_extrapolation_ratio=cfg.max_extrapolation_ratio)

        res = icp.icp_register(
            icp.ICPInputs(kp_xyz=tuple(kp_xyz), kp_valid=tuple(kp_valid),
                          index=tuple(index), kp_time=tuple(kp_time)),
            types=types, pose0=loc_prior, params=cfg.loc_matching,
            solver_cfg=cfg.solver, icp_iters=cfg.localization_icp_max_iter,
            lm_max_iter=cfg.localization_lm_max_iter,
            min_matches=cfg.min_nb_matched_keypoints, geoms=geoms,
            extras=inp.extras, axis_name=axis_name, prepared=tuple(prepared),
            **undist_kwargs)

        failed = res.failed
        pose = jnp.where(failed, inp.prev_pose, res.pose)  # rollback (Slam.cxx:1098-1107)
        total = res.total_matches
        counts = res.match_counts
        err = solver.registration_error(res.H)
        cov = jnp.where(failed, jnp.zeros((6, 6)), err.covariance)
        pos_err = err.position_error
        ori_err = err.orientation_error
        warp = res.warp
        statuses = res.statuses
        wts = res.weights
        if axis_name is not None:
            # reassemble the per-keypoint debug surface so every output of
            # the sharded step is replicated (out_specs stay uniform)
            statuses = tuple(jax.lax.all_gather(s, axis_name, tiled=True)
                             for s in statuses)
            wts = tuple(jax.lax.all_gather(w, axis_name, tiled=True)
                        for w in wts)
        trel = jnp.where(failed, jnp.zeros(6),
                         _relative_pose(inp.prev_pose, pose))

    # ---------------- overlap (optional, static) ----------------
    overlap = jnp.full((), -1.0)
    if cfg.confidence.overlap_sampling_ratio > 0 and not first_frame and ri is not None:
        overlap = _overlap(ri, pose, indices, cfg, map_cfgs, warp,
                           axis_name=axis_name if shard_maps else None,
                           prepared=prepared)

    # ---------------- keyframe gate + map update ----------------
    kf_motion = _relative_pose(inp.kf_last_pose, pose)
    trans = jnp.linalg.norm(kf_motion[:3])
    R_m, _ = se3.jpose_to_rt(kf_motion)
    rot = jnp.arccos(jnp.clip((jnp.trace(R_m) - 1.0) / 2.0, -1.0, 1.0))
    coef = jnp.minimum(inp.kf_counter.astype(jnp.float32) / 10.0, 1.0)
    n_map_pts = sum(maps[int(t)].n_points for t in types)
    if shard_maps:
        n_map_pts = jax.lax.psum(n_map_pts, axis_name)
    is_kf = ((n_map_pts < cfg.min_nb_matched_keypoints * 10)
             | (trans >= coef * cfg.kf_distance_threshold)
             | (rot >= jnp.deg2rad(coef * cfg.kf_angle_threshold)))
    do_update = is_kf & ~failed & jnp.asarray(inp.map_update)

    # union world bbox of keypoints -> one shared roll offset
    world_kp = [None, None, None]
    bbox_min = jnp.full((3,), 3e38)
    bbox_max = jnp.full((3,), -3e38)
    for t in types:
        ti = int(t)
        kp = kps[ti]
        base = kp.xyz
        if warp is not None:
            base = undistortion.warp_points(base, kp.time, warp)
        w = se3.japply_pose(pose, base)
        world_kp[ti] = w
        bbox_min = jnp.minimum(bbox_min, jnp.min(
            jnp.where(kp.valid[:, None], w, 3e38), axis=0))
        bbox_max = jnp.maximum(bbox_max, jnp.max(
            jnp.where(kp.valid[:, None], w, -3e38), axis=0))

    shared_cfg = map_cfgs[int(types[0])]
    res_m = voxel_map.effective_resolution(shared_cfg)
    offset = voxel_map.compute_roll_offset(bbox_min, bbox_max, shared_cfg)
    offset = jnp.where(do_update, offset, jnp.zeros(3, jnp.int32))

    def update_map(ti):
        kp = kps[ti]
        shifted = world_kp[ti] - offset.astype(jnp.float32) * res_m
        if shard_maps:
            from lidarslam_tpu.parallel import sharded_map

            # keep map.overflow as the replicated global total: accumulate
            # the per-shard deltas of this frame's roll+insert via psum
            m = maps[ti]
            prior = m.overflow
            m = m._replace(overflow=jnp.zeros((), jnp.int32))
            # adaptive migration (max_hops=None): rolls re-center the
            # window on the keypoint bbox, so multi-voxel offsets are
            # normal — the while_loop hops exactly as many times as the
            # farthest migrant needs and costs one key scan + psum when
            # nothing migrates (a fixed 2-hop unroll dropped points on
            # ordinary re-centerings)
            m = sharded_map.shard_roll(m, offset, map_cfgs[ti], axis_name,
                                       n_shards)
            m = sharded_map.shard_add_points(m, shifted, kp.intensity, kp.time,
                                             kp.valid, inp.stamp, map_cfgs[ti],
                                             False, axis_name, n_shards)
            return m._replace(
                overflow=prior + jax.lax.psum(m.overflow, axis_name))
        m = voxel_map.roll_by_offset(maps[ti], offset, map_cfgs[ti])
        return voxel_map.add_points(m, shifted, kp.intensity, kp.time, kp.valid,
                                    inp.stamp, map_cfgs[ti], fixed=False)

    new_maps = [None, None, None]
    for t in types:
        ti = int(t)
        new_maps[ti] = jax.lax.cond(do_update,
                                    lambda ti=ti: update_map(ti),
                                    lambda ti=ti: maps[ti])

    map_overflow = jnp.stack(
        [new_maps[i].overflow if new_maps[i] is not None
         else jnp.zeros((), jnp.int32) for i in range(3)])
    return FrameResult(
        maps=tuple(new_maps), keypoints=kps, pose=pose, trel=trel, failed=failed,
        total_matches=total, match_counts=counts, covariance=cov,
        position_error=pos_err, orientation_error=ori_err,
        roll_offset=offset, is_keyframe=do_update, overlap=overlap, warp=warp,
        statuses=statuses, weights=wts,
        packed=pack_scalars(pose, trel, failed, total, counts, cov, offset,
                            do_update, overlap, map_overflow,
                            jnp.stack([kps[i].count if kps[i] is not None
                                       else jnp.zeros((), jnp.int32)
                                       for i in range(3)])),
        # a map update (or roll) invalidates the submap selection; the next
        # frame's matching rebuilds it lazily (Slam.cxx:1008 discipline).
        # first_frame skips matching entirely, so its cache is never built —
        # stay stale even when mapping is off (fixed preloaded maps)
        submap_cache=tuple(new_cache),
        cache_stale=jnp.asarray(True) if first_frame else do_update)


class StreamState(NamedTuple):
    """Device-resident cross-frame state for the streaming (chained) mode.

    In this mode nothing round-trips to the host per frame: the ego-motion
    prior is extrapolated in-graph from the two previous device poses, the
    keyframe state and rolling-origin accumulate on device, and the host
    pulls the per-frame packed outputs in batches (`Slam.flush`). This
    removes the per-frame sync RTT — the dominant latency term when the
    device sits behind a high-latency link."""

    maps: tuple            # VoxelMap per type
    prev_keypoints: tuple  # Keypoints per type (previous sweep)
    pose: jax.Array        # (6,) latest pose, current MAP frame
    prev_pose: jax.Array   # (6,) pose before it, current MAP frame
    t_cur: jax.Array       # () stamp of `pose`
    t_prev: jax.Array      # () stamp of `prev_pose`
    kf_pose: jax.Array     # (6,) last keyframe pose, current MAP frame
    kf_counter: jax.Array  # () int32
    origin_vox: jax.Array  # (3,) int32 accumulated window shifts
    n_frames: jax.Array    # () int32
    map_update: jax.Array  # () bool, live SlamCommand map-update switch
    submap_cache: tuple = (None, None, None)  # per-type SubmapCache
    cache_stale: jax.Array = True             # () bool


def process_frame_stream(ri: RangeImage, state: StreamState, stamp, az_res,
                         cfg: SlamConfig, map_cfgs: tuple, first_frame: bool,
                         extras=(), axis_name=None, n_shards: int = 1,
                         shard_maps: bool = False,
                         shard_extraction: bool = False):
    """One chained streaming step: returns (state', packed_out (67,),
    kps_flat — one (7K+1,) log buffer per type, frame.flatten_keypoints).

    packed_out = FrameResult.packed (64) + origin_vox after this frame (3);
    poses in it are relative to the origin *before* this frame's roll."""
    ri = ensure_range_image(ri)
    if shard_extraction and axis_name is not None:
        kps = extract_sharded(ri, az_res, cfg, axis_name, n_shards)
    else:
        ext = extractor.extract_keypoints(ri, az_res, cfg.extractor)
        kps = (ext.edges, ext.planes, ext.blobs)
    return _stream_step(kps, ri, state, stamp, az_res, cfg, map_cfgs,
                        first_frame, extras, axis_name, n_shards, shard_maps)


def process_keypoints_stream(kps: tuple, state: StreamState, stamp, az_res,
                             cfg: SlamConfig, map_cfgs: tuple,
                             first_frame: bool, extras=(), axis_name=None,
                             n_shards: int = 1, shard_maps: bool = False):
    """Streaming step from pre-extracted (multi-LiDAR merged) keypoints —
    the streaming analog of `process_keypoints`, so rigs with several
    LiDARs (each with its own extractor) also run without per-frame host
    syncs (Slam::AddFrames multi-device + the streaming mode)."""
    return _stream_step(kps, None, state, stamp, az_res, cfg, map_cfgs,
                        first_frame, extras, axis_name, n_shards, shard_maps)


def _stream_step(kps, ri, state: StreamState, stamp, az_res, cfg: SlamConfig,
                 map_cfgs, first_frame, extras, axis_name, n_shards,
                 shard_maps):
    # in-graph constant-velocity extrapolation (Slam.cxx:821-836)
    ratio_guard = cfg.max_extrapolation_ratio
    Rw, tw = undistortion.jinterpolate_pose(state.prev_pose, state.pose, stamp,
                                            state.t_prev, state.t_cur, ratio_guard)
    ext_pose = se3.jrt_to_pose(Rw, tw)
    trel = _relative_pose(state.pose, ext_pose)
    trel = jnp.where(state.n_frames >= 2, trel, jnp.zeros(6))

    inp = FrameInputs(
        trel_prior=trel, prev_pose=state.pose, t_prev=state.t_cur,
        stamp=stamp, az_resolution=az_res, kf_last_pose=state.kf_pose,
        kf_counter=state.kf_counter, extras=extras,
        map_update=state.map_update,
        submap_cache=state.submap_cache, cache_stale=state.cache_stale)
    res = process_keypoints(kps, ri, state.maps, state.prev_keypoints, inp,
                            cfg, map_cfgs, first_frame, axis_name=axis_name,
                            n_shards=n_shards, shard_maps=shard_maps)

    shared_cfg = map_cfgs[int(cfg.used_types[0])]
    shift = res.roll_offset.astype(jnp.float32) * voxel_map.effective_resolution(shared_cfg)
    new_state = StreamState(
        maps=res.maps,
        prev_keypoints=res.keypoints,
        pose=res.pose - jnp.concatenate([shift, jnp.zeros(3)]),
        prev_pose=state.pose - jnp.concatenate([shift, jnp.zeros(3)]),
        t_cur=jnp.asarray(stamp, jnp.float32),
        t_prev=state.t_cur,
        kf_pose=jnp.where(res.is_keyframe, res.pose, state.kf_pose)
        - jnp.concatenate([shift, jnp.zeros(3)]),
        kf_counter=state.kf_counter + res.is_keyframe.astype(jnp.int32),
        origin_vox=state.origin_vox + res.roll_offset,
        n_frames=state.n_frames + 1,
        map_update=state.map_update,
        submap_cache=res.submap_cache,
        cache_stale=jnp.asarray(res.cache_stale),
    )
    packed = jnp.concatenate([
        res.packed, (state.origin_vox + res.roll_offset).astype(jnp.float32)])
    # keypoint log buffers built in-graph: fresh output buffers, distinct
    # from the (donated-next-call) state keypoints — the host logs them
    # without any per-leaf defensive copies (frame.flatten_keypoints)
    kps_flat = tuple(frame_mod.flatten_keypoints(kp) for kp in res.keypoints)
    return new_state, packed, kps_flat


def process_stream_window(ri_stack, state: StreamState, stamps, az_res,
                          cfg: SlamConfig, map_cfgs: tuple):
    """W chained streaming steps in ONE device dispatch: `lax.scan` over a
    leading-axis-W stack of sweeps (`frame.stack_range_images`).

    This amortizes the per-dispatch host/link overhead — the dominant wall
    term when the chip sits behind a high-latency tunnel (measured ~4.5 ms
    host gap per frame at VLP-16 scale with per-frame dispatch) — W-fold:
    one upload, one dispatch, one set of output references per W sweeps.
    The scan body is the exact per-frame step: results are bitwise
    identical to W per-frame dispatches at UndistortionMode.NONE (under
    ONCE/REFINED the windowed wire's u8 time quantization shifts poses by
    ~0.3 mm — see SlamConfig.stream_window). First frames / frames
    carrying sensor-constraint extras use the per-frame path.

    Returns (state', packed (W, 67), kps_flat — per type (W, 7K+1))."""
    def body(st, xs):
        ri, stamp = xs
        st2, packed, kps_flat = process_frame_stream(
            ri, st, stamp, az_res, cfg, map_cfgs, False)
        return st2, (packed, kps_flat)

    state, (packed, kps_flat) = jax.lax.scan(body, state, (ri_stack, stamps))
    return state, packed, kps_flat


def seed_stream_state(maps: tuple, pose, prev_pose, t_cur, t_prev, kf_pose,
                      kf_counter, origin_vox, n_frames, map_update,
                      cfg: SlamConfig, map_cfgs: tuple,
                      sharded: bool = False) -> StreamState:
    """Seed a streaming segment from host state in ONE traced program.

    Eagerly building the ~30 leaves of a StreamState (zeros, map copies,
    scalar uploads) costs one device round-trip EACH over a high-latency
    tunnel (~2 s measured per segment start); under jit it is one dispatch.
    Inputs are NOT donated, so the outputs are fresh buffers — host-held
    references to the passed maps stay valid when the new state is later
    donated (the copy the eager path did explicitly)."""
    st = init_stream_state(cfg, map_cfgs, sharded=sharded)
    # jnp.copy (not asarray): a pass-through output would alias the caller's
    # buffers, which the next streaming dispatch donates
    return st._replace(
        maps=tuple(None if m is None else jax.tree.map(jnp.copy, m)
                   for m in maps),
        pose=jnp.asarray(pose, jnp.float32),
        prev_pose=jnp.asarray(prev_pose, jnp.float32),
        t_cur=jnp.asarray(t_cur, jnp.float32),
        t_prev=jnp.asarray(t_prev, jnp.float32),
        kf_pose=jnp.asarray(kf_pose, jnp.float32),
        kf_counter=jnp.asarray(kf_counter, jnp.int32),
        origin_vox=jnp.asarray(origin_vox, jnp.int32),
        n_frames=jnp.asarray(n_frames, jnp.int32),
        map_update=jnp.asarray(map_update, bool))


def init_stream_state(cfg: SlamConfig, map_cfgs,
                      sharded: bool = False) -> StreamState:
    from lidarslam_tpu.ops.frame import Keypoints as _KP

    return StreamState(
        maps=tuple(voxel_map.VoxelMap.empty(map_cfgs[i]) if cfg.use_keypoints(Keypoint(i))
                   else None for i in range(3)),
        prev_keypoints=tuple(_KP.empty(cfg.extractor.kp_capacity(i))
                             for i in range(3)),
        pose=jnp.zeros(6), prev_pose=jnp.zeros(6),
        t_cur=jnp.zeros(()), t_prev=jnp.zeros(()),
        kf_pose=jnp.zeros(6), kf_counter=jnp.zeros((), jnp.int32),
        origin_vox=jnp.zeros(3, jnp.int32), n_frames=jnp.zeros((), jnp.int32),
        map_update=jnp.asarray(cfg.mapping_mode != 0),
        submap_cache=init_submap_cache(cfg, map_cfgs, sharded=sharded),
        cache_stale=jnp.asarray(True))


def _relative_pose(pose_a, pose_b):
    """xyzrpy of A^-1 B."""
    Ra, ta = se3.jpose_to_rt(pose_a)
    Rb, tb = se3.jpose_to_rt(pose_b)
    R = Ra.T @ Rb
    t = Ra.T @ (tb - ta)
    return se3.jrt_to_pose(R, t)


def _set(tup, i, v):
    out = list(tup)
    out[i] = v
    return tuple(out)


def _overlap(ri: RangeImage, pose, indices, cfg: SlamConfig, map_cfgs, warp,
             axis_name=None, prepared=(None, None, None)):
    """LCP overlap of a strided sample of the registered sweep. `prepared`:
    per-type MapPlanes carried in the submap cache — reuse them so the
    overlap 1-NN doesn't re-run the Pallas map prep every frame."""
    flat = ri.xyz.reshape(-1, 3)
    valid = ri.valid.ravel()
    n = flat.shape[0]
    take = min(cfg.confidence.overlap_max_samples,
               max(int(n * cfg.confidence.overlap_sampling_ratio), 1))
    stride = max(n // take, 1)
    sample = flat[::stride][:take]
    svalid = valid[::stride][:take]
    stime = ri.time.ravel()[::stride][:take]
    if warp is not None:
        sample = undistortion.warp_points(sample, stime, warp)
    world = se3.japply_pose(pose, sample)
    types = cfg.used_types
    return confidence_mod.lcp_overlap(
        world, svalid,
        [indices[int(t)] for t in types],
        [map_cfgs[int(t)].leaf_size for t in types], axis_name=axis_name,
        prepared=[prepared[int(t)] for t in types])
