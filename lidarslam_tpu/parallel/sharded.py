"""Multi-chip scale-out over a `jax.sharding.Mesh`.

The reference's only parallelism is OpenMP threads in one process
(Slam.h:402-403); this module is the green-field distributed layer the TPU
build adds (SURVEY.md §2.2): keypoints shard over the mesh's `kp` axis (the
matcher's natural data-parallel axis — every keypoint is independent given
the map), the map/submap index is replicated, and the solver's 6x6 normal
equations are `psum`-reduced over ICI each LM evaluation so all chips step an
identical pose. This is the moral equivalent of sequence parallelism for the
registration workload; map-block sharding over hosts follows in a later
round.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from lidarslam_tpu.config import Keypoint, MatchingConfig, SolverConfig
from lidarslam_tpu.ops import icp, pipeline

AXIS = "kp"


def make_mesh(n_devices=None) -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    if n_devices is not None and len(devices) < n_devices:
        raise RuntimeError(
            f"requested a {n_devices}-device mesh but only {len(devices)} "
            "devices are visible (set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N for CPU tests)")
    return Mesh(np.asarray(devices), (AXIS,))


def sharded_icp_register(
    mesh: Mesh,
    inputs: icp.ICPInputs,
    types: Sequence[Keypoint],
    pose0,
    params: MatchingConfig,
    solver_cfg: SolverConfig,
    icp_iters: int,
    lm_max_iter: int,
    min_matches: int,
    geoms: Sequence,
):
    """ICP registration with keypoints sharded over the mesh's kp axis.

    Keypoint arrays' leading dim must be divisible by the mesh size; the
    index and pose are replicated, outputs are replicated (identical on all
    devices by construction of the psum-reduced solve).
    """
    n = mesh.devices.size

    kp_spec = icp.ICPInputs(
        kp_xyz=tuple(None if x is None else P(AXIS) for x in inputs.kp_xyz),
        kp_valid=tuple(None if x is None else P(AXIS) for x in inputs.kp_valid),
        index=tuple(None if x is None else jax.tree.map(lambda _: P(), x,
                                                        is_leaf=lambda v: v is None)
                    for x in inputs.index),
    )
    out_spec = icp.ICPResult(
        pose=P(), failed=P(), total_matches=P(), match_counts=P(), H=P(),
        statuses=tuple(P(AXIS) for _ in types), weights=tuple(P(AXIS) for _ in types),
    )

    fn = partial(icp.icp_register, types=types, params=params, solver_cfg=solver_cfg,
                 icp_iters=icp_iters, lm_max_iter=lm_max_iter,
                 min_matches=min_matches, geoms=geoms, axis_name=AXIS)

    sharded = shard_map(lambda inp, p0: fn(inp, pose0=p0), mesh=mesh,
                        in_specs=(kp_spec, P()), out_specs=out_spec,
                        check_vma=False)
    return jax.jit(sharded)(inputs, pose0)


# ----------------------------------------------------------------------
# Whole-pipeline SPMD: the REAL per-frame step under shard_map.
#
# Inputs arrive replicated (the host uploads one sweep); extraction and the
# rolling-map update are replicated per chip (cheap, and keeping the map
# replicated means the matcher needs zero gathers), while the dominant
# matcher+solver stage runs on each chip's 1/n keypoint slice with the
# normal equations psum-reduced over ICI (ops/pipeline.process_keypoints
# sharded mode). All outputs are replicated, so the host-side Slam logic is
# unchanged — multi-chip is a constructor flag (Slam(cfg, mesh=...)), the
# TPU-native replacement for the reference's single NbThreads knob
# (Slam.h:402-403).
# ----------------------------------------------------------------------


def _maps_spec(cfg, shard_maps: bool):
    """Per-type spec of the maps tuple: sharded slot arrays (map_spec) when
    the maps shard over the mesh, replicated otherwise."""
    if not shard_maps:
        return P()
    from lidarslam_tpu.parallel import sharded_map

    return tuple(sharded_map.map_spec() if cfg.use_keypoints(Keypoint(i))
                 else P() for i in range(3))


def _result_spec(cfg, shard_maps: bool):
    if not shard_maps:
        return P()
    return pipeline.FrameResult(
        maps=_maps_spec(cfg, True), keypoints=P(), pose=P(), trel=P(),
        failed=P(), total_matches=P(), match_counts=P(), covariance=P(),
        position_error=P(), orientation_error=P(), roll_offset=P(),
        is_keyframe=P(), overlap=P(), warp=P(), statuses=P(), weights=P(),
        packed=P(), submap_cache=P(), cache_stale=P())


def process_frame_spmd(ri, maps, prev_kp, inp, cfg, map_cfgs, first_frame,
                       mesh, shard_maps=False, shard_extraction=False):
    """SPMD `pipeline.process_frame`. `cfg`/`map_cfgs`/`first_frame`/`mesh`/
    `shard_maps`/`shard_extraction` must be static under jit."""
    n = mesh.devices.size
    body = partial(pipeline.process_frame, cfg=cfg, map_cfgs=map_cfgs,
                   first_frame=first_frame, axis_name=AXIS, n_shards=n,
                   shard_maps=shard_maps, shard_extraction=shard_extraction)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), _maps_spec(cfg, shard_maps), P(), P()),
                   out_specs=_result_spec(cfg, shard_maps), check_vma=False)
    return fn(ri, maps, prev_kp, inp)


def process_keypoints_spmd(kps, ri, maps, prev_kp, inp, cfg, map_cfgs,
                           first_frame, mesh, shard_maps=False):
    """SPMD `pipeline.process_keypoints` (multi-LiDAR merged-keypoint path)."""
    n = mesh.devices.size
    body = partial(pipeline.process_keypoints, cfg=cfg, map_cfgs=map_cfgs,
                   first_frame=first_frame, axis_name=AXIS, n_shards=n,
                   shard_maps=shard_maps)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), P(), _maps_spec(cfg, shard_maps), P(), P()),
                   out_specs=_result_spec(cfg, shard_maps), check_vma=False)
    return fn(kps, ri, maps, prev_kp, inp)


def process_frame_stream_spmd(ri, state, stamp, az_res, cfg, map_cfgs,
                              first_frame, extras, mesh, shard_maps=False,
                              shard_extraction=False):
    """SPMD streaming step: the chained device state (previous keypoints,
    poses — and the maps, replicated or slab-sharded per `shard_maps`)
    advances in lock-step on every chip; per-frame communication is the
    psum/all_gather of the sharded ICP (+ the k-NN merge and roll migration
    when the maps shard)."""
    n = mesh.devices.size

    def body(ri, state, stamp, az_res, extras):
        return pipeline.process_frame_stream(
            ri, state, stamp, az_res, cfg, map_cfgs, first_frame,
            extras=extras, axis_name=AXIS, n_shards=n, shard_maps=shard_maps,
            shard_extraction=shard_extraction)

    state_spec = _stream_state_spec(cfg, shard_maps)
    fn = shard_map(body, mesh=mesh, in_specs=(P(), state_spec, P(), P(), P()),
                   out_specs=(state_spec, P(), P()), check_vma=False)
    return fn(ri, state, stamp, az_res, extras)


def process_stream_window_spmd(ri_stack, state, stamps, az_res, cfg,
                               map_cfgs, mesh, shard_maps=False,
                               shard_extraction=False):
    """SPMD windowed streaming: W chained per-sweep steps in ONE sharded
    dispatch — `lax.scan` INSIDE the shard_map body, so the per-frame
    psum/all_gather collectives stay within one program and the host/link
    overhead amortizes W-fold exactly as on one chip
    (`pipeline.process_stream_window`)."""
    import jax

    n = mesh.devices.size

    def body(ri_stack, state, stamps, az_res):
        def step(st, xs):
            ri, stamp = xs
            st2, packed, kps_flat = pipeline.process_frame_stream(
                ri, st, stamp, az_res, cfg, map_cfgs, False, extras=(),
                axis_name=AXIS, n_shards=n, shard_maps=shard_maps,
                shard_extraction=shard_extraction)
            return st2, (packed, kps_flat)

        st, (packed, kps_flat) = jax.lax.scan(step, state, (ri_stack, stamps))
        return st, packed, kps_flat

    state_spec = _stream_state_spec(cfg, shard_maps)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(), state_spec, P(), P()),
                   out_specs=(state_spec, P(), P()), check_vma=False)
    return fn(ri_stack, state, stamps, az_res)


def _stream_state_spec(cfg, shard_maps: bool):
    if not shard_maps:
        return P()
    return pipeline.StreamState(
        maps=_maps_spec(cfg, True), prev_keypoints=P(), pose=P(),
        prev_pose=P(), t_cur=P(), t_prev=P(), kf_pose=P(), kf_counter=P(),
        origin_vox=P(), n_frames=P(), map_update=P(),
        submap_cache=P(), cache_stale=P())


def process_keypoints_stream_spmd(kps, state, stamp, az_res, cfg, map_cfgs,
                                  first_frame, extras, mesh,
                                  shard_maps=False):
    """SPMD streaming step from pre-extracted merged keypoints — the
    multi-LiDAR streaming analog of `process_frame_stream_spmd`."""
    n = mesh.devices.size

    def body(kps, state, stamp, az_res, extras):
        return pipeline.process_keypoints_stream(
            kps, state, stamp, az_res, cfg, map_cfgs, first_frame,
            extras=extras, axis_name=AXIS, n_shards=n, shard_maps=shard_maps)

    state_spec = _stream_state_spec(cfg, shard_maps)
    fn = shard_map(body, mesh=mesh, in_specs=(P(), state_spec, P(), P(), P()),
                   out_specs=(state_spec, P(), P()), check_vma=False)
    return fn(kps, state, stamp, az_res, extras)
