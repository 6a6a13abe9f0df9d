"""SLAM orchestrator: the per-sweep state machine.

Python-host re-design of the reference `Slam` class (Slam.h:110-394,
Slam.cxx:230-344): per frame it runs check -> extract keypoints -> ego-motion
-> localization -> confidence -> map update -> logging. All numerics run in
jitted device kernels on fixed-shape arrays; the host keeps float64 pose
bookkeeping, the trajectory log, keyframe state, and the rolling-map origin.

Coordinate frames:
- BASE: sensor platform frame of the current sweep (keypoints live here).
- WORLD: global frame (float64 host poses).
- MAP: WORLD translated by `-map_origin`; all device-side map/ICP arrays are
  MAP-frame float32. The origin is shared by all keypoint maps and advances
  by whole rolling-grid voxels, using a window resolution snapped to an exact
  common multiple of every map's leaf size so one roll offset keeps every
  leaf grid aligned.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from lidarslam_tpu import confidence as confidence_mod
from lidarslam_tpu.config import (EgoMotionMode, Keypoint, MappingMode, MatchStatus,
                                  SlamConfig)
from lidarslam_tpu.core import se3
from lidarslam_tpu.ops import extractor, icp, solver, undistortion, voxel_map
from lidarslam_tpu.ops.frame import Keypoints, build_range_image, estimate_azimuthal_resolution
from lidarslam_tpu.sensors.constraints import ImuManager, WheelOdometryManager


def _shared_resolution(cfg: SlamConfig) -> float:
    """Rolling-window resolution: the largest value <= every map's snapped
    voxel resolution that is an integer multiple of every used leaf size."""
    leafs_mm = [round(cfg.map_config(k).leaf_size * 1000) for k in cfg.used_types]
    l = leafs_mm[0]
    for v in leafs_mm[1:]:
        l = l * v // math.gcd(l, v)
    min_res = min(voxel_map.effective_resolution(cfg.map_config(k)) for k in cfg.used_types)
    quanta = int(min_res * 1000 // l)
    if quanta < 1:
        raise ValueError("voxel_resolution smaller than the leaf-size common multiple")
    return quanta * l / 1000.0


class Slam:
    """The public SLAM engine API (Slam.h:110-394 capability surface)."""

    def __init__(self, config: Optional[SlamConfig] = None):
        self.cfg = config or SlamConfig()
        cfg = self.cfg
        if len(cfg.used_types) == 0:
            raise ValueError("at least one keypoint type must be enabled")
        grid_sizes = {cfg.map_config(k).grid_size for k in cfg.used_types}
        if len(grid_sizes) != 1:
            raise ValueError("all maps must share grid_size for the shared rolling window")

        # snap every map's voxel resolution to the shared rolling quantum
        shared_res = _shared_resolution(cfg)
        self.map_cfgs = {k: cfg.map_config(k).__class__(
            **{**cfg.map_config(k).__dict__, "voxel_resolution": shared_res})
            for k in cfg.used_types}
        self.half = voxel_map.half_extent(next(iter(self.map_cfgs.values())))
        self.geoms = {}
        for k in cfg.used_types:
            mc = self.map_cfgs[k]
            self.geoms[k] = (self.half, mc.bucket_factor * mc.leaf_size, mc.search_rings)

        self.reset()

        # jitted entry points (configs are static)
        self._extract = jax.jit(extractor.extract_keypoints, static_argnums=(2,))
        self._icp = jax.jit(icp.icp_register,
                            static_argnames=("types", "params", "solver_cfg", "icp_iters",
                                             "lm_max_iter", "min_matches", "geoms",
                                             "undistort_mode", "max_extrapolation_ratio"))
        self._warp_points = jax.jit(undistortion.warp_points)
        self._registration_error = jax.jit(solver.registration_error)

    # ------------------------------------------------------------------
    # State
    # ------------------------------------------------------------------

    def reset(self, reset_log: bool = True):
        """Reset SLAM state (Slam::Reset, Slam.cxx:164-210)."""
        cfg = self.cfg
        self.maps: Dict[Keypoint, voxel_map.VoxelMap] = {
            k: voxel_map.VoxelMap.empty(self.map_cfgs[k]) for k in cfg.used_types}
        self.map_origin = np.zeros(3)
        self.Tworld = np.eye(4)
        self.PreviousTworld = np.eye(4)
        self.Trelative = np.eye(4)
        self.kf_last_pose = np.eye(4)
        self.kf_counter = 0
        self.covariance = np.zeros((6, 6))
        self.overlap = -1.0
        self.comply_motion_limits = True
        self.total_matched_keypoints = 0
        self.match_counts = np.zeros(3, np.int64)
        self.latency = 0.0
        self.azimuthal_resolution = cfg.extractor.azimuthal_resolution
        self.current_keypoints: Dict[Keypoint, Keypoints] = {}
        self.previous_keypoints: Dict[Keypoint, Keypoints] = {}
        self.current_warp = None  # within-sweep undistortion of the last frame
        self.last_stamp = None
        self.last_seq = None
        self.failure = False
        self.motion_checker = confidence_mod.MotionLimitChecker(
            cfg.confidence.time_window_duration, cfg.confidence.velocity_limits,
            cfg.confidence.acceleration_limits)
        self.wheel_odom = WheelOdometryManager(cfg.wheel_odom_weight,
                                               cfg.wheel_odom_relative,
                                               cfg.sensor_time_offset)
        self.imu = ImuManager(cfg.imu_weight, cfg.sensor_time_offset)
        self._sensor_extras = ()
        if reset_log:
            self.n_frames = 0
            self.log_trajectory: List[dict] = []  # {time, pose (4,4), covariance}
            self.log_keypoints: List[dict] = []

    # ------------------------------------------------------------------
    # Main entry
    # ------------------------------------------------------------------

    def add_frame(self, frame: dict) -> dict:
        """Process one sweep (Slam::AddFrames single-LiDAR path).

        `frame` is a dict with arrays xyz (n,3), intensity, laser_id, time
        and scalar `stamp` [s] (+ optional `seq`). Returns a summary dict.
        """
        import time as _time
        t0 = _time.perf_counter()
        cfg = self.cfg

        if frame["xyz"] is None or len(frame["xyz"]) == 0:
            return {"skipped": "empty"}
        if self.last_stamp is not None and frame["stamp"] == self.last_stamp:
            return {"skipped": "duplicate stamp"}
        if self.last_seq is not None and "seq" in frame:
            dropped = frame["seq"] - self.last_seq - 1
            if dropped > 0:
                self._log(f"{dropped} frame(s) dropped")
        self.last_seq = frame.get("seq")
        stamp = float(frame["stamp"])

        # ---- keypoint extraction ----
        ri = build_range_image(frame["xyz"], frame["intensity"], frame["laser_id"],
                               frame["time"], cfg.extractor.n_rings,
                               cfg.extractor.max_ring_points)
        if self.azimuthal_resolution <= 1e-6 or self.azimuthal_resolution > np.pi / 4:
            self.azimuthal_resolution = float(estimate_azimuthal_resolution(ri))
        ext = self._extract(ri, jnp.float32(self.azimuthal_resolution), cfg.extractor)
        self.previous_keypoints = self.current_keypoints
        self.current_keypoints = {Keypoint.EDGE: ext.edges, Keypoint.PLANE: ext.planes,
                                  Keypoint.BLOB: ext.blobs}

        # ---- ego-motion ----
        self._compute_ego_motion(stamp)

        # ---- sensor constraints (Slam::ComputeSensorConstraints, 347-352) ----
        extras = []
        if self.wheel_odom.can_be_used():
            r = self.wheel_odom.compute_constraint(stamp)
            if r is not None:
                extras.append(r)
        if self.imu.can_be_used():
            r = self.imu.compute_constraint(stamp)
            if r is not None:
                extras.append(r)
        self._sensor_extras = tuple(extras)

        # ---- localization ----
        loc = self._localize(stamp)

        # ---- confidence ----
        if cfg.confidence.overlap_sampling_ratio > 0 and not self.failure:
            self.overlap = self._estimate_overlap(frame, loc.get("indices", {}))
        if cfg.confidence.time_window_duration > 0:
            status = self.motion_checker.check(
                [(e["time"], e["pose"]) for e in self.log_trajectory], self.Tworld, stamp)
            self.comply_motion_limits = status.comply

        # ---- map update ----
        if cfg.mapping_mode in (MappingMode.ADD_KPTS_TO_FIXED_MAP, MappingMode.UPDATE) \
                and not self.failure:
            self._update_maps(stamp)

        # ---- logging ----
        self._log_state(stamp)
        self.last_stamp = frame["stamp"]
        self.n_frames += 1
        self.latency = _time.perf_counter() - t0
        return {
            "pose": self.Tworld.copy(),
            "covariance": self.covariance.copy(),
            "n_matches": int(self.total_matched_keypoints),
            "overlap": self.overlap,
            "comply_motion_limits": self.comply_motion_limits,
            "failure": self.failure,
            "duration": self.latency,
        }

    # ------------------------------------------------------------------
    # Pipeline stages
    # ------------------------------------------------------------------

    def _compute_ego_motion(self, stamp):
        """Constant-velocity extrapolation (Slam.cxx:813-836); scan-to-scan
        registration refinement when enabled (844-954)."""
        cfg = self.cfg
        self.Trelative = np.eye(4)
        if len(self.log_trajectory) >= 2 and cfg.ego_motion_mode in (
                EgoMotionMode.MOTION_EXTRAPOLATION,
                EgoMotionMode.MOTION_EXTRAPOLATION_AND_REGISTRATION):
            t1 = self.log_trajectory[-1]["time"]
            t0 = self.log_trajectory[-2]["time"]
            if abs((stamp - t1) / max(t1 - t0, 1e-12)) > cfg.max_extrapolation_ratio:
                self._log("extrapolation time too far; skipping prediction")
            else:
                next_est = se3.interpolate_hmat(self.PreviousTworld, self.Tworld,
                                                stamp, t0, t1)
                self.Trelative = se3.hmat_inverse(self.Tworld) @ next_est

        if cfg.ego_motion_mode in (EgoMotionMode.REGISTRATION,
                                   EgoMotionMode.MOTION_EXTRAPOLATION_AND_REGISTRATION):
            self._ego_motion_registration()

    def _ego_motion_registration(self):
        """Scan-to-scan ICP against the previous sweep's raw keypoints."""
        cfg = self.cfg
        prev = self.previous_keypoints
        if not prev or all(int(prev[k].count) == 0 for k in (Keypoint.EDGE, Keypoint.PLANE)):
            return
        types = tuple(t for t in (Keypoint.EDGE, Keypoint.PLANE) if cfg.use_keypoints(t))
        # index previous keypoints around the current position (BASE frame of
        # the previous sweep; Trelative maps current BASE into it)
        kp_xyz = [None, None, None]
        kp_valid = [None, None, None]
        index = [None, None, None]
        geoms = [None, None, None]
        for t in types:
            cur = self.current_keypoints[t]
            kp_xyz[int(t)] = cur.xyz
            kp_valid[int(t)] = cur.valid
            mc = self.map_cfgs.get(t) or next(iter(self.map_cfgs.values()))
            bucket = mc.bucket_factor * mc.leaf_size
            index[int(t)] = voxel_map.build_point_index(
                prev[t].xyz, prev[t].valid, self.half, bucket, ring=prev[t].ring)
            geoms[int(t)] = (self.half, bucket, mc.search_rings)
        res = self._icp(
            icp.ICPInputs(kp_xyz=tuple(kp_xyz), kp_valid=tuple(kp_valid), index=tuple(index)),
            types=types,
            pose0=jnp.asarray(se3.hmat_to_pose(self.Trelative), jnp.float32),
            params=cfg.ego_matching, solver_cfg=cfg.solver,
            icp_iters=cfg.ego_motion_icp_max_iter, lm_max_iter=cfg.ego_motion_lm_max_iter,
            min_matches=cfg.min_nb_matched_keypoints, geoms=tuple(geoms))
        if not bool(res.failed):
            self.Trelative = se3.pose_to_hmat(np.asarray(res.pose, np.float64))

    def _localize(self, stamp) -> dict:
        """Scan-to-map registration (Slam::Localization, Slam.cxx:975-1175)."""
        cfg = self.cfg
        self.failure = False
        self.PreviousTworld = self.Tworld.copy()
        self.Tworld = self.PreviousTworld @ self.Trelative

        prior_rel = self.Tworld.copy()
        prior_rel[:3, 3] -= self.map_origin
        pose0 = se3.hmat_to_pose(prior_rel)

        any_map = any(int(self.maps[k].n_points) > 0 for k in cfg.used_types)
        if not any_map:
            # first frame: nothing to register against
            self.total_matched_keypoints = 0
            return {}

        types = cfg.used_types
        kp_xyz = [None, None, None]
        kp_valid = [None, None, None]
        kp_time = [None, None, None]
        index = [None, None, None]
        geoms = [None, None, None]
        indices = {}
        for t in types:
            mc = self.map_cfgs[t]
            if mc.decaying_threshold > 0:
                self.maps[t] = voxel_map.clear_old_points(self.maps[t], jnp.float32(stamp), mc)
            kp = self.current_keypoints[t]
            kp_xyz[int(t)] = kp.xyz
            kp_valid[int(t)] = kp.valid
            kp_time[int(t)] = kp.time
            # world-frame bbox of current keypoints under the prior
            world = se3.japply_pose(jnp.asarray(pose0, jnp.float32), kp.xyz)
            big = jnp.float32(3e38)
            bbox_min = jnp.min(jnp.where(kp.valid[:, None], world, big), axis=0)
            bbox_max = jnp.max(jnp.where(kp.valid[:, None], world, -big), axis=0)
            idx = voxel_map.extract_submap_index(
                self.maps[t], bbox_min, bbox_max, (kp.count // 2).astype(jnp.int32), mc)
            index[int(t)] = idx
            indices[t] = idx
            geoms[int(t)] = self.geoms[t]

        undistort_kwargs = {}
        if cfg.undistortion != 0:
            # sweep time range across all used keypoint types (InitUndistortion,
            # Slam.cxx:1288-1319)
            tmin = jnp.float32(3e38)
            tmax = jnp.float32(-3e38)
            for t in types:
                kp = self.current_keypoints[t]
                tmin = jnp.minimum(tmin, jnp.min(jnp.where(kp.valid, kp.time, 3e38)))
                tmax = jnp.maximum(tmax, jnp.max(jnp.where(kp.valid, kp.time, -3e38)))
            prev_rel = self.PreviousTworld.copy()
            prev_rel[:3, 3] -= self.map_origin
            t_prev = self.log_trajectory[-1]["time"] if self.log_trajectory else stamp
            undistort_kwargs = dict(
                undistort_mode=cfg.undistortion,
                prev_pose=jnp.asarray(se3.hmat_to_pose(prev_rel), jnp.float32),
                t_prev=jnp.float32(t_prev), t_cur=jnp.float32(stamp),
                time_range=(tmin, tmax),
                max_extrapolation_ratio=cfg.max_extrapolation_ratio)

        res = self._icp(
            icp.ICPInputs(kp_xyz=tuple(kp_xyz), kp_valid=tuple(kp_valid), index=tuple(index),
                          kp_time=tuple(kp_time)),
            types=types, pose0=jnp.asarray(pose0, jnp.float32),
            params=cfg.loc_matching, solver_cfg=cfg.solver,
            icp_iters=cfg.localization_icp_max_iter, lm_max_iter=cfg.localization_lm_max_iter,
            min_matches=cfg.min_nb_matched_keypoints, geoms=tuple(geoms),
            extras=self._rebase_extras(self._sensor_extras),
            **undistort_kwargs)
        self.current_warp = res.warp

        self.total_matched_keypoints = int(res.total_matches)
        self.match_counts = np.asarray(res.match_counts, np.int64)
        if bool(res.failed):
            # rollback to avoid instability (Slam.cxx:1098-1107)
            self.failure = True
            self.Trelative = np.eye(4)
            self.Tworld = self.PreviousTworld.copy()
            self._log("not enough keypoints matched; localization skipped")
            return {"indices": indices}

        opt = np.asarray(res.pose, np.float64)
        Trel_world = se3.pose_to_hmat(opt)
        Trel_world[:3, 3] += self.map_origin
        self.Tworld = Trel_world
        self.Trelative = se3.hmat_inverse(self.PreviousTworld) @ self.Tworld
        if self.cfg.wheel_odom_relative:
            self.wheel_odom.set_reference_pose(self.Tworld[:3, 3])
        err = self._registration_error(res.H)
        self.covariance = np.asarray(err.covariance, np.float64)
        self._last_icp = res
        return {"indices": indices}

    def _rebase_extras(self, extras):
        """Shift world-frame sensor residual references into MAP coordinates."""
        from lidarslam_tpu.sensors.constraints import OdomResidual

        out = []
        for ex in extras:
            if isinstance(ex, OdomResidual):
                ex = ex._replace(prev_pos=ex.prev_pos
                                 - jnp.asarray(self.map_origin, jnp.float32))
            out.append(ex)
        return tuple(out)

    # ------------------------------------------------------------------
    # External sensor API (Slam.cxx:1584-1598)
    # ------------------------------------------------------------------

    def add_wheel_odom_measurement(self, time: float, distance: float):
        self.wheel_odom.add_measurement(time, distance)

    def add_gravity_measurement(self, time: float, acceleration):
        self.imu.add_measurement(time, acceleration)

    def clear_sensor_measurements(self):
        self.wheel_odom.reset()
        self.imu.reset()

    def _estimate_overlap(self, frame, indices) -> float:
        """LCP overlap of the registered scan on the submaps
        (Slam::EstimateOverlap, Slam.cxx:1370-1388)."""
        cfg = self.cfg
        if not indices:
            return -1.0
        ratio = cfg.confidence.overlap_sampling_ratio
        n = len(frame["xyz"])
        take = min(int(n * ratio), cfg.confidence.overlap_max_samples)
        if take == 0:
            return -1.0
        sel = np.linspace(0, n - 1, take).astype(np.int64)
        pts = np.zeros((cfg.confidence.overlap_max_samples, 3), np.float32)
        pts[:take] = frame["xyz"][sel]
        valid = np.arange(cfg.confidence.overlap_max_samples) < take
        rel = self.Tworld.copy()
        rel[:3, 3] -= self.map_origin
        world = se3.japply_pose(jnp.asarray(se3.hmat_to_pose(rel), jnp.float32),
                                jnp.asarray(pts))
        types = [t for t in indices]
        overlap = confidence_mod.lcp_overlap(
            world, jnp.asarray(valid),
            [indices[t] for t in types],
            [self.map_cfgs[t].leaf_size for t in types],
            [self.geoms[t] for t in types])
        return float(overlap)

    def _update_maps(self, stamp):
        """Keyframe gate + rolling-map insertion (Slam::UpdateMapsUsingTworld,
        Slam.cxx:1178-1222)."""
        cfg = self.cfg
        motion = se3.hmat_inverse(self.kf_last_pose) @ self.Tworld
        trans = np.linalg.norm(motion[:3, 3])
        rot = confidence_mod._rotation_angle(motion[:3, :3])
        coef = min(self.kf_counter / 10.0, 1.0)
        n_map_pts = sum(int(self.maps[k].n_points) for k in cfg.used_types)
        is_kf = (n_map_pts < cfg.min_nb_matched_keypoints * 10
                 or trans >= coef * cfg.kf_distance_threshold
                 or rot >= np.deg2rad(coef * cfg.kf_angle_threshold))
        if not is_kf:
            return
        self.kf_counter += 1
        self.kf_last_pose = self.Tworld.copy()

        rel = self.Tworld.copy()
        rel[:3, 3] -= self.map_origin
        pose_rel = jnp.asarray(se3.hmat_to_pose(rel), jnp.float32)

        # union bbox of all world keypoints -> one shared roll offset
        bbox_min = np.full(3, np.inf, np.float32)
        bbox_max = np.full(3, -np.inf, np.float32)
        world_kp = {}
        for t in cfg.used_types:
            kp = self.current_keypoints[t]
            base = kp.xyz
            if self.current_warp is not None:
                base = self._warp_points(base, kp.time, self.current_warp)
            world = se3.japply_pose(pose_rel, base)
            world_kp[t] = world
            big = jnp.float32(3e38)
            bbox_min = np.minimum(bbox_min, np.asarray(
                jnp.min(jnp.where(kp.valid[:, None], world, big), axis=0)))
            bbox_max = np.maximum(bbox_max, np.asarray(
                jnp.max(jnp.where(kp.valid[:, None], world, -big), axis=0)))

        shared_offset = None
        for t in cfg.used_types:
            mc = self.map_cfgs[t]
            rolled, off = voxel_map.roll(self.maps[t], jnp.asarray(bbox_min),
                                         jnp.asarray(bbox_max), mc)
            self.maps[t] = rolled
            if shared_offset is None:
                shared_offset = np.asarray(off, np.int64)
        res = voxel_map.effective_resolution(next(iter(self.map_cfgs.values())))
        shift = shared_offset.astype(np.float64) * res
        self.map_origin = self.map_origin + shift

        fixed_add = cfg.mapping_mode == MappingMode.ADD_KPTS_TO_FIXED_MAP
        for t in cfg.used_types:
            kp = self.current_keypoints[t]
            mc = self.map_cfgs[t]
            shifted = world_kp[t] - jnp.asarray(shift, jnp.float32)
            self.maps[t] = voxel_map.add_points(
                self.maps[t], shifted, kp.intensity, kp.time, kp.valid,
                jnp.float32(stamp), mc, fixed=False)
            _ = fixed_add  # fixed-map semantics apply to *loaded* maps, not live inserts

    def _log_state(self, stamp):
        """Trajectory/covariance/keypoint logging with timeout pruning
        (Slam::LogCurrentFrameState, Slam.cxx:1225-1264)."""
        cfg = self.cfg
        entry = {"time": stamp, "pose": self.Tworld.copy(),
                 "covariance": self.covariance.copy()}
        self.log_trajectory.append(entry)
        if cfg.logging_timeout == 0:
            while len(self.log_trajectory) > 2:
                self.log_trajectory.pop(0)
        elif cfg.logging_timeout > 0:
            while (len(self.log_trajectory) > 2
                   and stamp - self.log_trajectory[0]["time"] > cfg.logging_timeout):
                self.log_trajectory.pop(0)
                if self.log_keypoints:
                    self.log_keypoints.pop(0)
        if cfg.logging_timeout != 0:
            self.log_keypoints.append(
                {k: jax.tree.map(np.asarray, self.current_keypoints[k])
                 for k in cfg.used_types})

    # ------------------------------------------------------------------
    # Pose-graph optimization (Slam::RunPoseGraphOptimization, 355-487)
    # ------------------------------------------------------------------

    def run_pose_graph_optimization(self, gps_positions, gps_times,
                                    gps_covariances=None,
                                    gps_to_sensor_offset=None) -> bool:
        """Optimize the whole logged trajectory against GPS priors and
        rebuild the maps from the logged keypoints. Returns success."""
        from lidarslam_tpu.backend import posegraph

        cfg = self.cfg
        if len(self.log_trajectory) < 2:
            self._log("PGO requires at least 2 logged poses")
            return False
        if len(self.log_keypoints) != len(self.log_trajectory):
            self._log("PGO requires keypoint logging (logging_timeout != 0)")
            return False

        times = np.array([e["time"] for e in self.log_trajectory])
        poses = [e["pose"] for e in self.log_trajectory]
        covs = [e["covariance"] if np.trace(e["covariance"]) > 0 else np.eye(6) * 1e-4
                for e in self.log_trajectory]

        optimized, cost = posegraph.optimize_pose_graph(
            poses, times, covs,
            gps_positions=np.asarray(gps_positions, np.float64),
            gps_times=np.asarray(gps_times, np.float64),
            gps_covariances=None if gps_covariances is None
            else np.asarray(gps_covariances, np.float64),
            gps_to_sensor_offset=gps_to_sensor_offset,
            verbose=cfg.verbosity >= 2)

        # re-anchor the world frame at the first optimized pose (Slam.cxx:404-419)
        anchor = optimized[0]
        anchor_inv = se3.hmat_inverse(anchor)
        new_poses = [anchor_inv @ p for p in optimized]
        for e, p in zip(self.log_trajectory, new_poses):
            e["pose"] = p

        # rebuild the maps from logged keypoints at optimized poses (421-477)
        self.maps = {k: voxel_map.VoxelMap.empty(self.map_cfgs[k]) for k in cfg.used_types}
        self.map_origin = np.zeros(3)
        world_clouds = {k: [] for k in cfg.used_types}
        last_bbox = None
        for i, (entry, kps) in enumerate(zip(self.log_trajectory, self.log_keypoints)):
            H = entry["pose"]
            for k in cfg.used_types:
                kp = kps[k]
                n = int(kp.count)
                if n == 0:
                    continue
                pts = kp.xyz[:n].astype(np.float64)
                if cfg.undistortion != 0 and i >= 1:
                    pts = self._replay_undistort(pts, kp.time[:n],
                                                 self.log_trajectory[i - 1], entry)
                else:
                    pts = pts @ H[:3, :3].T + H[:3, 3]
                world_clouds[k].append((pts.astype(np.float32), kp.intensity[:n]))
                if i == len(self.log_trajectory) - 1:
                    bb = (pts.min(axis=0), pts.max(axis=0))
                    last_bbox = (np.minimum(last_bbox[0], bb[0]),
                                 np.maximum(last_bbox[1], bb[1])) if last_bbox else bb
        for k in cfg.used_types:
            if not world_clouds[k]:
                continue
            mc = self.map_cfgs[k]
            all_pts = np.concatenate([c[0] for c in world_clouds[k]])
            all_int = np.concatenate([c[1] for c in world_clouds[k]])
            cap = mc.capacity
            for start in range(0, len(all_pts), cap // 2):
                chunk = slice(start, start + cap // 2)
                pts = all_pts[chunk]
                self.maps[k] = voxel_map.add_points(
                    self.maps[k], jnp.asarray(pts), jnp.asarray(all_int[chunk]),
                    jnp.float32(times[-1]), jnp.ones(len(pts), bool),
                    jnp.float32(times[-1]), mc, fixed=False)
            if last_bbox is not None:
                self.maps[k], off = voxel_map.roll(
                    self.maps[k], jnp.asarray(last_bbox[0], jnp.float32),
                    jnp.asarray(last_bbox[1], jnp.float32), mc)
        if last_bbox is not None:
            res = voxel_map.effective_resolution(next(iter(self.map_cfgs.values())))
            self.map_origin = self.map_origin + np.asarray(off, np.float64) * res

        self.Tworld = new_poses[-1].copy()
        self.PreviousTworld = new_poses[-2].copy()
        self.Trelative = se3.hmat_inverse(self.PreviousTworld) @ self.Tworld
        self.kf_last_pose = self.Tworld.copy()
        self._log(f"PGO done: cost {cost:.3e}, {len(new_poses)} poses")
        return True

    def _replay_undistort(self, pts, point_times, prev_entry, cur_entry):
        """Per-point slerp between consecutive optimized poses (Slam.cxx:426-440)."""
        from lidarslam_tpu.core.se3 import _interpolate_rt
        H0, H1 = prev_entry["pose"], cur_entry["pose"]
        t0, t1 = prev_entry["time"], cur_entry["time"]
        if abs(t1 - t0) < 1e-9 or np.allclose(H0, H1, atol=1e-12):
            return pts @ H1[:3, :3].T + H1[:3, 3]
        R, tv = _interpolate_rt(np, H0[:3, :3], H0[:3, 3], H1[:3, :3], H1[:3, 3],
                                t1 + point_times.astype(np.float64), t0, t1)
        return np.einsum("nij,nj->ni", R, pts) + tv

    # ------------------------------------------------------------------
    # Results API (Slam.h getters surface)
    # ------------------------------------------------------------------

    def get_world_transform(self) -> np.ndarray:
        return self.Tworld.copy()

    def get_latency_compensated_world_transform(self) -> np.ndarray:
        """Extrapolate the pose by the last processing latency
        (Slam::GetLatencyCompensatedWorldTransform, Slam.cxx:556-588)."""
        if len(self.log_trajectory) < 2:
            return self.Tworld.copy()
        prev, cur = self.log_trajectory[-2], self.log_trajectory[-1]
        dt = cur["time"] - prev["time"]
        if abs(dt) < 1e-6 or abs(self.latency / dt) > self.cfg.max_extrapolation_ratio:
            return self.Tworld.copy()
        return se3.interpolate_hmat(prev["pose"], cur["pose"],
                                    cur["time"] + self.latency, prev["time"], cur["time"])

    def get_trajectory(self):
        return [(e["time"], e["pose"].copy()) for e in self.log_trajectory]

    def get_covariance(self) -> np.ndarray:
        return self.covariance.copy()

    def get_map_points(self, k: Keypoint, clean: bool = False):
        """World-frame map points (RollingGrid::Get)."""
        xyz, inten, t, fixed = voxel_map.gather_valid_points(self.maps[k], clean,
                                                            self.map_cfgs[k])
        return xyz + self.map_origin.astype(np.float32), inten, t, fixed

    def get_keypoints(self, k: Keypoint, world: bool = False):
        kp = self.current_keypoints.get(k)
        if kp is None:
            return np.zeros((0, 3), np.float32)
        n = int(kp.count)
        xyz = kp.xyz
        if world and self.current_warp is not None:
            xyz = self._warp_points(xyz, kp.time, self.current_warp)
        pts = np.asarray(xyz)[:n]
        if world:
            pts = pts @ np.asarray(self.Tworld[:3, :3].T, np.float32) + \
                np.asarray(self.Tworld[:3, 3], np.float32)
        return pts

    def set_world_transform_from_guess(self, pose_hmat: np.ndarray):
        """External pose reset (Slam::SetWorldTransformFromGuess, 490-501)."""
        self.Tworld = np.asarray(pose_hmat, np.float64).copy()
        self.PreviousTworld = self.Tworld.copy()
        self.current_keypoints = {}

    def save_maps_to_pcd(self, file_prefix: str, binary: bool = True,
                         clean: bool = False):
        """Write one `<prefix><type>s.pcd` per enabled map
        (Slam::SaveMapsToPCD, Slam.cxx:504-516)."""
        from lidarslam_tpu.config import KEYPOINT_NAMES
        from lidarslam_tpu.io import pcd

        for k in self.cfg.used_types:
            xyz, inten, t, fixed = voxel_map.gather_valid_points(
                self.maps[k], clean, self.map_cfgs[k])
            pcd.save_pcd(f"{file_prefix}{KEYPOINT_NAMES[k]}s.pcd",
                         xyz + self.map_origin.astype(np.float32), intensity=inten,
                         time=t, label=fixed.astype(np.uint8), binary=binary)

    def load_maps_from_pcd(self, file_prefix: str, reset_maps: bool = True):
        """Load per-type maps; points are fixed when the mapping mode keeps
        the initial map immutable (Slam::LoadMapsFromPCD, Slam.cxx:519-543)."""
        import os

        from lidarslam_tpu.config import KEYPOINT_NAMES
        from lidarslam_tpu.io import pcd

        if reset_maps:
            self.maps = {k: voxel_map.VoxelMap.empty(self.map_cfgs[k])
                         for k in self.cfg.used_types}
            self.map_origin = np.zeros(3)
        fixed = self.cfg.mapping_mode in (MappingMode.NONE,
                                          MappingMode.ADD_KPTS_TO_FIXED_MAP)
        for k in self.cfg.used_types:
            path = f"{file_prefix}{KEYPOINT_NAMES[k]}s.pcd"
            if not os.path.exists(path):
                continue
            data = pcd.load_pcd(path)
            pts = data["xyz"] - self.map_origin.astype(np.float32)
            mc = self.map_cfgs[k]
            inten = data.get("intensity", np.zeros(len(pts), np.float32))
            self.maps[k] = voxel_map.add_points(
                self.maps[k], jnp.asarray(pts), jnp.asarray(inten),
                jnp.float32(0.0), jnp.ones(len(pts), bool), jnp.float32(0.0),
                mc, fixed=fixed)

    def get_debug_information(self) -> dict:
        """Scalar debug metrics (Slam::GetDebugInformation, Slam.cxx:611-632)."""
        return {
            "total_matched_keypoints": int(self.total_matched_keypoints),
            "edge_matches": int(self.match_counts[0]),
            "plane_matches": int(self.match_counts[1]),
            "blob_matches": int(self.match_counts[2]),
            "overlap": self.overlap,
            "comply_motion_limits": self.comply_motion_limits,
            "failure": self.failure,
        }

    def _log(self, msg):
        if self.cfg.verbosity > 0:
            print(f"[lidarslam_tpu] {msg}")
