"""SLAM orchestrator: the per-sweep state machine.

Python-host re-design of the reference `Slam` class (Slam.h:110-394,
Slam.cxx:230-344). All per-sweep numerics — extraction, ego-motion
registration, scan-to-map ICP, undistortion, confidence, keyframe gating and
map updates — run as ONE fused jitted device call per frame
(ops/pipeline.process_frame) with donated map buffers; the host keeps float64
pose bookkeeping, the trajectory log, sensor managers, and the rolling-map
origin.

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

import dataclasses
import math
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from lidarslam_tpu import confidence as confidence_mod
from lidarslam_tpu.config import (EgoMotionMode, Keypoint, MappingMode, SlamConfig)
from lidarslam_tpu.core import se3
from lidarslam_tpu.ops import extractor as extractor_mod
from lidarslam_tpu.ops import frame as frame_mod
from lidarslam_tpu.ops import pipeline, undistortion, voxel_map
from lidarslam_tpu.ops.frame import Keypoints, build_range_image, estimate_azimuthal_resolution
from lidarslam_tpu.sensors.constraints import ImuManager, WheelOdometryManager
from lidarslam_tpu.utils import timer


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

    def __init__(self, config: Optional[SlamConfig] = None, mesh=None,
                 shard_maps: bool = False, shard_extraction: bool = False):
        self.cfg = config or SlamConfig()
        if (shard_maps or shard_extraction) and mesh is None:
            raise ValueError("shard_maps/shard_extraction require a mesh")
        self.shard_maps = bool(shard_maps)
        self.shard_extraction = bool(shard_extraction)
        if self.cfg.two_d_mode and not self.cfg.solver.two_d_mode:
            # SlamConfig.two_d_mode is the user-facing 2D flag (Slam.h); the
            # LM solver reads SolverConfig.two_d_mode — keep them wired
            # (LocalOptimizer.cxx:89-90 SubsetParameterization semantics)
            self.cfg = dataclasses.replace(
                self.cfg, solver=dataclasses.replace(self.cfg.solver,
                                                     two_d_mode=True))
        cfg = self.cfg
        self.mesh = mesh  # optional jax.sharding.Mesh for multi-chip ICP
        self._cpu_mesh = None if mesh is not None else False  # lazy backend probe
        if len(cfg.used_types) == 0:
            raise ValueError("at least one keypoint type must be enabled")
        grid_sizes = {cfg.map_config(k).grid_size for k in cfg.used_types}
        if len(grid_sizes) != 1:
            raise ValueError("all maps must share grid_size for the shared rolling window")

        # snap every map's voxel resolution to the shared rolling quantum
        shared_res = _shared_resolution(cfg)
        self.map_cfgs = {k: dataclasses.replace(cfg.map_config(k),
                                                voxel_resolution=shared_res)
                         for k in cfg.used_types}
        self._map_cfgs_tuple = tuple(
            self.map_cfgs.get(Keypoint(i),
                              dataclasses.replace(cfg.map_config(Keypoint(i)),
                                                  voxel_resolution=shared_res))
            for i in range(3))
        self.half = voxel_map.half_extent(next(iter(self.map_cfgs.values())))

        self.reset()

        if mesh is None:
            self._process = jax.jit(
                pipeline.process_frame,
                static_argnames=("cfg", "map_cfgs", "first_frame"),
                donate_argnums=(1,))
            self._process_kp = jax.jit(
                pipeline.process_keypoints,
                static_argnames=("cfg", "map_cfgs", "first_frame"),
                donate_argnums=(2,))
            self._process_stream = jax.jit(
                pipeline.process_frame_stream,
                static_argnames=("cfg", "map_cfgs", "first_frame"),
                donate_argnums=(1,))
            self._process_kp_stream = jax.jit(
                pipeline.process_keypoints_stream,
                static_argnames=("cfg", "map_cfgs", "first_frame"),
                donate_argnums=(1,))
            self._process_stream_window = jax.jit(
                pipeline.process_stream_window,
                static_argnames=("cfg", "map_cfgs"),
                donate_argnums=(1,))
            # segment (re-)seeding as one dispatch: eager per-leaf uploads
            # cost a tunnel round-trip each (~2 s per segment start)
            self._seed_stream = jax.jit(
                pipeline.seed_stream_state,
                static_argnames=("cfg", "map_cfgs", "sharded"))
        else:
            # multi-chip SPMD: the same pipeline under shard_map — matcher +
            # solver shard over the mesh's kp axis, psum-reduced normal
            # equations, replicated maps (parallel/sharded.py). One flag
            # replaces the reference's NbThreads knob (Slam.h:402-403).
            from functools import partial as _partial

            from lidarslam_tpu.parallel import sharded as sharded_mod
            n = mesh.devices.size
            for t in cfg.used_types:
                if cfg.extractor.kp_capacity(t) % n:
                    raise ValueError(
                        f"{t.name} keypoint capacity "
                        f"({cfg.extractor.kp_capacity(t)}) must be divisible "
                        f"by the mesh size ({n})")
            if self.shard_maps:
                for k in cfg.used_types:
                    if self.map_cfgs[k].capacity % n:
                        raise ValueError(
                            f"map capacity ({self.map_cfgs[k].capacity}) must "
                            f"be divisible by the mesh size ({n})")
            statics = ("cfg", "map_cfgs", "first_frame", "mesh",
                       "shard_maps", "shard_extraction")
            if self.shard_extraction:
                n_ = mesh.devices.size
                if cfg.extractor.n_rings % n_:
                    raise ValueError(
                        f"extractor.n_rings ({cfg.extractor.n_rings}) must "
                        f"be divisible by the mesh size ({n_}) with "
                        "shard_extraction")
            self._process = _partial(jax.jit(
                sharded_mod.process_frame_spmd, static_argnames=statics,
                donate_argnums=(1,)), mesh=mesh, shard_maps=self.shard_maps,
                shard_extraction=self.shard_extraction)
            kp_statics = ("cfg", "map_cfgs", "first_frame", "mesh",
                          "shard_maps")
            self._process_kp = _partial(jax.jit(
                sharded_mod.process_keypoints_spmd, static_argnames=kp_statics,
                donate_argnums=(2,)), mesh=mesh, shard_maps=self.shard_maps)
            self._process_stream = _partial(jax.jit(
                sharded_mod.process_frame_stream_spmd, static_argnames=statics,
                donate_argnums=(1,)), mesh=mesh, shard_maps=self.shard_maps,
                shard_extraction=self.shard_extraction)
            self._process_kp_stream = _partial(jax.jit(
                sharded_mod.process_keypoints_stream_spmd,
                static_argnames=kp_statics,
                donate_argnums=(1,)), mesh=mesh, shard_maps=self.shard_maps)
            self._process_stream_window = _partial(jax.jit(
                sharded_mod.process_stream_window_spmd,
                static_argnames=("cfg", "map_cfgs", "mesh", "shard_maps",
                                 "shard_extraction"),
                donate_argnums=(1,)), mesh=mesh, shard_maps=self.shard_maps,
                shard_extraction=self.shard_extraction)
        self._extract = jax.jit(extractor_mod.extract_keypoints, static_argnums=(2,))
        self._warp_points = jax.jit(undistortion.warp_points)
        # per-LiDAR-device calibration: BASE <- LIDAR (Slam.h:502-505)
        self.base_to_lidar_offsets: Dict[int, np.ndarray] = {}
        # live output subscribers (vtkSlam 8-port surface; outputs.py).
        # Survives reset(): subscriptions are wiring, not SLAM state.
        self._subscribers: list = []
        # lazy single-thread worker for windowed streaming dispatches
        self._window_executor = None
        self._window_futures: list = []

    def subscribe(self, callback):
        """Register a per-frame output callback (LidarSlamNode::PublishOutput
        / vtkSlam output-port role): called with a `outputs.FrameOutput`
        after every processed (sync) or flushed (streaming) frame. Array
        ports are lazy — a pose-only consumer adds no device traffic.
        Returns an unsubscribe function."""
        self._subscribers.append(callback)

        def unsubscribe():
            if callback in self._subscribers:
                self._subscribers.remove(callback)
        return unsubscribe

    def _emit_output(self, stamp, summary, is_keyframe, views):
        if not self._subscribers:
            return
        from lidarslam_tpu.outputs import FrameOutput

        out = FrameOutput(self, stamp, self.n_frames - 1, summary,
                          is_keyframe, views)
        for cb in list(self._subscribers):
            cb(out)

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
        self.map_overflow = np.zeros(3, np.int64)
        self.latency = 0.0
        self.mapping_mode = cfg.mapping_mode  # live (SlamCommand-switchable)
        self.azimuthal_resolution = cfg.extractor.azimuthal_resolution
        self._az_by_device: Dict[int, float] = {}
        self.current_keypoints: Dict[Keypoint, Keypoints] = {}
        self.current_warp = None
        self.last_stamp = None
        self.last_seq = None
        self.failure = False
        self._device_keypoints = None   # previous sweep's Keypoints (device)
        self._maps_populated = False    # host-side: any map has points
        self.motion_checker = confidence_mod.MotionLimitChecker(
            cfg.confidence.time_window_duration, cfg.confidence.velocity_limits,
            cfg.confidence.acceleration_limits)
        self.wheel_odom = WheelOdometryManager(cfg.wheel_odom_weight,
                                               cfg.wheel_odom_relative,
                                               cfg.sensor_time_offset)
        self.imu = ImuManager(cfg.imu_weight, cfg.sensor_time_offset)
        self._invalidate_submaps()
        if reset_log:
            self.n_frames = 0
            self.log_trajectory: List[dict] = []  # {time, pose (4,4), covariance}
            self.log_keypoints: List[dict] = []   # device Keypoints per type

    def _invalidate_submaps(self):
        """Mark the cached submap selections stale (the reference's kd-tree
        invalidation, RollingGrid submap validity): called whenever the maps
        change outside the fused per-frame step (reset, PGO rebuild, map
        load, stream-segment end)."""
        self._submap_cache = pipeline.init_submap_cache(
            self.cfg, self._map_cfgs_tuple, sharded=self.mesh is not None)
        self._cache_stale = np.bool_(True)

    def _empty_keypoints(self):
        return tuple(Keypoints.empty(self.cfg.extractor.kp_capacity(i))
                     for i in range(3))

    def _reshard_maps(self):
        """Repack host-built maps into slab layout for the shard-maps
        pipeline (no-op otherwise). Must follow every map rebuild that
        bypasses the sharded insert path (PCD load, PGO rebuild, checkpoint
        restore)."""
        self._invalidate_submaps()   # external map change = stale submaps
        if not self.shard_maps:
            return
        from lidarslam_tpu.parallel import sharded_map

        n = self.mesh.devices.size
        for k in self.cfg.used_types:
            self.maps[k] = sharded_map.reshard_host(self.maps[k],
                                                    self.map_cfgs[k], n)

    # ------------------------------------------------------------------
    # Main entry
    # ------------------------------------------------------------------

    def add_frame(self, frame: dict, next_frame: dict = None) -> dict:
        """Process one sweep (Slam::AddFrames single-LiDAR path).

        `frame` is a dict with arrays xyz (n,3), intensity, laser_id, time
        and scalar `stamp` [s] (+ optional `seq`). Pass the upcoming sweep as
        `next_frame` to overlap its conversion/upload with this frame's
        device execution. Returns a summary dict.
        """
        import time as _time
        t0 = _time.perf_counter()
        cfg = self.cfg

        skip = self._check_frame(frame)
        if skip:
            return skip
        stamp = float(frame["stamp"])

        # ---- host-side input conversion (or use the prefetched upload) ----
        pre = getattr(self, "_prefetched", None)
        if pre is not None and pre[0] == frame.get("stamp"):
            ri = pre[1]
            self._prefetched = None
        else:
            ri = self._build_ri(frame)
        if self.azimuthal_resolution <= 1e-6 or self.azimuthal_resolution > np.pi / 4:
            from lidarslam_tpu.ops.frame import ensure_range_image
            self.azimuthal_resolution = float(
                estimate_azimuthal_resolution(ensure_range_image(ri)))

        inp = self._make_inputs(stamp)
        first = not self._maps_populated
        maps_in = tuple(self.maps.get(Keypoint(i)) for i in range(3))
        prev_kp = self._device_keypoints if self._device_keypoints is not None \
            else self._empty_keypoints()
        if cfg.verbosity >= 3:
            timer.init("device step")
        res = self._process(ri, maps_in, prev_kp, inp, cfg, self._map_cfgs_tuple, first)
        # overlap the next sweep's host conversion + upload with this frame's
        # device execution (the dispatch above is asynchronous)
        if next_frame is not None and next_frame.get("xyz") is not None \
                and len(next_frame["xyz"]) > 0:
            self._prefetched = (next_frame["stamp"], self._build_ri(next_frame))
        if cfg.verbosity >= 3:
            jax.block_until_ready(res.pose)
            timer.stop_and_display("device step")
        out = self._apply_result(res, stamp, t0)
        self.last_stamp = frame["stamp"]
        return out

    def _build_ri(self, frame, device=True):
        cfg = self.cfg
        return build_range_image(frame["xyz"], frame["intensity"], frame["laser_id"],
                                 frame["time"], cfg.extractor.n_rings,
                                 cfg.extractor.max_ring_points,
                                 packed=cfg.compress_upload, device=device)

    # ------------------------------------------------------------------
    # Streaming (device-chained) mode — no per-frame host sync
    # ------------------------------------------------------------------

    def add_frame_async(self, frame: dict) -> int:
        """Enqueue one sweep in streaming mode; returns its frame index.

        The ego-motion prior, keyframe gate and rolling origin all advance on
        the device, so nothing synchronizes with the host until `flush()`.
        Results (poses, covariances, confidence) land in the normal logs at
        flush time. Mixing with the synchronous `add_frame` is allowed only
        across a flush boundary.

        With `cfg.stream_window > 1` (single-chip only), sweeps buffer
        host-side and every W of them run as ONE scan-chained device
        dispatch — identical results, W-fold less dispatch/link overhead."""
        cfg = self.cfg
        skip = self._check_frame(frame)
        if skip:
            return -1
        stamp = float(frame["stamp"])
        self._ensure_stream_state()
        first = not self._maps_populated and self._stream_enqueued == 0 \
            and self.n_frames == 0
        extras = self._stream_extras(stamp)
        window = cfg.stream_window

        # the per-frame path below estimates azimuthal resolution; until a
        # valid estimate exists (e.g. first streaming frame against
        # PRELOADED maps, where `first` is False) windows must not start
        az_invalid = (self.azimuthal_resolution <= 1e-6
                      or self.azimuthal_resolution > np.pi / 4)
        if window > 1 and not first and not extras and not az_invalid:
            # host-built sweep buffers; one stacked upload + dispatch when
            # the window fills. (A/B-measured against per-frame device
            # uploads with an on-device stack: the eager per-frame
            # transfers cost ~2 ms/frame of tunnel round-trips — 128 vs
            # 174 scans/s at VLP-16 scale — so the single host-side stack
            # wins despite serializing at the window boundary.)
            self._window_buf.append(
                (self._build_ri(frame, device=False), stamp))
            if len(self._window_buf) >= window:
                self._dispatch_window()
            self.last_stamp = frame["stamp"]
            idx = self._stream_enqueued
            self._stream_enqueued += 1
            return idx

        # per-frame dispatch path (first frame / sensor extras / window=1);
        # any buffered partial window must run first to keep frame order
        self._drain_window()
        ri = self._build_ri(frame)
        if self.azimuthal_resolution <= 1e-6 or self.azimuthal_resolution > np.pi / 4:
            from lidarslam_tpu.ops.frame import ensure_range_image
            self.azimuthal_resolution = float(
                estimate_azimuthal_resolution(ensure_range_image(ri)))

        self._stream_state, packed, kps_flat = self._process_stream(
            ri, self._stream_state, np.float32(stamp),
            np.float32(self.azimuthal_resolution), cfg, self._map_cfgs_tuple,
            first, tuple(extras))
        # packed and the flat keypoint-log buffers are fresh jit outputs,
        # distinct from the (donated-next-call) state buffers: log the
        # references directly, zero per-frame host-side device dispatches
        self._stream_pending.append({"stamps": [stamp], "packed": packed,
                                     "kps_flat": kps_flat})
        self._stream_backpressure(packed)
        self.last_stamp = frame["stamp"]
        idx = self._stream_enqueued
        self._stream_enqueued += 1
        return idx

    def _dispatch_window(self):
        """Run the buffered full window as one scan-chained dispatch.

        The stack + upload + dispatch runs on a single background worker
        thread: the ~1-2 ms/frame of host sweep building (native ingest,
        main thread) then OVERLAPS the window's multi-MB host->device
        transfer and the previous window's device compute — numpy memcpy,
        the ctypes ingest and the runtime's transfer all release the GIL.
        A single worker keeps window order (the stream state chains);
        every consumer of `_stream_state` syncs via `_window_sync` first."""
        buf, self._window_buf = self._window_buf, []

        def run(buf=buf):
            ris = [r for r, _ in buf]
            if self.cfg.flat_wire and isinstance(ris[0], frame_mod.PackedRangeImage):
                # prefix-packed wire: upload only the valid points. P is the
                # window's max sweep total +5% headroom, rounded up to 8 Ki,
                # and STICKY (never shrinks for this instance): scene-fill
                # noise around a bucket boundary must not trigger a fresh
                # window-program compile mid-run (a boundary crossing cost a
                # ~3-minute tunnel compile inside a timed bench rep)
                R, C = ris[0].intensity.shape
                need = max(int(np.asarray(r.counts).sum()) for r in ris)
                P = min(R * C, -(-max(int(need * 1.05), 1) // 8192) * 8192)
                P = max(P, getattr(self, "_wire_bucket", 0))
                if self.cfg.wire_capacity:
                    P = min(P, self.cfg.wire_capacity)
                self._wire_bucket = P
                ris = [frame_mod.flatten_packed(r, P) for r in ris]
            ris = frame_mod.stack_range_images(ris)
            stamps = np.asarray([s for _, s in buf], np.float32)
            self._stream_state, packed, kps_flat = self._process_stream_window(
                ris, self._stream_state, stamps,
                np.float32(self.azimuthal_resolution), self.cfg,
                self._map_cfgs_tuple)
            self._stream_pending.append({"stamps": [s for _, s in buf],
                                         "packed": packed,
                                         "kps_flat": kps_flat})
            # virtual CPU meshes must not keep several collective-bearing
            # programs in flight (see _stream_backpressure); blocking per
            # WINDOW on the worker keeps the main thread fully async
            self._stream_backpressure(packed)

        if self._window_executor is None:
            import concurrent.futures
            self._window_executor = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="lst-window")
        self._window_futures.append(self._window_executor.submit(run))

    def _window_sync(self):
        """Wait for queued window dispatches (stream-state order barrier)."""
        futs, self._window_futures = self._window_futures, []
        for f in futs:
            f.result()   # re-raises worker exceptions

    def _drain_window(self):
        """Dispatch a buffered partial window frame by frame (per-frame jit:
        a partial scan length would compile a fresh program per depth)."""
        self._window_sync()
        buf, self._window_buf = self._window_buf, []
        for ri_host, stamp in buf:
            ri = frame_mod.to_device_range_image(ri_host)
            self._stream_state, packed, kps_flat = self._process_stream(
                ri, self._stream_state, np.float32(stamp),
                np.float32(self.azimuthal_resolution), self.cfg,
                self._map_cfgs_tuple, False, ())
            self._stream_pending.append({"stamps": [stamp], "packed": packed,
                                         "kps_flat": kps_flat})

    def _stream_backpressure(self, packed):
        """On the virtual-device CPU backend, sharded streaming must not
        keep several collective-bearing programs in flight: XLA:CPU runs the
        8 "devices" on one shared thread pool, so psums from different
        queued programs can interleave across ranks and deadlock
        (InProcessCommunicator::AllReduce aborts via AwaitAndLogIfStuck).
        Real TPU meshes order launches per chip, so this stays fully async
        there; on CPU meshes (tests) we serialize program completion."""
        if self.mesh is not None and self._cpu_mesh is None:
            # probe the mesh's own devices, not the default backend: a CPU
            # mesh under a non-CPU default backend still needs serializing
            self._cpu_mesh = self.mesh.devices.flat[0].platform == "cpu"
        if self._cpu_mesh:
            jax.block_until_ready(packed)

    def _ensure_stream_state(self):
        """Create (and seed from host state) the device-resident stream
        state at the start of a streaming segment."""
        cfg = self.cfg
        if getattr(self, "_stream_state", None) is not None:
            return
        self._stream_pending = []
        self._window_buf = []
        self._window_futures = []
        self._stream_enqueued = 0
        seeded = self._maps_populated or self.n_frames > 0
        if seeded:
            # seed from the host state (previous segment / preloaded maps);
            # the seeder's inputs are not donated, so host-held map
            # references survive later donation of the new state
            res_m = voxel_map.effective_resolution(
                self._map_cfgs_tuple[int(cfg.used_types[0])])
            rel = self.Tworld.copy()
            rel[:3, 3] -= self.map_origin
            prev_rel = self.PreviousTworld.copy()
            prev_rel[:3, 3] -= self.map_origin
            kf_rel = self.kf_last_pose.copy()
            kf_rel[:3, 3] -= self.map_origin
            t_cur = self.log_trajectory[-1]["time"] if self.log_trajectory else 0.0
            t_prev = self.log_trajectory[-2]["time"] if len(self.log_trajectory) > 1 \
                else t_cur
            seed_args = (
                tuple(self.maps.get(Keypoint(i)) for i in range(3)),
                se3.hmat_to_pose(rel).astype(np.float32),
                se3.hmat_to_pose(prev_rel).astype(np.float32),
                np.float32(t_cur), np.float32(t_prev),
                se3.hmat_to_pose(kf_rel).astype(np.float32),
                np.int32(self.kf_counter),
                np.round(self.map_origin / res_m).astype(np.int32),
                np.int32(max(self.n_frames, 1)),
                np.bool_(self.mapping_mode != MappingMode.NONE))
            if self.mesh is None:
                self._stream_state = self._seed_stream(
                    *seed_args, cfg=cfg, map_cfgs=self._map_cfgs_tuple,
                    sharded=False)
            else:
                # mesh path: keep the eager seed (placement handled by the
                # SPMD wrapper; segment restarts are not its hot path)
                self._stream_state = pipeline.seed_stream_state(
                    *seed_args, cfg=cfg, map_cfgs=self._map_cfgs_tuple,
                    sharded=True)
        else:
            self._stream_state = pipeline.init_stream_state(
                cfg, self._map_cfgs_tuple, sharded=self.mesh is not None)
            self._stream_state = self._stream_state._replace(
                map_update=jnp.asarray(self.mapping_mode != MappingMode.NONE))

    def _stream_extras(self, stamp):
        """Sensor residual blocks for a streaming step (map-frame rebased)."""
        extras = []
        if self.wheel_odom.can_be_used():
            r = self.wheel_odom.compute_constraint(stamp)
            if r is not None:
                extras.append(r._replace(
                    prev_pos=r.prev_pos - jnp.asarray(self.map_origin, jnp.float32)))
        if self.imu.can_be_used():
            r = self.imu.compute_constraint(stamp)
            if r is not None:
                extras.append(r)
        return extras

    def flush(self) -> list:
        """Synchronize streaming results into the host logs; returns the
        per-frame summary dicts of the flushed frames."""
        if getattr(self, "_window_futures", None) or \
                getattr(self, "_window_buf", None):
            self._drain_window()
        if not getattr(self, "_stream_pending", None):
            return []
        cfg = self.cfg
        res_m = voxel_map.effective_resolution(self._map_cfgs_tuple[int(cfg.used_types[0])])
        # one device_get over ALL pending packed buffers: jax issues the
        # host copies of every leaf asynchronously before blocking, so the
        # transfers overlap into ~one round-trip over the tunnel (windowed
        # entries already carry (W, 64) stacks — a handful of leaves total)
        packed_rows = jax.device_get([p["packed"] for p in self._stream_pending])
        # maps first: subscriber callbacks during the loop may read the map
        # ports (segment-final maps — they only advance on device)
        self.maps = {k: self._stream_state.maps[int(k)] for k in cfg.used_types}
        outs = []
        for entry, rows in zip(self._stream_pending, packed_rows):
            rows = np.atleast_2d(np.asarray(rows))
            windowed = len(entry["stamps"]) > 1
            for w, (stamp, packed) in enumerate(zip(entry["stamps"], rows)):
                u = pipeline.unpack_scalars(packed[:pipeline.PACKED_LEN])
                origin_after_vox = packed[pipeline.PACKED_LEN:
                                          pipeline.PACKED_LEN + 3].astype(np.int64)
                origin_before = (origin_after_vox - u["roll_offset"]).astype(np.float64) * res_m
                pose_world = u["pose"].copy()
                Tnew = se3.pose_to_hmat(pose_world)
                Tnew[:3, 3] += origin_before
                self.PreviousTworld = self.Tworld.copy()
                self.Tworld = Tnew
                self.Trelative = se3.pose_to_hmat(u["trel"])
                self.covariance = u["cov"]
                self.failure = u["failed"]
                self.total_matched_keypoints = u["total"]
                self.match_counts = u["counts"]
                self.overlap = u["overlap"]
                if u["is_kf"]:
                    self.kf_counter += 1
                    self.kf_last_pose = self.Tworld.copy()
                    self._maps_populated = True
                self.map_origin = origin_after_vox.astype(np.float64) * res_m
                self._update_map_overflow(u["map_overflow"])
                # lazy views over the per-frame flat log buffers: nothing is
                # pulled from the device unless a consumer actually reads them
                self.current_keypoints = {
                    Keypoint(i): frame_mod.KeypointsView(
                        entry["kps_flat"][i], row=w if windowed else None)
                    for i in range(3)}
                # motion-limit confidence per flushed frame (Slam.cxx:1391-1484);
                # checked against the log *before* this frame is appended, exactly
                # as the synchronous path does in _apply_result
                if cfg.confidence.time_window_duration > 0:
                    status = self.motion_checker.check(
                        [(e["time"], e["pose"]) for e in self.log_trajectory],
                        self.Tworld, stamp)
                    self.comply_motion_limits = status.comply
                self._log_state(stamp)
                self.n_frames += 1
                outs.append({"pose": self.Tworld.copy(),
                             "covariance": self.covariance.copy(),
                             "n_matches": int(u["total"]), "overlap": u["overlap"],
                             "failure": u["failed"],
                             "kp_counts": u["kp_counts"],
                             "comply_motion_limits": self.comply_motion_limits})
                self._emit_output(stamp, outs[-1], u["is_kf"],
                                  self.current_keypoints)
        # the last frame's structured keypoints live in the stream state;
        # safe to hand out — the segment ends here so they are never donated
        # (a future segment re-seeds from scratch, sync _process donates
        # only the maps)
        self._device_keypoints = self._stream_state.prev_keypoints
        self._stream_pending = []
        # the stream segment ends here: the host is the source of truth again
        # and a future segment re-seeds (with map copies) so donation can
        # never invalidate host-held references. The segment's submap cache
        # dies with its (donated) state: start the sync path stale.
        self._stream_state = None
        self._invalidate_submaps()
        return outs

    def add_frames(self, frames) -> dict:
        """Process one synchronized multi-LiDAR acquisition
        (Slam::AddFrames, Slam.cxx:230-344 + ExtractKeypoints 746-810).

        Each frame dict carries a `device_id`; per-device sweeps are
        extracted independently, transformed into BASE by the per-device
        calibration offsets, time-rebased to the first frame's stamp, and
        the keypoint sets merged before the shared pipeline."""
        import time as _time
        t0 = _time.perf_counter()
        cfg = self.cfg

        frames = [f for f in frames if f["xyz"] is not None and len(f["xyz"])]
        if not frames:
            return {"skipped": "empty"}
        if len(frames) == 1 and int(frames[0].get("device_id", 0)) not in \
                self.base_to_lidar_offsets:
            return self.add_frame(frames[0])
        skip = self._check_frame(frames[0])
        if skip:
            return skip
        stamp = float(frames[0]["stamp"])

        kps = self._extract_merge(frames, stamp)

        inp = self._make_inputs(stamp)
        first = not self._maps_populated
        maps_in = tuple(self.maps.get(Keypoint(i)) for i in range(3))
        prev_kp = self._device_keypoints if self._device_keypoints is not None \
            else self._empty_keypoints()
        res = self._process_kp(kps, None, maps_in, prev_kp, inp, cfg,
                               self._map_cfgs_tuple, first)
        out = self._apply_result(res, stamp, t0)
        self.last_stamp = frames[0]["stamp"]
        return out

    def _extract_merge(self, frames, stamp):
        """Per-device extraction (each LiDAR with its own ExtractorConfig and
        azimuthal resolution, Slam.h:239-245 / LidarSlamNode.cxx:791-817),
        BASE-frame transform by calibration offset, time rebase, and merge
        into one keypoint set per type."""
        cfg = self.cfg
        from lidarslam_tpu.ops.frame import merge_keypoints, transform_keypoints

        per_type = {0: [], 1: [], 2: []}
        for f in frames:
            dev = int(f.get("device_id", 0))
            ecfg = cfg.extractor_for(dev)
            ri = build_range_image(f["xyz"], f["intensity"], f["laser_id"],
                                   f["time"], ecfg.n_rings, ecfg.max_ring_points)
            az = self._az_by_device.get(dev, ecfg.azimuthal_resolution)
            if az <= 1e-6 or az > np.pi / 4:
                az = float(estimate_azimuthal_resolution(ri))
                self._az_by_device[dev] = az
            if self.azimuthal_resolution <= 1e-6:
                self.azimuthal_resolution = az
            ext = self._extract(ri, jnp.float32(az), ecfg)
            offset = self.base_to_lidar_offsets.get(dev, np.eye(4))
            pose6 = jnp.asarray(se3.hmat_to_pose(offset), jnp.float32)
            dt = float(f["stamp"]) - stamp
            for i, kp in enumerate((ext.edges, ext.planes, ext.blobs)):
                per_type[i].append(transform_keypoints(kp, pose6, dt))
        return tuple(merge_keypoints(per_type[i], cfg.extractor.kp_capacity(i))
                     for i in range(3))

    def add_frames_async(self, frames) -> int:
        """Streaming multi-LiDAR: enqueue one synchronized multi-device
        acquisition with per-device extraction, merged keypoints chained
        through the device-resident stream (no per-frame host sync).
        Returns the pending frame index; results land at `flush()`."""
        cfg = self.cfg
        frames = [f for f in frames if f["xyz"] is not None and len(f["xyz"])]
        if not frames:
            return -1
        dev0 = int(frames[0].get("device_id", 0))
        if len(frames) == 1 and dev0 not in self.base_to_lidar_offsets \
                and cfg.extractor_for(dev0) is cfg.extractor:
            # single default-configured device: the fully-fused in-graph
            # extraction path applies. A device with its own ExtractorConfig
            # must keep the host-extraction path even without calibration.
            return self.add_frame_async(frames[0])
        skip = self._check_frame(frames[0])
        if skip:
            return -1
        stamp = float(frames[0]["stamp"])
        self._ensure_stream_state()
        kps = self._extract_merge(frames, stamp)

        self._drain_window()   # keep frame order with single-LiDAR enqueues
        extras = self._stream_extras(stamp)
        first = not self._maps_populated and self._stream_enqueued == 0 \
            and self.n_frames == 0
        self._stream_state, packed, kps_flat = self._process_kp_stream(
            kps, self._stream_state, np.float32(stamp),
            np.float32(self.azimuthal_resolution), cfg, self._map_cfgs_tuple,
            first, tuple(extras))
        self._stream_pending.append({"stamps": [stamp], "packed": packed,
                                     "kps_flat": kps_flat})
        self._stream_backpressure(packed)
        self.last_stamp = frames[0]["stamp"]
        idx = self._stream_enqueued
        self._stream_enqueued += 1
        return idx

    def set_base_to_lidar_offset(self, device_id: int, hmat):
        """Static LIDAR-in-BASE calibration per device (Slam.h:502-505)."""
        self.base_to_lidar_offsets[int(device_id)] = np.asarray(hmat, np.float64)

    def _check_frame(self, frame):
        if frame["xyz"] is None or len(frame["xyz"]) == 0:
            return {"skipped": "empty"}
        if self.last_stamp is not None and frame["stamp"] == self.last_stamp:
            return {"skipped": "duplicate stamp"}
        if self.last_seq is not None and "seq" in frame:
            dropped = frame["seq"] - self.last_seq - 1
            if dropped > 0:
                self._log(f"{dropped} frame(s) dropped")
        self.last_seq = frame.get("seq")
        return None

    def _make_inputs(self, stamp) -> pipeline.FrameInputs:
        cfg = self.cfg
        # ---- ego-motion extrapolation (host, Slam.cxx:813-836) ----
        trel_prior = np.eye(4)
        if len(self.log_trajectory) >= 2 and cfg.ego_motion_mode in (
                EgoMotionMode.MOTION_EXTRAPOLATION,
                EgoMotionMode.MOTION_EXTRAPOLATION_AND_REGISTRATION):
            t1 = self.log_trajectory[-1]["time"]
            tp0 = self.log_trajectory[-2]["time"]
            if abs((stamp - t1) / max(t1 - tp0, 1e-12)) > cfg.max_extrapolation_ratio:
                self._log("extrapolation time too far; skipping prediction")
            else:
                nxt = se3.interpolate_hmat(self.PreviousTworld, self.Tworld, stamp, tp0, t1)
                trel_prior = se3.hmat_inverse(self.Tworld) @ nxt

        # ---- sensor constraints (Slam::ComputeSensorConstraints) ----
        extras = []
        if self.wheel_odom.can_be_used():
            r = self.wheel_odom.compute_constraint(stamp)
            if r is not None:
                extras.append(r._replace(
                    prev_pos=r.prev_pos - jnp.asarray(self.map_origin, jnp.float32)))
        if self.imu.can_be_used():
            r = self.imu.compute_constraint(stamp)
            if r is not None:
                extras.append(r)

        prev_rel = self.Tworld.copy()
        prev_rel[:3, 3] -= self.map_origin
        kf_rel = self.kf_last_pose.copy()
        kf_rel[:3, 3] -= self.map_origin
        t_prev = self.log_trajectory[-1]["time"] if self.log_trajectory else stamp
        return pipeline.FrameInputs(
            trel_prior=jnp.asarray(se3.hmat_to_pose(trel_prior), jnp.float32),
            prev_pose=jnp.asarray(se3.hmat_to_pose(prev_rel), jnp.float32),
            t_prev=jnp.float32(t_prev),
            stamp=jnp.float32(stamp),
            az_resolution=jnp.float32(self.azimuthal_resolution),
            kf_last_pose=jnp.asarray(se3.hmat_to_pose(kf_rel), jnp.float32),
            kf_counter=jnp.int32(self.kf_counter),
            extras=tuple(extras),
            map_update=np.bool_(self.mapping_mode != MappingMode.NONE),
            submap_cache=self._submap_cache,
            cache_stale=self._cache_stale)

    def _apply_result(self, res: pipeline.FrameResult, stamp, t0) -> dict:
        """One host sync for the scalar outputs, then float64 bookkeeping."""
        import time as _time
        cfg = self.cfg
        # a single (64,) transfer instead of nine small ones — the per-frame
        # sync is tunnel-RTT bound
        u = pipeline.unpack_scalars(jax.device_get(res.packed))
        pose_rel, trel, failed, total = u["pose"], u["trel"], u["failed"], u["total"]
        counts, cov, roll_offset = u["counts"], u["cov"], u["roll_offset"]
        is_kf, overlap = u["is_kf"], u["overlap"]

        # ---- host bookkeeping ----
        self.maps = {k: res.maps[int(k)] for k in cfg.used_types}
        self._submap_cache = res.submap_cache
        self._cache_stale = res.cache_stale
        self._device_keypoints = res.keypoints
        self.current_keypoints = {Keypoint(i): res.keypoints[i] for i in range(3)}
        if cfg.verbosity >= 1:
            for t in cfg.used_types:
                cap = cfg.extractor.kp_capacity(t)
                if int(u["kp_counts"][int(t)]) >= cap:
                    self._log(f"{t.name} keypoints hit capacity {cap}; "
                              "raise the extractor keypoint budget for "
                              "this sensor")
        self.current_warp = res.warp
        self.failure = bool(failed)
        self.total_matched_keypoints = int(total)
        self.match_counts = np.asarray(counts, np.int64)
        self.overlap = float(overlap)
        self._update_map_overflow(u["map_overflow"])
        if self.failure:
            self._log("not enough keypoints matched; localization skipped")

        self.PreviousTworld = self.Tworld.copy()
        Tnew = se3.pose_to_hmat(np.asarray(pose_rel, np.float64))
        Tnew[:3, 3] += self.map_origin
        self.Tworld = Tnew
        self.Trelative = se3.pose_to_hmat(np.asarray(trel, np.float64))
        self.covariance = np.asarray(cov, np.float64)
        if bool(is_kf):
            self.kf_counter += 1
            self.kf_last_pose = self.Tworld.copy()
            self._maps_populated = True
        shift = np.asarray(roll_offset, np.float64) * voxel_map.effective_resolution(
            self._map_cfgs_tuple[int(cfg.used_types[0])])
        self.map_origin = self.map_origin + shift
        if cfg.wheel_odom_relative and not self.failure:
            self.wheel_odom.set_reference_pose(self.Tworld[:3, 3])

        # ---- confidence (host) ----
        if cfg.confidence.time_window_duration > 0:
            status = self.motion_checker.check(
                [(e["time"], e["pose"]) for e in self.log_trajectory], self.Tworld, stamp)
            self.comply_motion_limits = status.comply

        # ---- logging ----
        self._log_state(stamp)
        self._last_statuses = res.statuses
        self._last_weights = res.weights
        self.n_frames += 1
        self.latency = _time.perf_counter() - t0
        ret = {
            "pose": self.Tworld.copy(),
            "covariance": self.covariance.copy(),
            "n_matches": int(self.total_matched_keypoints),
            "overlap": self.overlap,
            "comply_motion_limits": self.comply_motion_limits,
            "failure": self.failure,
            "kp_counts": u["kp_counts"],
            "duration": self.latency,
        }
        self._emit_output(stamp, ret, bool(is_kf), self.current_keypoints)
        return ret

    def _log_state(self, stamp):
        """Trajectory/covariance/keypoint logging with timeout pruning
        (Slam::LogCurrentFrameState, Slam.cxx:1225-1264). Keypoint logs keep
        device array references; they are pulled to host lazily (PGO)."""
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
            from lidarslam_tpu.config import KEYPOINT_NAMES
            from lidarslam_tpu.io import storage
            self.log_keypoints.append(
                {k: storage.store(self.current_keypoints[k], cfg.logging_storage,
                                  directory=cfg.logging_dir,
                                  tag=f"{self.n_frames:06d}_{KEYPOINT_NAMES[k]}")
                 for k in cfg.used_types})

    def get_log_memory_usage(self) -> dict:
        """Bytes held by the keypoint log per storage tier (the verbosity-5
        log-memory report, Slam.cxx:318-338 / PointCloudStorage MemorySize)."""
        from lidarslam_tpu.io import storage

        total = {"ram": 0, "disk": 0, "device": 0}
        for entry in self.log_keypoints:
            for obj in entry.values():
                for tier, b in storage.memory_size(obj).items():
                    total[tier] += b
        total["n_frames"] = len(self.log_keypoints)
        return total

    # ------------------------------------------------------------------
    # Pose-graph optimization (Slam::RunPoseGraphOptimization, 355-487)
    # ------------------------------------------------------------------

    def run_pose_graph_optimization(self, gps_positions, gps_times,
                                    gps_covariances=None,
                                    gps_to_sensor_offset=None,
                                    use_device_backend=None,
                                    n_segments: int = 0,
                                    g2o_file_name: str = "",
                                    odometry_sigma_floor: float = 0.0) -> bool:
        """Optimize the whole logged trajectory against GPS priors and
        rebuild the maps from the logged keypoints. Returns success.

        `use_device_backend` selects the batched JAX solver (default: auto,
        device for >= 100 poses); `n_segments > 1` uses the segment-Schur
        partitioned solve. `g2o_file_name` dumps the graph in g2o text
        format before optimizing (PoseGraphOptimization.cxx:164-170).

        `odometry_sigma_floor` [m]: additive floor on the odometry edges'
        covariance. The registration covariance models MATCH NOISE only —
        with thousands of matches it is ~mm-scale and the chain becomes
        numerically rigid, so GPS priors can only align it globally, never
        bend accumulated drift out of the interior. A floor at the expected
        systematic per-frame drift (1-2 cm outdoors) lets the priors
        actually correct the trajectory; 0 keeps exact reference semantics
        (information = inverse SLAM covariance,
        PoseGraphOptimization.cxx:222-247)."""
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
        if odometry_sigma_floor > 0:
            covs = [c + np.eye(6) * odometry_sigma_floor**2 for c in covs]

        if g2o_file_name:
            gps_vertex = [int(np.argmin(np.abs(times - t))) for t in gps_times]
            posegraph.save_g2o(
                g2o_file_name, poses, times,
                rel_information=[np.linalg.inv(c + np.eye(6) * 1e-8)
                                 for c in covs[1:]],
                gps_positions=gps_positions, gps_vertex=gps_vertex,
                gps_information=None if gps_covariances is None
                else [np.linalg.inv(np.asarray(c) + np.eye(3) * 1e-9)
                      for c in gps_covariances],
                gps_to_sensor_offset=gps_to_sensor_offset)
            self._log(f"pose graph dumped to {g2o_file_name}")

        if use_device_backend is None:
            use_device_backend = len(poses) >= 100
        if use_device_backend:
            from lidarslam_tpu.backend.posegraph_device import \
                optimize_pose_graph_device
            optimized, cost = optimize_pose_graph_device(
                poses, times, covs,
                gps_positions=np.asarray(gps_positions, np.float64),
                gps_times=np.asarray(gps_times, np.float64),
                gps_covariances=None if gps_covariances is None
                else np.asarray(gps_covariances, np.float64),
                gps_to_sensor_offset=gps_to_sensor_offset,
                n_segments=n_segments,
                verbose=cfg.verbosity >= 2,
                # engine mesh => distributed solve: segment interiors
                # sharded over the mesh devices (keyframe-range partition)
                mesh=self.mesh)
        else:
            optimized, cost = posegraph.optimize_pose_graph(
                poses, times, covs,
                gps_positions=np.asarray(gps_positions, np.float64),
                gps_times=np.asarray(gps_times, np.float64),
                gps_covariances=None if gps_covariances is None
                else np.asarray(gps_covariances, np.float64),
                gps_to_sensor_offset=gps_to_sensor_offset,
                verbose=cfg.verbosity >= 2)

        # re-anchor the world frame at the first optimized pose (Slam.cxx:404-419)
        anchor_inv = se3.hmat_inverse(optimized[0])
        new_poses = [anchor_inv @ p for p in optimized]
        for e, p in zip(self.log_trajectory, new_poses):
            e["pose"] = p

        # rebuild the maps from logged keypoints at optimized poses (421-477)
        self.maps = {k: voxel_map.VoxelMap.empty(self.map_cfgs[k]) for k in cfg.used_types}
        self.map_origin = np.zeros(3)
        world_clouds = {k: [] for k in cfg.used_types}
        last_bbox = None
        from lidarslam_tpu.io import storage as storage_mod
        for i, (entry, kps) in enumerate(zip(self.log_trajectory, self.log_keypoints)):
            H = entry["pose"]
            for k in cfg.used_types:
                kp = storage_mod.restore(kps[k])
                n = len(kp.xyz)
                if n == 0:
                    continue
                pts = kp.xyz.astype(np.float64)
                if cfg.undistortion != 0 and i >= 1:
                    pts = self._replay_undistort(pts, kp.time,
                                                 self.log_trajectory[i - 1], entry)
                else:
                    pts = pts @ H[:3, :3].T + H[:3, 3]
                world_clouds[k].append((pts.astype(np.float32), kp.intensity))
                if i == len(self.log_trajectory) - 1:
                    bb = (pts.min(axis=0), pts.max(axis=0))
                    last_bbox = (np.minimum(last_bbox[0], bb[0]),
                                 np.maximum(last_bbox[1], bb[1])) if last_bbox else bb
        off = np.zeros(3, np.int64)
        for k in cfg.used_types:
            if not world_clouds[k]:
                continue
            mc = self.map_cfgs[k]
            all_pts = np.concatenate([c[0] for c in world_clouds[k]])
            all_int = np.concatenate([c[1] for c in world_clouds[k]])
            cap = mc.capacity
            for start in range(0, len(all_pts), cap):
                chunk = slice(start, start + cap)
                pts = all_pts[chunk]
                self.maps[k] = voxel_map.add_points(
                    self.maps[k], jnp.asarray(pts), jnp.asarray(all_int[chunk]),
                    jnp.float32(times[-1]), jnp.ones(len(pts), bool),
                    jnp.float32(times[-1]), mc, fixed=False)
            if last_bbox is not None:
                self.maps[k], o = voxel_map.roll(
                    self.maps[k], jnp.asarray(last_bbox[0], jnp.float32),
                    jnp.asarray(last_bbox[1], jnp.float32), mc)
                off = np.asarray(o, np.int64)
        if last_bbox is not None:
            res = voxel_map.effective_resolution(next(iter(self.map_cfgs.values())))
            self.map_origin = self.map_origin + off.astype(np.float64) * res
        self._reshard_maps()

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
    # External sensor API (Slam.cxx:1584-1598)
    # ------------------------------------------------------------------

    def add_wheel_odom_measurement(self, time: float, distance: float):
        self.wheel_odom.add_measurement(time, distance)

    def add_gravity_measurement(self, time: float, acceleration):
        self.imu.add_measurement(time, acceleration)

    def clear_sensor_measurements(self):
        self.wheel_odom.reset()
        self.imu.reset()

    def set_sensor_data(self, file_name: str) -> dict:
        """Clear and reload external sensor measurements from a delimited
        text file (vtkSlam::SetSensorData, vtkSlam.cxx:406-458): columns
        `time`+`odom` feed wheel odometry, `time`+`acc_x/y/z` feed IMU
        gravity. Returns the loaded row counts."""
        from lidarslam_tpu.io.sensor_csv import load_sensor_csv

        self.clear_sensor_measurements()
        if not file_name:
            return {"odometry": 0, "imu": 0}
        return load_sensor_csv(file_name, wheel_odom=self.wheel_odom,
                               imu=self.imu)

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

    def get_target_submap(self, k: Keypoint) -> np.ndarray:
        """World-frame points of the submap currently targeted by the
        matcher (Slam::GetTargetSubMap, Slam.h:158): the bbox + moving-object
        selection built at the last kd-tree-style rebuild. Falls back to the
        full map when no valid selection exists — before the first
        localization, or right after a map update/roll re-sorted the slots
        the selection mask indexes (the matcher itself rebuilds lazily on
        the next frame, Slam.cxx:1008). On-demand getter: in streaming mode
        it syncs the device state."""
        ti = int(k)
        origin = self.map_origin.astype(np.float32)
        if getattr(self, "_stream_state", None) is not None:
            cache = self._stream_state.submap_cache[ti]
            m = self._stream_state.maps[ti]
            stale = bool(np.asarray(self._stream_state.cache_stale))
            res_m = voxel_map.effective_resolution(self.map_cfgs[k])
            origin = (np.asarray(self._stream_state.origin_vox, np.float64)
                      * res_m).astype(np.float32)
        else:
            cache = self._submap_cache[ti] if self._submap_cache else None
            m = self.maps.get(k)
            stale = bool(self._cache_stale)
        if m is None:
            return np.zeros((0, 3), np.float32)
        if cache is None or stale:
            xyz, _, _, _ = voxel_map.gather_valid_points(m, False, self.map_cfgs[k])
            return xyz + origin
        sel = np.asarray(cache.selected)
        pts = np.asarray(m.xyz)[sel & np.asarray(m.valid)]
        return pts + origin

    # --- live sensor-constraint tuning (Slam.h Set*Weight / time offset):
    # the weights ride into the solver as traced data, so these take effect
    # on the next frame with zero recompilation ---
    def set_wheel_odom_weight(self, w: float):
        self.wheel_odom.weight = float(w)

    def set_gravity_weight(self, w: float):
        self.imu.weight = float(w)

    def set_sensor_time_offset(self, dt: float):
        self.wheel_odom.time_offset = float(dt)
        self.imu.time_offset = float(dt)

    def get_sensor_time_offset(self) -> float:
        return float(self.wheel_odom.time_offset)

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

    def set_map_update(self, mode):
        """Live mapping-mode switch (Slam::SetMapUpdate through SlamCommand
        8/9/10, LidarSlamNode.cxx:285-301). The switch is a traced data
        input to the compiled pipeline, so flipping it never recompiles —
        it takes effect on the next frame, including mid-stream."""
        self.mapping_mode = MappingMode(mode)
        if getattr(self, "_stream_state", None) is not None:
            # frames already enqueued (buffered window) run BEFORE the switch
            self._drain_window()
            self._stream_state = self._stream_state._replace(
                map_update=jnp.asarray(self.mapping_mode != MappingMode.NONE))

    def get_map_update(self):
        return self.mapping_mode

    # SlamCommand codes (ros_wrapping/lidar_slam/msg/SlamCommand.msg)
    GPS_SLAM_CALIBRATION = 0
    GPS_SLAM_POSE_GRAPH_OPTIMIZATION = 2
    SET_SLAM_POSE_FROM_GPS = 4
    DISABLE_SLAM_MAP_UPDATE = 8
    ENABLE_SLAM_MAP_EXPANSION = 9
    ENABLE_SLAM_MAP_UPDATE = 10
    SAVE_KEYPOINTS_MAPS = 16
    SAVE_FILTERED_KEYPOINTS_MAPS = 17
    LOAD_KEYPOINTS_MAPS = 18

    def execute_command(self, command: int, string_arg: str = "", **kw):
        """Runtime command dispatch (LidarSlamNode::SlamCommandCallback,
        LidarSlamNode.cxx:244-349): live map-update switches, mid-run map
        save/load, GPS-prior pose-graph optimization and pose reset. Map
        IO commands synchronize (flush) an active stream first; mode
        switches apply live without ending the stream or recompiling."""
        c = int(command)
        if c == self.DISABLE_SLAM_MAP_UPDATE:
            self.set_map_update(MappingMode.NONE)
        elif c == self.ENABLE_SLAM_MAP_EXPANSION:
            self.set_map_update(MappingMode.ADD_KPTS_TO_FIXED_MAP)
        elif c == self.ENABLE_SLAM_MAP_UPDATE:
            self.set_map_update(MappingMode.UPDATE)
        elif c in (self.SAVE_KEYPOINTS_MAPS, self.SAVE_FILTERED_KEYPOINTS_MAPS):
            self.flush()
            self.save_maps_to_pcd(string_arg,
                                  clean=(c == self.SAVE_FILTERED_KEYPOINTS_MAPS))
        elif c == self.LOAD_KEYPOINTS_MAPS:
            self.flush()
            self.load_maps_from_pcd(string_arg)
        elif c == self.GPS_SLAM_POSE_GRAPH_OPTIMIZATION:
            self.flush()
            return self.run_pose_graph_optimization(**kw)
        elif c == self.GPS_SLAM_CALIBRATION:
            # rigid world alignment of the SLAM trajectory onto GPS
            # positions (GpsSlamCalibration path); returns WORLD<-ODOM
            from lidarslam_tpu.backend import registration
            self.flush()
            slam_xyz = np.stack([e["pose"][:3, 3] for e in self.log_trajectory])
            return registration.compute_transform_offset(
                slam_xyz, np.asarray(kw["gps_positions"], np.float64),
                no_roll=bool(kw.get("no_roll", False)))
        elif c == self.SET_SLAM_POSE_FROM_GPS:
            self.flush()
            self.set_world_transform_from_guess(np.asarray(kw["pose"]))
        else:
            raise ValueError(f"unknown SLAM command {command}")

    def set_world_transform_from_guess(self, pose_hmat: np.ndarray):
        """External pose reset (Slam::SetWorldTransformFromGuess, 490-501)."""
        self.Tworld = np.asarray(pose_hmat, np.float64).copy()
        self.PreviousTworld = self.Tworld.copy()
        self._device_keypoints = None

    def save_maps_to_pcd(self, file_prefix: str, binary: bool = True,
                         clean: bool = False, compressed: bool = False):
        """Write one `<prefix><type>s.pcd` per enabled map
        (Slam::SaveMapsToPCD, Slam.cxx:504-516). `compressed` writes PCL
        `binary_compressed` (LZF), the reference's PCDFormat=2."""
        from lidarslam_tpu.config import KEYPOINT_NAMES
        from lidarslam_tpu.io import pcd

        for k in self.cfg.used_types:
            xyz, inten, t, fixed = voxel_map.gather_valid_points(
                self.maps[k], clean, self.map_cfgs[k])
            pcd.save_pcd(f"{file_prefix}{KEYPOINT_NAMES[k]}s.pcd",
                         xyz + self.map_origin.astype(np.float32), intensity=inten,
                         time=t, label=fixed.astype(np.uint8), binary=binary,
                         compressed=compressed)

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
        fixed = self.mapping_mode in (MappingMode.NONE,
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
            if len(pts):
                self._maps_populated = True
        self._reshard_maps()

    # ------------------------------------------------------------------
    # Full-state checkpoint / resume (beyond the reference's PCD-only
    # Save/LoadMapsToPCD: one snapshot of maps + trajectory + pose state,
    # the multi-hour-run restart story of SURVEY.md §5)
    # ------------------------------------------------------------------

    def save_checkpoint(self, path: str):
        """Snapshot maps, rolling origin, pose state and the trajectory log
        into one .npz. Keypoint logs are not included (use logging_storage
        DISK for bounded-memory replay logs)."""
        arrs = {
            "map_origin": self.map_origin, "Tworld": self.Tworld,
            "PreviousTworld": self.PreviousTworld, "Trelative": self.Trelative,
            "kf_last_pose": self.kf_last_pose,
            "kf_counter": np.int64(self.kf_counter),
            "covariance": self.covariance,
            "n_frames": np.int64(self.n_frames),
            "azimuthal_resolution": np.float64(self.azimuthal_resolution),
            "maps_populated": np.bool_(self._maps_populated),
            "traj_times": np.array([e["time"] for e in self.log_trajectory]),
            "traj_poses": np.stack([e["pose"] for e in self.log_trajectory])
            if self.log_trajectory else np.zeros((0, 4, 4)),
            "traj_covs": np.stack([e["covariance"] for e in self.log_trajectory])
            if self.log_trajectory else np.zeros((0, 6, 6)),
        }
        for k in self.cfg.used_types:
            m = jax.tree.map(np.asarray, self.maps[k])
            for field, v in zip(m._fields, m):
                arrs[f"map{int(k)}_{field}"] = v
        np.savez_compressed(path, **arrs)

    def load_checkpoint(self, path: str):
        """Restore a save_checkpoint snapshot (config must match the saved
        map capacities)."""
        z = np.load(path)
        self.reset()
        self.map_origin = z["map_origin"]
        self.Tworld = z["Tworld"]
        self.PreviousTworld = z["PreviousTworld"]
        self.Trelative = z["Trelative"]
        self.kf_last_pose = z["kf_last_pose"]
        self.kf_counter = int(z["kf_counter"])
        self.covariance = z["covariance"]
        self.n_frames = int(z["n_frames"])
        self.azimuthal_resolution = float(z["azimuthal_resolution"])
        self._maps_populated = bool(z["maps_populated"])
        self.log_trajectory = [
            {"time": float(t), "pose": p, "covariance": c}
            for t, p, c in zip(z["traj_times"], z["traj_poses"], z["traj_covs"])]
        for k in self.cfg.used_types:
            fields = {f: jnp.asarray(z[f"map{int(k)}_{f}"])
                      for f in voxel_map.VoxelMap._fields}
            if fields["xyz"].shape[0] != self.map_cfgs[k].capacity:
                raise ValueError("checkpoint map capacity mismatch")
            self.maps[k] = voxel_map.VoxelMap(**fields)
            # re-baseline the host-side overflow tracker so the first frame
            # after a restore doesn't report the whole pre-checkpoint drop
            # count as fresh (and debug counters stay continuous)
            self.map_overflow[int(k)] = int(np.asarray(fields["overflow"]))
        self._reshard_maps()

    def start_profiling(self, log_dir: str):
        """Start a jax.profiler trace of the device pipeline (the TPU-side
        counterpart of the reference's Utils::Timer verbosity instrumentation,
        Utilities.h:353-399). View with TensorBoard / Perfetto."""
        jax.profiler.start_trace(log_dir)

    def stop_profiling(self):
        jax.profiler.stop_trace()

    def get_timing_summary(self) -> dict:
        """Host-side named-timer accumulators (verbosity >= 3 stages)."""
        return timer.summary()

    def get_registered_frame(self, frame: dict) -> np.ndarray:
        """Full sweep transformed into WORLD coordinates with undistortion
        (Slam::GetRegisteredFrame / AggregateFrames(world), Slam.cxx:1512-1578)."""
        pts = jnp.asarray(np.asarray(frame["xyz"], np.float32))
        if self.current_warp is not None:
            pts = self._warp_points(pts, jnp.asarray(np.asarray(frame["time"], np.float32)),
                                    self.current_warp)
        pts = np.asarray(pts, np.float64)
        return (pts @ self.Tworld[:3, :3].T + self.Tworld[:3, 3]).astype(np.float32)

    def get_debug_array(self) -> dict:
        """Per-keypoint matching debug arrays (Slam::GetDebugArray,
        Slam.cxx:635-657): rejection cause (MatchStatus code) and fit weight
        for every keypoint of the last localization."""
        out = {}
        if getattr(self, "_last_statuses", None) is None:
            return out
        from lidarslam_tpu.config import KEYPOINT_NAMES
        for t, st, w in zip(self.cfg.used_types, self._last_statuses,
                            self._last_weights):
            kp = self.current_keypoints.get(t)
            n = int(kp.count) if kp is not None else 0
            name = KEYPOINT_NAMES[t]
            out[f"{name}_match_status"] = np.asarray(st)[:n]
            out[f"{name}_match_weight"] = np.asarray(w)[:n]
        return out

    def extract_debug(self, frame: dict) -> dict:
        """Re-run extraction on a sweep and return the per-point score/label
        grids (SpinningSensorKeypointExtractor::GetDebugArray parity,
        SSKE.cxx:640-680). On-demand: not part of the fused per-frame path."""
        cfg = self.cfg
        ri = build_range_image(frame["xyz"], frame["intensity"], frame["laser_id"],
                               frame["time"], cfg.extractor.n_rings,
                               cfg.extractor.max_ring_points)
        az = self.azimuthal_resolution if self.azimuthal_resolution > 1e-6 \
            else float(estimate_azimuthal_resolution(ri))
        ext = self._extract(ri, jnp.float32(az), cfg.extractor)
        return {k: np.asarray(v) for k, v in ext.debug.items()}

    def _update_map_overflow(self, overflow):
        """Track map leaves dropped at capacity (RollingGrid has no capacity
        to overflow; this is the TPU fixed-shape analog of the keypoint
        capacity warning)."""
        overflow = np.asarray(overflow, np.int64)
        if self.cfg.verbosity >= 1 and (overflow > self.map_overflow).any():
            from lidarslam_tpu.config import KEYPOINT_NAMES
            for k in self.cfg.used_types:
                d = int(overflow[int(k)] - self.map_overflow[int(k)])
                if d > 0:
                    self._log(f"{KEYPOINT_NAMES[k]} map dropped {d} leaves at "
                              f"capacity {self.map_cfgs[k].capacity}; raise "
                              "map capacity for this environment")
        self.map_overflow = overflow

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
            "map_overflow_edge": int(self.map_overflow[0]),
            "map_overflow_plane": int(self.map_overflow[1]),
            "map_overflow_blob": int(self.map_overflow[2]),
        }

    def _log(self, msg):
        if self.cfg.verbosity > 0:
            print(f"[lidarslam_tpu] {msg}")
