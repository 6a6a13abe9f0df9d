#!/usr/bin/env python
"""Accuracy report: ATE/RPE vs simulator ground truth across scenario
configs (the BASELINE.json config axes, run offline on synthetic golden
sequences). Writes a markdown table to stdout.

Usage: python scripts/accuracy_report.py [--frames N] [--cpu]
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _street_frame_cap(speed, sweep_duration=0.1, x_max=120.0):
    """Max frame count before `weaving_street_trajectory` leaves the modeled
    street (valid x range ends at ~120 m — synthetic.py docstring). Past it
    the ray caster returns degenerate geometry and 'failures' measure the
    scenario, not the tracker."""
    return int(x_max / (speed * sweep_duration))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only-pgo", action="store_true",
                    help="run only the GPS-prior PGO scenario")
    ap.add_argument("--only-moving", action="store_true",
                    help="run only the moving-object rejection scenario")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platform_name", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    from lidarslam_tpu import Slam, SlamConfig, evaluation
    from lidarslam_tpu.config import ExtractorConfig, MapConfig, UndistortionMode
    from lidarslam_tpu.core import se3
    from lidarslam_tpu.io import synthetic

    def cfg16(**kw):
        return SlamConfig(
            extractor=ExtractorConfig(n_rings=16, max_ring_points=2048,
                                      max_keypoints=2048),
            edge_map=MapConfig(leaf_size=0.30, capacity=1 << 16),
            plane_map=MapConfig(leaf_size=0.60, capacity=1 << 16),
            blob_map=MapConfig(leaf_size=0.30, capacity=1 << 16), **kw)

    def cfg64(**kw):
        return SlamConfig(
            extractor=ExtractorConfig(n_rings=64, max_ring_points=2048,
                                      max_keypoints=8192),
            edge_map=MapConfig(leaf_size=0.30, capacity=1 << 16),
            plane_map=MapConfig(leaf_size=0.60, capacity=1 << 16),
            blob_map=MapConfig(leaf_size=0.30, capacity=1 << 16), **kw)

    scenarios = [
        ("VLP-16 urban 2 m/s (no distortion)", cfg16(),
         dict(trajectory=synthetic.straight_then_turn_trajectory(2.0, 6.0, 2.0),
              motion_distortion=False, sensor=synthetic.SensorModel())),
        ("VLP-16 fast 4 m/s + 12 deg/s, REFINED undistortion",
         cfg16(undistortion=UndistortionMode.REFINED),
         dict(trajectory=synthetic.straight_then_turn_trajectory(4.0, 12.0, 0.8),
              motion_distortion=True, sensor=synthetic.SensorModel())),
        ("HDL-64 highway 10 m/s, REFINED undistortion",
         cfg64(undistortion=UndistortionMode.REFINED),
         dict(trajectory=synthetic.straight_then_turn_trajectory(10.0, 2.0, 2.5),
              motion_distortion=True,
              sensor=synthetic.SensorModel(n_rings=64, n_azimuth=1024,
                                           elevation_min_deg=-24.8,
                                           elevation_max_deg=2.0))),
        # long-horizon 64-beam: 30-frame rows hide late-sequence failure
        # modes (round-3 VERDICT item 7); the corridor-bound trajectory is
        # valid for the whole street, so the full horizon is meaningful
        ("HDL-64 street 2 m/s, long horizon, REFINED undistortion",
         cfg64(undistortion=UndistortionMode.REFINED),
         dict(trajectory=synthetic.weaving_street_trajectory(),
              motion_distortion=True,
              sensor=synthetic.SensorModel(n_rings=64, n_azimuth=1024,
                                           elevation_min_deg=-24.8,
                                           elevation_max_deg=2.0),
              n_frames=min(4 * args.frames, _street_frame_cap(2.0)))),
    ]

    rows = []
    if args.only_pgo or args.only_moving:
        scenarios = []
    for name, cfg, seqkw in scenarios:
        seqkw = dict(seqkw)
        n_frames = seqkw.pop("n_frames", args.frames)
        frames = synthetic.generate_sequence(n_frames=n_frames, **seqkw)
        slam = Slam(cfg)
        est, gt = [], []
        gt0 = frames[0]["gt_pose"]
        failed = 0
        for f in frames:
            r = slam.add_frame(f)
            failed += int(r.get("failure", False))
            est.append(r["pose"])
            gt.append(se3.hmat_inverse(gt0) @ f["gt_pose"])
        ate = evaluation.absolute_trajectory_error(est, gt, align=False)
        rpe_t, rpe_r = evaluation.relative_pose_error(est, gt)
        dist = sum(np.linalg.norm((se3.hmat_inverse(gt[i]) @ gt[i + 1])[:3, 3])
                   for i in range(len(gt) - 1))
        rows.append((f"{name} ({n_frames} fr)", ate, rpe_t, rpe_r, dist, failed))
        print(f"# done: {name}", file=sys.stderr)

    print("| Scenario | path [m] | ATE rmse [m] | ATE max [m] "
          "| RPE trans [m] | RPE rot [deg] | failures |")
    print("|---|---|---|---|---|---|---|")
    for name, ate, rpe_t, rpe_r, dist, failed in rows:
        print(f"| {name} | {dist:.1f} | {ate.rmse:.3f} | {ate.max:.3f} "
              f"| {rpe_t.mean:.4f} | {rpe_r.mean:.3f} | {failed} |")

    # ---- moving-object rejection (min_frames_per_voxel) end to end ----
    # A 2.5 x 1.2 x 1.6 m box (vehicle analog) crosses the street at 4 m/s
    # while the sensor drives toward it. `min_frames_per_voxel=2` must (a)
    # keep its transient returns out of the matching submaps AND the clean
    # map (RollingGrid.cxx:362-442 + Get(clean) semantics) while (b)
    # leaving the trajectory unchanged — rejection must not starve the
    # tracker of static structure.
    if not args.only_pgo:
        world = synthetic.default_world(seed=0)
        if args.only_moving:
            args.frames = max(args.frames, 20)
        world.boxes.append(synthetic.Box(
            lo=np.array([14.0, -9.0, 0.0]), hi=np.array([16.5, -7.8, 1.6]),
            intensity=70.0, velocity=np.array([0.0, 4.0, 0.0])))
        mv_frames = synthetic.generate_sequence(
            n_frames=min(40, args.frames * 2), world=world,
            motion_distortion=False,
            trajectory=synthetic.weaving_street_trajectory(weave_amp=1.0))

        def mover_contamination(slam):
            """Clean map points inside the mover's swept corridor band
            (static geometry there: ground below z=0.1 and a few thin
            cylinders, both excluded). The engine's world frame is anchored
            at the FIRST pose (identity), so map points are brought back to
            simulator coordinates through gt0 before the region test."""
            gt0 = mv_frames[0]["gt_pose"]
            n = 0
            for k in slam.cfg.used_types:
                xyz = slam.get_map_points(k, clean=True)[0]
                xyz = xyz @ gt0[:3, :3].T.astype(np.float32) \
                    + gt0[:3, 3].astype(np.float32)
                m = ((xyz[:, 0] > 13.5) & (xyz[:, 0] < 17.0)
                     & (np.abs(xyz[:, 1]) < 5.5)
                     & (xyz[:, 2] > 0.1) & (xyz[:, 2] < 2.0))
                pts = xyz[m]
                for cyl in world.cylinders:
                    if 12.5 < cyl.center[0] < 18.0:
                        d = np.linalg.norm(pts[:, :2] - cyl.center, axis=1)
                        pts = pts[d > cyl.radius + 0.5]
                n += len(pts)
            return n

        mv_rows = []
        for label, mfpv in (("filter off (min_frames_per_voxel=0)", 0),
                            ("filter on  (min_frames_per_voxel=2)", 2)):
            cfg = cfg16()
            cfg = dataclasses.replace(
                cfg,
                edge_map=dataclasses.replace(cfg.edge_map,
                                             min_frames_per_voxel=mfpv),
                plane_map=dataclasses.replace(cfg.plane_map,
                                              min_frames_per_voxel=mfpv),
                blob_map=dataclasses.replace(cfg.blob_map,
                                             min_frames_per_voxel=mfpv))
            slam = Slam(cfg)
            gt0 = mv_frames[0]["gt_pose"]
            est, gt, failed = [], [], 0
            for f in mv_frames:
                r = slam.add_frame(f)
                failed += int(r.get("failure", False))
                est.append(r["pose"])
                gt.append(se3.hmat_inverse(gt0) @ f["gt_pose"])
            ate = evaluation.absolute_trajectory_error(est, gt, align=False)
            mv_rows.append((label, ate.rmse, mover_contamination(slam), failed))
            print(f"# done: moving object, {label}", file=sys.stderr)
        print()
        print("| Moving-object scenario (box crossing at 4 m/s, "
              f"{len(mv_frames)} fr) | ATE rmse [m] | mover points in clean "
              "map | failures |")
        print("|---|---|---|---|")
        for label, rmse, contam, failed in mv_rows:
            print(f"| {label} | {rmse:.3f} | {contam} | {failed} |")

    if args.only_moving:
        return

    # ---- loop-closure-style correction: PGO with GPS priors cuts ATE ----
    # (the reference's GPS/SLAM calibration + pose-graph use case,
    # ros_wrapping command 2/3; tied to tests/test_posegraph.py).
    # The engine must actually DRIFT more than the GPS noise for the
    # correction to be meaningful: fast motion, heavy range noise, a
    # starved keypoint budget — then 2 cm GPS priors pull it back. ATE is
    # ALIGNED (evo convention) on both sides — the reference's post-PGO
    # re-anchor at the first optimized pose (Slam.cxx:404-419 parity) makes
    # unaligned ATE anchor-noise-dominated, which measures the convention,
    # not the correction.
    name = "VLP-16 drifted (4 m/s, sigma 8 cm, 256 kp) + GPS-prior PGO"
    frames = synthetic.generate_sequence(
        n_frames=min(8 * args.frames, _street_frame_cap(4.0)),
        motion_distortion=False,
        trajectory=synthetic.weaving_street_trajectory(speed=4.0),
        sensor=synthetic.SensorModel(range_noise=0.08))
    drift_cfg = SlamConfig(
        extractor=ExtractorConfig(n_rings=16, max_ring_points=2048,
                                  max_keypoints=256),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 16),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 16),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 16),
        logging_timeout=-1.0)
    slam = Slam(drift_cfg)
    gt0 = frames[0]["gt_pose"]
    gt = [se3.hmat_inverse(gt0) @ f["gt_pose"] for f in frames]
    est = [slam.add_frame(f)["pose"] for f in frames]
    ate_before = evaluation.absolute_trajectory_error(est, gt, align=True)
    rng = np.random.default_rng(0)
    gps_sigma = 0.02
    gps_pos = np.stack([g[:3, 3] for g in gt]) + rng.normal(0, gps_sigma, (len(gt), 3))
    gps_times = np.array([f["stamp"] for f in frames])
    ok = slam.run_pose_graph_optimization(
        gps_pos, gps_times,
        gps_covariances=[np.eye(3) * gps_sigma**2] * len(gt))
    est_pgo = [e["pose"] for e in slam.log_trajectory]
    ate_after = evaluation.absolute_trajectory_error(est_pgo, gt, align=True)
    print()
    print(f"| PGO scenario ({len(frames)} fr, GPS sigma {gps_sigma} m) "
          "| aligned ATE rmse before [m] | after [m] | converged |")
    print("|---|---|---|---|")
    print(f"| {name} | {ate_before.rmse:.3f} | {ate_after.rmse:.3f} | {bool(ok)} |")


if __name__ == "__main__":
    main()
