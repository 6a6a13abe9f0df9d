"""Per-N scaling of the sharded pipeline on a virtual CPU mesh.

Runs the full per-sweep pipeline (`Slam(cfg, mesh=...)`) on meshes of
1/2/4/8 virtual CPU devices and reports steady-state per-frame latency and
parallel efficiency. NOTE the caveat printed with the results: virtual CPU
devices share one host's cores, so these numbers measure the *overhead* of
the SPMD program (replicated extraction + psum/all_gather) rather than real
multi-chip speedup — the matcher+solver FLOPs per device do drop by 1/N
(that part is the honest signal). On real multi-chip TPU hardware the
per-device matcher work is 1/N with ~us-scale ICI collectives.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/scaling_bench.py [--frames 12] [--sizes 1,2,4,8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")


def weak_mode(args):
    """Isolate the SPMD overhead trend: FIXED total work, growing mesh.

    Times (a) the sharded stage alone — matcher + robust-LM ICP over a
    fixed (Q keypoints, M map slots) problem, keypoints sharded 1/N per
    device with psum-reduced normal equations — and (b) the replicated
    stage alone (keypoint extraction on one device, which every mesh
    member re-executes identically by design). Per-device FLOPs of (a)
    scale 1/N; any rise of the measured time above work/N is the SPMD
    overhead (collectives + oversubscription on a virtual CPU mesh). The
    real-ICI projection printed at the end combines R(1) + S(1)/N with the
    measured overhead trend. Ref: docs/PARALLELISM.md, BASELINE.md >=70%
    scaling target."""
    import numpy as np
    import jax.numpy as jnp

    from lidarslam_tpu.config import (ExtractorConfig, Keypoint,
                                      MatchingConfig, SolverConfig)
    from lidarslam_tpu.io import synthetic
    from lidarslam_tpu.ops import extractor, icp
    from lidarslam_tpu.ops.frame import build_range_image
    from lidarslam_tpu.ops.voxel_map import SubmapView
    from lidarslam_tpu.parallel import sharded

    rng = np.random.default_rng(0)
    Q, M = 2048, 1 << 15
    ground = np.stack([rng.uniform(-20, 20, M // 2), rng.uniform(-20, 20, M // 2),
                       np.zeros(M // 2)], 1)
    wall = np.stack([rng.uniform(-20, 20, M // 2), np.full(M // 2, 8.0),
                     rng.uniform(0, 6, M // 2)], 1)
    plane_pts = np.concatenate([ground, wall]).astype(np.float32)
    t = np.linspace(0, 6, M)
    pole = np.stack([np.full_like(t, 3.0), np.full_like(t, -2.0), t], 1).astype(np.float32)
    kp_p = plane_pts[rng.integers(0, M, Q)] + rng.normal(0, 0.01, (Q, 3)).astype(np.float32)
    kp_e = pole[rng.integers(0, M, Q)] + rng.normal(0, 0.01, (Q, 3)).astype(np.float32)

    def view(pts):
        return SubmapView(xyz=jnp.asarray(pts), ring=jnp.zeros(len(pts), jnp.int32),
                          valid=jnp.ones(len(pts), bool))

    inputs = icp.ICPInputs(
        kp_xyz=(jnp.asarray(kp_e), jnp.asarray(kp_p), None),
        kp_valid=(jnp.ones(Q, bool), jnp.ones(Q, bool), None),
        index=(view(pole), view(plane_pts), None))
    pose0 = jnp.asarray([0.05, -0.03, 0.02, 0.01, -0.01, 0.02], jnp.float32)

    # replicated stage: one device's extraction (identical on every member)
    sensor = synthetic.SensorModel(n_rings=16, n_azimuth=1024)
    fr = synthetic.render_sweep(synthetic.default_world(0), sensor,
                                synthetic.straight_then_turn_trajectory(),
                                0.0, seed=0, motion_distortion=False)
    ri = build_range_image(fr["xyz"], fr["intensity"], fr["laser_id"],
                           fr["time"], 16, 1024)
    ext = jax.jit(extractor.extract_keypoints, static_argnums=(2,))
    ecfg = ExtractorConfig(n_rings=16, max_ring_points=1024, max_keypoints=Q)
    az = jnp.float32(0.006)
    jax.block_until_ready(ext(ri, az, ecfg))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = ext(ri, az, ecfg)
    jax.block_until_ready(out)
    repl_ms = (time.perf_counter() - t0) / reps * 1000

    rows = []
    s1 = None
    for n in [int(s) for s in args.sizes.split(",")]:
        mesh = sharded.make_mesh(n)
        fn = lambda: sharded.sharded_icp_register(
            mesh, inputs, types=(Keypoint.EDGE, Keypoint.PLANE),
            pose0=pose0, params=MatchingConfig(), solver_cfg=SolverConfig(),
            icp_iters=3, lm_max_iter=15, min_matches=20,
            geoms=(None, None, None))
        jax.block_until_ready(fn().pose)          # compile
        t0 = time.perf_counter()
        for _ in range(args.frames):
            res = fn()
        jax.block_until_ready(res.pose)
        sharded_ms = (time.perf_counter() - t0) / args.frames * 1000
        if s1 is None:
            s1 = sharded_ms
        rows.append({"mesh_size": n,
                     "fixed_total_work_ms": round(sharded_ms, 2),
                     "overhead_vs_n1_frac": round(sharded_ms / s1 - 1.0, 3),
                     "per_device_work_ms_ideal": round(s1 / n, 2)})
        print(json.dumps(rows[-1]))
    # real-ICI projection: per-frame time on N chips = R + S(1)/N
    # (replicated extraction + 1/N matcher+solver), discounted by the
    # measured SPMD-overhead fraction at that N
    proj = {r["mesh_size"]: round(
        (repl_ms + s1)
        / (r["mesh_size"] * (repl_ms + s1 / r["mesh_size"])
           * (1.0 + max(r["overhead_vs_n1_frac"], 0.0))), 3)
        for r in rows}
    print(json.dumps({
        "metric": "weak_scaling", "rows": rows,
        "replicated_stage_ms": round(repl_ms, 2),
        "sharded_stage_n1_ms": round(s1, 2),
        "projected_efficiency_real_ici": proj,
        "note": "virtual CPU devices share one host's cores, so at FIXED "
                "total work the wall should be constant across N; any rise "
                "(overhead_vs_n1_frac) is the measured SPMD overhead "
                "(collectives + partitioned-op inefficiency) at constant "
                "FLOPs. projected_efficiency_real_ici = (R+S1) / "
                "(N*(R+S1/N)) discounted by that overhead, with R the "
                "replicated extraction and S1 the one-device sharded "
                "stage — the BASELINE.md >=70% target projection."}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--warmup", type=int, default=4)
    ap.add_argument("--weak", action="store_true",
                    help="fixed-total-work SPMD overhead isolation mode")
    args = ap.parse_args()
    if args.weak:
        return weak_mode(args)

    from lidarslam_tpu.config import ExtractorConfig, MapConfig, SlamConfig
    from lidarslam_tpu.io import synthetic
    from lidarslam_tpu.parallel import sharded
    from lidarslam_tpu.slam import Slam

    cfg = SlamConfig(
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024,
                                  max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
    )
    frames = synthetic.generate_sequence(
        n_frames=args.frames, motion_distortion=False,
        sensor=synthetic.SensorModel(range_noise=0.005))

    results = {}
    for n in [int(s) for s in args.sizes.split(",")]:
        mesh = sharded.make_mesh(n)
        slam = Slam(cfg, mesh=mesh)
        ts = []
        for i, f in enumerate(frames):
            t0 = time.perf_counter()
            slam.add_frame(f)
            ts.append(time.perf_counter() - t0)
        steady = ts[args.warmup:]
        per_frame = sum(steady) / len(steady)
        results[n] = per_frame
        eff = results[min(results)] / per_frame / (n / min(results))
        print(json.dumps({
            "mesh_size": n, "per_frame_s": round(per_frame, 4),
            "scans_per_s": round(1.0 / per_frame, 2),
            "vs_n1": round(results[min(results)] / per_frame, 3),
        }))
    print(json.dumps({
        "note": "virtual CPU mesh: devices share one host's cores; "
                "matcher+solver FLOPs per device scale 1/N, extraction and "
                "map update are replicated by design (see docs/PARALLELISM.md)"
    }))


if __name__ == "__main__":
    main()
