#!/usr/bin/env python
"""Pose-graph solver timing artifact: scan vs segment-Schur vs mesh-sharded.

Times optimize_pose_graph_device on synthetic N-pose loop-drift graphs with
GPS priors (the PoseGraphOptimization.cxx:112-285 workload) for each solver
path and prints a table + one JSON line. Run on the 8-device CPU mesh:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/pgo_bench.py --sizes 256 1024 4096

The round-1 target this records: 1,000-pose graph in <= 1 s (post-compile).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def make_graph(n, drift=0.02, seed=7):
    import numpy as np
    from lidarslam_tpu.core import se3

    rng = np.random.default_rng(seed)
    gt, noisy = [np.eye(4)], [np.eye(4)]
    for _ in range(1, n):
        step = np.eye(4)
        step[:3, :3] = se3.so3_exp([0, 0, 0.02])
        step[0, 3] = 1.0
        gt.append(gt[-1] @ step)
        nstep = step.copy()
        nstep[:3, 3] += rng.normal(0, drift, 3)
        nstep[:3, :3] = nstep[:3, :3] @ se3.so3_exp(rng.normal(0, 0.002, 3))
        noisy.append(noisy[-1] @ nstep)
    times = np.arange(n) * 0.1
    covs = [np.eye(6) * 1e-3] * n
    gps_t = times[::5]
    gps_p = np.stack([gt[i][:3, 3] for i in range(0, n, 5)])
    gps_p = gps_p + rng.normal(0, 0.01, gps_p.shape)
    return noisy, times, covs, gps_p, gps_t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[256, 1024, 4096])
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    # the PGO backend runs float64 (world-scale coordinates): f64 linalg is
    # host-side — force the CPU backend regardless of the session platform
    jax.config.update("jax_platform_name", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    from lidarslam_tpu.backend.posegraph_device import optimize_pose_graph_device

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("seg",)) if n_dev > 1 else None

    rows = []
    for n in args.sizes:
        g = make_graph(n)
        variants = [("scan", dict(n_segments=0)),
                    ("schur-8", dict(n_segments=8)),
                    ("schur-32", dict(n_segments=32))]
        if mesh is not None:
            variants.append((f"sharded-{n_dev}dev", dict(mesh=mesh)))
        row = {"n_poses": n}
        base = None
        for name, kw in variants:
            optimize_pose_graph_device(*g[:3], gps_positions=g[3],
                                       gps_times=g[4], **kw)  # compile
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                poses, cost = optimize_pose_graph_device(
                    *g[:3], gps_positions=g[3], gps_times=g[4], **kw)
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            row[name] = round(dt, 4)
            if base is None:
                base, base_poses = dt, poses
            else:
                d = max(np.abs(a - b).max() for a, b in zip(base_poses, poses))
                assert d < 1e-5, f"{name} diverged from scan by {d}"
        rows.append(row)
        print(f"# {row}", file=sys.stderr)
    print(json.dumps({"metric": "pgo_seconds", "backend": jax.default_backend(),
                      "n_devices": n_dev, "rows": rows}))


if __name__ == "__main__":
    main()
