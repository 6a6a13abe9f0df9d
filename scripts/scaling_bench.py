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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--warmup", type=int, default=4)
    args = ap.parse_args()

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
