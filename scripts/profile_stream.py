#!/usr/bin/env python
"""Device-time profile of the streaming per-sweep step.

Runs the streaming pipeline on the default bench config, traces a few
steady-state frames with jax.profiler, then parses the xplane protobuf and
prints the top ops by total device time. Use this to decide where the next
kernel effort goes (docs/PERFORMANCE.md workflow).

Usage: python scripts/profile_stream.py [--frames 12] [--rings 16]
"""

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=6)
    ap.add_argument("--rings", type=int, default=16)
    ap.add_argument("--azimuth", type=int, default=1800)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platform_name", "cpu")
    repo = __file__.rsplit("/", 2)[0]
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lidarslam_tpu import Slam, SlamConfig
    from lidarslam_tpu.config import ExtractorConfig, MapConfig
    from lidarslam_tpu.io import synthetic

    ring_cap = 1 << (args.azimuth - 1).bit_length()
    kp_cap = 2048 if args.rings <= 32 else 8192
    cfg = SlamConfig(
        extractor=ExtractorConfig(n_rings=args.rings, max_ring_points=ring_cap,
                                  max_keypoints=kp_cap),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 16),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 16),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 16),
    )
    n_total = args.warmup + args.frames
    sensor = synthetic.SensorModel(n_rings=args.rings, n_azimuth=args.azimuth)
    frames = synthetic.generate_sequence(n_frames=n_total, sensor=sensor,
                                         motion_distortion=False)

    slam = Slam(cfg)
    for i in range(args.warmup):
        slam.add_frame_async(frames[i])
    slam.flush()

    logdir = tempfile.mkdtemp(prefix="lst_prof_")
    with jax.profiler.trace(logdir):
        for i in range(args.warmup, n_total):
            slam.add_frame_async(frames[i])
        slam.flush()

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane produced", file=sys.stderr)
        return
    pd = jax.profiler.ProfileData.from_file(paths[0])
    per_op = collections.Counter()
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name and "ops" not in line.name.lower():
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                per_op[ev.name] += dur
                total += dur
    print(f"# device op time over {args.frames} frames: {total:.1f} ms "
          f"({total/args.frames:.2f} ms/frame)")
    print(f"{'op':70s} {'ms/frame':>9s} {'%':>6s}")
    for name, ms in per_op.most_common(args.top):
        print(f"{name[:70]:70s} {ms/args.frames:9.3f} {100*ms/total:6.1f}")


if __name__ == "__main__":
    main()
