#!/usr/bin/env python
"""Device-time profile of the streaming per-sweep step.

Runs the streaming pipeline on the default bench config, traces a few
steady-state frames with jax.profiler, then parses the xplane protobuf and
prints the top ops by total device time. Use this to decide where the next
kernel effort goes (docs/PERFORMANCE.md workflow).

Usage:
  python scripts/profile_stream.py [--frames 12] [--rings 16]
  python scripts/profile_stream.py --xplane <saved .xplane.pb> [--frames N]

Parsing notes (learned the hard way): only the "XLA Ops" line holds leaf
ops; "Async XLA Ops" holds in-flight DMA spans (copy-start durations are
wait times, not bandwidth) and `while`/`cond` events include their bodies,
so both must be excluded or everything double-counts.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from lidarslam_tpu.utils import profiling  # noqa: E402


def report(xplane_path, n_frames, top):
    tot = profiling.device_busy_ms(xplane_path)
    print(f"# device busy: {tot/n_frames:.2f} ms/frame "
          f"({tot:.0f} ms over {n_frames} frames)")
    dur, cnt, cat, meta = profiling.op_totals(xplane_path)
    print("## op categories, ms/frame")
    for n, ms in cat.most_common(12):
        print(f"  {n:32s} {ms/n_frames:8.2f}")
    print(f"## top ops  ({'op':22s} {'ms/fr':>6s} {'x/fr':>5s} {'us':>7s})")
    for n, ms in dur.most_common(top):
        print(f"  {n:24s} {ms/n_frames:6.3f} x{cnt[n]/n_frames:4.1f} "
              f"{1000*ms/cnt[n]:7.1f} | {meta[n][:70]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=6)
    ap.add_argument("--rings", type=int, default=16)
    ap.add_argument("--azimuth", type=int, default=1800)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--xplane", help="parse an existing .xplane.pb instead of tracing")
    args = ap.parse_args()

    import jax
    if args.xplane:
        report(args.xplane, args.frames, args.top)
        return
    if args.cpu:
        jax.config.update("jax_platform_name", "cpu")
    repo = __file__.rsplit("/", 2)[0]
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import bench_config
    from lidarslam_tpu import Slam
    from lidarslam_tpu.io import synthetic

    # the exact headline bench config (shared shapes = shared compiled
    # programs with bench.py, so profiling here also warms its cache)
    cfg = bench_config(args.rings, args.azimuth)
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

    path = profiling.find_xplane(logdir)
    if path is None:
        print("no xplane produced", file=sys.stderr)
        return
    print(f"# xplane: {path}")
    report(path, args.frames, args.top)


if __name__ == "__main__":
    main()
