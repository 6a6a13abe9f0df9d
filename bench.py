#!/usr/bin/env python
"""Benchmark: steady-state scans/s of the full SLAM pipeline.

Runs the complete per-sweep pipeline (range image -> extraction -> ego-motion
-> scan-to-map ICP -> map update) and prints ONE JSON line. By default BOTH
headline configs are measured: the primary VLP-16-class stream (16 rings,
~24k pts) and the 64-beam KITTI-class stream (64 rings, 8k keypoint budget,
~98k pts) — each with its device-busy fraction and a measured
roofline/MFU estimate (analytic FLOP+byte model of the dominant kernels over
the traced device time, vs the chip's public bf16/HBM peaks).

Baseline: the reference's stated real-time target of keeping up with a 10 Hz
spinning LiDAR on a commodity CPU (BASELINE.md — the reference publishes no
absolute scans/s), so vs_baseline = scans_per_sec / 10.
"""

import argparse
import json
import os
import sys
import time

_T0 = time.perf_counter()


def _log(msg):
    """Unconditional coarse progress on stderr: a timeout must leave
    forensics about WHERE the run was (round-4 lesson: BENCH_r04 timed out
    with zero output because all progress sat behind --verbose and the one
    JSON line printed only at the very end)."""
    print(f"# [{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _emit(record):
    """Emit one COMPLETE JSON line now and flush. Called after every
    milestone (primary config measured, roofline added, 64-beam added) so
    an external timeout still leaves the latest complete measurement on
    stdout; each line supersedes the previous one."""
    print(json.dumps(record), flush=True)

# public TPU v5e peaks (chip in this environment: "TPU v5 lite"):
# 197 TFLOP/s bf16 MXU, 819 GB/s HBM. The f32 VPU peak is not published;
# fractions below use the bf16 MXU peak as a conservative UPPER-BOUND
# denominator, so frac_* values understate true utilization.
V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def _roofline(cfg, device_ms_per_frame, xplane, nprof):
    """Analytic FLOP+byte model of the dominant kernel (the brute/Pallas
    k-NN: the matcher scans M map slots per query, 8 flops per distance;
    HBM traffic = the 3 map coordinate planes per TQ=64-query tile) over
    the MEASURED device time, plus the top traced op categories. The model
    counts un-pruned work, so achieved_* are upper bounds on useful
    arithmetic; frac_hbm_peak ~ how far the fused kernel sits from
    bandwidth-bound (staying low is the point of keeping distances in
    VMEM)."""
    from lidarslam_tpu.config import Keypoint
    from lidarslam_tpu.utils import profiling

    # reuse_knn runs the map scan once per frame, not once per ICP round
    rounds = 1 if cfg.loc_matching.reuse_knn else cfg.localization_icp_max_iter
    flops = 0.0
    bytes_ = 0.0
    for t in cfg.used_types:
        Q = cfg.extractor.kp_capacity(t)
        M = cfg.map_config(t).capacity
        flops += rounds * Q * M * 8.0
        bytes_ += rounds * (Q / 64.0) * M * 12.0
    out = {
        "model_gflop_per_frame": round(flops / 1e9, 2),
        "model_hbm_mb_per_frame": round(bytes_ / 1e6, 1),
        "achieved_tflops": round(flops / 1e12 / (device_ms_per_frame / 1e3), 2),
        "achieved_hbm_gbps": round(bytes_ / 1e9 / (device_ms_per_frame / 1e3), 1),
    }
    out["frac_bf16_peak"] = round(out["achieved_tflops"] / V5E_BF16_TFLOPS, 3)
    out["frac_hbm_peak"] = round(out["achieved_hbm_gbps"] / V5E_HBM_GBPS, 3)
    # where the device time actually goes (top leaf-op categories, ms/frame)
    try:
        _, _, cat, _ = profiling.op_totals(xplane)
        top = cat.most_common(3)
        out["top_ops_ms_per_frame"] = {k: round(v / nprof, 2) for k, v in top}
    except Exception:
        pass
    return out


def _tunnel_health():
    """Measure the host<->device link at bench time and record it in the
    JSON: the tunnel's upload bandwidth swings between ~1.3 GB/s and
    ~60 MB/s across minutes (shared infrastructure), and in degraded
    phases the sweep uploads — not device compute — bound the wall. This
    stamp lets any captured number be read in context."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    try:
        # sync via a scalar fetch, not block_until_ready (which can return
        # before remote completion on the tunneled platform — see
        # _device_health)
        def sync(x):
            return float(jnp.sum(x[:64].astype(jnp.int32)))

        big = np.zeros(4 << 20, np.uint8)
        sync(jnp.asarray(big))                         # warm path
        t0 = time.perf_counter()
        for _ in range(4):
            sync(jnp.asarray(big))
        dt = (time.perf_counter() - t0) / 4
        t0 = time.perf_counter()
        small = np.zeros(64, np.uint8)
        for _ in range(10):
            sync(jnp.asarray(small))
        rtt = (time.perf_counter() - t0) / 10
        # the 4 MB upload time includes one RTT of sync; subtract it
        dt = max(dt - rtt, 1e-9)
        return {"tunnel_upload_mbps": round(big.nbytes / dt / 1e6, 0),
                "tunnel_rtt_ms": round(rtt * 1000, 2)}
    except Exception:
        return {}


def _device_health():
    """Stamp the CHIP's speed at bench time with two fixed reference ops
    (a 2048^3 bf16 matmul -> achieved TFLOP/s, and a 64 MB f32 streaming
    add -> achieved HBM GB/s). The tunneled chip is shared infrastructure:
    the same compiled program has measured 1.5-1.8x slower device time
    across captures hours apart (round 4), so absolute scans/s are only
    comparable through this stamp.

    Both probes CHAIN the timed executions on their own outputs and sync
    via a SCALAR VALUE FETCH, not `block_until_ready`: on the tunneled
    platform block_until_ready can return before remote execution
    finishes (round-5 captures read 3,000-20,000 "TFLOP/s" against a 197
    peak with it; a reduce-to-scalar fetch — which must materialize the
    result — reads a stable ~35-75). The 64 MB buffer also exceeds the
    16 MB VMEM so the loop carry provably streams through HBM."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        from jax import lax

        def timed(fn, x, per_call, chain=3):
            float(jnp.sum(fn(x)))              # warm + full remote sync
            t0 = time.perf_counter()
            out = x
            for _ in range(chain):
                out = fn(out)                  # distinct input each call
            float(jnp.sum(out))                # forced materialization
            return (time.perf_counter() - t0) / (per_call * chain)

        # chain the reference ops ON DEVICE (one dispatch >> tunnel RTT),
        # else the stamp measures dispatch latency instead of the chip.
        # scale down each iteration so the chained carry cannot overflow.
        n, iters = 2048, 64
        a = jnp.asarray(np.random.default_rng(0).normal(size=(n, n)) / n,
                        jnp.bfloat16)
        mm = jax.jit(lambda x: lax.fori_loop(
            0, iters, lambda i, c: (x @ c) * jnp.bfloat16(0.5), x))
        dt_mm = timed(mm, a, iters)
        big = jnp.zeros((16 << 20,), jnp.float32)   # 64 MB
        cp = jax.jit(lambda x: lax.fori_loop(0, 64, lambda i, c: c + 1.0, x))
        dt_cp = timed(cp, big, 64)
        return {"device_matmul_tflops": round(2 * n**3 / dt_mm / 1e12, 1),
                "device_hbm_gbps": round(2 * big.nbytes / dt_cp / 1e9, 0)}
    except Exception:
        return {}


def bench_config(rings, azimuth):
    """The headline SlamConfig of one ring count. Keypoint budgets are
    per-type: plane candidates outnumber edges 3-5x in structured scenes
    (measured on the bench world: 3241 planes at VLP-16, 13229 at
    64-beam), and a saturated budget degrades to even subsampling where
    the reference keeps every labeled point (SSKE.cxx:575-589) — so planes
    get 2x the edge budget instead of inflating both. The k-NN kernel
    skips dead query tiles, so the unfilled tail of a budget is ~free;
    the real device cost is proportional to LIVE keypoints.
    BENCH_PLANE_FACTOR=1 reverts to the uniform budget (A/B harness).

    Localization matching runs `reuse_knn` (query the map k-NN once per
    frame, reuse neighbor coordinates across ICP rounds with exact
    re-posed distances): the round-5 in-process hardware A/B at 64-beam
    measured device 15.55 -> 10.79 ms/frame (k-NN 9.32 -> 3.08) at a max
    4 mm / mean 0.9 mm pose divergence over 60 frames vs the
    per-round-requery mode — inside the reference CI's own 0.01 m pose
    tolerance (eval.yaml:13). BENCH_EXACT_KNN=1 restores per-round
    re-query (reference-exact semantics, the library default)."""
    import dataclasses

    from lidarslam_tpu import SlamConfig
    from lidarslam_tpu.config import ExtractorConfig, MapConfig, MatchingConfig

    factor = int(os.environ.get("BENCH_PLANE_FACTOR", "2"))
    reuse = os.environ.get("BENCH_EXACT_KNN", "0") != "1"
    ring_cap = 1 << (azimuth - 1).bit_length()
    kp_cap = 2048 if rings <= 32 else 8192
    return SlamConfig(
        extractor=ExtractorConfig(n_rings=rings, max_ring_points=ring_cap,
                                  max_keypoints=kp_cap,
                                  max_plane_keypoints=factor * kp_cap),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 16),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 16),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 16),
        loc_matching=MatchingConfig(reuse_knn=reuse),
    )


def run_config(args, rings, azimuth, frames_n, warmup, profile_frames,
               deadline=None):
    """Measure one config. `deadline` (absolute perf_counter value) sheds
    work gracefully: extra reps are dropped once past it (at least one
    always runs) and the profile trace is skipped when fewer than 45 s
    remain — a partial measurement beats rc-124 silence."""
    import jax
    import numpy as np
    from lidarslam_tpu import Slam
    from lidarslam_tpu.io import synthetic

    def remaining():
        return float("inf") if deadline is None else deadline - time.perf_counter()

    cfg = bench_config(rings, azimuth)
    kp_caps = [cfg.extractor.kp_capacity(t) for t in range(3)]

    n_total = warmup + args.reps * frames_n
    nprof = profile_frames if args.profile else 0
    sensor = synthetic.SensorModel(n_rings=rings, n_azimuth=azimuth)
    t0 = time.perf_counter()
    # corridor-bound trajectory: straight_then_turn leaves the street after
    # ~18 s and drives into the building band (the r03 bench measured five
    # "failed" frames that were really the sensor inside a solid box)
    frames = synthetic.generate_sequence(n_frames=n_total + nprof, sensor=sensor,
                                         trajectory=synthetic.weaving_street_trajectory(),
                                         motion_distortion=False)
    _log(f"[{rings}r] rendered {n_total + nprof} sweeps "
         f"(~{len(frames[0]['xyz'])} pts each) in {time.perf_counter()-t0:.1f}s")

    slam = Slam(cfg)
    if args.stream:
        # warm every graph variant the timed loop uses — first-frame, the
        # windowed scan, the per-frame partial-window drain, AND the
        # seeded segment restart (two warmup segments) — so the timed
        # section replays cached executables only
        t0 = time.perf_counter()
        _log(f"[{rings}r] warmup x{warmup} starting (cold compile cache "
             "pays multi-minute tunnel compiles here; warm cache replays)")
        half = max(warmup // 2, 1)
        for i in range(half):
            slam.add_frame_async(frames[i])
        slam.flush()
        _log(f"[{rings}r] warmup segment 1 done "
             f"({time.perf_counter()-t0:.1f}s)")
        for i in range(half, warmup):
            slam.add_frame_async(frames[i])
        rs = slam.flush()
        _log(f"[{rings}r] warmup x{warmup} done: "
             f"{(time.perf_counter()-t0)*1000:.0f} ms total, "
             f"matches={rs[-1].get('n_matches') if rs else None}")
    else:
        for i in range(warmup):
            r = slam.add_frame(frames[i])
            if args.verbose:
                print(f"# [{rings}r] warmup {i}: {r.get('duration', 0)*1000:.0f} ms "
                      f"matches={r.get('n_matches')}", file=sys.stderr)
        _log(f"[{rings}r] warmup x{warmup} done (sync mode)")

    # best-of-R repetitions: the host<->device tunnel's latency/bandwidth
    # fluctuates across minutes (measured 5.8..21 ms/frame wall at IDENTICAL
    # 4.85 ms device time), so a single window can understate steady-state
    # capability several-fold. Each rep is an independent enqueue+flush
    # segment; `value` is the best rep, with all reps recorded.
    reps = []
    per_rep = frames_n
    n_failed = 0
    min_matches = None
    kp_hits = [False, False, False]   # per-type capacity hit on ANY frame
    for rep in range(args.reps):
        if rep > 0 and remaining() < 45:
            _log(f"[{rings}r] budget: shedding reps {rep}..{args.reps - 1}")
            break
        lo = warmup + rep * per_rep
        t0 = time.perf_counter()
        if args.stream:
            for i in range(lo, lo + per_rep):
                slam.add_frame_async(frames[i])
            outs = slam.flush()
            wall = time.perf_counter() - t0
        else:
            outs = []
            for i in range(lo, lo + per_rep):
                nxt = frames[i + 1] if i + 1 < len(frames) else None
                outs.append(slam.add_frame(frames[i], next_frame=nxt))
            wall = time.perf_counter() - t0
        for i, r in enumerate(outs):
            if r.get("failure"):
                n_failed += 1
                _log(f"WARNING frame {lo + i} failed")
            m = r.get("n_matches")
            if m is not None:
                min_matches = m if min_matches is None else min(min_matches, m)
            kc = r.get("kp_counts")
            if kc is not None:
                for t in range(3):
                    kp_hits[t] |= int(kc[t]) >= kp_caps[t]
        reps.append(per_rep / wall)
        _log(f"[{rings}r] rep {rep}: {1000*wall/per_rep:.1f} ms/frame "
             f"({reps[-1]:.1f} scans/s), backend {jax.default_backend()}")

    scans_per_sec = max(reps)
    wall = per_rep / scans_per_sec
    frames_n = per_rep
    # robustness surface: a throughput number measured while the tracker is
    # lost is not a valid number, so make failures/capacity machine-visible
    dbg = slam.get_debug_information()
    record = {"scans_per_sec": round(scans_per_sec, 2),
              "reps_scans_per_sec": [round(r, 2) for r in reps],
              "n_failed_frames": n_failed,
              "min_matches": min_matches,
              "map_overflow": {k.rsplit("_", 1)[1]: v for k, v in dbg.items()
                               if k.startswith("map_overflow")},
              "kp_capacity_hits": {
                  t.name.lower(): kp_hits[int(t)]
                  for t in cfg.used_types}}
    for t in cfg.used_types:
        if kp_hits[int(t)]:
            _log(f"WARNING [{rings}r] {t.name} keypoints saturated their "
                 f"budget ({kp_caps[int(t)]}) on at least one frame — the "
                 "extractor subsampled where the reference keeps all points")

    # device-busy fraction: trace a short continuation window and sum the
    # trace's "XLA Modules" occupancy (utils/profiling.py). The fraction is
    # taken against the UNTRACED steady-state wall (tracing itself inflates
    # host time); busy/wall < 1 means the chip idles on host work/transfers.
    if args.profile and remaining() < 45:
        _log(f"[{rings}r] budget: skipping the profile trace "
             f"({remaining():.0f}s left)")
    elif args.profile:
        try:
            import tempfile
            from lidarslam_tpu.utils import profiling
            logdir = tempfile.mkdtemp(prefix="lst_bench_prof_")
            with jax.profiler.trace(logdir):
                # drive the SAME API as the benchmarked arm: busy/wall is
                # only meaningful when both measure the same program
                if args.stream:
                    for f in frames[n_total:]:
                        slam.add_frame_async(f)
                    slam.flush()
                else:
                    for f in frames[n_total:]:
                        slam.add_frame(f)
            xp = profiling.find_xplane(logdir)
            busy = profiling.device_busy_ms(xp) if xp is not None else 0.0
            if busy > 0.0:   # CPU runs have no TPU/Device plane
                dev_ms = busy / nprof
                record["device_busy_ms_per_frame"] = round(dev_ms, 2)
                record["device_busy_frac"] = round(
                    dev_ms / (1000.0 * wall / frames_n), 3)
                record["roofline"] = _roofline(cfg, dev_ms, xp, nprof)
            _log(f"[{rings}r] profile done: device "
                 f"{record.get('device_busy_ms_per_frame')} ms/frame, busy "
                 f"frac {record.get('device_busy_frac')}")
        except Exception as e:  # never let profiling break the bench line
            _log(f"[{rings}r] profiling skipped: {e}")
    return record


def warm_only(args):
    """Compile-cache pre-warm: run every graph the full bench needs (both
    configs' first-frame, windowed-scan, drain and reseed programs) with a
    minimal timed section, so a subsequent full run replays cached
    executables only. Run this after any kernel change, BEFORE the
    driver's deadline-bound capture (round-4 lesson: a kernel rewrite
    invalidated the cache and the driver's run burned its whole window on
    tunnel recompiles)."""
    args.reps = 1
    args.profile = False
    for rings in ([args.rings] if args.rings is not None else [16, 64]):
        rec = run_config(args, rings, args.azimuth, 2 * 8 + 1, args.warmup,
                         0)
        _log(f"warm [{rings}r]: {rec['scans_per_sec']:.1f} scans/s "
             f"(throwaway number, cache now warm)")
    _log("warm-only done")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120, help="timed frames")
    ap.add_argument("--warmup", type=int, default=18, help="warmup frames (compiles; "
                    "covers first-frame, windowed-scan, drain and reseed graphs)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--rings", type=int, default=None,
                    help="run ONE config with this ring count instead of both "
                    "headline configs (16=VLP-16, 64=KITTI-class, 128=VLS-128)")
    ap.add_argument("--azimuth", type=int, default=1800, help="firings per ring per sweep")
    ap.add_argument("--stream", dest="stream", action="store_true", default=True,
                    help="device-chained streaming mode (default)")
    ap.add_argument("--no-stream", dest="stream", action="store_false",
                    help="synchronous per-frame API instead of streaming")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--no-profile", dest="profile", action="store_false",
                    default=True,
                    help="skip the post-bench device-busy trace")
    ap.add_argument("--profile-frames", type=int, default=8,
                    help="frames traced for the device-busy measurement")
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions; the reported value is the best "
                    "(the tunnel's host-side latency fluctuates across "
                    "minutes at identical device time)")
    ap.add_argument("--skip-64beam", action="store_true",
                    help="measure only the primary VLP-16 config")
    ap.add_argument("--warm-only", action="store_true",
                    help="compile/warm every graph and exit (no measurement); "
                    "run after kernel changes to pre-warm the persistent "
                    "cache outside any deadline window")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", "480")),
                    help="internal wall-clock budget [s]; reps/profile/64-beam "
                    "shed gracefully as it runs out instead of overrunning an "
                    "external timeout (BENCH_BUDGET_S env overrides)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platform_name", "cpu")
    # persistent compilation cache: TPU compiles over the tunnel are slow,
    # so amortize them across bench invocations
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.warm_only:
        warm_only(args)
        return

    deadline = _T0 + args.budget
    _log(f"bench start: budget {args.budget:.0f}s, "
         f"configs {'[' + str(args.rings) + 'r]' if args.rings else '16r+64r'}")
    _log("link/chip health stamps...")
    tunnel = _tunnel_health()
    tunnel.update(_device_health())
    _log(f"health: {tunnel}")

    def failures(record):
        n = record.get("n_failed_frames", 0)
        n += record.get("config_64beam", {}).get("n_failed_frames", 0)
        return n

    if args.rings is not None:
        rec = run_config(args, args.rings, args.azimuth, args.frames,
                         args.warmup, args.profile_frames, deadline=deadline)
        rec.update(tunnel)
        record = {"metric": "scans_per_sec", "value": rec.pop("scans_per_sec"),
                  "unit": "scans/s"}
        record["vs_baseline"] = round(record["value"] / 10.0, 3)
        record.update(rec)
        _emit(record)
        sys.exit(1 if failures(record) else 0)

    # both headline configs; a complete JSON line after every milestone
    # (the last line is the full record)
    rec16 = run_config(args, 16, args.azimuth, args.frames, args.warmup,
                       args.profile_frames, deadline=deadline)
    record = {"metric": "scans_per_sec", "value": rec16.pop("scans_per_sec"),
              "unit": "scans/s"}
    record["vs_baseline"] = round(record["value"] / 10.0, 3)
    record.update(rec16)
    record.update(tunnel)
    _emit(record)
    if not args.skip_64beam:
        left = deadline - time.perf_counter()
        if left < 90:
            _log(f"budget: skipping the 64-beam config ({left:.0f}s left)")
        else:
            # KITTI-class secondary config: fewer timed frames (device-bound,
            # ~5x the per-frame work)
            rec64 = run_config(args, 64, args.azimuth,
                               max(args.frames // 2, 30), args.warmup,
                               args.profile_frames, deadline=deadline)
            record["config_64beam"] = rec64
            record["vs_baseline_64beam"] = round(rec64["scans_per_sec"] / 10.0, 3)
            _emit(record)
    _log(f"bench done in {time.perf_counter() - _T0:.0f}s")
    # robustness gate: a nonzero exit makes lost-tracker frames a
    # machine-checked failure (the throughput of a lost tracker is not a
    # valid number) — the JSON line above still carries the full record
    if failures(record):
        _log(f"FAILING: {failures(record)} failed frame(s)")
        sys.exit(1)


if __name__ == "__main__":
    main()
