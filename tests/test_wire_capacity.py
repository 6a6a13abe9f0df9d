"""Sticky flat-wire capacity under adversarial fill noise.

The windowed streaming dispatch picks the flat-wire point capacity P per
window (max sweep total +5% headroom, rounded up to an 8 Ki bucket) and
keeps it STICKY — P never shrinks for a Slam instance — so scene-fill
noise oscillating across a bucket boundary cannot retrigger window-program
compiles mid-run (each distinct P is a distinct static shape = a fresh XLA
program; one such compile cost ~3 minutes over the TPU tunnel inside a
timed bench rep). These tests drive fill across a boundary and assert:

1. the graph-variant count stays at exactly the number of distinct upward
   bucket crossings (no growth from downward noise), and
2. the trajectory is bitwise-identical to a run whose bucket was pre-stuck
   at the final P (the wire is lossless whenever P >= the window's need,
   so P choice must never leak into results).
"""

import numpy as np
import pytest

import jax

from lidarslam_tpu import Slam
from lidarslam_tpu.config import ExtractorConfig, MapConfig, SlamConfig
from lidarslam_tpu.io import synthetic


def _cfg(window=4):
    return SlamConfig(
        stream_window=window,
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024,
                                  max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 14),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 14),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 14))


def _trim(frame, n):
    """Copy of `frame` with exactly n points, subsampled evenly so the
    full field of view survives (a fill change must not blind the
    tracker)."""
    total = len(frame["xyz"])
    idx = np.round(np.linspace(0, total - 1, min(n, total))).astype(np.int64)
    out = dict(frame)
    for k in ("xyz", "intensity", "laser_id", "time"):
        out[k] = frame[k][idx]
    return out


def _adversarial_frames(n_frames, lo=7000, hi=12000):
    """Window-aligned fill pattern oscillating across the 8 Ki bucket
    boundary: dispatch windows (frames 1-4, 5-8, ... — frame 0 runs the
    per-frame first-frame path) alternate small/big/small/big totals."""
    base = synthetic.generate_sequence(n_frames=n_frames,
                                       motion_distortion=False)
    out = [_trim(base[0], lo)]
    for i, f in enumerate(base[1:]):
        window = i // 4
        n = lo if window % 2 == 0 else hi
        out.append(_trim(f, n))
    return out


def test_sticky_bucket_compiles_once_per_upward_crossing():
    frames = _adversarial_frames(17)  # frame 0 per-frame + 4 full windows
    slam = Slam(_cfg())

    # graph-variant instrumentation: every distinct input structure of the
    # windowed dispatch is a distinct compiled program
    shapes_seen = []
    orig = slam._process_stream_window

    def counting(ris, *a, **kw):
        shapes_seen.append(tuple(np.shape(x) for x in jax.tree.leaves(ris)))
        return orig(ris, *a, **kw)

    slam._process_stream_window = counting
    for f in frames:
        slam.add_frame_async(f)
    outs = slam.flush()
    assert len(outs) == len(frames)
    assert not any(o["failure"] for o in outs)

    assert len(shapes_seen) == 4          # 4 full windows dispatched
    variants = sorted(set(shapes_seen))
    # exactly ONE upward crossing (7000-bucket -> 12000-bucket); the later
    # small window must reuse the big program, not re-shrink
    assert len(variants) == 2, variants
    assert shapes_seen[1] == shapes_seen[2] == shapes_seen[3]
    assert slam._wire_bucket >= 12000


def test_bucket_choice_never_leaks_into_results():
    """Pre-sticking the bucket at the final P (single program from frame 0)
    must reproduce the adversarial run's trajectory bitwise."""
    frames = _adversarial_frames(17)

    slam_a = Slam(_cfg())
    for f in frames:
        slam_a.add_frame_async(f)
    outs_a = slam_a.flush()
    final_bucket = slam_a._wire_bucket

    slam_b = Slam(_cfg())
    slam_b._wire_bucket = final_bucket   # pre-stick: one program throughout
    for f in frames:
        slam_b.add_frame_async(f)
    outs_b = slam_b.flush()

    assert len(outs_a) == len(outs_b)
    for ra, rb in zip(outs_a, outs_b):
        np.testing.assert_array_equal(ra["pose"], rb["pose"])
        assert ra["n_matches"] == rb["n_matches"]
