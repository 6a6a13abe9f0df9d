"""Streaming (device-chained) mode vs the synchronous per-frame path."""

import numpy as np
import pytest

from lidarslam_tpu import Slam
from lidarslam_tpu.config import ExtractorConfig, Keypoint, MapConfig, SlamConfig
from lidarslam_tpu.core import se3
from lidarslam_tpu.io import synthetic


def _cfg():
    return SlamConfig(
        extractor=ExtractorConfig(n_rings=16, max_ring_points=1024, max_keypoints=1024),
        edge_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26),
        plane_map=MapConfig(leaf_size=0.60, capacity=1 << 15, grid_size=26),
        blob_map=MapConfig(leaf_size=0.30, capacity=1 << 15, grid_size=26))


@pytest.fixture(scope="module")
def frames():
    return synthetic.generate_sequence(n_frames=10, motion_distortion=False,
                                       sensor=synthetic.SensorModel(range_noise=0.005))


def test_flat_wire_unpacks_identical_to_planes(frames):
    """FlatRangeImage (prefix-packed wire) must reconstruct the exact same
    RangeImage as the dense PackedRangeImage when nothing is dropped."""
    import jax
    from lidarslam_tpu.ops import frame as fm

    f = frames[0]
    planes = fm.build_range_image(f["xyz"], f["intensity"], f["laser_id"],
                                  f["time"], 16, 1024, packed=True, device=False)
    total = int(np.asarray(planes.counts).sum())
    flat = fm.flatten_packed(planes, wire_capacity=-(-total // 16384) * 16384)
    a = jax.tree.map(np.asarray, fm.to_device_range_image(planes).unpack())
    b = jax.tree.map(np.asarray, fm.to_device_range_image(flat).unpack())
    np.testing.assert_array_equal(a.valid, b.valid)
    np.testing.assert_array_equal(a.xyz[a.valid], b.xyz[b.valid])
    np.testing.assert_array_equal(a.intensity[a.valid], b.intensity[b.valid])
    np.testing.assert_array_equal(a.time[a.valid], b.time[b.valid])
    # wire never exceeds the dense planes (strictly smaller at 64-beam
    # scale where the dense image is >> the 16 Ki bucket granularity)
    assert flat.xyz_q.nbytes + flat.meta.nbytes <= \
        planes.xyz_q.nbytes + planes.intensity.nbytes + planes.t_q.nbytes
    assert flat.xyz_q.shape[0] == 16384  # exact-fit bucket for ~12k points


def test_flat_wire_water_fill_cap():
    """Over-capacity sweeps lose the tail columns of the fullest rings only
    (uniform per-ring cap), never whole rings."""
    from lidarslam_tpu.ops import frame as fm

    counts = np.array([100, 500, 900, 20])
    kept = fm._water_fill_cap(counts, budget=800)
    assert kept.sum() <= 800
    np.testing.assert_array_equal(kept, np.minimum(counts, kept.max()))
    assert (kept[counts <= kept.max()] == counts[counts <= kept.max()]).all()
    # under budget: untouched
    np.testing.assert_array_equal(fm._water_fill_cap(counts, 10000), counts)


def test_stream_matches_synchronous(frames):
    sync = Slam(_cfg())
    sync_poses = []
    for f in frames:
        r = sync.add_frame(f)
        sync_poses.append(r["pose"])

    stream = Slam(_cfg())
    for f in frames:
        idx = stream.add_frame_async(f)
        assert idx >= 0
    outs = stream.flush()
    assert len(outs) == len(frames)
    for i, (o, sp) in enumerate(zip(outs, sync_poses)):
        assert not o["failure"], f"frame {i}"
        # float32 in-graph extrapolation vs float64 host extrapolation makes
        # the priors differ slightly; converged poses must agree closely
        err = np.linalg.norm(o["pose"][:3, 3] - sp[:3, 3])
        assert err < 0.03, f"frame {i}: {err}"


def test_stream_tracks_ground_truth_and_logs(frames):
    stream = Slam(_cfg())
    for f in frames:
        stream.add_frame_async(f)
    outs = stream.flush()
    gt0 = frames[0]["gt_pose"]
    errs = [np.linalg.norm(o["pose"][:3, 3]
                           - (se3.hmat_inverse(gt0) @ f["gt_pose"])[:3, 3])
            for o, f in zip(outs, frames)]
    assert max(errs) < 0.15, errs
    # logs and maps populated as in synchronous mode
    assert len(stream.log_trajectory) == len(frames)
    assert len(stream.log_keypoints) == len(frames)
    pts, *_ = stream.get_map_points(Keypoint.PLANE)
    assert len(pts) > 200
    # flush is idempotent
    assert stream.flush() == []


def test_stream_partial_flush(frames):
    stream = Slam(_cfg())
    for f in frames[:4]:
        stream.add_frame_async(f)
    outs1 = stream.flush()
    assert len(outs1) == 4
    for f in frames[4:]:
        stream.add_frame_async(f)
    outs2 = stream.flush()
    assert len(outs2) == len(frames) - 4
    gt0 = frames[0]["gt_pose"]
    gt = se3.hmat_inverse(gt0) @ frames[-1]["gt_pose"]
    assert np.linalg.norm(outs2[-1]["pose"][:3, 3] - gt[:3, 3]) < 0.15


def test_logged_keypoints_survive_later_segments(frames):
    """Donation-safety regression: the keypoint log entries captured at one
    flush must stay readable (not invalidated by buffer donation) after a
    NEW streaming segment and more flushes run. The log buffers are fresh
    in-graph outputs (frame.flatten_keypoints), never part of the donated
    stream state."""
    slam = Slam(_cfg())
    for f in frames[:4]:
        slam.add_frame_async(f)
    slam.flush()
    early = {k: v for k, v in slam.current_keypoints.items()}
    early_counts = {k: int(v.count) for k, v in early.items()}
    # a second segment donates new state buffers frame after frame
    for f in frames[4:]:
        slam.add_frame_async(f)
    slam.flush()
    for k, v in early.items():
        assert int(v.count) == early_counts[k]
        pts = v.xyz[: int(v.count)]
        assert np.all(np.isfinite(pts))
        assert v.valid[: int(v.count)].all()
    # the last frame's device keypoints seed the synchronous path unscathed
    # (fresh stamp so the duplicate-frame guard doesn't skip it)
    again = dict(frames[-1])
    again["stamp"] = float(frames[-1]["stamp"]) + 0.1
    r = slam.add_frame(again)
    assert not r["failure"]


def test_log_keypoints_feed_pgo_after_streaming(frames):
    """Flat-buffer log entries restore into PGO replay clouds."""
    from lidarslam_tpu.io import storage

    slam = Slam(_cfg())
    for f in frames:
        slam.add_frame_async(f)
    slam.flush()
    assert len(slam.log_keypoints) == len(slam.log_trajectory)
    total = 0
    for entry in slam.log_keypoints:
        for obj in entry.values():
            h = storage.restore(obj)
            total += len(h.xyz)
            assert h.xyz.dtype == np.float32
    assert total > 0
    mem = slam.get_log_memory_usage()
    assert mem["device"] > 0


def test_window_worker_exception_propagates():
    """A failure on the window worker thread must surface to the caller at
    the next sync point, not vanish."""
    import pytest as _pytest

    from lidarslam_tpu.io import synthetic as _syn

    frames = _syn.generate_sequence(n_frames=10, motion_distortion=False)
    slam = Slam(_cfg())
    slam.add_frame_async(frames[0])
    # poison the window jit
    def boom(*a, **k):
        raise RuntimeError("injected worker failure")
    slam._process_stream_window = boom
    for f in frames[1:9]:
        slam.add_frame_async(f)     # fills and dispatches one window
    with _pytest.raises(RuntimeError, match="injected worker failure"):
        slam.flush()


def test_streaming_against_preloaded_maps_estimates_azimuth(tmp_path):
    """Localization-only streaming against PRELOADED maps: the very first
    enqueued frame must still estimate the azimuthal resolution (the window
    path never does — regression: az=0 gutted extraction)."""
    frames = synthetic.generate_sequence(n_frames=8, motion_distortion=False)
    builder = Slam(_cfg())
    for f in frames[:4]:
        builder.add_frame(f)
    prefix = str(tmp_path / "m_")
    builder.save_maps_to_pcd(prefix)

    loc = Slam(_cfg())
    loc.load_maps_from_pcd(prefix)
    assert loc._maps_populated
    for f in frames[4:]:
        loc.add_frame_async(f)
    outs = loc.flush()
    assert loc.azimuthal_resolution > 1e-6
    assert all(not o["failure"] for o in outs)
    assert outs[-1]["n_matches"] > 100
    # tracked close to the builder's trajectory over the shared frames
    d = np.linalg.norm(outs[-1]["pose"][:3, 3]
                       - builder.log_trajectory[-1]["pose"][:3, 3])
    assert np.isfinite(d)
