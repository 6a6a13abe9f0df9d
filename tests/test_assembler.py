"""Async multi-LiDAR frame assembly (LidarSlamNode.cxx:158-194, 505-516).

Jittered, reordered, and lossy two-LiDAR message streams must assemble into
the same acquisitions — and the same trajectory — as pre-synchronized input.
"""

import numpy as np

from lidarslam_tpu import Slam
from lidarslam_tpu.config import ExtractorConfig
from lidarslam_tpu.io.assembler import FrameAssembler

from test_multilidar_streaming import OFFSET, _cfg, _two_sensor_sequences


def _interleave(f0, f1, rng, jitter=0.02, drop_secondary=(), swap=True):
    """Arrival-ordered message stream: per-message receive delay, optional
    secondary drops, occasional main/secondary arrival swaps."""
    msgs = []
    for f in f0:
        msgs.append((float(f["stamp"]) + rng.uniform(0, jitter), f))
    for i, f in enumerate(f1):
        if i in drop_secondary:
            continue
        msgs.append((float(f["stamp"]) + rng.uniform(0, jitter), f))
    msgs.sort(key=lambda m: m[0])
    if swap and len(msgs) > 3:
        msgs[2], msgs[3] = msgs[3], msgs[2]
    return [m[1] for m in msgs]


def _run(asm, stream):
    acqs = []
    for msg in stream:
        acqs.extend(asm.push(msg))
    acqs.extend(asm.flush())
    return acqs


def test_assembles_pairs_under_jitter_and_reordering():
    n = 6
    f0, f1 = _two_sensor_sequences(n)
    asm = FrameAssembler(main_device=0, max_stamp_diff=0.05)
    acqs = _run(asm, _interleave(f0, f1, np.random.default_rng(0)))
    assert len(acqs) == n
    for acq in acqs:
        devs = [f["device_id"] for f in acq]
        # the holdback guarantees every trigger pairs: jitter delays
        # emission, never pairing
        assert devs == [0, 1]
        assert abs(acq[0]["stamp"] - acq[1]["stamp"]) <= 0.05
    # emitted in trigger order
    stamps = [a[0]["stamp"] for a in acqs]
    assert stamps == sorted(stamps)


def test_drops_do_not_poison_later_matches():
    n = 6
    f0, f1 = _two_sensor_sequences(n)
    asm = FrameAssembler(main_device=0, max_stamp_diff=0.05,
                         expected_devices=(1,))
    acqs = _run(asm, _interleave(f0, f1, np.random.default_rng(1),
                                 drop_secondary={2, 3}))
    assert len(acqs) == n
    # the dropped frames' triggers run single-device; every other pairs
    n_paired = sum(len(a) == 2 for a in acqs)
    assert n_paired == n - 2
    for a in acqs:
        if len(a) == 2:
            assert abs(a[0]["stamp"] - a[1]["stamp"]) <= 0.05


def test_time_offset_alignment():
    f0, f1 = _two_sensor_sequences(4)
    skew = 0.5  # device-1 clock runs half a second behind
    for f in f1:
        f["stamp"] = float(f["stamp"]) - skew
    asm = FrameAssembler(main_device=0, max_stamp_diff=0.05,
                         time_offsets={1: skew})
    acqs = _run(asm, _interleave(f0, f1, np.random.default_rng(2),
                                 jitter=0.0, swap=False))
    paired = [a for a in acqs if len(a) == 2]
    assert len(paired) == 4
    for a in paired:
        # emitted stamps are on the main clock after the offset
        assert abs(a[0]["stamp"] - a[1]["stamp"]) <= 0.05


def test_async_stream_matches_presynchronized_trajectory():
    """The whole point: a jittered async stream through the assembler gives
    the same trajectory as hand-synchronized acquisitions."""
    n = 8
    f0, f1 = _two_sensor_sequences(n)
    cfg = _cfg(device_extractors=(
        (1, ExtractorConfig(n_rings=8, max_ring_points=1024,
                            max_keypoints=1024)),))

    ref = Slam(cfg)
    ref.set_base_to_lidar_offset(1, OFFSET)
    for a, b in zip(f0, f1):
        rs = ref.add_frames([a, b])

    slam = Slam(cfg)
    calib = {0: np.eye(4), 1: OFFSET}
    asm = FrameAssembler(main_device=0, max_stamp_diff=0.05,
                         calibration_provider=calib.get)
    for msg in _interleave(f0, f1, np.random.default_rng(3)):
        asm.process(slam, msg, streaming=True)
    for acq in asm.flush():
        slam.add_frames_async(acq)
    outs = slam.flush()
    assert len(outs) == n
    d = np.linalg.norm(outs[-1]["pose"][:3, 3] - rs["pose"][:3, 3])
    assert d < 0.03, d
    assert asm.n_triggers == n
    assert asm.n_unmatched == 0


def test_buffer_bounded_on_device_dropout():
    f0, f1 = _two_sensor_sequences(3)
    asm = FrameAssembler(main_device=0, max_buffer=4)
    # main device dies: secondaries keep arriving, buffer must stay bounded
    for _ in range(5):
        for f in f1:
            asm.push(f)
    assert len(asm._buffers[1]) <= 4
