"""Fixed-shape sweep containers.

The reference stores a sweep as a `pcl::PointCloud<LidarPoint>` with per-point
`time, intensity, laser_id, device_id, label` fields (LidarPoint.h:31-77) and
re-buckets it into per-ring `ScanLines` vectors
(SpinningSensorKeypointExtractor.cxx:139-171). The TPU-native layout is a
ring-major **range image**: `(R, C)` tensors where row = laser ring and
column = firing index within the ring, packed left, with a validity mask.
This is the axis system every extraction kernel vectorizes over.

Keypoint sets are fixed-capacity `(K,)` struct-of-arrays with a count.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class RangeImage(NamedTuple):
    """A sweep as a ring-major range image (all arrays shaped (R, C) except xyz)."""

    xyz: jax.Array        # (R, C, 3) float32, LIDAR sensor frame (spin axis = Z)
    intensity: jax.Array  # (R, C) float32
    time: jax.Array       # (R, C) float32 — offset [s] from the frame stamp
    valid: jax.Array      # (R, C) bool — packed left per row

    @property
    def n_rings(self):
        return self.xyz.shape[0]

    @property
    def max_points(self):
        return self.xyz.shape[1]


XYZ_QUANT_SCALE = 0.004  # [m] upload quantization step (~sensor noise / 5)


class PackedRangeImage(NamedTuple):
    """Wire-compact sweep for host->device upload (~2x smaller than the f32
    RangeImage): coordinates quantized to 4 mm int16 (range +-131 m, well
    below spinning-LiDAR range noise), intensity uint8, times float16.
    Decompressed on device at pipeline entry."""

    xyz_q: jax.Array      # (R, C, 3) int16
    intensity: jax.Array  # (R, C) uint8
    time: jax.Array       # (R, C) float16
    valid: jax.Array      # (R, C) bool

    def unpack(self) -> "RangeImage":
        return RangeImage(
            xyz=self.xyz_q.astype(jnp.float32) * XYZ_QUANT_SCALE,
            intensity=self.intensity.astype(jnp.float32),
            time=self.time.astype(jnp.float32),
            valid=self.valid)


def ensure_range_image(ri) -> "RangeImage":
    return ri.unpack() if isinstance(ri, PackedRangeImage) else ri


class Keypoints(NamedTuple):
    """Fixed-capacity compacted keypoint set (one instance per keypoint type)."""

    xyz: jax.Array        # (K, 3) float32
    intensity: jax.Array  # (K,) float32
    time: jax.Array       # (K,) float32
    ring: jax.Array       # (K,) int32 — laser ring the point came from
    valid: jax.Array      # (K,) bool
    count: jax.Array      # () int32

    @classmethod
    def empty(cls, capacity: int):
        return cls(
            xyz=jnp.zeros((capacity, 3), jnp.float32),
            intensity=jnp.zeros((capacity,), jnp.float32),
            time=jnp.zeros((capacity,), jnp.float32),
            ring=jnp.zeros((capacity,), jnp.int32),
            valid=jnp.zeros((capacity,), bool),
            count=jnp.zeros((), jnp.int32),
        )


def build_range_image(
    xyz: np.ndarray,
    intensity: np.ndarray,
    laser_id: np.ndarray,
    time: np.ndarray,
    n_rings: int,
    max_ring_points: int,
    packed: bool = False,
) -> "RangeImage | PackedRangeImage":
    """Host-side bucketing of an unordered point list into a RangeImage.

    Points are appended to their ring in input order, matching the reference's
    `ConvertAndSortScanLines` (SSKE.cxx:139-161). Overflowing points beyond
    `max_ring_points` per ring are dropped; rings >= n_rings are dropped.
    """
    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    laser_id = np.asarray(laser_id, np.int64)

    # native C++ scatter when available (~10x faster host ingest; identical
    # per-ring ordering and overflow semantics)
    from lidarslam_tpu.io import native as native_mod
    if native_mod.available():
        if packed:
            out = native_mod.build_range_image_packed_native(
                xyz, intensity, laser_id, time, n_rings, max_ring_points,
                XYZ_QUANT_SCALE)
            if out is not None:
                q, inten8, t16, valid8 = out
                return PackedRangeImage(
                    xyz_q=jnp.asarray(q), intensity=jnp.asarray(inten8),
                    time=jnp.asarray(t16), valid=jnp.asarray(valid8.astype(bool)))
        else:
            out = native_mod.build_range_image_native(
                xyz, intensity, laser_id, time, n_rings, max_ring_points)
            if out is not None:
                oxyz, ointen, otime, ovalid = out
                return RangeImage(
                    xyz=jnp.asarray(oxyz), intensity=jnp.asarray(ointen),
                    time=jnp.asarray(otime), valid=jnp.asarray(ovalid.astype(bool)))

    keep = (laser_id >= 0) & (laser_id < n_rings)

    # stable order of points within each ring = input order
    cols = np.zeros(n, np.int64)
    counts = np.zeros(n_rings, np.int64)
    lid_kept = laser_id[keep]
    # vectorized per-ring running index
    order = np.argsort(lid_kept, kind="stable")
    sorted_lid = lid_kept[order]
    start = np.searchsorted(sorted_lid, np.arange(n_rings), side="left")
    run = np.arange(len(sorted_lid)) - start[sorted_lid]
    cols_kept = np.empty(len(lid_kept), np.int64)
    cols_kept[order] = run
    np.add.at(counts, sorted_lid, 1)

    keep_idx = np.flatnonzero(keep)
    in_cap = cols_kept < max_ring_points
    keep_idx = keep_idx[in_cap]
    rows = laser_id[keep_idx]
    cols_f = cols_kept[in_cap]

    img_xyz = np.zeros((n_rings, max_ring_points, 3), np.float32)
    img_int = np.zeros((n_rings, max_ring_points), np.float32)
    img_time = np.zeros((n_rings, max_ring_points), np.float32)
    img_valid = np.zeros((n_rings, max_ring_points), bool)
    img_xyz[rows, cols_f] = xyz[keep_idx]
    img_int[rows, cols_f] = np.asarray(intensity, np.float32)[keep_idx]
    img_time[rows, cols_f] = np.asarray(time, np.float32)[keep_idx]
    img_valid[rows, cols_f] = True

    if packed:
        q = np.clip(np.round(img_xyz / XYZ_QUANT_SCALE), -32767, 32767).astype(np.int16)
        return PackedRangeImage(
            xyz_q=jnp.asarray(q),
            intensity=jnp.asarray(np.clip(img_int, 0, 255).astype(np.uint8)),
            time=jnp.asarray(img_time.astype(np.float16)),
            valid=jnp.asarray(img_valid),
        )
    return RangeImage(
        xyz=jnp.asarray(img_xyz),
        intensity=jnp.asarray(img_int),
        time=jnp.asarray(img_time),
        valid=jnp.asarray(img_valid),
    )


def transform_keypoints(kp: Keypoints, pose6, time_offset=0.0) -> Keypoints:
    """Rigidly transform a keypoint set (LIDAR->BASE calibration) and shift
    its point times (AggregateFrames semantics, Slam.cxx:1512-1578)."""
    from lidarslam_tpu.core import se3

    R, t = se3.jpose_to_rt(jnp.asarray(pose6, jnp.float32))
    return kp._replace(xyz=kp.xyz @ R.T + t, time=kp.time + time_offset)


def merge_keypoints(sets, capacity: int) -> Keypoints:
    """Concatenate keypoint sets from several devices into one fixed-capacity
    set, keeping valid slots first (multi-LiDAR merge)."""
    xyz = jnp.concatenate([s.xyz for s in sets])
    inten = jnp.concatenate([s.intensity for s in sets])
    time = jnp.concatenate([s.time for s in sets])
    ring = jnp.concatenate([s.ring for s in sets])
    valid = jnp.concatenate([s.valid for s in sets])
    order = jnp.arange(xyz.shape[0], dtype=jnp.int32)
    _, crow = jax.lax.sort(((~valid).astype(jnp.int32), order), num_keys=1,
                           is_stable=True)
    crow = crow[:capacity]
    count = jnp.minimum(jnp.sum(valid), capacity).astype(jnp.int32)
    slot_valid = jnp.arange(capacity, dtype=jnp.int32) < count
    return Keypoints(xyz=xyz[crow], intensity=inten[crow], time=time[crow],
                     ring=ring[crow], valid=slot_valid, count=count)


def estimate_azimuthal_resolution(ri: RangeImage) -> float:
    """Host-side estimate of the sensor's azimuthal resolution [rad].

    Robust median-shrinking estimator over horizontal angles between
    successive firings of the same ring (SSKE.cxx:593-637): iteratively drop
    angles above a ceiling until the ceiling is < 1.8x the median, which
    discards multi-firing jumps and dual returns.
    """
    xy = np.asarray(ri.xyz)[..., :2]
    valid = np.asarray(ri.valid)
    a, b = xy[:, :-1], xy[:, 1:]
    pair_valid = valid[:, :-1] & valid[:, 1:]
    na = np.linalg.norm(a, axis=-1)
    nb = np.linalg.norm(b, axis=-1)
    denom = np.maximum(na * nb, 1e-12)
    cosang = np.clip(np.sum(a * b, axis=-1) / denom, -1.0, 1.0)
    ang = np.abs(np.arccos(cosang))[pair_valid]
    ang = ang[ang > 1e-4]
    if len(ang) < 100:
        return np.deg2rad(0.2)  # fallback default (SSKE.cxx:217-218)
    ang = np.sort(ang)
    hi = len(ang)
    max_angle = np.deg2rad(5.0)
    median = 0.0
    while max_angle > 1.8 * median:
        hi = int(np.searchsorted(ang[:hi], max_angle, side="right"))
        if hi == 0:
            return np.deg2rad(0.2)
        median = float(ang[hi // 2])
        max_angle = min(median * 2.0, max_angle / 1.8)
    return median
