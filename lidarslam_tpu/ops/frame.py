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
    """Wire-compact sweep for host->device upload (8.07 B/slot vs the f32
    RangeImage's 24): coordinates quantized to 4 mm int16 (range +-131 m,
    well below spinning-LiDAR range noise), intensity uint8, per-point
    times quantized to uint8 over the sweep's [t_min, t_max] span (0.4 ms
    step at 10 Hz — rotation 36 deg/s drifts 0.014 deg per step, far under
    extractor/undistortion sensitivity), and the validity plane replaced by
    per-ring counts (rows are left-packed by construction of
    build_range_image). The host<->device link is the measured bottleneck
    in degraded tunnel phases (bandwidth swings 1.3 GB/s..60 MB/s), so
    every byte on this wire costs wall time. Decompression on device is
    plain dtype converts + one iota compare, which fuse for free (the
    single-byte-buffer ByteRangeImage needs a u8->u16 bit-reassembly that
    cost 3.8 ms/frame at 64-beam scale, profiled). Used by the windowed
    streaming path, where W sweeps stack per field."""

    xyz_q: jax.Array      # (R, C, 3) int16
    intensity: jax.Array  # (R, C) uint8
    t_q: jax.Array        # (R, C) uint8
    t_min: jax.Array      # () float32
    t_scale: jax.Array    # () float32
    counts: jax.Array     # (R,) int32 — valid points per ring, left-packed

    def unpack(self) -> "RangeImage":
        R, C = self.intensity.shape
        valid = jnp.arange(C, dtype=jnp.int32)[None, :] < self.counts[:, None]
        time = self.t_min + self.t_q.astype(jnp.float32) * self.t_scale
        return RangeImage(
            xyz=self.xyz_q.astype(jnp.float32) * XYZ_QUANT_SCALE,
            intensity=self.intensity.astype(jnp.float32),
            time=jnp.where(valid, time, 0.0),
            valid=valid)


def _pack_planes(q, inten8, time_plane, valid8) -> "PackedRangeImage":
    """Host-side PackedRangeImage assembly from quantized planes."""
    valid = valid8.astype(bool)
    if valid.any():
        vals = np.asarray(time_plane, np.float32)[valid]
        t_min = float(vals.min())
        span = float(vals.max()) - t_min
    else:
        t_min, span = 0.0, 0.0
    scale = span / 255.0 if span > 0 else 1.0
    t_q = np.clip(np.round((np.asarray(time_plane, np.float32) - t_min) / scale),
                  0, 255).astype(np.uint8)
    return PackedRangeImage(
        xyz_q=q, intensity=inten8, t_q=t_q,
        t_min=np.float32(t_min), t_scale=np.float32(scale),
        counts=valid.sum(axis=1).astype(np.int32))


class FlatRangeImage:
    """Prefix-packed wire: only the VALID points travel the host->device
    link. Rows of the range image are left-packed by construction
    (build_range_image appends per ring), so the whole sweep is the
    concatenation of per-ring prefixes — a flat (P,) stream plus the (R,)
    counts reconstructs the (R, C) planes with one gather. At typical
    spinning-LiDAR fill (~75% valid slots at 64-beam), this cuts the wire
    ~25% below the dense PackedRangeImage — and on the measured tunnel,
    host->device transfers serialize with device compute, so wire bytes
    convert 1:1 into wall time (docs/PERFORMANCE.md tunnel forensic).

    P (the flat capacity) is static: `wire_capacity` (SlamConfig) or
    R*C when unset (lossless). When a sweep exceeds P, ring counts are
    water-filled down to a uniform per-ring cap (drops the tail columns of
    the fullest rings only — the same overflow semantics as
    max_ring_points, applied at the wire).

    Layout: xyz_q (P, 3) int16 (4 mm), meta (P, 2) uint8 [intensity, t_q],
    t_min/t_scale () f32, counts (R,) int32. Registered as a pytree with
    (R, C) static so it passes through jit and lax.scan stacking."""

    __slots__ = ("xyz_q", "meta", "t_min", "t_scale", "counts", "shape")

    def __init__(self, xyz_q, meta, t_min, t_scale, counts, shape):
        self.xyz_q = xyz_q
        self.meta = meta
        self.t_min = t_min
        self.t_scale = t_scale
        self.counts = counts
        self.shape = tuple(shape)

    def unpack(self) -> "RangeImage":
        R, C = self.shape
        P = self.xyz_q.shape[-2]
        counts = self.counts
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        col = jnp.arange(C, dtype=jnp.int32)
        valid = col[None, :] < counts[:, None]
        idx = jnp.minimum(starts[:, None] + col[None, :], P - 1).reshape(-1)
        xyz = jnp.take(self.xyz_q, idx, axis=0).reshape(R, C, 3)
        meta = jnp.take(self.meta, idx, axis=0).reshape(R, C, 2)
        xyz = jnp.where(valid[..., None], xyz.astype(jnp.float32)
                        * XYZ_QUANT_SCALE, 0.0)
        inten = jnp.where(valid, meta[..., 0].astype(jnp.float32), 0.0)
        time = self.t_min + meta[..., 1].astype(jnp.float32) * self.t_scale
        return RangeImage(xyz=xyz, intensity=inten,
                          time=jnp.where(valid, time, 0.0), valid=valid)

    @property
    def n_rings(self):
        return self.shape[0]

    @property
    def max_points(self):
        return self.shape[1]


jax.tree_util.register_pytree_node(
    FlatRangeImage,
    lambda ri: ((ri.xyz_q, ri.meta, ri.t_min, ri.t_scale, ri.counts), ri.shape),
    lambda shape, ch: FlatRangeImage(*ch, shape))


def _water_fill_cap(counts: np.ndarray, budget: int) -> np.ndarray:
    """Largest uniform per-ring cap k with sum(min(counts, k)) <= budget."""
    if counts.sum() <= budget:
        return counts
    lo, hi = 0, int(counts.max())
    while lo < hi:                      # bisect on k (<= 12 iterations)
        mid = (lo + hi + 1) // 2
        if int(np.minimum(counts, mid).sum()) <= budget:
            lo = mid
        else:
            hi = mid - 1
    return np.minimum(counts, lo)


def flatten_packed(ri: "PackedRangeImage", wire_capacity: int = 0) -> "FlatRangeImage":
    """Host-side PackedRangeImage -> FlatRangeImage (see FlatRangeImage)."""
    q = np.asarray(ri.xyz_q)
    R, C = q.shape[:2]
    counts = np.asarray(ri.counts).astype(np.int64)
    P = int(wire_capacity) if wire_capacity else R * C
    kept = _water_fill_cap(counts, P)
    mask = np.arange(C)[None, :] < kept[:, None]
    n = int(kept.sum())
    xyz_q = np.zeros((P, 3), np.int16)
    meta = np.zeros((P, 2), np.uint8)
    xyz_q[:n] = q[mask]
    meta[:n, 0] = np.asarray(ri.intensity)[mask]
    meta[:n, 1] = np.asarray(ri.t_q)[mask]
    return FlatRangeImage(xyz_q=xyz_q, meta=meta, t_min=np.float32(ri.t_min),
                          t_scale=np.float32(ri.t_scale),
                          counts=kept.astype(np.int32), shape=(R, C))


class ByteRangeImage:
    """PackedRangeImage serialized into ONE byte buffer so each sweep is a
    single host->device transfer (4 separate uploads cost ~1.5 ms of host
    dispatch per frame over the device tunnel). Layout, for n = R*C:
    [xyz_q i16 (6n)] [intensity u8 (n)] [time f16 (2n)] [valid u8 (n)].
    Registered as a pytree with (R, C) static so it passes through jit."""

    __slots__ = ("buf", "shape")

    def __init__(self, buf, shape):
        self.buf = buf
        self.shape = tuple(shape)

    def unpack(self) -> "RangeImage":
        import jax.lax as lax

        R, C = self.shape
        n = R * C
        b = self.buf
        q = lax.bitcast_convert_type(b[:6 * n].reshape(R, C, 3, 2), jnp.int16)
        inten = b[6 * n:7 * n].reshape(R, C)
        t = lax.bitcast_convert_type(b[7 * n:9 * n].reshape(R, C, 2), jnp.float16)
        valid = b[9 * n:10 * n].reshape(R, C) != 0
        return RangeImage(
            xyz=q.astype(jnp.float32) * XYZ_QUANT_SCALE,
            intensity=inten.astype(jnp.float32),
            time=t.astype(jnp.float32),
            valid=valid)

    @property
    def n_rings(self):
        return self.shape[0]

    @property
    def max_points(self):
        return self.shape[1]


jax.tree_util.register_pytree_node(
    ByteRangeImage,
    lambda ri: ((ri.buf,), ri.shape),
    lambda shape, children: ByteRangeImage(children[0], shape))


def pack_range_image_bytes(q, inten8, t16, valid8, device=True):
    """One wire buffer from the quantized planes (host numpy in, device out)."""
    buf = np.concatenate([
        np.ascontiguousarray(q).view(np.uint8).ravel(),
        np.ascontiguousarray(inten8).ravel(),
        np.ascontiguousarray(t16).view(np.uint8).ravel(),
        np.ascontiguousarray(valid8).ravel()])
    return ByteRangeImage(jnp.asarray(buf) if device else buf, q.shape[:2])


def ensure_range_image(ri) -> "RangeImage":
    if isinstance(ri, (PackedRangeImage, ByteRangeImage, FlatRangeImage)):
        return ri.unpack()
    return ri


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


def flatten_keypoints(kp: "Keypoints"):
    """One (7K+1,) f32 log buffer per keypoint set, built in-graph so the
    streaming step returns it as a fresh output buffer — logged references
    need no per-leaf host-side jnp.copy (the structured keypoint outputs
    alias the donated stream state; ~18 copy dispatches/frame otherwise).
    Layout: x(K) y(K) z(K) intensity(K) time(K) ring(K) valid(K) count(1)."""
    return jnp.concatenate([
        kp.xyz[:, 0], kp.xyz[:, 1], kp.xyz[:, 2], kp.intensity, kp.time,
        kp.ring.astype(jnp.float32), kp.valid.astype(jnp.float32),
        kp.count.astype(jnp.float32)[None]])


class KeypointsView:
    """Lazy host view over a flattened keypoint log buffer: mimics the
    `Keypoints` attribute surface (numpy arrays), pulling the device buffer
    once on first access. Safe to hold across stream-state donation —
    the flat buffer is an independent output of the streaming step."""

    __slots__ = ("_buf", "_host", "_row")

    def __init__(self, buf, row=None):
        # `row` indexes a window-stacked (W, 7K+1) buffer (the windowed
        # streaming dispatch logs one stacked buffer per W frames); the row
        # is sliced on device lazily at first host access
        self._buf = buf
        self._row = row
        self._host = None

    def _h(self):
        if self._host is None:
            b = self._buf if self._row is None else self._buf[self._row]
            self._host = np.asarray(b)
        return self._host

    @property
    def capacity(self):
        return (self._buf.shape[-1] - 1) // 7

    @property
    def xyz(self):
        h, K = self._h(), self.capacity
        return np.stack([h[:K], h[K:2 * K], h[2 * K:3 * K]], axis=-1)

    @property
    def intensity(self):
        h, K = self._h(), self.capacity
        return h[3 * K:4 * K]

    @property
    def time(self):
        h, K = self._h(), self.capacity
        return h[4 * K:5 * K]

    @property
    def ring(self):
        h, K = self._h(), self.capacity
        return h[5 * K:6 * K].astype(np.int32)

    @property
    def valid(self):
        h, K = self._h(), self.capacity
        return h[6 * K:7 * K] != 0.0

    @property
    def count(self):
        return np.int32(self._h()[-1])

    @property
    def device_nbytes(self):
        # a row view accounts only its own share of the stacked buffer
        return int(self._buf.shape[-1]) * 4


def build_range_image(
    xyz: np.ndarray,
    intensity: np.ndarray,
    laser_id: np.ndarray,
    time: np.ndarray,
    n_rings: int,
    max_ring_points: int,
    packed: bool = False,
    device: bool = True,
) -> "RangeImage | ByteRangeImage":
    """Host-side bucketing of an unordered point list into a RangeImage.

    Points are appended to their ring in input order, matching the reference's
    `ConvertAndSortScanLines` (SSKE.cxx:139-161). Overflowing points beyond
    `max_ring_points` per ring are dropped; rings >= n_rings are dropped.
    With `device=False` the result stays in host numpy buffers (for window
    batching: several sweeps stack into ONE upload, `stack_range_images`).
    """
    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    laser_id = np.asarray(laser_id, np.int64)

    # native C++ scatter when available (~10x faster host ingest; identical
    # per-ring ordering and overflow semantics)
    from lidarslam_tpu.io import native as native_mod
    if native_mod.available():
        if packed:
            if not device:
                # window path: the full wire format assembled in C++
                out2 = native_mod.build_range_image_packed2_native(
                    xyz, intensity, laser_id, time, n_rings, max_ring_points,
                    XYZ_QUANT_SCALE)
                if out2 is not None:
                    q, inten8, t_q, t_min, t_scale, counts = out2
                    return PackedRangeImage(xyz_q=q, intensity=inten8,
                                            t_q=t_q, t_min=t_min,
                                            t_scale=t_scale, counts=counts)
            out = native_mod.build_range_image_packed_native(
                xyz, intensity, laser_id, time, n_rings, max_ring_points,
                XYZ_QUANT_SCALE)
            if out is not None:
                q, inten8, t16, valid8 = out
                if not device:
                    return _pack_planes(q, inten8, t16, valid8)
                return pack_range_image_bytes(q, inten8, t16, valid8)
        else:
            out = native_mod.build_range_image_native(
                xyz, intensity, laser_id, time, n_rings, max_ring_points)
            if out is not None:
                oxyz, ointen, otime, ovalid = out
                up = jnp.asarray if device else (lambda a: a)
                return RangeImage(
                    xyz=up(oxyz), intensity=up(ointen),
                    time=up(otime), valid=up(ovalid.astype(bool)))

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
        inten8 = np.clip(img_int, 0, 255).astype(np.uint8)
        if not device:
            return _pack_planes(q, inten8, img_time,
                                img_valid.astype(np.uint8))
        return pack_range_image_bytes(q, inten8, img_time.astype(np.float16),
                                      img_valid.astype(np.uint8))
    up = jnp.asarray if device else (lambda a: a)
    return RangeImage(
        xyz=up(img_xyz),
        intensity=up(img_int),
        time=up(img_time),
        valid=up(img_valid),
    )


def stack_range_images(ris):
    """Stack per-frame sweeps into one leading-axis-W container — the input
    of the windowed streaming dispatch (`pipeline.process_stream_window`).

    Host numpy inputs stack host-side into a SINGLE upload per window —
    A/B-measured faster than per-frame device uploads with an on-device
    stack (eager transfers pay a tunnel round-trip each). Device inputs
    stack with an on-device concat (fallback)."""
    r0 = ris[0]
    def stack(leaves):
        # np.generic covers scalar fields (t_min/t_scale): they must stack
        # host-side too, or each scalar becomes its own device transfer
        if isinstance(leaves[0], (np.ndarray, np.generic)):
            return jnp.asarray(np.stack(leaves))
        return jnp.stack(leaves)
    if isinstance(r0, ByteRangeImage):
        return ByteRangeImage(stack([r.buf for r in ris]), r0.shape)
    if isinstance(r0, FlatRangeImage):
        return FlatRangeImage(
            *(stack([getattr(r, f) for r in ris])
              for f in ("xyz_q", "meta", "t_min", "t_scale", "counts")),
            shape=r0.shape)
    cls = type(r0)
    return cls(*(stack([getattr(r, f) for r in ris]) for f in cls._fields))


def to_device_range_image(ri):
    """Upload one host-built sweep (per-frame fallback of the window path)."""
    if isinstance(ri, ByteRangeImage):
        return ByteRangeImage(jnp.asarray(ri.buf), ri.shape)
    if isinstance(ri, FlatRangeImage):
        return FlatRangeImage(
            *(jnp.asarray(getattr(ri, f))
              for f in ("xyz_q", "meta", "t_min", "t_scale", "counts")),
            shape=ri.shape)
    cls = type(ri)
    return cls(*(jnp.asarray(getattr(ri, f)) for f in cls._fields))


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
