"""Spinning-sensor keypoint extraction as batched stencil kernels.

TPU-native re-design of the reference front-end
(SpinningSensorKeypointExtractor.cxx:118-590): every per-ring sequential loop
becomes a masked, shift-based stencil over the whole (rings x firings) range
image, so all rings and all points are processed by a handful of fused VPU
passes instead of OpenMP loops:

- point invalidation (SSKE.cxx:207-308): occlusion-border gap propagation is
  unrolled over the fixed +-neighbor_width window as shifted boolean masks;
- curvature scores (SSKE.cxx:311-471): left/right neighborhoods are W stacked
  column shifts; line fits use the closed-form batched 3x3 PCA; the four
  scores (sin-angle, depth gap, saliency, intensity gap) are computed for all
  points at once under case masks;
- keypoint labeling (SSKE.cxx:474-590): the per-ring sort + greedy
  non-max-suppression becomes an iterated local-peak fixpoint which selects
  exactly the greedy result when run to convergence (each round selects every
  candidate that dominates its +-window; suppression then mirrors the greedy
  invalidation), run for a fixed `nms_rounds` rounds.

Scores keep the reference's units: depth gap and saliency are *squared*
distances, angle scores are sines, thresholds are compared accordingly.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidarslam_tpu.config import ExtractorConfig
from lidarslam_tpu.core import pca
from lidarslam_tpu.ops.frame import Keypoints, RangeImage
from lidarslam_tpu.ops import prims
from lidarslam_tpu.ops.prims import prefix_shift

_NEG = -3.0e38
_POS = 3.0e38


def _shift(x, d, fill=0.0):
    """out[:, c] = x[:, c - d] (d > 0 pulls from the left), filling borders."""
    if d == 0:
        return x
    pad = [(0, 0)] * x.ndim
    if d > 0:
        pad[1] = (d, 0)
        sl = tuple([slice(None), slice(0, x.shape[1])] + [slice(None)] * (x.ndim - 2))
        return jnp.pad(x, pad, constant_values=fill)[sl]
    pad[1] = (0, -d)
    sl = tuple([slice(None), slice(-d, x.shape[1] - d)] + [slice(None)] * (x.ndim - 2))
    return jnp.pad(x, pad, constant_values=fill)[sl]


def _window_max(x, w, fill=_NEG):
    out = x
    for d in range(1, w + 1):
        out = jnp.maximum(out, _shift(x, d, fill))
        out = jnp.maximum(out, _shift(x, -d, fill))
    return out


def _window_min(x, w, fill=_POS):
    out = x
    for d in range(1, w + 1):
        out = jnp.minimum(out, _shift(x, d, fill))
        out = jnp.minimum(out, _shift(x, -d, fill))
    return out


def _dilate(mask, w):
    out = mask
    for d in range(1, w + 1):
        out = out | _shift(mask, d, False)
        out = out | _shift(mask, -d, False)
    return out


class ExtractionResult(NamedTuple):
    edges: Keypoints
    planes: Keypoints
    blobs: Keypoints
    debug: dict  # per-point score/label grids (GetDebugArray parity, SSKE.cxx:668-679)


def extract_keypoints(ri: RangeImage, azimuthal_resolution, cfg: ExtractorConfig) -> ExtractionResult:
    """Full extraction pipeline on one sweep. `cfg` must be static under jit."""
    xyz, intensity, valid = ri.xyz, ri.intensity, ri.valid
    R, C = valid.shape
    W = cfg.neighbor_width

    col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    n_ring = jnp.sum(valid, axis=1).astype(jnp.int32)              # packed-left lengths
    ring_ok = n_ring >= 2 * W + 1                                   # SSKE.h:119
    core = (col >= W) & (col < (n_ring[:, None] - W)) & ring_ok[:, None] & valid

    L = jnp.linalg.norm(xyz, axis=-1)

    # ---------------- invalidation (SSKE.cxx:207-308) ----------------
    angle_beam_normal = math.radians(90.0 - cfg.min_beam_surface_angle)
    az = azimuthal_resolution
    coeff = jnp.sin(az) / jnp.cos(az + angle_beam_normal)
    max_pos_diff = jnp.maximum(L * coeff, 0.02)
    sq_thr = max_pos_diff * max_pos_diff                            # per outer point

    nxt = _shift(xyz, -1)
    sq_next = jnp.sum((nxt - xyz) ** 2, axis=-1)                    # pair (c, c+1)
    pair_in = valid & _shift(valid, -1, False)

    gap0 = (sq_next > sq_thr) & pair_in & core
    closer = L < _shift(L, -1, fill=_POS)
    fwd = gap0 & closer
    bwd = gap0 & ~closer

    inv = jnp.zeros((R, C), bool)
    # forward: invalidate i+1, then i+1+k while pairs (i+k, i+k+1)... stay closed
    inv = inv | _shift(fwd, 1, False)
    ok_f = jnp.ones((R, C), bool)
    for k in range(1, W):
        ok_f = ok_f & (_shift(sq_next, -k) <= sq_thr)               # pair at i+k vs thr(i)
        inv = inv | _shift(fwd & ok_f, k + 1, False)
    # backward: invalidate i, then i-k while pairs (i-k, i-k+1) stay closed
    inv = inv | bwd
    ok_b = jnp.ones((R, C), bool)
    for k in range(1, W):
        ok_b = ok_b & (_shift(sq_next, k) <= sq_thr)                # pair at i-k vs thr(i)
        inv = inv | _shift(bwd & ok_b, -k, False)

    too_close = L < cfg.min_distance_to_sensor
    point_valid = core & ~too_close & ~inv

    # ---------------- curvature scores (SSKE.cxx:311-471) ----------------
    left = jnp.stack([_shift(xyz, d) for d in range(1, W + 1)], axis=2)    # (R,C,W,3) near->far
    right = jnp.stack([_shift(xyz, -d) for d in range(1, W + 1)], axis=2)

    max_sin = math.sin(math.radians(cfg.line_max_angle_deg))
    sq_line_max_dist = cfg.line_max_distance ** 2

    def side_fit(nbrs):
        # consistency: chord vs consecutive segments (SSKE.cxx:87-108)
        chord = nbrs[..., W - 1, :] - nbrs[..., 0, :]
        chord = chord / jnp.maximum(jnp.linalg.norm(chord, axis=-1, keepdims=True), 1e-12)
        consistent = jnp.ones((R, C), bool)
        for k in range(W - 1):
            seg = nbrs[..., k + 1, :] - nbrs[..., k, :]
            seg = seg / jnp.maximum(jnp.linalg.norm(seg, axis=-1, keepdims=True), 1e-12)
            sin_a = jnp.linalg.norm(jnp.cross(chord, seg), axis=-1)
            consistent = consistent & (sin_a <= max_sin)
        pos, direction, lam, _ = pca.line_fit(nbrs, jnp.ones(nbrs.shape[:-1], bool))
        d2 = pca.sq_dist_to_line(nbrs, pos[..., None, :], direction[..., None, :])
        accurate = jnp.max(d2, axis=-1) <= sq_line_max_dist
        return pos, direction, consistent & accurate

    lpos, ldir, lflat = side_fit(left)
    rpos, rdir, rflat = side_fit(right)

    dl_pt = pca.sq_dist_to_line(xyz, lpos, ldir)
    dr_pt = pca.sq_dist_to_line(xyz, rpos, rdir)

    sq_dist_line_thr = cfg.dist_to_line_threshold ** 2
    both = lflat & rflat
    angle_ok = both & (dl_pt < sq_dist_line_thr) & (dr_pt < sq_dist_line_thr)
    sin_angle = jnp.where(angle_ok, jnp.linalg.norm(jnp.cross(ldir, rdir), axis=-1), 0.0)

    # mixed cases: min distance of the non-flat side's neighbors to the flat line, x0.25
    d_left_to_rline = pca.sq_dist_to_line(left, rpos[..., None, :], rdir[..., None, :])
    d_right_to_lline = pca.sq_dist_to_line(right, lpos[..., None, :], ldir[..., None, :])
    dist_left = jnp.where(~lflat & rflat, 0.25 * jnp.min(d_left_to_rline, axis=-1),
                          jnp.where(both, dl_pt, 0.0))
    dist_right = jnp.where(lflat & ~rflat, 0.25 * jnp.min(d_right_to_lline, axis=-1),
                           jnp.where(both, dr_pt, 0.0))
    depth_gap = jnp.maximum(dist_left, dist_right)

    # saliency (neither side flat): consecutive far-neighbor run (SSKE.cxx:419-464)
    sq_depth = L * L
    min_depth_gap = 1.5  # [m^2 quirk kept from SSKE.cxx:315]

    def far_run(nbrs):
        far = jnp.abs(jnp.sum(nbrs * nbrs, axis=-1) - sq_depth[..., None]) > min_depth_gap
        flag = jnp.zeros((R, C), bool)
        stopped = jnp.zeros((R, C), bool)
        incl = []
        for k in range(W):
            fk = far[..., k]
            incl.append(fk & ~stopped)
            stopped = stopped | (flag & ~fk)
            flag = flag | fk
        return jnp.stack(incl, axis=-1)

    far_mask = jnp.concatenate([far_run(left), far_run(right)], axis=-1)   # (R,C,2W)
    far_pts = jnp.concatenate([left, right], axis=-2)
    fpos, fdir, _, fcount = pca.line_fit(far_pts, far_mask)
    sal_ok = ~lflat & ~rflat & (fcount > W)
    saliency = jnp.where(sal_ok, pca.sq_dist_to_line(xyz, fpos, fdir), 0.0)

    intensity_gap = jnp.abs(_shift(intensity, -1) - _shift(intensity, 1))

    # zero scores for skipped (invalid) points (SSKE.cxx:336-339)
    sin_angle = jnp.where(point_valid, sin_angle, 0.0)
    depth_gap = jnp.where(point_valid, depth_gap, 0.0)
    saliency = jnp.where(point_valid, saliency, 0.0)
    intensity_gap = jnp.where(point_valid, intensity_gap, 0.0)

    # ---------------- labeling (SSKE.cxx:474-573) ----------------
    valid_edge = point_valid
    label_edge = jnp.zeros((R, C), bool)
    criteria = (
        (depth_gap, cfg.edge_depth_gap_threshold ** 2, W - 1),
        (sin_angle, cfg.edge_sin_angle_threshold, W),
        (saliency, cfg.edge_saliency_threshold ** 2, W - 1),
        (intensity_gap, cfg.edge_intensity_gap_threshold, 1),
    )
    for score, thr, w in criteria:
        sel, valid_edge = _nms(score, valid_edge & (score >= thr), w, cfg.nms_rounds,
                               col, valid_edge, maximize=True)
        label_edge = label_edge | sel

    cand_plane = point_valid & (sin_angle <= cfg.plane_sin_angle_threshold) & (sin_angle >= 1e-6)
    label_plane, _ = _nms(sin_angle, cand_plane, 4, cfg.nms_rounds, col, point_valid,
                          maximize=False)

    label_blob = point_valid & (col % cfg.blob_stride == 0)

    debug = {
        "sin_angle": sin_angle,
        "saliency": saliency,
        "depth_gap": depth_gap,
        "intensity_gap": intensity_gap,
        "edge_keypoint": label_edge,
        "plane_keypoint": label_plane,
        "blob_keypoint": label_blob,
        "edge_validity": valid_edge | label_edge,
        "point_validity": point_valid,
    }

    return ExtractionResult(
        edges=_compact(ri, label_edge, cfg.kp_capacity(0)),
        planes=_compact(ri, label_plane, cfg.kp_capacity(1)),
        blobs=_compact(ri, label_blob, cfg.kp_capacity(2)),
        debug=debug,
    )


def _nms(score, cand, w, rounds, col, persistent_valid, maximize):
    """Iterated local-peak fixpoint == greedy sorted NMS (SSKE.cxx:499-563).

    Each round selects every candidate that strictly dominates its +-w window
    (ties broken toward the smaller column, matching the stable sort), then
    suppresses +-w neighborhoods. Returns (selected, persistent_valid after
    suppression) — suppression persists into later criteria via IsPointValid.
    """
    sgn = 1.0 if maximize else -1.0
    selected = jnp.zeros_like(cand)

    def body(_, state):
        cand_i, selected_i = state
        s = jnp.where(cand_i, sgn * score, _NEG)
        m = _window_max(s, w)
        is_max = cand_i & (s >= m) & (s > _NEG)
        c_sel = jnp.where(is_max, col, jnp.iinfo(jnp.int32).max)
        c_min = _window_min(c_sel, w, fill=jnp.iinfo(jnp.int32).max)
        peak = is_max & (col <= c_min)
        selected_i = selected_i | peak
        cand_i = cand_i & ~_dilate(peak, w)
        return cand_i, selected_i

    cand, selected = jax.lax.fori_loop(0, rounds, body, (cand, selected))
    return selected, persistent_valid & ~_dilate(selected, w)


def _mask_indices(mask, capacity):
    """Ring-major indices of `capacity` set bits of a (R, C) label mask
    plus the kept count — the scatter-free sized-nonzero (sized jnp.nonzero
    lowers to a full-length scatter-add, ~1 ms/call at 64-beam scale).
    Beyond capacity the selection subsamples EVENLY over the sweep instead
    of truncating (truncation would bias the keypoint set toward the first
    rings; the reference keeps every labeled point, SSKE.cxx:575-589)."""
    return prims.spread_k_indices(mask, capacity)


def _compact(ri: RangeImage, mask, capacity):
    """Flatten a (R, C) label mask into a fixed-capacity Keypoints set,
    preserving ring-major order (keypoint push order, SSKE.cxx:575-589)."""
    R, C = mask.shape
    idx, count = _mask_indices(mask, capacity)
    slot_valid = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(count, capacity)
    return Keypoints(
        xyz=ri.xyz.reshape(-1, 3)[idx],
        intensity=ri.intensity.ravel()[idx],
        time=ri.time.ravel()[idx],
        ring=(idx // C).astype(jnp.int32),
        valid=slot_valid,
        count=jnp.minimum(count, capacity),
    )
