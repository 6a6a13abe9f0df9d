"""Sequential numpy oracle of the scan-to-map localization step.

One dense, loop-per-keypoint float64 implementation of
match -> Tukey-IRLS-LM -> ICP rounds, mirroring the reference semantics the
production kernels implement (KeypointsMatcher.cxx:33-346,
LocalOptimizer.cxx:74-102, Slam.cxx:1071-1156) — used to differential-test
`ops/icp.icp_register` the same way `oracle_extractor.py` anchors the
front-end. Nothing here is vectorized or shared with the production code:
scipy kd-tree for neighbors, per-point Python loops, numpy eigh.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from lidarslam_tpu.config import MatchStatus


# ---------------------------------------------------------------------------
# SE3 (reference RPY convention: R = Rz(y) Ry(p) Rx(r))
# ---------------------------------------------------------------------------

def pose_to_rt(pose6):
    x, y, z, r, p, w = [float(v) for v in pose6]
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cw, sw = np.cos(w), np.sin(w)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cw, -sw, 0], [sw, cw, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx, np.array([x, y, z])


def rotation_derivatives(rpy):
    r, p, w = [float(v) for v in rpy]
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cw, sw = np.cos(w), np.sin(w)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cw, -sw, 0], [sw, cw, 0], [0, 0, 1]])
    dRx = np.array([[0, 0, 0], [0, -sr, -cr], [0, cr, -sr]])
    dRy = np.array([[-sp, 0, cp], [0, 0, 0], [-cp, 0, -sp]])
    dRz = np.array([[-sw, -cw, 0], [cw, -sw, 0], [0, 0, 0]])
    return Rz @ Ry @ dRx, Rz @ dRy @ Rx, dRz @ Ry @ Rx


# ---------------------------------------------------------------------------
# Matching (KeypointsMatcher semantics)
# ---------------------------------------------------------------------------

def _pca(neighbors):
    mean = neighbors.mean(axis=0)
    d = neighbors - mean
    cov = d.T @ d / len(neighbors)
    lam, vec = np.linalg.eigh(cov)     # ascending
    return mean, lam, vec


def match_planes_oracle(kp, valid, map_xyz, pose, params):
    """Per-keypoint plane matches. Returns list of dicts (slot-aligned)."""
    R, t = pose_to_rt(pose)
    tree = cKDTree(map_xyz) if len(map_xyz) else None
    k = params.plane_nb_neighbors
    out = []
    for q in range(len(kp)):
        rec = {"status": MatchStatus.UNKNOWN, "A": None, "P": None,
               "X": kp[q], "weight": 0.0}
        out.append(rec)
        if not valid[q]:
            continue
        world = R @ kp[q] + t
        if tree is None or len(map_xyz) < k:
            rec["status"] = MatchStatus.NOT_ENOUGH_NEIGHBORS
            continue
        d, idx = tree.query(world, k=k)
        d = np.atleast_1d(d)
        idx = np.atleast_1d(idx)
        if d[-1] > params.max_neighbors_distance:
            rec["status"] = MatchStatus.NEIGHBORS_TOO_FAR
            continue
        nbr = map_xyz[idx]
        mean, lam, vec = _pca(nbr)
        n = vec[:, 0]
        if not (np.all(np.isfinite(n)) and lam[2] > 1e-20):
            rec["status"] = MatchStatus.INVALID_NUMERICAL
            continue
        if lam[1] < params.planarity_threshold * max(lam[2], 1e-30):
            rec["status"] = MatchStatus.BAD_PCA_STRUCTURE
            continue
        mse = lam[0]
        if mse >= params.plane_max_model_error**2:
            rec["status"] = MatchStatus.MSE_TOO_LARGE
            continue
        rec["status"] = MatchStatus.SUCCESS
        rec["A"] = np.outer(n, n)
        rec["P"] = mean
        rec["weight"] = 1.0 if mse <= 1e-6 else \
            1.0 - np.sqrt(mse) / params.plane_max_model_error
    return out


def match_edges_oracle(kp, valid, map_xyz, pose, params, rings=None):
    """Per-keypoint line matches: RANSAC filter (localization mode) or
    one-per-ring filter (ego-motion mode, params.single_edge_per_ring)."""
    R, t = pose_to_rt(pose)
    tree = cKDTree(map_xyz) if len(map_xyz) else None
    k = params.edge_nb_neighbors
    out = []
    for q in range(len(kp)):
        rec = {"status": MatchStatus.UNKNOWN, "A": None, "P": None,
               "X": kp[q], "weight": 0.0}
        out.append(rec)
        if not valid[q]:
            continue
        world = R @ kp[q] + t
        if tree is None or len(map_xyz) < 1:
            rec["status"] = MatchStatus.NOT_ENOUGH_NEIGHBORS
            continue
        kk = min(k, len(map_xyz))
        d, idx = tree.query(world, k=kk)
        d = np.atleast_1d(d)
        idx = np.atleast_1d(idx)
        found = np.ones(kk, bool)
        nbr = map_xyz[idx]

        if params.single_edge_per_ring:
            rg = rings[idx]
            r0 = rg[0]
            allowed = found & (np.abs(rg - r0) <= 4) & (rg != r0)
            sel = np.zeros(kk, bool)
            seen = set()
            for j in range(kk):
                if allowed[j] and rg[j] not in seen:
                    sel[j] = True
                    seen.add(rg[j])
        else:
            # 2-point RANSAC around the closest neighbor
            p1 = nbr[0]
            best_score, best_inl = -1, None
            for i in range(1, kk):
                dir_ = nbr[i] - p1
                nrm = np.linalg.norm(dir_)
                dir_ = dir_ / max(nrm, 1e-12)
                inl = np.zeros(kk - 1, bool)
                for j in range(1, kk):
                    if j == i:
                        inl[j - 1] = True
                        continue
                    rel = nbr[j] - p1
                    dd = np.linalg.norm(np.cross(rel, dir_))
                    inl[j - 1] = dd < params.edge_max_model_error
                score = int(inl.sum())
                if score > best_score:
                    best_score, best_inl = score, inl
            sel = np.concatenate([[True], best_inl if best_inl is not None
                                  else np.zeros(kk - 1, bool)])

        if sel.sum() < params.edge_min_nb_neighbors:
            rec["status"] = MatchStatus.NOT_ENOUGH_NEIGHBORS
            continue
        if np.max(d[sel]) > params.max_neighbors_distance:
            rec["status"] = MatchStatus.NEIGHBORS_TOO_FAR
            continue
        mean, lam, vec = _pca(nbr[sel])
        n = vec[:, 2]    # line direction = largest eigenvector
        if not (np.all(np.isfinite(n)) and lam[2] > 1e-20):
            rec["status"] = MatchStatus.INVALID_NUMERICAL
            continue
        mse = lam[0] + lam[1]
        if mse >= params.edge_max_model_error**2:
            rec["status"] = MatchStatus.MSE_TOO_LARGE
            continue
        rec["status"] = MatchStatus.SUCCESS
        rec["A"] = np.eye(3) - np.outer(n, n)
        rec["P"] = mean
        rec["weight"] = 1.0 if mse <= 1e-6 else \
            1.0 - np.sqrt(mse) / params.edge_max_model_error
    return out


# ---------------------------------------------------------------------------
# Robust LM (LocalOptimizer + Ceres-Tukey IRLS semantics)
# ---------------------------------------------------------------------------

def tukey_rho(s, a):
    u = np.clip(1.0 - s / (a * a), 0.0, 1.0)
    return a * a / 3.0 * (1.0 - u**3)


def tukey_weight(s, a):
    u = np.clip(1.0 - s / (a * a), 0.0, 1.0)
    return u * u


def _evaluate(matches, pose, sat, two_d=False):
    R, t = pose_to_rt(pose)
    dRs = rotation_derivatives(pose[3:6])
    H = np.zeros((6, 6))
    g = np.zeros(6)
    cost = 0.0
    for m in matches:
        if m["status"] != MatchStatus.SUCCESS:
            continue
        A, P, X, w = m["A"], m["P"], m["X"], m["weight"]
        d = R @ X + t - P
        e = A @ d
        s = float(e @ e)
        irls = w * tukey_weight(s, sat)
        J = np.zeros((3, 6))
        J[:, 0:3] = A
        for c, dR in enumerate(dRs):
            J[:, 3 + c] = A @ (dR @ X)
        H += irls * (J.T @ J)
        g += irls * (J.T @ e)
        cost += w * tukey_rho(s, sat)
    return cost, H, g


def robust_lm_oracle(matches, pose0, sat, cfg, lm_max_iter):
    pose = np.asarray(pose0, np.float64).copy()
    cost, H, g = _evaluate(matches, pose, sat, cfg.two_d_mode)
    lam = float(cfg.initial_lm_lambda)
    nsucc = 1
    free = np.array([1.0, 1.0, 0.0, 0.0, 0.0, 1.0]) if cfg.two_d_mode \
        else np.ones(6)
    for _ in range(lm_max_iter):
        D = np.maximum(np.diag(H), 1e-12)
        delta = -np.linalg.solve(H + lam * np.diag(D), g) * free
        pose_new = pose + delta
        cost_new, H_new, g_new = _evaluate(matches, pose_new, sat, cfg.two_d_mode)
        accept = np.isfinite(cost_new) and np.all(np.isfinite(delta)) \
            and cost_new < cost
        if accept:
            small = (cost - cost_new) <= cfg.function_tolerance * max(cost, 1e-30)
            pose, cost, H, g = pose_new, cost_new, H_new, g_new
            lam = max(lam / 3.0, 1e-12)
            nsucc += 1
            if small:
                break
        else:
            lam = min(lam * 4.0, 1e12)
            if lam >= 1e10:
                break
    return pose, nsucc, cost, H


# ---------------------------------------------------------------------------
# ICP loop (Slam::Localization round structure)
# ---------------------------------------------------------------------------

def icp_register_oracle(edge_kp, edge_valid, edge_map, plane_kp, plane_valid,
                        plane_map, pose0, params, solver_cfg, icp_iters,
                        lm_max_iter, min_matches, edge_rings=None):
    """Sequential ICP: match -> robust LM per round with the shrinking
    saturation schedule and the n_success==1 early exit. Either keypoint
    set may be None. Returns (pose, failed, total_matches, per_type_counts)."""
    pose = np.asarray(pose0, np.float64).copy()
    failed = False
    total = 0
    counts = [0, 0, 0]
    for it in range(icp_iters):
        ratio = it / max(icp_iters - 1, 1)
        sat = (1.0 - ratio) * params.init_saturation_distance \
            + ratio * params.final_saturation_distance
        matches = []
        it_counts = [0, 0, 0]
        if edge_kp is not None:
            em = match_edges_oracle(edge_kp, edge_valid, edge_map, pose,
                                    params, rings=edge_rings)
            it_counts[0] = sum(m["status"] == MatchStatus.SUCCESS for m in em)
            matches += em
        if plane_kp is not None:
            pm = match_planes_oracle(plane_kp, plane_valid, plane_map, pose,
                                     params)
            it_counts[1] = sum(m["status"] == MatchStatus.SUCCESS for m in pm)
            matches += pm
        it_total = sum(it_counts)
        total = it_total
        counts = it_counts
        if it_total < min_matches:
            failed = True
            break
        pose, nsucc, _, _ = robust_lm_oracle(matches, pose, sat, solver_cfg,
                                             lm_max_iter)
        if nsucc == 1:
            break
    return pose, failed, total, counts
