"""Sequential numpy oracle of the reference keypoint-extractor semantics.

Independent float64 re-implementation (loops, exact greedy NMS) of
SpinningSensorKeypointExtractor.cxx:207-590, used to validate the vectorized
TPU kernels in lidarslam_tpu/ops/extractor.py.
"""

import numpy as np


def fit_line_pca(pts):
    """PCA line fit: (position, direction, eigvals ascending)."""
    mean = pts.mean(axis=0)
    centered = pts - mean
    cov = centered.T @ centered / len(pts)
    lam, V = np.linalg.eigh(cov)
    return mean, V[:, 2], lam


def sq_dist_line(p, pos, direction):
    return np.sum(np.cross(p - pos, direction) ** 2, axis=-1)


def fit_and_check(pts, max_angle_deg=40.0, max_dist=0.02):
    """FitPCAAndCheckConsistency semantics (SSKE.cxx:87-108)."""
    max_sin = np.sin(np.deg2rad(max_angle_deg))
    chord = pts[-1] - pts[0]
    chord = chord / max(np.linalg.norm(chord), 1e-300)
    for k in range(len(pts) - 1):
        seg = pts[k + 1] - pts[k]
        seg = seg / max(np.linalg.norm(seg), 1e-300)
        if np.linalg.norm(np.cross(chord, seg)) > max_sin:
            return None
    pos, d, lam = fit_line_pca(pts)
    if np.max(sq_dist_line(pts, pos, d)) > max_dist**2:
        return None
    return pos, d


class OracleExtractor:
    def __init__(self, cfg, azimuthal_resolution):
        self.cfg = cfg
        self.az = azimuthal_resolution

    def run(self, rings):
        """rings: list of dicts {xyz (n,3) f64, intensity (n,)}.

        Returns per-ring dict of arrays: valid, angle, depth_gap, saliency,
        intensity_gap, label_edge, label_plane, label_blob.
        """
        out = []
        for ring in rings:
            out.append(self._process_ring(ring))
        return out

    def _process_ring(self, ring):
        cfg = self.cfg
        xyz = np.asarray(ring["xyz"], np.float64)
        inten = np.asarray(ring["intensity"], np.float64)
        n = len(xyz)
        W = cfg.neighbor_width
        res = {
            "valid": np.zeros(n, bool),
            "angle": np.zeros(n),
            "depth_gap": np.zeros(n),
            "saliency": np.zeros(n),
            "intensity_gap": np.zeros(n),
            "label_edge": np.zeros(n, bool),
            "label_plane": np.zeros(n, bool),
            "label_blob": np.zeros(n, bool),
        }
        if n < 2 * W + 1:
            return res

        # ---- invalidation ----
        valid = np.ones(n, bool)
        valid[:W] = False
        valid[n - W:] = False
        L = np.linalg.norm(xyz, axis=1)
        angle_beam_normal = np.deg2rad(90.0 - cfg.min_beam_surface_angle)
        coeff = np.sin(self.az) / np.cos(self.az + angle_beam_normal)
        for i in range(W, n - W):
            if L[i] < cfg.min_distance_to_sensor:
                valid[i] = False
            sq_thr = max(L[i] * coeff, 0.02) ** 2
            if np.sum((xyz[i + 1] - xyz[i]) ** 2) > sq_thr:
                if L[i] < L[i + 1]:
                    valid[i + 1] = False
                    for j in range(i + 1, i + W):
                        if np.sum((xyz[j + 1] - xyz[j]) ** 2) > sq_thr:
                            break
                        valid[j + 1] = False
                else:
                    valid[i] = False
                    for j in range(i - 1, i - W, -1):
                        if np.sum((xyz[j + 1] - xyz[j]) ** 2) > sq_thr:
                            break
                        valid[j] = False
        res["valid"] = valid

        # ---- curvature ----
        sq_dist_thr = cfg.dist_to_line_threshold**2
        for i in range(W, n - W):
            if not valid[i]:
                continue
            res["intensity_gap"][i] = abs(inten[i + 1] - inten[i - 1])
            left_idx = [i - 1 - k for k in range(W)]
            right_idx = [i + 1 + k for k in range(W)]
            lfit = fit_and_check(xyz[left_idx], cfg.line_max_angle_deg, cfg.line_max_distance)
            rfit = fit_and_check(xyz[right_idx], cfg.line_max_angle_deg, cfg.line_max_distance)
            dl = dr = 0.0
            if lfit and rfit:
                dl = sq_dist_line(xyz[i], *lfit)
                dr = sq_dist_line(xyz[i], *rfit)
                if dl < sq_dist_thr and dr < sq_dist_thr:
                    res["angle"][i] = np.linalg.norm(np.cross(lfit[1], rfit[1]))
            elif not lfit and rfit:
                dl = 0.25 * min(sq_dist_line(xyz[j], *rfit) for j in left_idx)
            elif lfit and not rfit:
                dr = 0.25 * min(sq_dist_line(xyz[j], *lfit) for j in right_idx)
            else:
                far = []
                sq_d = L[i] ** 2
                for idx_list in (left_idx, right_idx):
                    flag = False
                    for j in idx_list:
                        if abs(np.sum(xyz[j] ** 2) - sq_d) > 1.5:
                            flag = True
                            far.append(j)
                        elif flag:
                            break
                if len(far) > W:
                    pos, d, _ = fit_line_pca(xyz[far])
                    res["saliency"][i] = sq_dist_line(xyz[i], pos, d)
            res["depth_gap"][i] = max(dl, dr)

        # ---- labeling ----
        valid_edge = valid.copy()
        valid_plane = valid.copy()

        def greedy(scores, thr, w, valid_type, label, maximize=True):
            order = np.argsort(-scores if maximize else scores, kind="stable")
            for idx in order:
                s = scores[idx]
                if maximize and s < thr:
                    break
                if not maximize:
                    if s > thr:
                        break
                    if s < 1e-6:
                        continue
                if not valid_type[idx]:
                    continue
                label[idx] = True
                lo, hi = max(0, idx - w), min(n - 1, idx + w)
                valid_type[lo:hi + 1] = False

        greedy(res["depth_gap"], cfg.edge_depth_gap_threshold**2, W - 1, valid_edge, res["label_edge"])
        greedy(res["angle"], cfg.edge_sin_angle_threshold, W, valid_edge, res["label_edge"])
        greedy(res["saliency"], cfg.edge_saliency_threshold**2, W - 1, valid_edge, res["label_edge"])
        greedy(res["intensity_gap"], cfg.edge_intensity_gap_threshold, 1, valid_edge, res["label_edge"])
        greedy(res["angle"], cfg.plane_sin_angle_threshold, 4, valid_plane, res["label_plane"], maximize=False)
        res["label_blob"] = valid & (np.arange(n) % cfg.blob_stride == 0)
        return res
