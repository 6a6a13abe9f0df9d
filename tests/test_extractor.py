"""Vectorized extractor vs sequential numpy oracle on synthetic scan lines."""

import numpy as np
import jax.numpy as jnp
import pytest

from lidarslam_tpu.config import ExtractorConfig
from lidarslam_tpu.ops import extractor
from lidarslam_tpu.ops.frame import RangeImage, build_range_image, estimate_azimuthal_resolution

from oracle_extractor import OracleExtractor

AZ = np.deg2rad(0.4)


def _ring_from_ranges(ranges, n=None, z=0.0, intensity=None):
    """Build a scan line from per-azimuth ranges (sensor spinning around Z)."""
    n = n or len(ranges)
    az = np.arange(n) * AZ
    r = np.asarray(ranges, np.float64)
    xyz = np.stack([r * np.cos(az), r * np.sin(az), np.full(n, z)], axis=1)
    inten = np.full(n, 30.0) if intensity is None else np.asarray(intensity, np.float64)
    return {"xyz": xyz, "intensity": inten}


def _make_test_rings(seed=0):
    rng = np.random.default_rng(seed)
    rings = []

    # ring 0: smooth wall at ~10 m -> planar points, one sharp range step (edge
    # by depth gap + occlusion invalidation)
    n = 200
    r = np.full(n, 10.0)
    r[120:] = 6.0  # occluder in front
    rings.append(_ring_from_ranges(r + rng.normal(0, 1e-3, n)))

    # ring 1: corner: two flat walls whose normals differ by 70 deg
    # (sin 70 = 0.94 > edge_sin_angle_threshold 0.86) meeting mid-scan
    n = 160
    az = np.arange(n) * AZ
    d1 = 8.0 / np.cos(az)                      # wall perpendicular at azimuth 0
    phi = np.deg2rad(70.0)
    corner_az = 32 * AZ * 2                    # crossing point ~ mid-scan
    dB = (8.0 / np.cos(corner_az)) * np.cos(corner_az - phi)
    d2 = dB / np.cos(az - phi)
    d2 = np.where(d2 <= 0, 1e6, d2)
    r = np.minimum(d1, d2)
    rings.append(_ring_from_ranges(r + rng.normal(0, 5e-4, n)))

    # ring 2: intensity step on a flat wall (edge by intensity gap)
    n = 150
    inten = np.full(n, 20.0)
    inten[75:] = 120.0
    rings.append(_ring_from_ranges(np.full(n, 9.0) + rng.normal(0, 1e-3, n), intensity=inten))

    # ring 3: almost empty ring
    rings.append(_ring_from_ranges(np.full(5, 10.0)))

    # ring 4: too-close points (noise breaks score ties so greedy NMS order is
    # well-defined across float32/float64)
    n = 60
    r = np.full(n, 5.0) + rng.normal(0, 2e-3, n)
    r[20:30] = 0.8
    rings.append(_ring_from_ranges(r))

    # ring 5: random rough structure (saliency / mixed cases)
    n = 180
    r = 8.0 + rng.uniform(-2.5, 2.5, n)
    rings.append(_ring_from_ranges(r))
    return rings


def _to_range_image(rings, cfg):
    xyz = np.concatenate([r["xyz"] for r in rings])
    inten = np.concatenate([r["intensity"] for r in rings])
    lid = np.concatenate([np.full(len(r["xyz"]), i) for i, r in enumerate(rings)])
    t = np.zeros(len(xyz))
    return build_range_image(xyz, inten, lid, t, cfg.n_rings, cfg.max_ring_points)


@pytest.fixture(scope="module")
def setup():
    cfg = ExtractorConfig(n_rings=8, max_ring_points=256, max_keypoints=512, nms_rounds=12)
    rings = _make_test_rings()
    ri = _to_range_image(rings, cfg)
    oracle = OracleExtractor(cfg, AZ).run(rings)
    result = extractor.extract_keypoints(ri, AZ, cfg)
    return cfg, rings, ri, oracle, result


def test_validity_matches_oracle(setup):
    cfg, rings, ri, oracle, result = setup
    got = np.asarray(result.debug["point_validity"])
    for i, o in enumerate(oracle):
        n = len(o["valid"])
        np.testing.assert_array_equal(got[i, :n], o["valid"], err_msg=f"ring {i}")
        assert not got[i, n:].any()


def test_scores_match_oracle(setup):
    cfg, rings, ri, oracle, result = setup
    for name_j, name_o, atol in [("sin_angle", "angle", 2e-3), ("depth_gap", "depth_gap", 1e-2),
                                 ("intensity_gap", "intensity_gap", 1e-3),
                                 ("saliency", "saliency", 5e-2)]:
        got = np.asarray(result.debug[name_j])
        for i, o in enumerate(oracle):
            n = len(o["valid"])
            np.testing.assert_allclose(got[i, :n], o[name_o], atol=atol, rtol=5e-2,
                                       err_msg=f"{name_j} ring {i}")


def test_labels_match_oracle(setup):
    cfg, rings, ri, oracle, result = setup
    for key_j, key_o in [("edge_keypoint", "label_edge"), ("plane_keypoint", "label_plane"),
                         ("blob_keypoint", "label_blob")]:
        got = np.asarray(result.debug[key_j])
        for i, o in enumerate(oracle):
            n = len(o["valid"])
            want = o[key_o]
            # float32 vs float64 score noise can flip borderline NMS picks;
            # require high agreement and identical counts within 1
            agree = (got[i, :n] == want).mean()
            assert agree >= 0.97, f"{key_j} ring {i}: agreement {agree}"
            assert abs(int(got[i, :n].sum()) - int(want.sum())) <= 1, f"{key_j} ring {i}"


def test_keypoints_detected_where_expected(setup):
    cfg, rings, ri, oracle, result = setup
    # corner ring must contain an angle edge near the corner
    edges = result.edges
    n_e = int(edges.count)
    assert n_e > 0
    ring_ids = np.asarray(edges.ring)[:n_e]
    assert (ring_ids == 1).any(), "corner edge missing"
    assert (ring_ids == 2).any(), "intensity edge missing"
    # planar wall must produce plane keypoints on ring 0
    planes = result.planes
    assert int(planes.count) > 10
    # no keypoints from the almost-empty ring
    assert not (ring_ids == 3).any()
    assert not (np.asarray(planes.ring)[: int(planes.count)] == 3).any()


def test_compaction_consistency(setup):
    cfg, rings, ri, oracle, result = setup
    kp = result.planes
    n = int(kp.count)
    assert np.all(np.asarray(kp.valid)[:n])
    assert not np.any(np.asarray(kp.valid)[n:])
    # coordinates of compacted keypoints appear in the original rings
    ring0 = rings[0]["xyz"].astype(np.float32)
    sel = np.asarray(kp.xyz)[:n][np.asarray(kp.ring)[:n] == 0]
    for p in sel[:5]:
        assert np.min(np.linalg.norm(ring0 - p, axis=1)) < 1e-5


def test_per_type_keypoint_budgets(setup):
    """Per-type capacity overrides shape each output independently and
    select the same keypoints as the uniform budget where unsaturated
    (SSKE keeps every labeled point; the budget is the static-shape cap)."""
    cfg, rings, ri, oracle, result = setup
    cfg2 = ExtractorConfig(n_rings=cfg.n_rings, max_ring_points=cfg.max_ring_points,
                           max_keypoints=cfg.max_keypoints, nms_rounds=cfg.nms_rounds,
                           max_edge_keypoints=128, max_plane_keypoints=1024)
    assert (cfg2.kp_capacity(0), cfg2.kp_capacity(1), cfg2.kp_capacity(2)) \
        == (128, 1024, cfg.max_keypoints)
    r2 = extractor.extract_keypoints(ri, AZ, cfg2)
    assert r2.edges.xyz.shape[0] == 128
    assert r2.planes.xyz.shape[0] == 1024
    assert r2.blobs.xyz.shape[0] == cfg.max_keypoints
    # unsaturated types pick identical keypoints as the uniform budget
    for a, b in ((result.edges, r2.edges), (result.planes, r2.planes)):
        na, nb = int(a.count), int(b.count)
        if nb < b.xyz.shape[0]:      # unsaturated in the per-type config
            assert na == nb
            np.testing.assert_array_equal(np.asarray(a.xyz)[:na],
                                          np.asarray(b.xyz)[:nb])


def test_azimuthal_resolution_estimation(setup):
    cfg, rings, ri, oracle, result = setup
    est = estimate_azimuthal_resolution(ri)
    assert abs(est - AZ) / AZ < 0.05


def test_jit_compiles_once():
    import jax

    cfg = ExtractorConfig(n_rings=4, max_ring_points=64, max_keypoints=64)
    fn = jax.jit(extractor.extract_keypoints, static_argnums=(2,))
    rng = np.random.default_rng(0)
    for _ in range(2):
        xyz = rng.uniform(-10, 10, (4, 64, 3)).astype(np.float32)
        ri = RangeImage(xyz=jnp.asarray(xyz), intensity=jnp.zeros((4, 64)),
                        time=jnp.zeros((4, 64)), valid=jnp.ones((4, 64), bool))
        out = fn(ri, 0.007, cfg)
    assert fn._cache_size() == 1


def test_mask_indices_matches_nonzero():
    """_mask_indices == sized jnp.nonzero (ring-major) under capacity; at
    saturation the selection subsamples evenly over the sweep instead of
    truncating at the first rings. Sparse/dense/empty/overflow masks, any
    (R, C) including C not divisible by the 128-block."""
    rng = np.random.default_rng(7)
    for R, C, K, p in [(16, 1024, 2048, 0.02), (64, 2048, 8192, 0.03),
                       (16, 64, 32, 0.9), (4, 128, 512, 0.0),
                       (8, 96, 64, 0.5), (1, 128, 16, 1.0)]:
        m = rng.random((R, C)) < p
        ref = np.flatnonzero(m.ravel())
        got, cnt = extractor._mask_indices(jnp.asarray(m), K)
        got, cnt = np.asarray(got), int(cnt)
        if len(ref) <= K:
            assert cnt == len(ref)
            exp = np.zeros(K, np.int64)
            exp[:len(ref)] = ref
            np.testing.assert_array_equal(got, exp)
        else:
            # saturated: ~K picks, all real set bits, spanning the sweep
            assert K - 4 <= cnt <= K
            sel = got[:cnt]
            assert np.all(m.ravel()[sel])
            assert np.all(np.diff(sel) > 0)
            assert sel[-1] >= ref[-(len(ref) // K + 1)]
