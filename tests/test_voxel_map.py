"""Voxel map insert/roll/decay/submap/k-NN vs numpy dict-grid + brute force."""

import numpy as np
import jax.numpy as jnp
import pytest

from lidarslam_tpu.config import MapConfig, SamplingMode
from lidarslam_tpu.ops import voxel_map as vm

CFG = MapConfig(grid_size=10, voxel_resolution=2.0, leaf_size=0.5,
                capacity=4096, submap_capacity=4096)
HALF = vm.half_extent(CFG)  # 10 m


def _add(m, pts, inten=None, t=0.0, cfg=CFG, fixed=False):
    pts = np.asarray(pts, np.float32)
    k = len(pts)
    inten = np.zeros(k, np.float32) if inten is None else np.asarray(inten, np.float32)
    return vm.add_points(m, jnp.asarray(pts), jnp.asarray(inten),
                         jnp.float32(t), jnp.ones(k, bool), jnp.float32(t), cfg, fixed)


def _points(m):
    v = np.asarray(m.valid)
    return np.asarray(m.xyz)[v]


def test_insert_dedup_one_per_leaf():
    m = VoxelMapEmpty()
    # 5 points in the same 0.5 m leaf + 2 in other leaves
    pts = [[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [0.3, 0.1, 0.2], [0.12, 0.34, 0.4],
           [0.05, 0.05, 0.05], [1.1, 0.0, 0.0], [-3.2, 4.0, 0.7]]
    m = _add(m, pts)
    assert int(m.n_points) == 3


def VoxelMapEmpty(cfg=CFG):
    return vm.VoxelMap.empty(cfg)


def test_sampling_modes():
    base = [[0.1, 0.1, 0.1]]
    newer = [[0.4, 0.4, 0.4]]
    # FIRST keeps the old point
    cfg_first = _cfg(SamplingMode.FIRST)
    m = _add(VoxelMapEmpty(cfg_first), base, cfg=cfg_first)
    m = _add(m, newer, t=1.0, cfg=cfg_first)
    np.testing.assert_allclose(_points(m), base, atol=1e-6)
    # LAST keeps the new point
    cfg_last = _cfg(SamplingMode.LAST)
    m = _add(VoxelMapEmpty(cfg_last), base, cfg=cfg_last)
    m = _add(m, newer, t=1.0, cfg=cfg_last)
    np.testing.assert_allclose(_points(m), newer, atol=1e-6)
    # MAX_INTENSITY keeps brightest
    cfg_mi = _cfg(SamplingMode.MAX_INTENSITY)
    m = _add(VoxelMapEmpty(cfg_mi), base, inten=[5.0], cfg=cfg_mi)
    m = _add(m, newer, inten=[50.0], t=1.0, cfg=cfg_mi)
    np.testing.assert_allclose(_points(m), newer, atol=1e-6)
    m = _add(m, [[0.2, 0.2, 0.2]], inten=[10.0], t=2.0, cfg=cfg_mi)
    np.testing.assert_allclose(_points(m), newer, atol=1e-6)
    # CENTER_POINT keeps closest to leaf center (leaf [0,0.5)^3 center 0.25)
    cfg_cp = _cfg(SamplingMode.CENTER_POINT)
    m = _add(VoxelMapEmpty(cfg_cp), [[0.05, 0.05, 0.05]], cfg=cfg_cp)
    m = _add(m, [[0.26, 0.24, 0.25]], t=1.0, cfg=cfg_cp)
    np.testing.assert_allclose(_points(m), [[0.26, 0.24, 0.25]], atol=1e-6)
    # CENTROID averages (old*count + mean(new)) / (count+1)
    cfg_ct = _cfg(SamplingMode.CENTROID)
    m = _add(VoxelMapEmpty(cfg_ct), [[0.1, 0.1, 0.1]], cfg=cfg_ct)
    m = _add(m, [[0.3, 0.3, 0.3], [0.2, 0.2, 0.4]], t=1.0, cfg=cfg_ct)
    want = (np.array([0.1, 0.1, 0.1]) * 1 + np.array([0.25, 0.25, 0.35])) / 2
    np.testing.assert_allclose(_points(m), [want], atol=1e-5)


def _cfg(mode):
    import dataclasses
    return dataclasses.replace(CFG, sampling=mode)


def test_count_increments_once_per_add():
    m = VoxelMapEmpty()
    m = _add(m, [[0.1, 0.1, 0.1], [0.2, 0.2, 0.2]], t=0.0)  # same leaf, one add
    v = np.asarray(m.valid)
    assert np.asarray(m.count)[v].tolist() == [1]
    m = _add(m, [[0.3, 0.3, 0.3]], t=1.0)
    v = np.asarray(m.valid)
    assert np.asarray(m.count)[v].tolist() == [2]
    m = _add(m, [[5.0, 5.0, 5.0]], t=2.0)
    v = np.asarray(m.valid)
    assert sorted(np.asarray(m.count)[v].tolist()) == [1, 2]


def test_fixed_points_immutable():
    cfg = _cfg(SamplingMode.LAST)
    m = _add(VoxelMapEmpty(cfg), [[0.1, 0.1, 0.1]], cfg=cfg, fixed=True)
    m2 = _add(m, [[0.4, 0.4, 0.4]], t=5.0, cfg=cfg)
    np.testing.assert_allclose(_points(m2), [[0.1, 0.1, 0.1]], atol=1e-6)
    v = np.asarray(m2.valid)
    assert np.asarray(m2.count)[v].tolist() == [1]  # not bumped
    assert np.asarray(m2.time)[v].tolist() == [0.0]  # not refreshed


def test_roll_drops_and_rebases():
    m = VoxelMapEmpty()
    m = _add(m, [[-9.0, 0.0, 0.0], [9.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    # new frame bbox sticks out to +14 -> window must roll +x
    m2, off = vm.roll(m, jnp.asarray([12.0, -1.0, -1.0]), jnp.asarray([14.0, 1.0, 1.0]), CFG)
    off = np.asarray(off)
    assert off[0] > 0 and off[1] == 0 and off[2] == 0
    pts = _points(m2)
    # all remaining points shifted by -off*res and within window
    assert np.all(np.abs(pts) <= HALF + 1e-5)
    res = vm.effective_resolution(CFG)
    # the -9 point must have been dropped (out of rolled window)
    assert len(pts) == 2
    orig = pts + off * res
    assert any(np.allclose(o, [9.0, 0.0, 0.0], atol=1e-5) for o in orig)
    assert any(np.allclose(o, [0.0, 0.0, 0.0], atol=1e-5) for o in orig)


def test_decay():
    import dataclasses
    cfg = dataclasses.replace(CFG, decaying_threshold=10.0)
    m = VoxelMapEmpty(cfg)
    m = _add(m, [[0.1, 0.1, 0.1]], t=0.0, cfg=cfg)
    m = _add(m, [[3.0, 3.0, 3.0]], t=8.0, cfg=cfg)
    m = vm.clear_old_points(m, jnp.float32(12.0), cfg)
    assert int(m.n_points) == 1
    np.testing.assert_allclose(_points(m), [[3.0, 3.0, 3.0]], atol=1e-6)


def test_submap_bbox_and_moving_filter():
    import dataclasses
    cfg = dataclasses.replace(CFG, min_frames_per_voxel=2)
    m = VoxelMapEmpty(cfg)
    # stable point seen twice, moving point seen once, far point
    m = _add(m, [[1.0, 1.0, 0.0], [2.0, 2.0, 0.0], [8.0, 8.0, 0.0]], t=0.0, cfg=cfg)
    m = _add(m, [[1.1, 1.1, 0.0]], t=1.0, cfg=cfg)  # same leaf as stable? 1.0 vs 1.1 -> both in [1.0,1.5) leaf
    view = vm.extract_submap_view(m, jnp.asarray([-3.0, -3.0, -3.0]),
                                  jnp.asarray([4.0, 4.0, 3.0]), jnp.int32(1), cfg)
    sel = np.asarray(view.valid)
    got = np.asarray(view.xyz)[sel]
    # only the count>=2 leaf inside bbox survives
    assert sel.sum() == 1
    np.testing.assert_allclose(got, [[1.0, 1.0, 0.0]], atol=1e-5)
    # fallback: requiring more points than the clean set has -> filter removed
    view2 = vm.extract_submap_view(m, jnp.asarray([-3.0, -3.0, -3.0]),
                                   jnp.asarray([4.0, 4.0, 3.0]), jnp.int32(2), cfg)
    assert int(np.asarray(view2.valid).sum()) == 2
def test_capacity_overflow_keeps_limit():
    import dataclasses
    cfg = dataclasses.replace(CFG, capacity=64)
    m = VoxelMapEmpty(cfg)
    rng = np.random.default_rng(1)
    m = _add(m, rng.uniform(-8, 8, (500, 3)).astype(np.float32), cfg=cfg)
    assert int(m.n_points) <= 64


def test_capacity_overflow_is_counted():
    """Winners dropped at capacity must be accounted, and the counter must
    accumulate across inserts (round-2 VERDICT item 6)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, capacity=64)
    m = VoxelMapEmpty(cfg)
    # 100 distinct leaves (10x10 grid at leaf pitch) -> 36 winners dropped
    g = np.arange(10, dtype=np.float32) * 0.5 - 2.5
    gx, gy = np.meshgrid(g, g)
    pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(100, np.float32)], 1)
    m = _add(m, pts, cfg=cfg)
    assert int(m.n_points) == 64
    assert int(m.overflow) == 36
    # re-inserting the same leaves: survivors dedup, evicted leaves re-enter
    # and overflow again
    m = _add(m, pts, cfg=cfg)
    assert int(m.overflow) == 72

    # no overflow when under capacity
    m2 = VoxelMapEmpty()
    m2 = _add(m2, pts)
    assert int(m2.overflow) == 0


def test_capacity_eviction_is_isotropic():
    """Sustained overflow must keep the map centered on the window (evict
    farthest-from-center, not largest-key): after inserting ~3x capacity of
    uniformly spread leaves, the survivors' centroid stays near the window
    center and both tails of every axis survive (round-3 VERDICT item 4)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, capacity=256)
    m = VoxelMapEmpty(cfg)
    rng = np.random.default_rng(7)
    for _ in range(6):
        m = _add(m, rng.uniform(-8, 8, (256, 3)).astype(np.float32), cfg=cfg)
    pts = _points(m)
    assert int(m.overflow) > 0
    # centroid near window center, not pushed toward the small-key corner
    assert np.linalg.norm(pts.mean(0)) < 1.5
    # every axis keeps both signs (a biased largest-key eviction drops the
    # +x edge entirely)
    for ax in range(3):
        assert pts[:, ax].max() > 2.0 and pts[:, ax].min() < -2.0
    # survivors are the NEAREST leaves: max kept radius < typical dropped
    r = np.linalg.norm(pts, axis=1)
    assert np.median(r) < 6.0


def test_capacity_eviction_spares_fixed():
    """Fixed points must never be evicted at capacity."""
    import dataclasses
    cfg = dataclasses.replace(CFG, capacity=64)
    m = VoxelMapEmpty(cfg)
    # 32 fixed points far from center (prime eviction candidates by
    # distance), one per 0.5 m leaf
    gx, gy = np.meshgrid(6.0 + 0.5 * np.arange(8), 6.0 + 0.5 * np.arange(4))
    fixed_pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(32)], 1).astype(np.float32)
    m = _add(m, fixed_pts, cfg=cfg, fixed=True)
    rng = np.random.default_rng(3)
    m = _add(m, rng.uniform(-2, 2, (300, 3)).astype(np.float32), cfg=cfg)
    pts, _, _, fix = vm.gather_valid_points(m, clean=False, cfg=cfg)
    assert int(fix.sum()) == 32


class _OracleGrid:
    """Sequential dict-grid oracle of RollingGrid::Add semantics."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.leaves = {}   # key -> dict(xyz, inten, time, count, fixed)

    def _key(self, p):
        half = vm.half_extent(self.cfg)
        li = np.floor((np.asarray(p) + half) / self.cfg.leaf_size).astype(int)
        n_leaf = int(np.ceil(2 * half / self.cfg.leaf_size)) + 1
        if np.any(li < 0) or np.any(li >= n_leaf):
            return None
        return tuple(li)

    def add(self, pts, inten, t, fixed=False):
        mode = self.cfg.sampling
        groups = {}
        for p, i in zip(np.asarray(pts, np.float32), np.asarray(inten, np.float32)):
            k = self._key(p)
            if k is not None:
                groups.setdefault(k, []).append((p, i))
        for k, items in groups.items():
            old = self.leaves.get(k)
            if old is not None and old["fixed"]:
                continue
            # batch winner per mode
            if mode in (SamplingMode.FIRST, SamplingMode.CENTROID):
                bp, bi = items[0]
            elif mode == SamplingMode.LAST:
                bp, bi = items[-1]
            elif mode == SamplingMode.MAX_INTENSITY:
                bp, bi = max(items, key=lambda x: x[1])
            else:
                half = vm.half_extent(self.cfg)
                center = (np.floor((items[0][0] + half) / self.cfg.leaf_size) + 0.5) \
                    * self.cfg.leaf_size - half
                bp, bi = min(items, key=lambda x: np.linalg.norm(x[0] - center))
            if mode == SamplingMode.CENTROID:
                bp = np.mean([p for p, _ in items], axis=0)
            cnt = old["count"] if old else 0
            if old is None:
                xyz, it = bp, bi
            elif mode in (SamplingMode.FIRST,):
                xyz, it = old["xyz"], old["inten"]
            elif mode == SamplingMode.LAST:
                xyz, it = bp, bi
            elif mode == SamplingMode.MAX_INTENSITY:
                xyz, it = (bp, bi) if bi > old["inten"] else (old["xyz"], old["inten"])
            elif mode == SamplingMode.CENTER_POINT:
                half = vm.half_extent(self.cfg)
                center = (np.floor((bp + half) / self.cfg.leaf_size) + 0.5) \
                    * self.cfg.leaf_size - half
                xyz, it = (bp, bi) if np.linalg.norm(bp - center) < \
                    np.linalg.norm(old["xyz"] - center) else (old["xyz"], old["inten"])
            else:  # CENTROID blend, batch mean weighted as one sample
                xyz = (old["xyz"] * cnt + bp) / (cnt + 1.0)
                it = old["inten"]
            self.leaves[k] = {"xyz": np.asarray(xyz, np.float32), "inten": it,
                              "time": t, "count": cnt + 1, "fixed": fixed}


@pytest.mark.parametrize("mode", [SamplingMode.FIRST, SamplingMode.LAST,
                                  SamplingMode.MAX_INTENSITY,
                                  SamplingMode.CENTER_POINT,
                                  SamplingMode.CENTROID])
def test_add_points_matches_sequential_oracle(mode):
    """Randomized differential test of the merge-based add_points against a
    sequential dict-grid oracle, several adds deep (dups, revisits, misses)."""
    cfg = _cfg(mode)
    rng = np.random.default_rng(42 + int(mode))
    m = VoxelMapEmpty(cfg)
    oracle = _OracleGrid(cfg)
    for step in range(4):
        n = 300
        # cluster points so leaves collide both within and across batches
        pts = (rng.integers(-6, 6, (n, 3)) * 0.5
               + rng.uniform(0.05, 0.45, (n, 3))).astype(np.float32)
        inten = rng.uniform(0, 100, n).astype(np.float32)
        m = _add(m, pts, inten=inten, t=float(step), cfg=cfg)
        oracle.add(pts, inten, float(step))
    v = np.asarray(m.valid)
    got_xyz = np.asarray(m.xyz)[v]
    got_cnt = np.asarray(m.count)[v]
    got_int = np.asarray(m.intensity)[v]
    want = oracle.leaves
    assert len(got_xyz) == len(want)
    # match leaves by key
    half = vm.half_extent(cfg)
    for p, c, it in zip(got_xyz, got_cnt, got_int):
        k = tuple(np.floor((p + half) / cfg.leaf_size).astype(int))
        assert k in want, f"unexpected leaf {k}"
        o = want[k]
        np.testing.assert_allclose(p, o["xyz"], atol=2e-5)
        assert c == o["count"], (k, c, o["count"])
        if mode != SamplingMode.CENTROID:
            np.testing.assert_allclose(it, o["inten"], atol=1e-5)
