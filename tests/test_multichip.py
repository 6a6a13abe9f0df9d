"""Sharded registration on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_matches_single_device():
    """The psum-reduced sharded solve must produce the same pose as the
    single-device solve (same inputs, same schedule)."""
    import __graft_entry__ as g
    from lidarslam_tpu.config import Keypoint, MatchingConfig, SolverConfig
    from lidarslam_tpu.ops import icp
    from lidarslam_tpu.parallel import sharded

    inputs, geoms, pose0 = g._tiny_icp_setup(q=64)
    kwargs = dict(types=(Keypoint.EDGE, Keypoint.PLANE), params=MatchingConfig(),
                  solver_cfg=SolverConfig(), icp_iters=3, lm_max_iter=15,
                  min_matches=20, geoms=geoms)
    single = icp.icp_register(inputs, pose0=pose0, **kwargs)
    mesh = sharded.make_mesh(8)
    multi = sharded.sharded_icp_register(mesh, inputs, kwargs["types"], pose0,
                                         kwargs["params"], kwargs["solver_cfg"],
                                         3, 15, 20, geoms)
    assert int(multi.total_matches) == int(single.total_matches)
    np.testing.assert_allclose(np.asarray(multi.pose), np.asarray(single.pose),
                               atol=1e-4)


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    pose = jax.jit(fn)(*args)
    pose = np.asarray(pose)
    assert pose.shape == (6,) and np.all(np.isfinite(pose))
