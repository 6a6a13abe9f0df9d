"""Multi-chip scale-out over a `jax.sharding.Mesh`.

The reference's only parallelism is OpenMP threads in one process
(Slam.h:402-403); this module is the green-field distributed layer the TPU
build adds (SURVEY.md §2.2): keypoints shard over the mesh's `kp` axis (the
matcher's natural data-parallel axis — every keypoint is independent given
the map), the map/submap index is replicated, and the solver's 6x6 normal
equations are `psum`-reduced over ICI each LM evaluation so all chips step an
identical pose. This is the moral equivalent of sequence parallelism for the
registration workload; map-block sharding over hosts follows in a later
round.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from lidarslam_tpu.config import Keypoint, MatchingConfig, SolverConfig
from lidarslam_tpu.ops import icp

AXIS = "kp"


def make_mesh(n_devices=None) -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), (AXIS,))


def sharded_icp_register(
    mesh: Mesh,
    inputs: icp.ICPInputs,
    types: Sequence[Keypoint],
    pose0,
    params: MatchingConfig,
    solver_cfg: SolverConfig,
    icp_iters: int,
    lm_max_iter: int,
    min_matches: int,
    geoms: Sequence,
):
    """ICP registration with keypoints sharded over the mesh's kp axis.

    Keypoint arrays' leading dim must be divisible by the mesh size; the
    index and pose are replicated, outputs are replicated (identical on all
    devices by construction of the psum-reduced solve).
    """
    n = mesh.devices.size

    kp_spec = icp.ICPInputs(
        kp_xyz=tuple(None if x is None else P(AXIS) for x in inputs.kp_xyz),
        kp_valid=tuple(None if x is None else P(AXIS) for x in inputs.kp_valid),
        index=tuple(None if x is None else jax.tree.map(lambda _: P(), x,
                                                        is_leaf=lambda v: v is None)
                    for x in inputs.index),
    )
    out_spec = icp.ICPResult(
        pose=P(), failed=P(), total_matches=P(), match_counts=P(), H=P(),
        statuses=tuple(P(AXIS) for _ in types), weights=tuple(P(AXIS) for _ in types),
    )

    fn = partial(icp.icp_register, types=types, params=params, solver_cfg=solver_cfg,
                 icp_iters=icp_iters, lm_max_iter=lm_max_iter,
                 min_matches=min_matches, geoms=geoms, axis_name=AXIS)

    sharded = shard_map(lambda inp, p0: fn(inp, pose0=p0), mesh=mesh,
                        in_specs=(kp_spec, P()), out_specs=out_spec,
                        check_vma=False)
    return jax.jit(sharded)(inputs, pose0)
