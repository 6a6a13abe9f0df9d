"""lidarslam_tpu — a TPU-native LiDAR SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of a LOAM-style spinning-LiDAR SLAM
pipeline (reference capability set: Kitware/Perception4D LidarSlam,
`slam_lib/`), built TPU-first:

- sweeps are fixed-shape ring-major "range images" with validity masks,
- keypoint extraction is a batched stencil over the (ring, firing) grid,
- the local map is a sort-based voxel grid with a bucket index replacing
  nanoflann kd-trees,
- scan registration is a batched point-to-line/plane/blob Gauss-Newton /
  Levenberg-Marquardt solver with Tukey IRLS robust weights replacing Ceres,
- multi-chip scaling shards keypoints over a `jax.sharding.Mesh` and reduces
  normal equations with `psum` collectives.

Nothing here is a translation of the reference C++; reference files are cited
in docstrings (as `file:line` under /root/reference) only to document
behavioral parity.
"""

from lidarslam_tpu.config import SlamConfig
from lidarslam_tpu.slam import Slam

__version__ = "0.1.0"

__all__ = ["SlamConfig", "Slam", "__version__"]
