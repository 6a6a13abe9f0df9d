#!/usr/bin/env bash
# The CI pipeline equivalent (ci/.gitlab-ci.yml stages, adapted to this
# framework's single-repo layout):
#
#   1. build        — native library compiles from scratch (slam_lib build
#                     stage analog; the Python package has no build step)
#   2. unit tests   — the full pytest suite on the 8-device virtual CPU
#                     mesh (the reference has no unit tests; SURVEY §4
#                     prescribes these as the superset)
#   3. regression   — deterministic golden-trajectory replay, reference CI
#                     thresholds (ros_test stage analog)
#   4. multichip    — the N-device dry-run equivalence gate
#
# Usage: scripts/ci.sh [quick]   ("quick" skips the full pytest stage)
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS=cpu
export JAX_PLATFORM_NAME=cpu
export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"

echo "=== stage 1: native build ==="
rm -f native/liblidarslam_native.so
bash native/build.sh
python - <<'EOF'
from lidarslam_tpu.io import native
assert native.available(), "native library failed to load"
print("native library OK")
EOF

if [ "${1:-}" != "quick" ]; then
  echo "=== stage 2: unit tests (8-device virtual mesh) ==="
  python -m pytest tests/ -q -x
fi

echo "=== stage 3: golden-trajectory regression ==="
RESULTS_DIR=$(mktemp -d) bash scripts/regression.sh

echo "=== stage 4: multi-chip dry-run equivalence ==="
python -c "import jax; jax.config.update('jax_platform_name', 'cpu');
import __graft_entry__ as g; g.dryrun_multichip(8)"

# stage 5: hardware robustness gate (round-4 VERDICT item 4). On a TPU
# host (CI_TPU=1) this replays the 200-frame 64-beam regression with the
# exact bench shapes — zero lost-tracker frames, bounded ATE. The same
# contract is ALSO machine-checked in the driver path: bench.py exits
# nonzero when any benchmarked frame reports failure.
if [ "${CI_TPU:-}" = "1" ]; then
  echo "=== stage 5: 200-frame 64-beam hardware robustness ==="
  env -u JAX_PLATFORMS -u JAX_PLATFORM_NAME RUN_SLOW=1 \
    python -m pytest tests/test_long_run.py -q -x -p no:xdist \
    -k two_hundred
fi

echo "=== CI pipeline green ==="
