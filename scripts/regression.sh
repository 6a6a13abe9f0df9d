#!/usr/bin/env bash
# Golden-trajectory regression harness (the ros_test stage equivalent,
# ci/.gitlab-ci.yml:145-250): first run on a branch-point creates the golden
# CSVs; later runs replay the same deterministic sequence and compare with
# the reference CI thresholds (0.01 m / 5 deg; timing threshold relaxed to
# 1 s to tolerate shared-host contention).
set -euo pipefail
cd "$(dirname "$0")/.."

GOLDEN=${GOLDEN_DIR:-golden}
RESULTS=${RESULTS_DIR:-results}
FRAMES=${FRAMES:-20}
RUN_ARGS=(--cpu run --synthetic "$FRAMES" --max-ring-points 2048 --max-keypoints 2048)

if [ ! -f "$GOLDEN/Poses.csv" ]; then
  echo "== creating golden reference ($GOLDEN) =="
  python -m lidarslam_tpu.cli "${RUN_ARGS[@]}" --out "$GOLDEN"
  echo "golden created; re-run to compare"
  exit 0
fi

echo "== replaying ($RESULTS) =="
python -m lidarslam_tpu.cli "${RUN_ARGS[@]}" --out "$RESULTS"
echo "== comparing against golden =="
python -m lidarslam_tpu.cli compare --res "$RESULTS" --ref "$GOLDEN" --time-threshold 1
