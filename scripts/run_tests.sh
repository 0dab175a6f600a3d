#!/usr/bin/env bash
# Canonical test-suite entry: partitions the suite into separate pytest
# processes. Needed because XLA's CPU compiler can segfault compiling the
# large fused chunk program (system._slam_chunk) in a process that already
# compiled many 8-virtual-device shard_map programs (tests/dist) — the
# same compile succeeds in a fresh process (reproduced round 4: the
# combined `pytest tests/dist tests/integration` invocation crashes inside
# backend_compile_and_load at test_synthetic_stereo_slam_chunked, each
# partition alone is green).
#
# Usage: scripts/run_tests.sh [extra pytest args, e.g. -m ""]
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/unit tests/backend tests/kernels tests/golden "$@"
python -m pytest tests/dist "$@"
# The fused chunk program (system._slam_chunk, mono + stereo variants) is
# the largest compile in the suite; one process per chunk-heavy file keeps
# the XLA CPU compiler far from its crash regime (observed round 4: the
# whole-integration process segfaulted in backend_compile after ~40 min
# under CPU contention).
python -m pytest tests/integration \
  --ignore=tests/integration/test_chunk_parity.py \
  --ignore=tests/integration/test_kitti_chunked.py \
  --ignore=tests/integration/test_stereo_slam.py "$@"
python -m pytest tests/integration/test_chunk_parity.py \
  tests/integration/test_kitti_chunked.py "$@"
python -m pytest tests/integration/test_stereo_slam.py "$@"
echo "ALL PARTITIONS GREEN"
