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
python -m pytest tests/integration "$@"
echo "ALL PARTITIONS GREEN"
