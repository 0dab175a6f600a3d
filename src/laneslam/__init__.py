"""laneslam — TPU-native point+line visual SLAM engine.

A brand-new framework (not a port) with the capabilities of the
``mandanasmi/lane-slam`` pipeline family (see ``SURVEY.md`` / ``BASELINE.json:5``):
LSD-style line detection, LBD descriptors, GEMM-based matching with geometric
gating, point+line bundle adjustment with Schur-complement landmark
elimination, pose-graph optimization, keyframe database / covisibility graph /
loop closure — all formulated as statically-shaped JAX programs so the
optimize/match loop never leaves HBM, sharded over a ``jax.sharding.Mesh``
for multi-chip / multi-host execution.

Layer map (SURVEY.md §1):
  runtime/   L0  mesh + host I/O + arena allocation
  kernels/   L1  Pallas TPU kernels (lsd, lbd, match gating, schur)
  geometry/  L2  SE3/SO3, Plücker + orthonormal lines, projection, Umeyama
  features/  L3  detect_lines / describe / match
  map/       L4  device-resident fixed-capacity map state
  frontend/  L5  tracking
  backend/   L6  BA (GN + Schur), PGO
  dist/      L7  mesh axes, collective wrappers
  loop/      L8  keyframe DB, loop verification
  data/      L9  KITTI / EuRoC loaders, synthetic scenes
  eval/      L10 ATE/RPE, trajectory writers
  api.py     L11 run_odometry / run_slam / run_stereo / run_distributed
"""

__version__ = "0.1.0"
